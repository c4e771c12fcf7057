"""Deterministic dataset sampling / splitting for training-data pipelines.

Beyond-reference operators. Training corpora are mixed from sources with
per-source weights and split train/val/test; both must be (a) exactly
reproducible across runs and engines, (b) stable under repartitioning,
(c) free of coordination — a pure function of the row key. The standard
trick: hash the key to a uniform fraction in [0,1) and compare against
rates/thresholds. Hash = md5 (bit-identical in Spark and DuckDB), so the
oracle reproduces the exact row set.

Scale notes (100 TB): both operators are narrow transformations — a
filter / projection with no shuffle at all. Sampling 100 TB costs one
scan; the selectivity reaches the scan via normal predicate pushdown of
the surrounding plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 15
_HEX_SPAN = float(16**_HEX_DIGITS)


def hash_fraction(key: Column, seed: str) -> Column:
    """Uniform [0,1) fraction from md5('{seed}:{key}') — the first 15 hex
    digits scaled by 16^-15 (exact in a double; same math as the KMV
    sketch)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("bigint") / F.lit(
        _HEX_SPAN
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Keep each row with probability ``rates[stratum]`` (per-source
    mixture weights), decided by the row key's hash fraction — same key
    always gets the same verdict, independent of partitioning, engine,
    or run."""
    frac = hash_fraction(F.col(key_col), seed)
    rate = F.lit(default_rate)
    for stratum, r in rates.items():
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.filter(frac < rate)


def split_assign(
    df: DataFrame,
    key_col: str,
    *,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    seed: str = "split",
) -> DataFrame:
    """Append a deterministic ``split`` column: 'val' for hash fraction
    < val_frac, 'test' for the next test_frac band, else 'train'.
    Banding on one hash keeps the three sets disjoint by construction."""
    frac = hash_fraction(F.col(key_col), seed)
    return df.withColumn(
        "split",
        F.when(frac < val_frac, F.lit("val"))
        .when(frac < val_frac + test_frac, F.lit("test"))
        .otherwise(F.lit("train")),
    )
