"""Deterministic cardinality sketch: KMV (k-minimum-values).

Beyond-reference operator. The engine already exposes Spark's native
HyperLogLog++ (``approx_count_distinct_sketch`` — rows-only check, the
sketch values are engine-specific). KMV is the complementary sketch with
a fully DETERMINISTIC definition: the estimate is a pure function of the
k smallest md5 values of the key set, so Spark and the DuckDB oracle
reproduce it bit-for-bit — an oracle-checkable approximate-distinct.

Estimator (Bar-Yossef et al. 2002): with h uniform on [0,1) and h_(k)
the k-th smallest hash over the distinct keys, E[h_(k)] ~ k/(n+1), so
``n_hat = (k-1)/h_(k)``. When fewer than k distinct keys exist the count
is exact.

Scale notes (100 TB): the heavy reduction is the distinct-(group, hash)
aggregation — one shuffle with map-side partial dedup. The per-group
top-k window then runs on ~distinct-cardinality rows, and only k rows
per group survive into the final aggregate. Sketches merge by unioning
hash sets and re-taking the k minima, so partial sketches from
independent partitions/days combine without rescanning (the property
that makes KMV a streaming/incremental-rollup citizen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 15 hex digits = 60 bits: fits a BIGINT exactly in both engines, and
# 16^15 is a power of two, exactly representable as a double.
_HEX_DIGITS = 15
_HEX_SPAN = float(16**_HEX_DIGITS)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate. Output: (*group_cols,
    kmv_estimate DOUBLE, n_hashes BIGINT) where n_hashes = min(k,
    distinct) is the retained sketch size.

    Hash = md5 of the key as a string (identical in Spark and DuckDB);
    the fraction is the first 15 hex digits scaled by 16^-15.
    """
    hashed = df.select(
        *group_cols, F.md5(F.col(key_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    kept = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = kept.groupBy(*group_cols).agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("bigint").alias("n_hashes"),
    )
    frac = F.conv(F.substring("h_k", 1, _HEX_DIGITS), 16, 10).cast("bigint") / F.lit(
        _HEX_SPAN
    )
    return agg.select(
        *group_cols,
        F.round(
            F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
                (F.lit(float(k - 1))) / frac
            ),
            6,
        ).alias("kmv_estimate"),
        "n_hashes",
    )
