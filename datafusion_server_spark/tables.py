"""Test-fixture table loading: the driver's TPC-H-ish parquet tables.

``register_views(spark, sf_dir)`` registers every table under its bare
name so both the SQL surface queries and the DuckDB oracle address the
same relations (DuckDB pre-registers the same names as views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Driver fixtures have stored timestamps two ways across rounds:
# - INT64 TIMESTAMP(NANOS), which Spark's reader rejects outright — read
#   nanos as long (spark.sql.legacy.parquet.nanosAsLong) and rebuild
#   TimestampType via integer µs division (lossless: ns remainders are 0);
# - plain timestamp[us] with no timezone, which Spark surfaces as
#   TIMESTAMP_NTZ — watermarks and unix_micros() reject NTZ, so cast to
#   TIMESTAMP (the UTC session tz preserves the literal instants, and the
#   DuckDB oracle reads the same columns as naive µs TIMESTAMP).
_NS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# DataFrame + view-registration caches: repeated query builds in one
# session would otherwise re-list files and re-read parquet footers for
# all ten tables on every call (hundreds of ms each).
_DF_CACHE: dict[tuple[int, str, str], DataFrame] = {}
_VIEWS_DONE: set[tuple[int, str]] = set()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table: {name}")
    key = (id(spark), sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NS_TIMESTAMP_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _DF_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    key = (id(spark), sf_dir)
    if names == TABLES and key in _VIEWS_DONE:
        return
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    if names == TABLES:
        _VIEWS_DONE.add(key)
