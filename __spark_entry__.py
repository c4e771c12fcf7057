"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual inventory lives in ``datafusion_server_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from datafusion_server_spark.queries import registry

    return registry()["q1_pricing_summary"].build(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datafusion_server_spark.queries import registry

    return {name: qd.build for name, qd in registry().items()}


SF001 = "/root/testdata/sf0.01"  # the driver's documented correctness SF


def oracle_sql() -> dict[str, str]:
    from datafusion_server_spark.queries import registry

    return {
        name: qd.oracle_for(SF001)
        for name, qd in registry().items()
        if qd.oracle is not None
    }
