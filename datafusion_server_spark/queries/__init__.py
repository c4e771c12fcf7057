"""Query inventory exported through ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 gets a named entry here:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express it) a DuckDB oracle SQL string over the same parquet tables.

Column names are aliased identically on both sides — the driver's
comparator sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from datafusion_server_spark import tables


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check


_REGISTRY: dict[str, QueryDef] = {}


def register(qd: QueryDef) -> QueryDef:
    if qd.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {qd.name}")
    _REGISTRY[qd.name] = qd
    return qd


def sql_query(name: str, sql: str, oracle: str | None = "same") -> QueryDef:
    """Register a query whose Spark side is ``spark.sql(sql)`` over the
    fixture views. ``oracle='same'`` reuses the identical SQL text for
    DuckDB (the common case — both dialects are ANSI-ish); pass a
    different string when the dialects diverge, or None for rows-only.
    """

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables.register_views(spark, sf_dir)
        return spark.sql(sql)

    return register(QueryDef(name, build, sql if oracle == "same" else oracle))


def df_query(name: str, oracle: str | None):
    """Decorator registering a DataFrame-API builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]) -> QueryDef:
        return register(QueryDef(name, fn, oracle))

    return wrap


def registry() -> dict[str, QueryDef]:
    """Import all query modules and return the full inventory."""
    from datafusion_server_spark.queries import (  # noqa: F401
        core,
        core2,
        core3,
        dedup,
        extensions,
        merge,
        similarity,
        text,
    )

    return dict(_REGISTRY)
