"""External-database sources over Spark's JDBC reader (reference A11/A12).

The reference implements a custom DataFusion TableProvider that pushes
projection/filter/limit into remote Postgres/MySQL SQL
(lib/src/data_source/database/table_provider.rs:46-170). Spark's JDBC
source already performs the same pushdowns natively, so this module is
thin: namespace config -> JDBC URL/properties, a schema cache per
(namespace, table) mirroring table_resolver.rs:39-66, and the
``table@namespace`` SQL pre-pass of table_register.rs:19-75 (see
functions.dialect.rewrite_table_at_namespace).

Gated: no JDBC drivers ship in this container; calls surface a clear
DataSourceError instead of a classpath stack trace.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from datafusion_server_spark.schema import struct_to_schema_json

_NAMESPACES: dict[str, "DatabaseNamespace"] = {}
_SCHEMA_CACHE: dict[tuple[str, str], dict] = {}


@dataclass(frozen=True)
class DatabaseNamespace:
    """One configured external database (reference settings: namespaces)."""

    name: str
    url: str  # jdbc:postgresql://... / jdbc:mysql://...
    user: str | None = None
    password: str | None = None
    max_connections: int = 10  # reference database_manager.rs default
    fetch_size: int = 1000  # reference table_provider.rs:44 BATCH_SIZE

    def properties(self) -> dict[str, str]:
        props = {"fetchsize": str(self.fetch_size)}
        if self.user:
            props["user"] = self.user
        if self.password:
            props["password"] = self.password
        return props


def configure_namespace(ns: DatabaseNamespace) -> None:
    _NAMESPACES[ns.name] = ns


def read_table(spark: SparkSession, ds) -> DataFrame:
    """Read ``table@namespace`` (or options.table/options.namespace)."""
    m = re.fullmatch(r"(?P<table>[\w.]+)@(?P<ns>[\w]+)", ds.location or ds.name)
    if not m:
        raise ValueError(f"database source needs 'table@namespace', got {ds.location!r}")
    return read_jdbc(spark, m.group("table"), m.group("ns"))


def read_jdbc(spark: SparkSession, table: str, namespace: str) -> DataFrame:
    ns = _NAMESPACES.get(namespace)
    if ns is None:
        raise ValueError(f"unknown database namespace: {namespace!r}")
    df = spark.read.jdbc(ns.url, table, properties=ns.properties())
    _SCHEMA_CACHE[(namespace, table)] = struct_to_schema_json(df.schema)
    return df


def cached_schema(namespace: str, table: str) -> dict | None:
    return _SCHEMA_CACHE.get((namespace, table))


def register_tables_from_sql(spark: SparkSession, sql: str) -> list[str]:
    """The reference's pre-execution pass (table_register.rs:19-75): find
    ``table@namespace`` relations in the SQL, register each as a JDBC temp
    view under its literal (backtick-quoted) name. Returns registered names."""
    from datafusion_server_spark.functions.dialect import find_table_at_namespace

    registered = []
    for table, namespace in find_table_at_namespace(sql):
        name = f"{table}@{namespace}"
        df = read_jdbc(spark, table, namespace)
        df.createOrReplaceTempView(name)
        registered.append(name)
    return registered
