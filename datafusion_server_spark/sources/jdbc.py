"""External-database sources (reference A11/A12).

The reference implements a custom DataFusion TableProvider that pushes
projection/filter/limit into remote Postgres/MySQL SQL
(lib/src/data_source/database/table_provider.rs:46-170). Spark's JDBC
source already performs the same pushdowns natively, so this module is
thin: namespace config -> JDBC URL/properties, a schema cache per
(namespace, table) mirroring table_resolver.rs:39-66, and the
``table@namespace`` SQL pre-pass of table_register.rs:19-75 (see
functions.dialect.rewrite_table_at_namespace).

Two namespace kinds:

- ``jdbc`` (postgres/mysql/...): Spark's distributed JDBC reader —
  requires the driver jar on the classpath (none ship in this
  container; calls surface a clear error instead of a classpath trace);
- ``sqlite``: a REAL external database served by the stdlib ``sqlite3``
  module — the full table@namespace flow (namespace config, SQL
  pre-pass, schema cache, query execution) runs live with no jar. Rows
  transfer through Arrow on the driver, the standard shape for
  smallish dimension/lookup tables living in an operational DB; big
  fact tables belong on the JDBC path with partitioned reads.
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
    url: str  # jdbc:postgresql://... / jdbc:mysql://... / sqlite file path
    user: str | None = None
    password: str | None = None
    max_connections: int = 10  # reference database_manager.rs default
    fetch_size: int = 1000  # reference table_provider.rs:44 BATCH_SIZE
    kind: str = "jdbc"  # "jdbc" | "sqlite"

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


_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")


def _sqlite_spark_type(decl: str) -> str:
    decl = (decl or "").upper()
    if "INT" in decl:
        return "bigint"
    if decl in ("REAL", "FLOAT", "DOUBLE") or "REAL" in decl or "FLOA" in decl or "DOUB" in decl:
        return "double"
    if "BLOB" in decl:
        return "binary"
    return "string"


def _read_sqlite(spark: SparkSession, ns: DatabaseNamespace, table: str) -> DataFrame:
    """stdlib-sqlite table read with an EXPLICIT schema from the declared
    column affinities — type inference from values would crash on
    all-NULL columns. One connection, always closed ('with' on a sqlite3
    connection only manages the transaction, not the handle)."""
    import contextlib
    import sqlite3

    if not _IDENT_RE.fullmatch(table):
        raise ValueError(f"invalid table identifier: {table!r}")
    with contextlib.closing(sqlite3.connect(ns.url)) as conn:
        decls = [
            (r[1], (r[2] or ""))
            for r in conn.execute(f'PRAGMA table_info("{table}")')
        ]
        if not decls:
            raise ValueError(f"no such sqlite table: {table!r} in {ns.url}")
        rows = [tuple(r) for r in conn.execute(f'SELECT * FROM "{table}"')]
    ddl = ", ".join(f"{c} {_sqlite_spark_type(t)}" for c, t in decls)
    return spark.createDataFrame(rows, schema=ddl)


_PG_URL_RE = re.compile(
    r"jdbc:postgresql://(?P<host>[^:/]+)(?::(?P<port>\d+))?/(?P<db>[^?/]*)"
)
_MYSQL_URL_RE = re.compile(
    r"jdbc:mysql://(?P<host>[^:/]+)(?::(?P<port>\d+))?/(?P<db>[^?/]*)"
)


def _read_mysql_wire(spark: SparkSession, ns: DatabaseNamespace, table: str) -> DataFrame:
    """Native-protocol mysql read (sources/mysqlwire.py) — A11's second
    reference target, same no-jar fallback contract as _read_pg_wire."""
    from datafusion_server_spark.sources import mysqlwire

    m = _MYSQL_URL_RE.fullmatch(ns.url)
    if not m:
        raise ValueError(f"cannot parse mysql URL {ns.url!r}")
    if not _IDENT_RE.fullmatch(table):
        raise ValueError(f"invalid table identifier: {table!r}")
    conn = mysqlwire.connect(
        host=m.group("host"),
        port=int(m.group("port") or 3306),
        user=ns.user or "root",
        database=m.group("db") or "",
        password=ns.password,
    )
    try:
        qualified = ".".join(f"`{part}`" for part in table.split("."))
        cols, rows = conn.query(f"SELECT * FROM {qualified}")
    finally:
        conn.close()
    if not cols:
        raise ValueError(f"query against {table!r} returned no columns")
    ddl = ", ".join(
        f"{name} {mysqlwire.spark_type_for_column(tc, fl)}" for name, tc, fl in cols
    )
    return spark.createDataFrame(rows, schema=ddl)


def _read_pg_wire(spark: SparkSession, ns: DatabaseNamespace, table: str) -> DataFrame:
    """Native-protocol postgres read (sources/pgwire.py) — the same
    transport the reference uses (rust postgres crate,
    table_provider.rs:46-170), here as the no-jar fallback. Eager
    driver-side transfer like the sqlite namespace; the jar-backed JDBC
    path remains the distributed/partitioned option."""
    from datafusion_server_spark.sources import pgwire

    m = _PG_URL_RE.fullmatch(ns.url)
    if not m:
        raise ValueError(f"cannot parse postgres URL {ns.url!r}")
    if not _IDENT_RE.fullmatch(table):
        raise ValueError(f"invalid table identifier: {table!r}")
    conn = pgwire.connect(
        host=m.group("host"),
        port=int(m.group("port") or 5432),
        user=ns.user or "postgres",
        database=m.group("db") or (ns.user or "postgres"),
        password=ns.password,
    )
    try:
        qualified = ".".join(f'"{part}"' for part in table.split("."))
        cols, rows = conn.simple_query(f"SELECT * FROM {qualified}")
    finally:
        conn.close()
    if not cols:
        raise ValueError(f"query against {table!r} returned no row description")
    ddl = ", ".join(
        f"{name} {pgwire.spark_type_for_oid(oid)}" for name, oid in cols
    )
    return spark.createDataFrame(rows, schema=ddl)


def read_jdbc(spark: SparkSession, table: str, namespace: str) -> DataFrame:
    ns = _NAMESPACES.get(namespace)
    if ns is None:
        raise ValueError(f"unknown database namespace: {namespace!r}")
    wire_fallbacks = {"jdbc:postgresql:": _read_pg_wire, "jdbc:mysql:": _read_mysql_wire}
    fallback = next(
        (fn for prefix, fn in wire_fallbacks.items() if ns.url.startswith(prefix)),
        None,
    )
    if ns.kind == "sqlite":
        df = _read_sqlite(spark, ns, table)
    elif ns.kind == "jdbc" and fallback is not None:
        # Prefer Spark's distributed JDBC reader (pushdown, partitioned
        # reads); fall back to the native wire-protocol client when the
        # driver jar is absent so a configured postgres/mysql namespace
        # still executes instead of dying on a classpath error.
        try:
            df = spark.read.jdbc(ns.url, table, properties=ns.properties())
        except Exception as jdbc_err:
            if "ClassNotFoundException" not in str(
                jdbc_err
            ) and "No suitable driver" not in str(jdbc_err):
                raise
            df = fallback(spark, ns, table)
    else:
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
        # '@' needs the quoted identifier form — the bare name fails
        # Spark's view-name validation (the transpiler quotes the same
        # way on the query side, quote_table_at_namespace)
        df.createOrReplaceTempView(f"`{name}`")
        registered.append(name)
    return registered
