"""Jar-gated verification matrix (VERDICT r3 task #9).

This container ships NO optional jars (spark-avro, delta-spark, JDBC
drivers), so the registry's primary paths for A8/A9/A11 fall back to the
pure-Python implementations and the jar paths are config-complete but
never executed. This module is the instant-verification harness for the
first environment that DOES have them: each test skips cleanly when its
jar is absent and, when present, drives the REAL jar-backed path through
the same registry entry points the fallbacks use — so enabling a jar
cannot silently regress the integration.

Run with e.g.:
    spark-submit --packages org.apache.spark:spark-avro_2.13:4.1.2 ...
    pip install delta-spark   # + spark.jars.packages io.delta:delta-spark
    --jars postgresql-<v>.jar + SPARK_GRAFT_PG_URL=jdbc:postgresql://...
"""

from __future__ import annotations

import os

import pytest

from datafusion_server_spark.sources.registry import DataSource, load_data_source


def _jvm_class_present(spark, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def avro_jar(spark, tmp_path_factory):
    # class-presence probes lie here: Spark ships avro SHIM classes even
    # when the data source module isn't deployed — probe with a real read
    from datafusion_server_spark.sources import avro_py

    p = tmp_path_factory.mktemp("avroprobe") / "probe.avro"
    p.write_bytes(
        avro_py.write_ocf(
            {"type": "record", "name": "P", "fields": [{"name": "x", "type": "long"}]},
            [{"x": 1}],
        )
    )
    try:
        spark.read.format("avro").load(str(p)).collect()
    except Exception:
        pytest.skip("spark-avro module not deployed")
    return True


@pytest.fixture(scope="module")
def delta_jar(spark):
    try:
        import delta  # noqa: F401
    except ImportError:
        pytest.skip("delta-spark not installed")
    if not _jvm_class_present(spark, "org.apache.spark.sql.delta.DeltaLog"):
        pytest.skip("delta-spark jar not on classpath")
    return True


@pytest.fixture(scope="module")
def pg_jdbc(spark):
    if not _jvm_class_present(spark, "org.postgresql.Driver"):
        pytest.skip("postgresql JDBC driver not on classpath")
    url = os.environ.get("SPARK_GRAFT_PG_URL")
    if not url:
        pytest.skip("SPARK_GRAFT_PG_URL not set (need a live postgres)")
    return url


def test_spark_avro_through_registry(spark, tmp_path, avro_jar):
    """With the jar present the registry must take the DISTRIBUTED
    spark-avro path (lazy, eager=False), reading a file our own encoder
    wrote — proving the two implementations agree on the format."""
    from datafusion_server_spark.sources import avro_py

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
        ],
    }
    records = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    p = tmp_path / "t.avro"
    p.write_bytes(avro_py.write_ocf(schema, records, codec="deflate"))
    ds = DataSource.from_json({"format": "avro", "name": "av_jar", "location": str(p)})
    df, eager = load_data_source(spark, ds)
    assert eager is False  # the jar path stays a lazy distributed scan
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [(1, "a"), (2, "b")]


def test_delta_spark_through_registry(spark, tmp_path, delta_jar):
    """delta-spark reads a table written by delta-spark through the
    registry, including versionAsOf — and a DV table (DELETE creates one
    under deletionVectors.enabled) returns masked rows that MATCH the
    pure-Python fallback's read of the same table."""
    from delta.tables import DeltaTable  # noqa: F401  (import proves install)

    tdir = str(tmp_path / "dt")
    spark.range(10).write.format("delta").option(
        "delta.enableDeletionVectors", "true"
    ).save(tdir)
    spark.sql(f"DELETE FROM delta.`{tdir}` WHERE id IN (2, 5)")
    ds = DataSource.from_json({"format": "delta", "name": "dt_jar", "location": tdir})
    df, eager = load_data_source(spark, ds)
    got = sorted(r["id"] for r in df.collect())
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]
    # cross-check the pure-Python DV reader against delta-spark's answer
    from datafusion_server_spark.sources import delta_py

    fallback = sorted(r["id"] for r in delta_py.read_delta(spark, tdir).collect())
    assert fallback == got
    # time travel pre-delete
    ds0 = DataSource.from_json(
        {"format": "delta", "name": "dt_jar0", "location": tdir,
         "options": {"version": 0}}
    )
    df0, _ = load_data_source(spark, ds0)
    assert df0.count() == 10


@pytest.fixture(scope="module")
def mysql_jdbc(spark):
    if not _jvm_class_present(spark, "com.mysql.cj.jdbc.Driver"):
        pytest.skip("mysql JDBC driver not on classpath")
    url = os.environ.get("SPARK_GRAFT_MYSQL_URL")
    if not url:
        pytest.skip("SPARK_GRAFT_MYSQL_URL not set (need a live mysql)")
    return url


def test_live_mysql_through_namespace(spark, mysql_jdbc):
    from datafusion_server_spark.sources import jdbc

    ns = jdbc.DatabaseNamespace(name="myjar", url=mysql_jdbc)
    jdbc.configure_namespace(ns)
    df = jdbc.read_jdbc(spark, "information_schema.TABLES", "myjar")
    assert df.count() > 0


def test_live_postgres_through_namespace(spark, pg_jdbc):
    """The reference's actual external-DB target: a live postgres through
    config -> namespace -> table@ns (same chain the sqlite e2e proves
    in-container)."""
    from datafusion_server_spark.sources import jdbc

    ns = jdbc.DatabaseNamespace(name="pgjar", url=pg_jdbc)
    jdbc.configure_namespace(ns)
    df = jdbc.read_jdbc(spark, "pg_catalog.pg_tables", "pgjar")
    assert df.count() > 0
    assert "tablename" in [c.lower() for c in df.columns]
