"""Merge-processor query inventory (reference session.rs:550-656).

Exercises the column-direction merge (inner equi-join + ``{table}_{col}``
collision aliasing + target-key drop) and the row-direction merge
(union [distinct]) through the operators.merge library, against plain-SQL
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_server_spark import tables
from datafusion_server_spark.operators.merge import (
    ColumnMergeTarget,
    merge_column,
    merge_row,
)
from datafusion_server_spark.queries import df_query

# Column merge with name collisions: base(key,name,region_ref) x
# tgt_t(key,name) on region_ref=key. Expected output columns: key, name,
# region_ref (base, untouched) + tgt_t_name (collision-aliased); the
# target's join key is dropped.
_COLUMN_ORACLE = """
WITH base_t AS (SELECT n_nationkey AS key, n_name AS name, n_regionkey AS region_ref FROM nation),
tgt_t AS (SELECT r_regionkey AS key, r_name AS name FROM region)
SELECT b.key AS key, b.name AS name, b.region_ref AS region_ref,
       t.name AS tgt_t_name
FROM base_t b JOIN tgt_t t ON b.region_ref = t.key
"""


@df_query("merge_processor_column", _COLUMN_ORACLE)
def merge_processor_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.register_views(spark, sf_dir, ("nation", "region"))
    base = spark.sql(
        "SELECT n_nationkey AS key, n_name AS name, n_regionkey AS region_ref FROM nation"
    )
    tgt = spark.sql("SELECT r_regionkey AS key, r_name AS name FROM region")
    spec = ColumnMergeTarget(table="tgt_t", base_keys=["region_ref"], target_keys=["key"])
    return merge_column(base, [(tgt, spec)])


_ROW_ORACLE = """
SELECT c_custkey, c_name, c_nationkey FROM customer WHERE c_custkey <= 60
UNION
SELECT c_custkey, c_name, c_nationkey FROM customer WHERE c_custkey BETWEEN 40 AND 100
"""


@df_query("merge_processor_row", _ROW_ORACLE)
def merge_processor_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = tables.load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    base = cust.filter("c_custkey <= 60")
    tgt = cust.filter("c_custkey BETWEEN 40 AND 100")
    return merge_row(base, [tgt], distinct=True)


# --- CDC changeset apply (r7) -------------------------------------------------
# Deterministic changeset synthesized from the fixture itself: every
# %5 key updates (+10.00 exact decimal) except %15 keys which delete;
# %100 keys re-insert under a shifted key. One full-outer join.

_UPSERT_ORACLE = """
WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS s FROM orders),
ch AS (
  SELECT o_orderkey AS k, o_totalprice + 10 AS p, o_orderstatus AS s,
         CASE WHEN o_orderkey % 15 = 0 THEN 'D' ELSE 'U' END AS op
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, 'N', 'I'
  FROM orders WHERE o_orderkey % 100 = 0),
j AS (SELECT b.k AS bk, b.p AS bp, b.s AS bs, c.k AS ck, c.p AS cp, c.s AS cs, c.op
      FROM base b FULL OUTER JOIN ch c ON c.k = b.k)
SELECT CAST(COALESCE(bk, ck) AS BIGINT) AS o_orderkey,
       CAST(CASE WHEN ck IS NOT NULL THEN cp ELSE bp END AS DOUBLE) AS o_totalprice,
       CASE WHEN ck IS NOT NULL THEN cs ELSE bs END AS o_orderstatus,
       CASE WHEN bk IS NULL THEN 'insert'
            WHEN ck IS NOT NULL THEN 'update'
            ELSE 'keep' END AS change_type
FROM j
WHERE NOT (ck IS NOT NULL AND op = 'D') AND (bk IS NOT NULL OR op = 'I')
"""


@df_query("merge_apply_changeset", _UPSERT_ORACLE)
def merge_apply_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert: apply an I/U/D changeset to the orders snapshot via
    operators.merge.apply_changeset (one key-keyed full-outer join, no
    windows) — the lakehouse MERGE INTO primitive as a pure DataFrame
    composition."""
    from pyspark.sql import functions as F

    from datafusion_server_spark.operators.merge import apply_changeset

    orders = tables.load(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    ud = base.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 10).alias("o_totalprice"),
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 15 == 0, "D").otherwise("U").alias("op"),
    )
    ins = base.filter(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_totalprice",
        F.lit("N").alias("o_orderstatus"),
        F.lit("I").alias("op"),
    )
    out = apply_changeset(base, ud.unionByName(ins), "o_orderkey")
    return out.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderstatus",
        "change_type",
    )


# --- SCD Type 2 history merge (r7) --------------------------------------------
# History synthesized from customer (all rows current since 1990);
# changeset: every %4 key re-asserts its attributes (no-op unless %8,
# which moves nation +1 -> close + reopen), %200 keys insert under a
# shifted key. Null-safe attribute comparison on BOTH engines.

_SCD2_SAME = "(j.bnm IS NOT DISTINCT FROM j.cnm AND j.bnat IS NOT DISTINCT FROM j.cnat)"

_SCD2_ORACLE = f"""
WITH cust AS (SELECT c_custkey AS k, c_name AS nm, CAST(c_nationkey AS BIGINT) AS nat
              FROM customer),
hist AS (SELECT k, nm, nat, DATE '1990-01-01' AS vf, CAST(NULL AS DATE) AS vt FROM cust),
ch AS (
  SELECT k, nm, CASE WHEN k % 8 = 0 THEN nat + 1 ELSE nat END AS nat
  FROM cust WHERE k % 4 = 0
  UNION ALL
  SELECT k + 1000000, nm, nat FROM cust WHERE k % 200 = 0),
j AS (SELECT h.k AS bk, h.nm AS bnm, h.nat AS bnat, h.vf,
             c.k AS ck, c.nm AS cnm, c.nat AS cnat
      FROM hist h FULL OUTER JOIN ch c ON c.k = h.k)
SELECT CAST(bk AS BIGINT) AS c_custkey, bnm AS c_name, bnat AS c_nationkey,
       vf AS valid_from, CAST(NULL AS DATE) AS valid_to
FROM j WHERE bk IS NOT NULL AND (ck IS NULL OR {_SCD2_SAME})
UNION ALL
SELECT CAST(bk AS BIGINT), bnm, bnat, vf, DATE '2000-06-01'
FROM j WHERE bk IS NOT NULL AND ck IS NOT NULL AND NOT {_SCD2_SAME}
UNION ALL
SELECT CAST(COALESCE(bk, ck) AS BIGINT), cnm, cnat, DATE '2000-06-01', CAST(NULL AS DATE)
FROM j WHERE ck IS NOT NULL AND (bk IS NULL OR NOT {_SCD2_SAME})
"""


@df_query("merge_scd2_history", _SCD2_ORACLE)
def merge_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 merge via operators.merge.scd2_apply: identical
    attribute re-assertions are no-ops, changed attributes close the
    current version and open a new one, new keys open their first
    version — full lineage preserved with one current-slice join."""
    import datetime

    from pyspark.sql import functions as F

    from datafusion_server_spark.operators.merge import scd2_apply

    cust = tables.load(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "c_name",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
    )
    hist = base.select(
        "*",
        F.to_date(F.lit("1990-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    ch = base.filter(F.col("c_custkey") % 4 == 0).select(
        "c_custkey",
        "c_name",
        F.when(
            F.col("c_custkey") % 8 == 0, F.col("c_nationkey") + 1
        ).otherwise(F.col("c_nationkey")).alias("c_nationkey"),
    ).unionByName(
        base.filter(F.col("c_custkey") % 200 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            "c_name",
            "c_nationkey",
        )
    )
    return scd2_apply(
        hist, ch, "c_custkey", change_ts=datetime.date(2000, 6, 1)
    )
