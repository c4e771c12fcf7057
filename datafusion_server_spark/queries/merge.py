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
