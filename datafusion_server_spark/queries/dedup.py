"""Dedup query inventory: Spark side = operators.dedup library; oracle =
equivalent DuckDB SQL over the same parquet (md5-based, bit-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_server_spark import tables
from datafusion_server_spark.operators import dedup
from datafusion_server_spark.queries import df_query

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS

# Shared oracle CTEs: word-trigram shingle sets of the documents table.
_SHINGLES_CTE = """
words AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id,
              UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 2),
                                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
       FROM words)
"""

_MH_COLS = ",\n       ".join(
    f"MIN(md5('{i}:' || shingle)) AS mh{i}" for i in range(NUM_HASHES)
)

_SIG_CTE = f"""
sig AS (SELECT CAST(doc_id AS BIGINT) AS id,
       {_MH_COLS}
FROM sh GROUP BY doc_id)
"""


@df_query(
    "dedup_exact",
    """
    SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           md5(text) AS text_hash
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.exact_duplicates(docs, "text", "doc_id")


@df_query(
    "dedup_minhash_signatures",
    f"WITH {_SHINGLES_CTE}, {_SIG_CTE} SELECT * FROM sig",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, "text", "doc_id", NUM_HASHES)


_BAND_CASES = " ".join(
    "WHEN {b} THEN {expr}".format(
        b=b,
        expr=" || '|' || ".join(f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)),
    )
    for b in range(BANDS)
)

_LSH_ORACLE = f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.id, bs.band, CASE bs.band {_BAND_CASES} END AS bucket
  FROM sig, (SELECT UNNEST([{", ".join(str(b) for b in range(BANDS))}]) AS band) bs),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY p.id_a, p.id_b)
SELECT p.id_a, p.id_b,
       COALESCE(c.n_common, 0) AS n_common,
       za.n_sh AS n_a, zb.n_sh AS n_b,
       ROUND(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
             / CAST(za.n_sh + zb.n_sh - COALESCE(c.n_common, 0) AS DOUBLE), 6) AS jaccard
FROM pairs p
LEFT JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
JOIN sizes za ON za.id = p.id_a
JOIN sizes zb ON zb.id = p.id_b
"""


@df_query("dedup_lsh_pairs", _LSH_ORACLE)
def dedup_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(docs, "text", "doc_id", NUM_HASHES, BANDS)


_SIMHASH_BITS = 32
_SIMHASH_SUMS = ",\n       ".join(
    f"SUM(CASE WHEN SUBSTR(h, {p + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s{p}"
    for p in range(_SIMHASH_BITS)
)
_SIMHASH_CONCAT = " || ".join(
    f"(CASE WHEN s{p} > 0 THEN '1' ELSE '0' END)" for p in range(_SIMHASH_BITS)
)

_SIMHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents),
hashed AS (SELECT doc_id, md5(tok) AS h FROM toks),
sums AS (SELECT CAST(doc_id AS BIGINT) AS id,
       {_SIMHASH_SUMS}
FROM hashed GROUP BY doc_id)
SELECT id, {_SIMHASH_CONCAT} AS simhash FROM sums
"""


@df_query("dedup_simhash", _SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.simhash(docs, "text", "doc_id", _SIMHASH_BITS)
