"""Dedup query inventory: Spark side = operators.dedup library; oracle =
equivalent DuckDB SQL over the same parquet (md5-based, bit-reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import dedup
from datafusion_server_spark.queries import df_query

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS

# Shared oracle CTEs: word-trigram shingle sets of the documents table.
# sh is MATERIALIZED: every consumer references it 2-4x, and DuckDB's
# inliner replays the whole split+unnest pipeline per reference — at
# sf0.1 one consumer (the pair-explanation aggregation) even picks an
# inlined plan that exhausts memory. Materialization is semantics-free.
_SHINGLES_CTE = """
words AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (SELECT DISTINCT doc_id,
              UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 2),
                                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
       FROM words)
"""

# hash i = (a + i*b) mod 2^32 where a/b are the first two 32-bit slices
# of md5(shingle) — mirrors operators.dedup._minhash_aggs (ONE md5 per
# shingle supplies all 16 hashes via linear perturbation)
_MH_A = "CAST(('0x' || SUBSTR(md5(shingle), 1, 8)) AS BIGINT)"
_MH_B = "CAST(('0x' || SUBSTR(md5(shingle), 9, 8)) AS BIGINT)"
_MH_COLS = ",\n       ".join(
    f"MIN(({_MH_A} + {i} * {_MH_B}) % 4294967296) AS mh{i}"
    for i in range(NUM_HASHES)
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
        expr=" || '|' || ".join(
            f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        ),
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
    """Headline LSH near-dup row. Runs the r12 DEFAULT cap path
    (``max_bucket_members="auto"`` — stats-derived, floor 256): the
    sf0.01 bucket histogram is {1: 1835, 2: 78, 3: 3} and stays orders
    of magnitude under the floor at every gated scale, so the all-pairs
    oracle is exact for the capped plan too (equality-below-cap)."""
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(docs, "text", "doc_id", NUM_HASHES, BANDS)


# Hot-bucket guard, oracle-verified with a BINDING cap (r10, verdict
# task 3): max_bucket_members=2 actually drops members on this fixture
# (the sf0.01 bucket-size histogram is {1: 1835, 2: 78, 3: 3}, so three
# buckets lose their largest id), proving the deterministic
# smallest-ids semantics end to end, not just at the unit level. The
# oracle reproduces the cap as ROW_NUMBER() OVER (PARTITION BY band,
# bucket ORDER BY id) <= cap — the exact definition of the guard.
_BUCKET_CAP = 2

_LSH_CAPPED_ORACLE = f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.id, bs.band, CASE bs.band {_BAND_CASES} END AS bucket
  FROM sig, (SELECT UNNEST([{", ".join(str(b) for b in range(BANDS))}]) AS band) bs),
capped AS (
  SELECT id, band, bucket FROM (
    SELECT id, band, bucket,
           ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY id) AS rn
    FROM banded) t
  WHERE rn <= {_BUCKET_CAP}),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM capped a JOIN capped b
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


@df_query("dedup_lsh_pairs_bucket_capped", _LSH_CAPPED_ORACLE)
def dedup_lsh_pairs_bucket_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.lsh_candidate_pairs(
        docs, "text", "doc_id", NUM_HASHES, BANDS,
        max_bucket_members=_BUCKET_CAP,
    )


# Fuzzy-dedup clustering: LSH pairs -> jaccard threshold -> connected
# components (min-label propagation; oracle = recursive-CTE transitive
# closure) -> per-cluster survivor + size.
_CLUSTER_THRESHOLD = 0.5

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.id, bs.band, CASE bs.band {_BAND_CASES} END AS bucket
  FROM sig, (SELECT UNNEST([{", ".join(str(b) for b in range(BANDS))}]) AS band) bs),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cand p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY p.id_a, p.id_b),
scored AS (
  SELECT p.id_a, p.id_b
  FROM cand p
  JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
  JOIN sizes za ON za.id = p.id_a
  JOIN sizes zb ON zb.id = p.id_b
  WHERE ROUND(CAST(c.n_common AS DOUBLE)
              / CAST(za.n_sh + zb.n_sh - c.n_common AS DOUBLE), 6) >= {_CLUSTER_THRESHOLD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM scored
  UNION SELECT id_b, id_a FROM scored),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
SELECT CAST(component AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM comp GROUP BY component
"""


@df_query("dedup_clusters", _CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.dedup_clusters(
        docs, "text", "doc_id", NUM_HASHES, BANDS, threshold=_CLUSTER_THRESHOLD
    )


# Fuzzy survivor materialization: the rows a training pipeline ships
# after FUZZY dedup — drop every clustered doc except its min-id
# survivor; docs in no cluster pass through untouched.
_FUZZY_SURVIVORS_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.id, bs.band, CASE bs.band {_BAND_CASES} END AS bucket
  FROM sig, (SELECT UNNEST([{", ".join(str(b) for b in range(BANDS))}]) AS band) bs),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cand p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY p.id_a, p.id_b),
scored AS (
  SELECT p.id_a, p.id_b
  FROM cand p
  JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
  JOIN sizes za ON za.id = p.id_a
  JOIN sizes zb ON zb.id = p.id_b
  WHERE ROUND(CAST(c.n_common AS DOUBLE)
              / CAST(za.n_sh + zb.n_sh - c.n_common AS DOUBLE), 6) >= {_CLUSTER_THRESHOLD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM scored
  UNION SELECT id_b, id_a FROM scored),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, d.source
FROM documents d
LEFT JOIN comp c ON c.node = CAST(d.doc_id AS BIGINT)
WHERE c.node IS NULL OR c.component = CAST(d.doc_id AS BIGINT)
"""


@df_query("dedup_fuzzy_survivors", _FUZZY_SURVIVORS_ORACLE)
def dedup_fuzzy_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization half of FUZZY dedup: keep unclustered docs
    plus each cluster's min-id survivor."""
    from pyspark.sql import functions as F

    docs = tables.load(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id", NUM_HASHES, BANDS).filter(
        F.col("jaccard") >= _CLUSTER_THRESHOLD
    )
    comp = dedup.connected_components(pairs)
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(drop, "doc_id", "left_anti").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "lang", "source"
    )


# Quality-aware survivor selection (r8): keep each cluster's LONGEST
# member (ties to the smallest id) — the keep-the-most-complete-version
# policy real pipelines use, vs dedup_clusters' min-id convention.
_SURVIVOR_POLICY_ORACLE = (
    _FUZZY_SURVIVORS_ORACLE[: _FUZZY_SURVIVORS_ORACLE.index("SELECT CAST(d.doc_id")]
    + """, m AS (
  SELECT c.component, c.node, CAST(d.n_chars AS BIGINT) AS len
  FROM comp c JOIN documents d ON CAST(d.doc_id AS BIGINT) = c.node),
rk AS (
  SELECT component, node, len,
         COUNT(*) OVER (PARTITION BY component) AS n_members,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY len DESC, node ASC) AS rn
  FROM m)
SELECT CAST(component AS BIGINT) AS component,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(node AS BIGINT) AS keep_id,
       len AS keep_policy
FROM rk WHERE rn = 1
"""
)


@df_query("dedup_survivors_keep_longest", _SURVIVOR_POLICY_ORACLE)
def dedup_survivors_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster: the longest member survives (ties to the
    smallest id) — quality-aware survivor materialization."""
    from pyspark.sql import functions as F

    docs = tables.load(spark, sf_dir, "documents")
    return dedup.fuzzy_survivors_by_policy(
        docs, "text", "doc_id", F.col("n_chars").cast("bigint"),
        NUM_HASHES, BANDS, threshold=_CLUSTER_THRESHOLD,
    )


# n-gram Jaccard: exact near-dup scoring (no MinHash approximation) with
# the document-frequency cap guarding the shared-shingle self-join.
_NGRAM_MAX_DF = 100
_NGRAM_THRESHOLD = 0.5

_NGRAM_JACCARD_ORACLE = f"""
WITH {_SHINGLES_CTE},
rare AS (
  SELECT sh.doc_id, sh.shingle FROM sh
  JOIN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {_NGRAM_MAX_DF}) r
    ON r.shingle = sh.shingle),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM rare GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT CAST(c.id_a AS BIGINT) AS id_a, CAST(c.id_b AS BIGINT) AS id_b,
       c.n_common, za.n_sh AS n_a, zb.n_sh AS n_b,
       ROUND(CAST(c.n_common AS DOUBLE)
             / CAST(za.n_sh + zb.n_sh - c.n_common AS DOUBLE), 6) AS jaccard
FROM common c
JOIN sizes za ON za.doc_id = c.id_a
JOIN sizes zb ON zb.doc_id = c.id_b
WHERE ROUND(CAST(c.n_common AS DOUBLE)
            / CAST(za.n_sh + zb.n_sh - c.n_common AS DOUBLE), 6) >= {_NGRAM_THRESHOLD}
"""


@df_query("dedup_ngram_jaccard", _NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=_NGRAM_THRESHOLD, max_shingle_df=_NGRAM_MAX_DF
    )


@df_query(
    "dedup_materialize_survivors",
    """
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN (SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)) k
      ON k.keep_id = d.doc_id
    """,
)
def dedup_materialize_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialization half of exact dedup: keep one row (min id) per
    distinct text — the output a training-data pipeline actually ships."""
    from pyspark.sql import functions as F

    docs = tables.load(spark, sf_dir, "documents")
    keep = dedup.exact_duplicates(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    return docs.join(keep, "doc_id").select("doc_id", "lang", "source", "n_chars")


_PIPELINE_ORACLE = """
WITH w AS (
  SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS words, text FROM documents),
quality AS (
  SELECT doc_id, lang,
         CAST(LEN(LIST_DISTINCT(words)) AS DOUBLE) / CAST(LEN(words) AS DOUBLE) AS unique_ratio,
         LENGTH(text) >= 100 AS len_ok,
         md5(text) AS fp
  FROM w),
kept AS (
  SELECT q.* FROM quality q
  JOIN (SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)) k
    ON k.keep_id = q.doc_id
  WHERE q.unique_ratio > 0.3 AND q.len_ok)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(unique_ratio AS DECIMAL(18,12))) AS DOUBLE)
             / COUNT(*), 6) AS avg_unique_ratio
FROM kept GROUP BY lang
"""


@df_query("pipeline_filter_dedup_stats", _PIPELINE_ORACLE)
def pipeline_filter_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline composition: quality filter ->
    exact dedup -> per-language stats, all in one DataFrame plan."""
    from pyspark.sql import functions as F

    docs = tables.load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    quality = docs.select(
        "doc_id",
        "lang",
        (
            F.size(F.array_distinct(words)).cast("double")
            / F.size(words).cast("double")
        ).alias("unique_ratio"),
        (F.length("text") >= 100).alias("len_ok"),
    )
    keep = dedup.exact_duplicates(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    kept = quality.join(keep, "doc_id").filter("unique_ratio > 0.3 AND len_ok")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.col("unique_ratio").cast("decimal(18,12)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_unique_ratio"),
    )


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


# --- incremental dedup: a "new batch" (doc_id % 10 >= 8, SF-independent
# 20% slice) probed against the signature index of the remaining corpus.

_INC_ORACLE = f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.id, bs.band, CASE bs.band {_BAND_CASES} END AS bucket
  FROM sig, (SELECT UNNEST([{", ".join(str(b) for b in range(BANDS))}]) AS band) bs),
pairs AS (
  SELECT DISTINCT a.id AS new_id, b.id AS index_id
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket
   AND a.id % 10 >= 8 AND b.id % 10 < 8),
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT p.new_id, p.index_id, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.new_id
  JOIN sh sb ON sb.doc_id = p.index_id AND sb.shingle = sa.shingle
  GROUP BY p.new_id, p.index_id)
SELECT p.new_id, p.index_id,
       COALESCE(c.n_common, 0) AS n_common,
       zn.n_sh AS n_new, zi.n_sh AS n_index,
       ROUND(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
             / CAST(zn.n_sh + zi.n_sh - COALESCE(c.n_common, 0) AS DOUBLE), 6) AS jaccard
FROM pairs p
LEFT JOIN common c ON c.new_id = p.new_id AND c.index_id = p.index_id
JOIN sizes zn ON zn.id = p.new_id
JOIN sizes zi ON zi.id = p.index_id
"""


@df_query("dedup_incremental_lsh", _INC_ORACLE)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest shape: sign ONLY the new batch, probe the pre-built
    corpus signature index — cost linear in the batch, never corpus^2."""
    docs = tables.load(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 10 < 8)
    new_batch = docs.filter(F.col("doc_id") % 10 >= 8)
    index = dedup.lsh_signature_index(existing, "text", "doc_id", NUM_HASHES)
    return dedup.lsh_pairs_against_index(
        new_batch, index, "text", "doc_id", NUM_HASHES, BANDS
    )


# r13 (verdict task 2): the INDEX-side bucket cap (r12, opt-in) gets its
# own driver-gated row with a cap SMALL enough to BIND at fixture scale
# (cap=2 smallest ids per (band, bucket) on the index side), so the
# deterministic-keep + recall-trading semantics — not just the
# no-op-below-cap case — pass through the external gate. The oracle
# mirrors the cap with a ROW_NUMBER window over the SAME (band, bucket,
# id-ascending) key the Spark guard uses.
_INC_CAP = 2

_INC_CAPPED_ORACLE = f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.id, bs.band, CASE bs.band {_BAND_CASES} END AS bucket
  FROM sig, (SELECT UNNEST([{", ".join(str(b) for b in range(BANDS))}]) AS band) bs),
ib AS (
  SELECT id, band, bucket FROM (
    SELECT id, band, bucket,
           ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY id) AS rn
    FROM banded WHERE id % 10 < 8) capped
  WHERE rn <= {_INC_CAP}),
pairs AS (
  SELECT DISTINCT n.id AS new_id, i.id AS index_id
  FROM banded n JOIN ib i
    ON n.band = i.band AND n.bucket = i.bucket
   AND n.id % 10 >= 8),
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT p.new_id, p.index_id, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.new_id
  JOIN sh sb ON sb.doc_id = p.index_id AND sb.shingle = sa.shingle
  GROUP BY p.new_id, p.index_id)
SELECT p.new_id, p.index_id,
       COALESCE(c.n_common, 0) AS n_common,
       zn.n_sh AS n_new, zi.n_sh AS n_index,
       ROUND(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
             / CAST(zn.n_sh + zi.n_sh - COALESCE(c.n_common, 0) AS DOUBLE), 6) AS jaccard
FROM pairs p
LEFT JOIN common c ON c.new_id = p.new_id AND c.index_id = p.index_id
JOIN sizes zn ON zn.id = p.new_id
JOIN sizes zi ON zi.id = p.index_id
"""


@df_query("dedup_incremental_lsh_capped", _INC_CAPPED_ORACLE)
def dedup_incremental_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental probe with the BINDING index-side bucket cap: a
    degenerate corpus bucket contributes only its ``_INC_CAP`` smallest
    ids to the candidate fan-out (recall-trading, deterministic keeps —
    see ``lsh_pairs_against_index``'s docstring for why this stays
    opt-in while the self-join cap defaults on)."""
    docs = tables.load(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 10 < 8)
    new_batch = docs.filter(F.col("doc_id") % 10 >= 8)
    index = dedup.lsh_signature_index(existing, "text", "doc_id", NUM_HASHES)
    return dedup.lsh_pairs_against_index(
        new_batch, index, "text", "doc_id", NUM_HASHES, BANDS,
        index_bucket_cap=_INC_CAP,
    )


# dedup-aware (leakage-safe) splitting: the hash band is taken over the
# near-dup component ROOT so no cluster straddles train/val/test. The
# oracle reuses the EXACT cluster CTE chain from _CLUSTERS_ORACLE (the
# same no-desync stance as the other composed oracles).
_LS_VAL, _LS_TEST = 0.1, 0.1

_LEAKAGE_SPLIT_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.id, bs.band, CASE bs.band {_BAND_CASES} END AS bucket
  FROM sig, (SELECT UNNEST([{", ".join(str(b) for b in range(BANDS))}]) AS band) bs),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cand p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY p.id_a, p.id_b),
scored AS (
  SELECT p.id_a, p.id_b
  FROM cand p
  JOIN common c ON c.id_a = p.id_a AND c.id_b = p.id_b
  JOIN sizes za ON za.id = p.id_a
  JOIN sizes zb ON zb.id = p.id_b
  WHERE ROUND(CAST(c.n_common AS DOUBLE)
              / CAST(za.n_sh + zb.n_sh - c.n_common AS DOUBLE), 6) >= {_CLUSTER_THRESHOLD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM scored
  UNION SELECT id_b, id_a FROM scored),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node),
rooted AS (
  SELECT d.doc_id,
         CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS split_root
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
assigned AS (
  SELECT doc_id, split_root,
         CASE WHEN (CAST(('0x' || substr(md5('split:' || CAST(split_root AS VARCHAR)), 1, 15)) AS BIGINT)
                    / CAST(16.0 ** 15 AS DOUBLE)) < {_LS_VAL} THEN 'val'
              WHEN (CAST(('0x' || substr(md5('split:' || CAST(split_root AS VARCHAR)), 1, 15)) AS BIGINT)
                    / CAST(16.0 ** 15 AS DOUBLE)) < {_LS_VAL + _LS_TEST} THEN 'test'
              ELSE 'train' END AS split
  FROM rooted)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT split_root) AS BIGINT) AS n_roots,
       CAST(MIN(doc_id) AS BIGINT) AS min_id, CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM assigned GROUP BY split
"""


@df_query("split_leakage_safe", _LEAKAGE_SPLIT_ORACLE)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators import sampling

    docs = tables.load(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id", NUM_HASHES, BANDS).filter(
        F.col("jaccard") >= _CLUSTER_THRESHOLD
    )
    assigned = sampling.split_leakage_safe(
        docs, "doc_id", pairs, val_frac=_LS_VAL, test_frac=_LS_TEST
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("split_root").cast("bigint").alias("n_roots"),
        F.min("doc_id").cast("bigint").alias("min_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
    )


# prefix-filtering EXACT Jaccard join (PPJoin/AllPairs bound): rarest-
# first prefixes generate candidates, exact verification on candidates
# only — provably identical to the all-pairs threshold join.
_PF_THRESHOLD = 0.5

_PREFIX_JACCARD_ORACLE = f"""
WITH {_SHINGLES_CTE},
dfreq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS dfr FROM sh GROUP BY shingle),
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh
          FROM sh GROUP BY doc_id),
ranked AS (
  SELECT CAST(s.doc_id AS BIGINT) AS id, z.n_sh, s.shingle,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id
                            ORDER BY d.dfr ASC, s.shingle ASC) AS rn
  FROM sh s
  JOIN dfreq d ON d.shingle = s.shingle
  JOIN sizes z ON z.id = s.doc_id),
prefix AS (
  SELECT id, n_sh, shingle FROM ranked
  WHERE rn <= n_sh - CEIL({_PF_THRESHOLD} * n_sh) + 1),
cand AS (
  SELECT DISTINCT a.id AS id_a, a.n_sh AS n_a, b.id AS id_b, b.n_sh AS n_b
  FROM prefix a JOIN prefix b ON b.shingle = a.shingle AND a.id < b.id),
common AS (
  SELECT c.id_a, c.id_b, c.n_a, c.n_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cand c
  JOIN sh sa ON CAST(sa.doc_id AS BIGINT) = c.id_a
  JOIN sh sb ON CAST(sb.doc_id AS BIGINT) = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b, c.n_a, c.n_b)
SELECT id_a, id_b, n_common, n_a, n_b,
       ROUND(CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE), 6) AS jaccard
FROM common
WHERE ROUND(CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE), 6) >= {_PF_THRESHOLD}
"""


@df_query("dedup_prefix_jaccard", _PREFIX_JACCARD_ORACLE)
def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.prefix_jaccard_pairs(
        docs, "text", "doc_id", threshold=_PF_THRESHOLD
    )


# asymmetric containment dedup: |A ∩ B| / |A| — catches a short doc
# embedded inside a longer one (quote farms, concatenated dumps), which
# symmetric Jaccard under-scores. Reuses the df-capped shared-shingle
# machinery; either-direction containment above the threshold flags the
# pair, keep = the LONGER side's id convention is left to the consumer.
_CONT_THRESHOLD = 0.8

_CONTAINMENT_ORACLE = f"""
WITH {_SHINGLES_CTE},
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh
          FROM sh GROUP BY doc_id),
common AS (
  SELECT CAST(sa.doc_id AS BIGINT) AS id_a, CAST(sb.doc_id AS BIGINT) AS id_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM sh sa JOIN sh sb ON sb.shingle = sa.shingle AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2)
SELECT c.id_a, c.id_b, c.n_common, za.n_sh AS n_a, zb.n_sh AS n_b,
       ROUND(CAST(c.n_common AS DOUBLE) / CAST(za.n_sh AS DOUBLE), 6) AS containment_a,
       ROUND(CAST(c.n_common AS DOUBLE) / CAST(zb.n_sh AS DOUBLE), 6) AS containment_b
FROM common c
JOIN sizes za ON za.id = c.id_a
JOIN sizes zb ON zb.id = c.id_b
WHERE ROUND(CAST(c.n_common AS DOUBLE) / CAST(za.n_sh AS DOUBLE), 6) >= {_CONT_THRESHOLD}
   OR ROUND(CAST(c.n_common AS DOUBLE) / CAST(zb.n_sh AS DOUBLE), 6) >= {_CONT_THRESHOLD}
"""


@df_query("dedup_containment_pairs", _CONTAINMENT_ORACLE)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    sh = dedup.shingle_sets(docs, "text", "doc_id")
    sized = sh.join(
        sh.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sh")), "id"
    )
    common = (
        sized.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
        .join(
            sized.select(
                F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"
            ),
            "shingle",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    ca = F.round(F.col("n_common").cast("double") / F.col("n_a").cast("double"), 6)
    cb = F.round(F.col("n_common").cast("double") / F.col("n_b").cast("double"), 6)
    return common.select(
        "id_a",
        "id_b",
        "n_common",
        "n_a",
        "n_b",
        ca.alias("containment_a"),
        cb.alias("containment_b"),
    ).filter(
        (F.col("containment_a") >= _CONT_THRESHOLD)
        | (F.col("containment_b") >= _CONT_THRESHOLD)
    )


# IDF-weighted soft Jaccard: rare-shingle overlap outweighs boilerplate.
_WJ_THRESHOLD = 0.4

_WJACCARD_ORACLE = f"""
WITH {_SHINGLES_CTE},
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
dfreq AS (
  SELECT shingle,
         CAST(ROUND(LN((SELECT n FROM nd) / CAST(COUNT(*) AS DOUBLE)), 8) AS DECIMAL(18,8)) AS idf
  FROM sh GROUP BY shingle HAVING COUNT(*) <= 100),
weighted AS (
  SELECT CAST(s.doc_id AS BIGINT) AS id, s.shingle, d.idf
  FROM sh s JOIN dfreq d ON d.shingle = s.shingle),
sums AS (SELECT id, SUM(idf) AS w FROM weighted GROUP BY id),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, sa.w AS wa, sb.w AS wb, SUM(a.idf) AS wc
  FROM weighted a
  JOIN weighted b ON b.shingle = a.shingle AND a.id < b.id
  JOIN sums sa ON sa.id = a.id
  JOIN sums sb ON sb.id = b.id
  GROUP BY a.id, b.id, sa.w, sb.w)
SELECT id_a, id_b,
       ROUND(CAST(wc AS DOUBLE), 6) AS w_common,
       ROUND(CAST(wa AS DOUBLE), 6) AS w_a,
       ROUND(CAST(wb AS DOUBLE), 6) AS w_b,
       ROUND(CAST(wc AS DOUBLE) / (CAST(wa AS DOUBLE) + CAST(wb AS DOUBLE) - CAST(wc AS DOUBLE)), 6) AS wjaccard
FROM common
WHERE ROUND(CAST(wc AS DOUBLE) / (CAST(wa AS DOUBLE) + CAST(wb AS DOUBLE) - CAST(wc AS DOUBLE)), 6) >= {_WJ_THRESHOLD}
"""


@df_query("dedup_idf_weighted_jaccard", _WJACCARD_ORACLE)
def dedup_idf_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.idf_weighted_jaccard_pairs(
        docs, "text", "doc_id", threshold=_WJ_THRESHOLD
    )


# dedup explanation: for each over-threshold capped-Jaccard pair, the
# most DISTINCTIVE shared shingle (lowest corpus df, ties lexicographic)
# — the "why did dedup flag this" review column.
_EXPLAIN_THRESHOLD = 0.5

# dfreq/rare/sizes/shared are MATERIALIZED: DuckDB otherwise INLINES the
# rare-self-join into the pair aggregation and its optimizer picks a
# plan that exhausts memory at sf0.1. The lexicographic (dfr, shingle)
# argmin is a ROW_NUMBER window, NOT MIN(struct): this DuckDB's
# struct-MIN aggregate degrades catastrophically over ~1M groups
# (minutes/OOM where the window form takes seconds) — semantics are
# identical (min over the (dfr, shingle) pair).
_EXPLAIN_ORACLE = f"""
WITH {_SHINGLES_CTE},
dfreq AS MATERIALIZED (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS dfr FROM sh GROUP BY shingle),
rare AS MATERIALIZED (SELECT s.doc_id, s.shingle, d.dfr FROM sh s JOIN dfreq d ON d.shingle = s.shingle
         WHERE d.dfr <= 100),
sizes AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM rare GROUP BY doc_id),
shared AS MATERIALIZED (
  SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
         a.shingle, a.dfr
  FROM rare a JOIN rare b ON b.shingle = a.shingle AND a.doc_id < b.doc_id),
ranked AS MATERIALIZED (
  SELECT id_a, id_b, shingle, dfr,
         ROW_NUMBER() OVER (PARTITION BY id_a, id_b
                            ORDER BY dfr ASC, shingle ASC) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY id_a, id_b) AS BIGINT) AS n_common
  FROM shared),
pairs AS (
  SELECT r.id_a, r.id_b, r.n_common,
         za.n_sh AS n_a, zb.n_sh AS n_b,
         r.shingle AS best_shingle, r.dfr AS best_dfr
  FROM ranked r
  JOIN sizes za ON CAST(za.doc_id AS BIGINT) = r.id_a
  JOIN sizes zb ON CAST(zb.doc_id AS BIGINT) = r.id_b
  WHERE r.rn = 1)
SELECT id_a, id_b,
       ROUND(CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE), 6) AS jaccard,
       best_shingle AS top_shared_shingle,
       CAST(best_dfr AS BIGINT) AS shingle_df
FROM pairs
WHERE ROUND(CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE), 6) >= {_EXPLAIN_THRESHOLD}
"""


@df_query("dedup_pair_explanations", _EXPLAIN_ORACLE)
def dedup_pair_explanations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The review column for flagged near-dup pairs: alongside the
    capped Jaccard, the lowest-df shared shingle — the most distinctive
    piece of text two docs have in common (min over a (df, shingle)
    struct — deterministic)."""
    docs = tables.load(spark, sf_dir, "documents")
    sh = dedup.shingle_sets(docs, "text", "doc_id")
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("bigint").alias("dfr"))
    rare = sh.join(dfreq.filter(F.col("dfr") <= 100), "shingle")
    sizes = rare.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    sized = rare.join(sizes, "id")
    shared = (
        sized.select(
            F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle", "dfr"
        )
        .join(
            sized.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"),
            "shingle",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    pairs = shared.groupBy("id_a", "id_b", "n_a", "n_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
        F.min(F.struct(F.col("dfr"), F.col("shingle"))).alias("best"),
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
            6,
        ).alias("jaccard"),
        F.col("best.shingle").alias("top_shared_shingle"),
        F.col("best.dfr").cast("bigint").alias("shingle_df"),
    ).filter(F.col("jaccard") >= _EXPLAIN_THRESHOLD)


# -- ExactSubstr-style duplicated-span detection (Lee et al. 2021) -----------
SPAN_L = 8  # span granularity: a position is duplicated iff its word 8-gram recurs
SPAN_MIN_COUNT = 2

_SPAN_CTE = f"""
wordsv AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
pgpos AS (SELECT doc_id, w,
                 UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w) - {SPAN_L - 1}, 0))) AS pos
          FROM wordsv),
pg AS (SELECT doc_id, pos,
              md5(ARRAY_TO_STRING(w[pos : pos + {SPAN_L - 1}], ' ')) AS gh
       FROM pgpos),
dup AS (SELECT doc_id, pos FROM
          (SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY gh) AS n FROM pg)
        WHERE n >= {SPAN_MIN_COUNT}),
runs AS (SELECT doc_id, pos,
                pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         FROM dup),
spans AS (SELECT CAST(doc_id AS BIGINT) AS id,
                 CAST(MIN(pos) AS BIGINT) AS span_start,
                 CAST(MAX(pos) + {SPAN_L - 1} AS BIGINT) AS span_end
          FROM runs GROUP BY doc_id, grp)
"""

# merged word COVERAGE (r6): runs whose starts are < SPAN_L apart cover
# overlapping words — group duplicated positions into islands wherever
# the gap to the previous one is <= SPAN_L-1, each island covering
# max(pos)+SPAN_L-min(pos) words, so dup_fraction never exceeds 1.
_COVER_CTE = f"""{_SPAN_CTE},
lagd AS (SELECT doc_id, pos,
                LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         FROM dup),
isl AS (SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > {SPAN_L - 1}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM lagd),
cover AS (SELECT CAST(doc_id AS BIGINT) AS id,
                 CAST(SUM(covered) AS BIGINT) AS dup_words
          FROM (SELECT doc_id, island,
                       MAX(pos) + {SPAN_L} - MIN(pos) AS covered
                FROM isl GROUP BY doc_id, island)
          GROUP BY doc_id)
"""


@df_query(
    "dedup_duplicate_spans",
    f"""
    WITH {_SPAN_CTE}
    SELECT id, span_start, span_end,
           CAST(span_end - span_start + 1 AS BIGINT) AS n_words
    FROM spans
    """,
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated substring spans (the ExactSubstr signal,
    arXiv:2107.06499): runs of word positions whose 8-gram occurs
    elsewhere in the corpus. One gram-hash shuffle + one per-doc window
    — never a suffix array, never a self-join."""
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.duplicate_ngram_spans(docs, "text", "doc_id", SPAN_L, SPAN_MIN_COUNT)


@df_query(
    "dedup_span_fraction",
    f"""
    WITH {_COVER_CTE},
    nw AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')) AS BIGINT) AS n_words
           FROM documents)
    SELECT nw.id, nw.n_words,
           CAST(COALESCE(c.dup_words, 0) AS BIGINT) AS dup_words,
           CASE WHEN nw.n_words > 0
                THEN ROUND(CAST(COALESCE(c.dup_words, 0) AS DOUBLE) / CAST(nw.n_words AS DOUBLE), 6)
                ELSE 0.0 END AS dup_fraction
    FROM nw LEFT JOIN cover c ON c.id = nw.id
    """,
)
def dedup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-content fraction (merged word coverage,
    never > 1) — the ExactSubstr keep/trim decision column for every
    document in the corpus."""
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.duplicate_span_fraction(docs, "text", "doc_id", SPAN_L, SPAN_MIN_COUNT)


@df_query(
    "dedup_span_sources",
    f"""
    WITH wordsv AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    pgpos AS (SELECT doc_id, w,
                     UNNEST(GENERATE_SERIES(1, GREATEST(LEN(w) - {SPAN_L - 1}, 0))) AS pos
              FROM wordsv),
    pg AS (SELECT doc_id, pos,
                  md5(ARRAY_TO_STRING(w[pos : pos + {SPAN_L - 1}], ' ')) AS gh
           FROM pgpos),
    cnt AS (SELECT gh, COUNT(*) AS n FROM pg GROUP BY gh),
    d AS (SELECT DISTINCT gh, doc_id FROM pg),
    g1 AS (SELECT gh, MIN(doc_id) AS m1, COUNT(*) AS nd FROM d GROUP BY gh),
    g2 AS (SELECT d.gh, MIN(d.doc_id) AS m2
           FROM d JOIN g1 ON g1.gh = d.gh WHERE d.doc_id > g1.m1 GROUP BY d.gh),
    pgm AS (SELECT c.gh, g1.nd, g1.m1, g2.m2
            FROM cnt c JOIN g1 ON g1.gh = c.gh LEFT JOIN g2 ON g2.gh = c.gh
            WHERE c.n >= {SPAN_MIN_COUNT}),
    dup AS (SELECT p.doc_id, p.pos, m.nd, m.m1, m.m2 FROM pg p JOIN pgm m ON m.gh = p.gh),
    runs AS (SELECT doc_id, pos, nd, m1, m2,
                    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             FROM dup),
    spans2 AS (SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + {SPAN_L - 1} AS span_end
               FROM runs GROUP BY doc_id, grp)
    SELECT CAST(s.doc_id AS BIGINT) AS id,
           CAST(s.span_start AS BIGINT) AS span_start,
           CAST(s.span_end AS BIGINT) AS span_end,
           CAST(s.span_end - s.span_start + 1 AS BIGINT) AS n_words,
           CAST(r.nd - 1 AS BIGINT) AS n_other_docs,
           CAST(CASE WHEN s.doc_id <> r.m1 THEN r.m1 ELSE r.m2 END AS BIGINT) AS sample_partner
    FROM spans2 s JOIN runs r ON r.doc_id = s.doc_id AND r.pos = s.span_start
    """,
)
def dedup_span_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated spans WITH provenance: distinct-other-doc count and a
    lowest-id partner for each span's opening gram — scalar grouped
    minima only, so the hottest boilerplate gram stays one bounded row
    at any corpus size."""
    docs = tables.load(spark, sf_dir, "documents")
    return dedup.duplicate_span_sources(docs, "text", "doc_id", SPAN_L, SPAN_MIN_COUNT)


@df_query("streaming_incremental_neardup", _INC_ORACLE)
def streaming_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dup detection: the document stream is signed per
    micro-batch and probed against the static corpus LSH index inside
    foreachBatch — continuous-ingest dedup with cost linear in the
    stream. Per-document independence makes the result micro-batch-
    invariant (proven in tests/test_streaming_neardup.py), so the full
    batch SQL is the oracle."""
    from datafusion_server_spark.streaming.dedup import stream_near_dup_probe

    return stream_near_dup_probe(
        spark, f"{sf_dir}/documents.parquet", num_hashes=NUM_HASHES, bands=BANDS
    )


# MinHash estimator calibration (r6): for every LSH candidate pair,
# the classic signature estimate (fraction of agreeing minima) next to
# the EXACT shingle-set Jaccard — the estimator-vs-truth diagnostic a
# dedup deployment reads before picking thresholds/band counts.
_EST_AGREE = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(NUM_HASHES)
)

_MH_EST_ORACLE = f"""
WITH {_SHINGLES_CTE}, {_SIG_CTE},
banded AS (
  SELECT sig.id, bs.band, CASE bs.band {_BAND_CASES} END AS bucket
  FROM sig, (SELECT UNNEST([{", ".join(str(b) for b in range(BANDS))}]) AS band) bs),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
agree AS (
  SELECT p.id_a, p.id_b,
         CAST({_EST_AGREE} AS BIGINT) AS n_agree
  FROM pairs p JOIN sig a ON a.id = p.id_a JOIN sig b ON b.id = p.id_b),
sizes AS (SELECT CAST(doc_id AS BIGINT) AS id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY p.id_a, p.id_b)
SELECT g.id_a, g.id_b, g.n_agree,
       ROUND(CAST(g.n_agree AS DOUBLE) / {NUM_HASHES}.0, 6) AS est_jaccard,
       ROUND(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
             / CAST(za.n_sh + zb.n_sh - COALESCE(c.n_common, 0) AS DOUBLE), 6)
           AS exact_jaccard,
       ROUND(ABS(CAST(g.n_agree AS DOUBLE) / {NUM_HASHES}.0
             - CAST(COALESCE(c.n_common, 0) AS DOUBLE)
               / CAST(za.n_sh + zb.n_sh - COALESCE(c.n_common, 0) AS DOUBLE)), 6)
           AS abs_err
FROM agree g
LEFT JOIN common c ON c.id_a = g.id_a AND c.id_b = g.id_b
JOIN sizes za ON za.id = g.id_a
JOIN sizes zb ON zb.id = g.id_b
"""


@df_query("dedup_minhash_estimate_calibration", _MH_EST_ORACLE)
def dedup_minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-candidate-pair MinHash Jaccard estimate (agreeing minima /
    num_hashes) next to the exact shingle-set Jaccard and the absolute
    error — the threshold/band-count calibration table."""
    docs = tables.load(spark, sf_dir, "documents")
    sigs = dedup.lsh_signature_index(docs, "text", "doc_id", NUM_HASHES)
    banded = dedup.lsh_bands(sigs, BANDS, NUM_HASHES // BANDS)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sig_a = sigs.select(
        F.col("id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
        F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    sig_b = sigs.select(
        F.col("id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
        F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    agree = sum(
        (F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(NUM_HASHES)
    )
    j = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
    exact = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / (
            F.col("n_a")
            + F.col("n_b")
            - F.size(F.array_intersect("sh_a", "sh_b"))
        ).cast("double")
    )
    est = agree.cast("double") / float(NUM_HASHES)
    return j.select(
        "id_a",
        "id_b",
        agree.cast("bigint").alias("n_agree"),
        F.round(est, 6).alias("est_jaccard"),
        F.round(exact, 6).alias("exact_jaccard"),
        F.round(F.abs(est - exact), 6).alias("abs_err"),
    )


# --- content-defined chunk dedup (r7) ----------------------------------------
# CDC boundaries are pure functions of local content (md5 of the
# trailing 8-gram), so both engines derive identical chunks from the
# raw text and the corpus-level dedup accounting must agree exactly.

_CDC_GRAM = 8
_CDC_MASK = "0"

_CDC_ORACLE = f"""
WITH c AS (
  SELECT doc_id, text,
         ([0] || list_filter(range(1, len(text) + 1),
                 i -> i >= {_CDC_GRAM}
                  AND md5(substring(text, i - {_CDC_GRAM - 1}, {_CDC_GRAM})) LIKE '{_CDC_MASK}%')
              || [len(text)]) AS b
  FROM documents),
ch AS (
  SELECT doc_id, UNNEST(list_filter(
           list_transform(range(1, len(b)),
             j -> substring(text, b[j] + 1, b[j + 1] - b[j])),
           x -> x <> '')) AS chunk
  FROM c),
h AS (SELECT md5(chunk) AS hash, CAST(len(chunk) AS BIGINT) AS l,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ch GROUP BY 1, 2)
SELECT CAST(SUM(n) AS BIGINT) AS total_chunks,
       CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
       CAST(SUM(CASE WHEN n >= 2 THEN n - 1 ELSE 0 END) AS BIGINT) AS dup_chunk_instances,
       CAST(SUM(CASE WHEN n >= 2 THEN (n - 1) * l ELSE 0 END) AS BIGINT) AS dup_bytes_saved
FROM h
"""


@df_query("dedup_cdc_chunks", _CDC_ORACLE)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup accounting over content-defined chunks (the
    storage-dedup primitive): total/distinct chunk counts and the
    bytes a chunk store would save. One in-row chunking pass + one
    hash-keyed aggregation."""
    docs = tables.load(spark, sf_dir, "documents")
    ch = dedup.cdc_chunks(docs, "text", "doc_id", gram=_CDC_GRAM, mask=_CDC_MASK)
    h = ch.groupBy("chunk_hash", "chunk_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    dup = F.when(F.col("n") >= 2, F.col("n") - 1).otherwise(0)
    return h.agg(
        F.sum("n").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_chunks"),
        F.sum(dup).cast("bigint").alias("dup_chunk_instances"),
        F.sum(dup * F.col("chunk_len")).cast("bigint").alias("dup_bytes_saved"),
    )
