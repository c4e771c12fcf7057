"""k-means / SemDeDup query inventory (operators.clustering).

Oracle strategy (round-5 upgrade): the k-means family is deterministic
by construction (hash init, exact scaled-long sums, HALF_UP rounding,
FIXED iteration count) — and a fixed iteration count means Lloyd's loop
is expressible as pure SQL with the iterations UNROLLED into a CTE
chain (ce0 -> a1 -> m1 -> ce1 -> ...). The kmeans/SemDeDup oracles are
therefore genuine independent DuckDB SQL, not driver-side VALUES
replays: DuckDB re-derives the init ranking, every assignment, every
centroid update, and the within-cluster cosine pairs from the raw
parquet itself. The PQ pipeline gets the same treatment with the
subspace index as a column dimension (``_pq_ctes``); property tests
(recall/nDCG floors) remain the semantic backstop."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import clustering
from datafusion_server_spark.queries import df_query, rrepr

K = 8
ITERS = 3
SEED = "kmeans"
# Fixture embeddings are near-uniform (pairwise cosines concentrate near
# 0), so the near-dup threshold sits where the within-cluster tail
# actually is; real corpora use 0.9+.
SEM_THRESHOLD = 0.35


def _kmeans_ctes(k: int = K, iters: int = ITERS, seed: str = SEED) -> str:
    """The Lloyd loop as an UNROLLED DuckDB CTE chain (fixed ``iters``
    makes this pure SQL): element view -> hash-rank init (ce0) ->
    per-iteration [d{t} exact scaled-long distances, a{t} argmin with
    ties to the lower cluster, m{t} rounded means, ce{t} with empty
    clusters keeping their centroid] -> final assignment ``afin``.
    Mirrors operators.clustering bit-for-bit (same md5 init rank, same
    CAST(ROUND(x*1e12) AS BIGINT) sums, same ROUND(.,6) centroids)."""
    frac = (
        f"CAST(('0x' || SUBSTR(md5('{seed}:' || CAST(id AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) / {float(16 ** 15)!r}"
    )
    parts = [
        f"""
eml AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings),
el AS (SELECT id, GENERATE_SUBSCRIPTS(embedding, 1) AS i,
              CAST(UNNEST(embedding) AS DOUBLE) AS x
       FROM eml),
ranked AS (SELECT id, ROW_NUMBER() OVER (ORDER BY {frac}, id) - 1 AS cluster
           FROM eml),
ce0 AS (SELECT r.cluster, e.i, ROUND(e.x, 6) AS cx
        FROM ranked r JOIN el e ON e.id = r.id
        WHERE r.cluster < {k})"""
    ]
    prev = "ce0"
    for t in range(1, iters + 1):
        parts.append(
            f"""
d{t} AS (SELECT e.id, c.cluster,
                CAST(SUM(CAST(ROUND((e.x - c.cx) * (e.x - c.cx) * 1e12) AS BIGINT)) AS BIGINT) AS d2
         FROM el e JOIN {prev} c ON c.i = e.i
         GROUP BY e.id, c.cluster),
a{t} AS (SELECT id, cluster FROM
           (SELECT id, cluster, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cluster) AS rn FROM d{t})
         WHERE rn = 1),
m{t} AS (SELECT a.cluster, e.i,
                ROUND(CAST(CAST(SUM(CAST(ROUND(e.x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE)
                      / COUNT(*) / 1e12, 6) AS cx
         FROM a{t} a JOIN el e ON e.id = a.id
         GROUP BY a.cluster, e.i),
ce{t} AS (SELECT p.cluster, p.i, COALESCE(m.cx, p.cx) AS cx
          FROM {prev} p LEFT JOIN m{t} m ON m.cluster = p.cluster AND m.i = p.i)"""
        )
        prev = f"ce{t}"
    t = iters + 1
    parts.append(
        f"""
d{t} AS (SELECT e.id, c.cluster,
                CAST(SUM(CAST(ROUND((e.x - c.cx) * (e.x - c.cx) * 1e12) AS BIGINT)) AS BIGINT) AS d2
         FROM el e JOIN {prev} c ON c.i = e.i
         GROUP BY e.id, c.cluster),
afin AS (SELECT id, cluster FROM
           (SELECT id, cluster, ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2, cluster) AS rn FROM d{t})
         WHERE rn = 1)"""
    )
    return ",".join(parts)


# SemDeDup legs shared by three oracles: exact scaled-long norms,
# nonzero-norm cluster members, and the within-cluster cosine pairs.
_SEM_CTES = f"""
norms AS (SELECT id,
                 SQRT(CAST(CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
          FROM el GROUP BY id),
side AS (SELECT a.id, a.cluster, n.nrm
         FROM afin a JOIN norms n ON n.id = a.id WHERE n.nrm > 0.0),
sem_pairs AS (
  SELECT sa.cluster, sa.id AS keep_id, sb.id AS drop_id,
         ROUND((CAST(CAST(SUM(CAST(ROUND(ea.x * eb.x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12)
               / (MIN(sa.nrm) * MIN(sb.nrm)), 6) AS cosine
  FROM side sa
  JOIN side sb ON sb.cluster = sa.cluster AND sa.id < sb.id
  JOIN el ea ON ea.id = sa.id
  JOIN el eb ON eb.id = sb.id AND eb.i = ea.i
  GROUP BY sa.cluster, sa.id, sb.id)
"""

_KMEANS_ORACLE = f"""
WITH {_kmeans_ctes()}
SELECT CAST(id AS BIGINT) AS vec_id, CAST(cluster AS INT) AS cluster FROM afin
"""


@df_query("cluster_kmeans_assign", _KMEANS_ORACLE)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _ = clustering.kmeans(emb, K, ITERS)
    return assigned.select(
        F.col("id").cast("bigint").alias("vec_id"), F.col("cluster").cast("int")
    )


_SEMDEDUP_ORACLE = f"""
WITH {_kmeans_ctes()}, {_SEM_CTES}
SELECT CAST(cluster AS INT) AS cluster, CAST(keep_id AS BIGINT) AS keep_id,
       CAST(drop_id AS BIGINT) AS drop_id, CAST(cosine AS DOUBLE) AS cosine
FROM sem_pairs WHERE cosine >= {SEM_THRESHOLD}
"""


@df_query("dedup_semantic_semdedup", _SEMDEDUP_ORACLE)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    pairs = clustering.semdedup_pairs(emb, K, SEM_THRESHOLD, ITERS)
    return pairs.select(
        F.col("cluster").cast("int"),
        F.col("keep_id").cast("bigint"),
        F.col("drop_id").cast("bigint"),
        "cosine",
    )


# -- product quantization search (operators.quantize.pq_topk) ----------------
PQ_M = 8
PQ_NC = 16
PQ_ITERS = 2
PQ_K = 5
PQ_RERANK = 4
PQ_DIM = 64
PQ_NQ = 10  # query side: vec_id < 10


def _pq_ctes(
    m: int = PQ_M,
    nc: int = PQ_NC,
    iters: int = PQ_ITERS,
    dim: int = PQ_DIM,
    nq: int = PQ_NQ,
    k: int = PQ_K,
    rerank: int = PQ_RERANK,
) -> str:
    """The joint-subspace PQ pipeline as an UNROLLED DuckDB CTE chain
    (the _kmeans_ctes approach with the subspace index ``j`` as a column
    dimension): per-(j) hash-rank codebook init -> per-iteration
    [ds{t} exact scaled-long subvector distances, as{t} per-(id,j)
    argmin, mn{t} rounded means, bk{t} empty-cells-keep-centroid] ->
    final encode -> codebook reconstruction -> ADC candidate ranking ->
    exact re-rank. Cosine roundings use the shortest-repr cast (see
    ``queries.rrepr``); base CTEs are MATERIALIZED so DuckDB does not
    inline one parquet scan per unrolled reference."""
    subdim = dim // m
    frac = (
        "CAST(('0x' || SUBSTR(md5('pq:' || CAST(j.j AS VARCHAR) || ':' || "
        f"CAST(e.id AS VARCHAR)), 1, 15)) AS BIGINT) / {float(16 ** 15)!r}"
    )
    parts = [
        f"""
eml AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding FROM embeddings),
el AS MATERIALIZED (SELECT id, GENERATE_SUBSCRIPTS(embedding, 1) AS i,
              CAST(UNNEST(embedding) AS DOUBLE) AS x
       FROM eml),
sel AS MATERIALIZED (SELECT id, CAST(FLOOR((i - 1) / {subdim}) AS INT) AS j,
               CAST((i - 1) % {subdim} + 1 AS INT) AS d, x
        FROM el),
jr AS (SELECT e.id, j.j, ROW_NUMBER() OVER (PARTITION BY j.j ORDER BY {frac}, e.id) - 1 AS cluster
       FROM (SELECT DISTINCT id FROM eml) e,
            (SELECT UNNEST(GENERATE_SERIES(0, {m - 1})) AS j) j),
bk0 AS (SELECT r.j, r.cluster, s.d, ROUND(s.x, 6) AS cx
        FROM jr r JOIN sel s ON s.id = r.id AND s.j = r.j
        WHERE r.cluster < {nc})"""
    ]
    prev = "bk0"
    for t in range(1, iters + 1):
        parts.append(
            f"""
ds{t} AS (SELECT s.id, s.j, b.cluster,
                 CAST(SUM(CAST(ROUND((s.x - b.cx) * (s.x - b.cx) * 1e12) AS BIGINT)) AS BIGINT) AS d2
          FROM sel s JOIN {prev} b ON b.j = s.j AND b.d = s.d
          GROUP BY s.id, s.j, b.cluster),
as{t} AS (SELECT id, j, cluster FROM
            (SELECT id, j, cluster, ROW_NUMBER() OVER (PARTITION BY id, j ORDER BY d2, cluster) AS rn FROM ds{t})
          WHERE rn = 1),
mn{t} AS (SELECT a.j, a.cluster, s.d,
                 ROUND(CAST(CAST(SUM(CAST(ROUND(s.x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE)
                       / COUNT(*) / 1e12, 6) AS cx
          FROM as{t} a JOIN sel s ON s.id = a.id AND s.j = a.j
          GROUP BY a.j, a.cluster, s.d),
bk{t} AS (SELECT p.j, p.cluster, p.d, COALESCE(m.cx, p.cx) AS cx
          FROM {prev} p LEFT JOIN mn{t} m ON m.j = p.j AND m.cluster = p.cluster AND m.d = p.d)"""
        )
        prev = f"bk{t}"
    t = iters + 1
    parts.append(
        f"""
ds{t} AS (SELECT s.id, s.j, b.cluster,
                 CAST(SUM(CAST(ROUND((s.x - b.cx) * (s.x - b.cx) * 1e12) AS BIGINT)) AS BIGINT) AS d2
          FROM sel s JOIN {prev} b ON b.j = s.j AND b.d = s.d
          GROUP BY s.id, s.j, b.cluster),
enc AS (SELECT id, j, cluster FROM
          (SELECT id, j, cluster, ROW_NUMBER() OVER (PARTITION BY id, j ORDER BY d2, cluster) AS rn FROM ds{t})
        WHERE rn = 1),
recon AS MATERIALIZED (
  SELECT e.id, CAST(e.j * {subdim} + b.d AS INT) AS i, b.cx AS rx
  FROM enc e JOIN {prev} b ON b.j = e.j AND b.cluster = e.cluster),
rnorm AS (SELECT id, SQRT(CAST(CAST(SUM(CAST(ROUND(rx * rx * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
          FROM recon GROUP BY id),
vnorm AS (SELECT id, SQRT(CAST(CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
          FROM el GROUP BY id),
adc AS (
  SELECT q.id AS query_id, r.id AS neighbor_id,
         {rrepr("(CAST(CAST(SUM(CAST(ROUND(q.x * r.rx * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) / (MIN(qn.nrm) * MIN(rn.nrm))", 6)} AS acos
  FROM el q
  JOIN recon r ON r.i = q.i AND r.id <> q.id
  JOIN vnorm qn ON qn.id = q.id AND qn.nrm > 0.0
  JOIN rnorm rn ON rn.id = r.id AND rn.nrm > 0.0
  WHERE q.id < {nq}
  GROUP BY q.id, r.id),
cand AS (SELECT query_id, neighbor_id FROM
           (SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY acos DESC, neighbor_id) AS rn FROM adc)
         WHERE rn <= {rerank * k}),
ex AS (
  SELECT c.query_id, c.neighbor_id,
         {rrepr("(CAST(CAST(SUM(CAST(ROUND(qa.x * ca.x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) / (MIN(qn.nrm) * MIN(cn.nrm))", 6)} AS cosine
  FROM cand c
  JOIN el qa ON qa.id = c.query_id
  JOIN el ca ON ca.id = c.neighbor_id AND ca.i = qa.i
  JOIN vnorm qn ON qn.id = c.query_id
  JOIN vnorm cn ON cn.id = c.neighbor_id AND cn.nrm > 0.0
  GROUP BY c.query_id, c.neighbor_id)"""
    )
    return ",".join(parts)


_PQ_ORACLE = f"""
WITH {_pq_ctes()}
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(neighbor_id AS BIGINT) AS neighbor_id,
       CAST(cosine AS DOUBLE) AS cosine, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM ex) t
WHERE rnk <= {PQ_K}
"""


@df_query("ann_pq_cosine", _PQ_ORACLE)
def ann_pq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators import quantize

    emb = tables.load(spark, sf_dir, "embeddings")
    return quantize.pq_topk(
        emb,
        emb.filter(F.col("vec_id") < PQ_NQ),
        k=PQ_K,
        m=PQ_M,
        n_centroids=PQ_NC,
        iters=PQ_ITERS,
        rerank_factor=PQ_RERANK,
        dim=PQ_DIM,
    )


# --- curation pipeline v2: corpus-LM band-pass -> SemDeDup keepers ->
# temperature-mix sample -> per-language stats. Composes the late-r4
# operator family in ONE DataFrame chain (documents and embeddings are
# id-aligned in the fixtures: doc_id == vec_id). The oracle embeds the
# SemDeDup replay's drop set as a VALUES CTE inside otherwise plain SQL
# — the mixed VALUES+SQL oracle shape.
_V2_LO, _V2_HI = 3.39, 3.42  # xent band (nats): drops both tails
_V2_ALPHA = 0.5
_V2_TOTAL = 200


def _pipeline_v2_oracle() -> str:
    from datafusion_server_spark.queries.sampling import _FRAC

    frac = _FRAC.format(seed="tmix").replace("doc_id", "kp.doc_id")
    return f"""
WITH {_kmeans_ctes()}, {_SEM_CTES},
drops AS (SELECT DISTINCT drop_id AS doc_id FROM sem_pairs WHERE cosine >= {SEM_THRESHOLD}),
tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
model AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n_t FROM tok GROUP BY term),
tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM model),
logp AS (SELECT term,
                CAST(ROUND(-LN(CAST(n_t + 1 AS DOUBLE) / CAST(n + v AS DOUBLE)), 8)
                     AS DECIMAL(18,8)) AS nll
         FROM model, tot),
xent AS (SELECT t.doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_tokens,
                ROUND(CAST(SUM(l.nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS xent_nats
         FROM tok t JOIN logp l ON l.term = t.term GROUP BY t.doc_id),
keepers AS (
  SELECT d.doc_id, d.lang, x.n_tokens
  FROM documents d
  JOIN xent x ON x.doc_id = d.doc_id
  WHERE x.xent_nats BETWEEN {_V2_LO} AND {_V2_HI}
    AND d.doc_id NOT IN (SELECT doc_id FROM drops)),
counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_d FROM keepers GROUP BY lang),
w AS (SELECT lang, n_d,
             CAST(ROUND(POWER(CAST(n_d AS DOUBLE), {_V2_ALPHA}), 6) AS DECIMAL(28,6)) AS w
      FROM counts),
rates AS (SELECT lang,
                 LEAST(1.0, (CAST(w AS DOUBLE) / CAST((SELECT SUM(w) FROM w) AS DOUBLE))
                            * {float(_V2_TOTAL)} / CAST(n_d AS DOUBLE)) AS rate
          FROM w),
sampled AS (
  SELECT kp.doc_id, kp.lang, kp.n_tokens
  FROM keepers kp JOIN rates r ON r.lang = kp.lang
  WHERE {frac} < r.rate)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM sampled GROUP BY lang
"""


@df_query("pipeline_curation_v2", _pipeline_v2_oracle())
def pipeline_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DataFrame chain: corpus-LM cross-entropy band-pass (CCNet
    shape) -> SemDeDup near-duplicate removal (min-id survivorship) ->
    alpha-temperature language mixing -> per-language token budget."""
    from datafusion_server_spark.operators import sampling, text

    docs = tables.load(spark, sf_dir, "documents")
    emb = tables.load(spark, sf_dir, "embeddings")
    xent = text.lm_unigram_cross_entropy(docs, "text", "doc_id")
    banded = docs.join(
        xent.filter(F.col("xent_nats").between(_V2_LO, _V2_HI)).select(
            F.col("id").alias("doc_id"), "n_tokens"
        ),
        "doc_id",
    )
    drops = (
        clustering.semdedup_pairs(emb, K, SEM_THRESHOLD, ITERS)
        .select(F.col("drop_id").alias("doc_id"))
        .distinct()
    )
    keepers = banded.join(drops, "doc_id", "left_anti")
    sampled = sampling.temperature_mix_sample(
        keepers, "doc_id", "lang", _V2_ALPHA, _V2_TOTAL
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


_SEMDEDUP_KEEPERS_ORACLE = f"""
WITH {_kmeans_ctes()}, {_SEM_CTES},
drops AS (SELECT DISTINCT drop_id AS id FROM sem_pairs WHERE cosine >= {SEM_THRESHOLD})
SELECT CAST(a.cluster AS INT) AS cluster, CAST(COUNT(*) AS BIGINT) AS n_kept
FROM afin a
WHERE a.id NOT IN (SELECT id FROM drops)
GROUP BY a.cluster
"""


@df_query("dedup_semantic_keepers", _SEMDEDUP_KEEPERS_ORACLE)
def dedup_semantic_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup OUTPUT leg: materialize the kept set (everything not
    named as a drop_id) with per-cluster counts — at scale this is the
    anti-join that writes the deduplicated corpus."""
    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _ = clustering.kmeans(emb, K, ITERS)
    drops = (
        clustering.semdedup_pairs(emb, K, SEM_THRESHOLD, ITERS)
        .select(F.col("drop_id").alias("id"))
        .distinct()
    )
    kept = assigned.join(drops, "id", "left_anti")
    return kept.groupBy(F.col("cluster").cast("int").alias("cluster")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )


# cluster-balanced sampling (DataComp-style coreset): k-means partition,
# then a deterministic hash-rank reservoir of equal size per cluster —
# the diversity-preserving subset an embedding-curated corpus trains on.
# Oracle = the unrolled Lloyd chain + the same md5 rank window.
_BAL_K = 15

_BAL_FRAC = (
    "(CAST(('0x' || substr(md5('balance:' || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " / CAST(16.0 ** 15 AS DOUBLE))"
)

_BALANCED_ORACLE = f"""
WITH {_kmeans_ctes()},
bal_ranked AS (
  SELECT id, cluster,
         ROW_NUMBER() OVER (PARTITION BY cluster
                            ORDER BY {_BAL_FRAC} ASC, id ASC) AS r
  FROM afin)
SELECT CAST(cluster AS INT) AS cluster, CAST(id AS BIGINT) AS vec_id,
       CAST(r AS BIGINT) AS sample_rank
FROM bal_ranked WHERE r <= {_BAL_K}
"""


@df_query("cluster_balanced_sample", _BALANCED_ORACLE)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-per-cluster coreset: k-means partitions the embedding
    space, the hash-rank reservoir keeps _BAL_K vectors per cluster —
    over-dense regions contribute no more than sparse ones (the
    DataComp/SemDeDup-adjacent balancing step). Both stages are the
    existing verified operators composed; one extra cluster-keyed
    window after the assignment."""
    from datafusion_server_spark.operators import sampling

    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _ = clustering.kmeans(emb, K, ITERS)
    kept = sampling.reservoir_per_group(
        assigned.select("id", "cluster"), "id", "cluster", _BAL_K, seed="balance"
    )
    return kept.select(
        F.col("cluster").cast("int"),
        F.col("id").cast("bigint").alias("vec_id"),
        "sample_rank",
    )


# --- clustering quality vs external labels (r7) ------------------------------
# Purity and NMI of the kmeans assignment against the fixture's label
# column — the standard external-validity check before trusting cluster
# IDs as curation strata. Entropies/MI aggregate as rounded-ln DECIMAL
# contributions (bounded k x |labels| grid); purity is pure-integer.


def _nmi_oracle() -> str:
    from datafusion_server_spark.queries import rrepr

    dc = "CAST(CAST({x} AS DECIMAL(18,8)) AS DOUBLE)"
    share = "(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))"
    return f"""
WITH {_kmeans_ctes()},
lab AS (SELECT CAST(vec_id AS BIGINT) AS id, CAST(label AS BIGINT) AS label
        FROM embeddings),
cell AS (SELECT a.cluster, l.label, CAST(COUNT(*) AS BIGINT) AS n
         FROM afin a JOIN lab l ON l.id = a.id
         GROUP BY a.cluster, l.label),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cell),
byc AS (SELECT cluster, CAST(SUM(n) AS BIGINT) AS n FROM cell GROUP BY cluster),
byl AS (SELECT label, CAST(SUM(n) AS BIGINT) AS n FROM cell GROUP BY label),
pur AS (SELECT CAST(SUM(mx) AS BIGINT) AS hits FROM
          (SELECT cluster, MAX(n) AS mx FROM cell GROUP BY cluster)),
hc AS (SELECT SUM(CAST(ROUND(-({share}) * LN({share}), 8) AS DECIMAL(18,8))) AS v
       FROM byc, tot),
hl AS (SELECT SUM(CAST(ROUND(-({share}) * LN({share}), 8) AS DECIMAL(18,8))) AS v
       FROM byl, tot),
mi AS (SELECT SUM(CAST(ROUND(
         (CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE))
         * LN((CAST(c.n AS DOUBLE) * CAST(t.total AS DOUBLE))
              / (CAST(bc.n AS DOUBLE) * CAST(bl.n AS DOUBLE))), 8) AS DECIMAL(18,8))) AS v
       FROM cell c
       JOIN byc bc ON bc.cluster = c.cluster
       JOIN byl bl ON bl.label = c.label
       CROSS JOIN tot t)
SELECT t.total AS n_items,
       {rrepr("CAST(p.hits AS DOUBLE) / CAST(t.total AS DOUBLE)", 6)} AS purity,
       {dc.format(x="hc.v")} AS h_cluster,
       {dc.format(x="hl.v")} AS h_label,
       {dc.format(x="mi.v")} AS mutual_info,
       {rrepr(f"2.0 * {dc.format(x='mi.v')} / ({dc.format(x='hc.v')} + {dc.format(x='hl.v')})", 6)} AS nmi
FROM tot t, pur p, hc, hl, mi
"""


@df_query("cluster_purity_nmi", _nmi_oracle())
def cluster_purity_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering validity: purity (integer-exact) + NMI of
    the deterministic kmeans assignment vs the label column, with the
    rounded-ln DECIMAL contribution contract over the bounded
    (cluster x label) grid."""
    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _ = clustering.kmeans(emb, K, ITERS)
    lab = emb.select(
        F.col("vec_id").cast("bigint").alias("id"),
        F.col("label").cast("bigint").alias("label"),
    )
    cell = (
        assigned.select(F.col("id").cast("bigint").alias("id"), "cluster")
        .join(lab, "id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cell.agg(F.sum("n").cast("bigint").alias("total"))
    byc = cell.groupBy("cluster").agg(F.sum("n").cast("bigint").alias("n"))
    byl = cell.groupBy("label").agg(F.sum("n").cast("bigint").alias("n"))
    pur = (
        cell.groupBy("cluster")
        .agg(F.max("n").alias("mx"))
        .agg(F.sum("mx").cast("bigint").alias("hits"))
    )

    def _h(df):
        share = F.col("n").cast("double") / F.col("total").cast("double")
        c = F.round(-share * F.log(share), 8).cast("decimal(18,8)")
        return (
            df.crossJoin(F.broadcast(tot)).agg(F.sum(c).alias("v"))
        )

    hc = _h(byc).select(F.col("v").alias("hc"))
    hl = _h(byl).select(F.col("v").alias("hl"))
    mic = F.round(
        (F.col("n").cast("double") / F.col("total").cast("double"))
        * F.log(
            (F.col("n").cast("double") * F.col("total").cast("double"))
            / (F.col("nc").cast("double") * F.col("nl").cast("double"))
        ),
        8,
    ).cast("decimal(18,8)")
    mi = (
        cell.join(F.broadcast(byc.select("cluster", F.col("n").alias("nc"))), "cluster")
        .join(F.broadcast(byl.select("label", F.col("n").alias("nl"))), "label")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(mic).alias("mi"))
    )
    out = (
        tot.crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .crossJoin(F.broadcast(mi))
    )
    hcd = F.col("hc").cast("double")
    hld = F.col("hl").cast("double")
    mid = F.col("mi").cast("double")
    return out.select(
        F.col("total").alias("n_items"),
        F.round(F.col("hits").cast("double") / F.col("total").cast("double"), 6).alias(
            "purity"
        ),
        hcd.alias("h_cluster"),
        hld.alias("h_label"),
        mid.alias("mutual_info"),
        F.round(F.lit(2.0) * mid / (hcd + hld), 6).alias("nmi"),
    )
