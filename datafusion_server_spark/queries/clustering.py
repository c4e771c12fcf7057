"""k-means / SemDeDup query inventory (operators.clustering).

Oracle strategy: the operators are deterministic by construction (hash
init, exact scaled-long sums, HALF_UP rounding, fixed iteration count),
so the oracle is a sequential driver-side REPLAY of the same math over
the same parquet, emitted as a DuckDB VALUES table (the
``multimodal_feature_search`` precedent). The replay shares zero Spark
code — an independent reimplementation in plain Python — so a logic
error on either side breaks the hash match."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import clustering
from datafusion_server_spark.queries import df_query

K = 8
ITERS = 3
SEED = "kmeans"
# Fixture embeddings are near-uniform (pairwise cosines concentrate near
# 0), so the near-dup threshold sits where the within-cluster tail
# actually is; real corpora use 0.9+.
SEM_THRESHOLD = 0.35


def _replay_kmeans(sf_dir: str, k: int = K, iters: int = ITERS):
    """Sequential Lloyd replay -> (assignments dict id->cluster,
    centroids, vectors dict id->list[float])."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    def r0(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in zip(
            tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist()
        )
    }

    def frac(i: int) -> float:
        h = hashlib.md5(f"{SEED}:{i}".encode()).hexdigest()
        return int(h[:15], 16) / 16.0**15

    ranked = sorted(vecs, key=lambda i: (frac(i), i))
    cents = [[r6(x) for x in vecs[i]] for i in ranked[:k]]

    def assign() -> dict[int, int]:
        out = {}
        for i, v in vecs.items():
            best_d2, best_c = None, -1
            for ci, c in enumerate(cents):
                d2 = sum(r0((x - y) * (x - y) * 1e12) for x, y in zip(v, c))
                if best_d2 is None or d2 < best_d2:
                    best_d2, best_c = d2, ci
            out[i] = best_c
        return out

    for _ in range(iters):
        a = assign()
        dim = len(next(iter(vecs.values())))
        for ci in range(k):
            members = [vecs[i] for i in vecs if a[i] == ci]
            if not members:
                continue  # empty cluster keeps its centroid
            cents[ci] = [
                r6(
                    float(sum(r0(v[d] * 1e12) for v in members))
                    / float(len(members))
                    / 1e12
                )
                for d in range(dim)
            ]
    return assign(), cents, vecs


def _kmeans_values_oracle(sf_dir: str) -> str:
    a, _, _ = _replay_kmeans(sf_dir)
    rows = ", ".join(f"({i}, {c})" for i, c in sorted(a.items()))
    return f"""
    SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cluster AS INT) AS cluster
    FROM (VALUES {rows}) AS t(vec_id, cluster)
    """


@df_query("cluster_kmeans_assign", _kmeans_values_oracle)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _ = clustering.kmeans(emb, K, ITERS)
    return assigned.select(
        F.col("id").cast("bigint").alias("vec_id"), F.col("cluster").cast("int")
    )


def _semdedup_values_oracle(sf_dir: str) -> str:
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r0(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    a, _, vecs = _replay_kmeans(sf_dir)
    norms = {
        i: math.sqrt(sum(r0(x * x * 1e12) for x in v) / 1e12) for i, v in vecs.items()
    }
    by_cluster: dict[int, list[int]] = {}
    for i, c in a.items():
        if norms[i] > 0.0:
            by_cluster.setdefault(c, []).append(i)
    out = []
    for c, members in sorted(by_cluster.items()):
        members.sort()
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                ia, ib = members[ai], members[bi]
                dot = sum(r0(x * y * 1e12) for x, y in zip(vecs[ia], vecs[ib]))
                cos = r6((dot / 1e12) / (norms[ia] * norms[ib]))
                if cos >= SEM_THRESHOLD:
                    out.append(f"({c}, {ia}, {ib}, {cos!r})")
    if not out:
        return """
        SELECT CAST(NULL AS INT) AS cluster, CAST(NULL AS BIGINT) AS keep_id,
               CAST(NULL AS BIGINT) AS drop_id, CAST(NULL AS DOUBLE) AS cosine
        WHERE FALSE
        """
    rows = ", ".join(out)
    return f"""
    SELECT CAST(cluster AS INT) AS cluster, CAST(keep_id AS BIGINT) AS keep_id,
           CAST(drop_id AS BIGINT) AS drop_id, CAST(cosine AS DOUBLE) AS cosine
    FROM (VALUES {rows}) AS t(cluster, keep_id, drop_id, cosine)
    """


@df_query("dedup_semantic_semdedup", _semdedup_values_oracle)
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


def _pq_values_oracle(sf_dir: str) -> str:
    """Sequential replay of the joint-subspace PQ pipeline: per-subspace
    hash init -> Lloyd iterations (exact scaled-long math) -> encode ->
    codebook reconstruction -> ADC candidates -> exact re-rank."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    def r0(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in zip(
            tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist()
        )
    }
    subdim = PQ_DIM // PQ_M
    subs = {
        (i, j): v[j * subdim : (j + 1) * subdim]
        for i, v in vecs.items()
        for j in range(PQ_M)
    }

    def frac(j: int, i: int) -> float:
        h = hashlib.md5(f"pq:{j}:{i}".encode()).hexdigest()
        return int(h[:15], 16) / 16.0**15

    books = []
    for j in range(PQ_M):
        ranked = sorted(vecs, key=lambda i: (frac(j, i), i))
        books.append([[r6(x) for x in subs[(i, j)]] for i in ranked[:PQ_NC]])

    def argmin(sv, book):
        best_d2, best_c = None, -1
        for ci, c in enumerate(book):
            d2 = sum(r0((x - y) * (x - y) * 1e12) for x, y in zip(sv, c))
            if best_d2 is None or d2 < best_d2:
                best_d2, best_c = d2, ci
        return best_c

    for _ in range(PQ_ITERS):
        assign = {
            (i, j): argmin(subs[(i, j)], books[j]) for i in vecs for j in range(PQ_M)
        }
        for j in range(PQ_M):
            for ci in range(PQ_NC):
                members = [subs[(i, j)] for i in vecs if assign[(i, j)] == ci]
                if not members:
                    continue
                books[j][ci] = [
                    r6(
                        float(sum(r0(v[d] * 1e12) for v in members))
                        / float(len(members))
                        / 1e12
                    )
                    for d in range(subdim)
                ]
    recon = {
        i: [
            x
            for j in range(PQ_M)
            for x in books[j][argmin(subs[(i, j)], books[j])]
        ]
        for i in vecs
    }
    rnorm = {
        i: math.sqrt(sum(r0(x * x * 1e12) for x in v) / 1e12)
        for i, v in recon.items()
    }
    qnorm = {
        i: math.sqrt(sum(r0(x * x * 1e12) for x in vecs[i]) / 1e12)
        for i in vecs
        if i < PQ_NQ
    }
    out = []
    for q in sorted(qnorm):
        if qnorm[q] <= 0.0:
            continue
        adc = []
        for c, rv in recon.items():
            if c == q or rnorm[c] <= 0.0:
                continue
            dot = sum(r0(a * b * 1e12) for a, b in zip(vecs[q], rv))
            adc.append((r6((dot / 1e12) / (qnorm[q] * rnorm[c])), c))
        adc.sort(key=lambda t: (-t[0], t[1]))
        cand = [c for _, c in adc[: PQ_RERANK * PQ_K]]
        scored = []
        for c in cand:
            cn = math.sqrt(sum(r0(x * x * 1e12) for x in vecs[c]) / 1e12)
            if cn <= 0.0:
                continue
            dot = sum(r0(a * b * 1e12) for a, b in zip(vecs[q], vecs[c]))
            scored.append((r6((dot / 1e12) / (qnorm[q] * cn)), c))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (cos, c) in enumerate(scored[:PQ_K], start=1):
            out.append(f"({q}, {c}, {cos!r}, {rank})")
    rows = ", ".join(out)
    return f"""
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(cosine AS DOUBLE) AS cosine,
           CAST(rank AS BIGINT) AS rank
    FROM (VALUES {rows}) AS t(query_id, neighbor_id, cosine, rank)
    """


@df_query("ann_pq_cosine", _pq_values_oracle)
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


def _pipeline_v2_oracle(sf_dir: str) -> str:
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r0(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    a, _, vecs = _replay_kmeans(sf_dir)
    norms = {
        i: math.sqrt(sum(r0(x * x * 1e12) for x in v) / 1e12) for i, v in vecs.items()
    }
    by_cluster: dict[int, list[int]] = {}
    for i, c in a.items():
        if norms[i] > 0.0:
            by_cluster.setdefault(c, []).append(i)
    drops: set[int] = set()
    for members in by_cluster.values():
        members.sort()
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                ia, ib = members[ai], members[bi]
                dot = sum(r0(x * y * 1e12) for x, y in zip(vecs[ia], vecs[ib]))
                cos = float(
                    Decimal(repr((dot / 1e12) / (norms[ia] * norms[ib]))).quantize(
                        Decimal("0.000001"), ROUND_HALF_UP
                    )
                )
                if cos >= SEM_THRESHOLD:
                    drops.add(ib)
    drop_rows = ", ".join(f"({i})" for i in sorted(drops)) or "(NULL)"
    from datafusion_server_spark.queries.sampling import _FRAC

    frac = _FRAC.format(seed="tmix").replace("doc_id", "kp.doc_id")
    return f"""
WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
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
drops AS (SELECT * FROM (VALUES {drop_rows}) AS t(doc_id) WHERE doc_id IS NOT NULL),
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


@df_query("pipeline_curation_v2", _pipeline_v2_oracle)
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


def _semdedup_keepers_oracle(sf_dir: str) -> str:
    """Keeper ids = all vectors minus SemDeDup drops (min-id
    survivorship) — per-cluster keeper counts."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r0(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    a, _, vecs = _replay_kmeans(sf_dir)
    norms = {
        i: math.sqrt(sum(r0(x * x * 1e12) for x in v) / 1e12) for i, v in vecs.items()
    }
    by_cluster: dict[int, list[int]] = {}
    for i, c in a.items():
        if norms[i] > 0.0:
            by_cluster.setdefault(c, []).append(i)
    drops: set[int] = set()
    for members in by_cluster.values():
        members.sort()
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                ia, ib = members[ai], members[bi]
                dot = sum(r0(x * y * 1e12) for x, y in zip(vecs[ia], vecs[ib]))
                if r6((dot / 1e12) / (norms[ia] * norms[ib])) >= SEM_THRESHOLD:
                    drops.add(ib)
    from collections import Counter

    kept = Counter(a[i] for i in vecs if i not in drops)
    rows = ", ".join(f"({c}, {n})" for c, n in sorted(kept.items()))
    return f"""
    SELECT CAST(cluster AS INT) AS cluster, CAST(n_kept AS BIGINT) AS n_kept
    FROM (VALUES {rows}) AS t(cluster, n_kept)
    """


@df_query("dedup_semantic_keepers", _semdedup_keepers_oracle)
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
