"""Round-9 continuation additions (batch 4): skew-salted join parity,
Resource-Allocation link prediction, sorted bin-pack compaction
planning, retrieval MRR@k, and the Theil-Sen robust trend.

House determinism rules throughout: money in exact ROUND(x*100) cents,
scores in pure-BIGINT scaled units (``div`` both engines), medians as
ELEMENT selection (never interpolation), repr-rounding (``rrepr``) on
the few final doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import graph as graph_ops
from datafusion_server_spark.operators import scale as scale_ops
from datafusion_server_spark.operators import similarity as sim_ops
from datafusion_server_spark.operators import timeseries as ts_ops
from datafusion_server_spark.queries import df_query, rrepr
from datafusion_server_spark.queries.graph import _COPURCHASE_SQL
from datafusion_server_spark.queries.similarity import _EL_CTE

# --- join_skew_salted_agg ---------------------------------------------------
# The scale.salted_join operator (SURVEY §2 scale-engineering family)
# finally gets its own oracle row: a salted fact-dim join must be
# RESULT-identical to the plain join — the salt only changes the
# physical key distribution. Oracle = the plain join, which is the
# whole point of the test.

_SALTED_ORACLE = """
SELECT CAST(s.s_nationkey AS BIGINT) AS s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1
"""


@df_query("join_skew_salted_agg", _SALTED_ORACLE)
def join_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation revenue through a SKEW-SALTED fact-dim join:
    each fact row scatters its join key across 8 sub-keys (hash of the
    whole row) and the supplier dim replicates 8x, so a pathologically
    hot supplier lands on 8 tasks instead of one. The oracle is the
    PLAIN join — salting is a physical rewrite and must be value-
    invariant; this row pins that invariant under the driver's hash.
    """
    li = tables.load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.col("l_suppkey"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    supp = tables.load(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("bigint").alias("s_nationkey")
    )
    joined = scale_ops.salted_join(li, supp, "s_suppkey", salt=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("l_suppkey").cast("bigint").alias("n_suppliers"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


# --- graph_resource_allocation ----------------------------------------------
# Link prediction on the part co-purchase graph: top-K non-adjacent
# pairs by the Resource-Allocation index (sum of 1/deg over common
# neighbors). Pure-BIGINT score (RA_ONE div deg) — an Adamic-Adar
# ln(deg) variant would hinge on cross-engine libm ulp agreement.

_RA_K = 20

_RA_ORACLE = f"""
WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
adj AS (SELECT pa AS node, pb AS nb FROM e
        UNION ALL SELECT pb AS node, pa AS nb FROM e),
deg AS (SELECT nb, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY nb),
wedges AS (
  SELECT a1.node AS u, a2.node AS v, a1.nb
  FROM adj a1 JOIN adj a2 ON a1.nb = a2.nb AND a1.node < a2.node),
scored AS (
  SELECT w.u, w.v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         CAST(SUM({graph_ops.RA_ONE} // d.deg) AS BIGINT) AS ra_pico
  FROM wedges w JOIN deg d ON d.nb = w.nb
  GROUP BY w.u, w.v),
nonadj AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = s.u AND e.pb = s.v))
SELECT u, v, common_neighbors, ra_pico, CAST(rnk AS BIGINT) AS rank_pos
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY ra_pico DESC, u, v) AS rnk
      FROM nonadj) t
WHERE rnk <= {_RA_K}
"""


@df_query("graph_resource_allocation", _RA_ORACLE)
def graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted co-purchase links: non-adjacent part pairs
    ranked by the Resource-Allocation index over the order-basket
    graph. Wedge enumeration is the equi-self-join the triangle counter
    already pays for, the degree attaches on the shared-neighbor key,
    existing edges leave via one anti-join, and the global top-k is
    TakeOrderedAndProject — no all-pairs stage anywhere.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    edges = graph_ops.copurchase_edges(li)
    return graph_ops.resource_allocation_topk(edges, k=_RA_K)


# --- scale_compaction_binpack -----------------------------------------------
# Lakehouse maintenance planning: pack per-day "files" (row-count-
# proportional byte sizes) into ~target-size output bins by banding the
# exclusive running size — the Delta/Iceberg OPTIMIZE shape. The
# running sum is distributed_cumsum, so a million-file inventory never
# meets a single-partition window.

_BP_ROW_BYTES = 480
_BP_TARGET = 256 * 1024


_BP_ORACLE = f"""
WITH files AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) * {_BP_ROW_BYTES} AS BIGINT) AS bytes
  FROM orders GROUP BY 1),
packed AS (
  SELECT day, bytes,
         CAST((SUM(bytes) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) - bytes)
              // {_BP_TARGET} AS BIGINT) AS bin_id
  FROM files)
SELECT bin_id, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       MIN(day) AS day_min, MAX(day) AS day_max
FROM packed GROUP BY bin_id
"""


@df_query("scale_compaction_binpack", _BP_ORACLE)
def scale_compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan for the per-order-day file inventory: files
    sorted by day pack greedily into ~256 KiB bins (bin = exclusive
    running bytes div target), preserving date-range locality so
    partition pruning survives the rewrite. Output: one row per planned
    output file with its size, file count and date span.
    """
    orders = tables.load(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg((F.count(F.lit(1)) * _BP_ROW_BYTES).cast("bigint").alias("bytes"))
    packed = scale_ops.binpack_by_cumsum(files, ["day"], "bytes", _BP_TARGET)
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.min("day").alias("day_min"),
        F.max("day").alias("day_max"),
    )


# --- eval_retrieval_mrr -----------------------------------------------------
# Retrieval eval over the embeddings table: MRR@k per query label,
# relevance = neighbor shares the query's label. Reciprocal ranks in
# exact 1e-12 units (1e12 div rank — pure integer), so the per-label
# sums are order-free BIGINTs; the single float op is the final mean.

_MRR_K = 10
_MRR_QUERIES = 20  # query vectors: vec_id < 20
_MRR_ONE = 1_000_000_000_000

_MRR_ORACLE = f"""
WITH {_EL_CTE},
dots AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
         CAST(SUM(CAST(ROUND(qa.x * ca.x * 1e12) AS BIGINT)) AS BIGINT) AS dot
  FROM el qa JOIN el ca ON ca.i = qa.i AND ca.vec_id <> qa.vec_id
  WHERE qa.vec_id < {_MRR_QUERIES}
  GROUP BY 1, 2),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         ROUND((CAST(d.dot AS DOUBLE) / 1e12) / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.neighbor_id),
topk AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rnk
    FROM scored) t
  WHERE rnk <= {_MRR_K}),
firsts AS (
  SELECT t.query_id, CAST(ql.label AS BIGINT) AS label,
         MIN(t.rnk) FILTER (WHERE nl.label = ql.label) AS first_rank
  FROM topk t
  JOIN embeddings ql ON ql.vec_id = t.query_id
  JOIN embeddings nl ON nl.vec_id = t.neighbor_id
  GROUP BY 1, 2)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(COUNT(first_rank) AS BIGINT) AS n_hit,
       CAST(SUM(COALESCE({_MRR_ONE} // first_rank, 0)) AS BIGINT) AS rr_pico,
       {rrepr(f"CAST(SUM(COALESCE({_MRR_ONE} // first_rank, 0)) AS DOUBLE) / (COUNT(*) * 1e12)", 6)} AS mrr
FROM firsts GROUP BY label
"""


@df_query("eval_retrieval_mrr", _MRR_ORACLE)
def eval_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of brute-force cosine retrieval, judged by label match
    and grouped by query label — the standard recall-style eval read
    next to eval_ann_sq8_recall/ndcg. The scoring reuses cosine_topk's
    in-row scaled-long dots; labels attach by two id-keyed joins and
    everything after the per-query top-k is label-bounded.
    """
    emb = tables.load(spark, sf_dir, "embeddings")
    top = sim_ops.cosine_topk(
        emb, emb.filter(F.col("vec_id") < _MRR_QUERIES), _MRR_K
    )
    ql = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").cast("bigint").alias("label")
    )
    nl = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("__n_label")
    )
    firsts = (
        top.join(F.broadcast(ql), "query_id")
        .join(F.broadcast(nl), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(
            F.min(
                F.when(F.col("__n_label") == F.col("label"), F.col("rank"))
            ).alias("first_rank")
        )
    )
    return firsts.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.count("first_rank").cast("bigint").alias("n_hit"),
        F.sum(F.coalesce(F.expr(f"{_MRR_ONE} div first_rank"), F.lit(0)))
        .cast("bigint")
        .alias("rr_pico"),
        F.round(
            F.sum(F.coalesce(F.expr(f"{_MRR_ONE} div first_rank"), F.lit(0))).cast(
                "double"
            )
            / (F.count(F.lit(1)) * F.lit(1e12)),
            6,
        ).alias("mrr"),
    )


# --- timeseries_theil_sen ---------------------------------------------------

_TS_SCALE = 100

_THEIL_SEN_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS key, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * {_TS_SCALE}) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
dd AS (SELECT key, CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS d, x
       FROM daily),
pairs AS (
  SELECT a.key, a.d AS d1, b.d AS d2,
         CAST(b.x - a.x AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM dd a JOIN dd b ON a.key = b.key AND a.d < b.d),
ranked AS (
  SELECT key, slope,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY slope, d1, d2) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n_pairs
  FROM pairs),
nd AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS n_days FROM dd GROUP BY key)
SELECT r.key AS event_type, nd.n_days, r.n_pairs,
       {rrepr("r.slope", 6)} AS slope
FROM ranked r JOIN nd ON nd.key = r.key
WHERE r.rn = (r.n_pairs + 1) // 2
"""


@df_query("timeseries_theil_sen", _THEIL_SEN_ORACLE)
def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend (cents/day) of each event type's daily
    totals — the median-of-pairwise-slopes companion to the least-
    squares linear_trend row: a 29.3% breakdown point means one
    corrupted ingest day cannot swing it. Element-median (no
    interpolation), IEEE-exact slopes, entity-bounded pair windows.
    """
    ev = tables.load(spark, sf_dir, "events")
    ts = ts_ops.theil_sen_daily(
        ev, "event_type", "ts", "value", value_scale=_TS_SCALE
    )
    return ts.select(
        F.col("key").alias("event_type"),
        "n_days",
        "n_pairs",
        F.round("slope", 6).alias("slope"),
    )


# --- eval_isotonic_calibration ----------------------------------------------
# PAV recalibration of the GD classifier's decile calibration table via
# the minimax closed form fitted_i = max_{j<=i} min_{k>=i} avg(j..k)
# (Barlow et al. 1972) — B^3 cells with B fixed at 10, so the whole fit
# is bounded and needs no sequential pooling loop. Oracle = the same
# unrolled-GD chain the other classifier rows share, plus the bounded
# enumeration in SQL.


def _isotonic_oracle() -> str:
    from datafusion_server_spark.queries.classifier import _logreg_ctes

    return f"""
WITH {_logreg_ctes()},
bands AS (
  SELECT CAST(LEAST(9, CAST(FLOOR(p.p * 10.0) AS BIGINT)) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM pfin p JOIN lab l ON l.id = p.id
  GROUP BY 1),
pre AS (
  SELECT band, n, pos,
         CAST(SUM(n) OVER w AS BIGINT) AS cn,
         CAST(SUM(pos) OVER w AS BIGINT) AS cp
  FROM bands WINDOW w AS (ORDER BY band ROWS UNBOUNDED PRECEDING)),
segs AS (
  SELECT j.band AS jb, k.band AS kb,
         CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
         / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS seg_avg
  FROM pre j JOIN pre k ON k.band >= j.band),
minsuff AS (
  SELECT i.band AS ib, s.jb, MIN(s.seg_avg) AS mn
  FROM pre i JOIN segs s ON s.jb <= i.band AND s.kb >= i.band
  GROUP BY 1, 2),
fit AS (SELECT ib AS band, MAX(mn) AS fitted FROM minsuff GROUP BY ib)
SELECT b.band, b.n, b.pos,
       {rrepr("CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE)", 6)} AS raw_rate,
       {rrepr("f.fitted", 6)} AS fitted_rate
FROM bands b JOIN fit f ON f.band = b.band
"""


@df_query("eval_isotonic_calibration", _isotonic_oracle())
def eval_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic recalibration curve of the hashed-BoW GD classifier:
    the decile calibration table's positive rates, pooled monotone by
    PAV in closed minimax form. Everything after the per-doc scoring
    is decile-bounded; the scoring itself is the shared logreg
    pipeline (one corpus pass per GD iteration, bucket-bounded state).
    """
    from datafusion_server_spark.operators import classifier as clf_ops
    from datafusion_server_spark.queries.classifier import DIM, ITERS, LR, PROBE

    docs = tables.load(spark, sf_dir, "documents")
    feats = clf_ops.hashed_features(docs, "text", "doc_id", DIM)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.array_contains(F.split(F.col("text"), " "), PROBE), 1.0
        ).otherwise(0.0).alias("y"),
    )
    w = clf_ops.train_logreg(feats, labels, DIM, ITERS, LR)
    scored = clf_ops.predict(feats, w).join(labels, "id")
    band = F.least(F.lit(9), F.floor(F.col("p") * 10.0)).cast("bigint")
    bands = scored.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("y") == 1.0).cast("bigint")).cast("bigint").alias("pos"),
    )
    fitted = clf_ops.isotonic_bands(bands)
    return fitted.select(
        "band",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n").cast("double"), 6).alias(
            "raw_rate"
        ),
        F.round("fitted", 6).alias("fitted_rate"),
    )


# --- timeseries_holt_linear -------------------------------------------------
# Holt's double exponential smoothing per event-type daily series —
# the inherently-sequential recurrence as a bounded-state in-row fold
# (the KM-survival pattern); alpha = beta = 1/2 are exact binary
# fractions, so the IEEE chains agree bit-for-bit and the oracle is a
# recursive CTE walking the identical recurrence.


_HOLT_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type AS key, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
idx AS MATERIALIZED (
  SELECT key, x,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY day) - 1 AS i
  FROM daily),
nk AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS c FROM idx GROUP BY key),
hw AS (
  SELECT i0.key, CAST(0 AS BIGINT) AS i,
         CAST(i0.x AS DOUBLE) AS l,
         COALESCE(CAST(i1.x - i0.x AS DOUBLE), 0.0) AS b
  FROM idx i0 LEFT JOIN idx i1 ON i1.key = i0.key AND i1.i = 1
  WHERE i0.i = 0
  UNION ALL
  SELECT h.key, h.i + 1,
         0.5 * CAST(x.x AS DOUBLE) + 0.5 * (h.l + h.b),
         0.5 * ((0.5 * CAST(x.x AS DOUBLE) + 0.5 * (h.l + h.b)) - h.l)
         + 0.5 * h.b
  FROM hw h JOIN idx x ON x.key = h.key AND x.i = h.i + 1)
SELECT h.key AS event_type, nk.c AS n_days,
       {rrepr("h.l", 6)} AS level,
       {rrepr("h.b", 6)} AS trend,
       {rrepr("h.l + h.b", 6)} AS forecast
FROM hw h JOIN nk ON nk.key = h.key
WHERE h.i = nk.c - 1
"""


@df_query("timeseries_holt_linear", _HOLT_ORACLE)
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear level/trend state and one-step forecast for each
    event type's daily totals — the smoothing companion to the EWMA and
    Theil-Sen rows. Sequential state folds in-row over the calendar-
    bounded day array; no windows, no driver loop, one shuffle.
    """
    ev = tables.load(spark, sf_dir, "events")
    hw = ts_ops.holt_linear_daily(ev, "event_type", "ts", "value", value_scale=100)
    return hw.select(
        F.col("key").alias("event_type"),
        "n_days",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("forecast", 6).alias("forecast"),
    )


# --- eval_calibration_error -------------------------------------------------
# Scalar calibration summary of the GD classifier: expected calibration
# error (10 deciles) + Brier score, both EXACT before the single final
# division: the classifier's p is an exact 8-decimal value (pfin repr-
# rounds), so n_b*|mean_p - rate| telescopes to |SUM(p) - pos| in
# DECIMAL, and (p - y)^2 sums exactly in DECIMAL(38,16).


def _calibration_error_oracle() -> str:
    from datafusion_server_spark.queries.classifier import _logreg_ctes

    return f"""
WITH {_logreg_ctes()},
scored AS (
  SELECT p.p, CAST(p.p AS DECIMAL(18,8)) AS pd, l.y
  FROM pfin p JOIN lab l ON l.id = p.id),
bt AS (
  SELECT CAST(LEAST(9, CAST(FLOOR(p * 10.0) AS BIGINT)) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         SUM(pd) AS sum_p
  FROM scored GROUP BY 1),
gap AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
               SUM(ABS(sum_p - pos)) AS g
        FROM bt),
br AS (SELECT SUM(CAST((pd - CAST(y AS DECIMAL(18,8)))
                       * (pd - CAST(y AS DECIMAL(18,8))) AS DECIMAL(38,16))) AS bs
       FROM scored)
SELECT gap.n_total,
       {rrepr("CAST(gap.g AS DOUBLE) / gap.n_total", 8)} AS ece,
       {rrepr("CAST(br.bs AS DOUBLE) / gap.n_total", 8)} AS brier
FROM gap, br
"""


@df_query("eval_calibration_error", _calibration_error_oracle())
def eval_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECE(10 bins) + Brier score of the hashed-BoW GD classifier —
    the scalar companions to the per-band calibration curve and its
    isotonic fit. Two bounded aggregations over the shared scoring
    pipeline; every sum is DECIMAL-exact, the only floats are the two
    final divisions.
    """
    from datafusion_server_spark.operators import classifier as clf_ops
    from datafusion_server_spark.queries.classifier import DIM, ITERS, LR, PROBE

    docs = tables.load(spark, sf_dir, "documents")
    feats = clf_ops.hashed_features(docs, "text", "doc_id", DIM)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.array_contains(F.split(F.col("text"), " "), PROBE), 1.0
        ).otherwise(0.0).alias("y"),
    )
    w = clf_ops.train_logreg(feats, labels, DIM, ITERS, LR)
    scored = clf_ops.predict(feats, w).join(labels, "id").select(
        "p",
        F.col("p").cast("decimal(18,8)").alias("pd"),
        "y",
    )
    band = F.least(F.lit(9), F.floor(F.col("p") * 10.0)).cast("bigint")
    bt = scored.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("y") == 1.0).cast("bigint")).cast("bigint").alias("pos"),
        F.sum("pd").alias("sum_p"),
    )
    gap = bt.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(F.abs(F.col("sum_p") - F.col("pos"))).alias("g"),
    )
    diff = F.col("pd") - F.col("y").cast("decimal(18,8)")
    br = scored.agg(F.sum((diff * diff).cast("decimal(38,16)")).alias("bs"))
    return gap.crossJoin(br).select(
        "n_total",
        F.round(F.col("g").cast("double") / F.col("n_total"), 8).alias("ece"),
        F.round(F.col("bs").cast("double") / F.col("n_total"), 8).alias("brier"),
    )


# --- sample_kcenter_coreset -------------------------------------------------
# Farthest-first k-center coreset over the embeddings table — geometry
# coverage for subset selection (rare modes survive). ALL-integer
# squared-euclidean argmax chain; oracle = the greedy loop unrolled
# into MATERIALIZED CTE levels (house pattern for sequential picks,
# cf. MMR), so agreement proves SELECTION ORDER, not just the set.

_KC_K = 8


def _kcenter_oracle(k: int = _KC_K) -> str:
    parts = [
        "sq AS (SELECT vec_id, CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT))"
        " AS BIGINT) AS sqn FROM el GROUP BY vec_id)",
        "c1 AS MATERIALIZED (SELECT MIN(vec_id) AS cid FROM embeddings)",
    ]
    for t in range(1, k):
        ct = f"c{t}"
        parts.append(
            f"""d{t} AS (
  SELECT a.vec_id AS id,
         CAST(SUM(CAST(ROUND(a.x * b.x * 1e12) AS BIGINT)) AS BIGINT) AS dot
  FROM el a JOIN el b ON b.i = a.i JOIN {ct} ON b.vec_id = {ct}.cid
  GROUP BY a.vec_id)"""
        )
        prior = (
            "sa.sqn + sc.sqn - 2 * d.dot"
            if t == 1
            else "LEAST(m.mind, sa.sqn + sc.sqn - 2 * d.dot)"
        )
        src = f"d{t} d" if t == 1 else f"m{t - 1} m JOIN d{t} d ON d.id = m.id"
        idref = "d.id" if t == 1 else "m.id"
        parts.append(
            f"""m{t} AS MATERIALIZED (
  SELECT {idref} AS id, {prior} AS mind
  FROM {src} JOIN sq sa ON sa.vec_id = {idref}
  CROSS JOIN (SELECT sq.sqn FROM sq JOIN {ct} ON sq.vec_id = {ct}.cid) sc
  WHERE {idref} <> (SELECT cid FROM {ct}))"""
        )
        parts.append(
            f"c{t + 1} AS MATERIALIZED (SELECT id AS cid, mind FROM m{t}"
            " ORDER BY mind DESC, id ASC LIMIT 1)"
        )
    selects = [
        "SELECT CAST(1 AS BIGINT) AS pick_order, cid AS vec_id,"
        " CAST(NULL AS BIGINT) AS radius FROM c1"
    ] + [
        f"SELECT CAST({t} AS BIGINT), cid, mind FROM c{t}"
        for t in range(2, k + 1)
    ]
    return (
        "WITH " + _EL_CTE.strip().rstrip(",") + ",\n" + ",\n".join(parts)
        + "\n" + "\nUNION ALL ".join(selects)
    )


@df_query("sample_kcenter_coreset", _kcenter_oracle())
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-point farthest-first coreset of the embeddings table with its
    covering-radius profile — the diversity-coverage sampler next to
    cluster_balanced_sample's density correction. Greedy steps are k
    bounded sequential jobs; everything per step is one broadcast +
    one narrow update + one TakeOrderedAndProject.
    """
    emb = tables.load(spark, sf_dir, "embeddings")
    return sim_ops.kcenter_select(emb, k=_KC_K)


# --- text_rake_keywords -----------------------------------------------------
# RAKE keyphrase extraction (Rose et al. 2010) over the documents
# corpus: stopword-delimited phrase islands, deg/freq word scores,
# phrase-sum ranking — all BIGINT (1e-9-unit integer-division word
# scores), so no float aggregation anywhere.

_RAKE_K = 15
_RAKE_STOPS = "', '".join(("the", "a", "of", "and", "to", "in", "is"))

_RAKE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id AS id,
         GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS pos,
         UNNEST(string_split(text, ' ')) AS w
  FROM documents),
ns AS (
  SELECT id, pos, w,
         CAST(pos - ROW_NUMBER() OVER (PARTITION BY id ORDER BY pos) AS BIGINT) AS island
  FROM tok WHERE w <> '' AND w NOT IN ('{_RAKE_STOPS}')),
phrases AS (
  SELECT id, island, STRING_AGG(w, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS len
  FROM ns GROUP BY id, island),
wstats AS (
  SELECT n.w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(p.len) AS BIGINT) AS deg
  FROM ns n JOIN phrases p ON p.id = n.id AND p.island = n.island
  GROUP BY n.w),
wscore AS (SELECT w, CAST((1000000000 * deg) // freq AS BIGINT) AS wscore FROM wstats),
pscore AS (
  SELECT n.id, n.island, p.phrase, p.len,
         CAST(SUM(s.wscore) AS BIGINT) AS occ_score
  FROM ns n
  JOIN phrases p ON p.id = n.id AND p.island = n.island
  JOIN wscore s ON s.w = n.w
  GROUP BY n.id, n.island, p.phrase, p.len),
agg AS (
  SELECT phrase, MAX(len) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         MAX(occ_score) AS score_nano
  FROM pscore GROUP BY phrase)
SELECT CAST(rnk AS BIGINT) AS rank_pos, phrase, n_words, n_occurrences, score_nano
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score_nano DESC, phrase ASC) AS rnk
      FROM agg) t
WHERE rnk <= {_RAKE_K}
"""


@df_query("text_rake_keywords", _RAKE_ORACLE)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 corpus keyphrases by RAKE — the unsupervised keyword
    extractor next to TF-IDF/PMI: stopword-delimited islands, integer
    deg/freq word scores, phrase-sum ranking, global top-k via
    TakeOrderedAndProject.
    """
    from datafusion_server_spark.operators import text as text_ops

    docs = tables.load(spark, sf_dir, "documents")
    return text_ops.rake_keywords(docs, "text", "doc_id", k=_RAKE_K)


# --- text_textrank_keywords -------------------------------------------------
# TextRank (Mihalcea & Tarau 2004): PageRank over the word
# co-occurrence graph (consecutive kept tokens, both directions,
# count-weighted). Composes the existing all-integer DISTRIBUTED
# pagerank — the word graph is vocabulary-scale, so the folded
# bounded-state path stays OFF and the Pregel loop keeps per-iteration
# state partitioned. Oracle = the same recurrence unrolled
# (pagerank_oracle_ctes) over an identically-derived edge list.

_TR_K = 15
_TR_ITERS = 5

_TR_EDGES_SQL = f"""
WITH tok AS (
  SELECT doc_id AS id,
         GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS pos,
         UNNEST(string_split(text, ' ')) AS w
  FROM documents),
kept AS (
  SELECT id, pos, w FROM tok
  WHERE w <> '' AND w NOT IN ('{_RAKE_STOPS}')),
adj AS (
  SELECT w AS w1, LEAD(w) OVER (PARTITION BY id ORDER BY pos) AS w2
  FROM kept),
und AS (
  SELECT w1, w2 FROM adj WHERE w2 IS NOT NULL
  UNION ALL
  SELECT w2, w1 FROM adj WHERE w2 IS NOT NULL)
SELECT w1 AS src, w2 AS dst, CAST(COUNT(*) AS BIGINT) AS w
FROM und GROUP BY 1, 2
"""

_TR_ORACLE = (
    graph_ops.pagerank_oracle_ctes(
        # the generator wraps edges_sql in "edges AS MATERIALIZED (...)",
        # so the WITH chain above must fold into a derived-table form
        f"SELECT * FROM ({_TR_EDGES_SQL.replace('WITH', 'WITH', 1)}) tr_e",
        iterations=_TR_ITERS,
    )
    + f"""
SELECT CAST(rnk AS BIGINT) AS rank_pos, id AS word, r AS rank_nano,
       {rrepr(f"CAST(r AS DOUBLE) / {graph_ops.RANK_ONE}", 9)} AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY r DESC, id ASC) AS rnk
      FROM r{_TR_ITERS}) t
WHERE rnk <= {_TR_K}
"""
)


@df_query("text_textrank_keywords", _TR_ORACLE)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 corpus keywords by TextRank — PageRank centrality on the
    word co-occurrence graph, the graph-based complement to RAKE's
    frequency statistics. One token explode + one doc-partitioned LEAD
    builds the vocabulary-bounded edge aggregate; the integer Pregel
    loop and a TakeOrderedAndProject top-k finish it.
    """
    docs = tables.load(spark, sf_dir, "documents")
    stops = ("the", "a", "of", "and", "to", "in", "is")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w"),
    ).filter((F.col("w") != "") & ~F.col("w").isin(*stops))
    from pyspark.sql.window import Window as _W

    nxt = F.lead("w").over(_W.partitionBy("id").orderBy("pos"))
    adj = toks.select("id", "w", nxt.alias("w2")).filter(F.col("w2").isNotNull())
    und = adj.select(F.col("w").alias("src"), F.col("w2").alias("dst")).unionAll(
        adj.select(F.col("w2").alias("src"), F.col("w").alias("dst"))
    )
    edges = und.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    ranks = graph_ops.pagerank(
        edges, "src", "dst", "w", iterations=_TR_ITERS, folded=False
    )
    from datafusion_server_spark.operators.scale import ranked_topk

    return ranked_topk(
        ranks,
        [F.desc("rank_nano"), F.asc("id")],
        _TR_K,
        rank_col="rank_pos",
    ).select(
        "rank_pos",
        F.col("id").alias("word"),
        "rank_nano",
        F.round(
            F.col("rank_nano").cast("double") / graph_ops.RANK_ONE, 9
        ).alias("rank"),
    )


# --- eval_bootstrap_ci_mean -------------------------------------------------
# Poisson(1) single-pass bootstrap (Chamandy et al. 2012) CI for the
# corpus mean document length: deterministic integer weights from md5
# residues against precomputed CDF thresholds, replicate means from
# exact BIGINT sums, CI bounds by ELEMENT selection over the
# replicate-bounded table.

_BOOT_R = 40
_BOOT_LO_IDX = 2
_BOOT_HI_IDX = 39


def _bootstrap_oracle() -> str:
    from datafusion_server_spark.operators.profiling import POISSON1_CDF_MICRO

    case = " ".join(
        f"WHEN um < {t} THEN {k}" for k, t in enumerate(POISSON1_CDF_MICRO)
    )
    return f"""
WITH reps AS (
  SELECT d.doc_id AS id, CAST(d.n_chars AS BIGINT) AS v, rr.r
  FROM documents d, (SELECT UNNEST(RANGE(1, {_BOOT_R + 1})) AS r) rr),
uw AS (
  SELECT r, v,
         CASE {case} ELSE {len(POISSON1_CDF_MICRO)} END AS w
  FROM (SELECT r, v,
               CAST(('0x' || SUBSTR(md5(CAST(id AS VARCHAR) || ':' || CAST(r AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS um
        FROM reps) t),
per AS (SELECT r, CAST(SUM(w * v) AS BIGINT) AS swv, CAST(SUM(w) AS BIGINT) AS sw
        FROM uw GROUP BY r),
means AS (SELECT r, CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) AS m FROM per),
ranked AS MATERIALIZED (SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rn FROM means),
fl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(*) AS mf
       FROM documents)
SELECT n_rows, CAST({_BOOT_R} AS BIGINT) AS n_replicates,
       {rrepr("mf", 6)} AS mean_full,
       {rrepr(f"(SELECT m FROM ranked WHERE rn = {_BOOT_LO_IDX})", 6)} AS boot_lo,
       {rrepr(f"(SELECT m FROM ranked WHERE rn = {_BOOT_HI_IDX})", 6)} AS boot_hi
FROM fl
"""


@df_query("eval_bootstrap_ci_mean", _bootstrap_oracle())
def eval_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for the corpus mean document length —
    the uncertainty companion every pipeline health metric needs at a
    scale where classic resampling is impossible. One pass, 40x
    map-side fanout collapsed by the combiner, everything after
    replicate-bounded.
    """
    from datafusion_server_spark.operators import profiling as prof_ops

    docs = tables.load(spark, sf_dir, "documents")
    ci = prof_ops.poisson_bootstrap_mean(
        docs, "doc_id", "n_chars",
        replicates=_BOOT_R, lo_idx=_BOOT_LO_IDX, hi_idx=_BOOT_HI_IDX,
    )
    return ci.select(
        "n_rows",
        "n_replicates",
        F.round("mean_full", 6).alias("mean_full"),
        F.round("boot_lo", 6).alias("boot_lo"),
        F.round("boot_hi", 6).alias("boot_hi"),
    )


# --- profile_cramers_v ------------------------------------------------------
# Cramér's V association between event type and day-of-week (epoch-day
# mod 7 — engine-neutral, no dow-convention trap): per-cell chi2 terms
# repr-round to the 1e-6 grid and sum as DECIMAL(38,6) so the total is
# exact; final sqrt is one IEEE op on identical inputs.


_CV_ORACLE = f"""
WITH base AS (
  SELECT event_type AS a,
         CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS BIGINT) AS b
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
obs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM base GROUP BY a, b),
cells AS (
  SELECT g.a, g.b, CAST(COALESCE(obs.o, 0) AS BIGINT) AS o
  FROM (SELECT da.a, db.b
        FROM (SELECT DISTINCT a FROM obs) da,
             (SELECT DISTINCT b FROM obs) db) g
  LEFT JOIN obs ON obs.a = g.a AND obs.b = g.b),
rowt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY a),
colt AS (SELECT b, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY b),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS ra,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS cb
        FROM cells),
terms AS (
  SELECT t.n, t.ra, t.cb,
         CAST({rrepr("(CAST(c.o AS DOUBLE) - CAST(r.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE)) * (CAST(c.o AS DOUBLE) - CAST(r.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE)) / (CAST(r.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(t.n AS DOUBLE))", 6)} AS DECIMAL(38,6)) AS cell
  FROM cells c JOIN rowt r ON r.a = c.a JOIN colt ct ON ct.b = c.b CROSS JOIN tot t)
SELECT n, ra AS n_rows_cat, cb AS n_cols_cat,
       CAST(SUM(cell) AS DOUBLE) AS chi2,
       {rrepr("SQRT(CAST(SUM(cell) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(LEAST(ra - 1, cb - 1) AS DOUBLE)))", 6)} AS v
FROM terms GROUP BY n, ra, cb
"""


@df_query("profile_cramers_v", _CV_ORACLE)
def profile_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between event type and day-of-week — the normalized
    effect-size companion to the chi-squared drift row (chi2 grows with
    n; V stays in [0,1]). Cell-bounded aggregations only.
    """
    from datafusion_server_spark.operators import profiling as prof_ops

    ev = tables.load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    base = ev.select(
        "event_type",
        (F.unix_date(F.to_date("ts")) % 7).cast("bigint").alias("dow7"),
    )
    out = prof_ops.cramers_v(base, "event_type", "dow7")
    return out.select(
        "n",
        "n_rows_cat",
        "n_cols_cat",
        F.col("chi2"),
        F.round("v", 6).alias("v"),
    )


# --- profile_topk_heavy_change ----------------------------------------------
# Heavy-change detection between two snapshots (the drift triage step
# after PSI/chi2 say "something moved"): top-K categories by absolute
# SHARE delta. The ranking key is the cross-multiplied integer
# |ca*nb - cb*na| (DECIMAL(38,0)-exact products so warehouse-scale
# counts cannot overflow) — no float enters the order.

_HC_K = 20
_HC_CUT = "1996-01-01"

_HC_ORACLE = f"""
WITH counts AS (
  SELECT l_partkey AS part,
         CAST(SUM(CASE WHEN l_shipdate <  TIMESTAMP '{_HC_CUT}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '{_HC_CUT}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM lineitem GROUP BY 1),
tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM counts),
scored AS (
  SELECT c.part, c.ca, c.cb, t.na, t.nb,
         ABS(CAST(c.ca AS DECIMAL(38,0)) * t.nb - CAST(c.cb AS DECIMAL(38,0)) * t.na) AS xm
  FROM counts c CROSS JOIN tot t)
SELECT part, ca, cb,
       {rrepr("CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb", 8)} AS share_delta,
       CAST(rnk AS BIGINT) AS rank_pos
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY xm DESC, part ASC) AS rnk FROM scored) s
WHERE rnk <= {_HC_K}
"""


@df_query("profile_topk_heavy_change", _HC_ORACLE)
def profile_topk_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by absolute demand-share change across the 1996
    ship-date boundary — one conditional-sum pass builds the per-part
    snapshot counts, broadcast totals score them, the integer
    cross-multiplication orders them, TakeOrderedAndProject finishes.
    """
    from datafusion_server_spark.operators.scale import ranked_topk

    li = tables.load(spark, sf_dir, "lineitem")
    before = (F.col("l_shipdate") < _HC_CUT).cast("bigint")
    counts = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(before).cast("bigint").alias("ca"),
        F.sum(1 - before).cast("bigint").alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    scored = counts.crossJoin(F.broadcast(tot)).withColumn(
        "xm",
        F.abs(
            F.col("ca").cast("decimal(38,0)") * F.col("nb")
            - F.col("cb").cast("decimal(38,0)") * F.col("na")
        ),
    )
    return ranked_topk(
        scored, [F.desc("xm"), F.asc("part")], _HC_K, rank_col="rank_pos"
    ).select(
        "part",
        "ca",
        "cb",
        F.round(
            F.col("ca").cast("double") / F.col("na")
            - F.col("cb").cast("double") / F.col("nb"),
            8,
        ).alias("share_delta"),
        "rank_pos",
    )


# --- text_ngram_novelty -----------------------------------------------------
# Per-source novelty: the share of each source's distinct word-3-grams
# it introduced to the corpus (first occurrence = MIN doc_id over the
# gram — deterministic attribution, no ordering ambiguity). The ratio
# is a micro-average n_novel/n_grams of exact BIGINTs — a macro mean
# of per-doc ratios would be a float sum, so it is deliberately not
# offered.

_NOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source,
         GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS pos,
         UNNEST(string_split(text, ' ')) AS w
  FROM documents),
tri AS (
  SELECT DISTINCT doc_id, source,
         w || ' ' || LEAD(w, 1) OVER wd || ' ' || LEAD(w, 2) OVER wd AS g
  FROM tok WHERE w <> ''
  WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)),
tri2 AS (SELECT doc_id, source, g FROM tri WHERE g IS NOT NULL),
firsts AS (SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM tri2 GROUP BY g),
per AS (
  SELECT t.source,
         CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM tri2 t JOIN firsts f ON f.g = t.g
  GROUP BY t.source)
SELECT source, n_docs, n_grams, n_novel,
       {rrepr("CAST(n_novel AS DOUBLE) / CAST(n_grams AS DOUBLE)", 6)} AS novelty
FROM per
"""


@df_query("text_ngram_novelty", _NOV_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much genuinely new text each source contributes: the share
    of its distinct 3-grams whose corpus-first occurrence (min doc_id)
    lands in that source's docs — the novelty/memorization profile read
    next to self-overlap diversity and the contamination check. One
    explode + two gram-keyed aggregations; LEAD windows are doc-
    partitioned.
    """
    from pyspark.sql.window import Window as _W

    docs = tables.load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    wd = _W.partitionBy("doc_id").orderBy("pos")
    tri = (
        tok.select(
            "doc_id",
            "source",
            F.concat_ws(
                " ", F.col("w"), F.lead("w", 1).over(wd), F.lead("w", 2).over(wd)
            ).alias("g"),
            F.lead("w", 2).over(wd).alias("__w3"),
        )
        .filter(F.col("__w3").isNotNull())
        .select("doc_id", "source", "g")
        .distinct()
    )
    firsts = tri.groupBy("g").agg(F.min("doc_id").cast("bigint").alias("first_doc"))
    per = (
        tri.join(firsts, "g")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("bigint")
            ).cast("bigint").alias("n_novel"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "n_grams",
        "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"), 6
        ).alias("novelty"),
    )
