"""Round-9 extension queries: URL-canonicalization dedup, CUSUM
changepoints, linear multi-touch attribution, label-propagation
communities, Kaplan-Meier survival, matryoshka truncated-dim recall.

Beyond-reference analytics (SURVEY.md §2 extensions) following the
house determinism rules: float sums become per-term scaled-BIGINT
sums, argmaxes carry explicit tie-breaks, sequential float folds run
in an identical order on both engines, and raw doubles are repr-round
paired (``rrepr``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import urltools
from datafusion_server_spark.queries import df_query, rrepr

# --- web_url_canonicalize -------------------------------------------------
# The fixture corpus has no URL column, so (exactly like the html /
# multimodal families) each document SYNTHESIZES three deterministic raw
# spellings of its page URL — uppercase host + default port + utm +
# trailing slash, fragment anchor, reordered params — via the same
# concatenation on both engines; the query under test is the
# canonicalize -> group-by-canonical dedup that collapses them.
_PAGE_KEY = "doc_id % 97"  # many docs share a page -> real collapse


def _variants_sql() -> str:
    k = f"CAST({_PAGE_KEY} AS VARCHAR)"
    d = "CAST(doc_id AS VARCHAR)"
    z = "CAST(doc_id % 5 AS VARCHAR)"
    return (
        f"['HTTPS://' || UPPER(source) || '.Example.ORG:443/articles/' || {k}"
        f"   || '/?id=' || {k} || '&utm_source=feed',"
        f" 'https://' || source || '.example.org/articles/' || {k}"
        f"   || '?id=' || {k} || '#frag-' || {d},"
        f" 'https://' || source || '.example.org/articles/' || {k}"
        f"   || '?z=' || {z} || '&id=' || {k} || '&ref=rss']"
    )


def _variants_spark() -> F.Column:
    k = (F.col("doc_id") % 97).cast("string")
    d = F.col("doc_id").cast("string")
    z = (F.col("doc_id") % 5).cast("string")
    return F.array(
        F.concat(
            F.lit("HTTPS://"), F.upper(F.col("source")),
            F.lit(".Example.ORG:443/articles/"), k,
            F.lit("/?id="), k, F.lit("&utm_source=feed"),
        ),
        F.concat(
            F.lit("https://"), F.col("source"),
            F.lit(".example.org/articles/"), k,
            F.lit("?id="), k, F.lit("#frag-"), d,
        ),
        F.concat(
            F.lit("https://"), F.col("source"),
            F.lit(".example.org/articles/"), k,
            F.lit("?z="), z, F.lit("&id="), k, F.lit("&ref=rss"),
        ),
    )


_URL_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, UNNEST({_variants_sql()}) AS url FROM documents),
canon AS (
  SELECT doc_id, url, {urltools.canonicalize_url_sql("url")} AS canonical_url
  FROM raw)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_forms,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM canon GROUP BY canonical_url
"""


@df_query("web_url_canonicalize", _URL_ORACLE)
def web_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup inventory: canonicalize every raw URL
    spelling (case/port/fragment/tracking-param/param-order/trailing-
    slash normalization, operators/urltools.py) and group by the
    canonical form. The canonicalization is a pure narrow projection
    (codegen into the scan — zero shuffle cost at 100 TB); the dedup is
    ONE hash aggregation keyed by the canonical string, the first-pass
    URL dedup every crawl pipeline runs before touching content bytes.
    """
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "source")
    raw = docs.select(
        "doc_id", F.explode(_variants_spark()).alias("url")
    )
    canon = raw.select(
        "doc_id", "url", urltools.canonicalize_url(F.col("url")).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.countDistinct("url").cast("bigint").alias("n_forms"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )


# --- timeseries_cusum_changepoint ----------------------------------------
# Offline CUSUM level-shift detection per event type over daily revenue
# totals. The argmax runs on the all-integer C_t = n*cum_t - t*total
# (see operators/timeseries.cusum_changepoint); only the three display
# divisions are doubles, repr-round paired.
_CUSUM_SCALE = 100

_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS key, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * {_CUSUM_SCALE}) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
cur AS (
  SELECT key, day,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
         CAST(SUM(x) OVER w AS BIGINT) AS cum,
         CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n,
         CAST(SUM(x) OVER (PARTITION BY key) AS BIGINT) AS total
  FROM daily
  WINDOW w AS (PARTITION BY key ORDER BY day)),
c AS (
  SELECT *, n * cum - t * total AS c FROM cur),
picked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY ABS(c) DESC, day ASC) AS rn
  FROM c)
SELECT key AS event_type, day AS cp_day, n AS n_days,
       {rrepr(f"CAST(ABS(c) AS DOUBLE) / CAST(n AS DOUBLE) / {_CUSUM_SCALE}.0", 4)} AS cusum_stat,
       {rrepr(f"CAST(cum AS DOUBLE) / CAST(t AS DOUBLE) / {_CUSUM_SCALE}.0", 4)} AS mean_before,
       {rrepr(f"CAST(total - cum AS DOUBLE) / CAST(n - t AS DOUBLE) / {_CUSUM_SCALE}.0", 4)} AS mean_after
FROM picked WHERE rn = 1 AND n >= 2 AND t < n
"""


@df_query("timeseries_cusum_changepoint", _CUSUM_ORACLE)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint over daily value totals: the day
    maximizing |S_t| (ties earliest), with the daily-mean level before
    (days <= cp) and after (days > cp). One (type, day) map-side-combined
    aggregation reduces the corpus to calendar-bounded series; every
    window after that is per-type over <= n_days rows."""
    from datafusion_server_spark.operators import timeseries as ts_ops

    ev = tables.load(spark, sf_dir, "events")
    cp = ts_ops.cusum_changepoint(
        ev, "event_type", "ts", "value", value_scale=_CUSUM_SCALE
    )
    return cp.select(
        F.col("key").alias("event_type"),
        "cp_day",
        "n_days",
        F.round(F.col("cusum_stat"), 4).alias("cusum_stat"),
        F.round(F.col("mean_before"), 4).alias("mean_before"),
        F.round(F.col("mean_after"), 4).alias("mean_after"),
    )


# --- events_attribution_linear --------------------------------------------
# Linear multi-touch attribution: each purchase's cents split equally
# across the user's view/click touches in the 3 days before it, the
# earliest touch absorbing the integer remainder; no-touch purchases
# credit '(none)'. All-integer (operators/funnel.linear_attribution);
# the oracle joins on the raw time predicate (no bucketing needed at
# oracle scale) — identical pair set by construction.
_ATTR_LOOKBACK_S = 3 * 86400
_ATTR_TOUCHES = ("view", "click")

_ATTR_ORACLE = f"""
WITH base AS (
  SELECT user_id AS u, event_type AS t, event_id AS id, epoch_us(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS v
  FROM events),
conv AS (SELECT u, id AS conv_id, us AS conv_us, v AS conv_v FROM base WHERE t = 'purchase'),
touch AS (SELECT u, t AS touch_type, id AS touch_id, us AS touch_us FROM base
          WHERE t IN ('view', 'click')),
pairs AS (
  SELECT c.conv_id, c.conv_v, t.touch_type, t.touch_id, t.touch_us
  FROM conv c JOIN touch t ON t.u = c.u
  WHERE t.touch_us < c.conv_us
    AND c.conv_us - t.touch_us <= CAST({_ATTR_LOOKBACK_S} AS BIGINT) * 1000000),
credited AS (
  SELECT touch_type,
         conv_v // CAST(COUNT(*) OVER w AS BIGINT)
         + CASE WHEN ROW_NUMBER() OVER (PARTITION BY conv_id
                                        ORDER BY touch_us, touch_id) = 1
                THEN conv_v % CAST(COUNT(*) OVER w AS BIGINT) ELSE 0 END AS credit
  FROM pairs
  WINDOW w AS (PARTITION BY conv_id)),
unattributed AS (
  SELECT '(none)' AS touch_type, conv_v AS credit
  FROM conv WHERE conv_id NOT IN (SELECT conv_id FROM pairs)),
allc AS (SELECT * FROM credited UNION ALL SELECT * FROM unattributed)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit) AS BIGINT) AS attributed_scaled,
       {rrepr("CAST(SUM(credit) AS DOUBLE) / 100.0", 2)} AS attributed_value
FROM allc GROUP BY touch_type
"""


@df_query("events_attribution_linear", _ATTR_ORACLE)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution of purchase value to preceding
    view/click touches (3-day lookback; equal integer shares, remainder
    to the earliest touch; '(none)' bucket for cold conversions). The
    pairing is the bucketed range-join (equi-join on user x time-bucket,
    conversion side exploded into 2 buckets) — no per-user theta join."""
    from datafusion_server_spark.operators import funnel as funnel_ops

    ev = tables.load(spark, sf_dir, "events")
    att = funnel_ops.linear_attribution(
        ev, "user_id", "event_type", "ts", "event_id", "value",
        conversion_type="purchase",
        touch_types=_ATTR_TOUCHES,
        lookback_s=_ATTR_LOOKBACK_S,
        value_scale=100,
    )
    return att.select(
        "touch_type",
        "n_touches",
        "attributed_scaled",
        F.round(F.col("attributed_scaled").cast("double") / 100.0, 2).alias(
            "attributed_value"
        ),
    )


# --- graph_label_propagation ----------------------------------------------
# Community detection over the part co-purchase graph: deterministic
# synchronous label propagation (plurality neighbor label, min-label
# ties), 3 rounds, then community sizes. Oracle = the rounds unrolled
# into a CTE chain (house fixed-iteration pattern).
_LPA_ITERS = 3

_LPA_EDGES_SQL = """
SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _lpa_oracle() -> str:
    from datafusion_server_spark.operators import graph as graph_ops

    return (
        graph_ops.label_propagation_oracle_ctes(_LPA_EDGES_SQL, _LPA_ITERS)
        + f"""
SELECT label AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(MIN(node) AS BIGINT) AS min_member,
       CAST(MAX(node) AS BIGINT) AS max_member
FROM l{_LPA_ITERS} GROUP BY label
"""
    )


@df_query("graph_label_propagation", _lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (3 deterministic
    rounds) over the co-purchase graph; output = per-community size and
    id span. Each round is one adjacency join + one grouped argmax —
    the relational Pregel step; the node set is corpus-scale so the
    iteration stays distributed (no bounded fold)."""
    from datafusion_server_spark.operators import graph as graph_ops

    li = tables.load(spark, sf_dir, "lineitem")
    edges = graph_ops.copurchase_edges(li)
    labels = graph_ops.label_propagation(edges, iterations=_LPA_ITERS)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").cast("bigint").alias("min_member"),
        F.max("node").cast("bigint").alias("max_member"),
    )


# --- events_survival_km -----------------------------------------------------
# Kaplan-Meier user-lifetime survival with right censoring (users still
# active within 3 days of the observation end). The KM product folds a
# day-ordered factor list identically on both engines (see
# operators/funnel.kaplan_meier); DuckDB's list_reduce left-fold and
# Spark's aggregate(…, 1.0, *) agree exactly because 1.0 * f1 == f1.
_KM_CENSOR_S = 3 * 86400

_KM_ORACLE = f"""
WITH spans AS (
  SELECT user_id AS u, MIN(epoch_us(ts)) AS f, MAX(epoch_us(ts)) AS l
  FROM events GROUP BY user_id),
endt AS (SELECT MAX(epoch_us(ts)) AS e FROM events),
du AS (
  SELECT (l - f) // 86400000000 AS dur,
         CASE WHEN e - l >= CAST({_KM_CENSOR_S} AS BIGINT) * 1000000
              THEN 1 ELSE 0 END AS ch
  FROM spans, endt),
curve AS (
  SELECT dur, CAST(SUM(ch) AS BIGINT) AS d, CAST(SUM(1 - ch) AS BIGINT) AS c
  FROM du GROUP BY dur),
risk AS (
  SELECT dur, d, c,
         CAST(SUM(d + c) OVER (ORDER BY dur DESC) AS BIGINT) AS n
  FROM curve),
lst AS (
  SELECT LIST({{'dur': dur, 'd': d, 'c': c, 'n': n}} ORDER BY dur) AS l
  FROM risk),
fl AS (
  SELECT l, list_transform(l, x -> 1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)) AS f
  FROM lst),
km AS (
  SELECT UNNEST(list_transform(l, (x, i) ->
    {{'dur': x.dur, 'd': x.d, 'c': x.c, 'n': x.n,
      's': list_reduce(f[1:i], (a, b) -> a * b)}})) AS r
  FROM fl)
SELECT r.dur AS dur_day, r.n AS n_at_risk, r.d AS n_churned,
       r.c AS n_censored, {rrepr("r.s", 6)} AS km_survival
FROM km
"""


@df_query("events_survival_km", _KM_ORACLE)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (first-to-last-event
    days), right-censoring users still active near the observation end.
    One user-keyed aggregation is the only corpus-scale shuffle; the
    curve itself is calendar-day-bounded."""
    from datafusion_server_spark.operators import funnel as funnel_ops

    ev = tables.load(spark, sf_dir, "events")
    km = funnel_ops.kaplan_meier(ev, "user_id", "ts", censor_after_s=_KM_CENSOR_S)
    return km.select(
        "dur_day", "n_at_risk", "n_churned", "n_censored",
        F.round(F.col("km_survival"), 6).alias("km_survival"),
    )


# --- eval_matryoshka_recall -------------------------------------------------
# Matryoshka-style truncation eval (Kusupati et al. 2022): how much of
# the full-dimension brute-force top-K does a prefix-truncated embedding
# retain? The production question behind shipping 16 of 64 dims to cut
# index cost 4x. Both sides score with the house exact scaled-long dot
# (per-element ROUND(x*y*1e12) summed as BIGINT), rank by
# (round(cosine,6) DESC, neighbor_id) — fully deterministic.
_MK_K = 10
_MK_QUERIES = 20
_MK_DIM = 16

_MK_ORACLE = f"""
WITH el AS (
  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
         GENERATE_SUBSCRIPTS(embedding, 1) AS i
  FROM embeddings),
nf AS (SELECT vec_id,
              SQRT(CAST(CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
       FROM el GROUP BY vec_id),
nt AS (SELECT vec_id,
              SQRT(CAST(CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
       FROM el WHERE i <= {_MK_DIM} GROUP BY vec_id),
df_full AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
         CAST(SUM(CAST(ROUND(qa.x * ca.x * 1e12) AS BIGINT)) AS BIGINT) AS dot
  FROM el qa JOIN el ca ON ca.i = qa.i AND ca.vec_id <> qa.vec_id
  WHERE qa.vec_id < {_MK_QUERIES}
  GROUP BY 1, 2),
tk_full AS (
  SELECT query_id, neighbor_id FROM (
    SELECT d.query_id, d.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id
                              ORDER BY ROUND((CAST(d.dot AS DOUBLE) / 1e12) / (nq.nrm * nc.nrm), 6) DESC,
                                       d.neighbor_id) AS rnk
    FROM df_full d
    JOIN nf nq ON nq.vec_id = d.query_id AND nq.nrm > 0
    JOIN nf nc ON nc.vec_id = d.neighbor_id AND nc.nrm > 0) t
  WHERE rnk <= {_MK_K}),
df_tr AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
         CAST(SUM(CAST(ROUND(qa.x * ca.x * 1e12) AS BIGINT)) AS BIGINT) AS dot
  FROM el qa JOIN el ca ON ca.i = qa.i AND ca.vec_id <> qa.vec_id
  WHERE qa.vec_id < {_MK_QUERIES} AND qa.i <= {_MK_DIM} AND ca.i <= {_MK_DIM}
  GROUP BY 1, 2),
tk_tr AS (
  SELECT query_id, neighbor_id FROM (
    SELECT d.query_id, d.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id
                              ORDER BY ROUND((CAST(d.dot AS DOUBLE) / 1e12) / (nq.nrm * nc.nrm), 6) DESC,
                                       d.neighbor_id) AS rnk
    FROM df_tr d
    JOIN nt nq ON nq.vec_id = d.query_id AND nq.nrm > 0
    JOIN nt nc ON nc.vec_id = d.neighbor_id AND nc.nrm > 0) t
  WHERE rnk <= {_MK_K})
SELECT f.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_full,
       CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       {rrepr(f"CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / {_MK_K}.0", 4)} AS recall
FROM tk_full f
LEFT JOIN tk_tr t ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
GROUP BY f.query_id
"""


@df_query("eval_matryoshka_recall", _MK_ORACLE)
def eval_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@K of prefix-truncated (first 16 of 64 dims) brute-force
    cosine search against the full-dimension ground truth, per query —
    the go/no-go table for shipping a truncated index. Both searches
    reuse operators/similarity.cosine_topk (broadcast nested-loop join,
    in-row exact scaled-long dots, no element explode)."""
    from datafusion_server_spark.operators import similarity as sim_ops

    emb = tables.load(spark, sf_dir, "embeddings")
    tr = emb.select(
        "vec_id", F.slice("embedding", 1, _MK_DIM).alias("embedding")
    )
    full_tk = sim_ops.cosine_topk(
        emb, emb.filter(F.col("vec_id") < _MK_QUERIES), _MK_K
    ).select("query_id", "neighbor_id")
    tr_tk = sim_ops.cosine_topk(
        tr, tr.filter(F.col("vec_id") < _MK_QUERIES), _MK_K
    ).select(
        F.col("query_id").alias("tq"), F.col("neighbor_id").alias("tn")
    )
    joined = full_tk.join(
        tr_tk,
        (F.col("query_id") == F.col("tq")) & (F.col("neighbor_id") == F.col("tn")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_full"),
        F.sum(F.when(F.col("tn").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_overlap"),
        F.round(
            F.sum(F.when(F.col("tn").isNotNull(), 1).otherwise(0)).cast("double")
            / float(_MK_K),
            4,
        ).alias("recall"),
    )


# --- scale_hilbert_key ------------------------------------------------------
# Hilbert space-filling-curve layout key over (user bucket, value
# bucket) — the locality-strict upgrade of scale_zorder_key for
# multi-dimensional parquet clustering. The 4-state MSB-first automaton
# folds with the state packed into the accumulator; LUTs derived from
# the classic xy2d loop and grid-verified in tests.
_HILBERT_BITS = 8


def _hilbert_oracle() -> str:
    from datafusion_server_spark.operators import scale as scale_ops

    key = scale_ops.hilbert_key_2d_sql(
        "user_id % 256", "CAST(FLOOR(value) AS BIGINT) % 256", _HILBERT_BITS
    )
    return f"""
SELECT CAST(event_id AS BIGINT) AS event_id, {key} AS hkey
FROM events
WHERE user_id IS NOT NULL AND value IS NOT NULL
"""


@df_query("scale_hilbert_key", _hilbert_oracle())
def scale_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key (8 bits/dim) for layout-time
    multi-dimensional sort: strictly better range-scan locality than
    the Morton key (no quadrant-boundary jumps). One linear-size JVM
    higher-order fold per row — narrow, codegen, no UDF, no shuffle."""
    from datafusion_server_spark.operators import scale as scale_ops

    ev = tables.load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    k = scale_ops.hilbert_key_2d(
        F.col("user_id") % 256,
        F.floor(F.col("value")).cast("bigint") % 256,
        bits=_HILBERT_BITS,
    )
    return ev.select(F.col("event_id").cast("bigint").alias("event_id"), k.alias("hkey"))


# --- events_growth_accounting -----------------------------------------------
# Weekly growth accounting (the "quick ratio" decomposition): every
# active (user, ISO week) is NEW (first week ever), RETAINED (active
# the prior week) or RESURRECTED (returning after a gap); a user active
# in week w but not w+1 counts as CHURNED in w+1 (only when w+1 is
# inside the observation window). Pure integer counts over per-user
# lag/lead windows — engine-exact.
_GROWTH_ORACLE = """
WITH weekly AS (
  SELECT DISTINCT user_id AS u, CAST(DATE_TRUNC('week', ts) AS DATE) AS wk
  FROM events),
maxwk AS (SELECT MAX(wk) AS mw FROM weekly),
seq AS (
  SELECT u, wk,
         LAG(wk) OVER (PARTITION BY u ORDER BY wk) AS prev_wk,
         LEAD(wk) OVER (PARTITION BY u ORDER BY wk) AS next_wk
  FROM weekly),
classified AS (
  SELECT wk,
         CASE WHEN prev_wk IS NULL THEN 'new'
              WHEN wk - prev_wk = 7 THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM seq
  UNION ALL
  SELECT wk + 7 AS wk, 'churned' AS status
  FROM seq, maxwk
  WHERE (next_wk IS NULL OR next_wk - wk > 7) AND wk + 7 <= mw)
SELECT wk AS week,
       CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
       CAST(SUM(CASE WHEN status = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(SUM(CASE WHEN status <> 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_active
FROM classified GROUP BY wk
"""


@df_query("events_growth_accounting", _GROWTH_ORACLE)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: new/retained/resurrected/churned user
    counts per ISO week (churn lands the week AFTER last activity,
    right-edge excluded). One (user, week) distinct + per-user lag/lead
    windows sharing the user partitioning + one week-keyed aggregation
    — the corpus-scale work is a single user-keyed shuffle."""
    from pyspark.sql.window import Window

    ev = tables.load(spark, sf_dir, "events")
    weekly = ev.select(
        F.col("user_id").alias("u"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
    ).distinct()
    mw = weekly.agg(F.max("wk").alias("mw"))
    w = Window.partitionBy("u").orderBy("wk")
    seq = weekly.select(
        "u", "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    classified = seq.select(
        "wk",
        F.when(F.col("prev_wk").isNull(), "new")
        .when(F.datediff(F.col("wk"), F.col("prev_wk")) == 7, "retained")
        .otherwise("resurrected")
        .alias("status"),
    ).unionByName(
        seq.crossJoin(F.broadcast(mw))
        .filter(
            (F.col("next_wk").isNull() | (F.datediff("next_wk", "wk") > 7))
            & (F.date_add("wk", 7) <= F.col("mw"))
        )
        .select(F.date_add("wk", 7).alias("wk"), F.lit("churned").alias("status"))
    )
    return classified.groupBy(F.col("wk").alias("week")).agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).cast("bigint").alias("n_new"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).cast("bigint").alias("n_retained"),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0)).cast("bigint").alias("n_resurrected"),
        F.sum(F.when(F.col("status") == "churned", 1).otherwise(0)).cast("bigint").alias("n_churned"),
        F.sum(F.when(F.col("status") != "churned", 1).otherwise(0)).cast("bigint").alias("n_active"),
    )


# --- text_lm_kneser_ney -----------------------------------------------------
# Interpolated Kneser-Ney bigram cross-entropy (continuation-count
# lower-order model) — see operators/text.lm_kneser_ney_cross_entropy.
# The oracle zips parallel UNNESTs positionally (the JM-bigram
# precedent) and composes the same exact-count ratios in the same order.
_KN_D = 0.75

_KN_ORACLE = f"""
WITH dt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
big AS (
  SELECT doc_id,
         UNNEST(toks[1:len(toks)-1]) AS prev,
         UNNEST(toks[2:len(toks)]) AS cur
  FROM dt WHERE len(toks) >= 2),
firsts AS (SELECT doc_id, CAST(NULL AS VARCHAR) AS prev, toks[1] AS cur
           FROM dt WHERE len(toks) >= 1),
stream AS (SELECT * FROM firsts UNION ALL SELECT * FROM big),
pair_types AS (SELECT DISTINCT prev, cur FROM big),
prefix AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS n_prev FROM big GROUP BY prev),
follow AS (SELECT prev, CAST(COUNT(*) AS BIGINT) AS nf FROM pair_types GROUP BY prev),
cont AS (SELECT cur, CAST(COUNT(*) AS BIGINT) AS n_cont FROM pair_types GROUP BY cur),
bg AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n_ab FROM big GROUP BY prev, cur),
tot AS (SELECT (SELECT CAST(COUNT(DISTINCT cur) AS BIGINT) FROM stream) AS v,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM pair_types) AS b),
scored AS (
  SELECT s.doc_id,
         CAST(ROUND(-LN(
           CASE WHEN s.prev IS NULL
                THEN CAST(COALESCE(c.n_cont, 0) + 1 AS DOUBLE) / CAST(t.b + t.v AS DOUBLE)
                ELSE (CAST(b2.n_ab AS DOUBLE) - {_KN_D}) / CAST(p.n_prev AS DOUBLE)
                     + ({_KN_D} * CAST(f.nf AS DOUBLE) / CAST(p.n_prev AS DOUBLE))
                       * (CAST(COALESCE(c.n_cont, 0) + 1 AS DOUBLE) / CAST(t.b + t.v AS DOUBLE))
           END), 8) AS DECIMAL(18,8)) AS nll
  FROM stream s
  LEFT JOIN cont c ON c.cur = s.cur
  CROSS JOIN tot t
  LEFT JOIN prefix p ON p.prev = s.prev
  LEFT JOIN follow f ON f.prev = s.prev
  LEFT JOIN bg b2 ON b2.prev = s.prev AND b2.cur = s.cur)
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(nll) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS xent_nats
FROM scored GROUP BY doc_id
"""


@df_query("text_lm_kneser_ney", _KN_ORACLE)
def text_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram cross-entropy — the
    continuation-count quality signal (CCNet-style band-pass with a
    sharper LM than the add-one unigram / JM bigram siblings)."""
    from datafusion_server_spark.operators import text as text_ops

    docs = tables.load(spark, sf_dir, "documents")
    return text_ops.lm_kneser_ney_cross_entropy(
        docs, "text", "doc_id", discount=_KN_D
    )


# --- multimodal_frame_sample ------------------------------------------------
# Video frame-sampling schedule: the fixture has no real clips, so each
# document synthesizes deterministic clip metadata (frame count, fps)
# on both engines — the query under test is the uniform-K schedule
# (operators/multimodal.uniform_frame_schedule), all-integer.
_FS_K = 8

_FS_ORACLE = f"""
WITH clips AS (
  SELECT doc_id, 24 + (doc_id % 977) AS n_frames,
         24 + 6 * (doc_id % 2) AS fps
  FROM documents),
s AS (
  SELECT doc_id, n_frames, fps, UNNEST(generate_series(0, {_FS_K - 1})) AS i
  FROM clips)
SELECT CAST(doc_id AS BIGINT) AS clip_id,
       CAST(i AS BIGINT) AS sample_pos,
       CAST((i * n_frames) // {_FS_K} AS BIGINT) AS frame_idx,
       CAST(((i * n_frames) // {_FS_K}) * 1000 // fps AS BIGINT) AS t_ms
FROM s
"""


@df_query("multimodal_frame_sample", _FS_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-K temporal frame-sampling schedule per clip (the decode
    half stays behind the multimodal Pandas-UDF boundary): K uniformly
    spaced frame indices + exact-integer millisecond timestamps. One
    in-row explode, zero shuffle — rides the scan at any scale."""
    from datafusion_server_spark.operators import multimodal as mm_ops

    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    clips = docs.select(
        "doc_id",
        (24 + (F.col("doc_id") % 977)).alias("n_frames"),
        (24 + 6 * (F.col("doc_id") % 2)).alias("fps"),
    )
    sched = mm_ops.uniform_frame_schedule(
        clips, "doc_id", "n_frames", "fps", k=_FS_K
    )
    return sched.select(
        F.col("id").alias("clip_id"), "sample_pos", "frame_idx", "t_ms"
    )


# --- events_markov_stationary -----------------------------------------------
# Stationary distribution of the event-type Markov chain: fixed-count
# integer power iteration pi' = pi P over the |types|^2-bounded
# transition-proportion table (operators/funnel.markov_stationary —
# the r8 bounded-state fold pattern). Oracle = the iteration unrolled
# into a CTE chain, house style for fixed-iteration algorithms.
_MSTAT_ITERS = 12


def _mstat_oracle() -> str:
    from datafusion_server_spark.operators.funnel import (
        MARKOV_PROP_ONE,
        MARKOV_RANK_ONE,
    )

    parts = [
        """pairs AS (
  SELECT i, j FROM (
    SELECT event_type AS j,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
    FROM events) t WHERE i IS NOT NULL)""",
        "counts AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n_ij FROM pairs GROUP BY i, j)",
        f"""cells AS MATERIALIZED (
  SELECT i, j,
         CAST(n_ij * {MARKOV_PROP_ONE} // CAST(SUM(n_ij) OVER (PARTITION BY i) AS BIGINT) AS BIGINT) AS p
  FROM counts)""",
        "states AS MATERIALIZED (SELECT DISTINCT i AS s FROM cells)",
        "kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states)",
        f"pi0 AS (SELECT s, CAST({MARKOV_RANK_ONE} // k AS BIGINT) AS r FROM states, kk)",
    ]
    for t in range(1, _MSTAT_ITERS + 1):
        parts.append(
            f"""pi{t} AS (
  SELECT st.s, CAST(COALESCE(m.v, 0) AS BIGINT) AS r
  FROM states st LEFT JOIN (
    SELECT c.j AS s, CAST(SUM((p.r * c.p) // {MARKOV_PROP_ONE}) AS BIGINT) AS v
    FROM cells c JOIN pi{t - 1} p ON p.s = c.i GROUP BY c.j) m ON m.s = st.s)"""
        )
    from datafusion_server_spark.queries import rrepr

    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT s AS state, r AS pi_nano,
       {rrepr(f"CAST(r AS DOUBLE) / {MARKOV_RANK_ONE}", 6)} AS pi
FROM pi{_MSTAT_ITERS}
"""
    )


@df_query("events_markov_stationary", _mstat_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event-type chain by
    12 integer power-iteration steps (mass 1e-9 units, proportions 1e-6
    units, dangling mass dropped). One corpus pass builds the bounded
    cell table; the whole iteration folds over a single collected row."""
    from datafusion_server_spark.operators import funnel as funnel_ops

    ev = tables.load(spark, sf_dir, "events")
    pi = funnel_ops.markov_stationary(
        ev, "user_id", "event_type", "ts", "event_id", iterations=_MSTAT_ITERS
    )
    return pi.select(
        "state",
        "pi_nano",
        F.round(
            F.col("pi_nano").cast("double") / funnel_ops.MARKOV_RANK_ONE, 6
        ).alias("pi"),
    )


# --- profile_autocorrelation ------------------------------------------------
# Lag-1..5 ACF of the per-type daily revenue series: exact DECIMAL(38)
# sums of DECIMAL(19) centered products (operators/timeseries.
# autocorrelation); the only float op is the final ratio.
_ACF_MAX_LAG = 5
_ACF_SCALE = 100

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS key, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * {_ACF_SCALE}) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2),
cent AS (
  SELECT key, day,
         CAST(CAST(COUNT(*) OVER w AS BIGINT) * x - CAST(SUM(x) OVER w AS BIGINT)
              AS DECIMAL(19,0)) AS c,
         CAST(COUNT(*) OVER w AS BIGINT) AS n
  FROM daily WINDOW w AS (PARTITION BY key)),
leads AS (
  SELECT key, n, c,
         {", ".join(f"LEAD(c, {k}) OVER (PARTITION BY key ORDER BY day) AS c{k}" for k in range(1, _ACF_MAX_LAG + 1))}
  FROM cent),
agg AS (
  SELECT key, MAX(n) AS n_days,
         SUM(CAST(c * c AS DECIMAL(38,0))) AS den,
         {", ".join(f"SUM(CAST(c * c{k} AS DECIMAL(38,0))) AS num{k}" for k in range(1, _ACF_MAX_LAG + 1))}
  FROM leads GROUP BY key),
stacked AS (
  {" UNION ALL ".join(f"SELECT key, CAST({k} AS BIGINT) AS lag, n_days, den, num{k} AS num FROM agg" for k in range(1, _ACF_MAX_LAG + 1))})
SELECT key AS event_type, lag, n_days,
       {rrepr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)", 6)} AS acf
FROM stacked WHERE n_days > lag AND den <> 0
"""


@df_query("profile_autocorrelation", _ACF_ORACLE)
def profile_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..5 autocorrelation of each event type's daily totals — the
    persistence/seasonality profile companion to the CUSUM changepoint.
    One (type, day) aggregation collapses the corpus; lead windows and
    the final aggregation share the type partitioning."""
    from datafusion_server_spark.operators import timeseries as ts_ops

    ev = tables.load(spark, sf_dir, "events")
    acf = ts_ops.autocorrelation(
        ev, "event_type", "ts", "value", max_lag=_ACF_MAX_LAG, value_scale=_ACF_SCALE
    )
    return acf.select(
        F.col("key").alias("event_type"),
        "lag",
        "n_days",
        F.round(F.col("acf"), 6).alias("acf"),
    )
