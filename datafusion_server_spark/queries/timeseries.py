"""Time-series operator queries: as-of join, range join, hypertable
rollup, gap-fill/LOCF, the KMV / Count-Min / histogram sketches, exact
heavy hitters, and the sliding-window stream — each with a DuckDB
oracle (the as-of oracle uses DuckDB's native ASOF JOIN, so the Spark
union-window formulation is checked against an independent engine's
native implementation of the semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import sketch, timeseries
from datafusion_server_spark.queries import df_query, sql_query

# --- as-of join: for each 'error' event, the most recent prior-or-equal
# 'click' by the same user. Oracle: DuckDB native ASOF LEFT JOIN.
# (user_id, ts) pairs are unique in the fixture, so the match is unique.

_ASOF_ORACLE = """
WITH err AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
clk AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click')
SELECT err.event_id, CAST(err.user_id AS BIGINT) AS user_id,
       epoch_us(err.ts) AS ts_us,
       clk.event_id AS asof_event_id,
       epoch_us(clk.ts) AS asof_ts_us,
       ROUND(CAST(clk.value AS DOUBLE), 6) AS asof_value
FROM err ASOF LEFT JOIN clk
  ON err.user_id = clk.user_id AND err.ts >= clk.ts
"""


@df_query("asof_join_last_click", _ASOF_ORACLE)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    joined = timeseries.asof_join(
        err, clk, "user_id", "ts", "ts", ["event_id", "ts", "value"],
        right_order="event_id",
    )
    return joined.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("asof_event_id"),
        F.unix_micros("asof_ts").alias("asof_ts_us"),
        F.round(F.col("asof_value").cast("double"), 6).alias("asof_value"),
    )


# --- range join: ordered same-user event pairs within 300 s.

_RANGE_ORACLE = """
SELECT CAST(a.user_id AS BIGINT) AS user_id,
       a.event_id AS id_a, b.event_id AS id_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
"""


@df_query("range_join_event_pairs", _RANGE_ORACLE)
def range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    pairs = timeseries.range_join_pairs(ev, "user_id", "ts", "event_id", max_gap_s=300)
    return pairs.select(
        F.col("user_id").cast("bigint").alias("user_id"), "id_a", "id_b", "gap_us"
    )


# --- hypertable rollup: minute -> hour -> day, coarser levels aggregated
# from finer ones. Oracle: three direct group-bys (semantically equal).

_ROLLUP_ORACLE = """
WITH m AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 60000000) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1)
SELECT 'minute' AS resolution, m * 60 AS bucket_s, n,
       ROUND(CAST(s AS DOUBLE) / 1000000, 6) AS total FROM m
UNION ALL
SELECT 'hour', (m // 60) * 3600, CAST(SUM(n) AS BIGINT),
       ROUND(CAST(SUM(s) AS DOUBLE) / 1000000, 6) FROM m GROUP BY 2
UNION ALL
SELECT 'day', (m // 1440) * 86400, CAST(SUM(n) AS BIGINT),
       ROUND(CAST(SUM(s) AS DOUBLE) / 1000000, 6) FROM m GROUP BY 2
"""


@df_query("hypertable_rollup", _ROLLUP_ORACLE)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return timeseries.hypertable_rollup(ev, "ts", "value")


# --- KMV sketch: deterministic approximate distinct users per event
# type, plus the exact count for reference. Oracle reproduces the md5
# k-minimum-values estimate bit-for-bit.

_KMV_K = 64

_KMV_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed),
agg AS (
  SELECT event_type, MAX(h) AS h_k, CAST(COUNT(*) AS BIGINT) AS n_hashes
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type)
SELECT event_type,
       ROUND(CASE WHEN n_hashes < {_KMV_K} THEN CAST(n_hashes AS DOUBLE)
                  ELSE {_KMV_K - 1}.0
                       / (CAST(('0x' || substr(h_k, 1, 15)) AS BIGINT)
                          / CAST(16.0 ** 15 AS DOUBLE))
             END, 6) AS kmv_estimate,
       n_hashes
FROM agg
"""


@df_query("sketch_kmv_distinct", _KMV_ORACLE)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return sketch.kmv_distinct(ev, "user_id", ["event_type"], k=_KMV_K)


# --- fixed-bin histogram sketch + quantile estimates over events.value:
# mergeable summary (fixed boundaries), linear interpolation inside the
# crossing bin; identical double arithmetic in the oracle.

_H_LO, _H_HI, _H_BINS = 0.0, 500.0, 64
_H_QS = (0.5, 0.9, 0.99)

_HISTQ_ORACLE = f"""
WITH sk AS (
  SELECT CAST(LEAST({_H_BINS - 1}, GREATEST(0,
           CAST(FLOOR((CAST(value AS DOUBLE) - {_H_LO}) * {_H_BINS} / ({_H_HI} - {_H_LO})) AS BIGINT)
         )) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
cum AS (
  SELECT bin, n,
         SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) - n AS prev_cum
  FROM sk),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM sk),
qs AS (SELECT CAST(UNNEST([{", ".join(str(q) for q in _H_QS)}]) AS DOUBLE) AS q)
SELECT q,
       ROUND({_H_LO} + (CAST(bin AS DOUBLE)
                        + (q * total - CAST(prev_cum AS DOUBLE)) / CAST(n AS DOUBLE))
                       * {(_H_HI - _H_LO) / _H_BINS}, 6) AS estimate
FROM cum, tot, qs
WHERE CAST(prev_cum AS DOUBLE) < q * total AND CAST(cum AS DOUBLE) >= q * total
"""


@df_query("sketch_histogram_quantiles", _HISTQ_ORACLE)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    sk = sketch.histogram_sketch(ev, "value", _H_LO, _H_HI, _H_BINS)
    return sketch.histogram_quantiles(sk, _H_LO, _H_HI, _H_BINS, list(_H_QS))


# --- sliding-window streaming aggregation vs the 2-windows-per-event
# batch expansion.

_SLIDING_ORACLE = """
WITH expanded AS (
  SELECT unnest([
           to_timestamp(FLOOR(epoch(ts) / 300) * 300 - 300),
           to_timestamp(FLOOR(epoch(ts) / 300) * 300)
         ]) AS bucket,
         event_type, value
  FROM events)
SELECT CAST(bucket AS TIMESTAMP) AS bucket, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
FROM expanded GROUP BY 1, 2
"""


@df_query("streaming_sliding_counts", _SLIDING_ORACLE)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming sliding windows (width 10 min, slide 5 min):
    every event contributes to exactly two windows; streaming result must
    equal the batch window expansion value-for-value."""
    from datafusion_server_spark.streaming.windows import sliding_event_counts

    return sliding_event_counts(spark, f"{sf_dir}/events.parquet")


# --- TPC-H q14: promotion revenue share (part ⋈ lineitem, one month).

sql_query(
    "q14_promo_revenue",
    """
    SELECT ROUND(CAST(
             100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                               THEN CAST(l_extendedprice AS DECIMAL(18,6))
                                    * (1 - CAST(l_discount AS DECIMAL(18,6)))
                               ELSE 0 END)
             / SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                   * (1 - CAST(l_discount AS DECIMAL(18,6))))
           AS DOUBLE), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1995-09-01'
      AND l_shipdate < DATE '1995-10-01'
    """,
)

# --- TPC-H q18: large-volume customers (orders whose lineitem quantity
# total exceeds the threshold).

sql_query(
    "q18_large_volume_customers",
    """
    SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_orderdate,
           ROUND(CAST(o_totalprice AS DOUBLE), 6) AS o_totalprice,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)

# --- TPC-H q4 (reduced): order-priority counts gated by an EXISTS
# semi-join (the fixture lacks l_commitdate/l_receiptdate; the late-ship
# predicate l_shipdate > o_orderdate + 60 days stands in — same plan
# shape: date-filtered orders scan, correlated EXISTS -> left-semi hash
# join on l_orderkey).

sql_query(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)


# --- Count-Min sketch frequency estimation over events.user_id:
# deterministic md5 bucketing, depth 4 x width 64 (narrow enough that
# collisions actually occur at fixture scale — the estimate is a real
# upper bound, not a disguised exact count), probed for users 0..9.

_CM_DEPTH, _CM_WIDTH, _CM_NPROBE = 4, 64, 10
_CM_JS = ", ".join(str(j) for j in range(_CM_DEPTH))

_CM_ORACLE = f"""
WITH cells AS (
  SELECT t.j,
         CAST(('0x' || substr(md5(t.j || ':' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_CM_WIDTH} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events, UNNEST([{_CM_JS}]) AS t(j)
  GROUP BY 1, 2),
probes AS (
  SELECT k.key, t.j,
         CAST(('0x' || substr(md5(t.j || ':' || CAST(k.key AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_CM_WIDTH} AS bucket
  FROM (SELECT UNNEST(range(0, {_CM_NPROBE})) AS key) k, UNNEST([{_CM_JS}]) AS t(j))
SELECT CAST(p.key AS BIGINT) AS key,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS cm_estimate
FROM probes p LEFT JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
GROUP BY 1
"""


@df_query("sketch_countmin_freq", _CM_ORACLE)
def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    sk = sketch.countmin_sketch(ev, "user_id", _CM_DEPTH, _CM_WIDTH)
    keys = spark.range(_CM_NPROBE).select(F.col("id").cast("bigint").alias("user_id"))
    return sketch.countmin_estimate(sk, keys, "user_id", _CM_DEPTH, _CM_WIDTH)


# --- exact heavy hitters: top-5 users per event type (count desc, key
# asc tie-break) — the ground truth the Count-Min estimate bounds.

_HH_K = 5

_HH_ORACLE = f"""
SELECT event_type, CAST(key AS BIGINT) AS key, cnt, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT event_type, user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY COUNT(*) DESC, user_id ASC) AS rank
  FROM events GROUP BY event_type, user_id)
WHERE rank <= {_HH_K}
"""


@df_query("sketch_heavy_hitters", _HH_ORACLE)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return sketch.heavy_hitters(ev, "user_id", ["event_type"], _HH_K)


# --- gap-filled hourly series with LOCF per event type (the
# time_bucket_gapfill + locf shape); bucket sums in exact cents.

_GF_BUCKET = 3600

_GF_ORACLE = f"""
WITH bucketed AS (
  SELECT event_type AS key,
         CAST(FLOOR(EPOCH(ts) / {_GF_BUCKET}) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2),
bounds AS (SELECT key, MIN(b) AS lo, MAX(b) AS hi FROM bucketed GROUP BY 1),
spine AS (SELECT key, UNNEST(range(lo, hi + 1)) AS b FROM bounds),
filled AS (
  SELECT sp.key, sp.b, COALESCE(bk.n, 0) AS n,
         LAST_VALUE(bk.s IGNORE NULLS) OVER (
           PARTITION BY sp.key ORDER BY sp.b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
  FROM spine sp LEFT JOIN bucketed bk ON bk.key = sp.key AND bk.b = sp.b)
SELECT key, CAST(b * {_GF_BUCKET} AS BIGINT) AS bucket_s, CAST(n AS BIGINT) AS n,
       ROUND(CAST(fs AS DOUBLE) / 100, 6) AS filled
FROM filled
"""


@df_query("timeseries_gapfill_locf", _GF_ORACLE)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return timeseries.gapfill_locf(
        ev, "ts", "event_type", "value", bucket_seconds=_GF_BUCKET
    )


# --- exact discrete quantiles per event type: the ground truth the
# histogram-sketch estimates approximate. Selection semantics
# (value at rank ceil(q*n)) — no interpolation float math to diverge.

_QD_QS = (0.5, 0.9, 0.99)

# q as exact driver-side fractions: rank = ceil(num*n/den) in integer
# arithmetic (float CEIL(q*n) is off by one when q*n lands epsilon
# above an integer), clamped to >= 1 — mirrors operators.sketch
_QD_ROWS = ", ".join(
    "({}, {}, {})".format(float(q), *__import__("fractions").Fraction(str(q)).as_integer_ratio())
    for q in _QD_QS
)

_QD_ORACLE = f"""
WITH ranked AS (
  SELECT event_type, CAST(value AS DOUBLE) AS value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(value AS DOUBLE) ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events),
qs(q, num, den) AS (VALUES {_QD_ROWS})
SELECT event_type, CAST(q AS DOUBLE) AS q, value
FROM ranked JOIN qs ON rn = GREATEST((num * n + den - 1) // den, 1)
"""


@df_query("quantiles_exact_disc", _QD_ORACLE)
def quantiles_exact_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return sketch.quantiles_disc(ev, "value", ["event_type"], list(_QD_QS))


# --- deterministic HLL: md5-register HyperLogLog per event type —
# the oracle-checkable counterpart of the engine-internal HLL++ row.
# Register derivation is all-integer (bucket = top 8 of 60 hash bits,
# rho via length(bin(tail))); the harmonic sum is a scaled-long sum;
# only the final division / linear-counting ln are floats, rounded.

from datafusion_server_spark.operators.sketch import (  # noqa: E402
    _HLL_M,
    _HLL_TAIL_BITS,
    HLL_NUMERATOR,
)

_HLL_ORACLE = f"""
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
  FROM events),
reg AS (
  SELECT event_type, h60 >> {_HLL_TAIL_BITS} AS bucket,
         CAST(MAX(CASE WHEN (h60 & {(1 << _HLL_TAIL_BITS) - 1}) = 0
                       THEN {_HLL_TAIL_BITS + 1}
                       ELSE {_HLL_TAIL_BITS} - LENGTH(BIN(h60 & {(1 << _HLL_TAIL_BITS) - 1})) + 1
                  END) AS BIGINT) AS m_j
  FROM h GROUP BY event_type, bucket),
agg AS (
  SELECT event_type,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - m_j)) AS BIGINT) AS s_present,
         CAST(COUNT(*) AS BIGINT) AS present
  FROM reg GROUP BY event_type)
SELECT event_type,
       CASE WHEN ({HLL_NUMERATOR!r} / CAST(s_present + ({_HLL_M} - present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE)) <= {2.5 * _HLL_M}
                 AND ({_HLL_M} - present) > 0
            THEN ROUND({float(_HLL_M)!r} * LN({float(_HLL_M)!r} / CAST({_HLL_M} - present AS DOUBLE)), 4)
            ELSE ROUND({HLL_NUMERATOR!r} / CAST(s_present + ({_HLL_M} - present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE), 4)
       END AS hll_estimate,
       present AS n_registers
FROM agg
"""


@df_query("sketch_hll_deterministic", _HLL_ORACLE)
def sketch_hll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    return sketch.hll_distinct(ev, "user_id", ["event_type"])


# deterministic Bloom filter: membership summary of "users with a
# value>900 event" per event type, probed for user_ids 0..19 — the
# explicit form of the runtime bloom-join pruning idea. Integer-only
# math (md5 -> k positions -> 64-bit words), exact SQL oracle.
_BLOOM_M, _BLOOM_K = 1024, 4
_BLOOM_THRESH = 900
_BLOOM_PROBE_N = 20


def _bloom_pos_sql(expr: str, i: int) -> str:
    return (
        f"(CAST(('0x' || substr(md5('{i}:' || CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT) % {_BLOOM_M})"
    )


_BLOOM_ORACLE = f"""
WITH keys AS (
  SELECT event_type, user_id FROM events WHERE value > {_BLOOM_THRESH}),
pos AS (
  SELECT event_type, UNNEST([{", ".join(_bloom_pos_sql("user_id", i) for i in range(_BLOOM_K))}]) AS p
  FROM keys),
words AS (
  SELECT event_type, p // 64 AS word,
         BIT_OR(CAST(1 AS BIGINT) << CAST(p % 64 AS INT)) AS bits
  FROM pos GROUP BY event_type, word),
probes AS (
  SELECT et.event_type, r.user_id
  FROM (SELECT DISTINCT event_type FROM events) et,
       (SELECT UNNEST(RANGE({_BLOOM_PROBE_N})) AS user_id) r),
ppos AS (
  SELECT event_type, user_id,
         UNNEST([{", ".join(_bloom_pos_sql("user_id", i) for i in range(_BLOOM_K))}]) AS p
  FROM probes),
hits AS (
  SELECT pp.event_type, pp.user_id,
         MIN(CASE WHEN (COALESCE(w.bits, 0) & (CAST(1 AS BIGINT) << CAST(pp.p % 64 AS INT)))
                       = (CAST(1 AS BIGINT) << CAST(pp.p % 64 AS INT))
                  THEN 1 ELSE 0 END) AS allhit
  FROM ppos pp
  LEFT JOIN words w ON w.event_type = pp.event_type AND w.word = pp.p // 64
  GROUP BY pp.event_type, pp.user_id)
SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
       CAST(allhit AS BOOLEAN) AS might_contain
FROM hits
"""


@df_query("sketch_bloom_membership", _BLOOM_ORACLE)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    flagged = ev.filter(F.col("value") > _BLOOM_THRESH)
    bloom = sketch.bloom_build(
        flagged, "user_id", ["event_type"], m=_BLOOM_M, k=_BLOOM_K
    )
    probes = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(_BLOOM_PROBE_N).select(F.col("id").alias("user_id"))
        )
    )
    out = sketch.bloom_might_contain(
        bloom, probes, "user_id", ["event_type"], m=_BLOOM_M, k=_BLOOM_K
    )
    return out.select("event_type", F.col("user_id").cast("bigint"), "might_contain")


# KMV set algebra: union / Jaccard / intersection estimates between the
# user sets of two event types, from k-min sketches alone.
_KSET_K = 256

_KSET_ORACLE = f"""
WITH ha AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events WHERE event_type = 'click'),
hb AS (SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h FROM events WHERE event_type = 'view'),
un AS (SELECT h FROM ha UNION SELECT h FROM hb),
kmin AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM un) t
         WHERE rn <= {_KSET_K}),
agg AS (
  SELECT MAX(k.h) AS h_k, CAST(COUNT(*) AS BIGINT) AS n_hashes,
         CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM kmin k LEFT JOIN ha a ON a.h = k.h LEFT JOIN hb b ON b.h = k.h)
SELECT ROUND(CASE WHEN n_hashes < {_KSET_K} THEN CAST(n_hashes AS DOUBLE)
                  ELSE {float(_KSET_K - 1)}
                       / (CAST(('0x' || substr(h_k, 1, 15)) AS BIGINT)
                          / CAST(16.0 ** 15 AS DOUBLE)) END, 6) AS union_est,
       ROUND(CAST(n_both AS DOUBLE) / CAST(n_hashes AS DOUBLE), 6) AS jaccard_est,
       ROUND(ROUND(CAST(n_both AS DOUBLE) / CAST(n_hashes AS DOUBLE), 6)
             * ROUND(CASE WHEN n_hashes < {_KSET_K} THEN CAST(n_hashes AS DOUBLE)
                          ELSE {float(_KSET_K - 1)}
                               / (CAST(('0x' || substr(h_k, 1, 15)) AS BIGINT)
                                  / CAST(16.0 ** 15 AS DOUBLE)) END, 6), 6) AS intersect_est,
       n_hashes
FROM agg
"""


@df_query("sketch_kmv_set_estimates", _KSET_ORACLE)
def sketch_kmv_set_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "view")
    return sketch.kmv_set_estimates(a, b, "user_id", k=_KSET_K)


# funnel conversion: view -> click -> purchase in strict temporal order.
_FUNNEL_STEPS = ["view", "click", "purchase"]

_FUNNEL_ORACLE = """
WITH s1 AS (SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t0 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t1 GROUP BY e.user_id),
counts AS (
  SELECT 1 AS step, 'view' AS step_name, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3)
SELECT CAST(step AS BIGINT) AS step, step_name, n_users,
       ROUND(CAST(n_users AS DOUBLE) / CAST((SELECT n_users FROM counts WHERE step = 1) AS DOUBLE), 6) AS conversion
FROM counts
"""


@df_query("funnel_view_click_purchase", _FUNNEL_ORACLE)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators import funnel

    ev = tables.load(spark, sf_dir, "events")
    return funnel.funnel_conversion(ev, "user_id", "event_type", "ts", _FUNNEL_STEPS)


# weekly cohort retention: users grouped by first-event week, re-activity
# over the next 4 weeks.
_COHORT_ORACLE = """
WITH base AS (
  SELECT user_id AS u, CAST(FLOOR(EPOCH(ts) / 604800) AS BIGINT) AS p FROM events),
first AS (SELECT u, MIN(p) AS cohort FROM base GROUP BY u),
sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM first GROUP BY cohort),
active AS (
  SELECT DISTINCT f.cohort, b.p - f.cohort AS week_offset
       , b.u
  FROM (SELECT DISTINCT u, p FROM base) b JOIN first f ON f.u = b.u),
ret AS (
  SELECT cohort, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
  FROM active WHERE week_offset BETWEEN 0 AND 4
  GROUP BY cohort, week_offset)
SELECT CAST(r.cohort * 604800 AS BIGINT) AS cohort, CAST(r.week_offset AS BIGINT) AS week_offset,
       r.n_active, s.n_cohort,
       ROUND(CAST(r.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE), 6) AS retention
FROM ret r JOIN sizes s ON s.cohort = r.cohort
"""


@df_query("cohort_weekly_retention", _COHORT_ORACLE)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators import funnel

    ev = tables.load(spark, sf_dir, "events")
    return funnel.cohort_retention(ev, "user_id", "ts")


# first-order Markov transitions over per-user event paths (ts ties
# broken by event_id — the determinism contract for LAG).
_TRANSITION_ORACLE = """
WITH ordered AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
  FROM events),
counts AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered WHERE from_type IS NOT NULL GROUP BY from_type, to_type),
rt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS rt FROM counts GROUP BY from_type)
SELECT c.from_type, c.to_type, c.n,
       ROUND(CAST(c.n AS DOUBLE) / CAST(r.rt AS DOUBLE), 6) AS p
FROM counts c JOIN rt r ON r.from_type = c.from_type
"""


@df_query("events_transition_matrix", _TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators import funnel

    ev = tables.load(spark, sf_dir, "events")
    return funnel.transition_matrix(ev, "user_id", "event_type", "ts", "event_id")


# top path trigrams: most common 3-step event sequences per user path
# (ts ties broken by event_id; same determinism contract as the
# transition matrix).
_PATH_K = 10

_PATH_ORACLE = f"""
WITH ordered AS (
  SELECT event_type AS t3,
         LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
         LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1
  FROM events),
paths AS (
  SELECT t1 AS step1, t2 AS step2, t3 AS step3, CAST(COUNT(*) AS BIGINT) AS n
  FROM ordered WHERE t1 IS NOT NULL AND t2 IS NOT NULL
  GROUP BY 1, 2, 3)
SELECT step1, step2, step3, n, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, step1, step2, step3) AS rnk
      FROM paths) t
WHERE rnk <= {_PATH_K}
"""


@df_query("events_top_path_trigrams", _PATH_ORACLE)
def events_top_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = tables.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ordered = ev.select(
        F.col("event_type").alias("step3"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.lag("event_type", 2).over(w).alias("step1"),
    ).filter(F.col("step1").isNotNull() & F.col("step2").isNotNull())
    paths = ordered.groupBy("step1", "step2", "step3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # bounded window: ranks the |event_types|^3-bounded path table
    wr = Window.orderBy(
        F.desc("n"), F.asc("step1"), F.asc("step2"), F.asc("step3")
    )
    return (
        paths.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= _PATH_K)
    )


# per-user inter-arrival burstiness; driver row = per-event-count-band
# aggregate to keep output bounded... the per-user rows themselves are
# the operator output — report the 20 burstiest users (total order).
_BURSTY_K = 20

_BURSTY_ORACLE = f"""
WITH gaps AS (
  SELECT user_id AS u,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) - CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap
  FROM events),
mom AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) AS s,
         CAST(SUM(CAST(gap * gap AS DECIMAL(38,0))) AS DOUBLE) AS ss
  FROM gaps WHERE gap IS NOT NULL GROUP BY u),
stats AS (
  SELECT u, n_gaps, s / CAST(n_gaps AS DOUBLE) AS mean,
         SQRT(GREATEST((ss - s * (s / CAST(n_gaps AS DOUBLE))) / (CAST(n_gaps AS DOUBLE) - 1.0), 0.0)) AS std
  FROM mom WHERE n_gaps >= 2),
scored AS (
  SELECT u, n_gaps, ROUND(mean, 6) AS mean_gap_s, ROUND(std, 6) AS std_gap_s,
         CASE WHEN (std + mean) > 0 THEN ROUND((std - mean) / (std + mean), 6) END AS burstiness
  FROM stats)
SELECT CAST(u AS BIGINT) AS user_id, n_gaps, mean_gap_s, std_gap_s, burstiness,
       CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY burstiness DESC NULLS LAST, u ASC) AS rnk
      FROM scored) t
WHERE rnk <= {_BURSTY_K}
"""


@df_query("events_burstiness_top", _BURSTY_ORACLE)
def events_burstiness_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators import funnel
    from datafusion_server_spark.operators.scale import ranked_topk

    ev = tables.load(spark, sf_dir, "events")
    b = funnel.interarrival_burstiness(ev, "user_id", "ts", "event_id")
    # the per-user burstiness table scales with the corpus (one row per
    # user), so the top-k selection is TakeOrderedAndProject, not a
    # corpus-wide single-partition rank window
    return ranked_topk(
        b, [F.desc_nulls_last("burstiness"), F.asc("user_id")], _BURSTY_K, "rank"
    )


# weekly churn: of the users active in week w, how many return in w+1.
_CHURN_ORACLE = """
WITH weekly AS (
  SELECT DISTINCT CAST(FLOOR(EPOCH(ts) / 604800) AS BIGINT) AS w, user_id
  FROM events),
pairs AS (
  SELECT a.w, CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_retained
  FROM weekly a
  LEFT JOIN weekly b ON b.user_id = a.user_id AND b.w = a.w + 1
  GROUP BY a.w)
SELECT CAST(w * 604800 AS BIGINT) AS week_start, n_active, n_retained,
       CAST(n_active - n_retained AS BIGINT) AS n_churned,
       ROUND(CAST(n_active - n_retained AS DOUBLE) / CAST(n_active AS DOUBLE), 6) AS churn_rate
FROM pairs
"""


@df_query("events_weekly_churn", _CHURN_ORACLE)
def events_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn from the distinct (week, user) activity table: one
    self-join keyed by user shifted a week — the retention complement
    (cohort_weekly_retention follows first-touch cohorts; churn follows
    week-over-week activity)."""
    ev = tables.load(spark, sf_dir, "events")
    weekly = ev.select(
        F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("w"),
        "user_id",
    ).distinct()
    nxt = weekly.select((F.col("w") - 1).alias("w"), F.col("user_id").alias("__u2"))
    pairs = weekly.join(
        nxt, (weekly["w"] == nxt["w"]) & (weekly["user_id"] == nxt["__u2"]), "left"
    ).groupBy(weekly["w"].alias("wk")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum(F.col("__u2").isNotNull().cast("bigint")).cast("bigint").alias(
            "n_retained"
        ),
    )
    return pairs.select(
        (F.col("wk") * 604800).cast("bigint").alias("week_start"),
        "n_active",
        "n_retained",
        (F.col("n_active") - F.col("n_retained")).cast("bigint").alias("n_churned"),
        F.round(
            (F.col("n_active") - F.col("n_retained")).cast("double")
            / F.col("n_active").cast("double"),
            6,
        ).alias("churn_rate"),
    )


# session stats rollup: composes the sessionization CTE into per-user-
# session durations/depths and reduces to corpus-level distribution
# stats — the engagement report on top of the session assignment.
_SESSION_STATS_SPARK = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN UNIX_TIMESTAMP(ts) - UNIX_TIMESTAMP(
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events),
assigned AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged),
sessions AS (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(UNIX_TIMESTAMP(MAX(ts)) - UNIX_TIMESTAMP(MIN(ts)) AS BIGINT) AS duration_s
  FROM assigned GROUP BY user_id, sid)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(CAST(n_events AS DECIMAL(38,0))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_events,
       ROUND(CAST(SUM(CAST(duration_s AS DECIMAL(38,0))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_duration_s,
       CAST(MAX(n_events) AS BIGINT) AS max_events,
       CAST(MAX(duration_s) AS BIGINT) AS max_duration_s
FROM sessions
"""

_SESSION_STATS_ORACLE = _SESSION_STATS_SPARK.replace(
    "UNIX_TIMESTAMP(ts)", "CAST(FLOOR(EPOCH(ts)) AS BIGINT)"
).replace(
    "UNIX_TIMESTAMP(\n                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))",
    "CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)",
).replace(
    "UNIX_TIMESTAMP(MAX(ts)) - UNIX_TIMESTAMP(MIN(ts))",
    "CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) - CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT)",
)


def _session_stats_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.register_views(spark, sf_dir)
    return spark.sql(_SESSION_STATS_SPARK)


from datafusion_server_spark.queries import register, QueryDef  # noqa: E402

register(QueryDef("events_session_stats", _session_stats_build, _SESSION_STATS_ORACLE))


# --- EWMA smoothing (round 5): truncated exponential smoothing of each
# user's value series. Coefficients are driver-computed literals used
# verbatim in BOTH engines; each term is scaled-long quantized so the
# window sum is exact (see operators/timeseries.py::ewma).
_EWMA_ALPHA = 0.3
_EWMA_LOOKBACK = 12
_EWMA_COEFFS = [_EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** k for k in range(_EWMA_LOOKBACK + 1)]

_EWMA_TERMS = " + ".join(
    f"COALESCE(CAST(ROUND(LAG(value, {k}) OVER w * {c!r} * 1e8) AS BIGINT), 0)"
    for k, c in enumerate(_EWMA_COEFFS)
)

_EWMA_ORACLE = f"""
SELECT CAST(user_id AS BIGINT) AS user_id, event_id, epoch_us(ts) AS ts_us,
       {{ewma}} AS ewma
FROM (
  SELECT user_id, event_id, ts, {_EWMA_TERMS} AS total
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
"""


def _ewma_oracle() -> str:
    from datafusion_server_spark.queries import rrepr

    return _EWMA_ORACLE.format(ewma=rrepr("CAST(total AS DOUBLE) / 1e8", 6))


@df_query("timeseries_ewma_value", _ewma_oracle())
def timeseries_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    sm = timeseries.ewma(
        ev, "user_id", "ts", "event_id", "value",
        alpha=_EWMA_ALPHA, lookback=_EWMA_LOOKBACK,
    )
    return sm.select(
        F.col("key").cast("bigint").alias("user_id"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "ewma",
    )


# --- rolling z-score anomalies (round 5): points > 2 sample stddevs
# from the user's trailing window. The z selection compares doubles
# derived from exact integer window sums through identical IEEE
# arithmetic (+,-,*,/,sqrt are all correctly rounded — only
# transcendentals diverge between engines), so the flagged row set is
# engine-exact; outputs are repr-round paired.
_Z_WINDOW = 12
_Z_MIN_HIST = 6
_Z_THRESHOLD = 2.0
_Z_SCALE = 10_000

_ZSCORE_ORACLE = f"""
WITH base AS (
  SELECT user_id, event_id, ts, value,
         CAST(ROUND(value * {_Z_SCALE}) AS BIGINT) AS vi
  FROM events),
stats AS (
  SELECT user_id, event_id, ts, value, vi,
         CAST(COUNT(vi) OVER w AS BIGINT) AS n,
         CAST(SUM(vi) OVER w AS BIGINT) AS s1,
         CAST(SUM(vi * vi) OVER w AS BIGINT) AS s2
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_Z_WINDOW} PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT user_id, event_id, ts, value,
         (CAST(vi AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
         / SQRT((CAST(s2 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                / (CAST(n AS DOUBLE) - 1.0)) AS zv
  FROM stats
  WHERE n >= {_Z_MIN_HIST} AND s2 * n != s1 * s1)
SELECT CAST(user_id AS BIGINT) AS user_id, event_id, epoch_us(ts) AS ts_us,
       {{value}} AS value, {{z}} AS z
FROM z WHERE ABS(zv) >= {_Z_THRESHOLD}
"""


def _zscore_oracle() -> str:
    from datafusion_server_spark.queries import rrepr

    return _ZSCORE_ORACLE.format(value=rrepr("value", 6), z=rrepr("zv", 6))


@df_query("timeseries_anomaly_zscore", _zscore_oracle())
def timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    an = timeseries.rolling_zscore_anomalies(
        ev, "user_id", "ts", "event_id", "value",
        window_rows=_Z_WINDOW, min_history=_Z_MIN_HIST,
        threshold=_Z_THRESHOLD, value_scale=_Z_SCALE,
    )
    return an.select(
        F.col("key").cast("bigint").alias("user_id"),
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value"), 6).alias("value"),
        F.round(F.col("z"), 6).alias("z"),
    )


# --- per-user OLS trend (round 5): slope/intercept from exact integer
# moments (x = seconds since the user's first event, y quantized).
_TREND_MIN_POINTS = 8
_TREND_SCALE = 10_000

_TREND_ORACLE = f"""
WITH base AS (
  SELECT user_id,
         CAST((epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
              // 1000000 AS BIGINT) AS xi,
         CAST(ROUND(value * {_TREND_SCALE}) AS BIGINT) AS yi
  FROM events),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xi) AS BIGINT) AS sx, CAST(SUM(yi) AS BIGINT) AS sy,
         CAST(SUM(xi * yi) AS BIGINT) AS sxy,
         CAST(SUM(xi * xi) AS BIGINT) AS sxx
  FROM base GROUP BY user_id),
fit AS (
  SELECT user_id, n,
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
  FROM agg
  WHERE n >= {_TREND_MIN_POINTS} AND n * sxx - sx * sx != 0),
o AS (
  SELECT f.user_id, f.n,
         f.slope * (86400.0 / {_TREND_SCALE}) AS slope_per_day,
         ((CAST(a.sy AS DOUBLE) - f.slope * CAST(a.sx AS DOUBLE))
          / CAST(f.n AS DOUBLE)) / {_TREND_SCALE} AS icept
  FROM fit f JOIN agg a ON a.user_id = f.user_id)
SELECT CAST(user_id AS BIGINT) AS user_id, n,
       {{slope}} AS slope_per_day, {{icept}} AS intercept
FROM o
"""


def _trend_oracle() -> str:
    from datafusion_server_spark.queries import rrepr

    return _TREND_ORACLE.format(
        slope=rrepr("slope_per_day", 8), icept=rrepr("icept", 6)
    )


@df_query("timeseries_linear_trend", _trend_oracle())
def timeseries_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load(spark, sf_dir, "events")
    tr = timeseries.linear_trend(
        ev, "user_id", "ts", "value",
        min_points=_TREND_MIN_POINTS, value_scale=_TREND_SCALE,
    )
    return tr.select(
        F.col("key").cast("bigint").alias("user_id"),
        "n",
        F.round(F.col("slope_per_day"), 8).alias("slope_per_day"),
        F.round(F.col("intercept"), 6).alias("intercept"),
    )


# --- seasonal day-of-week profile (round 5): per (event_type, dow)
# volume/mean plus the deviation from the type's overall mean — the
# classic seasonality decomposition input. All means come from one
# scaled-long sum; Spark's dayofweek is 1-based (Sunday=1), DuckDB's
# 0-based, hence the +1 on the oracle side.
_SEASONAL_SPARK_SQL = """
WITH base AS (
  SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
         CAST(ROUND(value * 1000000) AS BIGINT) AS vi
  FROM events),
bydow AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vi) AS BIGINT) AS s
  FROM base GROUP BY event_type, dow),
bytype AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts
  FROM bydow GROUP BY event_type)
SELECT d.event_type, d.dow, d.n,
       ROUND(CAST(d.s AS DOUBLE) / CAST(d.n AS DOUBLE) / 1000000, 6) AS avg_value,
       ROUND(CAST(d.n AS DOUBLE) / CAST(t.tn AS DOUBLE), 6) AS share_of_type,
       ROUND(CAST(d.s AS DOUBLE) / CAST(d.n AS DOUBLE) / 1000000
             - CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE) / 1000000, 6) AS dev_from_type
FROM bydow d JOIN bytype t ON t.event_type = d.event_type
"""


def _seasonal_oracle() -> str:
    from datafusion_server_spark.queries import rrepr

    avg = "CAST(d.s AS DOUBLE) / CAST(d.n AS DOUBLE) / 1000000"
    tavg = "CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE) / 1000000"
    return f"""
WITH base AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow,
         CAST(ROUND(value * 1000000) AS BIGINT) AS vi
  FROM events),
bydow AS (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vi) AS BIGINT) AS s
  FROM base GROUP BY event_type, dow),
bytype AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(s) AS BIGINT) AS ts
  FROM bydow GROUP BY event_type)
SELECT d.event_type, d.dow, d.n,
       {rrepr(avg, 6)} AS avg_value,
       {rrepr("CAST(d.n AS DOUBLE) / CAST(t.tn AS DOUBLE)", 6)} AS share_of_type,
       {rrepr(f"{avg} - {tavg}", 6)} AS dev_from_type
FROM bydow d JOIN bytype t ON t.event_type = d.event_type
"""


def timeseries_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables.register_views(spark, sf_dir)
    return spark.sql(_SEASONAL_SPARK_SQL)


from datafusion_server_spark.queries import register as _register, QueryDef as _QueryDef

_register(_QueryDef("timeseries_seasonal_dow", timeseries_seasonal_dow, _seasonal_oracle()))


# --- Markov path surprisal (round 5): sequence-level anomaly score —
# each user's path scored under the corpus transition model
# (operators/funnel.py::path_surprisal); top-k most surprising users.
_SURPRISAL_K = 20

_SURPRISAL_ORACLE = f"""
WITH paired AS (
  SELECT user_id AS u, event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
  FROM events),
trans AS (SELECT * FROM paired WHERE from_type IS NOT NULL),
counts AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_ab
           FROM trans GROUP BY from_type, to_type),
rowtot AS (SELECT from_type, CAST(SUM(n_ab) AS BIGINT) AS n_a
           FROM counts GROUP BY from_type),
nll AS (SELECT c.from_type, c.to_type,
               CAST(ROUND(-LN(CAST(c.n_ab AS DOUBLE) / CAST(r.n_a AS DOUBLE)), 8)
                    AS DECIMAL(18,8)) AS nll
        FROM counts c JOIN rowtot r ON r.from_type = c.from_type),
scored AS (
  SELECT t.u, CAST(COUNT(*) AS BIGINT) AS n_transitions,
         SUM(l.nll) AS sdec
  FROM trans t JOIN nll l ON l.from_type = t.from_type AND l.to_type = t.to_type
  GROUP BY t.u),
o AS (SELECT u, n_transitions,
             CAST(sdec AS DOUBLE) / CAST(n_transitions AS DOUBLE) AS sv
      FROM scored)
SELECT CAST(rnk AS BIGINT) AS rank_pos, CAST(u AS BIGINT) AS user_id,
       n_transitions, {{s}} AS surprisal_nats
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY {{s}} DESC, u ASC) AS rnk FROM o) t
WHERE rnk <= {_SURPRISAL_K}
"""


def _surprisal_oracle() -> str:
    from datafusion_server_spark.queries import rrepr

    return _SURPRISAL_ORACLE.format(s=rrepr("sv", 6))


@df_query("events_markov_surprisal", _surprisal_oracle())
def events_markov_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators import funnel
    from datafusion_server_spark.operators.scale import ranked_topk

    ev = tables.load(spark, sf_dir, "events")
    sc = funnel.path_surprisal(ev, "user_id", "event_type", "ts", "event_id")
    rounded = sc.select(
        F.col("user").cast("bigint").alias("user_id"),
        "n_transitions",
        F.round(F.col("surprisal"), 6).alias("surprisal_nats"),
    )
    # per-user surprisal scales with the corpus: distributed top-k, rank
    # assigned on the k survivors
    return ranked_topk(
        rounded,
        [F.desc("surprisal_nats"), F.asc("user_id")],
        _SURPRISAL_K,
        "rank_pos",
    ).select("rank_pos", "user_id", "n_transitions", "surprisal_nats")


# --- RFM quintile segmentation (r7) --------------------------------------------
# Recency / Frequency / Monetary user segmentation — the classic
# audience-analytics staple. Each dimension's quintile comes from a
# DISTRIBUTED rank (scale.distributed_rank — the per-user table scales
# with the corpus, so no single-partition NTILE window), banded with
# exact integer arithmetic q = ceil(5*rank/n); the monetary sum is the
# exact DECIMAL contract. Output bounded one-row-per-user.

_RFM_ORACLE = """
WITH u AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_ts,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS mon
  FROM events GROUP BY user_id),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
rk AS (
  SELECT user_id, last_ts, freq, mon,
         ROW_NUMBER() OVER (ORDER BY last_ts DESC, user_id ASC) AS rr,
         ROW_NUMBER() OVER (ORDER BY freq DESC, user_id ASC) AS rf,
         ROW_NUMBER() OVER (ORDER BY mon DESC, user_id ASC) AS rm
  FROM u)
SELECT rk.user_id, rk.last_ts, rk.freq,
       ROUND(CAST(rk.mon AS DOUBLE), 6) AS monetary,
       CAST((5 * rk.rr + n.n - 1) // n.n AS BIGINT) AS r_quintile,
       CAST((5 * rk.rf + n.n - 1) // n.n AS BIGINT) AS f_quintile,
       CAST((5 * rk.rm + n.n - 1) // n.n AS BIGINT) AS m_quintile
FROM rk, n
"""


@df_query("events_rfm_segmentation", _RFM_ORACLE)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintiles (1 = best) per user: three distributed_rank passes
    over the per-user aggregate — each a range-partitioned two-level
    rank, never a corpus-wide NTILE window — banded by integer
    ceil(5r/n)."""
    from datafusion_server_spark.operators.scale import distributed_rank

    ev = tables.load(spark, sf_dir, "events")
    u = ev.groupBy(F.col("user_id").cast("bigint").alias("user_id")).agg(
        F.max(F.unix_micros("ts")).cast("bigint").alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("mon"),
    )
    r1 = distributed_rank(u, [F.desc("last_ts"), F.asc("user_id")], "rr")
    r2 = distributed_rank(r1, [F.desc("freq"), F.asc("user_id")], "rf")
    r3 = distributed_rank(r2, [F.desc("mon"), F.asc("user_id")], "rm")
    n = u.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    # pure BIGINT ceil-division (r8, ADVICE): `x DIV y` truncates in
    # integer arithmetic exactly like the oracle's `//` — no round-trip
    # through double, whose quotient could in principle round across an
    # integer boundary at large n
    band = lambda c: F.expr(f"(5 * {c} + __n - 1) DIV __n").cast("bigint")  # noqa: E731
    return r3.crossJoin(F.broadcast(n)).select(
        "user_id",
        "last_ts",
        "freq",
        F.round(F.col("mon").cast("double"), 6).alias("monetary"),
        band("rr").alias("r_quintile"),
        band("rf").alias("f_quintile"),
        band("rm").alias("m_quintile"),
    )
