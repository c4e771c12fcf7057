"""Time-series join and rollup operators.

Beyond-reference operators (the reference's DataFusion 45 core has no
ASOF/range join; these are the event/feature-alignment primitives a
training-data pipeline needs):

- **as-of join**: attach to each left row the most recent right row
  at-or-before its timestamp, per key — feature lookups, last-touch
  attribution, point-in-time-correct joins.
- **range (interval) join**: pairs of rows within a bounded time gap —
  co-occurrence mining, burst detection.
- **hypertable rollup**: multi-resolution time aggregation where each
  coarser resolution is computed FROM the next finer one (the
  TimescaleDB continuous-aggregate shape), not from the raw table.
- **gap-fill + LOCF**: complete bucket spines per series with
  last-observation-carried-forward (the time_bucket_gapfill + locf
  shape) — regularizing event streams into model-ready series.

Scale notes (100 TB):
- The as-of join is ONE shuffle of |L|+|R| rows (union + single window),
  never the |L|x|R| candidate blow-up of the naive range-join-then-argmax
  formulation. Skew concentrates per key exactly like any window — salt
  the key upstream if one key dominates.
- The range join equi-joins on (key, time_bucket) with the left side
  exploded into the two candidate buckets, so the shuffle key is
  fine-grained and the per-bucket fan-out is bounded by event density x
  window width — no unbounded theta-join.
- The rollup's coarser levels aggregate the finer level's output
  (dataflow: raw -> minute -> hour -> day). Catalyst plans the minute
  aggregation's exchange once and ReusedExchange feeds both its output
  branch and the hour aggregation, so raw data is scanned and shuffled
  exactly once no matter how many resolutions stack on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    *,
    right_order: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward (most-recent-at-or-before, inclusive) as-of join.

    Output: every ``left`` row with ``{prefix}{c}`` columns carrying the
    payload of the latest ``right`` row with ``right_time <= left_time``
    for the same ``key`` (NULL when no such row exists).

    Plan: tag both sides, union, ONE window partitioned by key ordered by
    (time, side, order) with ``last(payload, ignorenulls=True)`` carrying
    the right payload forward, then keep left rows. Right rows sort
    before left rows at equal timestamps (side 0 < 1), making the match
    inclusive; ``right_order`` breaks ties between right rows sharing a
    timestamp (the largest wins — deterministic). When ``right_order`` is
    omitted, ties between right rows sharing (key, timestamp) are broken
    by ``xxhash64`` of the payload columns — an arbitrary but
    partition-independent choice, so results are stable across
    repartitionings (the repo's determinism contract). Pass
    ``right_order`` when you need a *semantically* meaningful winner.
    """
    lcols = list(left.columns)
    l_side = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("bigint").alias("_ord"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )
    r_side = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        (
            F.col(right_order).cast("bigint")
            if right_order
            else F.xxhash64(*[F.col(c) for c in payload_cols])
        ).alias("_ord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    u = l_side.unionByName(r_side)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.col(f"{prefix}{c}"), ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in payload_cols
    ]
    return u.select("_side", *lcols, *carried).filter(F.col("_side") == 1).drop("_side")


def range_join_pairs(
    df: DataFrame,
    key: str,
    time_col: str,
    id_col: str,
    *,
    max_gap_s: int = 300,
) -> DataFrame:
    """Interval self-join: ordered pairs (a, b) of rows sharing ``key``
    with ``0 < t_b - t_a <= max_gap_s``. Output: (key, id_a, id_b,
    gap_us) — the gap in exact integer microseconds.

    Plan: each row is bucketed at ``floor(epoch_us / gap_us)``; any
    qualifying pair's buckets differ by at most 1, so the A side explodes
    into its two candidate buckets {b, b+1} and the join is an EQUI-join
    on (key, bucket) with the gap predicate as a residual filter — a
    fine-grained shuffle key instead of an unbounded theta join. Fan-out
    per bucket is bounded by event density x window width.
    """
    gap_us = max_gap_s * 1_000_000
    us = F.unix_micros(F.col(time_col))
    base = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        F.floor(us / gap_us).alias("_b"),
    )
    a = base.select(
        F.col("_k"),
        F.col("_id").alias("id_a"),
        F.col("_us").alias("us_a"),
        F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_jb"),
    )
    b = base.select(
        F.col("_k"),
        F.col("_id").alias("id_b"),
        F.col("_us").alias("us_b"),
        F.col("_b").alias("_jb"),
    )
    return (
        a.join(b, ["_k", "_jb"])
        .filter((F.col("us_b") > F.col("us_a")) & (F.col("us_b") - F.col("us_a") <= gap_us))
        .select(
            F.col("_k").alias(key),
            "id_a",
            "id_b",
            (F.col("us_b") - F.col("us_a")).cast("bigint").alias("gap_us"),
        )
    )


def hypertable_rollup(
    df: DataFrame,
    time_col: str,
    value_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Multi-resolution rollup (minute -> hour -> day), each coarser
    resolution aggregated FROM the finer one's output — the
    continuous-aggregate dataflow: at scale the day level reads ~60x
    fewer rows than re-scanning raw, and Catalyst's ReusedExchange makes
    the raw scan + minute shuffle happen exactly once for all three
    output branches.

    Output: (resolution, bucket_s, n, total) with ``bucket_s`` the bucket
    start in epoch seconds and ``total`` the exact scaled-long value sum
    finished as DOUBLE. Value sums use scaled-long accumulation
    (ROUND(v * scale) as BIGINT): exact, order-independent, and the
    coarser levels can sum the finer levels' sums without precision loss.
    """
    minute = (
        df.select(
            F.floor(F.unix_micros(F.col(time_col)) / 60_000_000).alias("m"),
            F.round(F.col(value_col).cast("double") * scale).cast("bigint").alias("sv"),
        )
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("sv").alias("s"))
    )
    hour = (
        minute.select((F.floor(F.col("m") / 60)).alias("h"), "n", "s")
        .groupBy("h")
        .agg(F.sum("n").cast("bigint").alias("n"), F.sum("s").alias("s"))
    )
    day = (
        hour.select((F.floor(F.col("h") / 24)).alias("d"), "n", "s")
        .groupBy("d")
        .agg(F.sum("n").cast("bigint").alias("n"), F.sum("s").alias("s"))
    )

    def finish(level: DataFrame, bucket_col: str, seconds: int, name: str) -> DataFrame:
        return level.select(
            F.lit(name).alias("resolution"),
            (F.col(bucket_col) * seconds).cast("bigint").alias("bucket_s"),
            "n",
            F.round(F.col("s").cast("double") / scale, 6).alias("total"),
        )

    return (
        finish(minute, "m", 60, "minute")
        .unionByName(finish(hour, "h", 3600, "hour"))
        .unionByName(finish(day, "d", 86400, "day"))
    )


def gapfill_locf(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    *,
    bucket_seconds: int = 3600,
    value_scale: int = 100,
) -> DataFrame:
    """Gap-filled bucketed series with last-observation-carried-forward —
    the TimescaleDB ``time_bucket_gapfill`` + ``locf`` shape: bucket the
    raw points per key, generate the complete bucket spine between each
    key's first and last bucket, and fill empty buckets with the most
    recent non-empty bucket's value.

    Output: (key, bucket_s BIGINT epoch seconds, n BIGINT points in
    bucket — 0 for gap rows, filled DOUBLE LOCF'd bucket sum). Bucket
    sums use ``value_scale`` fixed-point (default cents) so addition is
    exact and order-independent — the oracle matches bit-for-bit.

    Scale notes (100 TB): one map-side-combined groupBy buckets the raw
    stream; the spine explodes ONE row per key into its bucket range
    (sequence + explode — bounded by time span / bucket, not by input
    rows); the fill is one per-key window over the spine. All three
    stages key by the series key, so a 1000-executor run distributes by
    series. Pathologically long spans with tiny buckets inflate the
    spine — size ``bucket_seconds`` to the span as you would any
    time_bucket."""
    # floor, not a truncating cast: cast(-0.5 as bigint) = 0 but the
    # oracle's FLOOR(-0.5) = -1 — pre-1970 timestamps must bucket down
    b = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("bigint")
    bucketed = df.groupBy(F.col(key_col).alias("key"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col(value_col).cast("double") * value_scale).cast("bigint")).alias("s"),
    )
    bounds = bucketed.groupBy("key").agg(
        F.min("b").alias("b_lo"), F.max("b").alias("b_hi")
    )
    spine = bounds.select(
        "key", F.explode(F.sequence(F.col("b_lo"), F.col("b_hi"))).alias("b")
    )
    joined = spine.join(bucketed, ["key", "b"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last(F.col("s"), ignorenulls=True).over(w)
    return joined.select(
        "key",
        (F.col("b") * bucket_seconds).cast("bigint").alias("bucket_s"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        F.round(filled.cast("double") / value_scale, 6).alias("filled"),
    )


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
    value_col: str,
    *,
    alpha: float = 0.3,
    lookback: int = 12,
) -> DataFrame:
    """(key, <tiebreak>, ts, value, ewma): truncated exponentially
    weighted moving average — the standard smoothing pass of a
    monitoring/feature pipeline, with the recursion unrolled to a
    bounded ``lookback`` so the semantics are a FIXED linear
    combination of the last ``lookback + 1`` samples:

        ewma_t = sum_{k=0..lookback} alpha * (1-alpha)^k * x_{t-k}
                 (missing lags contribute 0; weights NOT renormalized)

    Determinism: the coefficients are driver-computed literals
    (identical text in the oracle); each term is scaled-long quantized
    (ROUND(x * c_k * 1e8)) and the window sum is an exact integer sum,
    so results are partition- and engine-independent. A true infinite-
    memory EWMA is a running recursion Spark can't express without a
    UDAF and an engine can't reproduce bit-for-bit; the truncated form
    is standard (a (1-alpha)^13 tail is < 1% mass at alpha = 0.3).

    Scale shape: ONE window over (key, time) — the same single shuffle
    every per-key sequence operator pays; no joins, no iteration.
    """
    # r14 (guide §1.2): one selectExpr SQL string — identical expression
    # tree (driver-computed coefficient literals embedded via repr+D),
    # the 13 lag terms no longer pay ~15 py4j round-trips each.
    coeffs = [alpha * (1.0 - alpha) ** k for k in range(lookback + 1)]
    kq = key_col if key_col.isidentifier() else f"`{key_col}`"
    tq = ts_col if ts_col.isidentifier() else f"`{ts_col}`"
    oq = order_tiebreak if order_tiebreak.isidentifier() else f"`{order_tiebreak}`"
    vq = value_col if value_col.isidentifier() else f"`{value_col}`"
    over = f"OVER (PARTITION BY {kq} ORDER BY {tq} ASC, {oq} ASC)"
    total = " + ".join(
        f"COALESCE(CAST(ROUND(LAG({vq}, {k}) {over} * {c!r}D * 1.0E8)"
        " AS BIGINT), CAST(0 AS BIGINT))"
        for k, c in enumerate(coeffs)
    )
    return df.selectExpr(
        f"{kq} AS key",
        oq,
        f"{tq} AS ts",
        f"{vq} AS value",
        f"ROUND(CAST(({total}) AS DOUBLE) / 1.0E8, 6) AS ewma",
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
    value_col: str,
    *,
    window_rows: int = 12,
    min_history: int = 6,
    threshold: float = 2.0,
    value_scale: int = 10_000,
) -> DataFrame:
    """(key, <tiebreak>, ts, value, z): points whose deviation from the
    trailing per-key window (previous ``window_rows`` rows, excluding
    self) exceeds ``threshold`` sample standard deviations.

    Determinism: values are quantized to ``1/value_scale`` units first;
    the trailing sums S1/S2 are exact integer window sums, and the
    z-score is derived from those exact integers through an identical
    double expression on both engines (IEEE ops on identical inputs),
    so the >= threshold selection is exact. Needs ``value_scale^2 *
    window_rows * max(value)^2 < 2^63`` — asserted nowhere cheap, so
    pick value_scale against your value range (10_000 covers |v| <=
    1e5 at window 12).

    Scale shape: one window over (key, time) — single shuffle.
    """
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("ts").asc(), F.col(order_tiebreak).asc())
        .rowsBetween(-window_rows, -1)
    )
    vi = F.round(F.col(value_col) * value_scale).cast("bigint")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(order_tiebreak),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        vi.alias("vi"),
    )
    stats = base.select(
        "*",
        F.count(F.col("vi")).over(w).cast("bigint").alias("n"),
        F.sum(F.col("vi")).over(w).cast("bigint").alias("s1"),
        F.sum(F.col("vi") * F.col("vi")).over(w).cast("bigint").alias("s2"),
    ).filter(F.col("n") >= min_history)
    n_d = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n_d
    # sample variance of the trailing window, in quantized units
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * mean) / (n_d - 1.0)
    z = (F.col("vi").cast("double") - mean) / F.sqrt(var)
    return (
        stats.filter(F.col("s2") * F.col("n") != F.col("s1") * F.col("s1"))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= threshold)
        .select("key", order_tiebreak, "ts", "value", "z")
    )


def linear_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    min_points: int = 8,
    value_scale: int = 10_000,
) -> DataFrame:
    """(key, n, slope_per_day, intercept): per-key ordinary-least-squares
    line of value over time — the trend feature of a monitoring/
    forecasting pipeline, in closed form from exact integer moments.

    x is SECONDS SINCE THE KEY'S FIRST EVENT (keeps x^2 sums inside
    BIGINT at any epoch); y is the value quantized to 1/value_scale.
    n, Sx, Sy, Sxy, Sxx are exact integer sums, so the slope
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is derived from identical exact
    integers on any engine/partitioning. Keys with < min_points rows or
    zero x-variance are dropped. slope_per_day = slope * 86400 (value
    units per day).

    Scale shape: one window (min-ts) sharing the groupBy's partitioning
    + one aggregation — single shuffle.
    """
    # alias BEFORE the window so the min-ts window and the moment
    # aggregation hash-partition on the same attribute and Catalyst
    # reuses the exchange (verified: one shuffle total)
    wmin = Window.partitionBy("key")
    base = (
        df.select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col)).alias("us"),
            F.round(F.col(value_col) * value_scale).cast("bigint").alias("yi"),
        )
        .select("key", (F.col("us") - F.min("us").over(wmin)).alias("xus"), "yi")
        .select(
            "key",
            # integer division: Spark's double->bigint cast truncates while
            # DuckDB's ROUNDS — DIV/'//' agree on non-negative integers
            F.expr("CAST(xus DIV 1000000 AS BIGINT)").alias("xi"),
            "yi",
        )
    )
    agg = base.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xi").cast("bigint").alias("sx"),
        F.sum("yi").cast("bigint").alias("sy"),
        F.sum(F.col("xi") * F.col("yi")).cast("bigint").alias("sxy"),
        F.sum(F.col("xi") * F.col("xi")).cast("bigint").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = num.cast("double") / den.cast("double")  # quantized units per second
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / F.col(
        "n"
    ).cast("double")
    return (
        agg.filter((F.col("n") >= min_points) & (den != 0))
        .select(
            "key",
            "n",
            (slope * (86_400.0 / value_scale)).alias("slope_per_day"),
            (intercept / value_scale).alias("intercept"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    value_scale: int = 100,
) -> DataFrame:
    """(key, cp_day DATE, n_days, cusum_stat, mean_before, mean_after):
    per-key CUSUM changepoint over the DAILY-TOTAL series — the offline
    level-shift detector (Page 1954 / Taylor's cumulative-sum form):
    the changepoint estimate is the day maximizing |S_t| where
    S_t = sum_{u<=t}(x_u - xbar) over daily totals x.

    Determinism: daily totals are exact scaled-BIGINT sums; instead of
    the float S_t the argmax scans C_t = n * cumsum_t - t * total
    (== n^2 * S_t when series length is n — same argmax, ALL-INTEGER,
    so the selected day is engine- and partition-exact; ties break to
    the earliest day). ``cusum_stat`` = max|S_t| in value units
    (|C_t| / n / scale) and the before/after daily means are single
    exact-integer divisions, repr-round paired downstream.

    Scale shape: one (key, day) hash aggregation with map-side combine
    collapses the corpus to calendar-bounded series; the windows that
    follow run per key over <= a-few-thousand rows each regardless of
    corpus size — the 100 TB cost is the one aggregation shuffle.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
            F.round(F.col(value_col) * value_scale).cast("bigint").alias("vi"),
        )
        .groupBy("key", "day")
        .agg(F.sum("vi").cast("bigint").alias("x"))
    )
    wo = Window.partitionBy("key").orderBy("day")
    wall = Window.partitionBy("key")
    cur = (
        daily.select(
            "key",
            "day",
            F.row_number().over(wo).cast("bigint").alias("t"),
            F.sum("x").over(wo).cast("bigint").alias("cum"),
            F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
            F.sum("x").over(wall).cast("bigint").alias("total"),
        )
        .select(
            "key",
            "day",
            "t",
            "cum",
            "n",
            "total",
            (F.col("n") * F.col("cum") - F.col("t") * F.col("total")).alias("c"),
        )
    )
    wpick = Window.partitionBy("key").orderBy(
        F.abs(F.col("c")).desc(), F.col("day").asc()
    )
    picked = cur.select(
        "key", "day", "t", "cum", "n", "total", "c",
        F.row_number().over(wpick).alias("rn"),
    ).filter((F.col("rn") == 1) & (F.col("n") >= 2) & (F.col("t") < F.col("n")))
    scale_d = float(value_scale)
    return picked.select(
        "key",
        F.col("day").alias("cp_day"),
        F.col("n").alias("n_days"),
        (
            F.abs(F.col("c")).cast("double")
            / F.col("n").cast("double")
            / scale_d
        ).alias("cusum_stat"),
        (
            F.col("cum").cast("double") / F.col("t").cast("double") / scale_d
        ).alias("mean_before"),
        (
            (F.col("total") - F.col("cum")).cast("double")
            / (F.col("n") - F.col("t")).cast("double")
            / scale_d
        ).alias("mean_after"),
    )


def autocorrelation(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    max_lag: int = 5,
    value_scale: int = 100,
) -> DataFrame:
    """(key, lag, n_days, acf): lag-1..max_lag autocorrelation of the
    per-key DAILY-TOTAL series — the seasonality/persistence profile
    read next to the CUSUM changepoint.

    Determinism: with x_t the exact scaled-BIGINT daily totals, the
    centered series is c_t = n*x_t - S (all-integer; n^2 times the
    float centering, which cancels in the ratio). Products c_t*c_{t+k}
    can exceed BIGINT at warehouse scale, so both engines compute them
    as DECIMAL(19,0)*DECIMAL(19,0) -> DECIMAL(38,0) exact sums; the
    single float op is the final num/den division (repr-round paired
    downstream).

    Scale shape: one (key, day) map-side-combined aggregation collapses
    the corpus to calendar-bounded series; the lead windows and the
    final aggregation share the key partitioning — one shuffle total.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
            F.round(F.col(value_col) * value_scale).cast("bigint").alias("vi"),
        )
        .groupBy("key", "day")
        .agg(F.sum("vi").cast("bigint").alias("x"))
    )
    wall = Window.partitionBy("key")
    wo = wall.orderBy("day")
    cent = daily.select(
        "key",
        "day",
        (
            F.count(F.lit(1)).over(wall) * F.col("x") - F.sum("x").over(wall)
        ).cast("decimal(19,0)").alias("c"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    )
    leads = cent.select(
        "key",
        "n",
        "c",
        *[F.lead("c", k).over(wo).alias(f"c{k}") for k in range(1, max_lag + 1)],
    )
    agg = leads.groupBy("key").agg(
        F.max("n").alias("n_days"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("den"),
        *[
            F.sum((F.col("c") * F.col(f"c{k}")).cast("decimal(38,0)")).alias(
                f"num{k}"
            )
            for k in range(1, max_lag + 1)
        ],
    )
    lagged = agg.select(
        "key",
        "n_days",
        "den",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("bigint").alias("lag"),
                        F.col(f"num{k}").alias("num"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("s"),
    )
    return lagged.filter(
        (F.col("n_days") > F.col("s.lag")) & (F.col("den") != 0)
    ).select(
        "key",
        F.col("s.lag").alias("lag"),
        "n_days",
        (F.col("s.num").cast("double") / F.col("den").cast("double")).alias("acf"),
    )


def theil_sen_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    value_scale: int = 100,
) -> DataFrame:
    """(key, n_days, n_pairs, slope): Theil-Sen robust trend of each
    key's DAILY-TOTAL series — the lower median of all pairwise slopes
    (x_j - x_i) / (d_j - d_i), i < j. Median-of-slopes has a 29.3%
    breakdown point, so one corrupted ingest day cannot swing the trend
    the way it swings the least-squares line (``linear_trend``).

    Determinism: x is the exact scaled-BIGINT daily total and d the
    integer epoch day, so each slope is one IEEE division of exact
    integers — bit-identical across engines — and the "median" is an
    ELEMENT (row (n_pairs+1)//2 of the (slope, d_i, d_j) order), never
    an interpolated average, so no float summation exists anywhere.

    Scale shape: one map-side-combined (key, day) aggregation collapses
    the corpus to calendar-bounded series; the pairwise self-join and
    the rank window are both keyed by ``key`` (one shuffle, reused),
    and per-key work is O(days^2) with days bounded by the calendar
    window — entity-bounded state, the sanctioned window class.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
            F.round(F.col(value_col) * value_scale).cast("bigint").alias("vi"),
        )
        .groupBy("key", "day")
        .agg(F.sum("vi").cast("bigint").alias("x"))
        .select("key", F.unix_date("day").cast("bigint").alias("d"), "x")
    )
    a = daily.select("key", F.col("d").alias("d1"), F.col("x").alias("x1"))
    b = daily.select("key", F.col("d").alias("d2"), F.col("x").alias("x2"))
    pairs = (
        a.join(b, ["key"])
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "key",
            "d1",
            "d2",
            (
                (F.col("x2") - F.col("x1")).cast("double")
                / (F.col("d2") - F.col("d1")).cast("double")
            ).alias("slope"),
        )
    )
    wk = Window.partitionBy("key")
    wo = wk.orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "key",
        "slope",
        F.row_number().over(wo).cast("bigint").alias("__ts_rn"),
        F.count(F.lit(1)).over(wk).cast("bigint").alias("n_pairs"),
    )
    n_days = daily.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        ranked.filter(F.col("__ts_rn") == F.expr("(n_pairs + 1) div 2"))
        .drop("__ts_rn")
        .join(n_days, ["key"])
        .select("key", "n_days", "n_pairs", "slope")
    )


def holt_linear_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    value_scale: int = 100,
) -> DataFrame:
    """(key, n_days, level, trend, forecast): Holt's linear (double
    exponential) smoothing of each key's DAILY-TOTAL series with
    alpha = beta = 1/2 — l_t = a*x_t + (1-a)(l_{t-1} + b_{t-1}),
    b_t = g(l_t - l_{t-1}) + (1-g) b_{t-1}, init l_0 = x_0,
    b_0 = x_1 - x_0; ``forecast`` is the one-step-ahead l + b.

    Determinism: the recurrence is inherently sequential, so it runs
    as a BOUNDED-STATE FOLD (the Kaplan-Meier pattern): one (key, day)
    aggregation collapses the corpus to calendar-bounded series, then a
    single in-row ``aggregate`` HOF folds the day-sorted array in a
    fixed order. The pinned half coefficients are exact binary
    fractions, so every step is one IEEE multiply/add chain evaluated
    in the same order by both engines — bit-identical without any
    scaled-integer detour. The oracle is a recursive CTE walking the
    same recurrence (house pattern for sequential per-entity state).

    Scale shape: one map-side-combined aggregation + one key-grouped
    collect of a calendar-bounded array; no windows, no driver loop.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.to_date(F.col(ts_col)).alias("day"),
            F.round(F.col(value_col) * value_scale).cast("bigint").alias("vi"),
        )
        .groupBy("key", "day")
        .agg(F.sum("vi").cast("bigint").alias("x"))
    )
    collected = daily.groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("srt"),
    )
    hw = F.expr(
        """
        aggregate(
          slice(srt, 2, greatest(size(srt) - 1, 0)),
          named_struct(
            'l', cast(srt[0].x as double),
            'b', if(size(srt) > 1,
                    cast(srt[1].x - srt[0].x as double), 0.0d)),
          (acc, e) -> named_struct(
            'l', 0.5d * cast(e.x as double) + 0.5d * (acc.l + acc.b),
            'b', 0.5d * ((0.5d * cast(e.x as double)
                          + 0.5d * (acc.l + acc.b)) - acc.l)
                 + 0.5d * acc.b))
        """
    )
    return collected.withColumn("__hw", hw).select(
        "key",
        "n_days",
        F.col("__hw.l").alias("level"),
        F.col("__hw.b").alias("trend"),
        (F.col("__hw.l") + F.col("__hw.b")).alias("forecast"),
    )


