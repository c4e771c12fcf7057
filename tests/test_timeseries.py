"""Edge-semantics tests for the time-series operators (the registry
oracle test covers the fixture-scale behavior; these pin the corner
cases the oracle data may not exercise)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from datafusion_server_spark.operators.sketch import kmv_distinct
from datafusion_server_spark.operators.timeseries import (
    asof_join,
    hypertable_rollup,
    range_join_pairs,
)


def _ts(minute: int, second: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_inclusive_no_match_and_tiebreak(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, t=_ts(10), lid=100),  # matches the equal-ts right row (inclusive)
            Row(k=1, t=_ts(5), lid=101),   # before every right row -> NULL
            Row(k=2, t=_ts(30), lid=102),  # two right rows share ts=20 -> max rid wins
            Row(k=3, t=_ts(1), lid=103),   # key with no right rows at all -> NULL
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, t=_ts(10), rid=7, v=1.0),
            Row(k=1, t=_ts(9), rid=6, v=2.0),
            Row(k=2, t=_ts(20), rid=8, v=3.0),
            Row(k=2, t=_ts(20), rid=9, v=4.0),
        ]
    )
    out = asof_join(left, right, "k", "t", "t", ["rid", "v"], right_order="rid")
    got = {r["lid"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    assert got[100] == (7, 1.0)      # inclusive at equal timestamps
    assert got[101] == (None, None)  # nothing at-or-before
    assert got[102] == (9, 4.0)      # tie on ts -> largest right_order
    assert got[103] == (None, None)


def test_asof_join_left_row_count_preserved(spark):
    left = spark.createDataFrame([Row(k=i % 3, t=_ts(i), lid=i) for i in range(30)])
    right = spark.createDataFrame([Row(k=0, t=_ts(0), rid=1, v=0.5)])
    out = asof_join(left, right, "k", "t", "t", ["rid", "v"])
    assert out.count() == 30


def test_range_join_boundary_and_buckets(spark):
    # gap exactly == max_gap is included; gap just over is excluded;
    # pairs crossing a bucket boundary are still found
    df = spark.createDataFrame(
        [
            Row(k=1, t=_ts(0, 0), i=1),
            Row(k=1, t=_ts(5, 0), i=2),    # gap 300s from i=1 -> included
            Row(k=1, t=_ts(10, 1), i=3),   # gap 301s from i=2 -> excluded
            Row(k=2, t=_ts(4, 59), i=4),   # bucket 0
            Row(k=2, t=_ts(5, 1), i=5),    # bucket 1, gap 2s -> cross-bucket pair
        ]
    )
    out = range_join_pairs(df, "k", "t", "i", max_gap_s=300)
    pairs = {(r["id_a"], r["id_b"], r["gap_us"]) for r in out.collect()}
    assert (1, 2, 300_000_000) in pairs
    assert not any(a == 2 and b == 3 for a, b, _ in pairs)
    assert (4, 5, 2_000_000) in pairs
    assert len(pairs) == 2


def test_range_join_no_duplicate_pairs(spark):
    # the 2-bucket explode must not double-count a qualifying pair
    df = spark.createDataFrame([Row(k=1, t=_ts(0, s), i=s) for s in range(0, 50, 10)])
    out = range_join_pairs(df, "k", "t", "i", max_gap_s=300)
    assert out.count() == out.distinct().count() == 10  # C(5,2) ordered pairs


def test_hypertable_rollup_levels_consistent(spark):
    df = spark.createDataFrame(
        [Row(t=_ts(m % 60, 0) + datetime.timedelta(hours=m // 60), v=1.5) for m in range(150)]
    )
    out = hypertable_rollup(df, "t", "v")
    rows = out.collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r["resolution"], []).append(r)
    assert sum(r["n"] for r in by_res["minute"]) == 150
    assert sum(r["n"] for r in by_res["hour"]) == 150
    assert sum(r["n"] for r in by_res["day"]) == 150
    assert len(by_res["hour"]) == 3  # 150 minutes span 3 hours
    assert len(by_res["day"]) == 1
    day = by_res["day"][0]
    assert day["total"] == 225.0 and day["bucket_s"] % 86400 == 0


def test_kmv_exact_below_k(spark):
    # fewer distinct keys than k -> the estimate IS the exact count
    df = spark.createDataFrame([Row(g="a", u=i % 7) for i in range(100)])
    out = kmv_distinct(df, "u", ["g"], k=64).collect()
    assert len(out) == 1
    assert out[0]["kmv_estimate"] == 7.0 and out[0]["n_hashes"] == 7


def test_kmv_estimate_accuracy(spark):
    # 1000 distinct keys, k=64 -> estimate within ~25% (KMV relative
    # error ~ 1/sqrt(k-1) ~ 12.6%; 2 sigma bound)
    df = spark.createDataFrame([Row(g="a", u=i) for i in range(1000)])
    out = kmv_distinct(df, "u", ["g"], k=64).collect()
    est = out[0]["kmv_estimate"]
    assert 750 <= est <= 1250, est
    assert out[0]["n_hashes"] == 64


def test_asof_join_partition_independent(spark):
    # determinism contract: result identical under adversarial partitioning
    left = spark.createDataFrame([Row(k=i % 5, t=_ts(i), lid=i) for i in range(40)])
    right = spark.createDataFrame(
        [Row(k=i % 5, t=_ts(i, 30), rid=i, v=float(i)) for i in range(40)]
    )
    a = asof_join(left, right, "k", "t", "t", ["rid"], right_order="rid")
    b = asof_join(
        left.repartition(7), right.repartition(3), "k", "t", "t", ["rid"],
        right_order="rid",
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_asof_join_default_tiebreak_partition_independent(spark):
    """Without right_order, right rows tying on (key, ts) are broken by a
    payload hash — arbitrary but stable under adversarial repartitioning
    (the determinism contract ADVICE r2 flagged)."""
    left = spark.createDataFrame([Row(k=i % 3, t=_ts(i), lid=i) for i in range(30)])
    # every right timestamp duplicated with different payloads -> ties
    right = spark.createDataFrame(
        [Row(k=i % 3, t=_ts(i // 2, 30), rid=i, v=float(i)) for i in range(60)]
    )
    a = asof_join(left, right, "k", "t", "t", ["rid", "v"])
    b = asof_join(
        left.repartition(11), right.repartition(5).sortWithinPartitions("v"),
        "k", "t", "t", ["rid", "v"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_histogram_sketch_mergeable(spark):
    """Fixed-bin histograms merge by summing bin counts: sketch(A) +
    sketch(B) must equal sketch(A union B) exactly, and quantiles from
    the merged sketch equal quantiles of the whole — the property that
    lets per-day partial sketches roll up without rescans."""
    from pyspark.sql import functions as F

    from datafusion_server_spark.operators import sketch

    full = spark.range(1000).select((F.col("id") % 357).cast("double").alias("v"))
    a = full.filter(F.col("v") < 150)
    b = full.filter(F.col("v") >= 150)
    lo, hi, bins = 0.0, 400.0, 32
    sk_full = sketch.histogram_sketch(full, "v", lo, hi, bins)
    merged = (
        sketch.histogram_sketch(a, "v", lo, hi, bins)
        .union(sketch.histogram_sketch(b, "v", lo, hi, bins))
        .groupBy("bin")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
    assert sorted(map(tuple, sk_full.collect())) == sorted(map(tuple, merged.collect()))
    q_full = sketch.histogram_quantiles(sk_full, lo, hi, bins, [0.5, 0.95]).collect()
    q_merged = sketch.histogram_quantiles(merged, lo, hi, bins, [0.5, 0.95]).collect()
    assert sorted(map(tuple, q_full)) == sorted(map(tuple, q_merged))
    # sanity: estimates land inside the data range and are ordered
    ests = {r["q"]: r["estimate"] for r in q_full}
    assert 0.0 <= ests[0.5] <= ests[0.95] <= 400.0


def test_histogram_outlier_clamps_to_edge_bin(spark):
    """Extreme out-of-range values clamp into the LAST bin — the int32
    wrap regression put them in bin 0."""
    from pyspark.sql import functions as F

    from datafusion_server_spark.operators import sketch

    df = spark.createDataFrame([(1.7e10,), (250.0,), (-5.0e9,)], ["v"])
    bins = {r["bin"]: r["n"] for r in sketch.histogram_sketch(df, "v", 0.0, 500.0, 64).collect()}
    assert bins == {63: 1, 32: 1, 0: 1}


def test_histogram_quantile_zero(spark):
    """q=0.0 yields the start of the first non-empty bin instead of
    silently emitting no row."""
    from datafusion_server_spark.operators import sketch

    df = spark.createDataFrame([(float(v),) for v in range(100, 200)], ["v"])
    sk = sketch.histogram_sketch(df, "v", 0.0, 400.0, 32)
    qs = {r["q"]: r["estimate"] for r in sketch.histogram_quantiles(sk, 0.0, 400.0, 32, [0.0, 0.5]).collect()}
    assert 0.0 in qs and qs[0.0] == 100.0  # bin 8 starts at 100.0
    assert 100.0 <= qs[0.5] <= 200.0


def test_funnel_counts_monotone_and_strict_order(spark):
    """Step counts never increase, and a user whose steps are out of
    order does not convert."""
    import datetime as dt

    from datafusion_server_spark.operators import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1: proper view -> click -> purchase
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # user 2: click BEFORE view -> stops at view
        (2, "click", t(0)), (2, "view", t(1)),
        # user 3: view only
        (3, "view", t(0)),
        # user 4: purchase first then view/click -> no purchase AFTER click
        (4, "purchase", t(0)), (4, "view", t(1)), (4, "click", t(2)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    out = {r.step_name: r.n_users for r in funnel.funnel_conversion(
        df, "user_id", "event_type", "ts", ["view", "click", "purchase"]).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 1}


def test_cohort_offset_zero_is_full_retention(spark, sf_dir):
    from datafusion_server_spark import tables
    from datafusion_server_spark.operators import funnel

    ev = tables.load(spark, sf_dir, "events")
    ret = funnel.cohort_retention(ev, "user_id", "ts")
    zero = ret.filter(F.col("week_offset") == 0).collect()
    assert zero and all(r.retention == 1.0 and r.n_active == r.n_cohort for r in zero)


def _tmin(i: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)


def test_ewma_matches_hand_unrolled(spark):
    from datafusion_server_spark.operators.timeseries import ewma

    vals = [10.0, 20.0, 30.0, 40.0]
    df = spark.createDataFrame(
        [Row(k=1, ts=_tmin(i), i=i, v=v) for i, v in enumerate(vals)]
    )
    out = {
        r["i"]: r["ewma"]
        for r in ewma(df, "k", "ts", "i", "v", alpha=0.5, lookback=2).collect()
    }
    # truncated EWMA, missing lags contribute 0:
    # t0: .5*10 = 5 ; t1: .5*20 + .25*10 = 12.5
    # t2: .5*30 + .25*20 + .125*10 = 21.25
    # t3: .5*40 + .25*30 + .125*20 = 30.0 (t0 beyond lookback)
    assert out == {0: 5.0, 1: 12.5, 2: 21.25, 3: 30.0}


def test_zscore_flags_spike_only(spark):
    from datafusion_server_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    rows = [Row(k=1, ts=_tmin(i), i=i, v=10.0 + (i % 3) * 0.5) for i in range(12)]
    rows.append(Row(k=1, ts=_tmin(12), i=12, v=500.0))
    rows += [Row(k=1, ts=_tmin(13 + j), i=13 + j, v=10.0) for j in range(3)]
    # a second, perfectly constant user: zero variance, never flagged
    rows += [Row(k=2, ts=_tmin(i), i=i, v=7.0) for i in range(12)]
    df = spark.createDataFrame(rows)
    got = rolling_zscore_anomalies(df, "k", "ts", "i", "v").collect()
    flagged = {(r["key"], r["i"]) for r in got}
    assert (1, 12) in flagged
    assert all(k != 2 for k, _ in flagged)
    # the spike inflates the trailing window's variance so much that the
    # return to 10.0 is NOT itself beyond 2 trailing stddevs
    zmap = {(r["key"], r["i"]): r["z"] for r in got}
    assert zmap[(1, 12)] > 2.0


def test_linear_trend_recovers_exact_line(spark):
    from datafusion_server_spark.operators.timeseries import linear_trend

    # y = 5 + 2 per hour = 48 per day, sampled hourly
    rows = [
        Row(k=1, ts=_tmin(i * 60), v=5.0 + 2.0 * i) for i in range(10)
    ]
    # a flat user below min_points
    rows += [Row(k=2, ts=_tmin(i * 60), v=1.0) for i in range(3)]
    df = spark.createDataFrame(rows)
    got = linear_trend(df, "k", "ts", "v").collect()
    assert [r["key"] for r in got] == [1]
    r = got[0]
    assert abs(r["slope_per_day"] - 48.0) < 1e-6
    assert abs(r["intercept"] - 5.0) < 1e-6


def test_path_surprisal_prefers_rare_paths(spark):
    from datafusion_server_spark.operators.funnel import path_surprisal

    rows = []
    # 20 users follow the common path a->b->a->b...
    for u in range(20):
        for i, t in enumerate(["a", "b", "a", "b", "a"]):
            rows.append(Row(u=u, ts=_tmin(i), i=i, t=t))
    # one user takes the rare b->b loops
    for i, t in enumerate(["b", "b", "b", "b", "b"]):
        rows.append(Row(u=99, ts=_tmin(i), i=i, t=t))
    df = spark.createDataFrame(rows)
    got = {r["user"]: r["surprisal"] for r in path_surprisal(df, "u", "t", "ts", "i").collect()}
    assert got[99] > max(v for u, v in got.items() if u != 99)
