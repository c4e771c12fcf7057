"""Unit tests for the Count-Min sketch, exact heavy hitters, and
gap-fill/LOCF — the algebraic properties (upper bound, mergeability,
carry-forward) the registry oracle doesn't probe directly."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import sketch, timeseries


def test_countmin_is_upper_bound_on_true_counts(spark):
    # keys with known frequencies: key i appears i+1 times
    rows = [(i,) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k bigint")
    sk = sketch.countmin_sketch(df, "k", depth=4, width=16)  # force collisions
    keys = spark.range(20).select(F.col("id").alias("k"))
    est = {r.key: r.cm_estimate for r in
           sketch.countmin_estimate(sk, keys, "k", depth=4, width=16).collect()}
    for i in range(20):
        assert est[i] >= i + 1  # never underestimates


def test_countmin_absent_key_can_read_zero(spark):
    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    sk = sketch.countmin_sketch(df, "k", depth=4, width=4096)  # wide: no collisions
    keys = spark.createDataFrame([(999,)], "k bigint")
    est = sketch.countmin_estimate(sk, keys, "k", depth=4, width=4096).collect()
    assert est[0].cm_estimate == 0


def test_countmin_merges_by_summing_cells(spark):
    a = spark.createDataFrame([(i % 5,) for i in range(50)], "k bigint")
    b = spark.createDataFrame([(i % 5,) for i in range(30)], "k bigint")
    merged = (
        sketch.countmin_sketch(a, "k", 4, 32)
        .unionByName(sketch.countmin_sketch(b, "k", 4, 32))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = sketch.countmin_sketch(a.unionByName(b), "k", 4, 32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_heavy_hitters_rank_and_tiebreak(spark):
    df = spark.createDataFrame(
        [("g", 1)] * 3 + [("g", 2)] * 3 + [("g", 3)] * 1, "grp string, k bigint"
    )
    out = sketch.heavy_hitters(df, "k", ["grp"], k=2).collect()
    ranked = {r.rank: (r.key, r.cnt) for r in out}
    assert ranked[1] == (1, 3)  # tie on cnt=3 -> smaller key first
    assert ranked[2] == (2, 3)
    assert len(out) == 2


def _ts(h):
    return datetime.datetime(2024, 1, 1, h, 30)


def test_gapfill_fills_gaps_with_locf(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 1.00), ("a", _ts(0), 2.00), ("a", _ts(3), 5.25)],
        "key string, ts timestamp, v double",
    )
    out = {r.bucket_s: r for r in
           timeseries.gapfill_locf(df, "ts", "key", "v").collect()}
    buckets = sorted(out)
    assert len(buckets) == 4  # hours 0..3 inclusive
    first, last = out[buckets[0]], out[buckets[3]]
    assert first.n == 2 and first.filled == 3.0  # 1.00 + 2.00
    for b in buckets[1:3]:  # the two gap hours carry hour 0's sum
        assert out[b].n == 0 and out[b].filled == 3.0
    assert last.n == 1 and last.filled == 5.25


def test_gapfill_keys_are_independent(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(2), 2.0), ("b", _ts(5), 7.0)],
        "key string, ts timestamp, v double",
    )
    out = timeseries.gapfill_locf(df, "ts", "key", "v").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    assert len(by_key["a"]) == 3  # hours 0,1,2
    assert len(by_key["b"]) == 1  # single bucket, no spine beyond its span
    assert by_key["b"][0].filled == 7.0  # never contaminated by key a


def test_quantiles_disc_selection_semantics(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)], "grp string, v double"
    )
    out = {r.q: r.value for r in
           sketch.quantiles_disc(df, "v", ["grp"], [0.5, 0.9, 1.0]).collect()}
    assert out[0.5] == 5.0   # ceil(0.5*10) = rank 5
    assert out[0.9] == 9.0   # ceil(0.9*10) = rank 9
    assert out[1.0] == 10.0  # max


def test_hll_estimate_accuracy(spark, sf_dir):
    """m=256 registers -> ~6.5% standard error; assert every group's
    deterministic-HLL estimate lands within 25% of the exact count."""
    sk = sketch
    ev = tables.load(spark, sf_dir, "events")
    est = {
        r.event_type: r.hll_estimate
        for r in sk.hll_distinct(ev, "user_id", ["event_type"]).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(est[et] - n) / n <= 0.25, (et, n, est[et])


def test_hll_registers_merge_by_max(spark, sf_dir):
    """Sketch mergeability: registers of the full stream equal the
    bucket-wise max of two disjoint halves' registers — the property
    that lets shards/days combine without rescanning."""
    sk = sketch
    ev = tables.load(spark, sf_dir, "events")
    full = sk.hll_registers(ev, "user_id", ["event_type"])
    a = sk.hll_registers(ev.filter(F.col("event_id") % 2 == 0), "user_id", ["event_type"])
    b = sk.hll_registers(ev.filter(F.col("event_id") % 2 == 1), "user_id", ["event_type"])
    merged = (
        a.unionByName(b)
        .groupBy("event_type", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    assert full.exceptAll(merged).count() == 0
    assert merged.exceptAll(full).count() == 0
    # and the estimate computed from merged registers matches the full one
    e1 = {
        r.event_type: r.hll_estimate
        for r in sk.hll_estimate(full, ["event_type"]).collect()
    }
    e2 = {
        r.event_type: r.hll_estimate
        for r in sk.hll_estimate(merged, ["event_type"]).collect()
    }
    assert e1 == e2


def test_bloom_no_false_negatives_and_merge(spark, sf_dir):
    """Bloom contract: every true member tests present (no false
    negatives, ever); filters built on disjoint halves OR together into
    exactly the full filter."""
    ev = tables.load(spark, sf_dir, "events").filter(F.col("value") > 900)
    bloom = sketch.bloom_build(ev, "user_id", ["event_type"])
    members = ev.select("event_type", "user_id").distinct()
    checked = sketch.bloom_might_contain(bloom, members, "user_id", ["event_type"])
    assert checked.filter(~F.col("might_contain")).count() == 0

    a = sketch.bloom_build(
        ev.filter(F.col("event_id") % 2 == 0), "user_id", ["event_type"]
    )
    b = sketch.bloom_build(
        ev.filter(F.col("event_id") % 2 == 1), "user_id", ["event_type"]
    )
    merged = (
        a.unionByName(b)
        .groupBy("event_type", "word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert bloom.exceptAll(merged).count() == 0
    assert merged.exceptAll(bloom).count() == 0


def test_kmv_set_estimates_accuracy(spark, sf_dir):
    """Union/intersection estimates land within the KMV error envelope
    (~1/sqrt(k) ~ 6% at k=256; assert 20%) of the exact values."""
    ev = tables.load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "view")
    est = sketch.kmv_set_estimates(a, b, "user_id", k=256).first()
    ua = {r.user_id for r in a.select("user_id").distinct().collect()}
    ub = {r.user_id for r in b.select("user_id").distinct().collect()}
    exact_u, exact_i = len(ua | ub), len(ua & ub)
    assert abs(est.union_est - exact_u) / exact_u <= 0.2, (est.union_est, exact_u)
    assert abs(est.intersect_est - exact_i) / max(exact_i, 1) <= 0.25, (
        est.intersect_est,
        exact_i,
    )
