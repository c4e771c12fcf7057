"""Skew-salted join correctness + bucketed co-located join (no shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_server_spark.operators import scale


def test_salted_join_matches_plain_join(spark):
    # skewed fact: 90% of rows share key 7
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = fact.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = scale.salted_join(fact, dim, "k", salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched fact rows exactly once
    dim_partial = dim.filter("k < 50")
    plain_l = fact.join(dim_partial, "k", "left")
    salted_l = scale.salted_join(fact, dim_partial, "k", salt=8, how="left")
    assert plain_l.count() == salted_l.count() == fact.count()


def test_salted_join_rejects_replication_unsafe_how(spark):
    """The dimension side is replicated salt-x, so right/full/semi/anti
    joins would be silently wrong — salted_join must refuse them."""
    fact = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("v"))
    dim = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("w"))
    for bad in ("right", "full", "outer", "left_semi", "left_anti", "semi", "anti"):
        with pytest.raises(ValueError, match="salted_join supports"):
            scale.salted_join(fact, dim, "k", how=bad)
    # accepted spellings still work
    assert scale.salted_join(fact, dim, "k", how="left_outer").count() == 10


class _ConnectLike:
    """Delegating DataFrame proxy that hides the classic-only ``rdd`` /
    ``_jdf`` handles (the Spark Connect client surface) while keeping the
    public API (inputFiles, sparkSession, explain, repartition) working."""

    def __init__(self, df):
        object.__setattr__(self, "_df", df)

    def __getattr__(self, name):
        if name in ("rdd", "_jdf"):
            raise AttributeError(f"'{name}' is not available under Spark Connect")
        return getattr(object.__getattribute__(self, "_df"), name)


def test_fanout_guard_is_connect_safe(spark, tmp_path):
    """The fanout guard and shuffle diagnostic must not depend on the
    classic-only ``df.rdd`` / ``df._jdf`` handles (absent under Spark
    Connect): with both hidden, the guard still estimates partitions from
    input files and repartitions an under-split scan, and plan_has_shuffle
    degrades to the public explain text."""
    path = str(tmp_path / "one_file.parquet")
    spark.range(1_000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)

    # single-file scan, target 32 -> the guard must add a repartition
    guarded = scale.ensure_fanout_parallelism(_ConnectLike(df), min_partitions=32)
    assert "exchange roundrobinpartitioning" in scale._explain_text(guarded).lower()
    # already-wide estimate -> no-op (same object back)
    wide = _ConnectLike(df)
    assert scale.ensure_fanout_parallelism(wide, min_partitions=1) is wide
    # in-memory input (no listable files) -> unknown -> left untouched
    mem = _ConnectLike(spark.createDataFrame([(1,), (2,)], "x int"))
    assert scale.ensure_fanout_parallelism(mem, min_partitions=32) is mem
    # plan_has_shuffle degrades to the public explain text
    shuffled = _ConnectLike(df.groupBy((F.col("id") % 3).alias("g")).count())
    assert scale.plan_has_shuffle(shuffled)
    assert not scale.plan_has_shuffle(_ConnectLike(df.select("id")))


def test_estimate_scan_partitions_splits_by_max_partition_bytes(spark, tmp_path):
    path = str(tmp_path / "sized.parquet")
    spark.range(200_000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    import os

    fsize = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(fsize // 4, 1)))
        est = scale.estimate_scan_partitions(spark.read.parquet(path))
        assert est is not None and est >= 4
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert scale._parse_spark_bytes("128m") == 128 << 20
    assert scale._parse_spark_bytes("134217728b") == 128 << 20
    assert scale._parse_spark_bytes("1g") == 1 << 30


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts join
    shuffle-free — the write-time exchange is amortized over every later
    join (the 100 TB layout for repeatedly-joined fact tables)."""
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    try:
        scale.write_bucketed(left, "bk_left", "k", 8, sort_cols="k")
        scale.write_bucketed(right, "bk_right", "k", 8, sort_cols="k")
    except Exception as e:  # pragma: no cover - catalog-less environments
        pytest.skip(f"bucketed saveAsTable unavailable: {e}")
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        assert not scale.plan_has_shuffle(joined), "bucketed join must not shuffle"
        assert joined.count() == 5_000
        # sanity: the same join on unbucketed frames DOES shuffle
        assert scale.plan_has_shuffle(left.join(right, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_runtime_bloom_filter_fires_at_scale_thresholds(spark, tmp_path):
    """Scale evidence for the selective-dim join shape (q3/q5/q10 at
    100 TB where the dim no longer broadcasts): Catalyst's runtime
    bloom-filter injection must remain AVAILABLE in our sessions — a
    bloom built from the filtered dim side is pushed into the fact scan
    (`might_contain`), cutting the shuffled fact rows to candidates
    only. The session default thresholds (10 GB application side) only
    suppress it at FIXTURE scale, so this test lowers them to prove
    nothing in our session/operator stack disables the rewrite.

    Uses the SHARED session with set/restore of the runtime SQL confs:
    local-mode sessions share one JVM SparkContext, so building a
    throwaway session and .stop()-ing it would kill the context under
    every later test (that exact bug shipped once — 106 downstream
    failures)."""
    _BLOOM_CONFS = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100KB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        # force the non-broadcast join path the rewrite targets
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
        spark.range(200_000).select(
            F.col("id").alias("fk"), (F.col("id") * 2).alias("v")
        ).write.mode("overwrite").parquet(fact_p)
        spark.range(5_000).select(
            F.col("id").alias("pk"), (F.col("id") % 5).alias("cat")
        ).write.mode("overwrite").parquet(dim_p)
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("cat") == 3)
        j = fact.join(dim, fact.fk == dim.pk)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        assert "bloom_filter_agg" in plan
        # and the rewrite must not change results
        assert j.count() == 1_000
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
