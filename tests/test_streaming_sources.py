"""Unbounded streaming sources: rate-source windowed aggregation runs and
makes progress; kafka gates with a clear error (no package in container)."""

from __future__ import annotations

import pytest

from datafusion_server_spark.streaming import sources


def test_rate_source_windowed_counts(spark):
    out = sources.rate_windowed_counts(
        spark, rows_per_second=500, width="1 second", run_seconds=4.0
    )
    assert dict(out.dtypes) == {
        "bucket": "timestamp",
        "n": "bigint",
        "total_value": "bigint",
    }
    rows = out.collect()
    assert rows, "standing query produced no windows in 4s"
    # windows are 1s-aligned and counts are positive
    for r in rows:
        assert r["bucket"].microsecond == 0
        assert r["n"] > 0
    # the generator emits value = 0,1,2,... in timestamp order: each
    # window holds n CONSECUTIVE ints starting at some s >= 0, so its
    # sum must be n*s + n(n-1)/2 for an integer s. (Checked per window,
    # not globally — under host load the sink may miss a window between
    # captured ones, which says nothing about windowing correctness.)
    for r in rows:
        n, v = r["n"], r["total_value"]
        rem = v - n * (n - 1) // 2
        assert rem % n == 0 and rem // n >= 0, f"non-consecutive window: {r}"


def test_kafka_source_gated(spark):
    with pytest.raises(RuntimeError, match="kafka source unavailable"):
        sources.kafka_stream(spark, "broker:9092", "events")


def test_streaming_kmv_batch_count_invariant(spark, sf_dir, tmp_path):
    """The streaming KMV's emit-on-retention contract: a one-file replay
    (one micro-batch) and a 4-file replay (one file per micro-batch)
    produce IDENTICAL estimates, both equal to the batch KMV."""
    from datafusion_server_spark import tables
    from datafusion_server_spark.operators import sketch
    from datafusion_server_spark.streaming.sketches import kmv_window_distinct
    from pyspark.sql import functions as F

    ev = tables.load(spark, sf_dir, "events")
    split_dir = str(tmp_path / "ev_split")
    ev.repartition(4).write.parquet(split_dir)

    multi = kmv_window_distinct(
        spark, f"{split_dir}/*.parquet", k=8, max_files_per_trigger=1
    )
    single = kmv_window_distinct(spark, f"{sf_dir}/events.parquet", k=8)
    batch = sketch.kmv_estimate_from_hashes(
        ev.select(
            (F.unix_timestamp(F.col("ts")) / 3600).cast("bigint").alias("bucket"),
            F.md5(F.col("user_id").cast("string")).alias("h"),
        ),
        ["bucket"],
        8,
    ).select(
        (F.col("bucket") * 3600).cast("bigint").alias("bucket_s"),
        "kmv_estimate",
        "n_hashes",
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(multi) == as_set(batch)
    assert as_set(single) == as_set(batch)


def test_streaming_hll_batch_count_invariant(spark, sf_dir, tmp_path):
    """The streaming HLL's max-register aggregation is batching
    invariant: a one-file replay and a 4-file drip replay produce
    IDENTICAL estimates, both equal to the batch HLL."""
    from datafusion_server_spark import tables
    from datafusion_server_spark.operators import sketch
    from datafusion_server_spark.streaming.sketches import hll_window_distinct
    from pyspark.sql import functions as F

    ev = tables.load(spark, sf_dir, "events")
    split_dir = str(tmp_path / "ev_split_hll")
    ev.repartition(4).write.parquet(split_dir)

    multi = hll_window_distinct(
        spark, f"{split_dir}/*.parquet", max_files_per_trigger=1
    )
    single = hll_window_distinct(spark, f"{sf_dir}/events.parquet")
    batch = sketch.hll_distinct(
        ev.filter(F.col("user_id").isNotNull()).select(
            F.floor(F.unix_timestamp(F.col("ts")) / 3600).cast("bigint").alias("b"),
            "user_id",
        ),
        "user_id",
        ["b"],
    ).select(
        (F.col("b") * 3600).cast("bigint").alias("bucket_s"),
        "hll_estimate",
        "n_registers",
    )

    def rows(df):
        return {
            (r.bucket_s, r.hll_estimate, r.n_registers) for r in df.collect()
        }

    assert rows(multi) == rows(single) == rows(batch)


def test_stream_join_width_isolated_from_caller_session(spark, sf_dir):
    """r13 (ADVICE): click_error_join's state_partitions override runs on
    a child session (spark.newSession) — the caller's SQLConf must be
    untouched for the whole call, so a concurrently-planned query can
    never inherit the reduced shuffle width."""
    from datafusion_server_spark.streaming.joins import click_error_join

    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = click_error_join(
        spark, f"{sf_dir}/events.parquet", state_partitions=4, timeout_s=90.0
    )
    assert out.count() >= 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_stateful_width_pinned_by_checkpoint(spark, tmp_path):
    """r13 (verdict task 7): the state-partition count is pinned into the
    streaming checkpoint on first run — restarting the SAME checkpoint
    under a session whose shuffle width (e.g. a changed 'auto' estimate)
    differs must keep the pinned width, not silently re-shard state."""
    import time

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 100).selectExpr(
        "id", "CAST(id % 10 AS STRING) AS k"
    ).write.parquet(src)

    def run(width: int):
        sess = spark.newSession()
        sess.conf.set("spark.sql.shuffle.partitions", str(width))
        stream = sess.readStream.schema("id bigint, k string").parquet(src)
        agg = stream.groupBy("k").count()
        q = (
            agg.writeStream.format("memory")
            .queryName(f"pin_{width}")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(90.0)
            # availableNow terminates the query; progress may lag a beat
            for _ in range(20):
                if q.lastProgress and q.lastProgress.get("stateOperators"):
                    break
                time.sleep(0.25)
            ops = (q.lastProgress or {}).get("stateOperators") or []
            return ops[0].get("numShufflePartitions") if ops else None
        finally:
            q.stop()

    first = run(3)
    assert first == 3
    # second run: session asks for 8, checkpoint must pin 3
    spark.range(100, 120).selectExpr(
        "id", "CAST(id % 10 AS STRING) AS k"
    ).write.mode("append").parquet(src)
    second = run(8)
    assert second == 3, (
        "restart against an existing checkpoint must keep the pinned "
        f"state width (got {second})"
    )
