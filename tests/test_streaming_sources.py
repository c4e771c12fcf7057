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
