"""Unbounded streaming sources beyond the file-replay paths.

The file-stream pipelines (windows.py / sessionize.py) run with
``Trigger.AvailableNow`` so correctness checks are deterministic; this
module exercises the genuinely-unbounded side:

- ``rate``: Spark's built-in load-generator source — proves the same
  windowed-aggregation plan runs against a source with no end, with the
  watermark bounding state;
- ``kafka``: gated cleanly (the spark-sql-kafka package isn't in this
  container), mirroring how avro/delta sources gate in sources/registry.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark.streaming.util import event_time_col


def rate_windowed_counts(
    spark: SparkSession,
    *,
    rows_per_second: int = 200,
    width: str = "1 second",
    watermark: str = "2 seconds",
    run_seconds: float = 4.0,
) -> DataFrame:
    """Tumbling event-time counts over the unbounded ``rate`` source.

    Runs the standing query for ``run_seconds`` of wall clock, stops it,
    and returns the sink contents: (bucket, n, total_value). Values
    depend on wall-clock timing — callers assert shape/progress, not
    exact rows (the deterministic twin of this plan is
    windows.tumbling_event_counts over a file stream).
    """
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    windowed = (
        stream.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", width).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("value").cast("bigint").alias("total_value"),
        )
    )
    sink = f"rate_{uuid.uuid4().hex[:8]}"
    query = (
        windowed.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + run_seconds
        while time.time() < deadline:
            time.sleep(0.2)
    finally:
        query.stop()
    return spark.table(sink).select(
        F.col("w.start").cast("timestamp").alias("bucket"), "n", "total_value"
    )


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, **options
) -> DataFrame:
    """Kafka source (value as string + event timestamp), gated: the
    spark-sql-kafka package is not on this container's classpath, so the
    reader raises a clear error instead of an opaque classpath trace."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    for k, v in options.items():
        reader = reader.option(k, str(v))
    try:
        raw = reader.load()
    except Exception as e:
        raise RuntimeError(
            "kafka source unavailable: the spark-sql-kafka package is not "
            f"on the classpath ({e})"
        ) from e
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("timestamp").alias("ts"),
        "topic",
        "partition",
        "offset",
    )


def file_sink_roundtrip(
    spark,
    events_path: str,
    out_dir: str,
    *,
    event_type: str = "click",
    timeout_s: float = 120.0,
):
    """Streaming parquet FILE sink with checkpoint-backed exactly-once
    semantics: stream the events file, filter one event type, write to a
    parquet directory sink with a checkpointLocation, then hand back a
    batch DataFrame over the written files. A crashed-and-restarted query
    resumes from the checkpoint without duplicating output — the sink
    contract the memory sink cannot give. Caller owns ``out_dir``
    (recreated each run)."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(out_dir, ignore_errors=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    parent, _, fname = events_path.rpartition("/")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    ts = event_time_col(stream)
    out = (
        stream.withColumn("ts", ts)
        .filter(F.col("event_type") == event_type)
        .select(
            "event_id",
            F.col("user_id").cast("bigint").alias("user_id"),
            F.unix_micros("ts").alias("ts_us"),
            F.round(F.col("value").cast("double"), 6).alias("value"),
        )
    )
    query = (
        out.writeStream.format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    return spark.read.parquet(f"{out_dir}/data")
