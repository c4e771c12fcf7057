"""Event-time windowed aggregation over a file stream.

``readStream`` -> watermark -> tumbling ``window()`` aggregation ->
memory sink, driven to completion with ``Trigger.AvailableNow`` so the
result is a finite, deterministic table (every source file processed,
then the query stops). In production the same plan runs unbounded with
the watermark bounding state; availableNow is the batch-replay mode.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark.streaming.util import event_time_col


def sliding_event_counts(
    spark: SparkSession,
    events_path: str,
    *,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    timeout_s: float = 120.0,
) -> DataFrame:
    """Sliding (overlapping) windows: each event lands in width/slide
    windows (2 here). Same stream shape as the tumbling variant; the
    state store holds width/slide concurrent windows per key, bounded by
    the watermark. Returns (bucket, event_type, n, total_value)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    parent, _, fname = events_path.rpartition("/")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    ts = event_time_col(stream)
    windowed = (
        stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"),
        )
    )
    sink = f"sliding_{uuid.uuid4().hex[:8]}"
    query = (
        windowed.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    return spark.table(sink).select(
        F.col("w.start").cast("timestamp").alias("bucket"),
        "event_type",
        "n",
        F.round(F.col("total_value").cast("double"), 6).alias("total_value"),
    )


def session_window_counts(
    spark: SparkSession,
    events_path: str,
    *,
    gap: str = "30 minutes",
    timeout_s: float = 120.0,
) -> DataFrame:
    """Native ``session_window`` streaming aggregation: dynamic-width
    session windows that close after ``gap`` of per-user inactivity —
    Spark's built-in alternative to the custom
    ``applyInPandasWithState`` sessionizer (state merging handled by the
    engine; windows merge when events bridge a gap). Complete output
    mode so end-of-stream emits every session without watermark
    truncation under the availableNow replay. Returns (user_id,
    session_start, session_end, n)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    parent, _, fname = events_path.rpartition("/")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    ts = event_time_col(stream)
    windowed = (
        stream.withColumn("ts", ts)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    sink = f"sessionwin_{uuid.uuid4().hex[:8]}"
    query = (
        windowed.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    return spark.table(sink).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("w.start").cast("timestamp").alias("session_start"),
        F.col("w.end").cast("timestamp").alias("session_end"),
        "n",
    )


def tumbling_event_counts(
    spark: SparkSession,
    events_path: str,
    *,
    width: str = "5 minutes",
    watermark: str = "10 minutes",
    timeout_s: float = 120.0,
) -> DataFrame:
    """Tumbling per-window, per-event-type counts + value sums over the
    events file stream. Returns the finished result as a batch DataFrame
    (bucket, event_type, n, total_value)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    # file streams need a directory source: stream the parent dir with a
    # glob filter selecting just this table's file
    parent, _, fname = events_path.rpartition("/")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )

    ts = event_time_col(stream)
    windowed = (
        stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("total_value"),
        )
    )
    sink = f"tumbling_{uuid.uuid4().hex[:8]}"
    query = (
        windowed.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    return spark.table(sink).select(
        F.col("w.start").cast("timestamp").alias("bucket"),
        "event_type",
        "n",
        # exact decimal sum inside the stream; DOUBLE in the final
        # projection (the driver's comparator canonicalizes DOUBLE, not
        # DECIMAL — keep decimals out of every final schema)
        F.round(F.col("total_value").cast("double"), 6).alias("total_value"),
    )


def trending_topk(
    spark: SparkSession,
    events_path: str,
    *,
    width: str = "5 minutes",
    watermark: str = "10 minutes",
    k: int = 3,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Trending-items monitoring: the streaming tumbling aggregation
    feeds a batch-side rank over the FINISHED window table — the
    standard two-phase shape (per-window ranking is not expressible
    inside a streaming agg; the stream maintains counts, the sink query
    ranks them). Returns (bucket, event_type, n, rank) with rank <= k,
    ties broken by event_type."""
    from pyspark.sql import Window

    counts = tumbling_event_counts(
        spark, events_path, width=width, watermark=watermark, timeout_s=timeout_s
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.select(
            "bucket", "event_type", "n", F.row_number().over(w).cast("bigint").alias("rank")
        )
        .filter(F.col("rank") <= k)
    )
