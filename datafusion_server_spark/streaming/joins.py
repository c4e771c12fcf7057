"""Stream-stream join: two unbounded streams joined with watermark-bounded
state (the last Structured Streaming operator class in the engine's
inventory: windowed agg, stateful sessionization, watermark dedup, and
this).

Semantics: inner join click-stream x error-stream on user, with the
time-range predicate ``click.ts <= error.ts <= click.ts + max_gap``.
Both sides carry watermarks, so each side's join state is dropped once
the other side's watermark passes the range bound — bounded memory on
unbounded input (Spark computes the state-retention horizon from the
join's time condition).

Scale note: the join shuffles both streams on the key exactly like a
batch shuffle join; state is per-key-partition in the state store. At
100 TB/day the knobs are the watermark delay (state size) and key salt
(skew) — the plan shape needs no change.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark.streaming.util import event_time_col


def click_error_join(
    spark: SparkSession,
    events_path: str,
    *,
    max_gap: str = "10 minutes",
    watermark: str = "10 minutes",
    timeout_s: float = 120.0,
) -> DataFrame:
    """Join each click to the same user's errors within ``max_gap`` after
    it, as a stream-stream inner join driven to completion with
    availableNow. Returns (user_id, click_id, error_id, gap_us)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    parent, _, fname = events_path.rpartition("/")

    def side(event_type: str, alias: str) -> DataFrame:
        stream = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", fname)
            .parquet(parent)
        )
        ts = event_time_col(stream)
        return (
            stream.withColumn("ts", ts)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{alias}_user"),
                F.col("event_id").alias(f"{alias}_id"),
                F.col("ts").alias(f"{alias}_ts"),
            )
            .withWatermark(f"{alias}_ts", watermark)
        )

    clicks = side("click", "c")
    errors = side("error", "e")
    joined = clicks.join(
        errors,
        F.expr(
            f"c_user = e_user AND e_ts >= c_ts AND e_ts <= c_ts + INTERVAL {max_gap}"
        ),
    )
    sink = f"ssjoin_{uuid.uuid4().hex[:8]}"
    query = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    return spark.table(sink).select(
        F.col("c_user").cast("bigint").alias("user_id"),
        F.col("c_id").alias("click_id"),
        F.col("e_id").alias("error_id"),
        (F.unix_micros("e_ts") - F.unix_micros("c_ts")).cast("bigint").alias("gap_us"),
    )
