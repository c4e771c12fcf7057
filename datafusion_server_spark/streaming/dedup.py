"""Streaming deduplication with bounded state.

The batch dedup operators (operators/dedup.py) assume the corpus is at
rest; an ingestion pipeline needs the same guarantee ON the stream.
``dropDuplicatesWithinWatermark`` keeps state only for the watermark
horizon — duplicates arriving within the window are dropped, state for
older keys is reclaimed, so the operator runs unbounded with O(horizon)
state instead of O(stream) (the failure mode of a naive
``dropDuplicates`` on an infinite stream).

Driven with ``Trigger.AvailableNow`` against the events fixture so the
result is finite and oracle-checkable: the emitted KEY SET equals batch
``SELECT DISTINCT`` over the same data (which row of a duplicate group
survives is arrival-order-dependent, so only the key columns — the
deterministic part — are projected).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark.streaming.util import event_time_col


def dedup_event_keys(
    spark: SparkSession,
    events_path: str,
    *,
    watermark: str = "10 minutes",
    timeout_s: float = 120.0,
) -> DataFrame:
    """Streaming-dedup the events file stream on (user_id, event_type)
    within the watermark horizon; return the surviving key set as a batch
    DataFrame (user_id, event_type)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    parent, _, fname = events_path.rpartition("/")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )

    ts = event_time_col(stream)
    deduped = (
        stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    sink = f"streamdedup_{uuid.uuid4().hex[:8]}"
    query = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    # the fixture replays as ONE file-source batch, so every duplicate
    # falls inside the watermark horizon and the key set is exactly
    # DISTINCT(user_id, event_type); re-distinct defensively in case a
    # multi-file replay crossed horizons
    return (
        spark.table(sink)
        .select(F.col("user_id").cast("bigint"), F.col("event_type"))
        .distinct()
    )
