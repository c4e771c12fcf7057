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


def stream_near_dup_probe(
    spark: SparkSession,
    docs_path: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    timeout_s: float = 180.0,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming NEAR-duplicate detection: incoming documents (the
    stream) are MinHash-signed per micro-batch and probed against the
    STATIC corpus signature index via ``foreachBatch`` — the production
    shape for continuous ingest dedup (the index is the at-rest corpus;
    the stream only ever pays for its own batch). Because each
    document's probe is independent, the result is micro-batch-count
    INVARIANT: the union over batches equals one batch probe of the
    whole stream, which is exactly the batch oracle
    (``dedup_incremental_lsh``'s SQL).

    Returns the accumulated pair table
    (new_id, index_id, n_common, n_new, n_index, jaccard)."""
    import tempfile

    from datafusion_server_spark.operators import dedup as dedup_ops

    static = spark.read.parquet(docs_path)
    index = dedup_ops.lsh_signature_index(
        static.filter(F.col("doc_id") % 10 < 8), "text", "doc_id", num_hashes
    )
    parent, _, fname = docs_path.rpartition("/")
    reader = spark.readStream.schema(static.schema).option("pathGlobFilter", fname)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(parent).filter(F.col("doc_id") % 10 >= 8)

    outdir = tempfile.mkdtemp(prefix="neardup_sink_")

    def probe_batch(batch_df: DataFrame, _bid: int) -> None:
        res = dedup_ops.lsh_pairs_against_index(
            batch_df, index, "text", "doc_id", num_hashes, bands, materialize=False
        )
        res.write.mode("append").parquet(outdir)

    query = (
        stream.writeStream.foreachBatch(probe_batch)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    return spark.read.parquet(outdir)
