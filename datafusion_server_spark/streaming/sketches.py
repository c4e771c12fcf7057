"""Streaming mergeable sketch: per-window KMV distinct estimation via
``applyInPandasWithState``.

The standing-pipeline version of ``operators.sketch.kmv_distinct``: the
event stream is keyed by its time bucket; each bucket's GroupState holds
the k smallest md5 hashes seen so far, and a hash is EMITTED (append
mode) the micro-batch it first enters the retained set. Emission-on-
retention makes the output stream batch-count invariant: every hash in
the final k-min set is necessarily retained at its arrival batch (fewer
than k smaller hashes exist in the whole stream, so fewer exist among
the prefix seen so far), and hashes that are later evicted are harmless
because the finishing step (``kmv_estimate_from_hashes``) re-takes the
k minima. So availableNow over one file, a drip-fed multi-batch replay,
and the batch SQL oracle all produce the SAME estimates — the
determinism contract the other streaming classes follow.

At scale: state is partitioned by bucket (the shuffle key), each state
value is a bounded string (k hashes), closed buckets stop receiving
events and their state ages out with a watermark policy in a standing
deployment; the sketch property (mergeable k-min sets) is exactly what
makes per-bucket distinct counting a streaming citizen — no per-key
exact dedup state.
"""

from __future__ import annotations

import hashlib
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from datafusion_server_spark.operators.sketch import kmv_estimate_from_hashes
from datafusion_server_spark.streaming.util import event_time_col

OUTPUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType(), False),
        StructField("h", StringType(), False),
    ]
)

# retained k-min hashes joined by ',' — bounded at k * 33 chars
STATE_SCHEMA = StructType([StructField("retained", StringType(), True)])


def _kmv_group(k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        retained = set(state.get[0].split(",")) if state.exists and state.get[0] else set()
        new_hashes = set()
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                new_hashes.add(hashlib.md5(str(int(uid)).encode()).hexdigest())
        emitted = []
        for h in sorted(new_hashes):
            if h in retained:
                continue
            if len(retained) < k:
                retained.add(h)
                emitted.append(h)
            elif h < max(retained):
                retained.remove(max(retained))
                retained.add(h)
                emitted.append(h)
        state.update((",".join(sorted(retained)),))
        if emitted:
            yield pd.DataFrame({"bucket": bucket, "h": emitted})

    return fn


def kmv_window_distinct(
    spark: SparkSession,
    events_path: str,
    *,
    bucket_seconds: int = 3600,
    k: int = 8,
    max_files_per_trigger: int | None = None,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Per-bucket streaming KMV distinct-user estimates. Returns the
    finished (bucket_s, kmv_estimate, n_hashes) — identical values to
    the batch KMV over the same bucketing (the oracle check).
    ``events_path`` may be a glob; ``max_files_per_trigger=1`` replays
    it one file per micro-batch (the multi-batch invariance test)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    parent, _, fname = events_path.rpartition("/")
    reader = spark.readStream.schema(static.schema).option("pathGlobFilter", fname)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(parent)
    ts = event_time_col(stream)
    keyed = (
        stream.select(
            # floor (not truncating cast) so pre-1970 buckets match the
            # oracle's FLOOR; null keys dropped — a null hashes to NULL
            # in the batch path and never enters a k-min set
            F.floor(F.unix_timestamp(ts) / bucket_seconds).cast("bigint").alias("bucket"),
            F.col("user_id"),
        )
        .filter(F.col("user_id").isNotNull())
        .groupBy("bucket")
    )
    retained = keyed.applyInPandasWithState(
        _kmv_group(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"kmv_{uuid.uuid4().hex[:8]}"
    query = (
        retained.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    est = kmv_estimate_from_hashes(spark.table(sink), ["bucket"], k)
    return est.select(
        (F.col("bucket") * bucket_seconds).cast("bigint").alias("bucket_s"),
        "kmv_estimate",
        "n_hashes",
    )


def hll_window_distinct(
    spark: SparkSession,
    events_path: str,
    *,
    bucket_seconds: int = 3600,
    max_files_per_trigger: int | None = None,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Per-bucket streaming deterministic-HLL distinct-user estimates —
    the ENGINE-NATIVE counterpart of ``kmv_window_distinct``: HLL
    registers are an associative MAX, so the whole sketch runs as one
    ordinary streaming aggregation (groupBy(bucket, register) ->
    max(rho)) with engine-managed state, no custom state function. The
    register table in the sink is then finished batch-side
    (``operators.sketch.hll_estimate``) — Spark permits only one
    streaming aggregation per query, and the finishing step is a
    per-group fold over at most m register rows.

    Output: (bucket_s, hll_estimate, n_registers) — identical values to
    the batch HLL over the same bucketing (the oracle check), for ANY
    micro-batch replay (max is order- and batching-invariant).

    At scale: state per (time bucket, register) key is one BIGINT; a
    closed bucket's <= m rows age out via the standing deployment's
    watermark. Register streams from independent sources union and
    re-max — the merge property, now in motion."""
    from datafusion_server_spark.operators.sketch import hll_estimate, hll_registers

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    parent, _, fname = events_path.rpartition("/")
    reader = spark.readStream.schema(static.schema).option("pathGlobFilter", fname)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(parent)
    ts = event_time_col(stream)
    keyed = stream.select(
        F.floor(F.unix_timestamp(ts) / bucket_seconds).cast("bigint").alias("bucket_s"),
        F.col("user_id"),
    ).filter(F.col("user_id").isNotNull())
    registers = hll_registers(keyed, "user_id", ["bucket_s"])
    sink = f"hll_{uuid.uuid4().hex[:8]}"
    query = (
        registers.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    est = hll_estimate(spark.table(sink), ["bucket_s"])
    return est.select(
        (F.col("bucket_s") * bucket_seconds).cast("bigint").alias("bucket_s"),
        "hll_estimate",
        "n_registers",
    )
