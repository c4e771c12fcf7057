"""Stateful streaming sessionization: ``applyInPandasWithState`` over a
keyed event stream.

Per-user session assignment (gap > ``gap_s`` starts a new session) with
explicit GroupState carrying (last event time, current session id) across
micro-batches. Driven with availableNow so results are finite and
deterministic — the output matches the batch window-function
sessionization (the ``events_sessionize`` query) exactly, which is the
oracle check.

At scale: state is partitioned by user_id (the shuffle key), each
micro-batch touches only keys with new events, and the state store bounds
memory; this is the standing-pipeline version of the batch query.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark.streaming.util import event_time_col
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("session_id", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_epoch_us", LongType(), True),
        StructField("session_id", LongType(), True),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = 1800 * 1_000_000
    (user_id,) = key
    if state.exists:
        last_us, sid = state.get
    else:
        last_us, sid = None, 0
    chunks = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        epochs = (pdf["ts"].astype("int64") // 1000).tolist()  # ns -> us
        sids = []
        for us in epochs:
            if last_us is not None and us - last_us > gap_us:
                sid += 1
            sids.append(sid)
            last_us = us
        chunks.append(
            pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"].to_numpy(),
                    "session_id": sids,
                }
            )
        )
    state.update((last_us, sid))
    if chunks:
        yield pd.concat(chunks)


def sessionize_stream(
    spark: SparkSession,
    events_path: str,
    *,
    timeout_s: float = 120.0,
) -> DataFrame:
    """Run the stateful sessionizer over the events file stream to
    completion; return the finished (user_id, event_id, session_id)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(events_path)
    parent, _, fname = events_path.rpartition("/")
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", fname)
        .parquet(parent)
    )
    ts = event_time_col(stream)
    keyed = stream.select(F.col("user_id"), F.col("event_id"), ts.alias("ts")).groupBy(
        "user_id"
    )
    sessions = keyed.applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    query = (
        sessions.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination(timeout_s)
    finally:
        query.stop()
    return spark.table(sink)
