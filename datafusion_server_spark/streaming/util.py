"""Shared streaming helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_time_col(stream: DataFrame, col: str = "ts") -> Column:
    """Normalized event-time column for watermarking.

    Fixture parquet may surface the event time as:
    - ``bigint`` — nanos-as-long under the legacy parquet nanos flag;
    - ``timestamp_ntz`` — plain ``timestamp[us]`` parquet with no tz
      (Spark's NTZ inference), which ``withWatermark`` rejects
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE);
    - ``timestamp`` — already usable.

    Returns an expression yielding TIMESTAMP in all three cases. The NTZ
    cast interprets the naive value in the session timezone (UTC in this
    repo's sessions), preserving the fixture's literal instants.
    """
    dt = dict(stream.dtypes).get(col)
    if dt == "bigint":
        return F.timestamp_micros(F.expr(f"{col} DIV 1000"))
    if dt == "timestamp_ntz":
        return F.col(col).cast("timestamp")
    return F.col(col)
