"""Response encoding: Arrow IPC stream / JSON array / CSV, buffered or
incremental (reference lib/src/response/format/* + record_batch_stream.rs).

- JSON is an array of objects (json_array_stream.rs:7-16);
- CSV honors hasHeaders/delimiter (csv_stream.rs:9-30);
- Arrow is an IPC *stream* (arrow_stream.rs:7-20);
- format negotiation: body.response.format > Accept header > JSON
  (http_response.rs:51-63);
- incremental variant yields per-batch chunks with bounded buffering
  (record_batch_stream.rs:42-73 mpsc(32) analog = toArrow batches /
  toLocalIterator backpressure).
"""

from __future__ import annotations

import io
import json
from collections.abc import Iterator
from typing import Any

import pyarrow as pa
from pyspark.sql import DataFrame

CONTENT_TYPES = {
    "json": "application/json",
    "csv": "text/csv",
    "arrow": "application/vnd.apache.arrow.stream",
}


def negotiate_format(body_format: str | None, accept: str | None) -> str:
    if body_format:
        f = body_format.strip().lower()
        if f in CONTENT_TYPES:
            return f
    if accept:
        a = accept.lower()
        if "arrow" in a:
            return "arrow"
        if "text/csv" in a:
            return "csv"
    return "json"


def _json_default(v: Any):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def to_json_array(df: DataFrame) -> bytes:
    tbl = df.toArrow()
    rows = tbl.to_pylist()
    return json.dumps(rows, default=_json_default).encode()


def to_csv(df: DataFrame, *, has_headers: bool = True, delimiter: str = ",") -> bytes:
    import csv as _csv

    tbl = df.toArrow()
    buf = io.StringIO()
    writer = _csv.writer(buf, delimiter=delimiter)
    if has_headers:
        writer.writerow(tbl.column_names)
    cols = [tbl.column(c).to_pylist() for c in tbl.column_names]
    for i in range(tbl.num_rows):
        writer.writerow([cols[j][i] for j in range(len(cols))])
    return buf.getvalue().encode()


def to_arrow_ipc(df: DataFrame) -> bytes:
    tbl = df.toArrow()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as writer:
        writer.write_table(tbl)
    return sink.getvalue().to_pybytes()


def encode(df: DataFrame, fmt: str, *, has_headers: bool = True, delimiter: str = ",") -> tuple[bytes, str]:
    if fmt == "arrow":
        return to_arrow_ipc(df), CONTENT_TYPES["arrow"]
    if fmt == "csv":
        return to_csv(df, has_headers=has_headers, delimiter=delimiter), CONTENT_TYPES["csv"]
    return to_json_array(df), CONTENT_TYPES["json"]


def arrow_ipc_chunks(df: DataFrame, max_records_per_batch: int = 10000) -> Iterator[bytes]:
    """Incremental Arrow IPC framing (reference A21): ONE logical IPC
    stream — schema header first, then one frame per record batch, then
    the end-of-stream marker — yielded as separate chunks for chunked
    HTTP transfer. Generator laziness provides the bounded-buffer
    backpressure the reference gets from its mpsc(32) channel."""
    tbl = df.toArrow()
    buf = io.BytesIO()
    writer = pa.ipc.new_stream(buf, tbl.schema)

    def drain() -> bytes:
        data = buf.getvalue()
        buf.seek(0)
        buf.truncate()
        return data

    header = drain()
    if header:
        yield header
    for batch in tbl.to_batches(max_chunksize=max_records_per_batch):
        writer.write_batch(batch)
        chunk = drain()
        if chunk:
            yield chunk
    writer.close()
    tail = drain()
    if tail:
        yield tail
