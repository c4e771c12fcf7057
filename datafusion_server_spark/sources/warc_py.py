"""WARC (Web ARChive, ISO 28500) reader — pure-stdlib record parser,
distributed via Spark's ``binaryFile`` source plus ONE Arrow-batched
``mapInPandas`` crossing.

Beyond-reference source format: web-scale training corpora ship as WARC
(CommonCrawl's native layout — millions of ~1 GB ``.warc.gz`` files).
The reference's source family (SURVEY §2.A A1-A13) stops at
csv/json/avro/delta/jdbc/plugins; WARC is the container its Python
connector-plugin contract would be used for, implemented here natively.

Scale shape: ``binaryFile`` yields one row per FILE, so parallelism is
per-file — exactly the CommonCrawl unit of work. Per-task memory is
BOUNDED beyond the compressed file bytes ``binaryFile`` hands us:

- gzip members decompress INCREMENTALLY (``decompressobj`` with
  ``max_length`` windows, member chaining across the CommonCrawl
  per-record-member layout) — the ~4-5x-larger raw stream never exists
  as one object;
- the record parser walks a ROLLING buffer, discarding consumed bytes
  as it goes, so resident decompressed state is one record plus one
  window;
- records leave the task as CHUNKED Arrow batches (every
  ``records_per_chunk`` records or ``bytes_per_chunk`` payload bytes,
  whichever first) instead of one whole-file list/DataFrame.

``binaryFile`` itself caps files at 2 GiB (content is one JVM byte
array); ``read_warc`` pre-checks file sizes from the listing metadata
(a path/length-only scan — content untouched) and raises a clean
error naming the offending file instead of a mid-job array overflow.

Parsing is CONTENT-LENGTH driven per the spec (header block terminated
by CRLFCRLF, payload of exactly Content-Length bytes, two CRLFs between
records) — a payload containing the literal string ``WARC/1.0`` cannot
confuse it, which the unit tests pin.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable, Iterator
from typing import Any

RECORD_SCHEMA = (
    "path string, record_offset bigint, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length bigint, payload binary"
)

_CRLF = b"\r\n"

# binaryFile materializes each file as one JVM byte array — hard cap.
BINARYFILE_MAX_BYTES = (1 << 31) - 1

# chunked-yield defaults: flush a batch at 2k records or 32 MB payload
DEFAULT_RECORDS_PER_CHUNK = 2048
DEFAULT_BYTES_PER_CHUNK = 32 << 20

# incremental decompression window
_DECOMPRESS_WINDOW = 4 << 20


def _iter_decompressed(data: bytes, window: int = _DECOMPRESS_WINDOW) -> Iterator[bytes]:
    """Yield the decompressed stream of one-or-more concatenated gzip
    members in bounded ``window``-sized pieces (plain input passes
    through whole). The full raw stream is never materialized."""
    if data[:2] != b"\x1f\x8b":
        if data:
            yield data
        return
    d = zlib.decompressobj(wbits=31)
    pending: bytes = data
    while True:
        out = d.decompress(pending, window)
        if out:
            yield out
        if d.eof:
            pending = d.unused_data
            if not pending:
                return
            d = zlib.decompressobj(wbits=31)
        elif d.unconsumed_tail:
            pending = d.unconsumed_tail
        else:
            # input exhausted mid-member (truncated gzip). This branch
            # is also reached when output is still PENDING internally
            # (a highly compressible tail that hit the window cap with
            # all input consumed), so first drain in bounded windows —
            # decompress(b'', window) emits pending output without new
            # input. Then flush() the partial-block residue (only the
            # undecodable tail remains unprocessed at that point, so
            # its output is small) and re-yield it window-sliced, so
            # downstream never sees an unbounded piece. The parser
            # reports the truncation with an offset.
            while True:
                out = d.decompress(b"", window)
                if not out:
                    break
                yield out
            tail = d.flush()
            for i in range(0, len(tail), window):
                yield tail[i : i + window]
            return


def parse_warc_stream(
    chunks: Iterable[bytes], path: str = ""
) -> Iterator[dict[str, Any]]:
    """Yield one dict per WARC record from a stream of byte chunks,
    holding only a rolling buffer (consumed bytes are discarded).
    ``record_offset`` is the byte offset of the record's version line
    within the (decompressed) stream — the provenance pointer crawl
    pipelines carry around."""
    it = iter(chunks)
    buf = bytearray()
    base = 0  # absolute stream offset of buf[0]
    eof = False

    def fill() -> bool:
        nonlocal eof
        if eof:
            return False
        try:
            buf.extend(next(it))
            return True
        except StopIteration:
            eof = True
            return False

    def find(pat: bytes, start: int) -> int:
        while True:
            i = buf.find(pat, start)
            if i >= 0:
                return i
            start = max(start, len(buf) - len(pat) + 1)
            if not fill():
                return -1

    while True:
        # skip inter-record CRLFs (rolling: drop them from the buffer)
        while True:
            while len(buf) < 2 and fill():
                pass
            if buf[:2] == _CRLF:
                del buf[:2]
                base += 2
            else:
                break
        if not buf:
            if not fill():
                return
            continue
        offset = base
        eol = find(_CRLF, 0)
        if eol < 0:
            raise ValueError(f"{path}: expected WARC version line at offset {offset}")
        if not buf[:eol].startswith(b"WARC/"):
            raise ValueError(f"{path}: expected WARC version line at offset {offset}")
        head_end = find(_CRLF + _CRLF, eol)
        if head_end < 0:
            raise ValueError(f"{path}: truncated header block at offset {offset}")
        headers: dict[str, str] = {}
        for line in bytes(buf[eol + 2 : head_end]).split(_CRLF):
            name, _, value = line.decode("latin-1").partition(":")
            headers[name.strip().lower()] = value.strip()
        length = int(headers["content-length"])
        body_start = head_end + 4
        while len(buf) < body_start + length:
            if not fill():
                raise ValueError(
                    f"{path}: truncated record at offset {offset} "
                    f"(need {length} bytes, have {len(buf) - body_start})"
                )
        payload = bytes(buf[body_start : body_start + length])
        yield {
            "path": path,
            "record_offset": offset,
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "content_length": length,
            "payload": payload,
        }
        del buf[: body_start + length]
        base = offset + body_start + length


def parse_warc_bytes(data: bytes, path: str = "") -> Iterator[dict[str, Any]]:
    """Yield one dict per WARC record of an in-memory (optionally
    gzipped) WARC file — the whole-bytes convenience wrapper over the
    streaming parser."""
    return parse_warc_stream(_iter_decompressed(bytes(data)), path)


def _chunked_records(
    recs: Iterable[dict[str, Any]],
    records_per_chunk: int,
    bytes_per_chunk: int,
) -> Iterator[list[dict[str, Any]]]:
    """Group a record stream into bounded lists: flush every
    ``records_per_chunk`` records OR ``bytes_per_chunk`` payload bytes,
    whichever trips first."""
    rows: list[dict[str, Any]] = []
    nbytes = 0
    for rec in recs:
        rows.append(rec)
        nbytes += rec["content_length"]
        if len(rows) >= records_per_chunk or nbytes >= bytes_per_chunk:
            yield rows
            rows, nbytes = [], 0
    if rows:
        yield rows


def http_response_body(payload: bytes) -> bytes:
    """The entity body of an HTTP ``response`` record payload (the bytes
    after the HTTP header block); payloads without a header separator
    are returned whole."""
    sep = payload.find(_CRLF + _CRLF)
    return payload[sep + 4 :] if sep >= 0 else payload


def read_warc(
    spark,
    path: str,
    *,
    record_types: tuple[str, ...] | None = None,
    records_per_chunk: int = DEFAULT_RECORDS_PER_CHUNK,
    bytes_per_chunk: int = DEFAULT_BYTES_PER_CHUNK,
    check_sizes: bool = True,
):
    """Distributed WARC scan: ``binaryFile`` rows -> per-file streaming
    parse -> bounded columnar record batches. ``record_types``
    pre-filters (e.g. ``("response",)``) inside the parse task so
    unwanted records never reach the exchange; batches flush every
    ``records_per_chunk`` records / ``bytes_per_chunk`` payload bytes.

    ``check_sizes`` pre-scans the listing's path/length metadata (no
    content read) and raises on files beyond binaryFile's 2 GiB array
    cap — split oversized archives upstream (CommonCrawl segments are
    ~1 GB by convention)."""
    import pandas as pd
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(path)
    if check_sizes:
        over = (
            files.filter(F.col("length") > BINARYFILE_MAX_BYTES)
            .select("path", "length")
            .limit(1)
            .collect()
        )
        if over:
            raise ValueError(
                f"WARC file exceeds binaryFile's 2 GiB cap: {over[0]['path']} "
                f"({over[0]['length']} bytes) — split the archive upstream"
            )
    files = files.select("path", "content")

    cols = [f.split(" ")[0] for f in RECORD_SCHEMA.split(", ")]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                recs = parse_warc_stream(_iter_decompressed(bytes(content)), p)
                if record_types is not None:
                    recs = (r for r in recs if r["warc_type"] in record_types)
                for rows in _chunked_records(recs, records_per_chunk, bytes_per_chunk):
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, RECORD_SCHEMA)
