"""WARC (Web ARChive, ISO 28500) reader — pure-stdlib record parser,
distributed via Spark's ``binaryFile`` source plus ONE Arrow-batched
``mapInPandas`` crossing.

Beyond-reference source format: web-scale training corpora ship as WARC
(CommonCrawl's native layout — millions of ~1 GB ``.warc.gz`` files).
The reference's source family (SURVEY §2.A A1-A13) stops at
csv/json/avro/delta/jdbc/plugins; WARC is the container its Python
connector-plugin contract would be used for, implemented here natively.

Scale shape: ``binaryFile`` yields one row per FILE, so parallelism is
per-file — exactly the CommonCrawl unit of work — and each task parses
its file streaming-forward in one pass (content-length driven, no
regex over the payload). The single Python crossing is Arrow-batched;
records exit as columnar batches. Supports plain ``.warc`` and gzip
members (both per-record members, the CommonCrawl convention, and
whole-file gzip) via ``zlib`` with automatic member chaining.

Parsing is CONTENT-LENGTH driven per the spec (header block terminated
by CRLFCRLF, payload of exactly Content-Length bytes, two CRLFs between
records) — a payload containing the literal string ``WARC/1.0`` cannot
confuse it, which the unit tests pin.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from typing import Any

RECORD_SCHEMA = (
    "path string, record_offset bigint, warc_type string, record_id string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length bigint, payload binary"
)

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of one-or-more concatenated gzip members
    (the per-record-member CommonCrawl layout and whole-file gzip both
    land here)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc_bytes(data: bytes, path: str = "") -> Iterator[dict[str, Any]]:
    """Yield one dict per WARC record. ``record_offset`` is the byte
    offset of the record's version line within the (decompressed)
    stream — the provenance pointer crawl pipelines carry around."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        offset = pos
        eol = data.index(_CRLF, pos)
        version = data[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"{path}: expected WARC version line at offset {offset}")
        head_end = data.index(_CRLF + _CRLF, eol)
        headers: dict[str, str] = {}
        for line in data[eol + 2 : head_end].split(_CRLF):
            name, _, value = line.decode("latin-1").partition(":")
            headers[name.strip().lower()] = value.strip()
        length = int(headers["content-length"])
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError(
                f"{path}: truncated record at offset {offset} "
                f"(need {length} bytes, have {len(payload)})"
            )
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
        pos = body_start + length


def http_response_body(payload: bytes) -> bytes:
    """The entity body of an HTTP ``response`` record payload (the bytes
    after the HTTP header block); payloads without a header separator
    are returned whole."""
    sep = payload.find(_CRLF + _CRLF)
    return payload[sep + 4 :] if sep >= 0 else payload


def read_warc(spark, path: str, *, record_types: tuple[str, ...] | None = None):
    """Distributed WARC scan: ``binaryFile`` rows -> per-file parse ->
    columnar record batches. ``record_types`` pre-filters (e.g.
    ``("response",)``) inside the parse task so unwanted records never
    reach the exchange."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in RECORD_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), p):
                    if record_types is None or rec["warc_type"] in record_types:
                        rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, RECORD_SCHEMA)
