"""WARC reader tests: spec-shaped synthetic archives (plain, gzip
per-record members, whole-file gzip), content-length-driven robustness,
and the distributed binaryFile -> mapInPandas scan composed with the
HTML extraction chain."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from datafusion_server_spark.operators import htmltext
from datafusion_server_spark.sources import warc_py


def _record(
    rtype: str,
    payload: bytes,
    uri: str = "",
    rid: str = "<urn:uuid:1>",
    extra: dict | None = None,
) -> bytes:
    headers = {
        "WARC-Type": rtype,
        "WARC-Record-ID": rid,
        "WARC-Date": "2026-08-14T00:00:00Z",
        "Content-Length": str(len(payload)),
    }
    if uri:
        headers["WARC-Target-URI"] = uri
    headers.update(extra or {})
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in headers.items()
    )
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, ctype: bytes = b"text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )


def _archive() -> bytes:
    info = _record("warcinfo", b"software: test\r\n", rid="<urn:uuid:0>")
    req = _record(
        "request",
        b"GET /a HTTP/1.1\r\nHost: x.example\r\n\r\n",
        uri="https://x.example/a",
        rid="<urn:uuid:2>",
    )
    html_a = b"<html><body><p>Page A &amp; text</p></body></html>"
    resp_a = _record(
        "response",
        _http(html_a),
        uri="https://x.example/a",
        rid="<urn:uuid:3>",
        extra={"Content-Type": "application/http; msgtype=response"},
    )
    # payload that CONTAINS a fake record header: content-length-driven
    # parsing must not resynchronize inside it
    tricky = b"WARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a real record"
    resp_b = _record(
        "response",
        _http(b"<p>B</p>" + tricky),
        uri="https://x.example/b",
        rid="<urn:uuid:4>",
    )
    return info + req + resp_a + resp_b


def test_parse_plain_archive_offsets_and_payloads():
    data = _archive()
    recs = list(warc_py.parse_warc_bytes(data, "mem"))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response", "response"]
    assert recs[0]["record_offset"] == 0
    # every offset points at a version line
    for r in recs:
        assert data[r["record_offset"] :].startswith(b"WARC/1.0")
    assert recs[2]["target_uri"] == "https://x.example/a"
    body = warc_py.http_response_body(recs[2]["payload"])
    assert body == b"<html><body><p>Page A &amp; text</p></body></html>"
    # the tricky payload came through intact, not split
    assert b"WARC-Type: fake" in recs[3]["payload"]
    assert len(recs) == 4


def test_parse_gzip_member_and_whole_file_variants():
    plain = list(warc_py.parse_warc_bytes(_archive()))
    # CommonCrawl layout: one gzip member per record
    recs_bytes = [
        _record("warcinfo", b"software: test\r\n", rid="<urn:uuid:0>"),
        _record("request", b"GET /a HTTP/1.1\r\n\r\n", uri="https://x.example/a"),
    ]
    members = b"".join(gzip.compress(rb) for rb in recs_bytes)
    got = list(warc_py.parse_warc_bytes(members))
    assert [r["warc_type"] for r in got] == ["warcinfo", "request"]
    whole = gzip.compress(_archive())
    assert [r["warc_type"] for r in warc_py.parse_warc_bytes(whole)] == [
        r["warc_type"] for r in plain
    ]


def test_truncated_record_refused():
    data = _archive()[:-20]
    try:
        list(warc_py.parse_warc_bytes(data, "t"))
    except ValueError as e:
        assert "truncated" in str(e)
    else:  # pragma: no cover
        raise AssertionError("truncated archive must refuse")


def test_distributed_scan_and_html_composition(spark, tmp_path):
    """Two files (one plain, one gzipped) -> binaryFile scan ->
    response-only filter pushed into the parse task -> HTTP body ->
    the HTML extraction chain recovers the visible text."""
    (tmp_path / "a.warc").write_bytes(_archive())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_archive()))
    df = warc_py.read_warc(spark, str(tmp_path), record_types=("response",))
    assert df.count() == 4  # 2 responses per file
    texts = (
        df.withColumn(
            "html",
            F.udf(lambda p: warc_py.http_response_body(bytes(p)).decode("utf-8"))(
                F.col("payload")
            ),
        )
        .withColumn("clean", htmltext.html_text_col(F.col("html")))
        .filter(F.col("target_uri") == "https://x.example/a")
        .select("clean")
        .collect()
    )
    assert {r["clean"] for r in texts} == {"Page A & text"}


# --- property-based roundtrips (no Spark; pure parser) ---------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _payloads = st.binary(min_size=0, max_size=4096)
    _uris = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=0,
        max_size=80,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(_payloads, _uris), min_size=1, max_size=8))
    def test_roundtrip_arbitrary_payloads(recs):
        """Any payload bytes — including ones embedding WARC headers,
        CRLFs, or gzip magic — survive a synthesize->parse roundtrip
        with types, URIs, and offsets intact."""
        blob = b"".join(
            _record("response", payload, uri=uri, rid=f"<urn:uuid:{i}>")
            for i, (payload, uri) in enumerate(recs)
        )
        got = list(warc_py.parse_warc_bytes(blob, "fuzz"))
        assert len(got) == len(recs)
        for rec, (payload, uri) in zip(got, recs):
            assert rec["payload"] == payload
            assert rec["target_uri"] == uri
            assert rec["content_length"] == len(payload)
            assert blob[rec["record_offset"] :].startswith(b"WARC/1.0")

    @settings(max_examples=30, deadline=None)
    @given(st.lists(_payloads, min_size=1, max_size=5))
    def test_roundtrip_gzip_members(payloads):
        """Per-record gzip members parse identically to the plain
        concatenation."""
        import gzip as _gz

        raw = [
            _record("resource", p, rid=f"<urn:uuid:{i}>")
            for i, p in enumerate(payloads)
        ]
        plain = list(warc_py.parse_warc_bytes(b"".join(raw)))
        members = list(warc_py.parse_warc_bytes(b"".join(_gz.compress(r) for r in raw)))
        assert [(r["record_id"], r["payload"]) for r in plain] == [
            (r["record_id"], r["payload"]) for r in members
        ]

except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_streaming_parse_yields_bounded_chunks(tmp_path, spark):
    """A many-record file must leave the parse task as MULTIPLE bounded
    batches (records_per_chunk trips), with results identical to the
    unchunked read — the 100 TB per-task-memory contract."""
    recs = b"".join(
        _record(
            "response",
            _http(f"<html><body>doc {i}</body></html>".encode()),
            uri=f"https://x.example/{i}",
            rid=f"<urn:uuid:{i}>",
        )
        for i in range(23)
    )
    p = tmp_path / "many.warc.gz"
    p.write_bytes(gzip.compress(recs))
    # python-level: the chunker flushes every 5 records -> 5 batches
    chunks = list(
        warc_py._chunked_records(
            warc_py.parse_warc_bytes(p.read_bytes()), 5, 1 << 30
        )
    )
    assert [len(c) for c in chunks] == [5, 5, 5, 5, 3]
    # byte-budget flush path
    bychunks = list(
        warc_py._chunked_records(warc_py.parse_warc_bytes(p.read_bytes()), 10**9, 1)
    )
    assert all(len(c) == 1 for c in bychunks) and len(bychunks) == 23
    # spark-level: chunked read == default read, exact rows
    small = warc_py.read_warc(spark, str(p), records_per_chunk=5)
    default = warc_py.read_warc(spark, str(p))
    a = sorted(r["record_id"] for r in small.select("record_id").collect())
    b = sorted(r["record_id"] for r in default.select("record_id").collect())
    assert a == b and len(a) == 23


def test_incremental_decompress_windows_are_bounded():
    """Gzip members decompress in <= window-sized pieces; the
    concatenation is the whole stream."""
    raw = b"x" * (3 * 1024) + b"y" * (2 * 1024)
    data = gzip.compress(raw[:3072]) + gzip.compress(raw[3072:])
    pieces = list(warc_py._iter_decompressed(data, window=1024))
    assert len(pieces) >= 5
    assert all(len(p) <= 1024 for p in pieces)
    assert b"".join(pieces) == raw


def test_truncated_record_raises_with_offset(tmp_path):
    recs = _record("response", _http(b"<html>ok</html>"), uri="https://x/a")
    cut = recs[: len(recs) - 8]
    try:
        list(warc_py.parse_warc_bytes(cut, "f.warc"))
        raise AssertionError("expected truncation error")
    except ValueError as e:
        assert "truncated record" in str(e)


def test_oversized_file_raises_clean_error(tmp_path, spark):
    """binaryFile caps at 2 GiB; the size pre-check (metadata only — a
    sparse file costs no disk) must raise a clean error naming the
    file, not a mid-job array overflow."""
    import pytest

    big = tmp_path / "huge.warc"
    with open(big, "wb") as f:
        f.truncate((1 << 31) + 1024)
    with pytest.raises(ValueError, match="2 GiB cap.*huge.warc|huge.warc.*2 GiB"):
        warc_py.read_warc(spark, str(big))


def test_truncated_compressible_tail_drains_in_bounded_windows():
    """A TRUNCATED gzip member with a highly compressible tail must
    still honor the bounded-window contract: the drain path
    (decompress(b'', window) + window-sliced flush residue) yields only
    <= window-sized pieces, never one unbounded tail (the r6 form
    called flush() with no cap on this branch)."""
    import zlib

    raw = b"z" * (4 * 1024 * 1024)
    comp = zlib.compressobj(9, zlib.DEFLATED, 31)
    data = comp.compress(raw) + comp.flush()
    trunc = data[: len(data) - 12]  # cut CRC32+ISIZE (+4): truncated member
    pieces = list(warc_py._iter_decompressed(trunc, window=1024))
    assert all(len(p) <= 1024 for p in pieces)
    joined = b"".join(pieces)
    # everything zlib could decode is recovered, as a prefix of raw
    assert raw.startswith(joined)
    assert len(joined) >= len(raw) - 64 * 1024
