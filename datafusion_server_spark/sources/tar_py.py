"""Tar shard reader (WebDataset-style) — pure-stdlib, distributed via
``binaryFile`` + ONE Arrow-batched ``mapInPandas`` crossing.

Beyond-reference source format: large multimodal training corpora ship
as TAR SHARDS of per-sample member files — the WebDataset convention
(``{key}.jpg`` + ``{key}.txt`` + ``{key}.json`` stored consecutively,
thousands of samples per ~1 GB shard, millions of shards). The
reference's source family (SURVEY §2.A A1-A13) has no container format;
this is the image/text twin of the WARC reader (``warc_py.py``) and
follows its scale contract:

- ``binaryFile`` yields one row per SHARD — per-shard parallelism, the
  exact unit of work a dataloader uses;
- the tar parses in STREAMING mode (``tarfile`` ``r|*`` over the shard
  bytes — sequential member walk, no index pass, gzip/bz2/xz transparent);
- member rows leave the task as CHUNKED Arrow batches (every
  ``records_per_chunk`` members / ``bytes_per_chunk`` payload bytes);
- shard sizes pre-check against binaryFile's 2 GiB cap from listing
  metadata (no content read) with a clean error.

Sample grouping (``read_webdataset``) relies on the format's contract
that a sample's members are CONTIGUOUS in the shard: adjacent members
sharing a key (basename up to the first dot) fold into one row inside
the parse task — NO shuffle. A malformed shard that interleaves keys
yields multiple rows for that key (visible downstream), never silent
data loss.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator
from typing import Any

MEMBER_SCHEMA = (
    "shard string, member string, key string, suffix string, "
    "size bigint, payload binary"
)

# binaryFile materializes each shard as one JVM byte array — hard cap.
BINARYFILE_MAX_BYTES = (1 << 31) - 1

DEFAULT_RECORDS_PER_CHUNK = 2048
DEFAULT_BYTES_PER_CHUNK = 32 << 20


def split_key_suffix(name: str) -> tuple[str, str]:
    """WebDataset member naming: the sample key is the basename up to
    the FIRST dot; everything after it is the (possibly dotted) suffix —
    ``dir/000123.seg.png`` -> key ``dir/000123``, suffix ``seg.png``."""
    base, dot, suffix = name.partition(".")
    return (base, suffix) if dot else (name, "")


def iter_tar_members(
    data: bytes, shard: str = ""
) -> Iterator[dict[str, Any]]:
    """Yield one dict per REGULAR member file of an (optionally
    compressed) tar shard, in archive order. Streaming mode: the member
    walk is sequential and holds one member's payload at a time."""
    with tarfile.open(fileobj=io.BytesIO(data), mode="r|*") as tf:
        for m in tf:
            if not m.isfile():
                continue
            f = tf.extractfile(m)
            payload = f.read() if f is not None else b""
            key, suffix = split_key_suffix(m.name)
            yield {
                "shard": shard,
                "member": m.name,
                "key": key,
                "suffix": suffix,
                "size": len(payload),
                "payload": payload,
            }


def _chunked(
    rows: Iterator[dict[str, Any]], records_per_chunk: int, bytes_per_chunk: int
) -> Iterator[list[dict[str, Any]]]:
    out: list[dict[str, Any]] = []
    nbytes = 0
    for r in rows:
        out.append(r)
        nbytes += r["size"] if "size" in r else 0
        if len(out) >= records_per_chunk or nbytes >= bytes_per_chunk:
            yield out
            out, nbytes = [], 0
    if out:
        yield out


def _check_sizes(files, what: str) -> None:
    from pyspark.sql import functions as F

    over = (
        files.filter(F.col("length") > BINARYFILE_MAX_BYTES)
        .select("path", "length")
        .limit(1)
        .collect()
    )
    if over:
        raise ValueError(
            f"{what} exceeds binaryFile's 2 GiB cap: {over[0]['path']} "
            f"({over[0]['length']} bytes) — split the shard upstream"
        )


def read_tar(
    spark,
    path: str,
    *,
    suffixes: tuple[str, ...] | None = None,
    records_per_chunk: int = DEFAULT_RECORDS_PER_CHUNK,
    bytes_per_chunk: int = DEFAULT_BYTES_PER_CHUNK,
    check_sizes: bool = True,
):
    """Distributed tar-member scan: one output row per member file.
    ``suffixes`` pre-filters inside the parse task (unwanted members
    never reach the exchange)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    if check_sizes:
        _check_sizes(files, "tar shard")
    files = files.select("path", "content")
    cols = [f.split(" ")[0] for f in MEMBER_SCHEMA.split(", ")]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                rows = iter_tar_members(bytes(content), p)
                if suffixes is not None:
                    rows = (r for r in rows if r["suffix"] in suffixes)
                for chunk in _chunked(rows, records_per_chunk, bytes_per_chunk):
                    yield pd.DataFrame(chunk, columns=cols)

    return files.mapInPandas(parse, MEMBER_SCHEMA)


def read_webdataset(
    spark,
    path: str,
    suffixes: tuple[str, ...],
    *,
    records_per_chunk: int = DEFAULT_RECORDS_PER_CHUNK,
    bytes_per_chunk: int = DEFAULT_BYTES_PER_CHUNK,
    check_sizes: bool = True,
):
    """WebDataset sample scan: one row per SAMPLE with a binary column
    per requested suffix (absent members NULL), grouped from adjacent
    same-key members inside the parse task — no shuffle, per the
    format's contiguity contract. Output schema:
    (shard, key, n_members, <suffix columns as binary>)."""
    import pandas as pd

    safe = {s: "c_" + "".join(ch if ch.isalnum() else "_" for ch in s) for s in suffixes}
    schema = "shard string, key string, n_members bigint, " + ", ".join(
        f"{safe[s]} binary" for s in suffixes
    )
    cols = ["shard", "key", "n_members", *[safe[s] for s in suffixes]]

    files = spark.read.format("binaryFile").load(path)
    if check_sizes:
        _check_sizes(files, "webdataset shard")
    files = files.select("path", "content")

    def group_samples(members: Iterator[dict[str, Any]]) -> Iterator[dict[str, Any]]:
        cur_key: str | None = None
        cur: dict[str, Any] = {}
        size = 0

        def flush():
            row = {
                "shard": cur.get("shard"),
                "key": cur_key,
                "n_members": cur.get("n_members", 0),
                "size": size,  # consumed by _chunked only
            }
            for s in suffixes:
                row[safe[s]] = cur.get(safe[s])
            return row

        for m in members:
            if m["key"] != cur_key:
                if cur_key is not None:
                    yield flush()
                cur_key, cur, size = m["key"], {"shard": m["shard"], "n_members": 0}, 0
            cur["n_members"] = cur.get("n_members", 0) + 1
            if m["suffix"] in safe:
                cur[safe[m["suffix"]]] = m["payload"]
                size += m["size"]
        if cur_key is not None:
            yield flush()

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                rows = group_samples(iter_tar_members(bytes(content), p))
                for chunk in _chunked(rows, records_per_chunk, bytes_per_chunk):
                    yield pd.DataFrame(
                        [{c: r.get(c) for c in cols} for r in chunk], columns=cols
                    )

    return files.mapInPandas(parse, schema)
