"""Pure-Python Delta Lake table reader — the no-jar fallback for A9
(reference reads Delta via the deltalake crate,
lib/src/data_source/deltalake.rs:29-96, incl. ``version`` time travel).

The primary path remains ``spark.read.format("delta")`` whenever
delta-spark is installed (distributed log replay, data skipping, DML).
This module implements just the READ protocol from the public Delta
transaction-log spec (PROTOCOL.md): a table is a directory of parquet
data files plus ``_delta_log/``, where

- ``{version:020d}.json`` holds newline-delimited action objects
  (``add`` / ``remove`` / ``metaData`` / ``protocol`` / ``commitInfo``);
- ``{version:020d}.checkpoint.parquet`` (pointed at by
  ``_last_checkpoint``) holds the same actions columnar;
- the active file set at version V = replay actions 0..V, where ``add``
  inserts a path and ``remove`` tombstones it (last action per path
  wins).

The snapshot's files then load through the ordinary distributed parquet
scan; partition columns (absent from the data files per the spec) are
reattached from each add-action's ``partitionValues``.

Deletion vectors (protocol reader feature ``deletionVectors``,
PROTOCOL.md "Deletion Vectors" + "Deletion Vector Format") ARE applied:
the descriptor's bitmap (a 64-bit RoaringBitmapArray in the "portable"
serialization, reached via z85-encoded UUID file path, inline z85
payload, or absolute path) decodes with pure stdlib, and the masked scan
filters the file's deleted row positions via Spark's
``_metadata.row_index`` hidden column with a broadcast anti-join — the
mask itself stays distributed. Reference applies the same mask through
the deltalake crate (lib/src/data_source/deltalake.rs:87-91).

Reader-feature gates remain: ``minReaderVersion`` 3 is accepted only
when every listed readerFeature is supported here (deletionVectors,
timestampNtz); anything else fails clearly rather than returning wrong
rows.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
# single-file AND multi-part ({v}.checkpoint.{part}.{num_parts}.parquet)
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint(?:\.(\d+)\.(\d+))?\.parquet$")


class DeltaProtocolError(ValueError):
    pass


@dataclass
class Snapshot:
    version: int
    files: dict[str, dict] = field(default_factory=dict)  # path -> add action
    metadata: dict | None = None
    protocol: dict | None = None


# reader features this module actually implements (PROTOCOL.md "Reader
# Features"); a protocol v3 table listing anything else is refused
_SUPPORTED_READER_FEATURES = {"deletionVectors", "timestampNtz"}


def _apply(snap: Snapshot, action: dict) -> None:
    if "add" in action and action["add"]:
        add = action["add"]
        snap.files[add["path"]] = add
    elif "remove" in action and action["remove"]:
        snap.files.pop(action["remove"]["path"], None)
    elif "metaData" in action and action["metaData"]:
        snap.metadata = action["metaData"]
    elif "protocol" in action and action["protocol"]:
        snap.protocol = action["protocol"]
        mrv = snap.protocol.get("minReaderVersion", 1)
        if mrv == 3:
            feats = set(snap.protocol.get("readerFeatures") or [])
            unsupported = feats - _SUPPORTED_READER_FEATURES
            if unsupported:
                raise DeltaProtocolError(
                    f"table requires reader features {sorted(unsupported)} "
                    "this reader does not implement; install delta-spark"
                )
        elif mrv > 3:
            raise DeltaProtocolError(
                f"minReaderVersion {mrv} exceeds this reader's support "
                "(<=3); install delta-spark"
            )


# -- deletion vectors ---------------------------------------------------------
#
# All formats here are from the public Delta PROTOCOL.md ("Deletion
# Vector Descriptor Schema" / "Deletion Vector Format"):
# - descriptor: {storageType: u|i|p, pathOrInlineDv, offset?, sizeInBytes,
#   cardinality};
# - on-disk DV file: 1-byte format version (=1), then per DV at `offset`:
#   4-byte BE dataSize, dataSize bytes of bitmap, 4-byte BE CRC-32 of the
#   bitmap bytes;
# - bitmap: 64-bit RoaringBitmapArray, "portable" serialization — 4-byte
#   LE magic 1681511377, 8-byte LE bitmap count, then each 32-bit roaring
#   bitmap in the standard RoaringFormatSpec portable format, key order;
#   a deleted 64-bit row index splits into (high32 = which bitmap,
#   low32 = value in that bitmap);
# - "u" paths: pathOrInlineDv is an optional random prefix plus the
#   20-char z85 encoding of the DV file's UUID; the file lives at
#   <table>/<prefix>/deletion_vector_<uuid>.bin. "i" carries the bitmap
#   itself z85-encoded. "p" is an absolute path.

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}
_ROARING_ARRAY_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise DeltaProtocolError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise DeltaProtocolError(f"invalid z85 character {ch!r}") from None
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    chars = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        block = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            block.append(_Z85_ALPHABET[rem])
        chars += reversed(block)
    return "".join(chars)


def _read_roaring32(buf: bytes, pos: int) -> tuple[set[int], int]:
    """One 32-bit RoaringBitmap in the portable RoaringFormatSpec format
    starting at ``pos``; returns (values, next_pos)."""
    import struct

    (cookie,) = struct.unpack_from("<I", buf, pos)
    has_runs = (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN
    if has_runs:
        n_containers = (cookie >> 16) + 1
        pos += 4
        runflag_bytes = (n_containers + 7) // 8
        run_flags = buf[pos : pos + runflag_bytes]
        pos += runflag_bytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<I", buf, pos + 4)
        run_flags = b""
        pos += 8
    else:
        raise DeltaProtocolError(f"unknown roaring cookie {cookie}")
    keys_cards = [
        struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n_containers)
    ]
    pos += 4 * n_containers
    if not has_runs or n_containers >= 4:
        pos += 4 * n_containers  # offset header (recomputed by walking)
    values: set[int] = set()
    for idx, (key, card_m1) in enumerate(keys_cards):
        card = card_m1 + 1
        base = key << 16
        is_run = bool(run_flags[idx // 8] & (1 << (idx % 8))) if run_flags else False
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.update(base + v for v in range(start, start + length + 1))
        elif card <= 4096:  # array container
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.update(base + v for v in vals)
        else:  # bitmap container: 8 KiB bitset
            for word_i in range(1024):
                (word,) = struct.unpack_from("<Q", buf, pos + 8 * word_i)
                while word:
                    low = word & -word
                    values.add(base + 64 * word_i + low.bit_length() - 1)
                    word ^= low
            pos += 8192
    return values, pos


def decode_roaring_bitmap_array(data: bytes) -> set[int]:
    """Portable-format 64-bit RoaringBitmapArray -> set of row indexes."""
    import struct

    if len(data) < 12:
        raise DeltaProtocolError("deletion vector bitmap truncated")
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != _ROARING_ARRAY_MAGIC:
        raise DeltaProtocolError(
            f"bad RoaringBitmapArray magic {magic} (want {_ROARING_ARRAY_MAGIC})"
        )
    pos = 12
    out: set[int] = set()
    for high in range(n_bitmaps):
        vals, pos = _read_roaring32(data, pos)
        out.update((high << 32) | v for v in vals)
    return out


def encode_roaring_bitmap_array(indexes: list[int]) -> bytes:
    """Symmetric minimal encoder (array containers only) for fixtures."""
    import struct
    from collections import defaultdict

    by_high: dict[int, dict[int, list[int]]] = defaultdict(lambda: defaultdict(list))
    for ix in indexes:
        by_high[ix >> 32][(ix & 0xFFFFFFFF) >> 16].append(ix & 0xFFFF)
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<iq", _ROARING_ARRAY_MAGIC, n_bitmaps))
    for high in range(n_bitmaps):
        containers = by_high.get(high, {})
        keys = sorted(containers)
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
        for key in keys:
            out += struct.pack("<HH", key, len(containers[key]) - 1)
        # offset header: absolute positions of each container's data
        # within this 32-bit bitmap's serialization
        data_start = 8 + 4 * len(keys) + 4 * len(keys)
        off = data_start
        for key in keys:
            out += struct.pack("<I", off)
            off += 2 * len(containers[key])
        for key in keys:
            vals = sorted(containers[key])
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


def _dv_bitmap_bytes(table_path: str, dv: dict) -> bytes:
    """Descriptor -> raw RoaringBitmapArray bytes (all three storage
    types)."""
    import struct
    import uuid as uuid_mod
    import zlib

    storage = dv.get("storageType")
    pod = dv.get("pathOrInlineDv", "")
    if storage == "i":
        data = z85_decode(pod)[: dv["sizeInBytes"]]
        return data
    if storage == "u":
        prefix, enc = pod[:-20], pod[-20:]
        uid = uuid_mod.UUID(bytes=z85_decode(enc))
        parts = [table_path]
        if prefix:
            parts.append(prefix)
        path = os.path.join(*parts, f"deletion_vector_{uid}.bin")
    elif storage == "p":
        path = pod
    else:
        raise DeltaProtocolError(f"unknown DV storageType {storage!r}")
    with open(path, "rb") as fh:
        blob = fh.read()
    if not blob or blob[0] != 1:
        raise DeltaProtocolError(f"unsupported DV file format version in {path}")
    offset = dv.get("offset", 1)
    (size,) = struct.unpack_from(">I", blob, offset)
    data = blob[offset + 4 : offset + 4 + size]
    if len(data) != size:
        raise DeltaProtocolError(f"truncated deletion vector in {path}")
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise DeltaProtocolError(f"deletion vector CRC mismatch in {path}")
    return data


def dv_row_indexes(table_path: str, dv: dict) -> set[int]:
    """Descriptor -> deleted row positions, cardinality-checked."""
    idx = decode_roaring_bitmap_array(_dv_bitmap_bytes(table_path, dv))
    card = dv.get("cardinality")
    if card is not None and card != len(idx):
        raise DeltaProtocolError(
            f"deletion vector cardinality {card} != decoded {len(idx)}"
        )
    return idx


def _read_checkpoint(snap: Snapshot, path: str) -> None:
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    for row in table.to_pylist():
        _apply(snap, {k: v for k, v in row.items() if v is not None})


def read_snapshot(table_path: str, version: int | None = None) -> Snapshot:
    """Replay the transaction log to ``version`` (latest when None)."""
    log_dir = os.path.join(table_path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise DeltaProtocolError(f"not a delta table (no _delta_log): {table_path}")
    commits: dict[int, str] = {}
    checkpoints: dict[int, list[str]] = {}
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m:
            commits[int(m.group(1))] = os.path.join(log_dir, name)
        m = _CHECKPOINT_RE.match(name)
        if m:
            # (path, declared_num_parts) — num_parts is None for the
            # single-file form, else the {num_parts} filename field
            checkpoints.setdefault(int(m.group(1)), []).append(
                (os.path.join(log_dir, name), int(m.group(3)) if m.group(3) else None)
            )
    if not commits and not checkpoints:
        raise DeltaProtocolError(f"empty _delta_log in {table_path}")
    latest = max([*commits, *checkpoints])
    target = latest if version is None else int(version)
    if target > latest or (target not in commits and target not in checkpoints):
        raise DeltaProtocolError(
            f"version {target} does not exist (latest is {latest})"
        )
    snap = Snapshot(version=target)
    usable_cp = [v for v in checkpoints if v <= target]
    start = 0
    if usable_cp:
        cp = max(usable_cp)
        parts_found = sorted(checkpoints[cp])
        # multi-part checkpoints declare their part count in the filename
        # ({v}.checkpoint.{part}.{num_parts}.parquet); a missing part would
        # silently drop add actions — refuse, same stance as commit gaps
        declared = {n for _, n in parts_found if n is not None}
        if declared:
            if len(declared) > 1:
                raise DeltaProtocolError(
                    f"checkpoint v{cp} mixes part counts {sorted(declared)}"
                )
            num_parts = declared.pop()
            n_multi = sum(1 for _, n in parts_found if n is not None)
            if n_multi != num_parts:
                raise DeltaProtocolError(
                    f"checkpoint v{cp} declares {num_parts} parts but only "
                    f"{n_multi} are present — snapshot would miss actions"
                )
        for part, _ in parts_found:
            _read_checkpoint(snap, part)
        start = cp + 1
    for v in range(start, target + 1):
        path = commits.get(v)
        if path is None:
            if v in checkpoints:
                continue  # checkpoint-only version (commit retention-cleaned)
            # a GAP in the commit sequence means the snapshot would
            # silently miss actions — refuse rather than return wrong rows
            raise DeltaProtocolError(
                f"commit {v:020d}.json missing from _delta_log (log "
                f"retention removed it and no checkpoint covers it)"
            )
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    _apply(snap, json.loads(line))
    return snap


def read_delta(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Snapshot -> DataFrame: the active files load through the normal
    distributed parquet scan (pushdown/pruning intact); partition columns
    are reattached from the log's partitionValues, grouped so one
    spark.read covers each partition tuple (bounded by the number of
    DISTINCT partition values, not files)."""
    snap = read_snapshot(table_path, version)
    if not snap.files:
        # empty snapshot: derive schema from metadata when present
        if snap.metadata and snap.metadata.get("schemaString"):
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(snap.metadata["schemaString"]))
            return spark.createDataFrame([], schema)
        raise DeltaProtocolError(f"snapshot v{snap.version} has no files")
    part_cols = (snap.metadata or {}).get("partitionColumns") or []
    # partition-column TYPES from the log's schemaString (partitionValues
    # are stored as strings; the delta-spark path surfaces typed columns)
    part_types: dict[str, object] = {}
    if part_cols and snap.metadata and snap.metadata.get("schemaString"):
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(snap.metadata["schemaString"]))
        part_types = {f.name: f.dataType for f in schema.fields if f.name in part_cols}
    groups: dict[tuple, list[str]] = {}
    dv_files: list[tuple[tuple, str, dict]] = []
    for path, add in snap.files.items():
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        dv = add.get("deletionVector")
        if dv:
            dv_files.append((key, os.path.join(table_path, path), dv))
        else:
            groups.setdefault(key, []).append(os.path.join(table_path, path))

    def attach_parts(df: DataFrame, key: tuple) -> DataFrame:
        for col, val in zip(part_cols, key):
            lit = F.lit(val)
            if col in part_types:
                lit = lit.cast(part_types[col])
            df = df.withColumn(col, lit)
        return df

    parts = []
    # sort on a None-safe key (NULL partition values sort first)
    for key, paths in sorted(groups.items(), key=lambda kv: tuple((v is None, v) for v in kv[0])):
        parts.append(attach_parts(spark.read.parquet(*paths), key))
    # DV-carrying files scan individually: deleted ROW POSITIONS filter
    # against Spark's _metadata.row_index via a broadcast anti-join, so
    # the mask applies inside the distributed scan (no driver
    # materialization of data rows). The positions themselves pass
    # through the driver — bounded by the DV's sizeInBytes; the fallback
    # reader is driver-side log replay by construction, delta-spark
    # remains the scale path.
    for key, path, dv in sorted(dv_files, key=lambda t: t[1]):
        deleted = dv_row_indexes(table_path, dv)
        df = spark.read.parquet(path).select(
            "*", F.col("_metadata.row_index").alias("__dv_row_index")
        )
        pos = spark.createDataFrame(
            [(int(p),) for p in sorted(deleted)], "__dv_pos bigint"
        )
        df = (
            df.join(
                F.broadcast(pos),
                F.col("__dv_row_index") == F.col("__dv_pos"),
                "left_anti",
            ).drop("__dv_row_index")
        )
        parts.append(attach_parts(df, key))
    if not parts:
        raise DeltaProtocolError(f"snapshot v{snap.version} has no files")
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out
