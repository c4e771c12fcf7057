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
reattached from each add-action's ``partitionValues``. Reader-feature
gates: fails clearly on protocol ``minReaderVersion`` > 2 or
deletion-vector tables rather than returning wrong rows.
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


def _apply(snap: Snapshot, action: dict) -> None:
    if "add" in action and action["add"]:
        add = action["add"]
        if add.get("deletionVector"):
            raise DeltaProtocolError(
                "table uses deletion vectors; install delta-spark to read it"
            )
        snap.files[add["path"]] = add
    elif "remove" in action and action["remove"]:
        snap.files.pop(action["remove"]["path"], None)
    elif "metaData" in action and action["metaData"]:
        snap.metadata = action["metaData"]
    elif "protocol" in action and action["protocol"]:
        snap.protocol = action["protocol"]
        if snap.protocol.get("minReaderVersion", 1) > 2:
            raise DeltaProtocolError(
                f"minReaderVersion {snap.protocol['minReaderVersion']} exceeds "
                "this reader's support (<=2); install delta-spark"
            )


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
    for path, add in snap.files.items():
        pv = add.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(table_path, path))
    parts = []
    # sort on a None-safe key (NULL partition values sort first)
    for key, paths in sorted(groups.items(), key=lambda kv: tuple((v is None, v) for v in kv[0])):
        df = spark.read.parquet(*paths)
        for col, val in zip(part_cols, key):
            lit = F.lit(val)
            if col in part_types:
                lit = lit.cast(part_types[col])
            df = df.withColumn(col, lit)
        parts.append(df)
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out
