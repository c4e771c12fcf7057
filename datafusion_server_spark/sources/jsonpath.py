"""Minimal JSONPath evaluator for data-source extraction.

The reference applies a JSONPath (default ``$.*``) to a fetched JSON
document and turns each match into a row
(/root/reference/lib/src/data_source/with_jsonpath.rs:13-82). No JSONPath
library is available in this container, so this implements the subset the
reference's own examples exercise:

  $                    root
  $.*  /  $[*]         all children (object values / array elements)
  $.field              object key
  $.a.b[0].c           nested keys + array index
  $..field             recursive descent to a key
  $[1:3]               array slice

plus ``requireNormalize`` (with_jsonpath.rs: positional match -> column
names): when matches are arrays, re-shape to objects using the first
match's positions.
"""

from __future__ import annotations

import json
import re
from typing import Any

_TOKEN = re.compile(
    r"""
    \.\.(?P<rec>[A-Za-z_][\w\-]*)      # ..field
  | \.(?P<key>[A-Za-z_][\w\-]*)        # .field
  | \.\*                                # .*
  | \[(?P<idx>-?\d+)\]                  # [0]
  | \[(?P<slice>-?\d*:-?\d*)\]          # [1:3]
  | \[\*\]                              # [*]
  | \['(?P<qkey>[^']*)'\]               # ['key']
""",
    re.VERBOSE,
)


class JsonPathError(ValueError):
    pass


def _children(node: Any) -> list[Any]:
    if isinstance(node, dict):
        return list(node.values())
    if isinstance(node, list):
        return list(node)
    return []


def _descend(node: Any, key: str, out: list[Any]) -> None:
    if isinstance(node, dict):
        if key in node:
            out.append(node[key])
        for v in node.values():
            _descend(v, key, out)
    elif isinstance(node, list):
        for v in node:
            _descend(v, key, out)


def find(path: str, doc: Any) -> list[Any]:
    """Evaluate ``path`` against ``doc``; return the list of matches."""
    path = path.strip()
    if not path.startswith("$"):
        raise JsonPathError(f"JSONPath must start with '$': {path!r}")
    nodes: list[Any] = [doc]
    pos = 1
    while pos < len(path):
        m = _TOKEN.match(path, pos)
        if m is None:
            raise JsonPathError(f"unsupported JSONPath syntax at {path[pos:]!r}")
        pos = m.end()
        token = m.group(0)
        nxt: list[Any] = []
        if m.group("rec") is not None:
            for n in nodes:
                _descend(n, m.group("rec"), nxt)
        elif m.group("key") is not None or m.group("qkey") is not None:
            key = m.group("key") or m.group("qkey")
            for n in nodes:
                if isinstance(n, dict) and key in n:
                    nxt.append(n[key])
        elif token in (".*", "[*]"):
            for n in nodes:
                nxt.extend(_children(n))
        elif m.group("idx") is not None:
            i = int(m.group("idx"))
            for n in nodes:
                if isinstance(n, list) and -len(n) <= i < len(n):
                    nxt.append(n[i])
        elif m.group("slice") is not None:
            lo_s, hi_s = m.group("slice").split(":")
            lo = int(lo_s) if lo_s else None
            hi = int(hi_s) if hi_s else None
            for n in nodes:
                if isinstance(n, list):
                    nxt.extend(n[lo:hi])
        nodes = nxt
    return nodes


def extract_rows(text: str, path: str = "$.*", *, normalize: bool = False) -> list[dict]:
    """Reference A4 semantics: matches become rows. ``normalize`` converts
    positional (array) matches into objects keyed c0..cN so a schema can
    name them (with_jsonpath.rs requireNormalize)."""
    matches = find(path, json.loads(text))
    rows: list[dict] = []
    for mrow in matches:
        if isinstance(mrow, dict):
            rows.append(mrow)
        elif isinstance(mrow, list) and normalize:
            rows.append({f"c{i}": v for i, v in enumerate(mrow)})
        elif normalize:
            rows.append({"c0": mrow})
        else:
            rows.append({"value": mrow})
    return rows
