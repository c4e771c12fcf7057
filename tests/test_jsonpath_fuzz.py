"""Differential fuzz of the JSONPath subset evaluator (sources/jsonpath.py).

The evaluator is a hand-written parser (A4 parity — the container has
no jsonpath library), so fuzz it against independent implementations:

- The shared subset (``.key`` / ``[idx]`` / object ``.*`` / array
  ``[*]`` chains) runs against DuckDB's ``json_extract``, which
  evaluates the same paths natively. Caveats probed first: DuckDB's
  ``.*`` matches only OBJECT children and ``[*]`` only ARRAY elements
  (canonical JSONPath — and this evaluator — treats both as
  any-child), so the generator emits each wildcard only over the
  matching container type, where the dialects agree; a missing
  non-wildcard path is DuckDB ``NULL`` vs ``[]`` here.
- Recursive descent ``..key`` and slices ``[a:b]`` (which DuckDB's
  parser rejects) run against straightforward independent
  re-derivations written in this test.

Docs are seeded random nests of dicts/lists/scalars (no null leaves —
DuckDB cannot distinguish an extracted null from a missing path).
"""

from __future__ import annotations

import json
import random

import duckdb

from datafusion_server_spark.sources.jsonpath import find


def gen_doc(rng: random.Random, depth: int = 0):
    r = rng.random()
    if depth >= 3 or r < 0.25:
        return rng.choice(
            [rng.randint(-99, 99), f"s{rng.randint(0, 9)}", True, False, 2.5]
        )
    if r < 0.62:
        return {f"k{i}": gen_doc(rng, depth + 1) for i in range(rng.randint(1, 4))}
    return [gen_doc(rng, depth + 1) for _ in range(rng.randint(1, 4))]


def gen_shared_path(rng: random.Random, doc) -> str:
    """Walk the doc emitting steps both dialects evaluate identically.

    Tracks the FULL current match set, because the dialects genuinely
    diverge on a wildcard over mixed-type nodes: canonical JSONPath
    (this evaluator) treats ``.*``/``[*]`` as any-child, DuckDB matches
    ``.*`` only on objects and ``[*]`` only on arrays (found by this
    fuzzer's own first run on ``$[*].*``). Keyed/indexed steps agree
    everywhere (no-match on the wrong container type in both), so
    wildcards are emitted only when every current node is the matching
    container type."""
    parts, nodes = [], [doc]
    for _ in range(rng.randint(1, 5)):
        all_dicts = nodes and all(isinstance(n, dict) for n in nodes)
        all_lists = nodes and all(isinstance(n, list) for n in nodes)
        if all_dicts and rng.random() < 0.25:
            parts.append(".*")
            nodes = [v for n in nodes for v in n.values()]
        elif all_lists and rng.random() < 0.3:
            parts.append("[*]")
            nodes = [v for n in nodes for v in n]
        elif rng.random() < 0.5:
            keys = sorted({k for n in nodes if isinstance(n, dict) for k in n})
            if not keys:
                break
            k = rng.choice(keys)
            parts.append(f".{k}")
            nodes = [n[k] for n in nodes if isinstance(n, dict) and k in n]
        else:
            lens = [len(n) for n in nodes if isinstance(n, list) and n]
            if not lens:
                break
            i = rng.randrange(max(lens))
            parts.append(f"[{i}]")
            nodes = [n[i] for n in nodes if isinstance(n, list) and i < len(n)]
    if rng.random() < 0.15:  # sometimes a guaranteed-missing tail
        parts.append(".zz")
    return "$" + "".join(parts)


def test_shared_subset_matches_duckdb():
    rng = random.Random(0x15B)
    con = duckdb.connect()
    checked = wildcards = 0
    for _ in range(200):
        doc = gen_doc(rng)
        text = json.dumps(doc)
        path = gen_shared_path(rng, doc)
        got = find(path, doc)
        raw = con.execute(
            "SELECT json_extract(?::JSON, ?)", [text, path]
        ).fetchone()[0]
        if "*" in path:
            wildcards += 1
            want = [json.loads(x) for x in (raw or [])]
        else:
            want = [] if raw is None else [json.loads(raw)]
        assert got == want, f"path {path}\n doc {text}\n got {got}\n duck {want}"
        checked += 1
    assert checked == 200 and wildcards >= 40


def _descend_ref(node, key, out):
    """Independent recursive-descent collector (pre-order, parents
    before their own subtrees, document order)."""
    if isinstance(node, dict):
        if key in node:
            out.append(node[key])
        for v in node.values():
            _descend_ref(v, key, out)
    elif isinstance(node, list):
        for v in node:
            _descend_ref(v, key, out)


def test_recursive_descent_and_slices_vs_independent():
    rng = random.Random(0x51CE)
    for _ in range(120):
        doc = gen_doc(rng)
        # ..key for a key present somewhere (and sometimes absent)
        keys = set()

        def walk(n):
            if isinstance(n, dict):
                keys.update(n)
                for v in n.values():
                    walk(v)
            elif isinstance(n, list):
                for v in n:
                    walk(v)

        walk(doc)
        key = rng.choice(sorted(keys) + ["zz"]) if keys else "zz"
        want: list = []
        _descend_ref(doc, key, want)
        assert find(f"$..{key}", doc) == want
        # slices over a top-level list (wrap to guarantee one)
        arr = doc if isinstance(doc, list) else [doc, doc]
        a = rng.randint(-4, 4)
        b = rng.randint(-4, 4)
        cases = {f"$[{a}:{b}]": arr[a:b], f"$[{a}:]": arr[a:], f"$[:{b}]": arr[:b]}
        for p, w in cases.items():
            assert find(p, arr) == list(w), f"{p} on len {len(arr)}"
