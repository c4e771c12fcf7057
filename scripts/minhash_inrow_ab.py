#!/usr/bin/env python3
"""r13 A/B: MinHash signature index — exploded shingle aggregation (one
shuffle of n_docs x n_shingles rows into a 16-min + collect_set agg) vs
IN-ROW signature computation (MD5/CONV/min over the shingle ARRAY — a
pure map, no explode, no shuffle). Same md5 slices, same minima, same
60-bit hashed set; empty-shingle docs are filtered to match the
grouped form's absent-group semantics.

Usage: python scripts/minhash_inrow_ab.py [rounds]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_HASHES = 16
K = 3


def inrow_sigs(docs):
    from datafusion_server_spark.operators.dedup import _word_shingles_sql

    ws = _word_shingles_sql("`text`", K)
    mins = [
        f"ARRAY_MIN(ZIP_WITH(ha, hb, (x, y) -> (x + {i} * y) % 4294967296)) AS mh{i}"
        for i in range(NUM_HASHES)
    ]
    return (
        docs.selectExpr(f"doc_id AS id", f"{ws} AS ws")
        .where("SIZE(ws) > 0")
        .selectExpr("id", "TRANSFORM(ws, s -> MD5(s)) AS hx")
        .selectExpr(
            "id",
            "TRANSFORM(hx, h -> CAST(CONV(SUBSTRING(h, 1, 8), 16, 10) AS BIGINT)) AS ha",
            "TRANSFORM(hx, h -> CAST(CONV(SUBSTRING(h, 9, 8), 16, 10) AS BIGINT)) AS hb",
        )
        .selectExpr(
            "id",
            *mins,
            "SORT_ARRAY(ARRAY_DISTINCT(ZIP_WITH(ha, hb, (x, y) -> "
            "x * 268435456 + SHIFTRIGHT(y, 4)))) AS sh",
        )
    )


def exploded_sigs(docs):
    from datafusion_server_spark.operators import dedup

    return dedup.lsh_signature_index(
        docs, "text", "doc_id", NUM_HASHES, K, materialize=False
    ).drop("n_sh")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    import bench

    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)
    from datafusion_server_spark import tables

    docs = tables.load(spark, sf_dir, "documents")
    print(f"load1m={os.getloadavg()[0]:.2f}")

    a = sorted(map(repr, exploded_sigs(docs).collect()))
    b = sorted(map(repr, inrow_sigs(docs).collect()))
    assert a == b, "forms disagree; first diff: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), (len(a), len(b)))
    )
    print(f"forms agree: {len(a)} rows")

    times = {"exploded": [], "inrow": []}
    forms = {"exploded": exploded_sigs, "inrow": inrow_sigs}
    for _ in range(rounds):
        for name, fn in forms.items():
            t0 = time.time()
            fn(docs).localCheckpoint(eager=True)
            times[name].append(time.time() - t0)
            gc.collect()
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f} med={sorted(ts)[len(ts) // 2]:.3f}"
            f" runs={[round(t, 3) for t in ts]}"
        )
    print(f"load1m_end={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
