#!/usr/bin/env python3
"""r13 A/B: LSH codes+norm table — exploded element aggregation (one
shuffle of n*dim element rows into a 16-sum hash agg) vs IN-ROW
hyperplane sums (TRANSFORM/AGGREGATE over the embedding array: a pure
map, no explode, no shuffle). Values must be bit-identical (integer
sums are order-independent; ROUND is sign-symmetric).

Usage: python scripts/codes_inrow_ab.py [rounds] [planes]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(1e12)


def inrow_codes(emb, planes: int, dim: int):
    from datafusion_server_spark.operators import similarity as sim

    sign_strs = [
        "".join("1" if s == 1 else "0" for s in sim.hyperplane_signs(p, dim))
        for p in range(planes)
    ]
    sums = [
        f"AGGREGATE(ZIP_WITH(embedding, SEQUENCE(1, {dim}), (x, i) -> "
        f"CAST(ROUND((CASE WHEN SUBSTRING('{sign_strs[p]}', i, 1) = '1' "
        f"THEN CAST(x AS DOUBLE) ELSE -CAST(x AS DOUBLE) END) * {SCALE}) AS BIGINT)), CAST(0 AS BIGINT), "
        f"(acc, t) -> acc + t) AS s{p}"
        for p in range(planes)
    ]
    nrm = (
        f"SQRT(CAST(AGGREGATE(TRANSFORM(embedding, x -> "
        f"CAST(ROUND((CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * {SCALE}) AS BIGINT)), CAST(0 AS BIGINT), "
        f"(acc, t) -> acc + t) AS DOUBLE) / {SCALE}) AS nrm"
    )
    bucket = (
        "CONCAT("
        + ", ".join(f"CASE WHEN s{p} > 0 THEN '1' ELSE '0' END" for p in range(planes))
        + ") AS bucket"
    )
    return emb.selectExpr("vec_id AS id", *sums, nrm).selectExpr("id", bucket, "nrm")


def exploded_codes(emb, planes: int, dim: int):
    from datafusion_server_spark.operators import similarity as sim

    el = sim._elements(emb, "vec_id", "embedding", "id")
    return sim._codes_norms(el, planes, dim)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    planes = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import bench

    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)
    from datafusion_server_spark import tables

    emb = tables.load(spark, sf_dir, "embeddings")
    dim = 64
    print(f"load1m={os.getloadavg()[0]:.2f} planes={planes}")

    a = sorted(map(tuple, exploded_codes(emb, planes, dim).collect()))
    b = sorted(map(tuple, inrow_codes(emb, planes, dim).collect()))
    assert a == b, f"disagree: {len(a)} vs {len(b)} rows, first diff: " + str(
        next(((x, y) for x, y in zip(a, b) if x != y), None)
    )
    print(f"forms agree: {len(a)} rows")

    times = {"exploded": [], "inrow": []}
    forms = {"exploded": exploded_codes, "inrow": inrow_codes}
    for _ in range(rounds):
        for name, fn in forms.items():
            t0 = time.time()
            fn(emb, planes, dim).localCheckpoint(eager=True)
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
