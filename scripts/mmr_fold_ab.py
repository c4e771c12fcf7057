#!/usr/bin/env python3
"""r14 interleaved A/B (verdict task 5): MMR greedy selection — the r13
LOOP shape (k-1 sequential localCheckpoint jobs: per step an anti-join,
a broadcast max-sim penalty aggregation, an orderBy(1) pick, a union +
eager checkpoint) vs the in-row BOUNDED-STATE FOLD now in
``mmr_select`` (shortlist + sims fold into one row; all greedy steps
run as one AGGREGATE expression — ONE scheduled job). Identical rows
asserted first, then interleaved timing of the full
similarity_mmr_select pipeline under the bench session/layout.

Usage: python scripts/mmr_fold_ab.py [rounds]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def old_mmr(embeddings, query, k, shortlist, lam, vec_col, id_col):
    from datafusion_server_spark.operators import similarity as sim

    base = sim._vectors(sim.ensure_fanout_parallelism(embeddings), id_col, vec_col)
    q = sim._vectors(query, id_col, vec_col).select(
        F.col("id").alias("__qid"),
        F.col("v").alias("__qv"),
        F.sqrt(sim._unscale(sim._dot_scaled("v", "v"))).alias("__qnrm"),
    ).filter(F.col("__qnrm") > 0.0)
    cand = base.select(
        "id", "v", F.sqrt(sim._unscale(sim._dot_scaled("v", "v"))).alias("__nrm")
    ).filter(F.col("__nrm") > 0.0)
    rel = cand.join(F.broadcast(q), F.col("id") != F.col("__qid")).select(
        "id",
        "v",
        F.round(
            sim._unscale(sim._dot_scaled("v", "__qv"))
            / (F.col("__qnrm") * F.col("__nrm")),
            6,
        ).alias("rel"),
        "__nrm",
    )
    short = (
        rel.orderBy(F.desc("rel"), F.asc("id"))
        .limit(int(shortlist))
        .localCheckpoint(eager=True)
    )
    a = short.select(
        F.col("id").alias("a"), F.col("v").alias("__va"), F.col("__nrm").alias("__na")
    )
    b = short.select(
        F.col("id").alias("b"), F.col("v").alias("__vb"), F.col("__nrm").alias("__nb")
    )
    pairs = (
        a.join(b, F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.round(
                sim._unscale(sim._dot_scaled("__va", "__vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    short = short.select("id", "rel")
    sel = (
        short.orderBy(F.desc("rel"), F.asc("id"))
        .limit(1)
        .select("id", "rel", F.lit(1).cast("bigint").alias("pick_order"))
        .localCheckpoint(eager=True)
    )
    for step in range(2, int(k) + 1):
        remaining = short.join(sel.select("id"), "id", "left_anti")
        pen = (
            pairs.join(F.broadcast(sel.select(F.col("id").alias("b"))), "b")
            .groupBy("a")
            .agg(F.max("sim").alias("pen"))
        )
        pick = (
            remaining.join(pen, remaining["id"] == pen["a"])
            .select(
                "id",
                "rel",
                (F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("pen")).alias(
                    "__score"
                ),
            )
            .orderBy(F.desc("__score"), F.asc("id"))
            .limit(1)
            .select("id", "rel", F.lit(step).cast("bigint").alias("pick_order"))
        )
        sel = sel.unionByName(pick).localCheckpoint(eager=True)
    return sel.select(
        "pick_order", F.col("id").alias(id_col), F.col("rel").alias("relevance")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    import bench
    from datafusion_server_spark import tables
    from datafusion_server_spark.operators import similarity as sim

    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)
    print(f"load1m={os.getloadavg()[0]:.2f}")

    emb = tables.load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    args = dict(k=5, shortlist=20, lam=0.7, vec_col="embedding", id_col="vec_id")

    old_rows = sorted(map(tuple, old_mmr(emb, query, **args).collect()))
    new_rows = sorted(map(tuple, sim.mmr_select(emb, query, **args).collect()))
    assert old_rows == new_rows, f"disagree: {old_rows} vs {new_rows}"
    print(f"picks agree: {len(old_rows)} rows")

    forms = {"loop": lambda: old_mmr(emb, query, **args),
             "fold": lambda: sim.mmr_select(emb, query, **args)}
    times: dict[str, list[float]] = {n: [] for n in forms}
    for _ in range(rounds):
        for name, fn in forms.items():
            t0 = time.time()
            fn().toArrow()
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
