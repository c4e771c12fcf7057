#!/usr/bin/env python3
"""r14 interleaved A/B (verdict task 2): codes-table staging — plain
``localCheckpoint`` (the r13 in-row build: checkpoint keeps
UnknownPartitioning, so the probe's per-query aggregation/window pays
its own exchanges) vs ``repartition("id").localCheckpoint`` (restores
the hashpartitioning(id) the r12 grouped build left behind; the
candidate path reuses it with ZERO exchanges). Both ANN headline rows
timed end-to-end under the bench session/layout; identical rows
asserted first.

Usage: python scripts/ann_stage_ab.py [rounds]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    import bench
    from datafusion_server_spark.operators import similarity as sim

    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)
    from datafusion_server_spark.queries.similarity import (
        ann_lsh_cosine,
        ann_lsh_scaled,
    )

    print(f"load1m={os.getloadavg()[0]:.2f}")

    hashid_stage = sim._stage_codes
    plain_stage = lambda cn: cn.localCheckpoint(eager=True)  # noqa: E731
    stages = {"plain": plain_stage, "hashid": hashid_stage}
    queries = {"ann_lsh_cosine": ann_lsh_cosine, "ann_lsh_scaled": ann_lsh_scaled}

    # correctness: staging partitioning must not change a single row
    for qname, qfn in queries.items():
        rows = {}
        for sname, stg in stages.items():
            sim._stage_codes = stg
            rows[sname] = sorted(map(tuple, qfn.build(spark, sf_dir).collect()))
        assert rows["plain"] == rows["hashid"], f"{qname}: rows disagree"
        print(f"{qname}: rows agree ({len(rows['plain'])})")

    times: dict[str, list[float]] = {
        f"{q}/{s}": [] for q in queries for s in stages
    }
    for _ in range(rounds):
        for qname, qfn in queries.items():
            for sname, stg in stages.items():
                sim._stage_codes = stg
                t0 = time.time()
                df = qfn.build(spark, sf_dir)
                df.toArrow()
                times[f"{qname}/{sname}"].append(time.time() - t0)
                del df
                gc.collect()
    sim._stage_codes = hashid_stage
    for key, ts in times.items():
        print(
            f"{key}: min={min(ts):.3f} med={sorted(ts)[len(ts) // 2]:.3f}"
            f" runs={[round(t, 3) for t in ts]}"
        )
    print(f"load1m_end={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
