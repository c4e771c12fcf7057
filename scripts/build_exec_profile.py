#!/usr/bin/env python3
"""Split per-query wall time into BUILD (qd.build — py4j plan
construction, includes any eager localCheckpoint) and EXEC (toArrow)
under the exact bench session/layout. The r10 lesson: plan construction
can dominate; always split before optimizing execution.

Usage: python scripts/build_exec_profile.py [rounds] [name ...]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "dedup_lsh_pairs",
    "dedup_simhash",
    "knn_bruteforce_cosine",
    "ann_lsh_cosine",
    "ann_lsh_scaled",
    "text_quality_score",
]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or DEFAULT

    import bench

    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)
    from datafusion_server_spark.queries import registry

    reg = registry()
    print(f"load1m={os.getloadavg()[0]:.2f}")
    for name in names:
        builds, execs = [], []
        for _ in range(rounds):
            t0 = time.time()
            df = reg[name].build(spark, sf_dir)
            t1 = time.time()
            df.toArrow()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            del df
            gc.collect()
        print(
            f"{name}: build min={min(builds):.3f} {[round(b, 3) for b in builds]}"
            f" | exec min={min(execs):.3f} {[round(e, 3) for e in execs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
