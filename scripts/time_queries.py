#!/usr/bin/env python3
"""Quick per-query timing harness for iterating on bench hot spots.

Usage: python scripts/time_queries.py q1 q2 ...  (names from the registry)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints cold + best-of-3 per query.
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from datafusion_server_spark.session import build_spark

    spark = build_spark(app_name="timeq", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_server_spark.queries import registry

    reg = registry()
    reg["q6_forecast_revenue"].build(spark, sf_dir).collect()

    for name in names:
        qd = reg[name]
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = qd.build(spark, sf_dir)
            df.toArrow()
            runs.append(time.time() - t0)
            del df
            gc.collect()
        print(f"{name}: cold={runs[0]:.3f} best={min(runs):.3f} runs={[round(r,3) for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
