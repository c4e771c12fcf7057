#!/usr/bin/env python3
"""Capture .explain("formatted") for registry queries under the EXACT
bench session + layout (bench.build_bench_session + bench.prepare), so
plan claims in OPTIMIZATION_r*.md are reproducible artifacts.

Usage: python scripts/capture_plans.py <outdir> <suffix> [name ...]
  outdir  e.g. plans/r13
  suffix  e.g. before | after
  names   registry rows; default = bench.HEADLINE
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    import bench

    names = sys.argv[3:] or list(bench.HEADLINE)
    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)

    from datafusion_server_spark.queries import registry

    reg = registry()
    for name in names:
        df = reg[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
