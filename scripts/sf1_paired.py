"""Paired same-box Spark vs DuckDB-proxy bench over the 16 headline
rows at an arbitrary SF directory (r11, verdict task 2: prove the 12
fixed-cost-dominated sf0.1 rows amortize at 10x data).

Interleaved by PASS (spark pass, duck pass, spark pass, ...) so ambient
load drift hits both engines equally; per-row best-of-N on each side.
Prints a markdown table + one JSON line.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 python scripts/sf1_paired.py [passes]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench
    from bench import HEADLINE
    from datafusion_server_spark.queries import registry
    from tests.harness import duck_connection

    # optional row subset (comma list) — the sf10 probe skips the
    # dedup rows whose fixture construction (every doc has ~copies-1
    # near-duplicates) makes the candidate-pair count scale with
    # copies², dominating the probe on both engines
    rows_env = os.environ.get("SF_PAIRED_ROWS")
    if rows_env:
        HEADLINE = [n for n in HEADLINE if n in set(rows_env.split(","))]

    # the bench session + the bench LAYOUT (untimed ingest): re-laid
    # multi-split parquet + bucketed orders/lineitem/events — without
    # it the scaled fixture's single ~125 MB file is 1-4 row groups,
    # capping the scan at 4 tasks and measuring file layout, not plans.
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)
    reg = registry()
    con = duck_connection(sf_dir)

    spark_best: dict[str, float] = {}
    duck_best: dict[str, float] = {}
    print(f"load at start: {os.getloadavg()[0]:.2f}", file=sys.stderr)
    # warm both engines once, untimed
    reg["q6_forecast_revenue"].build(spark, sf_dir).toArrow()
    con.execute(reg["q6_forecast_revenue"].oracle_for(sf_dir)).fetch_arrow_table()
    for p in range(passes):
        for name in HEADLINE:
            t0 = time.time()
            df = reg[name].build(spark, sf_dir)
            df.toArrow()
            dt = time.time() - t0
            spark_best[name] = round(min(spark_best.get(name, 1e9), dt), 3)
            del df
            gc.collect()
        for name in HEADLINE:
            sql = reg[name].oracle_for(sf_dir)
            t0 = time.time()
            con.execute(sql).fetch_arrow_table()
            dt = time.time() - t0
            duck_best[name] = round(min(duck_best.get(name, 1e9), dt), 3)
        print(f"pass {p + 1}/{passes} done; spark_total="
              f"{sum(spark_best.values()):.2f} duck_total="
              f"{sum(duck_best.values()):.2f} load={os.getloadavg()[0]:.1f}",
              file=sys.stderr)
    print(f"| query | spark s | duck s | ratio |")
    print(f"|---|---|---|---|")
    for name in HEADLINE:
        s, d = spark_best[name], duck_best[name]
        print(f"| {name} | {s} | {d} | {s / d if d else float('inf'):.2f}x |")
    st, dt_ = round(sum(spark_best.values()), 3), round(sum(duck_best.values()), 3)
    print(f"| **total** | {st} | {dt_} | {st / dt_:.2f}x |")
    print(json.dumps({
        "metric": "paired_headline", "sf_dir": sf_dir, "passes": passes,
        "spark_total": st, "duck_total": dt_,
        "ratio": round(st / dt_, 3),
        "spark": spark_best, "duck": duck_best,
        "load1m_end": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
