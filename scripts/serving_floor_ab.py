"""Serving-tier small-query-floor A/B (r11, verdict task 3).

Two measurements:

1. ``--tier``: fresh-subprocess serving-tier runs across
   ``spark.sql.shuffle.partitions`` x AQE configs. Fresh subprocess per
   config because ``SparkSession.newSession()`` (one per stateless
   request) initializes its SQLConf from the STATIC SparkConf — runtime
   ``spark.conf.set`` on the root does not propagate to server sessions,
   so an in-process sweep would silently measure the boot config every
   time.

2. ``--aqe-probe``: in ONE session, alternate AQE off/on per headline
   query and count Spark JOBS per run (job-group scoped) — decomposing
   the bench's "value_aqe_on is slower" anomaly into its mechanism:
   every exchange under AQE becomes a separate job boundary (plan
   re-optimization + a new scheduling round-trip), which at sf0.1's
   1-30 MB stages costs more than the re-planning can recover.

Usage:
    python scripts/serving_floor_ab.py --tier
    python scripts/serving_floor_ab.py --aqe-probe
    python scripts/serving_floor_ab.py --tier-one 64 on   (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _tier_one(shuffle: str, aqe: str) -> None:
    """One serving-tier measurement in THIS process (fresh JVM)."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"serving-ab-{shuffle}-{aqe}")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true" if aqe == "on" else "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    out = bench.concurrency_bench(spark, SF_DIR)
    print(json.dumps({"shuffle": shuffle, "aqe": aqe, "tier": out}))
    spark.stop()


def tier_sweep() -> None:
    configs = [("8", "off"), ("64", "off"), ("200", "off"),
               ("8", "on"), ("64", "on"), ("200", "on")]
    results = []
    # two passes, second in reverse order, to expose ambient drift
    for passes in (configs, list(reversed(configs))):
        for shuffle, aqe in passes:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tier-one",
                 shuffle, aqe],
                capture_output=True, text=True,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            if not line:
                print(f"FAILED {shuffle}/{aqe}: {p.stderr[-400:]}", file=sys.stderr)
                continue
            r = json.loads(line[-1])
            results.append(r)
            c8 = r["tier"].get("c8", {})
            c32 = r["tier"].get("c32", {})
            print(
                f"shuffle={shuffle:>3} aqe={aqe:<3} "
                f"c8 p50={c8.get('p50_s')} rps={c8.get('rps')}  "
                f"c32 p50={c32.get('p50_s')} rps={c32.get('rps')}  "
                f"load={os.getloadavg()[0]:.1f}",
                flush=True,
            )
    print(json.dumps(results))


def aqe_probe() -> None:
    from pyspark.sql import SparkSession

    import bench
    from datafusion_server_spark.queries import registry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("aqe-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = registry()
    names = ["q3_shipping_priority", "q5_local_supplier_volume",
             "agg_cube", "window_running_sum", "events_sessionize",
             "dedup_lsh_pairs"]
    print("query, aqe, min_s/median_s (4 interleaved runs), jobs_per_run")
    rows = []
    for name in names:
        acc = {"false": ([], []), "true": ([], [])}  # times, jobs
        for i in range(8):  # interleaved off/on, exactly like bench.py
            aqe = "false" if i % 2 == 0 else "true"
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            group = f"{name}-{aqe}-{i}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            df = reg[name].build(spark, SF_DIR)
            df.toArrow()
            acc[aqe][0].append(time.time() - t0)
            tracker = sc._jsc.sc().statusTracker()
            acc[aqe][1].append(len(tracker.getJobIdsForGroup(group)))
            sc.setJobGroup("", "")
        for aqe in ("false", "true"):
            times, jobs = acc[aqe]
            mn, med = round(min(times), 3), round(statistics.median(times), 3)
            rows.append((name, aqe, mn, med, jobs))
            print(f"{name}, aqe={aqe}, min={mn}s med={med}s, jobs={jobs}",
                  flush=True)
    print(json.dumps([{"query": n, "aqe": a, "min_s": mn, "median_s": m,
                       "jobs": j} for n, a, mn, m, j in rows]))
    spark.stop()


if __name__ == "__main__":
    if "--tier-one" in sys.argv:
        i = sys.argv.index("--tier-one")
        _tier_one(sys.argv[i + 1], sys.argv[i + 2])
    elif "--tier" in sys.argv:
        tier_sweep()
    elif "--aqe-probe" in sys.argv:
        aqe_probe()
    else:
        print(__doc__)
