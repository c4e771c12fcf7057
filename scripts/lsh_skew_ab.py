#!/usr/bin/env python3
"""r13 (verdict task 3): measure the DEFAULT auto bucket cap on an
adversarial-skew corpus where it actually BINDS. The r12 sf10 table
only showed the non-binding case (copies=100 duplicates uniformly at
~100 members/bucket, far under the derived cap ~3800), so the default's
4000x-bound claim rested on a 1000-doc unit test. This probe rebuilds
the sf10 corpus with a DEGENERATE bucket — ``n_boiler`` documents
replaced by one identical boilerplate string (mass-duplicated
boilerplate that survived exact dedup is exactly the 100 TB failure
mode) — and A/Bs ``max_bucket_members="auto"`` against the uncapped
opt-out on pairs / wall / drops.

Usage: python scripts/lsh_skew_ab.py [n_boiler=12000] [rounds=3]
Needs /tmp/sf10 (scripts/make_sf_scaled.py --copies 100).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = (
    "this page uses cookies to improve your experience please accept our "
    "terms of service and privacy policy all rights reserved contact us "
    "for more information about our products and services thank you"
)


def main() -> None:
    n_boiler = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    src = os.environ.get("SPARK_GRAFT_SKEW_SRC", "/tmp/sf10")
    skew_dir = "/tmp/sf10_skew"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from pyspark.sql import functions as F

    from datafusion_server_spark import tables
    from datafusion_server_spark.operators import dedup
    from datafusion_server_spark.session import build_spark

    spark = build_spark(
        app_name="lsh-skew-ab", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_path = f"{skew_dir}/documents.parquet"
    if not os.path.exists(out_path):
        docs = tables.load(spark, src, "documents")
        n = docs.count()
        # every doc_id % (n // n_boiler) == 0 becomes THE boilerplate doc
        step = max(1, n // n_boiler)
        (
            docs.withColumn(
                "text",
                F.when(F.col("doc_id") % step == 0, F.lit(BOILER)).otherwise(
                    F.col("text")
                ),
            )
            .coalesce(8)
            .write.mode("overwrite")
            .parquet(out_path)
        )
        print(f"built {out_path}: {n} docs, ~{n // step} boilerplate")

    docs = tables.load(spark, skew_dir, "documents").localCheckpoint(eager=True)
    n = docs.count()
    est_cap = dedup.auto_bucket_cap(n)
    n_b = docs.filter(F.col("text") == BOILER).count()
    print(
        f"corpus {n} docs, boilerplate bucket {n_b} members, "
        f"auto cap {est_cap} (binds: {n_b > est_cap}), load1m "
        f"{os.getloadavg()[0]:.2f}"
    )

    from pyspark.sql import Observation

    results: dict[str, list] = {"auto": [], "uncapped": []}
    pairs_seen: dict[str, int] = {}
    drops: dict[str, int] = {}
    for i in range(rounds):
        for variant in ("auto", "uncapped"):  # interleaved
            obs = Observation(f"skew_ab_{variant}_{i}") if variant == "auto" else None
            t0 = time.time()
            pairs = dedup.lsh_candidate_pairs(
                docs,
                "text",
                "doc_id",
                max_bucket_members="auto" if variant == "auto" else None,
                bucket_cap_observation=obs,
            )
            n_pairs = pairs.count()
            wall = time.time() - t0
            results[variant].append(wall)
            pairs_seen[variant] = n_pairs
            if obs is not None:
                drops[variant] = obs.get["dropped"]
            print(
                f"  round {i} {variant}: {wall:.1f} s, {n_pairs} pairs"
                + (f", {obs.get['dropped']} drops" if obs else ""),
                flush=True,
            )
    for variant, ts in results.items():
        print(
            f"{variant}: min={min(ts):.1f} s, pairs={pairs_seen[variant]}"
            + (f", drops={drops.get(variant)}" if variant in drops else "")
        )
    print(f"load1m_end={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
