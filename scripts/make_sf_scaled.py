#!/usr/bin/env python3
"""Generate a scaled-up copy of a fixture SF directory for SCALING
PROBES (r10, verdict task 8): tile each scaling table N times with
per-copy key remapping so joins stay referentially intact, texts get a
per-copy suffix token (so exact/near-dup structure does not collapse
into degenerate 10x duplicate groups), and embeddings are rotated by
the copy index (norm-preserving decorrelation of LSH codes — identical
tiled vectors would funnel every copy into the same bucket, which is a
skew probe, not a scale probe).

NOT test input generation — correctness gates always read the driver's
fixtures; this exists only to measure how the benched plans scale
(PLANS.md "sf1 scaling evidence"). Writes to --out (default
/tmp/sf_scaled). region/nation are dimensions and copy through.

Usage: python scripts/make_sf_scaled.py [--src /root/testdata/sf0.1]
       [--out /tmp/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = 10_000_000  # > every sf0.1 key; per-copy stride for every id space

# per-table key columns remapped with copy*OFF
KEYMAP = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ("region", "nation")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--out", default="/tmp/sf_scaled")
    p.add_argument("--copies", type=int, default=10)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from datafusion_server_spark import tables
    from datafusion_server_spark.session import build_spark

    spark = build_spark(app_name="make-sf-scaled", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for t in DIMS:
        tables.load(spark, args.src, t).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{t}.parquet")
        )
        print(f"{t}: copied", flush=True)

    for t, keys in KEYMAP.items():
        df = tables.load(spark, args.src, t)
        copies = []
        for i in range(args.copies):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * OFF))
            if t == "documents" and i > 0:
                c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" copytag{i}")))
            if t == "embeddings" and i > 0:
                # rotate the vector by i MOD dim (r11 ADVICE: a raw
                # shift of i >= dim made the slice length non-positive,
                # silently emitting empty/short vectors for large
                # --copies): norm-preserving, decorrelates hyperplane
                # signs between copies; a zero effective shift skips
                # the no-op rewrite
                d = "SIZE(embedding)"
                r = f"({i} % {d})"
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"IF({r} = 0, embedding,"
                        f" CONCAT(SLICE(embedding, {r} + 1, {d} - {r}),"
                        f" SLICE(embedding, 1, {r})))"
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        dest = os.path.join(args.out, f"{t}.parquet")
        out.repartition(32).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{t}: {n} rows", flush=True)
    spark.stop()

    # Flatten each Spark output DIRECTORY into the single-file layout
    # the fixtures use (DuckDB's read_parquet('<dir>') pattern and the
    # compare harness both expect one file per table); µs timestamps so
    # Spark re-reads without the fixture-specific nanos handling.
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    for t in list(DIMS) + list(KEYMAP):
        p = os.path.join(args.out, f"{t}.parquet")
        if not os.path.isdir(p):
            continue
        tbl = pads.dataset(p, format="parquet").to_table()
        tmp = os.path.join(args.out, f"{t}__flat.parquet")
        pq.write_table(
            tbl, tmp, row_group_size=1_000_000,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        shutil.rmtree(p)
        os.rename(tmp, p)
        print(f"{t}: flattened ({tbl.num_rows} rows)", flush=True)


if __name__ == "__main__":
    main()
