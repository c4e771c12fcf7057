#!/usr/bin/env python3
"""r13 interleaved A/B: LSH candidate-pair generation — old capped
band SELF-JOIN (plans the cap window pipeline twice; broadcast side
cannot reuse the probe's exchange) vs the fused groupBy + in-row
ordered-pair expansion now in ``lsh_candidate_pairs``. Identical rows
asserted first, then interleaved timing of the FULL dedup_lsh_pairs
pipeline under the bench session/layout.

Usage: python scripts/lsh_pairgen_ab.py [rounds]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build(spark, sf_dir, shape: str):
    from datafusion_server_spark import tables
    from datafusion_server_spark.operators import dedup
    from datafusion_server_spark.operators.similarity import estimate_row_count

    docs = tables.load(spark, sf_dir, "documents")
    if shape == "new":
        return dedup.lsh_candidate_pairs(docs, "text", "doc_id", 16, 4)
    # OLD shape reconstructed: cap window -> band self-join -> distinct
    sigs = dedup.lsh_signature_index(docs, "text", "doc_id", 16, 3, materialize=True)
    banded = dedup.lsh_bands(sigs, 4, 4)
    cap = dedup.auto_bucket_cap(estimate_row_count(docs, 256))
    banded = dedup.cap_bucket_members(banded, cap)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, F.expr("a.band = b.band AND a.bucket = b.bucket AND a.id < b.id"))
        .select(F.expr("a.id AS id_a"), F.expr("b.id AS id_b"))
        .distinct()
    )
    sets_a = sigs.select(F.expr("id AS id_a"), F.expr("sh AS sh_a"), F.expr("n_sh AS n_a"))
    sets_b = sigs.select(F.expr("id AS id_b"), F.expr("sh AS sh_b"), F.expr("n_sh AS n_b"))
    return (
        pairs.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.expr("CAST(SIZE(ARRAY_INTERSECT(sh_a, sh_b)) AS BIGINT) AS n_common"),
            "n_a",
            "n_b",
            F.expr(
                "ROUND(CAST(SIZE(ARRAY_INTERSECT(sh_a, sh_b)) AS DOUBLE) / "
                "CAST(n_a + n_b - CAST(SIZE(ARRAY_INTERSECT(sh_a, sh_b)) AS BIGINT)"
                " AS DOUBLE), 6) AS jaccard"
            ),
        )
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    import bench

    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)
    print(f"load1m={os.getloadavg()[0]:.2f}")

    old_rows = sorted(map(tuple, build(spark, sf_dir, "old").collect()))
    new_rows = sorted(map(tuple, build(spark, sf_dir, "new").collect()))
    assert old_rows == new_rows, (
        f"shapes disagree: {len(old_rows)} vs {len(new_rows)} rows"
    )
    print(f"shapes agree: {len(old_rows)} rows")

    times: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(rounds):
        for shape in ("old", "new"):
            t0 = time.time()
            df = build(spark, sf_dir, shape)
            df.toArrow()
            times[shape].append(time.time() - t0)
            del df
            gc.collect()
    for shape, ts in times.items():
        print(
            f"{shape}: min={min(ts):.3f} med={sorted(ts)[len(ts) // 2]:.3f}"
            f" runs={[round(t, 3) for t in ts]}"
        )
    print(f"load1m_end={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
