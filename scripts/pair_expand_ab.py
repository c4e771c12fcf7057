#!/usr/bin/env python3
"""r14 interleaved A/B (ADVICE medium): capped LSH pair expansion —
r13's single-expression ``INLINE(FLATTEN(TRANSFORM(...)))`` (builds ALL
cap*(cap-1)/2 pair structs of a bucket as one in-memory array before
exploding: ~2.1e9 structs for a ceiling-capped bucket, an executor-OOM
risk the old self-join never had) vs the streaming two-stage
``POSEXPLODE`` + ``EXPLODE(SLICE(...))`` now in ``lsh_candidate_pairs``
(peak per-row buffer = one ids array + one slice, <= cap longs).
Identical rows asserted first, then interleaved timing of the FULL
dedup_lsh_pairs pipeline under the bench session/layout.

Usage: python scripts/pair_expand_ab.py [rounds]
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
    if shape == "stream":
        return dedup.lsh_candidate_pairs(docs, "text", "doc_id", 16, 4)
    # r13 flattened in-row shape reconstructed: same fused groupBy on the
    # cap window's key, but the pair expansion materializes the whole
    # triangle as one array before INLINE explodes it.
    sigs = dedup.lsh_signature_index(docs, "text", "doc_id", 16, 3, materialize=True)
    banded = dedup.lsh_bands(sigs, 4, 4)
    cap = dedup.auto_bucket_cap(estimate_row_count(docs, 256))
    capped = dedup.cap_bucket_members(banded, cap)
    pairs = (
        capped.groupBy("band", "bucket")
        .agg(F.expr("SORT_ARRAY(COLLECT_LIST(id)) AS ids"))
        .select(
            F.expr(
                "INLINE(FLATTEN(TRANSFORM(ids, (x, i) -> "
                "TRANSFORM(SLICE(ids, i + 2, SIZE(ids)), "
                "y -> STRUCT(x AS id_a, y AS id_b)))))"
            )
        )
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

    flat_rows = sorted(map(tuple, build(spark, sf_dir, "flat").collect()))
    stream_rows = sorted(map(tuple, build(spark, sf_dir, "stream").collect()))
    assert flat_rows == stream_rows, (
        f"shapes disagree: {len(flat_rows)} vs {len(stream_rows)} rows"
    )
    print(f"shapes agree: {len(flat_rows)} rows")

    times: dict[str, list[float]] = {"flat": [], "stream": []}
    for _ in range(rounds):
        for shape in ("flat", "stream"):
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
