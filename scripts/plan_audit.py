#!/usr/bin/env python3
"""Full-registry physical-plan audit: flag every query whose plan
contains an UNBOUNDED ``Exchange SinglePartition`` (no row-bounding
node below it — the funnel-everything-to-one-task shape that kills a
100 TB run).

Round-7 baseline (local[8], sf0.001, all 271 non-streaming builders of
the 284-query registry): exactly THREE hits, each by-design and
allowlisted in tests/test_plan_scale.py::ALLOWED_GLOBAL_WINDOW_QUERIES:

- window_range_frame / window_distribution — SQL-surface queries whose
  SEMANTICS are an unpartitioned window (DataFusion-dialect parity
  rows; a user writing OVER (ORDER BY ...) gets what they asked for);
- text_pack_sequences — the corpus-global contiguous packer, documented
  bounded-input-only; the scale path is text_pack_sequences_sharded.

LIMIT OF THE HEURISTIC: a HashAggregate below the exchange counts as
row-bounding, which is only true when its GROUP BY key has FIXED
cardinality (bins / strata / partitions / sketch rows / a fixed
taxonomy). An aggregate keyed by a corpus-scaling entity (users,
distinct terms, term pairs, graph nodes) does NOT bound its output —
a global window over it is still a one-task funnel that this audit
CANNOT flag. Review any new aggregate-fed global window by hand: if
the key scales with the data, use scale.ranked_topk (top-k) or
scale.distributed_rank (full rank) and pin the query in
test_plan_scale.py::_REWRITTEN. The r7 sweep converted all seven known
corpus-scaling-key sites plus the full-rank coverage curve.

Run: python3 scripts/plan_audit.py [sf_dir]
Exits non-zero if any query OUTSIDE the allowlist is flagged.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main() -> int:
    from pyspark.sql import SparkSession

    from datafusion_server_spark.queries import registry
    from test_plan_scale import (
        ALLOWED_GLOBAL_WINDOW_QUERIES,
        _unbounded_single_partition_exchanges,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad: dict[str, list[str]] = {}
    for name, qd in registry().items():
        if name.startswith("streaming_"):
            continue  # streaming builders need sinks; audited separately
        try:
            hits = _unbounded_single_partition_exchanges(qd.build(spark, sf_dir))
        except Exception as e:  # build failure is its own signal
            hits = [f"BUILD ERROR: {e}"]
        if hits:
            bad[name] = hits
    unexpected = {n: h for n, h in bad.items() if n not in ALLOWED_GLOBAL_WINDOW_QUERIES}
    for n, h in sorted(bad.items()):
        tag = "ALLOWED" if n in ALLOWED_GLOBAL_WINDOW_QUERIES else "FLAGGED"
        print(f"{tag}: {n} :: {h[:1]}")
    print(f"{len(bad)} global-window queries ({len(unexpected)} outside allowlist)")
    return 1 if unexpected else 0


if __name__ == "__main__":
    raise SystemExit(main())
