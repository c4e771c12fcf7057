#!/usr/bin/env python3
"""Same-box DuckDB proxy over the 16 headline oracle queries at sf0.1.

Times each headline query's DuckDB ORACLE SQL (the independent
derivation of identical semantics) best-of-N in one connection with
the harness's spill+view setup — the denominator of the cross-engine
ratio the per-round bench is graded against. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from tests.harness import duck_connection  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("DUCK_PROXY_TRIALS", "5"))
    from datafusion_server_spark.queries import registry

    reg = registry()
    con = duck_connection(sf_dir)
    best: dict[str, float] = {}
    totals: list[float] = []
    for _ in range(trials):
        tot = 0.0
        for name in HEADLINE:
            sql = reg[name].oracle_for(sf_dir)
            t0 = time.time()
            con.execute(sql).fetch_arrow_table()
            dt = time.time() - t0
            tot += dt
            best[name] = round(min(best.get(name, 1e9), dt), 3)
        totals.append(round(tot, 3))
    print(
        json.dumps(
            {
                "metric": "duckdb_proxy_headline_total",
                "value": min(totals),
                "unit": "sec",
                "sf": sf_dir.rstrip("/").split("sf")[-1],
                "trials": totals,
                "best_per_query_sum": round(sum(best.values()), 3),
                "queries": best,
                "load1m_start": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
