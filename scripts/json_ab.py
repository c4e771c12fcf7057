#!/usr/bin/env python3
"""r13 (verdict task 5): interleaved A/B of JSON single-path extraction
forms for the ``json_extraction`` row (~2.5x vs the DuckDB proxy at sf1
in r12). Same output contract for all forms: (event_id, k_value BIGINT)
with NULL on malformed payloads / missing keys / non-numeric values.

Forms:
  variant   — current production: CAST(TRY_VARIANT_GET(
              TRY_PARSE_JSON(props), '$.k', 'bigint') AS BIGINT)
              (parse once to VARIANT, typed get)
  from_json — FROM_JSON(props, 'k BIGINT').k: Jackson with an explicit
              schema, codegen row emit (PERMISSIVE => null field on
              malformed/mistyped)
  get_json  — CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT): Jackson
              streaming single-path string extraction + TRY-free cast
              (CAST returns NULL on non-numeric strings in ANSI-off...
              see the value-agreement check, which would catch any
              divergence on the fixture)

Also times the DuckDB oracle (JSON_EXTRACT_STRING) best-of-N on the
same box for the cross-engine ratio denominator.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 python scripts/json_ab.py [rounds]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORMS = {
    "variant": (
        "SELECT event_id, CAST(TRY_VARIANT_GET(TRY_PARSE_JSON(props), "
        "'$.k', 'bigint') AS BIGINT) AS k_value FROM events"
    ),
    "from_json": (
        "SELECT event_id, FROM_JSON(props, 'k BIGINT').k AS k_value "
        "FROM events"
    ),
    "get_json": (
        "SELECT event_id, CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) "
        "AS k_value FROM events"
    ),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from datafusion_server_spark import tables
    from datafusion_server_spark.session import build_spark

    spark = build_spark(
        app_name="jsonab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tables.register_views(spark, sf_dir)
    print(f"load1m={os.getloadavg()[0]:.2f} sf_dir={sf_dir}")

    # value agreement: all forms must produce identical (id, k) multisets
    ref = None
    for name, sql in FORMS.items():
        rows = sorted(
            (r["event_id"], r["k_value"]) for r in spark.sql(sql).collect()
        )
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} disagrees with variant"
    print("forms agree:", len(ref), "rows")

    times: dict[str, list[float]] = {n: [] for n in FORMS}
    for _ in range(rounds):
        for name, sql in FORMS.items():  # interleaved
            t0 = time.time()
            spark.sql(sql).toArrow()
            times[name].append(time.time() - t0)
            gc.collect()
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f} med={sorted(ts)[len(ts) // 2]:.3f}"
            f" runs={[round(t, 3) for t in ts]}"
        )

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    dsql = (
        "SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) "
        "AS k_value FROM events"
    )
    dts = []
    for _ in range(rounds):
        t0 = time.time()
        con.execute(dsql).fetch_arrow_table()
        dts.append(time.time() - t0)
    print(f"duckdb: min={min(dts):.3f} runs={[round(t, 3) for t in dts]}")
    print(f"load1m_end={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
