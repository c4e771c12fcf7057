#!/usr/bin/env python3
"""r14 interleaved A/B (verdict task 8): serving-tier warm session pool
— SPARK_GRAFT_SESSION_POOL=0 (r13 behavior: every stateless request
pays newSession + session conf + the dialect temp-function DDL) vs the
default bounded pool (recycled SparkSessions, setup paid once). Same
bench payload mix and 8/32-wide ThreadPool methodology as bench.py's
concurrency block; a fresh Engine + HTTP server per side per round,
interleaved.

Usage: python scripts/session_pool_ab.py [rounds]
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_block(spark, sf_dir: str, pool: int) -> dict:
    import requests

    from datafusion_server_spark.server.api import Engine
    from datafusion_server_spark.server.http import serve

    os.environ["SPARK_GRAFT_SESSION_POOL"] = str(pool)
    engine = Engine(spark, start_reaper=False)
    httpd = serve(engine, "127.0.0.1", 0)
    host, port = httpd.server_address[:2]
    base = f"http://{host}:{port}"
    payloads = [
        {
            "dataSources": [{"format": "parquet", "name": "n1",
                             "location": f"{sf_dir}/nation.parquet"}],
            "query": "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM n1",
            "response": {"format": "json"},
        },
        {
            "dataSources": [{"format": "parquet", "name": "r1",
                             "location": f"{sf_dir}/region.parquet"}],
            "query": "SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n FROM r1 "
                     "GROUP BY r_name ORDER BY r_name",
            "response": {"format": "json"},
        },
        {
            "dataSources": [
                {"format": "parquet", "name": "n2",
                 "location": f"{sf_dir}/nation.parquet"},
                {"format": "parquet", "name": "r2",
                 "location": f"{sf_dir}/region.parquet"},
            ],
            "query": "SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n FROM n2 n "
                     "JOIN r2 r ON r.r_regionkey = n.n_regionkey "
                     "GROUP BY r.r_name ORDER BY r.r_name",
            "response": {"format": "json"},
        },
    ]

    def one(i: int) -> float:
        t0 = time.time()
        r = requests.post(f"{base}/dataframe/query", json=payloads[i % len(payloads)])
        if r.status_code != 200:
            raise RuntimeError(f"request failed: {r.text[:200]}")
        return time.time() - t0

    out: dict = {}
    try:
        one(0)
        for conc in (8, 32):
            n_req = conc * 6
            t0 = time.time()
            with ThreadPoolExecutor(max_workers=conc) as ex:
                lat = sorted(ex.map(one, range(n_req)))
            wall = time.time() - t0
            out[f"c{conc}"] = {
                "p50": round(statistics.median(lat), 4),
                "p95": round(lat[max(0, int(len(lat) * 0.95) - 1)], 4),
                "rps": round(n_req / wall, 1),
            }
    finally:
        httpd.shutdown()
        engine.sessions.close_all()
    return out


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import bench

    spark, sf_dir, cpus, warehouse = bench.build_bench_session()
    bench.prepare(spark, sf_dir, warehouse, cpus)
    print(f"load1m={os.getloadavg()[0]:.2f}")

    acc: dict[str, list[dict]] = {"pool0": [], "pool16": []}
    sides = [("pool0", 0), ("pool16", 16)]
    for i in range(rounds):
        # alternate which side runs first — ambient load trends would
        # otherwise systematically favor the fixed first side
        for name, pool in (sides if i % 2 == 0 else sides[::-1]):
            res = run_block(spark, sf_dir, pool)
            acc[name].append(res)
            print(f"  round {i} {name}: {res}", flush=True)
    for name, rs in acc.items():
        for conc in ("c8", "c32"):
            best = max(r[conc]["rps"] for r in rs)
            p50 = min(r[conc]["p50"] for r in rs)
            print(f"{name} {conc}: best_rps={best} best_p50={p50}")
    print(f"load1m_end={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
