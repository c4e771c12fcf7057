#!/usr/bin/env python3
"""A/B the boot-time session pre-warm (r9, verdict task 6).

Boots the REST server in a FRESH subprocess (fresh JVM — the condition
a deployment's first request actually sees) with `server.prewarm` off
then on, and measures for each:

- ready_s: process start -> /healthz 200 (boot cost, incl. the warm
  when enabled);
- first_request_s: latency of the first real stateless query (parquet
  data source registration + agg + JSON encode);
- second_request_s: the same request again (the steady-state floor).

Prints one JSON line. Run on an idle box; results land in PLANS.md.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
import time

import requests

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def measure(prewarm: bool) -> dict:
    port = free_port()
    cfg = {"server": {"address": "127.0.0.1", "port": port, "prewarm": prewarm}}
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(cfg, f)
        cfg_path = f.name
    env = dict(os.environ, PYTHONPATH=REPO)
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-m", "datafusion_server_spark.server.http", "-f", cfg_path],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        while True:
            try:
                if requests.get(f"{base}/healthz", timeout=1).status_code == 200:
                    break
            except requests.ConnectionError:
                pass
            if time.time() - t0 > 180:
                raise RuntimeError("server never became ready")
            time.sleep(0.1)
        ready_s = time.time() - t0
        payload = {
            "dataSources": [{"format": "parquet", "name": "orders1",
                             "location": f"{SF_DIR}/orders.parquet"}],
            "query": "SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n "
                     "FROM orders1 GROUP BY o_orderstatus ORDER BY o_orderstatus",
            "response": {"format": "json"},
        }
        t1 = time.time()
        r = requests.post(f"{base}/dataframe/query", json=payload)
        assert r.status_code == 200, r.text
        first = time.time() - t1
        t2 = time.time()
        r = requests.post(f"{base}/dataframe/query", json=payload)
        assert r.status_code == 200, r.text
        second = time.time() - t2
    finally:
        proc.terminate()
        proc.wait(timeout=30)
        os.unlink(cfg_path)
    return {
        "prewarm": prewarm,
        "ready_s": round(ready_s, 2),
        "first_request_s": round(first, 2),
        "second_request_s": round(second, 2),
    }


_SPAN_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from datafusion_server_spark.session import build_spark
spark = build_spark(app_name="span-ab", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
t_warm = 0.0
if {prewarm!r} == "on":
    from datafusion_server_spark.server.api import Engine
    t0 = time.time()
    Engine(spark, start_reaper=False).prewarm()
    t_warm = time.time() - t0
from datafusion_server_spark.queries import registry
qd = registry()["text_span_corruption"]
t1 = time.time(); qd.build(spark, {sf!r}).toArrow(); first = time.time() - t1
t2 = time.time(); qd.build(spark, {sf!r}).toArrow(); second = time.time() - t2
print(json.dumps({{"prewarm_s": round(t_warm, 2),
                   "first_call_s": round(first, 2),
                   "second_call_s": round(second, 2)}}))
"""


def measure_span(prewarm: bool) -> dict:
    """First-call latency of the span-corruption expression shape in a
    FRESH JVM (r10, verdict task 6): the ~8 s cliff is one-time codegen
    compile of the large HOF tree; Engine.prewarm() now compiles the
    same shape on a 2-row input at boot."""
    code = _SPAN_CHILD.format(
        repo=REPO, prewarm="on" if prewarm else "off", sf=SF_DIR
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO),
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-800:]
    return {"prewarm": prewarm, **json.loads(out.stdout.strip().splitlines()[-1])}


if __name__ == "__main__":
    out = {
        "load1m_start": round(os.getloadavg()[0], 2),
        "off": measure(False),
        "on": measure(True),
        "span_off": measure_span(False),
        "span_on": measure_span(True),
    }
    print(json.dumps(out))
