"""Seeded fuzz of the ``date_bin`` dialect shim vs DuckDB time_bucket.

The shim rewrites DataFusion's ``date_bin(INTERVAL 'n unit', ts
[, origin])`` to epoch-floor arithmetic
(``functions/dialect.py::rewrite_date_bin``). DuckDB implements the
same bucketing as ``time_bucket`` — but with a POSTGRES default origin
(2000-01-03 for day/week widths, not the epoch DataFusion uses), so
every oracle call passes the origin EXPLICITLY (the case's origin, or
the epoch for the two-arg form; probed: explicit-origin time_bucket
floors correctly for pre-origin timestamps too).

Coverage: every unit the shim supports x strides 1..13 x with/without
origin x pre-epoch/pre-origin timestamps. Whole-second fixtures only —
``unix_timestamp`` truncates sub-second parts by design.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb

from datafusion_server_spark.functions.dialect import transpile

UNITS = ["second", "seconds", "minute", "minutes", "hour", "hours",
         "day", "days", "week", "weeks"]
EPOCH = "1970-01-01 00:00:00"


def _fixture_ts() -> list[str]:
    rng = random.Random(0xDA7EB1)
    base = dt.datetime(1950, 1, 1)
    out = []
    for _ in range(160):
        t = base + dt.timedelta(seconds=rng.randrange(0, 80 * 365 * 86400))
        out.append(t.strftime("%Y-%m-%d %H:%M:%S"))
    # pin the boundary neighborhoods floor() must get right
    out += ["1969-12-31 23:59:59", "1970-01-01 00:00:00", "1970-01-01 00:00:01",
            "1999-12-31 23:59:59", "2000-01-03 00:00:00"]
    return out


def test_date_bin_fuzz_vs_duckdb_time_bucket(spark):
    ts_list = _fixture_ts()
    spark.createDataFrame(
        [(t,) for t in ts_list], "s string"
    ).selectExpr("CAST(s AS TIMESTAMP) AS ts").createOrReplaceTempView("ts_t")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ts_t AS SELECT CAST(s AS TIMESTAMP) AS ts FROM ("
        + " UNION ALL ".join(f"SELECT '{t}' AS s" for t in ts_list)
        + ")"
    )
    rng = random.Random(0xB1B1)
    origins = [None, EPOCH, "1971-02-03 04:05:06", "2000-01-03 00:00:00",
               "1960-07-08 09:10:11"]
    for i in range(60):
        unit = rng.choice(UNITS)
        n = rng.randint(1, 13)
        origin = rng.choice(origins)
        if origin:
            raw = (f"SELECT ts, date_bin(INTERVAL '{n} {unit}', ts, "
                   f"TIMESTAMP '{origin}') AS b FROM ts_t")
        else:
            raw = f"SELECT ts, date_bin(INTERVAL '{n} {unit}', ts) AS b FROM ts_t"
        got = {
            (r["ts"], r["b"]) for r in spark.sql(transpile(raw)).collect()
        }
        want = {
            (r[0], r[1])
            for r in con.execute(
                f"SELECT ts, time_bucket(INTERVAL '{n} {unit}', ts, "
                f"TIMESTAMP '{origin or EPOCH}') AS b FROM ts_t"
            ).fetchall()
        }
        assert got == want, (
            f"case {i}: date_bin(INTERVAL '{n} {unit}', ts"
            f"{', ' + repr(origin) if origin else ''}) diverged from "
            f"time_bucket\n  sample diff: {sorted(got ^ want)[:4]}"
        )
