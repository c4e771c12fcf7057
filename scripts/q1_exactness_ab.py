#!/usr/bin/env python3
"""r12 (verdict task 4): interleaved A/B of exact-aggregation forms for
q1 at a scaled fixture. The exactness CONTRACT is order-independent
bit-exact sums of 6-decimal measures; the question is which exact form
has the lowest constant factor on Spark.

Forms:
  split      — current production: per-measure ROUND/CAST duplicated in
               the two split sums (SUM(v DIV 1e6), SUM(v % 1e6))
  fused      — pre-project v once per measure in an inner SELECT, split
               sums consume the projected BIGINT (half the ROUND/CAST)
  single     — one SUM(v) per measure, no split (exact only while
               group_rows * 1e11 < 2^63 — diagnostic, not the 100 TB
               form)
  decimal    — SUM(CAST(x AS DECIMAL(18,6))) per measure (Int128 agg)
  double     — plain DOUBLE sums (NOT exact/order-independent — the
               floor the contract pays against)

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 python scripts/q1_exactness_ab.py [rounds]
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEASURES = [
    ("l_quantity", "sum_qty"),
    ("l_extendedprice", "sum_base_price"),
    ("l_extendedprice * (1 - l_discount)", "sum_disc_price"),
    ("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
]
FILT = "WHERE l_shipdate <= DATE '2001-09-01'"


def _recomb(hi: str, lo: str, alias: str) -> str:
    return (
        f"ROUND((CAST({hi} AS DOUBLE) * 1000000 + CAST({lo} AS DOUBLE))"
        f" / 1000000, 6) AS {alias}"
    )


def q_split() -> str:
    cols = []
    for expr, alias in MEASURES:
        v = f"CAST(ROUND(({expr}) * 1000000) AS BIGINT)"
        cols.append(_recomb(f"SUM({v} DIV 1000000)", f"SUM({v} % 1000000)", alias))
    return (
        "SELECT l_returnflag, l_linestatus, "
        + ", ".join(cols)
        + ", CAST(COUNT(*) AS BIGINT) AS count_order "
        + f"FROM lineitem {FILT} GROUP BY l_returnflag, l_linestatus"
    )


def q_fused() -> str:
    proj = ", ".join(
        f"CAST(ROUND(({expr}) * 1000000) AS BIGINT) AS v{i}"
        for i, (expr, _) in enumerate(MEASURES)
    )
    cols = [
        _recomb(f"SUM(v{i} DIV 1000000)", f"SUM(v{i} % 1000000)", alias)
        for i, (_, alias) in enumerate(MEASURES)
    ]
    return (
        "SELECT l_returnflag, l_linestatus, "
        + ", ".join(cols)
        + ", CAST(COUNT(*) AS BIGINT) AS count_order "
        + f"FROM (SELECT l_returnflag, l_linestatus, {proj} FROM lineitem {FILT}) t "
        + "GROUP BY l_returnflag, l_linestatus"
    )


def q_single() -> str:
    cols = [
        f"ROUND(CAST(SUM(CAST(ROUND(({expr}) * 1000000) AS BIGINT)) AS DOUBLE)"
        f" / 1000000, 6) AS {alias}"
        for expr, alias in MEASURES
    ]
    return (
        "SELECT l_returnflag, l_linestatus, "
        + ", ".join(cols)
        + ", CAST(COUNT(*) AS BIGINT) AS count_order "
        + f"FROM lineitem {FILT} GROUP BY l_returnflag, l_linestatus"
    )


def q_decimal() -> str:
    cols = [
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE), 6) AS {alias}"
        for expr, alias in MEASURES
    ]
    return (
        "SELECT l_returnflag, l_linestatus, "
        + ", ".join(cols)
        + ", CAST(COUNT(*) AS BIGINT) AS count_order "
        + f"FROM lineitem {FILT} GROUP BY l_returnflag, l_linestatus"
    )


def q_double() -> str:
    cols = [f"ROUND(SUM({expr}), 6) AS {alias}" for expr, alias in MEASURES]
    return (
        "SELECT l_returnflag, l_linestatus, "
        + ", ".join(cols)
        + ", CAST(COUNT(*) AS BIGINT) AS count_order "
        + f"FROM lineitem {FILT} GROUP BY l_returnflag, l_linestatus"
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))

    from datafusion_server_spark.session import build_spark
    from datafusion_server_spark import tables

    spark = build_spark(
        app_name="q1ab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    tables.register_views(spark, sf_dir)

    forms = {
        "split": q_split(),
        "fused": q_fused(),
        "single": q_single(),
        "decimal": q_decimal(),
        "double": q_double(),
    }
    print(f"load1m={os.getloadavg()[0]:.2f} sf_dir={sf_dir}")
    # value agreement: split/fused/single see the same exact integers,
    # so they must agree BIT-exactly; the decimal form recombines
    # through a different double path (CAST(decimal) vs hi*1e6+lo) and
    # may differ in the last ulp pre-ROUND — checked to 1e-6 relative.
    ref = None
    for name in ("split", "fused", "single"):
        rows = sorted(tuple(r) for r in spark.sql(forms[name]).collect())
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} disagrees with split"
    dec = sorted(tuple(r) for r in spark.sql(forms["decimal"]).collect())
    for a, b in zip(ref, dec):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert abs(x - y) <= 1e-6 * max(1.0, abs(x)), (a, b)
            else:
                assert x == y, (a, b)
    print("exact forms agree:", len(ref), "groups")

    times: dict[str, list[float]] = {n: [] for n in forms}
    for _ in range(rounds):
        for name, sql in forms.items():  # interleaved
            t0 = time.time()
            spark.sql(sql).toArrow()
            times[name].append(time.time() - t0)
            gc.collect()
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f} med={sorted(ts)[len(ts)//2]:.3f}"
            f" runs={[round(t, 3) for t in ts]}"
        )
    print(f"load1m_end={os.getloadavg()[0]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
