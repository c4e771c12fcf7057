"""Property tests for the r7 CDC/SCD merge operators: idempotence and
no-op guarantees that the oracle queries alone would not pin."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datafusion_server_spark.operators.merge import apply_changeset, scd2_apply


def _base(spark):
    return spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C")],
        "k long, price double, status string",
    )


def test_changeset_empty_is_identity(spark):
    base = _base(spark)
    empty = spark.createDataFrame([], "k long, price double, status string, op string")
    out = apply_changeset(base, empty, "k")
    rows = {r["k"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r["change_type"] == "keep" for r in rows.values())
    assert rows[2]["price"] == 20.0


def test_changeset_upsert_is_idempotent(spark):
    base = _base(spark)
    ch = spark.createDataFrame(
        [(2, 25.0, "B", "U"), (3, None, None, "D"), (9, 90.0, "N", "I")],
        "k long, price double, status string, op string",
    )
    once = apply_changeset(base, ch, "k").drop("change_type")
    twice = apply_changeset(once, ch, "k").drop("change_type")
    a = sorted(once.collect())
    b = sorted(twice.collect())
    # the D row's base target is already gone and the I behaves as U on
    # its own prior insert -> same snapshot
    assert a == b
    keys = {r["k"] for r in a}
    assert keys == {1, 2, 9}


def test_changeset_dangling_update_ignored(spark):
    base = _base(spark)
    ch = spark.createDataFrame(
        [(42, 1.0, "X", "U"), (43, 1.0, "X", "D")],
        "k long, price double, status string, op string",
    )
    out = apply_changeset(base, ch, "k")
    assert sorted(r["k"] for r in out.collect()) == [1, 2, 3]


def _hist(spark):
    return spark.createDataFrame(
        [(1, "x", datetime.date(1990, 1, 1), None),
         (2, "y", datetime.date(1990, 1, 1), None)],
        "k long, attr string, valid_from date, valid_to date",
    )


def test_scd2_reassert_identical_is_noop(spark):
    hist = _hist(spark)
    ch = spark.createDataFrame([(1, "x")], "k long, attr string")
    out = scd2_apply(hist, ch, "k", change_ts=datetime.date(2000, 6, 1))
    rows = sorted(out.collect())
    assert len(rows) == 2
    assert all(r["valid_to"] is None for r in rows)
    assert all(r["valid_from"] == datetime.date(1990, 1, 1) for r in rows)


def test_scd2_change_closes_and_reopens_then_stabilizes(spark):
    hist = _hist(spark)
    ch = spark.createDataFrame([(1, "CHANGED"), (7, "new")], "k long, attr string")
    ts = datetime.date(2000, 6, 1)
    once = scd2_apply(hist, ch, "k", change_ts=ts)
    rows = sorted(once.collect())
    # k=1: closed old + open new; k=2 untouched; k=7 first version
    assert len(rows) == 4
    k1 = [r for r in rows if r["k"] == 1]
    assert {(r["attr"], r["valid_to"]) for r in k1} == {("x", ts), ("CHANGED", None)}
    k7 = [r for r in rows if r["k"] == 7]
    assert k7[0]["valid_from"] == ts and k7[0]["valid_to"] is None
    # re-applying the SAME changeset later creates no new versions
    later = scd2_apply(once, ch, "k", change_ts=datetime.date(2001, 1, 1))
    assert later.count() == 4


def test_changeset_null_keyed_base_row_survives(spark):
    """r8 (ADVICE): a base row whose key is NULL never matches a change
    row (SQL equality), so it must pass through as 'keep' — the old
    keys[0].isNotNull() existence test silently deleted it."""
    base = spark.createDataFrame(
        [(None, "orphan"), (1, "a")], "k long, v string"
    )
    ch = spark.createDataFrame([(1, "A", "U")], "k long, v string, op string")
    out = {(r["k"], r["v"], r["change_type"]) for r in
           apply_changeset(base, ch, "k").collect()}
    assert out == {(None, "orphan", "keep"), (1, "A", "update")}


def test_scd2_null_keyed_current_row_survives(spark):
    hist = spark.createDataFrame(
        [(None, "orphan", datetime.date(1990, 1, 1), None),
         (1, "x", datetime.date(1990, 1, 1), None)],
        "k long, attr string, valid_from date, valid_to date",
    )
    ch = spark.createDataFrame([(1, "CHANGED")], "k long, attr string")
    out = scd2_apply(hist, ch, "k", change_ts=datetime.date(2000, 6, 1))
    rows = out.collect()
    assert len(rows) == 3  # orphan kept + k=1 closed + k=1 new
    assert any(r["k"] is None and r["valid_to"] is None for r in rows)
