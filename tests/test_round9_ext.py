"""Unit tests for the round-9 extension operators: URL
canonicalization, linear attribution credit conservation, deterministic
label propagation on known graphs, CUSUM changepoint placement, and the
Kaplan-Meier fixture curve."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datafusion_server_spark.operators import funnel, graph, timeseries, urltools


def test_canonicalize_url_rules(spark):
    cases = [
        # (raw, expected canonical)
        ("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=3#frag",
         "https://www.example.com/A/b?id=3"),
        ("http://host:80/", "http://host/"),
        ("http://host:8080/p", "http://host:8080/p"),  # non-default port kept
        ("https://h/p?b=2&a=1", "https://h/p?a=1&b=2"),  # param sort
        ("https://h/p?ref=rss&fbclid=x&gclid=y", "https://h/p"),  # all tracking
        ("https://h", "https://h/"),  # empty path -> /
        ("https://h/p///", "https://h/p"),  # trailing slashes
        ("not a url", ""),  # non-URL -> empty
        ("ftp://Host/Path", "ftp://host/Path"),  # path case preserved
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], ["url"])
    got = [
        r["c"]
        for r in df.select(urltools.canonicalize_url(F.col("url")).alias("c"))
        .collect()
    ]
    assert got == [e for _, e in cases]


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def test_linear_attribution_conserves_and_splits(spark):
    rows = [
        # user 1: two touches then a purchase of 10.01 (1001 cents):
        # 1001 = 3*333 + 2 -> earliest touch gets 335, other 333... wait
        # two touches: share 500 each, remainder 1 to the earlier.
        (1, "view", 1, _ts(1, 1), 0.0),
        (1, "click", 2, _ts(1, 2), 0.0),
        (1, "purchase", 3, _ts(2), 10.01),
        # user 2: cold purchase -> (none)
        (2, "purchase", 4, _ts(5), 3.50),
        # user 3: touch OUTSIDE the 3-day lookback -> (none)
        (3, "view", 5, _ts(1), 0.0),
        (3, "purchase", 6, _ts(10), 2.00),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_type", "event_id", "ts", "value"]
    )
    out = {
        r["touch_type"]: (r["n_touches"], r["attributed_scaled"])
        for r in funnel.linear_attribution(
            df, "user_id", "event_type", "ts", "event_id", "value",
            conversion_type="purchase",
            touch_types=("view", "click"),
            lookback_s=3 * 86400,
        ).collect()
    }
    # 1001 cents over 2 touches: 500 each, remainder 1 to the earlier view
    assert out["view"] == (1, 501)
    assert out["click"] == (1, 500)
    assert out["(none)"] == (2, 350 + 200)
    # conservation: total credit == total purchase cents
    assert sum(v for _, v in out.values()) == 1001 + 350 + 200


def test_label_propagation_two_cliques(spark):
    # two disjoint triangles -> every node adopts its clique's min label
    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)]
    df = spark.createDataFrame(edges, ["pa", "pb"])
    labels = {
        r["node"]: r["label"]
        for r in graph.label_propagation(df, iterations=3).collect()
    }
    assert {labels[1], labels[2], labels[3]} == {1}
    assert {labels[10], labels[11], labels[12]} == {10}


def test_label_propagation_plurality_tiebreak(spark):
    # star: center 5 with neighbors 1,2,3 (all degree-1). Round 1: the
    # center sees labels {1,2,3} (all count 1) -> min label 1; leaves
    # see only {5} -> 5. Deterministic under any partitioning.
    df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)], ["pa", "pb"])
    labels = {
        r["node"]: r["label"]
        for r in graph.label_propagation(df, iterations=1).collect()
    }
    assert labels[5] == 1
    assert labels[1] == labels[2] == labels[3] == 5


def test_cusum_changepoint_places_level_shift(spark):
    # key 'a': 5 days at 10.0 then 5 days at 20.0 -> CUSUM argmax at the
    # last low day (day 5)
    rows = [("a", _ts(d), 10.0 if d <= 5 else 20.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = timeseries.cusum_changepoint(df, "k", "ts", "value").collect()
    assert len(out) == 1
    r = out[0]
    assert r["cp_day"] == datetime.date(2024, 1, 5)
    assert r["n_days"] == 10
    assert abs(r["mean_before"] - 10.0) < 1e-9
    assert abs(r["mean_after"] - 20.0) < 1e-9


def test_kaplan_meier_hand_curve(spark):
    # 4 users: durations 0,0,1,2 days; observation end = last event of
    # user 4 (day 10). censor_after_s=1 day: every user's last event is
    # > 1 day before the end except user 4 -> users 1-3 churn, user 4
    # censored. Curve: dur 0: n=4, d=2 -> S=0.5; dur 1: n=2, d=1 ->
    # S=0.25; dur 2: n=1, d=0 (censored) -> S=0.25.
    rows = [
        (1, _ts(1)),
        (2, _ts(2)),
        (3, _ts(3)), (3, _ts(4)),
        (4, _ts(8)), (4, _ts(10)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        r["dur_day"]: r
        for r in funnel.kaplan_meier(
            df, "user_id", "ts", censor_after_s=86_400
        ).collect()
    }
    assert out[0]["n_at_risk"] == 4 and out[0]["n_churned"] == 2
    assert abs(out[0]["km_survival"] - 0.5) < 1e-12
    assert out[1]["n_at_risk"] == 2 and out[1]["n_churned"] == 1
    assert abs(out[1]["km_survival"] - 0.25) < 1e-12
    assert out[2]["n_at_risk"] == 1 and out[2]["n_churned"] == 0
    assert out[2]["n_censored"] == 1
    assert abs(out[2]["km_survival"] - 0.25) < 1e-12
