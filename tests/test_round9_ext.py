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


def _xy2d_reference(order, x, y):
    """Classic Wikipedia xy2d loop — the ground truth the automaton
    LUTs were derived from."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_grid(spark):
    from datafusion_server_spark.operators import scale

    n = 64  # 6-bit full grid, every point
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["h"]
        for r in df.select(
            "x", "y", scale.hilbert_key_2d(F.col("x"), F.col("y"), bits=6).alias("h")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d_reference(n, x, y), (x, y)
    # bijectivity over the full grid (a space-filling curve is a
    # permutation of the cell ids)
    assert sorted(got.values()) == list(range(n * n))


def test_hilbert_consecutive_keys_are_grid_adjacent(spark):
    # THE space-filling-curve property (and the reason to prefer it for
    # layout sorting): walking the key order moves exactly ONE grid
    # step at a time, so any contiguous key range is a spatially
    # compact region and a sorted parquet row group covers a tight
    # min/max box. Morton violates this with cross-quadrant teleports.
    from datafusion_server_spark.operators import scale

    n = 32
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, ["x", "y"])
    rows = df.select(
        "x", "y",
        scale.hilbert_key_2d(F.col("x"), F.col("y"), bits=5).alias("h"),
        scale.zorder_key([F.col("x"), F.col("y")], bits=5).alias("z"),
    ).collect()
    by_h = {r["h"]: (r["x"], r["y"]) for r in rows}
    by_z = {r["z"]: (r["x"], r["y"]) for r in rows}

    def step(cells, k):
        (x0, y0), (x1, y1) = cells[k], cells[k + 1]
        return abs(x1 - x0) + abs(y1 - y0)

    assert all(step(by_h, k) == 1 for k in range(n * n - 1))
    assert max(step(by_z, k) for k in range(n * n - 1)) > 1


def test_growth_accounting_hand_fixture(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    from datafusion_server_spark.queries import registry  # noqa: F401
    from datafusion_server_spark.queries.core4 import events_growth_accounting

    # weeks: Mon 2024-01-01, 01-08, 01-15, 01-22
    # user 1: w1, w2 (retained), w4 (resurrected; churn would land w5 >
    #         max week -> right-edge excluded)
    # user 2: w1 only -> churned in w2
    rows = [
        (1, "x", 1, _ts(1), 0.0),
        (1, "x", 2, _ts(8), 0.0),
        (1, "x", 3, _ts(22), 0.0),
        (2, "x", 4, _ts(2), 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_type", "event_id", "ts", "value"]
    )
    df.createOrReplaceTempView("__growth_fixture")
    from datafusion_server_spark.operators import funnel  # noqa: F401
    # build the same chain as the query on the fixture frame
    from pyspark.sql.window import Window

    weekly = df.select(
        F.col("user_id").alias("u"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
    ).distinct()
    mw = weekly.agg(F.max("wk").alias("mw"))
    w = Window.partitionBy("u").orderBy("wk")
    seq = weekly.select(
        "u", "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    classified = seq.select(
        "wk",
        F.when(F.col("prev_wk").isNull(), "new")
        .when(F.datediff(F.col("wk"), F.col("prev_wk")) == 7, "retained")
        .otherwise("resurrected").alias("status"),
    ).unionByName(
        seq.crossJoin(F.broadcast(mw))
        .filter(
            (F.col("next_wk").isNull() | (F.datediff("next_wk", "wk") > 7))
            & (F.date_add("wk", 7) <= F.col("mw"))
        )
        .select(F.date_add("wk", 7).alias("wk"), F.lit("churned").alias("status"))
    )
    got = {
        (r["wk"].isoformat(), r["status"]): r["n"]
        for r in classified.groupBy("wk", "status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got[("2024-01-01", "new")] == 2
    assert got[("2024-01-08", "retained")] == 1
    assert got[("2024-01-08", "churned")] == 1  # user 2
    assert got[("2024-01-22", "resurrected")] == 1
    # user 1's w2 gap-churn lands w3 (inside window)
    assert got[("2024-01-15", "churned")] == 1
    # NO churn row past the max observed week (user 1 w4 -> w5 excluded)
    assert ("2024-01-29", "churned") not in got


def _kn_reference(docs, d=0.75):
    """Pure-Python interpolated KN bigram replay (same formulas)."""
    import math
    from collections import Counter
    from decimal import Decimal

    streams = {i: s.split(" ") for i, s in docs}
    bigs, firsts = [], []
    for i, t in streams.items():
        firsts.append((i, None, t[0]))
        bigs += [(i, a, b) for a, b in zip(t, t[1:])]
    n_prev = Counter(p for _, p, _ in bigs)
    n_ab = Counter((p, c) for _, p, c in bigs)
    pair_types = set(n_ab)
    nf = Counter(p for p, _ in pair_types)
    cont = Counter(c for _, c in pair_types)
    B = len(pair_types)
    V = len({c for _, _, c in bigs} | {c for _, _, c in firsts})
    out = {}
    for i, toks in streams.items():
        nll = Decimal(0)
        stream = [(None, toks[0])] + list(zip(toks, toks[1:]))
        for p, c in stream:
            pc = (cont.get(c, 0) + 1) / (B + V)
            if p is None:
                prob = pc
            else:
                prob = (n_ab[(p, c)] - d) / n_prev[p] + (
                    d * nf[p] / n_prev[p]
                ) * pc
            nll += Decimal(str(round(-math.log(prob), 8)))
        out[i] = (len(stream), round(float(nll) / len(stream), 6))
    return out


def test_kneser_ney_matches_python_replay(spark):
    from datafusion_server_spark.operators import text as text_ops

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "a dog sat on a log"),
        (3, "the dog sat"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["id"]: (r["n_tokens"], r["xent_nats"])
        for r in text_ops.lm_kneser_ney_cross_entropy(df, "text", "doc_id").collect()
    }
    want = _kn_reference(docs)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-9, (i, got[i], want[i])


def test_kneser_ney_rewards_seen_word_order(spark):
    # word order destroyed -> bigram continuation evidence gone ->
    # higher cross-entropy for the shuffled twin of the same bag
    from datafusion_server_spark.operators import text as text_ops

    base = "alpha beta gamma delta " * 5
    shuffled = " ".join(reversed(base.split()))
    df = spark.createDataFrame(
        [(0, base.strip()), (1, base.strip()), (2, shuffled)],
        ["doc_id", "text"],
    )
    got = {
        r["id"]: r["xent_nats"]
        for r in text_ops.lm_kneser_ney_cross_entropy(df, "text", "doc_id").collect()
    }
    assert got[2] > got[0]


def test_markov_stationary_two_state_chain(spark):
    # user path A B A B A B ... : P(A->B)=1, P(B->A)=1. Power iteration
    # from uniform oscillates but stays (1/2, 1/2) exactly in integer
    # mass units.
    rows = [(1, "A" if i % 2 == 0 else "B", i, _ts(1, 0)) for i in range(10)]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "event_id", "value"])
    df = df.withColumn("ts", F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,event_id)"))
    out = {
        r["state"]: r["pi_nano"]
        for r in funnel.markov_stationary(
            df, "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    assert out["A"] == out["B"] == funnel.MARKOV_RANK_ONE // 2


def test_markov_stationary_biased_chain_python_replay(spark):
    # 3-state chain with uneven counts; replay the exact integer
    # recurrence driver-side.
    path = list("AABACABCABACCA")
    rows = [(1, path[i], i, 0.0) for i in range(len(path))]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "event_id", "value"])
    df = df.withColumn("ts", F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,event_id)"))
    got = {
        r["state"]: r["pi_nano"]
        for r in funnel.markov_stationary(
            df, "user_id", "event_type", "ts", "event_id", iterations=12
        ).collect()
    }
    # python replay
    from collections import Counter
    pairs = list(zip(path, path[1:]))
    n_ij = Counter(pairs)
    n_i = Counter(p for p, _ in pairs)
    P1 = funnel.MARKOV_PROP_ONE
    R1 = funnel.MARKOV_RANK_ONE
    prop = {(i, j): (c * P1) // n_i[i] for (i, j), c in n_ij.items()}
    states = sorted(n_i)
    pi = {s: R1 // len(states) for s in states}
    for _ in range(12):
        nxt = {s: 0 for s in states}
        for (i, j), p in prop.items():
            if j in nxt:
                nxt[j] += (pi[i] * p) // P1
        pi = nxt
    assert got == pi


def test_autocorrelation_alternating_series(spark):
    # daily totals +10, +20 alternating for 10 days: lag-1 ACF of the
    # centered series is strongly negative, lag-2 positive.
    rows = [("a", _ts(d), 10.0 if d % 2 == 0 else 20.0) for d in range(1, 11)]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = {
        r["lag"]: r["acf"]
        for r in timeseries.autocorrelation(df, "k", "ts", "value").collect()
    }
    assert out[1] < -0.8
    assert out[2] > 0.7
    # python replay of the exact ratio for lag 1
    x = [1000 if d % 2 == 0 else 2000 for d in range(1, 11)]
    n, S = len(x), sum(x)
    c = [n * v - S for v in x]
    num = sum(a * b for a, b in zip(c, c[1:]))
    den = sum(a * a for a in c)
    assert abs(out[1] - num / den) < 1e-12
