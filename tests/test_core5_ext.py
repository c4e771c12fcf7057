"""Edge-case tests for the batch-4 operators (queries/core5.py):
Resource-Allocation link prediction, sorted bin-packing, Theil-Sen."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark.operators import graph as graph_ops
from datafusion_server_spark.operators import scale as scale_ops
from datafusion_server_spark.operators import timeseries as ts_ops


def test_resource_allocation_hand_graph(spark):
    """Edges (1-2),(1-3),(2-3),(1-4): the only non-adjacent pairs with
    a common neighbor are (2,4) and (3,4), both through node 1
    (deg 3 -> RA = floor(1e12/3)); tie broken by (u, v)."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "pa long, pb long"
    )
    out = graph_ops.resource_allocation_topk(edges, k=10).orderBy("rank_pos")
    rows = [tuple(r) for r in out.collect()]
    third = graph_ops.RA_ONE // 3
    assert rows == [(2, 4, 1, third, 1), (3, 4, 1, third, 2)]


def test_resource_allocation_empty_edges(spark):
    edges = spark.createDataFrame([], "pa long, pb long")
    assert graph_ops.resource_allocation_topk(edges, k=5).collect() == []


def test_resource_allocation_excludes_adjacent(spark):
    """A triangle has common neighbors for every pair, but every pair
    is an edge — nothing is predictable."""
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "pa long, pb long")
    assert graph_ops.resource_allocation_topk(edges, k=5).collect() == []


def test_binpack_uniform_files(spark):
    files = spark.createDataFrame(
        [(i, 100) for i in range(4)], "fid long, bytes long"
    )
    out = scale_ops.binpack_by_cumsum(files, ["fid"], "bytes", 250)
    got = {r["fid"]: r["bin_id"] for r in out.collect()}
    # exclusive cumsum 0,100,200,300 div 250 -> 0,0,0,1
    assert got == {0: 0, 1: 0, 2: 0, 3: 1}


def test_binpack_oversized_file_skips_bins(spark):
    files = spark.createDataFrame([(0, 600), (1, 100)], "fid long, bytes long")
    out = scale_ops.binpack_by_cumsum(files, ["fid"], "bytes", 250)
    got = {r["fid"]: r["bin_id"] for r in out.collect()}
    # file 0 opens bin 0 (overflows it); file 1 starts at offset 600 -> bin 2
    assert got == {0: 0, 1: 2}


def test_theil_sen_matches_python_median(spark):
    """One key, 5 days — all 10 pairwise slopes enumerated in Python;
    the operator must return the LOWER median element."""
    import datetime

    xs = [0, 10, 5, 30, 20]
    rows = [
        (f"k", datetime.datetime(2024, 1, 1 + d, 12, 0, 0), float(x))
        for d, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = ts_ops.theil_sen_daily(df, "event_type", "ts", "value").collect()
    assert len(out) == 1
    r = out[0]
    scaled = [x * 100 for x in xs]
    slopes = sorted(
        (scaled[j] - scaled[i]) / (j - i)
        for i in range(5)
        for j in range(i + 1, 5)
    )
    assert r["n_days"] == 5 and r["n_pairs"] == 10
    assert r["slope"] == slopes[(10 + 1) // 2 - 1]


def test_theil_sen_single_day_key_dropped(spark):
    import datetime

    df = spark.createDataFrame(
        [("only", datetime.datetime(2024, 1, 1), 1.0)],
        "event_type string, ts timestamp, value double",
    )
    assert ts_ops.theil_sen_daily(df, "event_type", "ts", "value").collect() == []


def test_theil_sen_robust_to_one_outlier_day(spark):
    """The point of Theil-Sen: corrupt ONE day by 1000x and the median
    slope moves a little; the least-squares slope explodes."""
    import datetime

    base = [(d, 10.0 * d) for d in range(9)]  # exact slope 10/day
    rows = [
        ("k", datetime.datetime(2024, 2, 1 + d, 6, 0, 0), v) for d, v in base
    ]
    clean = ts_ops.theil_sen_daily(
        spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double"
        ),
        "event_type",
        "ts",
        "value",
    ).collect()[0]["slope"]
    rows_bad = rows[:-1] + [("k", datetime.datetime(2024, 2, 9, 6, 0, 0), 80000.0)]
    bad = ts_ops.theil_sen_daily(
        spark.createDataFrame(
            rows_bad, "event_type string, ts timestamp, value double"
        ),
        "event_type",
        "ts",
        "value",
    ).collect()[0]["slope"]
    assert clean == 1000.0  # 10.0/day in cents
    assert abs(bad - clean) < 0.3 * clean  # median barely moves


def test_isotonic_bands_pools_violator(spark):
    """Rates 0.1, 0.5, 0.3, 0.9: PAV pools the (0.5, 0.3) violation to
    their weighted average 0.4; monotone elsewhere."""
    bands = spark.createDataFrame(
        [(0, 10, 1), (1, 10, 5), (2, 10, 3), (3, 10, 9)],
        "band long, n long, pos long",
    )
    from datafusion_server_spark.operators import classifier as clf_ops

    got = {
        r["band"]: r["fitted"]
        for r in clf_ops.isotonic_bands(bands).collect()
    }
    assert got == {0: 0.1, 1: 0.4, 2: 0.4, 3: 0.9}


def test_isotonic_bands_already_monotone_identity(spark):
    bands = spark.createDataFrame(
        [(0, 4, 0), (1, 4, 2), (2, 4, 4)], "band long, n long, pos long"
    )
    from datafusion_server_spark.operators import classifier as clf_ops

    got = {
        r["band"]: r["fitted"]
        for r in clf_ops.isotonic_bands(bands).collect()
    }
    assert got == {0: 0.0, 1: 0.5, 2: 1.0}


def test_isotonic_bands_all_decreasing_pools_to_global_mean(spark):
    bands = spark.createDataFrame(
        [(0, 5, 5), (1, 5, 3), (2, 5, 0)], "band long, n long, pos long"
    )
    from datafusion_server_spark.operators import classifier as clf_ops

    fitted = sorted(
        r["fitted"] for r in clf_ops.isotonic_bands(bands).collect()
    )
    assert fitted == [8 / 15] * 3


def _holt_replay(xs):
    l, b = float(xs[0]), float(xs[1] - xs[0]) if len(xs) > 1 else 0.0
    for x in xs[1:]:
        nl = 0.5 * x + 0.5 * (l + b)
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
    return l, b


def test_holt_linear_matches_python_replay(spark):
    import datetime

    xs = [3.0, 7.0, 4.0, 12.0, 9.0, 15.0]
    rows = [
        ("k", datetime.datetime(2024, 3, 1 + d, 8, 0, 0), v)
        for d, v in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = ts_ops.holt_linear_daily(df, "event_type", "ts", "value").collect()[0]
    l, b = _holt_replay([x * 100 for x in xs])
    assert out["n_days"] == 6
    assert out["level"] == l and out["trend"] == b and out["forecast"] == l + b


def test_holt_linear_single_day(spark):
    import datetime

    df = spark.createDataFrame(
        [("k", datetime.datetime(2024, 3, 1), 2.5)],
        "event_type string, ts timestamp, value double",
    )
    out = ts_ops.holt_linear_daily(df, "event_type", "ts", "value").collect()[0]
    assert (out["level"], out["trend"], out["forecast"]) == (250.0, 0.0, 250.0)


def test_holt_linear_exact_linear_series_recovers_slope(spark):
    """On a perfectly linear series x_t = 5t the recurrence is exact:
    level tracks the line and trend equals the slope from step 1."""
    import datetime

    rows = [
        ("k", datetime.datetime(2024, 4, 1 + d, 8, 0, 0), 5.0 * d)
        for d in range(8)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = ts_ops.holt_linear_daily(df, "event_type", "ts", "value").collect()[0]
    assert out["trend"] == 500.0  # 5.0/day in cents
    assert out["level"] == 500.0 * 7


def test_kcenter_hand_points(spark):
    """2-D points (0,0),(0.1,0),(1,0),(0,1): seed = min id; the two
    distance-1 points follow (tie -> id asc), the close one last."""
    from datafusion_server_spark.operators import similarity as sim_ops

    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [0.25, 0.0]),  # float32-exact so d2 lands on the grid
            (3, [1.0, 0.0]),
            (4, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = sim_ops.kcenter_select(emb, k=4).orderBy("pick_order").collect()
    assert [r["vec_id"] for r in out] == [1, 3, 4, 2]
    assert out[0]["radius"] is None
    assert out[1]["radius"] == 10**12  # d2 = 1.0 in 1e-12 units
    assert out[2]["radius"] == 10**12
    assert out[3]["radius"] == 62_500_000_000  # d2 = 0.0625


def test_rake_hand_corpus(spark):
    """'deep learning of deep learning systems': word scores deg/freq
    give 'deep learning systems' 8.0 > 'deep learning' 5.0."""
    from datafusion_server_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "deep learning of deep learning systems")],
        "doc_id long, text string",
    )
    out = text_ops.rake_keywords(docs, "text", "doc_id", k=5).orderBy(
        "rank_pos"
    ).collect()
    assert [(r["phrase"], r["score_nano"]) for r in out] == [
        ("deep learning systems", 8_000_000_000),
        ("deep learning", 5_000_000_000),
    ]
    assert out[0]["n_words"] == 3 and out[1]["n_occurrences"] == 1


def test_rake_all_stopwords_doc_empty(spark):
    from datafusion_server_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "the of and to in is a")], "doc_id long, text string"
    )
    assert text_ops.rake_keywords(docs, "text", "doc_id").collect() == []


def test_poisson_bootstrap_ci_brackets_mean(spark):
    """On 200 iid rows the 95% CI must bracket the full-sample mean and
    the replicate weights must average ~1 (Poisson(1))."""
    from datafusion_server_spark.operators import profiling as prof_ops

    rows = [(i, 100 + (i * 37) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = prof_ops.poisson_bootstrap_mean(df, "doc_id", "n_chars").collect()[0]
    assert out["n_rows"] == 200 and out["n_replicates"] == 40
    assert out["boot_lo"] <= out["mean_full"] <= out["boot_hi"]
    assert out["boot_lo"] < out["boot_hi"]  # nondegenerate interval
    spread = out["boot_hi"] - out["boot_lo"]
    assert spread < 0.2 * out["mean_full"]  # sane width for n=200


def test_cramers_v_perfect_association_is_one(spark):
    from datafusion_server_spark.operators import profiling as prof_ops

    rows = [("x", 0)] * 10 + [("y", 1)] * 10
    df = spark.createDataFrame(rows, "a string, b long")
    out = prof_ops.cramers_v(df, "a", "b").collect()[0]
    assert out["v"] == 1.0 and out["chi2"] == 20.0


def test_cramers_v_independence_is_zero(spark):
    from datafusion_server_spark.operators import profiling as prof_ops

    rows = [(a, b) for a in ("x", "y") for b in (0, 1) for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b long")
    out = prof_ops.cramers_v(df, "a", "b").collect()[0]
    assert out["v"] == 0.0
