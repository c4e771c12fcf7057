"""Unit tests for the graph-analytics operators: hand-computed
PageRank recurrence, known-graph triangle counts, degree histograms,
and the integer-arithmetic contracts."""

from __future__ import annotations

import pytest

from datafusion_server_spark.operators import graph


def _pagerank_py(edges, iterations=5, damping_pct=85):
    """Driver-side replay of the exact integer recurrence."""
    agg: dict[tuple, int] = {}
    for s, d, w in edges:
        agg[(s, d)] = agg.get((s, d), 0) + w
    outw: dict[object, int] = {}
    for (s, _d), w in agg.items():
        outw[s] = outw.get(s, 0) + w
    prop = {(s, d): (w * graph.PROP_ONE) // outw[s] for (s, d), w in agg.items()}
    nodes = sorted({s for s, _ in agg} | {d for _, d in agg})
    n = len(nodes)
    init = graph.RANK_ONE // n
    tele = (graph.RANK_ONE * (100 - damping_pct) // 100) // n
    r = {v: init for v in nodes}
    for _ in range(iterations):
        s_in: dict[object, int] = {}
        for (u, v), p in prop.items():
            s_in[v] = s_in.get(v, 0) + (r[u] * p) // graph.PROP_ONE
        r = {v: tele + (damping_pct * s_in.get(v, 0)) // 100 for v in nodes}
    return r


@pytest.fixture(scope="module")
def tiny_edges(spark):
    rows = [
        ("a", "b", 3),
        ("a", "c", 1),
        ("b", "c", 2),
        ("c", "a", 5),
        ("d", "a", 1),  # d is a source-only node (gets teleport only)
    ]
    return rows, spark.createDataFrame(rows, ["src", "dst", "w"])


def test_pagerank_matches_hand_recurrence(spark, tiny_edges):
    rows, df = tiny_edges
    got = {
        r["id"]: r["rank_nano"]
        for r in graph.pagerank(df, "src", "dst", "w").collect()
    }
    assert got == _pagerank_py(rows)


def test_pagerank_mass_bounded_and_sink_heavy(spark, tiny_edges):
    rows, df = tiny_edges
    got = {
        r["id"]: r["rank_nano"]
        for r in graph.pagerank(df, "src", "dst", "w").collect()
    }
    assert sum(got.values()) <= graph.RANK_ONE
    # a (fed by the heavy c->a edge) must outrank the source-only d
    assert got["a"] > got["d"]
    # every node keeps at least the teleport floor
    assert all(v > 0 for v in got.values())


def test_pagerank_unweighted_default(spark, tiny_edges):
    rows, df = tiny_edges
    got = {
        r["id"]: r["rank_nano"]
        for r in graph.pagerank(df.select("src", "dst"), "src", "dst").collect()
    }
    assert got == _pagerank_py([(s, d, 1) for s, d, _ in rows])


def test_pagerank_weight_overflow_refused(spark):
    df = spark.createDataFrame([("a", "b", 2**62), ("b", "a", 1)], ["src", "dst", "w"])
    with pytest.raises(Exception, match="overflow"):
        graph.pagerank(df, "src", "dst", "w", iterations=1).collect()


def test_pagerank_zero_iterations_uniform(spark, tiny_edges):
    rows, df = tiny_edges
    got = {
        r["id"]: r["rank_nano"]
        for r in graph.pagerank(df, "src", "dst", "w", iterations=0).collect()
    }
    assert set(got.values()) == {graph.RANK_ONE // 4}


def test_triangles_on_k4(spark):
    # K4 on {1,2,3,4}: 4 triangles, each node in C(3,2) = 3 of them
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(edges, ["pa", "pb"])
    got = {
        r["node"]: r["n_triangles"]
        for r in graph.triangle_participation(df).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_none_on_path(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["pa", "pb"])
    assert graph.triangle_participation(df).count() == 0


def test_degree_histogram_star(spark):
    # star: center 1 with leaves 2..5 -> one degree-4 node, four degree-1
    df = spark.createDataFrame([(1, k) for k in range(2, 6)], ["pa", "pb"])
    got = {
        r["degree"]: r["n_nodes"] for r in graph.degree_histogram(df).collect()
    }
    assert got == {4: 1, 1: 4}


def test_copurchase_edges_oriented_distinct(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 10), (2, 20), (2, 10), (3, 30)],
        ["l_orderkey", "l_partkey"],
    )
    got = {
        (r["pa"], r["pb"]) for r in graph.copurchase_edges(li).collect()
    }
    assert got == {(10, 20)}


def test_pagerank_folded_equals_loop_on_dense_graph(spark):
    """r8: the bounded-graph fold must reproduce the distributed loop's
    exact bigint recurrence. A 30-node pseudo-random dense graph (~200
    edges, deterministic arithmetic weights) also guards the
    CollapseProject trap: before the multi-reference carry guard this
    shape blew up exponentially in iterations (1.8 s -> 16 s from 2 to
    3 iterations at sf0.001) instead of staying flat."""
    rows = [
        (a, (a * 7 + k * 13) % 30, (a * k) % 9 + 1)
        for a in range(30)
        for k in range(1, 8)
        if (a * 7 + k * 13) % 30 != a
    ]
    edges = spark.createDataFrame(rows, "src int, dst int, w int")
    for iters in (3, 7):
        f = {
            r["id"]: r["rank_nano"]
            for r in graph.pagerank(
                edges, "src", "dst", "w", iterations=iters, folded=True
            ).collect()
        }
        l = {
            r["id"]: r["rank_nano"]
            for r in graph.pagerank(
                edges, "src", "dst", "w", iterations=iters, checkpoint=False
            ).collect()
        }
        assert f == l and len(f) == 30


def test_pagerank_folded_empty_edges_matches_loop(spark):
    """r9 (ADVICE): folded=True on an EMPTY edge set must return [] like
    the distributed loop — the one-row fold previously evaluated
    div(RANK_ONE, 0), which raises under ANSI mode (Spark 4 default)."""
    edges = spark.createDataFrame([], "src int, dst int, w int")
    assert graph.pagerank(edges, "src", "dst", "w", folded=True).collect() == []
    assert graph.pagerank(edges, "src", "dst", "w", checkpoint=False).collect() == []
