"""Bradley-Terry rating tests (operators/rating.py): fixture shapes
with hand-checkable outcomes + the degenerate cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark.operators import rating


def _matches(spark, rows):
    return spark.createDataFrame(rows, "p_win string, p_lose string")


def test_dominant_player_rates_highest(spark):
    m = _matches(
        spark,
        [("a", "b")] * 4 + [("a", "c")] * 4 + [("b", "c")] * 2 + [("c", "b")] * 2,
    )
    out = {r["player"]: r for r in rating.bradley_terry_ratings(m).collect()}
    assert out["a"]["rating"] > out["b"]["rating"]
    assert out["a"]["wins"] == 8 and out["a"]["matches"] == 8
    # b and c split their head-to-head and share the losses to a
    assert abs(out["b"]["rating"] - out["c"]["rating"]) < 1e-6


def test_symmetric_round_robin_is_uniform(spark):
    # every pair splits 1-1: the MM update must keep everyone equal
    players = ["a", "b", "c", "d"]
    rows = []
    for i, p in enumerate(players):
        for q in players[i + 1 :]:
            rows += [(p, q), (q, p)]
    out = rating.bradley_terry_ratings(_matches(spark, rows)).collect()
    ratings = {r["rating"] for r in out}
    assert len(ratings) == 1 and all(r["matches"] == 6 for r in out)


def test_winless_player_converges_to_zero(spark):
    """BT maximum likelihood for a winless player is s -> 0 (the
    likelihood increases monotonically as its strength vanishes) — the
    documented degenerate case; add pseudo-matches upstream if a floor
    is wanted."""
    m = _matches(spark, [("a", "z"), ("b", "z"), ("a", "b"), ("b", "a")])
    out = {r["player"]: r for r in rating.bradley_terry_ratings(m).collect()}
    assert out["z"]["wins"] == 0
    assert out["z"]["rating"] == 0.0
    assert out["a"]["rating"] == out["b"]["rating"] > 0


def test_pairwise_matches_by_rank_fixture_shape(spark):
    df = spark.createDataFrame(
        [(1, "s1", 10), (2, "s1", 30), (3, "s2", 20), (4, "s2", 5), (5, "s3", 20)],
        "id long, src string, score long",
    )
    m = rating.pairwise_matches_by_rank(df, "src", F.col("score"), "id", rounds=2)
    got = {(r["p_win"], r["p_lose"]) for r in m.collect()}
    # rank 1: s1(10) vs s2(20) -> s2; s1(10) vs s3(20) -> s3; s2(20) vs s3(20) tie -> s2
    # rank 2: s1(30) vs s2(5) -> s1; s3 sits out (no rank-2 doc)
    assert got == {("s2", "s1"), ("s3", "s1"), ("s2", "s3"), ("s1", "s2")}


def test_pass_at_k_hand_computed_cases(spark):
    """pass@k against hand-computed binomials: n=10,c=2,k=5 ->
    1 - C(8,5)/C(10,5) = 1 - 56/252; plus the exact-1 zero-binomial
    branch and the n<k clamp."""
    from datafusion_server_spark.queries.classifier import _pass_product

    df = spark.createDataFrame(
        [(1, 10, 2), (2, 10, 6), (3, 3, 1), (4, 7, 0), (5, 4, 4)],
        "task long, n long, c long",
    )
    from pyspark.sql import functions as F

    out = {
        r["task"]: r["p"]
        for r in df.select(
            "task", F.round(F.expr(_pass_product("n", "c", 5)), 6).alias("p")
        ).collect()
    }
    assert abs(out[1] - (1 - 56 / 252)) < 1e-6
    assert out[2] == 1.0  # n-c=4 < k -> C(4,5)=0 -> pass=1 exactly
    assert out[3] == 1.0  # n<k clamps to k=3; n-c=2 < 3 -> 1
    assert out[4] == 0.0  # zero successes -> product = 1 -> pass = 0
    assert out[5] == 1.0  # all successes


def test_undefeated_player_grows_monotone_never_resets(spark):
    """An UNDEFEATED player's rating grows with iteration count and
    never snaps back toward the 1.0 init: the zero/NULL-denominator
    branch carries the PREVIOUS rating forward (the r6 form reset it to
    1.0, a mid-fit discontinuity once the rounded per-opponent terms
    hit 0)."""
    m = _matches(spark, [("a", "b")] * 4 + [("b", "c"), ("c", "b")])
    prev = 0.0
    for it in (2, 4, 8):
        out = {
            r["player"]: r["rating"]
            for r in rating.bradley_terry_ratings(m, iterations=it).collect()
        }
        assert out["a"] > 1.0
        assert out["a"] >= prev
        prev = out["a"]
