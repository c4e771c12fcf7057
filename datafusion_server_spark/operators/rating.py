"""Pairwise-preference rating: Bradley-Terry maximum-likelihood scores
from match outcomes — the model behind RLHF preference-data audits,
chatbot-arena-style leaderboards, and source-quality tournaments.

Bradley-Terry: P(i beats j) = s_i / (s_i + s_j). The standard MM
(minorization-maximization, Hunter 2004) update

    s_i' = W_i / sum_j ( n_ij / (s_i + s_j) )

(W_i = total wins of i, n_ij = matches between i and j) converges
monotonically from uniform initialization; a FIXED iteration count
makes the whole fit SQL-expressible, so the DuckDB oracle unrolls the
loop exactly like the k-means / logreg / DoReMi trainers.

Determinism contract (house rules): every division rounds to 8
decimals via shortest-repr HALF_UP (Spark ``ROUND(double, 8)``); the
per-opponent denominator terms sum as DECIMAL(18,8) (order-free exact),
so engines agree bit-for-bit at every iteration.

Scale shape (100 TB): matches aggregate to a PLAYERS^2-bounded matrix
first; every MM iteration is a join + aggregation over that bounded
matrix (the driver loops over the fixed iteration count, never over
rows). Player count is the cardinality of the rated entity (sources,
models, annotators) — thousands at most, never corpus-sized.

Degenerate cases (standard BT): a WINLESS player's MLE strength is 0 —
the MM update sends it there in one step and it stays (unit-tested).
The mirror case is an UNDEFEATED player, whose rating grows without
bound until every per-opponent denominator term rounds to 0 under the
8-decimal contract: when that (or any zero/NULL denominator) happens,
the player KEEPS its previous rating — the fit freezes rather than
snapping back to the 1.0 init (the discontinuity the r6 reset had).
Callers wanting a floor/ceiling add pseudo-matches upstream (the
arena-leaderboard regularization), which keeps the fit itself exactly
reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pairwise_matches_by_rank(
    df: DataFrame,
    player_col: str,
    score_col: Column,
    id_col: str,
    rounds: int = 10,
) -> DataFrame:
    """Deterministic tournament fixture: within each player (e.g.
    source), take the ``rounds`` smallest-id entries as that player's
    lineup (rank r = round r), then match rank-r vs rank-r across every
    player pair. Winner = higher score; ties break to the
    lexicographically smaller player (documented). Output: one row per
    match (p_win, p_lose) — players missing a rank simply sit that
    round out.

    Scale: one player-partitioned window (bounded per player by
    ``rounds``), then a rank-keyed self-join of a players*rounds-bounded
    table."""
    w = Window.partitionBy("p").orderBy(F.asc("id"))
    lineup = (
        df.select(
            F.col(player_col).alias("p"),
            F.col(id_col).alias("id"),
            score_col.cast("bigint").alias("s"),
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= rounds)
    )
    a = lineup.select(
        F.col("p").alias("pa"), F.col("s").alias("sa"), F.col("r").alias("r")
    )
    b = lineup.select(
        F.col("p").alias("pb"), F.col("s").alias("sb"), F.col("r").alias("r")
    )
    m = a.join(b, "r").filter(F.col("pa") < F.col("pb"))
    win_a = (F.col("sa") > F.col("sb")) | (F.col("sa") == F.col("sb"))
    return m.select(
        F.when(win_a, F.col("pa")).otherwise(F.col("pb")).alias("p_win"),
        F.when(win_a, F.col("pb")).otherwise(F.col("pa")).alias("p_lose"),
    )


def bradley_terry_ratings(
    matches: DataFrame, iterations: int = 8
) -> DataFrame:
    """Fit Bradley-Terry scores to a (p_win, p_lose) match table with
    ``iterations`` MM updates from uniform init (1.0). Output:
    (player, rating, wins, matches) — rating rounded to 6.

    The match table aggregates ONCE to the players^2-bounded (i, j,
    n_ij) matrix + per-player win counts; each iteration joins current
    ratings onto the matrix (players-bounded broadcast), computes the
    DECIMAL-summed denominator, and produces the next ratings. All
    iteration state is players-bounded."""
    # undirected match matrix (i < j) + per-player wins
    pairs = matches.select(
        F.least("p_win", "p_lose").alias("i"),
        F.greatest("p_win", "p_lose").alias("j"),
    ).groupBy("i", "j").agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
    wins = matches.groupBy(F.col("p_win").alias("p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )
    played = (
        matches.select(F.col("p_win").alias("p"))
        .unionByName(matches.select(F.col("p_lose").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    players = played.join(wins, "p", "left").select(
        "p",
        F.coalesce("w", F.lit(0)).cast("bigint").alias("w"),
        "m",
    )
    # symmetric adjacency for the denominator sum
    adj = pairs.select("i", "j", "n_ij").unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "n_ij")
    )
    # --- bounded-state fold (r8) -------------------------------------
    # The corpus-scale work above aggregated matches down to the
    # players^2-bounded (adj, players) matrices. The r7 shape then ran
    # the MM loop as `iterations` chained join+agg stages with an eager
    # localCheckpoint + 3 broadcasts per step — 33 driver-scheduled
    # jobs whose scheduling overhead (~0.09 s each, measured) WAS the
    # query's wall time (profiled r8: fit 3.0 s / 33 jobs at sf0.1).
    # Since the fit state is players-bounded BY CONTRACT (rated
    # entities: sources / models / annotators — thousands at most,
    # docstring above), fold both matrices into ONE row and run every
    # MM iteration as JVM higher-order-function expressions: one job,
    # zero shuffles in the loop. The arithmetic is IDENTICAL
    # (round(double, 8) per term, exact DECIMAL accumulation — decimal
    # addition is associative, so aggregate() matches SUM()), which
    # keeps the unrolled SQL oracles byte-identical. At the contract
    # ceiling (1000 players, ~1e6 adjacency entries) the folded row is
    # a few tens of MB and each iteration is ~1e6 fused multiply-adds
    # in one task — far cheaper than 33 cluster-wide job launches.
    adj_rows = adj.groupBy("i").agg(
        F.array_sort(F.collect_list(F.struct("j", "n_ij"))).alias("al")
    )
    arow = adj_rows.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("i", "al")))
        ).alias("adjm")
    )
    prow = players.agg(
        F.array_sort(F.collect_list(F.struct("p", "w", "m"))).alias("ps")
    )
    row = prow.crossJoin(F.broadcast(arow))
    ps = F.col("ps")
    row = row.withColumn(
        "rmap",
        F.map_from_entries(
            F.transform(ps, lambda pl: F.struct(pl["p"], F.lit(1.0)))
        ),
    )
    # NOTE: rmap is referenced 3x in the iteration body (two denominator
    # lookups + the carry-forward), which blocks Catalyst's
    # CollapseProject from inlining the previous iteration's map into
    # per-element lookups — the inlining is an exponential-evaluation
    # trap measured and documented in graph._pagerank_folded. r13: the
    # loop body is SQL-string selectExpr stages — the Column-lambda form
    # cost ~700 py4j round-trips per iteration; the parsed operators and
    # DECIMAL/rounding arithmetic are identical, keeping the unrolled
    # SQL oracles byte-identical.
    # per player: DECIMAL-summed denominator (NULL when the player has
    # no opponents — element_at misses -> aggregate(NULL) is NULL,
    # matching the r7 left-join semantics) + previous rating. Zero/NULL
    # denominator (an isolated player, or an undefeated player whose
    # per-opponent terms all rounded to 0 as its rating grew): carry
    # the PREVIOUS rating forward — resetting to the 1.0 init would
    # snap a monotonically growing rating back down mid-fit.
    it_sql = (
        "TRANSFORM(ps, pl -> STRUCT("
        "pl.p AS p, pl.w AS w, "
        "CAST(AGGREGATE(ELEMENT_AT(adjm, pl.p), CAST(0 AS DECIMAL(28,8)), "
        "(acc, a) -> CAST(acc + CAST(ROUND(CAST(a.n_ij AS DOUBLE) / "
        "(ELEMENT_AT(rmap, pl.p) + ELEMENT_AT(rmap, a.j)), 8) "
        "AS DECIMAL(18,8)) AS DECIMAL(28,8))) AS DOUBLE) AS d, "
        "ELEMENT_AT(rmap, pl.p) AS prev))"
    )
    rmap_sql = (
        "MAP_FROM_ENTRIES(TRANSFORM(it, x -> STRUCT("
        "x.p, CASE WHEN x.d IS NOT NULL AND x.d > 0 "
        "THEN ROUND(CAST(x.w AS DOUBLE) / x.d, 8) ELSE x.prev END)))"
    )
    for t in range(iterations):
        row = row.selectExpr("ps", "adjm", "rmap", f"{it_sql} AS it")
        row = row.selectExpr("ps", "adjm", f"{rmap_sql} AS rmap")
    rmap = F.col("rmap")
    out = row.select(
        F.explode(
            F.transform(
                ps,
                lambda pl: F.struct(
                    pl["p"].alias("player"),
                    F.round(F.element_at(rmap, pl["p"]), 6).alias("rating"),
                    pl["w"].alias("wins"),
                    pl["m"].alias("matches"),
                ),
            )
        ).alias("r")
    )
    return out.select("r.player", "r.rating", "r.wins", "r.matches")
