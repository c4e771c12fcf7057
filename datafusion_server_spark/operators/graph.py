"""Graph analytics over DataFrame edge lists: weighted PageRank,
triangle counting, degree statistics.

Beyond-reference family (the reference server has no graph operators;
SURVEY.md §2 extension): the three classic relational-expressible graph
primitives a curation pipeline meets — ranking entities in a derived
relation graph (PageRank over the customer-nation -> supplier-nation
trade graph), cohesion measurement (triangle counts over a co-purchase
graph), and structure profiling (degree distribution).

Scale notes (100 TB): each PageRank iteration is ONE join (ranks into
the per-source edge-proportion table, keyed by source) plus ONE
aggregation (contributions keyed by destination) — the textbook
data-parallel Pregel formulation; the driver loops over the bounded
iteration count, never over rows, and lineage is truncated with an
eager ``localCheckpoint`` per iteration exactly like the
connected-components operator (operators/dedup.py). Triangle counting
orients every edge low-id -> high-id so each triangle is counted once
and the wedge join fans out on the smaller endpoint's out-degree; the
wedge stream is candidates-only (never the full V x V square).

Determinism: PageRank runs ENTIRELY in integer arithmetic — ranks are
held in 1e-9 mass units (BIGINT), per-source edge proportions in 1e-6
units, and every per-iteration sum is an order-independent exact
integer sum, so the result is bit-identical on any partitioning and in
any engine (Spark ``DIV`` and DuckDB ``//`` agree on the non-negative
integers used here). Weights must satisfy ``w * 1_000_000 < 2**63``
per (src, dst) group — at extreme scale pre-aggregate weights into
coarser units (e.g. whole currency units instead of scaled cents)
before calling; the contract is asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_server_spark.operators.scale import ranked_topk

RANK_ONE = 1_000_000_000  # total rank mass, in 1e-9 units
PROP_ONE = 1_000_000  # per-source edge proportion denominator

# w * PROP_ONE must stay inside BIGINT.
_MAX_WEIGHT = (2**63 - 1) // PROP_ONE


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    weight_col: str | None = None,
    iterations: int = 5,
    damping_pct: int = 85,
    checkpoint: bool = True,
    folded: bool = False,
) -> DataFrame:
    """(id, rank_nano BIGINT): integer-arithmetic weighted PageRank.

    ``rank_nano`` is the node's rank in 1e-9 units of the total mass.
    Dangling mass (nodes with no out-edges) is dropped each step — the
    standard "dangling nodes donate nothing" convention, stated here so
    the semantics are exact rather than implementation-defined.

    ``folded=True`` is the BOUNDED-graph fast path (r8, the
    bradley_terry_ratings / top_component_power bounded-state fold):
    after the corpus-scale edge aggregation, the (prop, nodes) state
    collapses into ONE row and every iteration runs as JVM
    higher-order-function expressions — one job, no driver count(), no
    per-iteration stages. The arithmetic is the IDENTICAL bigint
    recurrence (exact ``div``), so oracles are unchanged. Callers opt
    in ONLY when the node set is bounded by an entity cardinality
    (nations, domains, sources — thousands at most); for corpus-scale
    graphs (doc-similarity edges) keep the default distributed Pregel
    loop, whose per-iteration state is partitioned across the cluster.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    agg = e.groupBy("src", "dst").agg(F.sum("w").cast("bigint").alias("w"))
    outw = agg.groupBy("src").agg(F.sum("w").cast("bigint").alias("out_w"))
    prop = agg.join(outw, "src").select(
        "src",
        "dst",
        F.expr(
            f"CAST(IF(w > {_MAX_WEIGHT}, "
            "raise_error('pagerank: weight overflow — pre-scale weights'), "
            f"(w * {PROP_ONE}) DIV out_w) AS BIGINT)"
        ).alias("p"),
    )
    if folded:
        return _pagerank_folded(prop, iterations, damping_pct)
    prop = prop.persist()
    nodes = (
        agg.select(F.col("src").alias("id"))
        .union(agg.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0).cast("bigint").alias("rank_nano"))
    init = RANK_ONE // n
    tele = (RANK_ONE * (100 - damping_pct) // 100) // n
    ranks = nodes.select("id", F.lit(init).cast("bigint").alias("r"))
    for _ in range(iterations):
        contrib = (
            prop.join(ranks, prop.src == ranks.id)
            .groupBy("dst")
            .agg(
                F.sum(F.expr(f"(r * p) DIV {PROP_ONE}")).cast("bigint").alias("s")
            )
        )
        ranks = nodes.join(contrib, nodes.id == contrib.dst, "left").select(
            nodes.id,
            F.expr(f"CAST({tele} + (({damping_pct} * coalesce(s, 0)) DIV 100) AS BIGINT)").alias(
                "r"
            ),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("id", F.col("r").alias("rank_nano"))


def _pagerank_folded(
    prop: DataFrame, iterations: int, damping_pct: int
) -> DataFrame:
    """Bounded-graph fold of the pagerank loop (see ``pagerank``'s
    ``folded`` doc): identical bigint recurrence over one-row arrays."""
    by_dst = prop.groupBy("dst").agg(
        F.array_sort(F.collect_list(F.struct("src", "p"))).alias("pl")
    )
    prow = by_dst.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("dst", "pl")))
        ).alias("pm")
    )
    nrow = (
        prop.select(F.col("src").alias("id"))
        .union(prop.select(F.col("dst").alias("id")))
        .distinct()
        .agg(F.array_sort(F.collect_list("id")).alias("ns"))
    )
    row = nrow.crossJoin(F.broadcast(prow))
    # An empty prop still yields ONE agg row on both sides (ns = []),
    # and the final explode emits 0 rows — but init/tele would evaluate
    # div(RANK_ONE, 0), which raises under ANSI mode (Spark 4 default).
    # Guard the n == 0 row so folded matches the loop's empty result.
    big = lambda v: F.lit(v).cast("bigint")  # noqa: E731
    zero_guard = lambda c: F.when(F.col("n") > 0, c).otherwise(  # noqa: E731
        F.lit(0).cast("bigint")
    )
    row = row.withColumn("n", F.size("ns").cast("bigint"))
    row = row.withColumn(
        "init", zero_guard(F.call_function("div", big(RANK_ONE), F.col("n")))
    )
    row = row.withColumn(
        "tele",
        zero_guard(
            F.call_function(
                "div", big(RANK_ONE * (100 - damping_pct) // 100), F.col("n")
            )
        ),
    )
    row = row.withColumn(
        "rmap",
        F.map_from_entries(
            F.transform(F.col("ns"), lambda i: F.struct(i, F.col("init")))
        ),
    )
    # The previous map is referenced SEVERAL times in the iteration body
    # (per-edge lookup + the carry guard). That multiplicity matters
    # beyond style: Catalyst's CollapseProject inlines a projection
    # whose alias the consumer references only ONCE, which here would
    # rebuild the entire previous-iteration map PER EDGE LOOKUP —
    # measured exponential blowup (sf0.001 trade graph: iters 2 -> 3
    # went 1.8 s -> 16 s before the guard; flat after). The carry guard
    # mirrors bradley_terry_ratings' convention (a node missing previous
    # state keeps it) and keeps every iteration a materialized one-row
    # projection. r13: the body is ONE SQL-string selectExpr per
    # iteration — the Column-lambda form cost ~400 py4j round-trips per
    # iteration; parsed operators and bigint DIV arithmetic identical.
    rmap_sql = (
        "MAP_FROM_ENTRIES(TRANSFORM(ns, i -> STRUCT(i, "
        "CASE WHEN ELEMENT_AT(rmap, i) IS NOT NULL THEN "
        f"tele + DIV(CAST({damping_pct} AS BIGINT) * "
        "COALESCE(AGGREGATE(ELEMENT_AT(pm, i), CAST(0 AS BIGINT), "
        "(acc, ed) -> acc + DIV(ELEMENT_AT(rmap, ed.src) * ed.p, "
        f"CAST({PROP_ONE} AS BIGINT))), CAST(0 AS BIGINT)), "
        "CAST(100 AS BIGINT)) "
        "ELSE ELEMENT_AT(rmap, i) END)))"
    )
    for _ in range(iterations):
        row = row.selectExpr(
            "ns", "pm", "n", "init", "tele", f"{rmap_sql} AS rmap"
        )
    rmap = F.col("rmap")
    return row.select(
        F.explode(
            F.transform(
                F.col("ns"),
                lambda i: F.struct(
                    i.alias("id"), F.element_at(rmap, i).alias("rank_nano")
                ),
            )
        ).alias("x")
    ).select("x.id", "x.rank_nano")


def pagerank_oracle_ctes(
    edges_sql: str, iterations: int = 5, damping_pct: int = 85
) -> str:
    """The WITH-chain prefix of the DuckDB oracle for :func:`pagerank`:
    the driver-loop unrolled into ``iterations`` chained CTEs (the house
    pattern for fixed-iteration algorithms — an independent engine
    replays the same exact integer recurrence). The final CTE is
    ``r{iterations}`` with columns (id, r).
    """
    parts = [
        f"edges AS MATERIALIZED ({edges_sql})",
        "eagg AS MATERIALIZED (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w"
        " FROM edges GROUP BY src, dst)",
        "outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM eagg GROUP BY src)",
        f"prop AS MATERIALIZED (SELECT a.src, a.dst,"
        f" CAST((a.w * {PROP_ONE}) // o.out_w AS BIGINT) AS p"
        " FROM eagg a JOIN outw o ON o.src = a.src)",
        "nodes AS MATERIALIZED (SELECT src AS id FROM eagg"
        " UNION SELECT dst FROM eagg)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"r0 AS (SELECT id, CAST({RANK_ONE} // n AS BIGINT) AS r FROM nodes, nn)",
    ]
    tele = f"{RANK_ONE * (100 - damping_pct) // 100} // nn.n"
    for i in range(1, iterations + 1):
        parts.append(
            f"r{i} AS (SELECT n.id,"
            f" CAST(({tele}) + (({damping_pct} * COALESCE(c.s, 0)) // 100) AS BIGINT) AS r"
            " FROM nodes n CROSS JOIN nn"
            " LEFT JOIN (SELECT p.dst,"
            f" CAST(SUM((r.r * p.p) // {PROP_ONE}) AS BIGINT) AS s"
            f" FROM prop p JOIN r{i - 1} r ON r.id = p.src GROUP BY p.dst) c"
            " ON c.dst = n.id)"
        )
    return "WITH " + ",\n".join(parts)


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """(pa, pb) with pa < pb: distinct unordered part pairs that appear
    in the same order — an orderkey-keyed equi-self-join (co-partitioned
    at scale; never a cross product) followed by one distinct."""
    a = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    return (
        a.join(b, ["ok"])
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )


def triangle_participation(edges: DataFrame) -> DataFrame:
    """(node, n_triangles BIGINT) from an oriented (pa < pb) distinct
    edge list: wedge join (e1.pb = e2.pa) closed by an edge-existence
    join, then each triangle credited to its three corners.

    The edge list is persisted first — it feeds all three join legs, and
    without materialization Spark would recompute the upstream edge
    derivation (a distinct over a self-join here) three times; at
    warehouse scale swap the persist for a staging write."""
    edges = edges.persist()
    e1 = edges.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = edges.select(F.col("pa").alias("b2"), F.col("pb").alias("c"))
    e3 = edges.select(F.col("pa").alias("a3"), F.col("pb").alias("c3"))
    tri = (
        e1.join(e2, e1.b == e2.b2)
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(degree BIGINT, n_nodes BIGINT) over an oriented distinct edge
    list — the undirected degree of each node, then the histogram."""
    ends = edges.select(F.col("pa").alias("node")).unionAll(
        edges.select(F.col("pb").alias("node"))
    )
    deg = ends.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, label): synchronous label propagation communities over an
    oriented distinct edge list (pa, pb) — Raghavan et al. 2007, the
    deterministic sync variant: every node starts labeled with its own
    id and each round adopts the label held by the PLURALITY of its
    neighbors, ties broken to the SMALLEST label (no randomness, no
    self-vote), for a fixed round count.

    Determinism: the update is an integer argmax (count DESC, label
    ASC) — exact on any engine/partitioning.

    Scale shape (100 TB): each round is ONE join (labels into the
    adjacency list, keyed by neighbor) + ONE grouped argmax keyed by
    (node, label) then node — the Pregel message-passing step written
    relationally. The node set is corpus-scale, so there is no bounded
    fold here (contrast pagerank's ``folded=True``, which is gated to
    entity-bounded graphs); the driver loops over the FIXED round
    count, never over rows, and lineage is truncated per round.
    """
    # the adjacency list feeds every round's join — materialize it once
    # (at warehouse scale swap the persist for a staging write, exactly
    # like triangle_participation)
    adj = edges.select(
        F.col("pa").alias("node"), F.col("pb").alias("nbr")
    ).unionAll(
        edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr"))
    ).persist()
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iterations):
        votes = (
            adj.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label").alias("nl")
                ),
                "nbr",
            )
            .groupBy("node", "nl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("node").orderBy(
            F.col("c").desc(), F.col("nl").asc()
        )
        labels = (
            votes.select(
                "node", F.col("nl").alias("label"), F.row_number().over(w).alias("rn")
            )
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels


def label_propagation_oracle_ctes(edges_sql: str, iterations: int = 3) -> str:
    """DuckDB WITH-chain mirroring :func:`label_propagation` — the house
    unrolled-iteration oracle pattern (cf. pagerank_oracle_ctes)."""
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        "adj AS (SELECT pa AS node, pb AS nbr FROM e"
        " UNION ALL SELECT pb AS node, pa AS nbr FROM e)",
        "l0 AS (SELECT node, node AS label FROM (SELECT DISTINCT node FROM adj))",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"l{i} AS (SELECT node, label FROM ("
            " SELECT a.node, l.label, COUNT(*) AS c,"
            " ROW_NUMBER() OVER (PARTITION BY a.node"
            "                    ORDER BY COUNT(*) DESC, l.label ASC) AS rn"
            f" FROM adj a JOIN l{i - 1} l ON l.node = a.nbr"
            " GROUP BY a.node, l.label) t WHERE rn = 1)"
        )
    return "WITH " + ",\n".join(parts)


RA_ONE = 1_000_000_000_000  # resource-allocation unit mass, in 1e-12 units


def resource_allocation_topk(edges: DataFrame, k: int = 20) -> DataFrame:
    """Link prediction over an oriented (``pa < pb``) distinct edge
    list: the top-``k`` NON-adjacent pairs by Resource-Allocation index
    RA(u, v) = sum over common neighbors z of 1/deg(z) (Zhou/Lu/Zhang's
    RA score — like Adamic-Adar but with 1/deg instead of 1/ln(deg),
    which keeps the math exact: ``RA_ONE // deg`` is pure BIGINT
    division, so partial sums are order-free and bit-identical in both
    engines; a log-based score would hinge on libm ulp agreement).

    Output: (u, v, common_neighbors, ra_pico, rank_pos) — ``ra_pico``
    the exact scaled-BIGINT score, ``rank_pos`` 1-based by
    (ra_pico DESC, u, v).

    Scale shape: adjacency = edges both ways (2|E| rows); the wedge
    enumeration is an equi-self-join on the shared-neighbor key (never
    a cross product — cost = sum over z of deg(z)^2, the same budget
    the triangle counter pays), the degree attaches on that same key
    before grouping, existing edges leave via one anti-join, and the
    global top-k is TakeOrderedAndProject (per-partition heads only).
    The edge list is persisted — it feeds the wedge join twice plus the
    anti-join; at warehouse scale swap the persist for a staging write.
    """
    edges = edges.persist()
    adj = edges.select(F.col("pa").alias("node"), F.col("pb").alias("nb")).unionAll(
        edges.select(F.col("pb").alias("node"), F.col("pa").alias("nb"))
    )
    deg = adj.groupBy("nb").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    a1 = adj.select(F.col("node").alias("u"), "nb")
    a2 = adj.select(F.col("node").alias("v"), "nb")
    wedges = (
        a1.join(a2, ["nb"])
        .filter(F.col("u") < F.col("v"))
        .join(deg, ["nb"])
    )
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        F.sum(F.expr(f"{RA_ONE} div deg")).cast("bigint").alias("ra_pico"),
    )
    non_adjacent = scored.join(
        edges,
        (scored.u == edges.pa) & (scored.v == edges.pb),
        "left_anti",
    )
    return ranked_topk(
        non_adjacent,
        [F.desc("ra_pico"), F.asc("u"), F.asc("v")],
        k,
        rank_col="rank_pos",
    )
