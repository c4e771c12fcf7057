"""Graph-analytics queries: PageRank over the nation trade graph,
triangle counts and the degree histogram over the part co-purchase
graph. Beyond-reference family (SURVEY.md §2 extensions).

Determinism: PageRank is all-integer (operators/graph.py); its oracle
is the driver loop unrolled into a CTE chain (the house pattern for
fixed-iteration algorithms). Edge weights are exact integer products
``ROUND(price*100) * ROUND((1-disc)*100)`` — each factor is within
1e-9 of an integer, so ROUND agrees across engines (a single
``ROUND(product)`` of a 4-decimal value would not: .50-exact decimals
round differently on shortest-repr vs binary doubles). Triangle /
degree queries are exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_server_spark import tables
from datafusion_server_spark.operators import graph
from datafusion_server_spark.operators.scale import ranked_topk
from datafusion_server_spark.queries import df_query, rrepr

_PR_ITERS = 5

_TRADE_EDGES_SQL = """
SELECT cn.n_name AS src, sn.n_name AS dst,
       CAST(ROUND(l.l_extendedprice * 100) * ROUND((1 - l.l_discount) * 100) AS BIGINT) AS w
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
"""

_PAGERANK_ORACLE = (
    graph.pagerank_oracle_ctes(_TRADE_EDGES_SQL, iterations=_PR_ITERS)
    + f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, id ASC) AS BIGINT) AS rank_pos,
       id AS nation, r AS rank_nano,
       {rrepr(f"CAST(r AS DOUBLE) / {graph.RANK_ONE}", 9)} AS rank
FROM r{_PR_ITERS}
"""
)


@df_query("graph_pagerank_trade", _PAGERANK_ORACLE)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer-nation -> supplier-nation
    trade graph (edge weight = discounted revenue in exact 1e-4
    currency units). The 6-way join reduces 100 TB of lineitem to a
    |nations|^2-row edge list in one pass (broadcast dims, single fact
    scan — the q5 shape); the iteration then runs on the reduced graph.
    """
    li = tables.load(spark, sf_dir, "lineitem")
    o = tables.load(spark, sf_dir, "orders")
    c = tables.load(spark, sf_dir, "customer")
    s = tables.load(spark, sf_dir, "supplier")
    n = tables.load(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .select(
            "src",
            "dst",
            (
                F.round(F.col("l_extendedprice") * 100)
                * F.round((F.lit(1.0) - F.col("l_discount")) * 100)
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    # folded=True: the node set is the NATION list (25 — entity-
    # cardinality-bounded), so the bounded-state fold runs the whole
    # fixed-iteration recurrence as one job (r8; identical bigint math)
    ranks = graph.pagerank(
        edges, "src", "dst", "w", iterations=_PR_ITERS, folded=True
    )
    # bounded window: ranks the graph-node-bounded rating table (25
    # nations here; node count is the entity cardinality, not corpus)
    wr = Window.orderBy(F.desc("rank_nano"), F.asc("id"))
    return ranks.select(
        F.row_number().over(wr).cast("bigint").alias("rank_pos"),
        F.col("id").alias("nation"),
        "rank_nano",
        F.round(F.col("rank_nano").cast("double") / graph.RANK_ONE, 9).alias("rank"),
    )


_COPURCHASE_SQL = """
SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""

_TRI_K = 20

_TRIANGLES_ORACLE = f"""
WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
tri AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM e e1 JOIN e e2 ON e1.pb = e2.pa
  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri),
per_node AS (
  SELECT CAST(node AS BIGINT) AS part, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM corners GROUP BY node)
SELECT part, n_triangles, CAST(rnk AS BIGINT) AS rank_pos
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_triangles DESC, part ASC) AS rnk
      FROM per_node) t
WHERE rnk <= {_TRI_K}
"""


@df_query("graph_triangles_copurchase", _TRIANGLES_ORACLE)
def graph_triangles_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} parts by triangle participation in the co-purchase
    graph. The edge list is an orderkey-keyed equi-self-join (one
    shuffle, co-partitioned); the wedge join fans out on oriented
    degree only."""
    li = tables.load(spark, sf_dir, "lineitem")
    edges = graph.copurchase_edges(li)
    per_node = graph.triangle_participation(edges)
    # one row per graph node — scales with the corpus, so the top-k is
    # TakeOrderedAndProject with the rank assigned on the k survivors
    return ranked_topk(
        per_node, [F.desc("n_triangles"), F.asc("node")], _TRI_K, "rank_pos"
    ).select(
        F.col("node").cast("bigint").alias("part"), "n_triangles", "rank_pos"
    )


_DEGREE_ORACLE = f"""
WITH e AS MATERIALIZED ({_COPURCHASE_SQL}),
ends AS (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM ends GROUP BY node)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree
"""


@df_query("graph_degree_histogram", _DEGREE_ORACLE)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — two aggregations
    over the oriented edge list."""
    li = tables.load(spark, sf_dir, "lineitem")
    return graph.degree_histogram(graph.copurchase_edges(li))
