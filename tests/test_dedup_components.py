"""Connected components over near-dup pairs: transitivity, isolation,
iteration convergence, partition independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark.operators import dedup


def _components(spark, edges: list[tuple[int, int]], partitions: int = 1):
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"]).repartition(partitions)
    rows = dedup.connected_components(pairs).collect()
    return {r["node"]: r["component"] for r in rows}


def test_chain_merges_transitively(spark):
    """A~B, B~C, C~D must all land in one cluster even though A and D
    share no pair — the property pairwise dedup alone misses."""
    comp = _components(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10


def test_long_chain_needs_multiple_iterations(spark):
    """Label propagation over a diameter-8 path — exercises the loop
    beyond one round."""
    edges = [(i, i + 1) for i in range(1, 9)]
    comp = _components(spark, edges)
    assert set(comp.values()) == {1}
    assert len(comp) == 9


def test_partition_independent(spark):
    edges = [(5, 3), (3, 9), (20, 21), (9, 1)]
    assert _components(spark, edges, partitions=1) == _components(
        spark, edges, partitions=7
    )


def test_cluster_summary_survivors(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again today"),
            (3, "completely different text with no overlap whatsoever in any shingle here"),
        ],
        ["doc_id", "text"],
    )
    out = dedup.dedup_clusters(docs, "text", "doc_id", threshold=0.3).collect()
    rows = {r["keep_id"]: r["n_members"] for r in out}
    # docs 1+2 cluster (survivor = min id 1); doc 3 forms no pair at all
    assert rows == {1: 2}


def test_nonconvergence_raises(spark):
    """A diameter beyond max_iterations must FAIL, not return split
    clusters silently."""
    import pytest

    edges = [(i, i + 1) for i in range(1, 9)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iterations=2).collect()


def test_incremental_lsh_matches_full_self_join_cross_pairs(spark, sf_dir):
    """Probing a new batch against the corpus index finds exactly the
    cross-subset (new x existing) of the full self-join's candidate
    pairs — the index split loses nothing."""
    from pyspark.sql import functions as F

    from datafusion_server_spark import tables
    from datafusion_server_spark.operators import dedup

    docs = tables.load(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 10 < 8)
    new_batch = docs.filter(F.col("doc_id") % 10 >= 8)
    index = dedup.lsh_signature_index(existing, "text", "doc_id")
    inc = dedup.lsh_pairs_against_index(new_batch, index, "text", "doc_id")
    inc_pairs = {(r.new_id, r.index_id, r.jaccard) for r in inc.collect()}

    full = dedup.lsh_candidate_pairs(docs, "text", "doc_id")
    cross = {
        (r.id_a, r.id_b, r.jaccard)
        for r in full.collect()
        if (r.id_a % 10 >= 8) != (r.id_b % 10 >= 8)  # one new, one existing
    }
    # orient the full-join pairs as (new, existing)
    oriented = {
        (a, b, j) if a % 10 >= 8 else (b, a, j) for a, b, j in cross
    }
    assert inc_pairs == oriented


def test_prefix_jaccard_equals_all_pairs(spark, sf_dir):
    """The PPJoin prefix bound is LOSSLESS: candidates from the rare-
    first prefixes verify to exactly the pairs an unfiltered all-pairs
    threshold join produces."""
    from datafusion_server_spark import tables
    from datafusion_server_spark.operators import dedup as dd

    docs = tables.load(spark, sf_dir, "documents")
    fast = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.prefix_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    }
    # brute force: every pair sharing ANY shingle, exact Jaccard
    sh = dd.shingle_sets(docs, "text", "doc_id")
    sized = sh.join(
        sh.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n")), "id"
    )
    brute = (
        sized.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"), "shingle")
        .join(
            sized.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"), "shingle"),
            "shingle",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("c").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("c")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    slow = {(r.id_a, r.id_b, r.jaccard) for r in brute.collect()}
    assert fast == slow and slow, (len(fast), len(slow))
