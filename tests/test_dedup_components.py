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
