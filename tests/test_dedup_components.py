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


def test_duplicate_ngram_spans_known_case(spark):
    """Two docs share an 8-word run; a third is unrelated. The shared
    run must surface as one maximal span in each doc at the right
    positions, and the unrelated doc must report no span."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} tail1 tail2"),
            (2, f"{shared} completely different ending here"),
            (3, "nothing here repeats at all in any way whatsoever friend"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r["id"]: (r["span_start"], r["span_end"], r["n_words"])
        for r in dedup.duplicate_ngram_spans(docs, "text", "doc_id", l=8).collect()
    }
    # doc 1: shared run occupies words 3..10; doc 2: words 1..8
    assert spans[1] == (3, 10, 8)
    assert spans[2] == (1, 8, 8)
    assert 3 not in spans


def test_duplicate_spans_merge_adjacent_positions(spark):
    """A 10-word shared run yields THREE duplicated 8-gram start
    positions (1, 2, 3) in a doc where it starts at word 1 — they must
    merge into ONE maximal span of 10 words, not three overlapping
    spans."""
    shared = "a b c d e f g h i j"  # 10 words
    docs = spark.createDataFrame(
        [(1, shared), (2, f"x y {shared}")],
        "doc_id long, text string",
    )
    spans = dedup.duplicate_ngram_spans(docs, "text", "doc_id", l=8).collect()
    by_id = {r["id"]: r for r in spans}
    assert len(spans) == 2
    assert (by_id[1]["span_start"], by_id[1]["span_end"]) == (1, 10)
    assert (by_id[2]["span_start"], by_id[2]["span_end"]) == (3, 12)


def test_span_fraction_zero_for_unique_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "entirely unique words compose this first document text body"),
            (2, "second document also made of words never seen elsewhere today"),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in dedup.duplicate_span_fraction(docs, "text", "doc_id", l=8).collect()}
    assert rows[1]["dup_words"] == 0 and rows[1]["dup_fraction"] == 0.0
    assert rows[2]["n_words"] == 10


def test_span_sources_attribution(spark):
    """Partner attribution: the lowest OTHER doc carrying the opening
    gram; purely intra-document duplication reports 0 others and a NULL
    partner."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} t1 t2"),
            (2, f"{shared} completely different end here"),
            (5, f"{shared} another version of doc here"),
            (9, "x y z " + " ".join(["r"] * 12)),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in dedup.duplicate_span_sources(docs, "text", "doc_id").collect()}
    assert rows[1]["n_other_docs"] == 2 and rows[1]["sample_partner"] == 2
    assert rows[2]["sample_partner"] == 1 and rows[5]["sample_partner"] == 1
    assert rows[9]["n_other_docs"] == 0 and rows[9]["sample_partner"] is None


def test_span_fraction_merges_overlapping_spans(spark):
    """Two maximal runs with starts < l apart cover overlapping WORDS
    (positions {1,3}, l=8 -> spans [1,8] and [3,10]); coverage must
    merge them — dup_fraction is a true covered-word fraction <= 1,
    never a double-counted span-length sum."""
    a_words = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"          # grams at pos 1..3
    # B carries A's pos-1 gram and pos-3 gram but NOT the pos-2 gram
    b_words = "a1 a2 a3 a4 a5 a6 a7 a8 X a3 a4 a5 a6 a7 a8 a9 a10"
    docs = spark.createDataFrame(
        [(1, a_words), (2, b_words)], "doc_id long, text string"
    )
    rows = {
        r["id"]: r
        for r in dedup.duplicate_span_fraction(docs, "text", "doc_id", l=8).collect()
    }
    # doc 1: duplicated positions {1, 3} (pos 2's gram is unique) ->
    # ONE island covering words 1..10 = the whole 10-word doc
    assert rows[1]["n_words"] == 10
    assert rows[1]["dup_words"] == 10
    assert rows[1]["dup_fraction"] == 1.0
    # doc 2: duplicated positions {1, 10}, gap 9 > l-1 -> two disjoint
    # islands of 8 words each over 17 words
    assert rows[2]["n_words"] == 17
    assert rows[2]["dup_words"] == 16
    assert abs(rows[2]["dup_fraction"] - round(16 / 17, 6)) < 1e-9


def test_cdc_chunks_realign_after_insertion(spark):
    """The defining CDC property: boundaries depend only on LOCAL
    content, so an insertion at the head shifts only the chunk(s)
    containing it — the tail chunks re-align byte-identically and
    still dedup (fixed-size blocking would shift EVERY later block)."""
    import random

    from datafusion_server_spark.operators.dedup import cdc_chunks

    rng = random.Random(7)
    base = " ".join(
        "".join(rng.choice("abcdefgh ") for _ in range(12)) for _ in range(60)
    )
    df = spark.createDataFrame(
        [(1, base), (2, "INSERTED PREFIX! " + base)], "doc_id long, text string"
    )
    ch = cdc_chunks(df, "text", "doc_id")
    rows = ch.collect()
    c1 = [r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_idx"]) if r["id"] == 1]
    c2 = [r["chunk"] for r in sorted(rows, key=lambda r: r["chunk_idx"]) if r["id"] == 2]
    assert "".join(c1) == base  # chunks partition the text exactly
    assert "".join(c2) == "INSERTED PREFIX! " + base
    # everything after the first boundary past the insertion is shared
    shared = set(c1) & set(c2)
    assert len(shared) >= len(c1) - 2


def test_survivor_policy_float_scores_not_truncated(spark):
    """r9: a FLOAT quality policy in [0, 1] must drive the argmax — the
    previous BIGINT cast truncated every score to 0, degenerating the
    pick to smallest-id. 0.2 (doc 1) vs 0.9 (doc 2): doc 2 survives."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again", 0.2),
            (2, "the quick brown fox jumps over the lazy dog again and again today", 0.9),
        ],
        ["doc_id", "text", "quality"],
    )
    out = dedup.fuzzy_survivors_by_policy(
        docs, "text", "doc_id", F.col("quality"), threshold=0.3
    ).collect()
    assert len(out) == 1
    assert out[0]["keep_id"] == 2
    assert abs(out[0]["keep_policy"] - 0.9) < 1e-12
    assert out[0]["n_members"] == 2
