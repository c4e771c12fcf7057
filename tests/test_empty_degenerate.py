"""Empty-corpus and degenerate-input hardening for the LLM-pipeline
operator families.

At 100 TB the engine routinely sees empty PARTITIONS of every shape
(after a selective filter, a fresh ingest day, an empty source shard);
locally the whole-input-empty case is the strictest proxy: every
operator must return an EMPTY result with the right schema — never
raise, never emit a fabricated row."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark.operators import classifier, clustering, dedup, similarity

_DOCS_SCHEMA = "doc_id long, text string"
_EMB_SCHEMA = "vec_id long, embedding array<double>"


def _empty_docs(spark):
    return spark.createDataFrame([], _DOCS_SCHEMA)


def _empty_emb(spark):
    return spark.createDataFrame([], _EMB_SCHEMA)


def test_dedup_family_on_empty_corpus(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_duplicates(docs, "text", "doc_id").count() == 0
    assert dedup.minhash_signatures(docs, "text", "doc_id").count() == 0
    assert dedup.lsh_candidate_pairs(docs, "text", "doc_id", materialize=False).count() == 0
    assert dedup.simhash(docs, "text", "doc_id").count() == 0
    assert dedup.duplicate_ngram_spans(docs, "text", "doc_id").count() == 0
    assert dedup.duplicate_span_fraction(docs, "text", "doc_id").count() == 0


def test_incremental_lsh_empty_batch_against_real_index(spark, sf_dir):
    """Fresh-ingest-day shape: an EMPTY batch probed against a real
    index must yield zero pairs (and not fail building empty
    signatures)."""
    from datafusion_server_spark import tables

    docs = tables.load(spark, sf_dir, "documents").limit(50)
    index = dedup.lsh_signature_index(docs, "text", "doc_id", materialize=False)
    out = dedup.lsh_pairs_against_index(
        _empty_docs(spark), index, "text", "doc_id", materialize=False
    )
    assert out.count() == 0


def test_similarity_family_on_empty_corpus(spark):
    emb = _empty_emb(spark)
    assert similarity.cosine_topk(emb, emb, 5).count() == 0
    # scaled ANN sizes its code length from corpus stats; n=0 must not
    # divide-by-zero or raise in band-bit derivation
    out = similarity.scaled_lsh_ann_topk(emb, emb, 5, n_vectors=0)
    assert out.count() == 0


def test_kmeans_on_empty_corpus(spark):
    emb = _empty_emb(spark)
    assigned, cents = clustering.kmeans(emb, 4, 1)
    assert assigned.count() == 0
    assert cents.count() == 0


def test_classifier_on_single_class_corpus(spark):
    """All-negative labels: GD must still run (gradient pushes scores
    toward 0) and predict all-negative — the degenerate-label shape a
    topic probe hits on an off-topic shard."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "eta theta iota")],
        _DOCS_SCHEMA,
    )
    feats = classifier.hashed_features(docs, "text", "doc_id", 64)
    labels = docs.select(F.col("doc_id").alias("id"), F.lit(0.0).alias("y"))
    w = classifier.train_logreg(feats, labels, 64, 5, 1.0)
    preds = classifier.predict(feats, w)
    rows = preds.collect()
    assert len(rows) == 3
    assert all(not r["pred"] for r in rows)
    assert all(r["p"] < 0.5 for r in rows)


def test_spans_on_whitespace_only_and_short_docs(spark):
    """Documents shorter than the gram length and pathological
    whitespace must produce no spans and a 0.0 fraction, not an
    exploded empty-string gram match."""
    docs = spark.createDataFrame(
        [(1, "one two three"), (2, "   "), (3, "")],
        _DOCS_SCHEMA,
    )
    assert dedup.duplicate_ngram_spans(docs, "text", "doc_id", l=8).count() == 0
    fr = {r["id"]: r for r in dedup.duplicate_span_fraction(docs, "text", "doc_id", l=8).collect()}
    assert fr[1]["dup_fraction"] == 0.0
    assert fr[2]["dup_words"] == 0 and fr[3]["dup_words"] == 0


def test_lsh_all_identical_corpus(spark):
    """Worst-case skew: EVERY document identical — one bucket holds the
    whole corpus. The banded join must still bound work by the bucket
    (n^2 pairs here, n=6) and report jaccard 1.0 on every pair."""
    docs = spark.createDataFrame(
        [(i, "same exact words repeated in every single document body") for i in range(6)],
        _DOCS_SCHEMA,
    )
    pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id", materialize=False).collect()
    assert len(pairs) == 15  # C(6,2)
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_doremi_single_domain_degenerates_to_uniform(spark):
    """K=1: normalization + smoothing must give alpha == 1.0 every
    iteration (and never NaN), whatever the losses do."""
    from datafusion_server_spark.operators import classifier, doremi

    docs = spark.createDataFrame(
        [(i, "alpha beta probe" if i % 2 == 0 else "gamma delta", "only")
         for i in range(20)],
        "doc_id long, text string, source string",
    )
    feats = classifier.hashed_features(docs, "text", "doc_id", 32)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.array_contains(F.split("text", " "), "probe").cast("double").alias("y"),
    )
    domains = docs.select(F.col("doc_id").alias("id"), F.col("source").alias("domain"))
    rows = doremi.doremi_domain_weights(
        feats, labels, domains, dim=32, ref_iters=2, iters=3
    ).collect()
    assert len(rows) == 1
    assert rows[0]["alpha_final"] == 1.0
    assert rows[0]["alpha_avg"] == 1.0


def test_tracin_probe_with_no_shared_buckets_scores_zero(spark):
    """A document sharing NO feature bucket with the probe has zero
    gradient alignment — influence must be exactly 0 (bias bucket is
    shared by construction, so test via the factored overlap directly:
    the minimum possible overlap is 1 = bias only)."""
    from datafusion_server_spark.operators import classifier, influence

    docs = spark.createDataFrame(
        [(0, "aa bb cc"), (1, "aa bb cc"), (2, "zz yy xx")],
        "doc_id long, text string",
    )
    feats = classifier.hashed_features(docs, "text", "doc_id", 512)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") < 2).cast("double").alias("y"),
    )
    out = {r["id"]: r for r in influence.tracin_influence(
        feats, labels, 0, dim=512, iters=3
    ).collect()}
    # identical twin shares everything; the disjoint doc shares only bias
    assert out[1]["common_buckets"] > out[2]["common_buckets"] >= 1
    assert out[1]["influence"] > out[2]["influence"]
    # self influence is positive
    assert out[0]["influence"] > 0.0


def test_token_waterfill_budget_covers_corpus(spark):
    """budget == total (num == den): every stratum fully used, alloc
    sums to the TOTAL (surplus unallocated by contract)."""
    from datafusion_server_spark.operators import sampling

    df = spark.createDataFrame(
        [("a", 10), ("b", 30), ("c", 5)], "stratum string, toks int"
    )
    out = sampling.token_budget_waterfill(df, "stratum", F.col("toks"), 1, 1)
    rows = {r["stratum"]: r for r in out.collect()}
    assert all(r["fully_used"] for r in rows.values())
    assert all(r["alloc_tokens"] == r["avail_tokens"] for r in rows.values())
    assert sum(r["alloc_tokens"] for r in rows.values()) == 45


def test_token_waterfill_single_stratum_levels_to_budget(spark):
    from datafusion_server_spark.operators import sampling

    df = spark.createDataFrame([("only", 100)], "stratum string, toks int")
    out = sampling.token_budget_waterfill(df, "stratum", F.col("toks"), 3, 10)
    [r] = out.collect()
    assert (r["alloc_tokens"], r["fully_used"]) == (30, False)


def test_token_waterfill_zero_token_strata_and_leftover(spark):
    """Zero-avail strata ride through as fully used with alloc 0; the
    budget remainder goes one-each to the lexicographically first
    levelled strata (documented tie-break)."""
    from datafusion_server_spark.operators import sampling

    df = spark.createDataFrame(
        [("z0", 0), ("big_b", 50), ("big_a", 50), ("tiny", 4)],
        "stratum string, toks int",
    )
    # budget = 104 // 2 = 52; sorted: z0(0), tiny(4) fully used ->
    # rem 48 over {big_a, big_b}: level 24, leftover 0
    out = sampling.token_budget_waterfill(df, "stratum", F.col("toks"), 1, 2)
    rows = {r["stratum"]: r for r in out.collect()}
    assert rows["z0"]["alloc_tokens"] == 0 and rows["z0"]["fully_used"]
    assert rows["tiny"]["alloc_tokens"] == 4 and rows["tiny"]["fully_used"]
    assert rows["big_a"]["alloc_tokens"] == 24 and not rows["big_a"]["fully_used"]
    assert rows["big_b"]["alloc_tokens"] == 24 and not rows["big_b"]["fully_used"]
    assert sum(r["alloc_tokens"] for r in rows.values()) == 52
    # leftover path: budget = 104 * 51 // 104 = 51 -> rem 47 over two
    # big strata: level 23, leftover 1 -> big_a (lexicographically
    # first levelled stratum) gets the extra token
    out2 = sampling.token_budget_waterfill(df, "stratum", F.col("toks"), 51, 104)
    rows2 = {r["stratum"]: r for r in out2.collect()}
    assert rows2["big_a"]["alloc_tokens"] == 24
    assert rows2["big_b"]["alloc_tokens"] == 23
    assert sum(r["alloc_tokens"] for r in rows2.values()) == 51
