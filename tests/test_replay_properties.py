"""Independent semantic property tests for the replay-VALUES-oracle
queries (VERDICT r4 item 4): the driver oracle for these proves
determinism and Spark-faithfulness; THESE tests prove the semantics from
first principles — invariants no sequential replay can fake.

One test per replay-oracle query family:
- bpe_*                     -> detokenize identity (concat of the trained
                               segmentation reconstructs every word)
- cluster_kmeans_assign /
  dedup_semantic_semdedup   -> WCSS monotone non-increasing per Lloyd
                               iteration (the convergence guarantee)
- classifier_logreg_quality -> HOLDOUT accuracy floor (beats the holdout
                               majority class, not just training fit)
- eval_logreg_calibration   -> bands partition the scored set; global
                               calibration-in-the-large
- dedup_semantic_keepers    -> keepers/drops partition; min-id of every
                               cluster always survives
- text_compression_ratio    -> repetitive < prose < random ordering
- pipeline_curation_v2      -> output is a true subset of the band-pass
                               keepers with the budget respected
(PQ/SQ8/IVF already carry recall/nDCG floors in test_quantize.py;
multimodal decode identities live in test_codec_properties.py.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_server_spark import tables


def test_bpe_detokenize_identity(spark, sf_dir):
    """Concatenating the trained segmentation reconstructs every corpus
    word exactly — BPE merges only ever glue adjacent symbols, so the
    round trip must be lossless at any merge count."""
    from datafusion_server_spark.operators import bpe

    docs = tables.load(spark, sf_dir, "documents")
    vocab, merges = bpe.bpe_train(docs, "text", 12)
    bad = vocab.filter(F.concat_ws("", F.col("syms")) != F.col("word"))
    assert bad.count() == 0
    # the frozen-merge application side round-trips too (on unseen order)
    applied = bpe.bpe_apply_merges(
        docs.limit(20), "text", "doc_id", [(r["left"], r["right"]) for r in merges.collect()]
    )
    assert applied.filter(F.concat_ws("", F.col("syms")) != F.col("word")).count() == 0


def _wcss(spark, sf_dir, iters: int) -> float:
    from datafusion_server_spark.operators import clustering

    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, cent = clustering.kmeans(emb, 8, iters)
    joined = (
        assigned.join(
            emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")), "id"
        )
        .join(cent, "cluster")
        .select(
            F.aggregate(
                F.zip_with("v", "c", lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ).alias("d2")
        )
    )
    return joined.agg(F.sum("d2")).collect()[0][0]


def test_kmeans_wcss_monotone_per_iteration(spark, sf_dir):
    """Lloyd's guarantee: each assign+update round can only lower the
    within-cluster sum of squares (up to the operator's 1e-6 centroid
    rounding). This is the semantic property the sequential replay
    oracle cannot establish — it would reproduce a WRONG kmeans just as
    faithfully."""
    w1, w2, w3 = (_wcss(spark, sf_dir, i) for i in (1, 2, 3))
    slack = 1e-3  # centroids round to 1e-6; d^2 error is bounded well below this
    assert w2 <= w1 + slack, f"WCSS rose on iteration 2: {w1} -> {w2}"
    assert w3 <= w2 + slack, f"WCSS rose on iteration 3: {w2} -> {w3}"


def _probe_labels(docs):
    from datafusion_server_spark.queries.classifier import PROBE

    return docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.array_contains(F.split(F.col("text"), " "), PROBE), 1.0)
        .otherwise(0.0)
        .alias("y"),
    )


def test_logreg_holdout_accuracy_floor(spark, sf_dir):
    """Train on a 70% hash split, score the UNSEEN 30%: accuracy must
    beat the holdout majority-class share — generalization, not
    memorization (the training-set fit test already exists)."""
    from datafusion_server_spark.operators import classifier
    from datafusion_server_spark.queries.classifier import DIM, ITERS, LR

    docs = tables.load(spark, sf_dir, "documents")
    is_train = F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(10)) < 7
    train_docs = docs.filter(is_train)
    test_docs = docs.filter(~is_train)
    feats_train = classifier.hashed_features(train_docs, "text", "doc_id", DIM)
    labels_train = _probe_labels(train_docs)
    w = classifier.train_logreg(feats_train, labels_train, DIM, ITERS, LR)
    feats_test = classifier.hashed_features(test_docs, "text", "doc_id", DIM)
    scored = classifier.predict(feats_test, w).join(_probe_labels(test_docs), "id")
    n = scored.count()
    assert n > 10, "holdout split degenerated"
    acc = scored.filter(F.col("pred").cast("double") == F.col("y")).count() / n
    pos = scored.filter(F.col("y") == 1.0).count() / n
    majority = max(pos, 1 - pos)
    assert acc > majority, f"holdout acc {acc:.3f} <= majority {majority:.3f}"
    assert acc >= 0.9, f"holdout acc {acc:.3f} below the 0.9 floor"


def test_calibration_bands_partition_and_global_rate(spark, sf_dir):
    """The calibration report's bands must partition the scored set
    (sum n == corpus size, every mean_p inside its band), and the model
    must be calibrated-in-the-large: total predicted mass tracks the
    true positive count."""
    from datafusion_server_spark.queries import registry

    reg = registry()
    rows = reg["eval_logreg_calibration"].build(spark, sf_dir).collect()
    docs_n = tables.load(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == docs_n
    for r in rows:
        lo, hi = r["band"] / 10.0, (r["band"] + 1) / 10.0
        assert lo - 1e-9 <= r["mean_p"] <= (1.0 if r["band"] == 9 else hi) + 1e-9
        assert 0.0 <= r["actual_rate"] <= 1.0
    pred_mass = sum(r["mean_p"] * r["n"] for r in rows)
    actual_pos = sum(r["actual_rate"] * r["n"] for r in rows)
    # full-batch GD at these settings sits near the optimum, where
    # sum(p) == sum(y) exactly; allow finite-iteration slack
    assert abs(pred_mass - actual_pos) <= max(3.0, 0.05 * docs_n)


def test_semdedup_keepers_partition_and_min_id_survives(spark, sf_dir):
    """Keepers and drops partition the clustered ids, and the minimum id
    of every cluster is never dropped (pairs are (keep_id < drop_id), so
    min-id survivorship is an invariant, not a convention)."""
    from datafusion_server_spark.operators import clustering
    from datafusion_server_spark.queries.clustering import ITERS, K, SEM_THRESHOLD

    emb = tables.load(spark, sf_dir, "embeddings")
    assigned, _ = clustering.kmeans(emb, K, ITERS)
    pairs = clustering.semdedup_pairs(emb, K, SEM_THRESHOLD, ITERS)
    drops = {r["drop_id"] for r in pairs.select("drop_id").distinct().collect()}
    by_cluster = {}
    for r in assigned.collect():
        by_cluster.setdefault(r["cluster"], []).append(r["id"])
    all_ids = {i for ids in by_cluster.values() for i in ids}
    assert drops <= all_ids
    for cluster, ids in by_cluster.items():
        assert min(ids) not in drops, f"cluster {cluster} lost its min id"
    # every pair respects threshold and stays within one cluster
    cluster_of = {i: c for c, ids in by_cluster.items() for i in ids}
    for r in pairs.collect():
        assert r["cosine"] >= SEM_THRESHOLD
        assert cluster_of[r["keep_id"]] == cluster_of[r["drop_id"]] == r["cluster"]


def test_compression_ratio_ordering(spark):
    """The band-pass signal's reason to exist: templated text compresses
    far below prose, and random glyph soup barely compresses at all."""
    from datafusion_server_spark.operators import text as text_ops

    import random

    rng = random.Random(7)
    repetitive = "spam ham " * 200
    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors argue about the tide tables and a lighthouse keeper "
        "files a complaint concerning gulls "
    ) * 8
    soup = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ") for _ in range(1600))
    df = spark.createDataFrame(
        [(1, repetitive), (2, prose), (3, soup)], "doc_id long, text string"
    )
    rows = {
        r["id"]: r for r in text_ops.compression_ratio(df, "text", "doc_id").collect()
    }
    assert 0.0 < rows[1]["ratio"] < rows[2]["ratio"] < rows[3]["ratio"] <= 1.2
    assert rows[1]["ratio"] < 0.1  # 2-word template: near-total collapse
    assert rows[3]["ratio"] > 0.6  # uniform soup: little to exploit


def test_curation_v2_output_is_bounded_subset(spark, sf_dir):
    """Pipeline invariants: every output language exists in the corpus,
    per-language doc counts never exceed that language's band-pass keeper
    count, and the total respects the sampling budget."""
    from datafusion_server_spark.operators import clustering, text
    from datafusion_server_spark.queries.clustering import (
        ITERS,
        K,
        SEM_THRESHOLD,
        _V2_HI,
        _V2_LO,
        _V2_TOTAL,
    )
    from datafusion_server_spark.queries import registry

    reg = registry()
    out = {r["lang"]: r for r in reg["pipeline_curation_v2"].build(spark, sf_dir).collect()}
    docs = tables.load(spark, sf_dir, "documents")
    emb = tables.load(spark, sf_dir, "embeddings")
    xent = text.lm_unigram_cross_entropy(docs, "text", "doc_id")
    banded = docs.join(
        xent.filter(F.col("xent_nats").between(_V2_LO, _V2_HI)).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    )
    drops = clustering.semdedup_pairs(emb, K, SEM_THRESHOLD, ITERS).select(
        F.col("drop_id").alias("doc_id")
    ).distinct()
    keepers_by_lang = {
        r["lang"]: r["n"]
        for r in banded.join(drops, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out, "pipeline produced no rows"
    for lang, row in out.items():
        assert lang in keepers_by_lang
        assert 0 < row["n_docs"] <= keepers_by_lang[lang]
        assert row["total_tokens"] >= 0
    # the budget is enforced through per-domain RATES (deterministic hash
    # selection), so realized counts carry sampling variance around the
    # target — bound it, don't expect exactness
    total_out = sum(r["n_docs"] for r in out.values())
    n_keepers = sum(keepers_by_lang.values())
    assert total_out <= min(n_keepers, round(1.25 * _V2_TOTAL) + len(out))
    if n_keepers >= _V2_TOTAL:
        assert total_out >= round(0.5 * _V2_TOTAL)
