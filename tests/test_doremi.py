"""Property tests for the DoReMi Group-DRO domain reweighting —
independent semantic checks on top of the unrolled-CTE oracle parity
(which proves Spark/DuckDB agreement, not that the algorithm does what
DoReMi says it does)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark.operators import classifier, doremi


def _weights(spark, docs):
    feats = classifier.hashed_features(docs, "text", "doc_id", 64)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.array_contains(F.split(F.col("text"), " "), "probe"), 1.0
        ).otherwise(0.0).alias("y"),
    )
    domains = docs.select(
        F.col("doc_id").alias("id"), F.col("source").alias("domain")
    )
    return doremi.doremi_domain_weights(
        feats, labels, domains, dim=64, ref_iters=5, iters=5
    ).collect()


def test_doremi_upweights_learnable_over_noise(spark):
    """DoReMi's core promise (arXiv:2305.10429 §3): LEARNABLE domains
    — where the trained reference model beats a fresh proxy, so excess
    loss is large — get up-weighted, while label-noise domains — where
    even the reference can do no better than p=0.5, so excess loss
    stays near zero — get down-weighted. Domain 'learnable' has a
    perfectly predictive token; domain 'noise' has IDENTICAL text with
    alternating labels (irreducible entropy)."""
    rows, labels_rows = [], []
    for i in range(40):
        rows.append((i, "signal alpha beta", "learnable"))
        labels_rows.append((i, 1.0))
        rows.append((100 + i, "other gamma delta", "learnable"))
        labels_rows.append((100 + i, 0.0))
        rows.append((200 + i, "common words here", "noise"))
        labels_rows.append((200 + i, float(i % 2)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    feats = classifier.hashed_features(docs, "text", "doc_id", 64)
    labels = spark.createDataFrame(labels_rows, "id long, y double")
    domains = docs.select(
        F.col("doc_id").alias("id"), F.col("source").alias("domain")
    )
    got = {
        r["domain"]: r
        for r in doremi.doremi_domain_weights(
            feats, labels, domains, dim=64, ref_iters=5, iters=5
        ).collect()
    }
    assert set(got) == {"learnable", "noise"}
    assert got["learnable"]["alpha_avg"] > got["noise"]["alpha_avg"]
    assert got["learnable"]["alpha_final"] > got["noise"]["alpha_final"]
    # the noise domain decays toward (but never below) the smoothing floor
    assert got["noise"]["alpha_final"] >= 0.05 / 2 - 1e-9


def test_doremi_alphas_normalized_and_floored(spark, sf_dir):
    """Alphas are a smoothed distribution: each iteration's vector sums
    to 1 (within the 8-decimal per-domain rounding) and every domain
    keeps at least the uniform-smoothing floor."""
    from datafusion_server_spark import tables

    docs = tables.load(spark, sf_dir, "documents")
    rows = _weights(spark, docs)
    k = len(rows)
    for col in ("alpha_final", "alpha_avg"):
        total = sum(r[col] for r in rows)
        assert abs(total - 1.0) < 1e-6 * k
        assert all(r[col] >= 0.05 / k - 1e-9 for r in rows)
    assert sum(r["n_docs"] for r in rows) == docs.count()
