"""DoReMi-style domain reweighting (Group-DRO proxy training).

Beyond-reference operator — the mixture-weight leg of an LLM data
pipeline. DoReMi (arXiv:2305.10429) chooses pretraining domain weights
by training a small PROXY model with Group DRO against a fixed
REFERENCE model: domains where the proxy's loss exceeds the reference's
(high excess loss = learnable-but-not-learned) get up-weighted by
multiplicative weights, and the proxy's gradient step re-weights each
document by its domain's current weight. The output is the per-domain
weight trajectory average — the recommended mixture for the real
training run.

This implementation reuses the deterministic full-batch-GD machinery of
``operators.classifier`` (hashed bag-of-words, scaled-long sums,
shortest-repr rounding) so the whole minimax loop is replayable by an
independent engine as an unrolled CTE chain:

- reference model: plain logistic GD for ``ref_iters`` iterations; its
  per-document log-loss is computed ONCE and checkpointed;
- proxy loop, per iteration: (1) per-doc log-loss under the current
  proxy weights, (2) per-domain mean EXCESS loss vs the reference
  (clamped at 0), (3) multiplicative-weights update
  ``alpha <- normalize(alpha * exp(eta * excess))`` followed by uniform
  smoothing, (4) one alpha-weighted gradient step on the proxy.

Determinism contract (the house pattern): every libm value (exp, ln) is
shortest-repr-rounded to 8 decimals before use; every cross-row sum is
either a scaled-long (per-doc/per-bucket sums) or an exact DECIMAL sum
(per-domain alpha terms, K-bounded); weights round to 6, alphas to 8.

Scale notes (100 TB): the loss/gradient passes touch the feature table
(checkpointed once) with a broadcast (domain -> alpha) map of K rows —
the standard data-parallel Group-DRO shape; per-iteration reduced state
is dim- and K-bounded. The driver loops over ITERATIONS only, never
rows. At cluster scale the per-iteration ``localCheckpoint`` of the
(dim+1)-row weight and K-row alpha tables is a metadata-sized write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_server_spark.operators.classifier import _logits, train_logreg
from datafusion_server_spark.operators.similarity import SCALE

# log-loss clamp bounds: 8-decimal sigmoids can round to exactly 0 or 1
P_LO = 1.0e-8
P_HI = 0.99999999


def _log_loss(p_col: Column, y_col: Column) -> Column:
    """Shortest-repr-rounded binary cross-entropy of a clamped 8-decimal
    probability — identical expression order in the DuckDB oracle."""
    pc = F.greatest(F.lit(P_LO), F.least(F.lit(P_HI), p_col))
    return F.round(
        -(y_col * F.log(pc) + (F.lit(1.0) - y_col) * F.log(F.lit(1.0) - pc)), 8
    )


def doremi_domain_weights(
    features: DataFrame,
    labels: DataFrame,
    domains: DataFrame,
    dim: int = 64,
    ref_iters: int = 5,
    iters: int = 5,
    lr: float = 5.0,
    eta: float = 1.0,
    smoothing: float = 0.05,
) -> DataFrame:
    """Group-DRO proxy training; returns one row per domain:
    (domain, n_docs, alpha_final, alpha_avg) where ``alpha_avg`` is the
    iteration average DoReMi prescribes as the mixture weight.

    ``features`` is (id, bucket, x) from ``classifier.hashed_features``
    (binary presence features: x = 1.0), ``labels`` is (id, y double in
    {0,1}), ``domains`` is (id, domain string).
    """
    spark = features.sparkSession
    dom = domains.select("id", "domain").localCheckpoint()
    nk = dom.groupBy("domain").agg(F.count(F.lit(1)).cast("bigint").alias("n_k"))
    k = nk.count()
    n = labels.count()
    smooth_term = smoothing / float(k)

    feats = features.localCheckpoint()
    lab = labels.localCheckpoint()

    # reference model + its per-doc loss, computed once
    w_ref = train_logreg(feats, lab, dim, ref_iters, lr)
    l_ref = (
        _logits(feats, w_ref)
        .join(lab, "id")
        .select("id", _log_loss(F.col("p"), F.col("y")).alias("l_ref"))
        .localCheckpoint()
    )

    # uniform init: plain literal division — identical IEEE double in
    # the oracle (1.0 / K from literals), no rounding step needed
    alpha = nk.select(
        "domain", (F.lit(1.0) / F.lit(float(k))).alias("alpha")
    ).localCheckpoint()
    weights = spark.range(dim + 1).select(
        F.col("id").cast("bigint").alias("bucket"), F.lit(0.0).alias("w")
    ).localCheckpoint()

    alpha_hist = []
    for _ in range(iters):
        # (1) per-doc loss under the current proxy
        p = _logits(feats, weights)
        ld = p.join(lab, "id").select(
            "id",
            "p",
            F.col("y"),
            _log_loss(F.col("p"), F.col("y")).alias("l_cur"),
        )
        # (2) per-domain mean excess loss (scaled-long sum of 8-dec diffs)
        ex = (
            ld.join(l_ref, "id")
            .join(dom, "id")
            .groupBy("domain")
            .agg(
                F.sum(
                    F.round((F.col("l_cur") - F.col("l_ref")) * F.lit(1.0e8)).cast(
                        "bigint"
                    )
                ).alias("__es"),
                F.count(F.lit(1)).cast("bigint").alias("__nk"),
            )
            .select(
                "domain",
                F.greatest(
                    F.lit(0.0),
                    F.round(
                        F.col("__es").cast("double")
                        / F.lit(1.0e8)
                        / F.col("__nk").cast("double"),
                        8,
                    ),
                ).alias("lam"),
            )
        )
        # (3) multiplicative-weights update + normalize + smooth
        raw = alpha.join(ex, "domain").select(
            "domain",
            F.round(
                F.col("alpha") * F.round(F.exp(F.lit(eta) * F.col("lam")), 8), 8
            ).alias("__a1"),
        )
        tot = raw.agg(
            F.sum(F.col("__a1").cast("decimal(18,8)")).alias("__s")
        )
        alpha = (
            raw.crossJoin(F.broadcast(tot))
            .select(
                "domain",
                F.round(
                    F.lit(1.0 - smoothing)
                    * F.round(
                        F.col("__a1") / F.col("__s").cast("double"), 8
                    )
                    + F.lit(smooth_term),
                    8,
                ).alias("alpha"),
            )
            .localCheckpoint()
        )
        alpha_hist.append(alpha)
        # (4) alpha-weighted gradient step:
        #     per-(domain, bucket) scaled-long error sums, then an exact
        #     DECIMAL sum of the K repr-rounded alpha-weighted terms
        pe = ld.select(
            "id", F.round((F.col("p") - F.col("y")) * SCALE).cast("bigint").alias("__e")
        )
        skb = (
            feats.join(pe, "id")
            .join(dom, "id")
            .groupBy("domain", "bucket")
            .agg(F.sum("__e").alias("__skb"))
        )
        gb = (
            skb.join(F.broadcast(alpha), "domain")
            .join(F.broadcast(nk), "domain")
            .select(
                "bucket",
                F.round(
                    F.col("alpha")
                    * (F.col("__skb").cast("double") / SCALE)
                    / F.col("n_k").cast("double"),
                    12,
                ).alias("__d"),
            )
            .groupBy("bucket")
            .agg(F.sum(F.col("__d").cast("decimal(30,12)")).alias("__g"))
        )
        weights = (
            weights.join(gb, "bucket", "left")
            .select(
                "bucket",
                F.round(
                    F.col("w")
                    - F.lit(lr) * F.coalesce(F.col("__g").cast("double"), F.lit(0.0)),
                    6,
                ).alias("w"),
            )
            .localCheckpoint()
        )

    hist = alpha_hist[0]
    for a in alpha_hist[1:]:
        hist = hist.unionByName(a)
    avg = hist.groupBy("domain").agg(
        F.round(
            F.sum(F.col("alpha").cast("decimal(18,8)")).cast("double")
            / F.lit(float(iters)),
            8,
        ).alias("alpha_avg")
    )
    return (
        nk.join(alpha.select("domain", F.col("alpha").alias("alpha_final")), "domain")
        .join(avg, "domain")
        .select("domain", F.col("n_k").alias("n_docs"), "alpha_final", "alpha_avg")
    )
