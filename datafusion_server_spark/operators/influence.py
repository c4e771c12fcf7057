"""TracIn data attribution (arXiv:2002.08484) over the deterministic
logreg trainer.

Beyond-reference operator — the data-attribution leg of an LLM
pipeline: which training documents pushed the model toward (or away
from) its behavior on a probe example? TracIn approximates influence as
the sum over training checkpoints of gradient dot products:

    inf(d) = sum_t  lr * < grad loss(probe; w_t), grad loss(d; w_t) >

For logistic regression over binary hashed-BoW features the per-doc
gradient is ``(p - y) * x`` with ``x`` a 0/1 bucket-indicator, so the
dot product factors into

    inf(d) = lr * |buckets(probe) ∩ buckets(d)|
                * sum_t  e_t(probe) * e_t(d)

with ``e_t = p_t - y`` the per-doc error under the iteration-t weights
— the bucket-overlap term is iteration-independent and computed ONCE.

Determinism contract: each iteration's error product is shortest-repr
rounded to a 1e-6 scaled long BEFORE accumulation, so the cross-
iteration sum is integer (order-free); the final influence is one
repr-rounded division. All cross-row sums inside the logit pass are
the classifier family's scaled longs.

Scale shape (100 TB): the accumulator is ONE narrow (id, acc) table
updated per iteration — O(corpus) state like TracIn's checkpoint
passes, localCheckpointed so lineage stays flat; the probe error is a
1-row cross join (broadcast); bucket overlap is one join on the
(dim+1)-bounded bucket axis. The driver loops over iterations only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_server_spark.operators.classifier import _logits

ACC_SCALE = 1_000_000  # 1e-6 grid for the per-iteration error products


def tracin_influence(
    features: DataFrame,
    labels: DataFrame,
    probe_id: int,
    dim: int = 64,
    iters: int = 8,
    lr: float = 5.0,
) -> DataFrame:
    """(id, common_buckets, influence): TracIn influence of every
    training document on the probe document, through ``iters``
    full-batch GD checkpoints from w = 0. The probe participates in
    training (self-influence is the classic sanity row: it should rank
    high)."""
    spark = features.sparkSession
    n = labels.count()
    feats = features.localCheckpoint()
    lab = labels.localCheckpoint()

    common = (
        feats.alias("f")
        .join(
            feats.filter(F.col("id") == probe_id).select("bucket").alias("p"),
            F.col("f.bucket") == F.col("p.bucket"),
        )
        .groupBy("f.id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_buckets"))
    )

    weights = spark.range(dim + 1).select(
        F.col("id").cast("bigint").alias("bucket"), F.lit(0.0).alias("w")
    ).localCheckpoint()
    acc = lab.select("id", F.lit(0).cast("bigint").alias("acc")).localCheckpoint()

    for _ in range(iters):
        p = _logits(feats, weights)
        err = p.join(lab, "id").select(
            "id", (F.col("p") - F.col("y")).alias("__e")
        )
        probe_e = err.filter(F.col("id") == probe_id).select(
            F.col("__e").alias("__ep")
        )
        acc = (
            acc.join(err, "id")
            .crossJoin(F.broadcast(probe_e))
            .select(
                "id",
                (
                    F.col("acc")
                    + F.round(F.col("__ep") * F.col("__e") * ACC_SCALE).cast("bigint")
                ).alias("acc"),
            )
            .localCheckpoint()
        )
        # the standard GD step (same arithmetic as classifier.train_logreg)
        from datafusion_server_spark.operators.similarity import SCALE

        grad = (
            feats.join(err, "id")
            .groupBy("bucket")
            .agg(
                F.sum(
                    F.round(F.col("__e") * F.col("x") * SCALE).cast("bigint")
                ).alias("__gs")
            )
            .select(
                "bucket",
                F.round(
                    F.col("__gs").cast("double") / SCALE / float(n), 8
                ).alias("__g"),
            )
        )
        weights = (
            weights.join(grad, "bucket", "left")
            .select(
                "bucket",
                F.round(
                    F.col("w") - lr * F.coalesce(F.col("__g"), F.lit(0.0)), 6
                ).alias("w"),
            )
            .localCheckpoint()
        )

    return acc.join(common, "id").select(
        "id",
        "common_buckets",
        F.round(
            F.lit(lr)
            * F.col("common_buckets").cast("double")
            * (F.col("acc").cast("double") / F.lit(float(ACC_SCALE))),
            6,
        ).alias("influence"),
    )
