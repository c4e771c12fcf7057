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

    # r14 (guide §1.2): per-iteration stages as SQL strings — same
    # expression trees as the Column chain (and as train_logreg), the
    # loop just parses them in a handful of round-trips per iteration.
    from datafusion_server_spark.operators.similarity import SCALE

    for _ in range(iters):
        p = _logits(feats, weights)
        err = p.join(lab, "id").selectExpr("id", "p - y AS __e")
        probe_e = err.where(f"id = {int(probe_id)}").selectExpr("__e AS __ep")
        acc = (
            acc.join(err, "id")
            .crossJoin(F.broadcast(probe_e))
            .selectExpr(
                "id",
                f"acc + CAST(ROUND(__ep * __e * {ACC_SCALE}) AS BIGINT) AS acc",
            )
            .localCheckpoint()
        )
        # the standard GD step (same arithmetic as classifier.train_logreg)
        grad = (
            feats.join(err, "id")
            .groupBy("bucket")
            .agg(F.expr(f"SUM(CAST(ROUND(__e * x * {SCALE}) AS BIGINT)) AS __gs"))
            .selectExpr(
                "bucket",
                f"ROUND(CAST(__gs AS DOUBLE) / {SCALE} / {float(n)!r}D, 8) AS __g",
            )
        )
        weights = (
            weights.join(grad, "bucket", "left")
            .selectExpr(
                "bucket",
                f"ROUND(w - {float(lr)!r}D * COALESCE(__g, 0.0D), 6) AS w",
            )
            .localCheckpoint()
        )

    return acc.join(common, "id").selectExpr(
        "id",
        "common_buckets",
        f"ROUND({float(lr)!r}D * CAST(common_buckets AS DOUBLE)"
        f" * (CAST(acc AS DOUBLE) / {float(ACC_SCALE)!r}D), 6) AS influence",
    )
