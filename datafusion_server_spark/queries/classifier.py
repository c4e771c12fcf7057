"""Logistic-regression classifier queries (operators.classifier).

Oracle = sequential Python replay (VALUES) — the operator is
deterministic by construction (fixed iterations, scaled-long sums,
HALF_UP rounding), and the replay shares zero Spark code."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import classifier
from datafusion_server_spark.queries import df_query

DIM = 256
ITERS = 20
LR = 5.0
PROBE = "vector"  # mid-frequency fixture token: relevance label the BoW can learn


def _replay_logreg(sf_dir: str):
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    def r0(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))

    def rnd(x: float, places: int) -> float:
        q = Decimal(1).scaleb(-places)
        return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = {}
    ys = {}
    for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        i = int(i)
        words = [w for w in (t or "").split(" ") if w]
        buckets = {
            int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % DIM for w in words
        }
        feats = {b: 1.0 for b in buckets}
        feats[DIM] = 1.0
        docs[i] = feats
        ys[i] = 1.0 if PROBE in words else 0.0

    n_docs = len(docs)
    w = [0.0] * (DIM + 1)

    def probs():
        out = {}
        for i, feats in docs.items():
            zs = sum(r0(w[b] * x * 1e12) for b, x in feats.items())
            z = float(zs) / 1e12
            out[i] = rnd(1.0 / (1.0 + math.exp(-z)), 8)
        return out

    for _ in range(ITERS):
        p = probs()
        gs = [0] * (DIM + 1)
        for i, feats in docs.items():
            e = p[i] - ys[i]
            for b, x in feats.items():
                gs[b] += r0(e * x * 1e12)
        for b in range(DIM + 1):
            g = rnd(float(gs[b]) / 1e12 / float(n_docs), 8)
            w[b] = rnd(w[b] - LR * g, 6)
    return probs(), ys


def _logreg_values_oracle(sf_dir: str) -> str:
    p, ys = _replay_logreg(sf_dir)
    rows = ", ".join(
        f"({i}, {p[i]!r}, {str(p[i] >= 0.5).upper()}, {ys[i]!r})"
        for i in sorted(p)
    )
    return f"""
    SELECT CAST(id AS BIGINT) AS id, CAST(p AS DOUBLE) AS p,
           CAST(pred AS BOOLEAN) AS pred, CAST(y AS DOUBLE) AS y
    FROM (VALUES {rows}) AS t(id, p, pred, y)
    """


@df_query("classifier_logreg_quality", _logreg_values_oracle)
def classifier_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the hashed-BoW logistic model on a probe-relevance label
    (document mentions the probe token) and score every document — the
    quality/topic-classifier shape: label any curated subset (human
    ratings, heuristic gates, topic probes), the pipeline is identical.
    The classifier must DISCOVER which hash bucket carries the label
    through gradient descent — the label never enters the features."""
    docs = tables.load(spark, sf_dir, "documents")
    feats = classifier.hashed_features(docs, "text", "doc_id", DIM)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.array_contains(F.split(F.col("text"), " "), PROBE), 1.0
        ).otherwise(0.0).alias("y"),
    )
    w = classifier.train_logreg(feats, labels, DIM, ITERS, LR)
    return classifier.predict(feats, w).join(labels, "id").select(
        "id", "p", "pred", "y"
    )


# Multinomial Naive Bayes on the same probe-relevance task — the
# one-pass counts-only classifier, with a FULL SQL oracle (no replay:
# everything is counts, rounded logs, and DECIMAL sums).
_NB_ORACLE = f"""
WITH lab AS (
  SELECT doc_id AS id,
         CASE WHEN list_contains(string_split(text, ' '), '{PROBE}') THEN 1.0 ELSE 0.0 END AS y
  FROM documents),
tok AS (
  SELECT doc_id AS id, UNNEST(string_split(text, ' ')) AS term
  FROM documents),
tok2 AS (SELECT id, term FROM tok WHERE term <> ''),
counts AS (
  SELECT t.term,
         CAST(SUM(CASE WHEN l.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN l.y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS c0
  FROM tok2 t JOIN lab l ON l.id = t.id GROUP BY t.term),
tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1, CAST(SUM(c0) AS BIGINT) AS t0,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM counts),
lik AS (
  SELECT c.term,
         CAST(ROUND(LN(CAST(c.c1 + 1 AS DOUBLE) / CAST(t.t1 + t.v AS DOUBLE)), 8) AS DECIMAL(18,8)) AS l1,
         CAST(ROUND(LN(CAST(c.c0 + 1 AS DOUBLE) / CAST(t.t0 + t.v AS DOUBLE)), 8) AS DECIMAL(18,8)) AS l0
  FROM counts c, tot t),
priors AS (
  SELECT ROUND(LN(CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 8) AS p1,
         ROUND(LN(CAST(SUM(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 8) AS p0
  FROM lab),
scored AS (
  SELECT t.id,
         ROUND(CAST(SUM(k.l1) AS DOUBLE) + pr.p1, 6) AS score1,
         ROUND(CAST(SUM(k.l0) AS DOUBLE) + pr.p0, 6) AS score0
  FROM tok2 t JOIN lik k ON k.term = t.term, priors pr
  GROUP BY t.id, pr.p1, pr.p0)
SELECT CAST(id AS BIGINT) AS id, score1, score0,
       CAST(score1 > score0 AS BOOLEAN) AS pred
FROM scored
"""


@df_query("classifier_naive_bayes", _NB_ORACLE)
def classifier_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.array_contains(F.split(F.col("text"), " "), PROBE), 1.0
        ).otherwise(0.0).alias("y"),
    )
    return classifier.naive_bayes_scores(docs, "text", "doc_id", labels)


# confusion matrix + precision/recall/F1 for the one-pass NB classifier
# (the classifier-eval companion; NB retrains cheaply inside the query).
_NB_CONF_ORACLE = f"""
WITH lab AS (
  SELECT doc_id AS id,
         CASE WHEN list_contains(string_split(text, ' '), '{PROBE}') THEN 1.0 ELSE 0.0 END AS y
  FROM documents),
tok AS (
  SELECT doc_id AS id, UNNEST(string_split(text, ' ')) AS term
  FROM documents),
tok2 AS (SELECT id, term FROM tok WHERE term <> ''),
counts AS (
  SELECT t.term,
         CAST(SUM(CASE WHEN l.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN l.y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS c0
  FROM tok2 t JOIN lab l ON l.id = t.id GROUP BY t.term),
tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1, CAST(SUM(c0) AS BIGINT) AS t0,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM counts),
lik AS (
  SELECT c.term,
         CAST(ROUND(LN(CAST(c.c1 + 1 AS DOUBLE) / CAST(t.t1 + t.v AS DOUBLE)), 8) AS DECIMAL(18,8)) AS l1,
         CAST(ROUND(LN(CAST(c.c0 + 1 AS DOUBLE) / CAST(t.t0 + t.v AS DOUBLE)), 8) AS DECIMAL(18,8)) AS l0
  FROM counts c, tot t),
priors AS (
  SELECT ROUND(LN(CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 8) AS p1,
         ROUND(LN(CAST(SUM(CASE WHEN y = 0.0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 8) AS p0
  FROM lab),
scored AS (
  SELECT t.id,
         ROUND(CAST(SUM(k.l1) AS DOUBLE) + pr.p1, 6) AS s1,
         ROUND(CAST(SUM(k.l0) AS DOUBLE) + pr.p0, 6) AS s0
  FROM tok2 t JOIN lik k ON k.term = t.term, priors pr
  GROUP BY t.id, pr.p1, pr.p0),
conf AS (
  SELECT CAST(SUM(CASE WHEN s.s1 > s.s0 AND l.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN s.s1 > s.s0 AND l.y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN s.s1 <= s.s0 AND l.y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN s.s1 <= s.s0 AND l.y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored s JOIN lab l ON l.id = s.id)
SELECT tp, fp, fn, tn,
       ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision,
       ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) AS recall,
       ROUND(2.0 * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE), 6) AS f1
FROM conf
"""


@df_query("eval_nb_confusion", _NB_CONF_ORACLE)
def eval_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.array_contains(F.split(F.col("text"), " "), PROBE), 1.0
        ).otherwise(0.0).alias("y"),
    )
    scored = classifier.naive_bayes_scores(docs, "text", "doc_id", labels).join(
        labels, "id"
    )
    pred = F.col("pred")
    y1 = F.col("y") == 1.0
    conf = scored.agg(
        F.sum((pred & y1).cast("bigint")).cast("bigint").alias("tp"),
        F.sum((pred & ~y1).cast("bigint")).cast("bigint").alias("fp"),
        F.sum((~pred & y1).cast("bigint")).cast("bigint").alias("fn"),
        F.sum((~pred & ~y1).cast("bigint")).cast("bigint").alias("tn"),
    )
    tp = F.col("tp").cast("double")
    return conf.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp / (F.col("tp") + F.col("fp")).cast("double"), 6).alias("precision"),
        F.round(tp / (F.col("tp") + F.col("fn")).cast("double"), 6).alias("recall"),
        F.round(
            2.0 * tp / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"), 6
        ).alias("f1"),
    )


# calibration report for the GD classifier: fixed probability bands vs
# actual positive rate (well-calibrated -> mean_p ~ actual_rate per
# band). Oracle = the training replay's probabilities bucketed the same
# way, emitted as VALUES.
def _logreg_calibration_oracle(sf_dir: str) -> str:
    from decimal import ROUND_HALF_UP, Decimal

    p, ys = _replay_logreg(sf_dir)
    bands: dict[int, list[int]] = {}
    for i, pi in p.items():
        b = min(9, int(pi * 10.0))
        bands.setdefault(b, []).append(i)

    def r6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    rows = []
    for b in sorted(bands):
        ids = bands[b]
        n = len(ids)
        # mirror the Spark DECIMAL(18,8) mean: sum of 8-dec probabilities
        # is exact, divide in double, round 6
        sp = sum(Decimal(repr(p[i])).quantize(Decimal("0.00000001")) for i in ids)
        mean_p = r6(float(sp) / float(n))
        pos = sum(1 for i in ids if ys[i] == 1.0)
        rate = r6(pos / n)
        rows.append(f"({b}, {n}, {mean_p!r}, {rate!r})")
    body = ", ".join(rows)
    return f"""
    SELECT CAST(band AS BIGINT) AS band, CAST(n AS BIGINT) AS n,
           CAST(mean_p AS DOUBLE) AS mean_p, CAST(actual_rate AS DOUBLE) AS actual_rate
    FROM (VALUES {body}) AS t(band, n, mean_p, actual_rate)
    """


@df_query("eval_logreg_calibration", _logreg_calibration_oracle)
def eval_logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    feats = classifier.hashed_features(docs, "text", "doc_id", DIM)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.array_contains(F.split(F.col("text"), " "), PROBE), 1.0
        ).otherwise(0.0).alias("y"),
    )
    w = classifier.train_logreg(feats, labels, DIM, ITERS, LR)
    scored = classifier.predict(feats, w).join(labels, "id")
    band = F.least(F.lit(9), F.floor(F.col("p") * 10.0)).cast("bigint")
    return (
        scored.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("p").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_p"),
            F.round(
                F.sum((F.col("y") == 1.0).cast("bigint")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("actual_rate"),
        )
    )
