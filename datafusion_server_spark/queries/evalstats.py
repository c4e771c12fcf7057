"""Round-7 evaluation/audit extensions: inter-annotator agreement
(Cohen's and Fleiss' kappa) for labeling/preference pipelines,
contrastive hard-negative mining, a Benford first-digit audit, and
target-mix KL resampling factors.

Determinism contracts (house rules): every rater/category is a pure
integer predicate, agreements aggregate as BIGINT counts, and the final
statistics are computed from those counts in ONE identical expression
order on both engines; corpus-summed float contributions round to 8
and sum as DECIMAL (the PSI/entropy pattern); constants that would
otherwise come from libm (the Benford shares) are pinned literals
embedded in both SQL texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.queries import df_query, rrepr

# --- Cohen's kappa ----------------------------------------------------------
# Two deterministic binary raters over documents ("is this a substantial
# doc?"): A = n_chars >= 300, B = whitespace-token count >= 50. The
# kappa is computed from the 2x2 agreement counts in one closed-form
# expression — no float aggregation over the corpus.

_KAPPA_A = "n_chars >= 300"
# both engines split on EVERY single space (empties included), so the
# token counts agree exactly
_KAPPA_B_SPARK = "size(split(text, ' ')) >= 50"
_KAPPA_B_DUCK = "len(string_split(text, ' ')) >= 50"


def _cohen_oracle() -> str:
    po = "(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE))"
    pa = "(CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))"
    pb = "(CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))"
    pe = f"({pa} * {pb} + (1.0 - {pa}) * (1.0 - {pb}))"
    kappa = f"(({po} - {pe}) / (1.0 - {pe}))"
    return f"""
WITH r AS (
  SELECT CASE WHEN {_KAPPA_A} THEN 1 ELSE 0 END AS a,
         CASE WHEN {_KAPPA_B_DUCK} THEN 1 ELSE 0 END AS b
  FROM documents),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM r)
SELECT n AS n_items, n11, n10, n01, n00,
       {rrepr(po, 6)} AS po,
       {rrepr(pe, 6)} AS pe,
       {rrepr(kappa, 6)} AS kappa
FROM c
"""


@df_query("eval_cohens_kappa", _cohen_oracle())
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two rule-based document raters: chance-
    corrected agreement, the standard audit before trusting a labeling
    pipeline (raw agreement is inflated by marginal imbalance).

    Scale: one aggregation to FIVE BIGINT counts; the statistic is a
    closed-form scalar expression over them — identical IEEE operation
    order on both engines, no float sum over the corpus."""
    docs = tables.load(spark, sf_dir, "documents")
    r = docs.select(
        F.when(F.expr(_KAPPA_A), 1).otherwise(0).alias("a"),
        F.when(F.expr(_KAPPA_B_SPARK), 1).otherwise(0).alias("b"),
    )
    c = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pa = (F.col("n11") + F.col("n10")).cast("double") / n
    pb = (F.col("n11") + F.col("n01")).cast("double") / n
    pe = pa * pb + (F.lit(1.0) - pa) * (F.lit(1.0) - pb)
    kappa = (po - pe) / (F.lit(1.0) - pe)
    return c.select(
        F.col("n").alias("n_items"),
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


# --- Fleiss' kappa ----------------------------------------------------------
# Three binary raters (A/B as above, C = lang = 'en'), n=3 ratings per
# item. With y = yes-votes per item, the per-item pair-agreement
# numerator y*(y-1) + (3-y)*(2-y) is an INTEGER in {2, 6}, so P_bar
# aggregates exactly as a BIGINT sum / (6*N) — no float corpus sum.

_KAPPA_C_SPARK = "lang = 'en'"
_KAPPA_C_DUCK = "lang = 'en'"


def _fleiss_oracle() -> str:
    pbar = "(CAST(sum_pairs AS DOUBLE) / (6.0 * CAST(n AS DOUBLE)))"
    p1 = "(CAST(total_yes AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)))"
    pe = f"({p1} * {p1} + (1.0 - {p1}) * (1.0 - {p1}))"
    kappa = f"(({pbar} - {pe}) / (1.0 - {pe}))"
    return f"""
WITH r AS (
  SELECT (CASE WHEN {_KAPPA_A} THEN 1 ELSE 0 END
        + CASE WHEN {_KAPPA_B_DUCK} THEN 1 ELSE 0 END
        + CASE WHEN {_KAPPA_C_DUCK} THEN 1 ELSE 0 END) AS y
  FROM documents),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS total_yes,
         CAST(SUM(y * (y - 1) + (3 - y) * (2 - y)) AS BIGINT) AS sum_pairs
  FROM r)
SELECT n AS n_items, total_yes, sum_pairs,
       {rrepr(pbar, 6)} AS p_bar,
       {rrepr(pe, 6)} AS p_e,
       {rrepr(kappa, 6)} AS fleiss_kappa
FROM c
"""


@df_query("eval_fleiss_kappa", _fleiss_oracle())
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for THREE binary raters per document — the multi-
    rater generalization (Cohen's only handles two). The per-item
    agreement numerator is integer-valued, so the whole statistic
    derives from three BIGINT aggregates."""
    docs = tables.load(spark, sf_dir, "documents")
    y = (
        F.when(F.expr(_KAPPA_A), 1).otherwise(0)
        + F.when(F.expr(_KAPPA_B_SPARK), 1).otherwise(0)
        + F.when(F.expr(_KAPPA_C_SPARK), 1).otherwise(0)
    )
    c = docs.select(y.alias("y")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("total_yes"),
        F.sum(
            F.col("y") * (F.col("y") - 1) + (3 - F.col("y")) * (2 - F.col("y"))
        )
        .cast("bigint")
        .alias("sum_pairs"),
    )
    n = F.col("n").cast("double")
    pbar = F.col("sum_pairs").cast("double") / (F.lit(6.0) * n)
    p1 = F.col("total_yes").cast("double") / (F.lit(3.0) * n)
    pe = p1 * p1 + (F.lit(1.0) - p1) * (F.lit(1.0) - p1)
    kappa = (pbar - pe) / (F.lit(1.0) - pe)
    return c.select(
        F.col("n").alias("n_items"),
        "total_yes",
        "sum_pairs",
        F.round(pbar, 6).alias("p_bar"),
        F.round(pe, 6).alias("p_e"),
        F.round(kappa, 6).alias("fleiss_kappa"),
    )


# --- hard-negative mining ---------------------------------------------------

_HN_K = 5
_HN_QUERIES = 10

_HN_ORACLE = f"""
WITH el AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
                   GENERATE_SUBSCRIPTS(embedding, 1) AS i
            FROM embeddings),
norms AS (SELECT vec_id,
                 SQRT(CAST(CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
          FROM el GROUP BY vec_id),
dots AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
         CAST(SUM(CAST(ROUND(qa.x * ca.x * 1e12) AS BIGINT)) AS BIGINT) AS dot
  FROM el qa JOIN el ca ON ca.i = qa.i AND ca.vec_id <> qa.vec_id
  WHERE qa.vec_id < {_HN_QUERIES}
  GROUP BY 1, 2),
flt AS (
  SELECT d.query_id, d.neighbor_id, d.dot
  FROM dots d
  JOIN embeddings eq ON eq.vec_id = d.query_id
  JOIN embeddings ec ON ec.vec_id = d.neighbor_id
  WHERE eq.label <> ec.label),
scored AS (
  SELECT f.query_id, f.neighbor_id,
         ROUND((CAST(f.dot AS DOUBLE) / 1e12) / (nq.nrm * nc.nrm), 6) AS cosine
  FROM flt f
  JOIN norms nq ON nq.vec_id = f.query_id
  JOIN norms nc ON nc.vec_id = f.neighbor_id)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored) t
WHERE rnk <= {_HN_K}
"""


@df_query("mine_hard_negatives", _HN_ORACLE)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest DIFFERENT-label neighbors per query vector — the
    hard negatives a contrastive trainer mines (closest wrong answers
    carry the gradient signal). Same broadcast nested-loop + in-row
    scaled-long dot shape as knn_bruteforce_cosine; the label
    inequality lives in the join condition."""
    from datafusion_server_spark.operators import similarity

    emb = tables.load(spark, sf_dir, "embeddings")
    return similarity.hard_negative_topk(
        emb, emb.filter(F.col("vec_id") < _HN_QUERIES), _HN_K
    )


# --- Benford first-digit audit ----------------------------------------------
# First significant digit of the EXACT cent value (DECIMAL*100 ->
# BIGINT -> leading character: no float log in the digit derivation).
# The Benford expectation log10(1 + 1/d) is a PINNED literal (8 dp)
# embedded in both SQL texts — no libm divergence possible.

_BENFORD = {
    1: 0.30103000,
    2: 0.17609126,
    3: 0.12493874,
    4: 0.09691001,
    5: 0.07918125,
    6: 0.06694679,
    7: 0.05799195,
    8: 0.05115252,
    9: 0.04575749,
}


def _benford_case(digit_expr: str) -> str:
    whens = " ".join(
        f"WHEN {d} THEN CAST({p!r} AS DOUBLE)" for d, p in _BENFORD.items()
    )
    return f"(CASE {digit_expr} {whens} END)"


def _benford_oracle() -> str:
    share = "(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))"
    contrib = (
        f"(({share} - expected) * ({share} - expected) / expected)"
    )
    return f"""
WITH d AS (
  SELECT CAST(SUBSTR(CAST(CAST(o_totalprice * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
e AS (
  SELECT c.digit, c.n, t.total, {_benford_case("c.digit")} AS expected
  FROM c, t)
SELECT digit, n,
       {rrepr(share, 6)} AS share,
       expected AS benford_share,
       CAST(CAST(ROUND({contrib}, 8) AS DECIMAL(18,8)) AS DOUBLE) AS chi2_contrib
FROM e
"""


@df_query("profile_benford_first_digit", _benford_oracle())
def profile_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data screen. The digit comes from the exact cent value
    (DECIMAL arithmetic, string head), never from float log10; the
    expected shares are pinned literals. Scale: one 9-group
    aggregation; everything after runs on 9 rows."""
    orders = tables.load(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(
            (F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    expected = F.expr(_benford_case("digit"))
    share = F.col("n").cast("double") / F.col("total").cast("double")
    contrib = (share - expected) * (share - expected) / expected
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            expected.alias("benford_share"),
            F.round(contrib, 8)
            .cast("decimal(18,8)")
            .cast("double")
            .alias("chi2_contrib"),
        )
    )


# --- target-mix KL + resampling factors --------------------------------------
# Actual source shares vs a pinned uniform target; per-source KL
# contribution (rounded-ln DECIMAL, the PSI pattern) and the
# up/down-sampling factor a mixer would apply.

_MIX_TARGET = 0.05  # uniform over the 20 fixture sources


def _mix_oracle() -> str:
    share = "(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))"
    contrib = f"({share} * LN({share} / {_MIX_TARGET!r}))"
    factor = f"({_MIX_TARGET!r} / {share})"
    return f"""
WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT source, n,
       {rrepr(share, 6)} AS actual_share,
       CAST({_MIX_TARGET!r} AS DOUBLE) AS target_share,
       CAST(CAST(ROUND({contrib}, 8) AS DECIMAL(18,8)) AS DOUBLE) AS kl_contrib,
       {rrepr(factor, 6)} AS resample_factor
FROM c, t
"""


@df_query("sample_mix_kl_target", _mix_oracle())
def sample_mix_kl_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source divergence report against a pinned target mixture:
    actual share, KL(actual||target) contribution (rounded-ln DECIMAL
    contract), and the resampling factor (target/actual) a mixer
    applies to hit the target. One source-keyed aggregation; the
    report is |sources|-bounded."""
    docs = tables.load(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    share = F.col("n").cast("double") / F.col("total").cast("double")
    contrib = share * F.log(share / F.lit(_MIX_TARGET))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n",
            F.round(share, 6).alias("actual_share"),
            F.lit(_MIX_TARGET).alias("target_share"),
            F.round(contrib, 8)
            .cast("decimal(18,8)")
            .cast("double")
            .alias("kl_contrib"),
            F.round(F.lit(_MIX_TARGET) / share, 6).alias("resample_factor"),
        )
    )


# --- KNN label-noise screen ---------------------------------------------------
# Confident-learning-style mislabel detector: a vector whose nearest
# neighbors overwhelmingly carry a DIFFERENT label is a likely labeling
# error. Probe subset keeps the oracle's element join bounded; the
# Spark side is the same broadcast-KNN shape as knn_bruteforce_cosine
# plus one bounded per-query aggregation.

_NOISE_K = 10
_NOISE_PROBES = 50

_NOISE_ORACLE = f"""
WITH el AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x,
                   GENERATE_SUBSCRIPTS(embedding, 1) AS i
            FROM embeddings),
norms AS (SELECT vec_id,
                 SQRT(CAST(CAST(SUM(CAST(ROUND(x * x * 1e12) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS nrm
          FROM el GROUP BY vec_id),
dots AS (
  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
         CAST(SUM(CAST(ROUND(qa.x * ca.x * 1e12) AS BIGINT)) AS BIGINT) AS dot
  FROM el qa JOIN el ca ON ca.i = qa.i AND ca.vec_id <> qa.vec_id
  WHERE qa.vec_id < {_NOISE_PROBES}
  GROUP BY 1, 2),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         ROUND((CAST(d.dot AS DOUBLE) / 1e12) / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.query_id
  JOIN norms nc ON nc.vec_id = d.neighbor_id),
knn AS (
  SELECT query_id, neighbor_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored) t
  WHERE rnk <= {_NOISE_K})
SELECT CAST(k.query_id AS BIGINT) AS vec_id,
       CAST(eq.label AS BIGINT) AS label,
       CAST(SUM(CASE WHEN ec.label <> eq.label THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree,
       ROUND(CAST(SUM(CASE WHEN ec.label <> eq.label THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS noise_score
FROM knn k
JOIN embeddings eq ON eq.vec_id = k.query_id
JOIN embeddings ec ON ec.vec_id = k.neighbor_id
GROUP BY k.query_id, eq.label
"""


@df_query("eval_knn_label_noise", _NOISE_ORACLE)
def eval_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-probe label-noise score: the fraction of the k nearest
    neighbors (brute-force cosine) whose label disagrees with the
    probe's own — the embedding-space mislabel screen run before
    training a classifier on noisy labels."""
    from datafusion_server_spark.operators import similarity

    emb = tables.load(spark, sf_dir, "embeddings")
    knn = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < _NOISE_PROBES), _NOISE_K
    )
    lab = emb.select(
        F.col("vec_id").alias("__id"), F.col("label").cast("bigint").alias("__lbl")
    )
    joined = (
        knn.join(
            F.broadcast(lab.select(F.col("__id").alias("query_id"),
                                   F.col("__lbl").alias("qlabel"))),
            "query_id",
        )
        .join(
            F.broadcast(lab.select(F.col("__id").alias("neighbor_id"),
                                   F.col("__lbl").alias("nlabel"))),
            "neighbor_id",
        )
    )
    disagree = F.when(F.col("nlabel") != F.col("qlabel"), 1).otherwise(0)
    return joined.groupBy("query_id", "qlabel").agg(
        F.sum(disagree).cast("bigint").alias("n_disagree"),
        F.round(
            F.sum(disagree).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("noise_score"),
    ).select(
        F.col("query_id").cast("bigint").alias("vec_id"),
        F.col("qlabel").alias("label"),
        "n_disagree",
        "noise_score",
    )


# --- per-source keep-rate leaderboard with Wilson intervals -------------------
# The curation dashboard row: keep-rate per source with a 95% Wilson
# score interval — the interval that stays sane at extreme rates and
# small n (a plain normal interval exits [0,1]). sqrt is IEEE
# correctly-rounded, so identical expressions agree bit-for-bit; z is
# a pinned literal.

_WILSON_Z = 1.959964  # pinned literal, both SQL texts
_KEEP_PRED = "n_chars >= 200"  # the gate being audited


def _wilson_oracle() -> str:
    z2 = f"({_WILSON_Z!r} * {_WILSON_Z!r})"
    nn = "CAST(n AS DOUBLE)"
    ph = "(CAST(kept AS DOUBLE) / CAST(n AS DOUBLE))"
    denom = f"(1.0 + {z2} / {nn})"
    center = f"(({ph} + {z2} / (2.0 * {nn})) / {denom})"
    half = (
        f"(({_WILSON_Z!r} * SQRT(({ph} * (1.0 - {ph}) + {z2} / (4.0 * {nn})) / {nn}))"
        f" / {denom})"
    )
    return f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN {_KEEP_PRED} THEN 1 ELSE 0 END) AS BIGINT) AS kept
  FROM documents GROUP BY source)
SELECT source, n, kept,
       {rrepr(ph, 6)} AS keep_rate,
       {rrepr(f"{center} - {half}", 6)} AS ci_lo,
       {rrepr(f"{center} + {half}", 6)} AS ci_hi
FROM c
"""


@df_query("quality_wilson_intervals", _wilson_oracle())
def quality_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep-rate with a 95% Wilson score interval — the
    report that tells you whether src7's 0.62 and src12's 0.71 are
    actually different or just small-n noise. One source-keyed
    aggregation; the interval is a closed form over (n, kept)."""
    docs = tables.load(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.expr(_KEEP_PRED), 1).otherwise(0))
        .cast("bigint")
        .alias("kept"),
    )
    z = F.lit(_WILSON_Z)
    z2 = z * z
    nn = F.col("n").cast("double")
    ph = F.col("kept").cast("double") / nn
    denom = F.lit(1.0) + z2 / nn
    center = (ph + z2 / (F.lit(2.0) * nn)) / denom
    half = (
        z * F.sqrt((ph * (F.lit(1.0) - ph) + z2 / (F.lit(4.0) * nn)) / nn)
    ) / denom
    return c.select(
        "source",
        "n",
        "kept",
        F.round(ph, 6).alias("keep_rate"),
        F.round(center - half, 6).alias("ci_lo"),
        F.round(center + half, 6).alias("ci_hi"),
    )


# --- Krippendorff's alpha (binary, missing ratings) ---------------------------
# The agreement coefficient that tolerates MISSING ratings (Fleiss
# requires a full panel): rater C abstains outside lang en/de/fr, so
# units have 2 or 3 pairable values. With m_u in {2,3}, the observed-
# disagreement numerator 2*y(m-y)/(m-1) is INTEGER per unit (2*y*(2-y)
# or y*(3-y)), so the whole statistic is a closed form over BIGINT
# coincidence totals — no float corpus sum.

_KRIPP_C_PRESENT = "lang IN ('en', 'de', 'fr')"
_KRIPP_C_YES = "lang = 'en'"


def _kripp_oracle() -> str:
    do = "(CAST(do_num AS DOUBLE) / CAST(n AS DOUBLE))"
    de = (
        "(2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
    )
    alpha = f"(1.0 - {do} / {de})"
    return f"""
WITH r AS (
  SELECT (CASE WHEN {_KAPPA_A} THEN 1 ELSE 0 END
        + CASE WHEN {_KAPPA_B_DUCK} THEN 1 ELSE 0 END
        + CASE WHEN {_KRIPP_C_PRESENT} AND {_KRIPP_C_YES} THEN 1 ELSE 0 END) AS y,
         CASE WHEN {_KRIPP_C_PRESENT} THEN 3 ELSE 2 END AS m
  FROM documents),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
         CAST(SUM(m) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN m = 3 THEN y * (3 - y)
                       ELSE 2 * y * (2 - y) END) AS BIGINT) AS do_num
  FROM r)
SELECT n_units, n AS n_values, n1 AS n_yes, do_num,
       {rrepr(do, 6)} AS d_observed,
       {rrepr(de, 6)} AS d_expected,
       {rrepr(alpha, 6)} AS alpha
FROM c
"""


@df_query("eval_krippendorff_alpha", _kripp_oracle())
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha for two full raters + one abstaining rater
    (binary, nominal distance): coincidence-matrix form with an
    integer per-unit disagreement numerator, so the statistic derives
    exactly from four BIGINT aggregates."""
    docs = tables.load(spark, sf_dir, "documents")
    y = (
        F.when(F.expr(_KAPPA_A), 1).otherwise(0)
        + F.when(F.expr(_KAPPA_B_SPARK), 1).otherwise(0)
        + F.when(F.expr(f"({_KRIPP_C_PRESENT}) AND ({_KRIPP_C_YES})"), 1).otherwise(0)
    )
    m = F.when(F.expr(_KRIPP_C_PRESENT), 3).otherwise(2)
    r = docs.select(y.alias("y"), m.alias("m"))
    c = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum("m").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n1"),
        F.sum(
            F.when(
                F.col("m") == 3, F.col("y") * (3 - F.col("y"))
            ).otherwise(2 * F.col("y") * (2 - F.col("y")))
        )
        .cast("bigint")
        .alias("do_num"),
    )
    nn = F.col("n").cast("double")
    do = F.col("do_num").cast("double") / nn
    de = (
        F.lit(2.0)
        * F.col("n1").cast("double")
        * (F.col("n") - F.col("n1")).cast("double")
        / (nn * (F.col("n") - 1).cast("double"))
    )
    alpha = F.lit(1.0) - do / de
    return c.select(
        "n_units",
        F.col("n").alias("n_values"),
        F.col("n1").alias("n_yes"),
        "do_num",
        F.round(do, 6).alias("d_observed"),
        F.round(de, 6).alias("d_expected"),
        F.round(alpha, 6).alias("alpha"),
    )
