"""Deterministic sampling/splitting queries (operators/sampling.py) with
exact DuckDB oracles — the hash math is md5-based and engine-identical,
so the oracle reproduces the EXACT sampled row set, not just its size."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import sampling
from datafusion_server_spark.operators.scale import ranked_topk
from datafusion_server_spark.queries import df_query

# per-language mixture weights for the stratified sample
_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.1}

_FRAC = (
    "(CAST(('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " / CAST(16.0 ** 15 AS DOUBLE))"
)

_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{s}' THEN {r}" for s, r in _RATES.items()
) + " ELSE 0.0 END"

_SAMPLE_ORACLE = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM documents
WHERE {_FRAC.format(seed='sample')} < {_RATE_CASE}
"""


@df_query("sample_stratified_hash", _SAMPLE_ORACLE)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    kept = sampling.stratified_sample(docs, "doc_id", "lang", _RATES)
    return kept.select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang")


# domain mixing: keep-rate per source derived from actual counts so the
# output approaches the target shares; identical double arithmetic on
# both engines (share * total / n_d, LEAST with 1.0)
_MIX_SHARES = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.05, "src4": 0.05}
_MIX_TOTAL = 60

_MIX_CASE = "CASE source " + " ".join(
    f"WHEN '{s}' THEN {r}" for s, r in _MIX_SHARES.items()
) + " ELSE 0.0 END"

_MIX_ORACLE = f"""
WITH counts AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_d FROM documents GROUP BY source),
rates AS (SELECT source, LEAST(1.0, {_MIX_CASE} * {float(_MIX_TOTAL)} / n_d) AS rate FROM counts)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source
FROM documents d JOIN rates r ON r.source = d.source
WHERE {_FRAC.format(seed='mix')} < r.rate
"""


@df_query("sample_domain_mix", _MIX_ORACLE)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    kept = sampling.domain_mix_sample(docs, "doc_id", "source", _MIX_SHARES, _MIX_TOTAL)
    return kept.select(F.col("doc_id").cast("bigint").alias("doc_id"), "source")


# deterministic k-per-group reservoir: within each source keep the 5
# docs with the smallest hash fraction (hash-rank reservoir sampling)
_RESERVOIR_K = 5

_RESERVOIR_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {_FRAC.format(seed='reservoir')} ASC, doc_id ASC) AS r
  FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, CAST(r AS BIGINT) AS sample_rank
FROM ranked WHERE r <= {_RESERVOIR_K}
"""


@df_query("sample_reservoir_per_group", _RESERVOIR_ORACLE)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    kept = sampling.reservoir_per_group(docs, "doc_id", "source", _RESERVOIR_K)
    return kept.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source", "sample_rank"
    )


_SPLIT_ORACLE = f"""
SELECT split, CAST(COUNT(*) AS BIGINT) AS n, CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM (
  SELECT doc_id,
         CASE WHEN {_FRAC.format(seed='split')} < 0.1 THEN 'val'
              WHEN {_FRAC.format(seed='split')} < 0.2 THEN 'test'
              ELSE 'train' END AS split
  FROM documents)
GROUP BY split
"""


@df_query("split_train_val_test", _SPLIT_ORACLE)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    assigned = sampling.split_assign(docs, "doc_id")
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("doc_id").cast("bigint").alias("min_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
    )


# temperature-scaled mixing over the SKEWED lang distribution (en ~4.4x
# fr at sf0.01): alpha=0.5 up-weights small languages relative to en.
# The share denominator is an exact DECIMAL sum of per-domain
# round(n^alpha, 6); the share division runs in double on both engines.
_TMIX_ALPHA = 0.5
_TMIX_TOTAL = 120

_TMIX_ORACLE = f"""
WITH counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_d FROM documents GROUP BY lang),
w AS (SELECT lang, n_d,
             CAST(ROUND(POWER(CAST(n_d AS DOUBLE), {_TMIX_ALPHA}), 6) AS DECIMAL(28,6)) AS w
      FROM counts),
rates AS (SELECT lang,
                 LEAST(1.0, (CAST(w AS DOUBLE) / CAST((SELECT SUM(w) FROM w) AS DOUBLE))
                            * {float(_TMIX_TOTAL)} / CAST(n_d AS DOUBLE)) AS rate
          FROM w)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
FROM documents d JOIN rates r ON r.lang = d.lang
WHERE {_FRAC.format(seed='tmix')} < r.rate
"""


@df_query("sample_temperature_mix", _TMIX_ORACLE)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    kept = sampling.temperature_mix_sample(
        docs, "doc_id", "lang", _TMIX_ALPHA, _TMIX_TOTAL
    )
    return kept.select(F.col("doc_id").cast("bigint").alias("doc_id"), "lang")


# weighted reservoir: per source, 5 docs sampled proportionally to
# n_chars (longer docs likelier) — A-Res with the rounded-ln(u)/w key.
_WRES_K = 5

_WRES_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ROUND(LN(GREATEST({_FRAC.format(seed='wres')}, 5e-19)), 8) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE CAST(n_chars AS DOUBLE) > 0),
ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY key DESC, doc_id ASC) AS r
  FROM keyed)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, CAST(r AS BIGINT) AS sample_rank
FROM ranked WHERE r <= {_WRES_K}
"""


@df_query("sample_weighted_reservoir", _WRES_ORACLE)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    kept = sampling.weighted_reservoir_per_group(
        docs, "doc_id", "source", "n_chars", _WRES_K
    )
    return kept.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source", "sample_rank"
    )


# Kish effective sample size of the documents' n_chars-weighted mix per
# language — the after-mixing diagnostic.
_ESS_ORACLE = """
WITH agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(CAST(n_chars AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(ROUND(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE), 4) AS DECIMAL(38,4))) AS DOUBLE) AS ss
  FROM documents WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
  GROUP BY lang)
SELECT lang, n, ROUND(s * s / ss, 6) AS ess,
       ROUND((s * s / ss) / CAST(n AS DOUBLE), 6) AS ess_ratio
FROM agg
"""


@df_query("sample_effective_size", _ESS_ORACLE)
def sample_effective_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    return sampling.effective_sample_size(docs, "n_chars", "lang")


# Deterministic shuffle-shard export (r5): the dataloader-facing global
# shuffle — shard by md5 bucket, rank within shard by hash value.
_N_SHARDS = 16

_SHARD_ORACLE = f"""
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         CAST(('0x' || SUBSTR(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM documents)
SELECT id, CAST(hv % {_N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hv % {_N_SHARDS} ORDER BY hv, id) AS BIGINT) AS pos
FROM h
"""


@df_query("sample_shuffle_shards", _SHARD_ORACLE)
def sample_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible pre-training shuffle: (id, shard, pos) as a pure
    function of (seed, doc_id) — per-shard rank windows, never a global
    sort; `write_dataset(partition_by='shard')` turns this directly
    into dataloader shard files."""
    docs = tables.load(spark, sf_dir, "documents")
    return sampling.shuffle_shard_export(docs, "doc_id", _N_SHARDS)


# Epoch-multiplicity mixing (r5): LLaMA-recipe per-source epochs —
# expected duplication of stratum s is exactly multiplicities[s].
_EPOCH_MULTS = {"web": 0.9, "wiki": 2.4, "books": 1.6}

_EPOCH_CASE = "CASE source " + " ".join(
    f"WHEN '{k}' THEN {v!r}" for k, v in _EPOCH_MULTS.items()
) + " ELSE 1.0 END"

_EPOCH_ORACLE = f"""
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS id, source,
         {_EPOCH_CASE} AS m,
         (CAST(('0x' || SUBSTR(md5('epoch:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          / CAST(16.0 ** 15 AS DOUBLE)) AS frac
  FROM documents),
cnt AS (
  SELECT id, source AS stratum,
         CAST(FLOOR(m) AS BIGINT)
         + CASE WHEN frac < m - FLOOR(m) THEN 1 ELSE 0 END AS n
  FROM base)
SELECT id, stratum, CAST(UNNEST(GENERATE_SERIES(1, n)) AS BIGINT) AS epoch
FROM cnt WHERE n > 0
"""


@df_query("sample_epoch_mix", _EPOCH_ORACLE)
def sample_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch multiplicities: floor(m) copies of every row
    plus a hash-decided extra so a stratum's expected duplication is
    exactly m — the data-recipe step between curation and packing."""
    docs = tables.load(spark, sf_dir, "documents")
    return sampling.epoch_mix(docs, "doc_id", "source", _EPOCH_MULTS)


# DSIR importance resampling (arXiv:2302.03169): weight every document
# by how much its hashed-unigram distribution looks like the TARGET
# domain (here: the src0/src1 sources) relative to the raw corpus.
# Per-bucket log-ratios are rounded to 8 and summed as DECIMAL, so the
# only cross-engine float op (ln) is quantized before aggregation (the
# corpus-LM pattern); top-k selection orders by the EXACT decimal sum.
_DSIR_BUCKETS = 256
_DSIR_K = 40
_DSIR_TARGET = ("src0", "src1")

_DSIR_ORACLE = f"""
WITH tok AS MATERIALIZED (
  SELECT t.doc_id AS id, (t.source IN ('src0', 'src1')) AS is_target,
         CAST(('0x' || SUBSTR(md5('dsir:' || t.term), 1, 15)) AS BIGINT)
           % {_DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS term
        FROM documents) t),
counts AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS ct
  FROM tok GROUP BY bucket),
tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr, CAST(SUM(ct) AS BIGINT) AS tt
        FROM counts),
lr AS (
  SELECT bucket,
         CAST(ROUND(LN(CAST(ct + 1 AS DOUBLE) / CAST(tt + {_DSIR_BUCKETS} AS DOUBLE))
                  - LN(CAST(cr + 1 AS DOUBLE) / CAST(tr + {_DSIR_BUCKETS} AS DOUBLE)),
                    8) AS DECIMAL(18,8)) AS lr
  FROM counts, tot),
scored AS (
  SELECT t.id, CAST(COUNT(*) AS BIGINT) AS n_tokens, SUM(l.lr) AS logw_dec
  FROM tok t JOIN lr l USING (bucket) GROUP BY t.id)
SELECT CAST(rnk AS BIGINT) AS rank_pos, CAST(id AS BIGINT) AS id, n_tokens,
       {{logw}} AS logw
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY logw_dec DESC, id ASC) AS rnk
      FROM scored) s
WHERE rnk <= {_DSIR_K}
"""


def _dsir_oracle() -> str:
    from datafusion_server_spark.queries import rrepr

    return _DSIR_ORACLE.format(logw=rrepr("CAST(logw_dec AS DOUBLE)", 6))


@df_query("sample_dsir_topk", _dsir_oracle())
def sample_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents by DSIR importance weight against the src0/src1
    target domain — the data-selection step that shifts a raw-corpus
    mixture toward a curated target distribution. The rank comes from
    ``ranked_topk`` (TakeOrderedAndProject top-k, then a window over the
    k survivors only) — the full scored corpus never funnels through a
    single-partition window."""
    docs = tables.load(spark, sf_dir, "documents")
    scored = sampling.dsir_importance(
        docs,
        "text",
        "doc_id",
        "source IN ({})".format(", ".join(f"'{s}'" for s in _DSIR_TARGET)),
        n_buckets=_DSIR_BUCKETS,
    )
    return ranked_topk(
        scored, [F.desc("logw_dec"), F.asc("id")], _DSIR_K, rank_col="rank_pos"
    ).selectExpr(
        "rank_pos",
        "CAST(id AS BIGINT) AS id",
        "n_tokens",
        "ROUND(logw, 6) AS logw",
    )


# interleaved length-curriculum ordering: uniform word-count bands from
# one broadcast min/max (never a global NTILE sort), per-band ranks,
# round-robin global training position. All-integer -> exact oracle.
_CURRICULUM_ORACLE = """
WITH nw AS (SELECT CAST(doc_id AS BIGINT) AS id,
                   CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w <> '')) AS BIGINT) AS score
            FROM documents),
bounds AS (SELECT MIN(score) AS mn, MAX(score) AS mx FROM nw),
banded AS (SELECT id, score,
                  CAST(((score - mn) * 10) // (mx - mn + 1) AS BIGINT) AS stratum
           FROM nw, bounds),
r AS (SELECT id, score, stratum,
             CAST(ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY score ASC, id ASC) AS BIGINT) AS pos_in_stratum
      FROM banded)
SELECT id, score, stratum, pos_in_stratum,
       (pos_in_stratum - 1) * 10 + stratum AS training_position
FROM r
"""


@df_query("sample_curriculum_order", _CURRICULUM_ORACLE)
def sample_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum: word count as the difficulty proxy
    (short -> long), interleaved so each consecutive block of 10
    training rows spans all difficulty bands."""
    docs = tables.load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda w: w != "")
        ).cast("bigint").alias("n_words"),
    )
    return sampling.curriculum_order(scored, "doc_id", "n_words", 10)


# Water-filling token-budget allocation across the 20 sources with a
# 95% corpus budget: scarce sources are taken whole; the largest few
# are levelled down to a common water level so allocations sum EXACTLY
# to the budget. All-integer arithmetic -> exact oracle. The windows on
# both sides run over the strata-bounded aggregate (20 rows), never the
# corpus.
_WF_NUM, _WF_DEN = 19, 20

_WATERFILL_ORACLE = f"""
WITH agg AS (
  SELECT source AS stratum, CAST(SUM(n_chars) AS BIGINT) AS avail
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(avail) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n FROM agg),
ranked AS (
  SELECT stratum, avail,
         CAST(ROW_NUMBER() OVER (ORDER BY avail ASC, stratum ASC) AS BIGINT) AS j,
         CAST(COALESCE(SUM(avail) OVER (
             ORDER BY avail ASC, stratum ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s_prev
  FROM agg),
base AS (
  SELECT r.stratum, r.avail, r.j, t.n - r.j + 1 AS k,
         CAST((t.total * {_WF_NUM}) // {_WF_DEN} AS BIGINT) - r.s_prev AS rem
  FROM ranked r, tot t),
star AS (
  SELECT *, MIN(CASE WHEN avail * k > rem THEN j END) OVER () AS jstar FROM base),
star2 AS (
  SELECT *, MIN(CASE WHEN j = jstar THEN rem END) OVER () AS rem_star,
            MIN(CASE WHEN j = jstar THEN k END) OVER () AS k_star
  FROM star),
flagged AS (
  SELECT stratum, avail, rem_star // k_star AS lvl, rem_star % k_star AS leftover,
         (jstar IS NULL OR j < jstar) AS fully_used
  FROM star2),
final AS (
  SELECT stratum, avail, lvl, leftover, fully_used,
         ROW_NUMBER() OVER (PARTITION BY fully_used ORDER BY stratum ASC) AS ru
  FROM flagged)
SELECT stratum, CAST(avail AS BIGINT) AS avail_tokens,
       CAST(CASE WHEN fully_used THEN avail
                 ELSE lvl + CASE WHEN ru <= leftover THEN 1 ELSE 0 END END
            AS BIGINT) AS alloc_tokens,
       fully_used
FROM final
"""


@df_query("sample_token_waterfill", _WATERFILL_ORACLE)
def sample_token_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget planning: water-fill a 95% corpus budget across the
    documents' sources (chars as the token proxy) — how many tokens may
    each domain contribute so scarce domains are kept whole and abundant
    ones level down to exactly the budget."""
    docs = tables.load(spark, sf_dir, "documents")
    return sampling.token_budget_waterfill(
        docs, "source", F.col("n_chars"), _WF_NUM, _WF_DEN
    )


# UniMax allocation (arXiv:2304.09151): uniform budget across sources
# capped at max-epochs passes per source. Budget = half the corpus,
# epoch cap = 0.5 passes — small sources pin at their cap, big ones
# level to the common water level.
_UNIMAX_B = (1, 2)
_UNIMAX_E = (11, 20)  # 0.55 passes: 2 sources pin at the cap, 18 level

_UNIMAX_ORACLE = f"""
WITH agg AS MATERIALIZED (
  SELECT source AS stratum, CAST(SUM(n_chars) AS BIGINT) AS avail
  FROM documents GROUP BY source),
capd AS (
  SELECT stratum, avail,
         CAST((avail * {_UNIMAX_E[0]}) // {_UNIMAX_E[1]} AS BIGINT) AS cap,
         CAST((SELECT SUM(avail) FROM agg) AS BIGINT) AS total_true
  FROM agg),
ranked AS (
  SELECT stratum, avail, cap,
         CAST(ROW_NUMBER() OVER (ORDER BY cap ASC, stratum ASC) AS BIGINT) AS j,
         CAST(COALESCE(SUM(cap) OVER (
             ORDER BY cap ASC, stratum ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s_prev,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST((total_true * {_UNIMAX_B[0]}) // {_UNIMAX_B[1]} AS BIGINT) AS budget
  FROM capd),
lvl AS (
  SELECT stratum, avail, cap, j, n - j + 1 AS k, budget - s_prev AS rem
  FROM ranked),
star AS (
  SELECT *, MIN(CASE WHEN cap * k > rem THEN j END) OVER () AS jstar FROM lvl),
star2 AS (
  SELECT *, MIN(CASE WHEN j = jstar THEN rem END) OVER () AS rem_star,
            MIN(CASE WHEN j = jstar THEN k END) OVER () AS k_star
  FROM star),
flagged AS (
  SELECT stratum, avail, cap, rem_star // k_star AS lvl,
         rem_star % k_star AS leftover,
         (jstar IS NULL OR j < jstar) AS capped
  FROM star2),
final AS (
  SELECT stratum, avail, cap, lvl, leftover, capped,
         ROW_NUMBER() OVER (PARTITION BY capped ORDER BY stratum ASC) AS ru
  FROM flagged)
SELECT stratum, CAST(avail AS BIGINT) AS avail_tokens,
       CAST(cap AS BIGINT) AS cap_tokens,
       CAST(CASE WHEN capped THEN cap
                 ELSE lvl + CASE WHEN ru <= leftover THEN 1 ELSE 0 END END
            AS BIGINT) AS alloc_tokens,
       capped
FROM final
"""


@df_query("sample_unimax_allocation", _UNIMAX_ORACLE)
def sample_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax domain sampling: uniform token budget across sources with
    a hard epochs-per-source repetition cap — the multilingual-recipe
    allocator that never over-repeats a small domain."""
    docs = tables.load(spark, sf_dir, "documents")
    return sampling.unimax_allocation(
        docs, "source", F.col("n_chars"),
        _UNIMAX_B[0], _UNIMAX_B[1], _UNIMAX_E[0], _UNIMAX_E[1],
    )


# Neyman optimal stratified allocation (r6): distribute a sampling
# budget across strata proportionally to N_h * sigma_h (population
# std of the measure within each stratum) — the classical minimum-
# variance design for stratified estimation. Integerization by the
# largest-remainder method with (remainder DESC, stratum ASC) ties.
# Exact integer moments -> sigma in double (IEEE-identical); the
# windows rank only the strata-bounded table.
_NEYMAN_BUDGET = 1000


def _neyman_oracle() -> str:
    from datafusion_server_spark.queries import rrepr

    w = rrepr("CAST(n AS DOUBLE) * SQRT(GREATEST(CAST(ss AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 0.0))", 6)
    return f"""
WITH mo AS (
  SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_chars) AS BIGINT) AS s,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
  FROM documents GROUP BY source),
wts AS (SELECT stratum, n, {w} AS w FROM mo),
tot AS (SELECT CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS tw FROM wts),
shares AS (
  SELECT stratum, n, w,
         {_NEYMAN_BUDGET} * w / (SELECT tw FROM tot) AS exact_share
  FROM wts),
fl AS (
  SELECT stratum, n, exact_share,
         CAST(FLOOR(exact_share) AS BIGINT) AS base,
         exact_share - FLOOR(exact_share) AS rem
  FROM shares),
lr AS (
  SELECT stratum, n, exact_share, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, stratum ASC) AS rr,
         CAST({_NEYMAN_BUDGET} - SUM(base) OVER () AS BIGINT) AS leftover
  FROM fl)
SELECT stratum, n AS n_pop,
       {rrepr("exact_share", 6)} AS exact_share,
       CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
FROM lr
"""


@df_query("sample_neyman_allocation", _neyman_oracle())
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman minimum-variance stratified allocation of a 1000-row
    sampling budget across sources, weighted by N_h * sigma_h of the
    document length; largest-remainder integerization sums EXACTLY to
    the budget."""
    from pyspark.sql.window import Window

    docs = tables.load(spark, sf_dir, "documents")
    mo = docs.groupBy(F.col("source").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = F.greatest(
        F.col("ss").cast("double") / F.col("n").cast("double") - mean * mean,
        F.lit(0.0),
    )
    wts = mo.select(
        "stratum", "n",
        F.round(F.col("n").cast("double") * F.sqrt(var), 6).alias("w"),
    )
    tot = wts.agg(
        F.sum(F.col("w").cast("decimal(28,6)")).cast("double").alias("tw")
    )
    shares = wts.crossJoin(F.broadcast(tot)).select(
        "stratum", "n",
        (F.lit(_NEYMAN_BUDGET) * F.col("w") / F.col("tw")).alias("exact_share"),
    )
    fl = shares.select(
        "stratum", "n", "exact_share",
        F.floor("exact_share").cast("bigint").alias("base"),
        (F.col("exact_share") - F.floor("exact_share")).alias("rem"),
    )
    # bounded windows: largest-remainder ranking over the
    # strata-count-bounded share table (one row per stratum)
    wr = Window.orderBy(F.desc("rem"), F.asc("stratum"))
    wall = Window.partitionBy()
    lr = fl.select(
        "stratum", "n", "exact_share", "base",
        F.row_number().over(wr).alias("rr"),
        (F.lit(_NEYMAN_BUDGET) - F.sum("base").over(wall)).cast("bigint").alias(
            "leftover"
        ),
    )
    return lr.select(
        "stratum",
        F.col("n").alias("n_pop"),
        F.round(F.col("exact_share"), 6).alias("exact_share"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_alloc"),
    )


# --- greedy quality-density selection under a token budget (r7) ---------------
# "Take the highest-quality documents until the token budget is spent"
# — the greedy knapsack every curated-pretraining mix ends with. The
# order-dependent cumulative token count is the two-level
# distributed_cumsum (range partition + per-partition running sum +
# broadcast prefix totals), so the corpus never funnels through one
# task; the quality key and token counts are exact integer/ratio
# expressions identical on both engines.

_GREEDY_BUDGET = 10_000  # tokens


_GREEDY_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
           / CAST(len(text) AS DOUBLE) AS quality
  FROM documents WHERE len(text) > 0),
c AS (
  SELECT doc_id, n_tokens, quality,
         SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM d)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       ROUND(quality, 6) AS quality,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= {_GREEDY_BUDGET}
"""


@df_query("sample_greedy_quality_budget", _GREEDY_ORACLE)
def sample_greedy_quality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_server_spark.operators.scale import distributed_cumsum

    docs = tables.load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    d = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        (
            F.length(F.regexp_replace("text", "[^a-zA-Z ]", "")).cast("double")
            / F.length("text").cast("double")
        ).alias("quality"),
    )
    c = distributed_cumsum(
        d, [F.desc("quality"), F.asc("doc_id")], "n_tokens", "cum_tokens"
    )
    return (
        c.filter(F.col("cum_tokens") <= _GREEDY_BUDGET)
        .select(
            "doc_id",
            "n_tokens",
            F.round("quality", 6).alias("quality"),
            "cum_tokens",
        )
    )
