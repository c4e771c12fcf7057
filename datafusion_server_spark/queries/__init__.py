"""Query inventory exported through ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 gets a named entry here:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL can
express it) a DuckDB oracle SQL string over the same parquet tables.

Column names are aliased identically on both sides — the driver's
comparator sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from datafusion_server_spark import tables


@dataclass(frozen=True)
class QueryDef:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    # DuckDB SQL; None => driver runs rows-only check. A CALLABLE oracle
    # receives sf_dir and returns the SQL — used where the expected
    # values are computed driver-side from the fixture (e.g. a VALUES
    # oracle over deterministic non-SQL payload synthesis).
    oracle: str | Callable[[str], str] | None

    def oracle_for(self, sf_dir: str) -> str | None:
        return self.oracle(sf_dir) if callable(self.oracle) else self.oracle


_REGISTRY: dict[str, QueryDef] = {}


def register(qd: QueryDef) -> QueryDef:
    if qd.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {qd.name}")
    _REGISTRY[qd.name] = qd
    return qd


def sql_query(name: str, sql: str, oracle: str | None = "same") -> QueryDef:
    """Register a query whose Spark side is ``spark.sql(sql)`` over the
    fixture views. ``oracle='same'`` reuses the identical SQL text for
    DuckDB (the common case — both dialects are ANSI-ish); pass a
    different string when the dialects diverge, or None for rows-only.
    """

    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables.register_views(spark, sf_dir)
        return spark.sql(sql)

    return register(QueryDef(name, build, sql if oracle == "same" else oracle))


def df_query(name: str, oracle: str | None):
    """Decorator registering a DataFrame-API builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]) -> QueryDef:
        return register(QueryDef(name, fn, oracle))

    return wrap


def rrepr(expr: str, places: int) -> str:
    """Shortest-repr HALF_UP rounding of a raw double for DuckDB oracles:
    Spark's ROUND(double, d) rounds the SHORTEST-REPR decimal
    (BigDecimal.valueOf = Double.toString) while DuckDB's ROUND rounds
    the raw binary double; they diverge when a value sits within repr
    precision of a .5 boundary. DuckDB's VARCHAR cast IS the shortest
    repr and VARCHAR->DECIMAL is HALF_UP, so this triple cast reproduces
    Spark/Python rounding exactly (verified on 200k random doubles).
    Use on RAW doubles only — values already on a fixed-point grid are
    never near a boundary and keep the fast native ROUND.

    Sub-half-ulp guard (r6): DuckDB's VARCHAR->DECIMAL parse misrounds
    scientific-notation magnitudes below 1e-9 UP to the smallest decimal
    step ('5.83e-10'::DECIMAL(38,8) -> 1e-8, not 0 — probed directly),
    while Spark's ROUND correctly gives 0. Any |x| under half the final
    decimal step rounds to zero by definition, so the CASE pins that
    range to 0.0 and the buggy parse path is never reached."""
    half = 0.5 * 10 ** -places
    inner = f"CAST(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,{places})) AS DOUBLE)"
    return f"(CASE WHEN ABS({expr}) < {half!r} THEN 0.0 ELSE {inner} END)"


# The driver's correctness gate checks the FIRST 50 registry entries
# (registration order). This list pins those 50 slots so they span every
# SURVEY §2.B category, the TPC-H-style headliners, and one-or-more
# queries per LLM-pipeline operator family (dedup / similarity / text /
# merge / streaming / multimodal). Everything else follows in module
# registration order.
PRIORITY: tuple[str, ...] = (
    # ROUND 11 ROTATION (verdict task 1: drive down the 166-row
    # never-driver-gated debt, >=17 first-time seats): the 17 rows
    # seated in r10 all went driver-green in CORRECTNESS_r10 and rotate
    # OUT (their families stay oracle-verified in pytest), plus 3
    # long-green core rows whose category coverage is REPLACED by
    # never-gated siblings (set_union_all -> set_intersect_all +
    # set_except_all; subquery_correlated_select ->
    # correlated_exists_double; cte_top_nations -> nested_cte_chain).
    # 20 seats IN: the 2 brand-new r11 rows (seated the round they land,
    # the r8 bar) + 18 never-gated rows prioritizing the judge-named
    # LLM-pipeline debt (incremental LSH, SemDeDup keepers, BPE trainer,
    # sequence packing, the whole sketch family) — every one already
    # oracle-verified in the full-registry pytest sweep. Full rotation
    # history lives in git (this file's log) and PLANS.md.
    #
    # aggregation (incl. grouping sets/filter)
    "q1_pricing_summary",
    "agg_grouping_sets",
    # (privacy_l_diversity rotated OUT round 10 — driver-green r9; the
    # privacy family — k-anon/l-div/t-closeness — stays oracle-verified
    # in pytest)
    # joins (join_semi rotated OUT late round 4; semi-join semantics run
    # inside several in-window queries)
    "join_inner_3way",
    # TPC-H-style analytics (q14/q18 rotated OUT round 4; q3+q5+q10
    # rotated OUT round 10 — driver-green r1-r9, the family stays
    # in-window via q1/q6 and all three remain oracle-verified in
    # pytest + in the bench headline set)
    "q6_forecast_revenue",
    # window functions (incl. the GROUPS-frame rewrite): the EXCLUDE
    # rows stay seated (stddev now exercises the r11 anchor-shifted
    # moments), and the brand-new r11 multi-relation qualified-t.*
    # expansion is driver-gated the round it lands (the r8 bar)
    "window_groups_exclude_minmax",
    "window_groups_exclude_stddev",
    "window_groups_offset_multi_star",
    # sort/limit + set ops
    # (set_union_all rotated OUT round 11 — driver-green r1-r10; the
    # set-op surface is REPLACED in-window by its two never-gated
    # siblings, which also cover the ALL-semantics duplicates path)
    "set_intersect_all",
    "set_except_all",
    # subqueries / CTE
    # (subquery_correlated_select + cte_top_nations rotated OUT round
    # 11 — driver-green r1-r10; coverage replaced by the never-gated
    # double-correlated EXISTS and the 3-level CTE chain)
    "correlated_exists_double",
    "nested_cte_chain",
    # scalar function families
    # (array_lambda_functions + regexp_functions rotated OUT round 10 —
    # driver-green since r1 — HOF/lambda surface runs in-window inside
    # text_span_corruption / timeseries_theil_sen / events_markov rows,
    # regexp inside web_url_canonicalize / text_rake_keywords; both rows
    # stay oracle-verified in pytest)
    "date_bin_tumbling",
    "json_extraction",
    # LLM-pipeline: dedup family
    # (unigram_vocab_em rotated OUT round 10 — driver-green r5-r9, the
    # tokenizer-training family stays oracle-verified in pytest;
    # dedup_semantic_semdedup rotated OUT round 10 — driver-green r9,
    # embedding near-dup semantics stay pytest-verified, dedup keeps
    # three seats below)
    # (dedup_lsh_pairs rotated OUT round 10 — driver-green r3-r9 and
    # still a bench headline + pytest oracle row — for its r10
    # bucket-capped twin: the SAME operator plan plus the hot-bucket
    # guard with a BINDING cap, driver-gated the round the guard lands)
    "dedup_lsh_pairs_bucket_capped",
    "dedup_survivors_keep_longest",
    # r11 first-time seats (judge-named LLM-pipeline debt): the
    # incremental daily-ingest LSH probe and the SemDeDup keeper set
    "dedup_incremental_lsh",
    "dedup_semantic_keepers",
    "web_url_canonicalize",
    # LLM-pipeline: similarity / eval family
    # (eval_matryoshka_recall, eval_bradley_terry_sources,
    # eval_cohens_kappa rotated OUT round 10 — all driver-green r9; the
    # eval family takes THREE never-gated seats this round: isotonic
    # calibration, calibration error (ECE), bootstrap CI)
    "eval_retrieval_mrr",
    "ann_lsh_scaled",
    "profile_psi_drift",
    "graph_label_propagation",
    # LLM-pipeline: text family
    # (chat_prompt_response_pairs rotated OUT round 10 — driver-green
    # r6-r9, the SFT-prep family stays oracle-verified in pytest; text
    # takes three never-gated seats: RAKE, TextRank, n-gram novelty)
    "text_quality_score",
    "prune_ccnet_perplexity_band",
    "text_lm_kneser_ney",
    "text_span_corruption",
    # r11 first-time seats: the brand-new C4 page-pruning row (landed
    # this round), BPE merge training, sequence packing, BM25 top-k
    "prune_c4_rules",
    "bpe_train_merges",
    "text_pack_sequences",
    "text_bm25_topk",
    # LLM-pipeline: sampling + mixture learning
    # (doremi_domain_weights rotated OUT round 10 — driver-green r5-r9,
    # mixture learning stays oracle-verified in pytest; sampling takes
    # the never-gated k-center coreset seat)
    "sample_dsir_topk",
    "sample_unimax_allocation",
    # (weak_label_vote rotated OUT round 11 — driver-green r10; the
    # labeling family stays oracle-verified in pytest. Its seat goes to
    # the brand-new Gopher line-repetition pruning row, seated the
    # round it lands per the r8 bar)
    "prune_repetition_rules",
    # streaming (beyond-reference)
    # (streaming_stream_stream_join rotated OUT round 10 — driver-green
    # r9, the stream-stream join stays oracle-verified in pytest with
    # micro-batch-invariance tests; streaming keeps two seats)
    "streaming_incremental_neardup",
    "streaming_stateful_sessionize",
    # end-to-end curation pipeline
    "pipeline_curation_end2end",
    # time-series / events operators
    "events_survival_km",
    "timeseries_theil_sen",
    "pipeline_web_ingest",
    # graph analytics
    "graph_resource_allocation",
    # multimodal plumbing
    "multimodal_frame_sample",
    # ---- r11 first-time seats, continued ----
    # (the 17 rows seated round 10 — timeseries_cusum/holt, the three
    # events_* rows, scale_hilbert/compaction, the three eval_*
    # calibration rows, sample_kcenter_coreset, the three text keyword/
    # novelty rows, the three profile_* rows — ALL went driver-green in
    # CORRECTNESS_r10 and rotate OUT; their families remain covered by
    # the pytest oracle sweep and by the in-window family siblings)
    #
    # the ENTIRE sketch family takes its first driver seats (never
    # gated; judge-named): KMV set estimates, heavy hitters, Bloom
    # membership, deterministic HLL, Count-Min, histogram quantiles
    "sketch_kmv_set_estimates",
    "sketch_heavy_hitters",
    "sketch_bloom_membership",
    "sketch_hll_deterministic",
    "sketch_countmin_freq",
    "sketch_histogram_quantiles",
    # embeddings: the ABTT top-component-removal + renorm heavy row
    "embedding_abtt_renorm",
    # merge family: SCD2 history reconstruction
    "merge_scd2_history",
    # privacy family returns with its never-gated k-anonymity row
    "privacy_k_anonymity",
)


def registry() -> dict[str, QueryDef]:
    """Import all query modules and return the full inventory, with the
    ``PRIORITY`` names first (the driver's gate checks the first 50)."""
    from datafusion_server_spark.queries import (  # noqa: F401
        bpe,
        chat,
        classifier,
        clustering,
        core,
        core2,
        core3,
        core4,
        core5,
        dedup,
        doremi,
        evalstats,
        extensions,
        graph,
        htmltext,
        influence,
        merge,
        quality,
        sampling,
        similarity,
        text,
        timeseries,
        unigram,
    )

    missing = [n for n in PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"PRIORITY names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in PRIORITY}
    ordered.update((n, qd) for n, qd in _REGISTRY.items() if n not in ordered)
    return ordered
