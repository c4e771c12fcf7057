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
    # ROUND 12 ROTATION (verdict task 1: keep clearing the 148-row
    # never-driver-gated debt; the r11 bar was 21 first-time seats).
    # The 21 rows first-time-seated in r11 ALL went driver-green in
    # CORRECTNESS_r11 and rotate OUT (families stay oracle-verified in
    # the full-registry pytest sweep), plus 2 long-green rows
    # (date_bin_tumbling r1-r11, web_url_canonicalize) whose category
    # coverage is carried by in-window siblings. 23 seats IN: the
    # brand-new r12 colliding-schema GROUPS row (seated the round it
    # lands, the r8 bar), agg_rollup RE-seated because its plan was
    # rewritten two-phase this round (last gated r01 in the old
    # single-phase form), and the 21 never-gated rows of the r12 prep
    # list (PLANS.md) — dedup tail, chat, NB classifier + its eval
    # pair, k-means + purity, stratified/split family, HTML extraction,
    # 2 streaming rows, q4, QUALIFY, native pivot, IGNORE NULLS.
    # => 22 first-time rows this round. Full rotation history lives in
    # git (this file's log) and PLANS.md.
    #
    # aggregation (incl. grouping sets/filter): agg_grouping_sets and
    # agg_rollup re-gate their r12 two-phase Expand-over-preaggregate
    # rewrite (agg_cube, same shape, was judge-verified green in r11)
    "q1_pricing_summary",
    "agg_grouping_sets",
    "agg_rollup",
    # joins
    "join_inner_3way",
    # TPC-H-style analytics: q4 (EXISTS-correlated priority counts)
    # takes its first driver seat
    "q6_forecast_revenue",
    "q4_order_priority",
    # window functions (incl. the GROUPS-frame rewrite): the r12
    # colliding-schema multi-relation t.* expansion row and the
    # brand-new ARRAY_AGG-under-EXCLUDE row (order-preserving CONCAT
    # decomposition, lands this round) are driver-gated the round they
    # land; they replace the r11 unique-name multi-star row
    # (driver-green r11, a strict subset of the collide row's surface)
    # and window_groups_exclude_minmax (driver-green r9-r11; the
    # EXCLUDE family keeps two seats via stddev + array_agg). QUALIFY
    # top-n and window IGNORE NULLS take their first seats.
    "window_groups_exclude_array_agg",
    "window_groups_exclude_stddev",
    "window_groups_multi_star_collide",
    "qualify_top_n_per_group",
    "window_ignore_nulls",
    # (set_intersect_all / set_except_all / correlated_exists_double /
    # nested_cte_chain rotated OUT round 12 — all driver-green r11;
    # set-op ALL semantics and correlated-subquery coverage stay via
    # q4's EXISTS and the pytest oracle sweep)
    # scalar function families (date_bin_tumbling rotated OUT round 12
    # — driver-green r1-r11; date arithmetic runs in-window inside
    # q4/q6/events rows. json_extraction stays seated: its r12
    # TRY_VARIANT_GET null-on-malformed fix re-gates)
    "json_extraction",
    # native pivot API surface
    "pivot_native_api",
    # LLM-pipeline: dedup family — the headline pairs row now runs the
    # r12 stats-aware default cap (dedup_lsh_pairs_bucket_capped gates
    # the BINDING-cap semantics; the auto default is equality-below-cap
    # at every gated scale). The never-gated dedup tail takes four
    # first seats: raw MinHash signatures, containment pairs,
    # IDF-weighted Jaccard, duplicate span detection.
    "dedup_lsh_pairs_bucket_capped",
    "dedup_survivors_keep_longest",
    "dedup_minhash_signatures",
    "dedup_containment_pairs",
    "dedup_idf_weighted_jaccard",
    "dedup_duplicate_spans",
    # (dedup_incremental_lsh + dedup_semantic_keepers rotated OUT round
    # 12 — driver-green r11)
    # LLM-pipeline: similarity / eval family; the NB evaluation pair
    # (confusion matrix, AUC) takes first seats with the classifier
    "eval_retrieval_mrr",
    "ann_lsh_scaled",
    "profile_psi_drift",
    "classifier_naive_bayes",
    "eval_nb_confusion",
    "eval_nb_auc",
    # clustering: k-means assignment + external validation (purity/NMI)
    "cluster_kmeans_assign",
    "cluster_purity_nmi",
    "graph_label_propagation",
    # LLM-pipeline: text family (prune_c4_rules, bpe_train_merges,
    # text_pack_sequences, text_bm25_topk, prune_repetition_rules
    # rotated OUT round 12 — all driver-green r11); HTML text
    # extraction takes its first seat
    "text_quality_score",
    "prune_ccnet_perplexity_band",
    "text_lm_kneser_ney",
    "text_span_corruption",
    "html_extract_text",
    # LLM-pipeline: sampling + splits — the stratified-hash sampler and
    # the leakage-safe train/val/test split family take first seats
    "sample_dsir_topk",
    "sample_unimax_allocation",
    "sample_stratified_hash",
    "split_train_val_test",
    "split_leakage_safe",
    # streaming (beyond-reference): the watermark-bounded dedup and CDC
    # upsert rows take first seats alongside the two veterans
    "streaming_incremental_neardup",
    "streaming_stateful_sessionize",
    "streaming_dedup_within_watermark",
    "streaming_cdc_upsert",
    # end-to-end curation pipeline
    "pipeline_curation_end2end",
    # time-series / events operators
    "events_survival_km",
    "timeseries_theil_sen",
    # (pipeline_web_ingest rotated OUT late round 12 — driver-green
    # r10-r11; the pipeline family keeps pipeline_curation_end2end
    # in-window. Its seat goes to the brand-new INNER-JOIN-USING
    # GROUPS row, seated the round it lands per the r8 bar.)
    "window_groups_using_join",
    # graph analytics
    "graph_resource_allocation",
    # multimodal plumbing
    "multimodal_frame_sample",
    # chat/SFT family returns with two never-gated seats: turn
    # flattening and loss-mask span computation
    "chat_flatten_turns",
    "chat_loss_mask_spans",
    # (the whole r11 first-time block — sketch family x6,
    # embedding_abtt_renorm, merge_scd2_history, privacy_k_anonymity —
    # rotated OUT round 12, all driver-green r11)
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
