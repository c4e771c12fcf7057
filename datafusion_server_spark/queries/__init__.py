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
    # aggregation (incl. grouping sets/filter)
    "q1_pricing_summary",
    "agg_grouping_sets",
    # (agg_filter_clause rotated OUT round 7 for the t-closeness privacy
    # row — FILTER-clause semantics stay oracle-verified in pytest and
    # run inside several in-window aggregations)
    # (privacy_t_closeness rotated OUT round 9 — driver-green r8 — for
    # the never-windowed l-diversity row, same privacy family)
    "privacy_l_diversity",
    # joins (join_semi rotated OUT late round 4 for the classifier row;
    # the join surface keeps join_inner_3way plus the TPC-H rows, and
    # semi-join semantics run inside several in-window queries)
    "join_inner_3way",
    # TPC-H-style analytics (q14/q18 rotated OUT round 4 — family covered
    # by q1/q3/q5/q6/q10; both remain oracle-verified in pytest)
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    # window functions (incl. the GROUPS-frame rewrite)
    # (window_groups_frame rotated OUT round 7 for the offset-GROUPS
    # star row — the unbounded GROUPS->RANGE rewrite stays oracle-
    # verified in pytest; offset_star exercises the broader r6/r7
    # dense-rank rewrite incl. star-EXCEPT projection)
    # (window_running_sum rotated OUT round 9 — driver-green since r1,
    # running-sum semantics run inside several in-window rows — for the
    # brand-new r9 MIN/MAX EXCLUDE decomposition row, which should be
    # driver-gated the round it lands)
    "window_groups_exclude_minmax",
    # (window_groups_offset_star rotated OUT round 9 — driver-green
    # r7/r8 — for the two never-windowed GROUPS+GROUP BY rows: the r8
    # aggregation-hoist closure and the r9 ordinal resolution)
    "window_groups_offset_groupby",
    "window_groups_offset_groupby_ordinal",
    # sort/limit + set ops (sort_limit_offset rotated OUT late round 4
    # for the PQ row; ordered-LIMIT semantics run inside q3/q10 and every
    # top-k query in the window)
    "set_union_all",
    # subqueries / CTE (incl. WITH RECURSIVE)
    "subquery_correlated_select",
    "cte_top_nations",
    "recursive_cte_months",
    # scalar function families (string_functions + agg_distinct rotated
    # OUT round 4 — regexp/casting rows keep the string surface in-window;
    # date_functions + array_functions rotated out late round 4 for the
    # gopher/gapfill rows below: the date surface stays covered by
    # date_bin_tumbling + gapfill, arrays by array_lambda_functions)
    # (map_functions rotated OUT late round 4 for the temperature-mix
    # sampler row; the map surface stays oracle-verified in pytest)
    "date_bin_tumbling",
    "array_lambda_functions",
    # (casting_try_cast rotated OUT late round 4 for the semantic-dedup
    # row: every inventory query exercises explicit casts on both the
    # Spark and oracle sides, and the dedicated row stays pytest-green)
    "regexp_functions",
    "json_extraction",
    # LLM-pipeline: dedup family (clusters = LSH pairs -> threshold ->
    # connected components, the round-3 addition; ngram_jaccard remains
    # pytest-verified outside the window)
    # (dedup_exact rotated OUT round 5 for the unigram-LM tokenizer row:
    # exact-dedup semantics run in-window inside pipeline_web_ingest's
    # lead-hash dedup and pipeline_curation_end2end, and the dedicated
    # row stays oracle-verified in pytest)
    "unigram_vocab_em",
    "dedup_lsh_pairs",
    # (dedup_simhash rotated OUT round 7 for the MinHash estimate-vs-
    # exact calibration row; dedup_minhash_estimate_calibration rotated
    # OUT round 8 — driver-green r7, stays oracle-verified in pytest —
    # for the content-defined-chunking dedup row)
    # (dedup_cdc_chunks rotated OUT round 9 — driver-green r8 — for the
    # never-windowed quality-aware survivor pick, r8's dedup addition
    # with the r9 float-policy fix)
    "dedup_survivors_keep_longest",
    # (dedup_clusters rotated OUT round 9 continuation — driver-green
    # r3-r8, components stay oracle-verified in pytest and run inside
    # split_leakage_safe/keepers — for the never-windowed canonical-URL
    # first-pass dedup, the crawl pipeline's cheapest dedup stage)
    "web_url_canonicalize",
    "dedup_semantic_semdedup",
    # LLM-pipeline: similarity family (incl. the scale-parameterized
    # banded ANN and late-round-4's int8-SQ+refine search; ann_lsh_cosine
    # rotated OUT — the LSH surface stays in-window via ann_lsh_scaled and
    # the pinned variant stays oracle-verified in pytest)
    # (knn_bruteforce_cosine rotated OUT round 9 continuation —
    # driver-green r1-r8 — for the never-windowed retrieval-MRR eval,
    # which exercises the same cosine_topk operator in-window and adds
    # the label-judged eval layer on top)
    "eval_retrieval_mrr",
    "ann_lsh_scaled",
    # (ann_ivf_cosine rotated OUT round 9 continuation — driver-green
    # r3-r8, IVF stays oracle-verified in pytest — for the never-
    # windowed matryoshka truncated-dim recall eval, same family)
    "eval_matryoshka_recall",
    # (ann_sq8_cosine rotated OUT round 6 for the sharded-packing row;
    # ann_pq_cosine rotated OUT round 8 — driver-green r7, quantized
    # search stays oracle-verified in pytest — for the MMR
    # diversity-aware selection row, round 7's greedy rerank family)
    # (similarity_mmr_select rotated OUT round 9 — driver-green r8 —
    # for the never-windowed PSI drift row, the profiling family's
    # first driver seat)
    "profile_psi_drift",
    # (embedding_near_duplicates rotated OUT round 6 for the Bradley-Terry
    # preference-rating row — the embedding near-dup surface stays in-window
    # via dedup_semantic_semdedup and the row stays oracle-verified in pytest)
    "eval_bradley_terry_sources",
    # LLM-pipeline: trained-model family (late round 4)
    # (classifier_logreg_quality rotated OUT round 9 continuation —
    # driver-green r4-r8; the trained-model family stays in-window via
    # weak_label_vote — for the never-windowed label-propagation
    # community detection, the graph family's distributed iteration)
    "graph_label_propagation",
    # LLM-pipeline: text family (+ round-3 blocked-Levenshtein fuzzy
    # match, + late-round-4 Gopher rules and corpus-LM cross-entropy;
    # text_token_stats rotated OUT — counting surface covered by
    # quality_score/gopher, still oracle-verified in pytest)
    "text_quality_score",
    # (text_tfidf_topk rotated OUT round 8 — driver-green since r4,
    # stays oracle-verified in pytest — for the CCNet perplexity-band
    # pruning row, round 7's per-language distributed_rank shape)
    "prune_ccnet_perplexity_band",
    # (text_lm_cross_entropy rotated OUT round 7 for the pass@k eval
    # row; eval_pass_at_k rotated OUT round 8 — driver-green r7, stays
    # oracle-verified in pytest — for the Krippendorff-alpha
    # inter-annotator agreement row, round 7's eval/audit family)
    # (eval_krippendorff_alpha rotated OUT round 9 — driver-green r8 —
    # for the never-windowed Cohen's-kappa row, same agreement family)
    "eval_cohens_kappa",
    # (text_fuzzy_match_pairs rotated OUT round 6 for the SFT chat row —
    # fuzzy matching stays oracle-verified in pytest)
    "chat_prompt_response_pairs",
    # (gopher_quality_flags rotated OUT round 9 continuation —
    # driver-green r4-r8, the rule family runs in-window inside
    # pipeline_curation_end2end — for the never-windowed Kneser-Ney
    # bigram cross-entropy, the text-quality family's sharpest LM)
    "text_lm_kneser_ney",
    # (text_pack_sequences_sharded rotated OUT round 9 — driver-green
    # r6-r8, sharded packing stays oracle-verified in pytest — for the
    # brand-new r9 span-corruption denoising-prep row, same
    # sequence-prep family, driver-gated the round it lands)
    "text_span_corruption",
    # LLM-pipeline: sampling + mixture learning (round-5: DSIR
    # importance resampling and DoReMi Group-DRO domain reweighting join
    # the window; sample_domain_mix and later sample_temperature_mix
    # rotated OUT — the share-derivation surface stays pytest-green and
    # exercised inside pipeline_curation_end2end)
    "sample_dsir_topk",
    "doremi_domain_weights",
    # (sample_token_waterfill rotated OUT round 7, Neyman allocation
    # rotated OUT round 8 — both driver-green when seated, both still
    # oracle-verified in pytest — for the greedy quality-budget pick,
    # round 7's distributed_cumsum selection shape)
    # (sample_greedy_quality_budget rotated OUT round 9 — driver-green
    # r8 — for the never-windowed UniMax per-epoch allocation row)
    "sample_unimax_allocation",
    # merge family (reference A14/A15 processors both rotated OUT by
    # r6/r8 — column/row-merge semantics stay oracle-verified in pytest
    # and run inside the e2e merge tests; round 8 seated the lakehouse
    # CDC changeset apply — driver-green r8, rotated OUT round 9 for
    # the never-windowed weak-supervision label-model vote, r8's
    # classifier-family addition)
    "weak_label_vote",
    # streaming (beyond-reference; + round-3 native session_window;
    # sliding rotated OUT late round 4 for the curation pipeline —
    # tumbling covers the windowed-agg family, sliding stays
    # oracle-verified in pytest)
    # (session_window_native rotated OUT round 5 for the graph row;
    # the session-window surface stays in-window via
    # streaming_stateful_sessionize and remains oracle-verified in pytest)
    # (tumbling_counts rotated OUT round 5 for the streaming near-dup
    # row — windowed-agg streaming stays in-window via the trending
    # top-k's underlying tumbling aggregation and stateful_sessionize,
    # and tumbling_counts remains oracle-verified in pytest)
    "streaming_incremental_neardup",
    "streaming_stateful_sessionize",
    "streaming_stream_stream_join",
    # end-to-end curation pipeline: the r4 operator family composed
    # (gopher gate -> dedup keepers -> domain mix -> stats)
    "pipeline_curation_end2end",
    # time-series operators (+ late-round-4 gap-fill/LOCF; round-5
    # swaps: range_join rotated OUT for the trailing-window z-score —
    # interval-join semantics stay pytest-green — and the new graph
    # family takes a window row via the all-integer PageRank)
    # (asof_join_last_click rotated OUT round 9 continuation —
    # driver-green r2-r8, as-of semantics stay oracle-verified in
    # pytest vs DuckDB's native ASOF JOIN — for the never-windowed
    # Kaplan-Meier survival row, same events family)
    "events_survival_km",
    # (hypertable_rollup rotated OUT round 9 continuation — driver-green
    # r2-r8 — for the brand-new Theil-Sen robust-trend row, same
    # time-series family, driver-gated the round it lands)
    "timeseries_theil_sen",
    # (timeseries_anomaly_zscore rotated OUT round 8 — driver-green
    # r5-r7, stays oracle-verified in pytest — for the RFM quintile
    # segmentation row, round 7's three-pass distributed_rank shape;
    # events_rfm_segmentation rotated OUT round 9 — driver-green r8 —
    # the events family stays covered by asof_join + hypertable_rollup)
    # (timeseries_gapfill_locf rotated OUT round 5 for the web-ingest
    # capstone — the gapfill surface stays oracle-verified in pytest)
    "pipeline_web_ingest",
    # graph analytics (round 5, beyond-reference family)
    # (graph_pagerank_trade rotated OUT round 9 continuation —
    # driver-green r5-r8, the folded-iteration path keeps its
    # fold-vs-loop + empty-edge regression tests — for the brand-new
    # Resource-Allocation link-prediction row, same co-purchase graph,
    # driver-gated the round it lands)
    "graph_resource_allocation",
    # sketches
    "sketch_kmv_distinct",
    # multimodal plumbing
    # (multimodal_decode_pipeline rotated OUT round 9 continuation —
    # driver-green r4-r8 on its VALUES oracle — for the never-windowed
    # frame-sampling schedule, same family but a REAL SQL oracle)
    "multimodal_frame_sample",
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
