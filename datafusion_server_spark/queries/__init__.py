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
    # ROUND 13 ROTATION (verdict task 1: clear the never-driver-gated
    # debt faster — 127 rows entering the round). The r12 window's 24
    # first-time seats ALL went driver-green in CORRECTNESS_r12 and
    # rotate OUT (their families stay oracle-verified in the
    # full-registry pytest sweep), as do the long-green category
    # anchors whose coverage the incoming SQL-surface fillers carry
    # in-window. 47 first-time seats this round: the full r13 prep
    # list (PLANS.md), 18 more never-gated SQL-surface/window rows,
    # and the two rows that LAND this round (the r8 bar — new rows
    # gate the round they land): window_groups_outer_using (OUTER
    # JOIN USING GROUPS closure) and dedup_incremental_lsh_capped
    # (binding index-side bucket cap). 3 carry-overs: the flagship
    # q1, window_groups_exclude_array_agg (re-gates the r13
    # empty-frame NULL fix + new runtime-emptying column), and
    # json_extraction (re-gates if the task-5 A/B changes its plan).
    # Debt after this round: 127+2-47 = 82; cumulative gated 245/327.
    "q1_pricing_summary",
    # --- changed-this-round re-gates
    "window_groups_exclude_array_agg",
    "json_extraction",
    # --- landing-this-round rows (r8 bar)
    "window_groups_outer_using",
    "dedup_incremental_lsh_capped",
    # --- SQL-surface fillers (never gated): grouping, predicates,
    # ordering, set/values/lateral shapes, typed ops
    "group_by_all",
    "group_by_ordinal",
    "having_clause",
    "agg_max_by_min_by",
    "array_agg_distinct_sorted",
    "percentile_disc_groups",
    "unpivot_melt",
    "join_using_clause",
    "join_natural",
    "lateral_join_topn",
    "null_safe_equality",
    "order_nulls_handling",
    "in_between_predicates",
    "ilike_patterns",
    "interval_arithmetic",
    "date_construction_parsing",
    "struct_functions",
    "bitwise_ops",
    "posexplode_with_position",
    "values_inline_table",
    "union_mixed_shapes",
    # window family (never gated)
    "window_sum_over_groups",
    # --- LLM-pipeline: dedup explanation tail (prep list; incl. the
    # r12 late-landing prefix-Jaccard in-row rewrite, never gated)
    "dedup_pair_explanations",
    "dedup_span_fraction",
    "dedup_prefix_jaccard",
    "dedup_fuzzy_survivors",
    # embedding family (prep list)
    "embedding_l2_normalize",
    "embedding_random_projection",
    "embedding_top_component",
    # ANN variants (prep list)
    "ann_ivfsq_cosine",
    "ann_projected_bruteforce",
    # eval tail (prep list)
    "eval_fleiss_kappa",
    "eval_langid_confusion",
    "eval_rbo_lexical_vs_dense",
    # events analytics (prep list)
    "events_transition_matrix",
    "events_weekly_churn",
    # profile tail (prep list)
    "profile_ks_statistic",
    "profile_referential_integrity",
    "profile_correlation_matrix",
    # text tail (prep list)
    "text_language_id",
    "text_contamination_check",
    "text_redact_pii",
    "text_winnowing_fingerprints",
    # streaming (prep list)
    "streaming_stream_static_enrich",
    "streaming_trending_topk",
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
