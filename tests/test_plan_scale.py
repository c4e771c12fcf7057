"""Plan-shape assertions for the round-6 global-window eliminations.

The scale hazard: ``row_number().over(Window.orderBy(...))`` with no
partition spec compiles to ``Exchange SinglePartition`` + ``Window`` —
EVERY input row moves to one task before any ``rank <= k`` filter. The
fix is ``orderBy().limit(k)`` (TakeOrderedAndProject: per-partition
k-row heaps) with the rank assigned on the k survivors, or anti-join /
aggregate reductions that bound the window's input first.

These tests parse the physical plan tree and assert that every
``Exchange SinglePartition`` feeding the plan has a ROW-BOUNDING node
below it (top-k, limit, aggregate, or anti-join reduction) — i.e. the
single task only ever receives an already-reduced rowset."""

from __future__ import annotations

import re

import pytest

from datafusion_server_spark.queries import registry

# Nodes that bound the row count flowing up from their subtree: global
# top-k/limits, aggregates, Spark's own partial top-k for rank windows,
# and the anti-join reductions used by the sequence-gaps boundary
# tables (output = #gaps, the report size).
#
# CAVEAT (r7): an aggregate bounds the rowset only when its GROUP BY
# key has FIXED cardinality (bins / strata / partitions / sketch rows /
# a fixed taxonomy). An aggregate keyed by a corpus-scaling entity
# (users, distinct terms, term pairs, graph nodes) does NOT bound —
# its output grows with the data, and a global window over it is still
# a one-task funnel. This heuristic cannot tell the two apart, so any
# NEW aggregate-fed global window must be reviewed by hand: if the key
# scales, use ranked_topk (top-k) or a two-level range-partitioned rank
# (full rank) and add the query to _REWRITTEN below. The r7 sweep
# converted every corpus-scaling-key site (burstiness/surprisal users,
# vocab/Zipf/PMI/PSI terms, triangle nodes).
_BOUNDING = re.compile(
    r"TakeOrderedAndProject|GlobalLimit|CollectLimit|WindowGroupLimit"
    r"|HashAggregate|SortAggregate|ObjectHashAggregate|LeftAnti"
)

def _plan_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = []
    for raw in plan.splitlines():
        m = re.match(r"^([\s:+\-]*)(\*\(\d+\)\s*)?(.*)$", raw)
        indent = len(m.group(1))
        text = m.group(3)
        if text:
            lines.append((indent, text))
    return lines


def _unbounded_single_partition_exchanges(df) -> list[str]:
    """Exchange SinglePartition nodes whose subtree contains NO
    row-bounding node — the funnel-everything-to-one-task shape."""
    lines = _plan_lines(df)
    bad = []
    for i, (indent, text) in enumerate(lines):
        if "Exchange SinglePartition" not in text:
            continue
        subtree = []
        for j in range(i + 1, len(lines)):
            if lines[j][0] <= indent:
                break
            subtree.append(lines[j][1])
        if not any(_BOUNDING.search(t) for t in subtree):
            bad.append(text)
    return bad


# The ONLY queries allowed an unbounded single-partition exchange —
# verified exhaustive over all 271 non-streaming builders by
# scripts/plan_audit.py (round-7 re-certification; re-run the script
# after registry changes). window_range_frame / window_distribution are
# SQL-surface parity rows whose SEMANTICS are an unpartitioned window;
# text_pack_sequences is the corpus-global packer, documented
# bounded-input-only (scale path: text_pack_sequences_sharded).
ALLOWED_GLOBAL_WINDOW_QUERIES = frozenset(
    {"window_range_frame", "window_distribution", "text_pack_sequences"}
)

_REWRITTEN = [
    "text_bm25_topk",
    "hybrid_rrf_retrieval",  # bm25_doc_query leg
    "sample_dsir_topk",
    "cluster_kmeans_assign",  # kmeans_init seeding
    "sketch_kmv_set_estimates",
    "profile_quantile_normalize",
    "profile_sequence_gaps",
    "sample_token_waterfill",
    # r7: top-k over corpus-scaling aggregates -> ranked_topk
    "events_burstiness_top",  # one row per user
    "events_markov_surprisal",  # one row per user
    "text_vocab_coverage",  # one row per distinct term
    "text_pmi_collocations",  # one row per distinct bigram pair
    "text_zipf_slope",  # one row per distinct term
    "profile_term_drift",  # top-N terms of the combined vocab
    "graph_triangles_copurchase",  # one row per graph node
    # r7: full rank per distinct term -> two-level range-partitioned rank
    "text_vocab_coverage_curve",
    "prune_ccnet_perplexity_band",  # within-lang rank via distributed_rank
    "sample_greedy_quality_budget",  # corpus cumsum via distributed_cumsum
    "events_rfm_segmentation",  # three per-user quintile ranks via distributed_rank
    # r8: cumulative negatives over distinct margins -> distributed_cumsum
    "eval_nb_auc",
]


@pytest.mark.parametrize("name", _REWRITTEN)
def test_no_unbounded_single_partition_window_feed(spark, sf_dir, name):
    df = registry()[name].build(spark, sf_dir)
    bad = _unbounded_single_partition_exchanges(df)
    assert not bad, f"{name}: unbounded SinglePartition exchanges: {bad}"


@pytest.mark.parametrize(
    "name",
    [
        "text_bm25_topk",
        "sample_dsir_topk",
        # r7 conversions: the k-row selection over a corpus-scaling
        # aggregate (users/terms/pairs/nodes) must be the distributed
        # per-partition-heap top-k, not a single-partition rank window
        "events_burstiness_top",
        "events_markov_surprisal",
        "text_pmi_collocations",
        "text_zipf_slope",
        "profile_term_drift",
        "graph_triangles_copurchase",
    ],
)
def test_topk_compiles_to_take_ordered(spark, sf_dir, name):
    """The k-row selection must be the distributed TakeOrderedAndProject
    (per-partition heaps), not a full sort or a global window."""
    df = registry()[name].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, name


def test_kmeans_init_compiles_to_take_ordered(spark, sf_dir):
    """kmeans_init's k-seed selection (invisible in the query plan —
    the training loop localCheckpoints centroids) must itself be the
    distributed top-k, not a corpus-wide window."""
    from datafusion_server_spark import tables
    from datafusion_server_spark.operators.clustering import kmeans_init

    emb = tables.load(spark, sf_dir, "embeddings")
    seeds = kmeans_init(emb, 4, "embedding", "vec_id")
    plan = seeds._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert not _unbounded_single_partition_exchanges(seeds)


def test_vocab_rank_compiles_to_take_ordered(spark, sf_dir):
    """vocab_coverage's top-N term selection is invisible in the final
    query plan (the tiny vocab table is localCheckpoint-ed before the
    scoring join), so assert on the vocab subtree directly: built with
    materialize=False, the plan must select the N terms with the
    distributed top-k, never a single-partition rank over the whole
    (corpus-scaling) vocabulary."""
    from datafusion_server_spark import tables
    from datafusion_server_spark.operators.text import vocab_coverage

    docs = tables.load(spark, sf_dir, "documents")
    df = vocab_coverage(docs, "text", "doc_id", vocab_size=50, materialize=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert not _unbounded_single_partition_exchanges(df)


def test_quantile_normalize_plan_is_range_partitioned(spark, sf_dir):
    """The global rank table must be built on a range-partitioned layout
    (partition order == sort order), not a single-partition sort."""
    df = registry()["profile_quantile_normalize"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan


def test_vocab_curve_rank_is_range_partitioned(spark, sf_dir):
    """text_vocab_coverage_curve ranks EVERY distinct term (the curve
    needs full ranks, so top-k doesn't apply): the rank must be built
    on a range-partitioned layout (distributed_rank), with no unbounded
    single-partition exchange anywhere in the plan."""
    df = registry()["text_vocab_coverage_curve"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan
    assert not _unbounded_single_partition_exchanges(df)


def test_greedy_budget_cumsum_is_range_partitioned(spark, sf_dir):
    """sample_greedy_quality_budget's corpus-order cumulative token sum
    must be the two-level distributed_cumsum (range partitioning), not
    a single-partition running-sum window."""
    df = registry()["sample_greedy_quality_budget"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan
    assert not _unbounded_single_partition_exchanges(df)


def test_ccnet_band_rank_is_range_partitioned(spark, sf_dir):
    """prune_ccnet_perplexity_band ranks within language WITHOUT a
    lang-partitioned window (|langs| one-task slices at corpus scale):
    the rank must come from the range-partitioned distributed_rank
    with the per-language offset broadcast on."""
    df = registry()["prune_ccnet_perplexity_band"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan
    assert not _unbounded_single_partition_exchanges(df)


def test_sharded_pack_window_is_hash_partitioned(spark, sf_dir):
    """pack_chunks_sharded must compile its cumulative window onto a
    hash-partitioned exchange (per-shard state), with no
    single-partition funnel anywhere in the plan."""
    df = registry()["text_pack_sequences_sharded"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(shard" in plan
    assert "Exchange SinglePartition" not in plan


@pytest.mark.skipif(
    not __import__("os").environ.get("SPARK_GRAFT_FULL_PLAN_AUDIT"),
    reason="~5 min full-registry audit; scripts/plan_audit.py runs the same "
    "check standalone — set SPARK_GRAFT_FULL_PLAN_AUDIT=1 to run here",
)
def test_full_registry_no_unbounded_global_windows(spark, sf_dir):
    """Every non-streaming query in the registry must be free of
    unbounded single-partition exchanges, except the documented
    allowlist (semantics-mandated global windows)."""
    bad = {}
    for name, qd in registry().items():
        if name.startswith("streaming_") or name in ALLOWED_GLOBAL_WINDOW_QUERIES:
            continue
        hits = _unbounded_single_partition_exchanges(qd.build(spark, sf_dir))
        if hits:
            bad[name] = hits[:1]
    assert not bad, f"unbounded global windows outside allowlist: {bad}"


def test_c4_and_repetition_rows_are_shuffle_free(spark, sf_dir):
    """r11: the page-pruning rows must stay single-pass narrow
    projections — no Exchange at all (they scale with the scan)."""
    from datafusion_server_spark.queries import registry

    reg = registry()
    for name in ("prune_c4_rules", "prune_repetition_rules"):
        df = reg[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} gained a shuffle:\n{plan[:800]}"


def test_c4_kept_filter_not_reinlined(spark, sf_dir):
    """The kept-lines FILTER must survive CollapseProject as a single
    evaluation (the lambda-invariant discipline): exactly one
    lambdafunction FILTER in the optimized plan."""
    from datafusion_server_spark.queries import registry

    df = registry()["prune_c4_rules"].build(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert plan.count("filter(split") == 1, plan[:800]


@pytest.mark.parametrize("name", ["agg_cube", "agg_rollup", "agg_grouping_sets"])
def test_two_phase_multi_group_expands_preaggregate(spark, sf_dir, name):
    """r11 (cube) + r12 (rollup/grouping sets, verdict task 2): the
    Expand must sit ABOVE a hash aggregate (the two-phase form — Expand
    multiplies the ~25-row pre-aggregate, not the fact table)."""
    from datafusion_server_spark.queries import registry

    df = registry()[name].build(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    i_exp = plan.find("Expand")
    assert i_exp != -1
    # an aggregate must appear BELOW the Expand (later in the printed
    # tree = deeper), proving the pre-aggregation feeds it
    assert "HashAggregate" in plan[i_exp:], plan[:1200]
