"""Event-sequence analytics: funnel conversion and cohort retention.

Beyond-reference operators in the events family (sessionization, as-of
join, rollup live elsewhere) — the two product-analytics classics:

- funnel: how many users complete step1 -> step2 -> ... IN ORDER, where
  each step must occur strictly after the user's completion of the
  previous one (the min-timestamp formulation: t_i = earliest step-i
  event after t_{i-1});
- cohort retention: group users by their first-event period, count how
  many are active again k periods later.

Determinism: everything is MIN over exact timestamps and integer
counts; the only division is the final rate, rounded.

Scale notes (100 TB): the funnel is |steps| chained (user-keyed
aggregations + joins) — each stage's output is one row per surviving
user, monotonically shrinking; retention is two user-period
aggregations and one join keyed by user. Both shapes are the textbook
event-analytics plans; no window over the raw stream is ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """(step BIGINT, step_name, n_users BIGINT, conversion DOUBLE):
    users completing each prefix of ``steps`` in strict temporal order;
    conversion is relative to step 1 (rounded 6)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"), F.col(ts_col).alias("ts")
    )
    cur = (
        base.filter(F.col("t") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t0"))
    )
    stage_counts = [cur]
    for i, st in enumerate(steps[1:], start=1):
        nxt = (
            base.filter(F.col("t") == st)
            .join(cur.select("u", F.col(f"t{i-1}")), "u")
            .filter(F.col("ts") > F.col(f"t{i-1}"))
            .groupBy("u")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "u")
        stage_counts.append(cur)
    spark = events.sparkSession
    counts = [
        df.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
            F.lit(i + 1).cast("bigint").alias("step"),
            F.lit(steps[i]).alias("step_name"),
            F.col("n").alias("n_users"),
        )
        for i, df in enumerate(stage_counts)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    first = out.filter(F.col("step") == 1).select(
        F.col("n_users").alias("__n1")
    )
    return out.crossJoin(F.broadcast(first)).select(
        "step",
        "step_name",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.col("__n1").cast("double"), 6
        ).alias("conversion"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period_seconds: int = 7 * 24 * 3600,
    max_offset: int = 4,
) -> DataFrame:
    """(cohort BIGINT epoch-seconds, week_offset BIGINT, n_active,
    n_cohort, retention DOUBLE): users grouped by their FIRST event's
    period; for each later offset, how many were active again. Offset 0
    is the cohort itself (retention 1.0 by construction)."""
    base = events.select(
        F.col(user_col).alias("u"),
        F.floor(F.unix_timestamp(F.col(ts_col)) / period_seconds)
        .cast("bigint")
        .alias("p"),
    )
    first = base.groupBy("u").agg(F.min("p").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    active = base.distinct().join(first, "u").select(
        "cohort", (F.col("p") - F.col("cohort")).alias("week_offset")
    )
    ret = (
        active.filter(
            (F.col("week_offset") >= 0) & (F.col("week_offset") <= max_offset)
        )
        .groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return ret.join(sizes, "cohort").select(
        (F.col("cohort") * period_seconds).cast("bigint").alias("cohort"),
        F.col("week_offset").cast("bigint"),
        "n_active",
        "n_cohort",
        F.round(
            F.col("n_active").cast("double") / F.col("n_cohort").cast("double"), 6
        ).alias("retention"),
    )


def transition_matrix(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    order_tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition counts over per-user event paths:
    order each user's events by (ts, tiebreak), pair each event with its
    successor, count (from_type, to_type) corpus-wide, and attach the
    row-normalized transition probability. The user-journey summary
    behind next-step prediction and anomaly review. Output:
    (from_type, to_type, n BIGINT, p DOUBLE rounded 6).

    Determinism: the ordering carries an explicit total tie-break
    (equal timestamps would otherwise make LAG partition-dependent).
    Scale: one user-keyed window + one (from, to) aggregation —
    alphabet-squared-bounded output."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak_col).asc()
    )
    paired = events.select(
        F.col(type_col).alias("to_type"),
        F.lag(F.col(type_col)).over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = paired.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    row_tot = counts.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("__rt")
    )
    return counts.join(row_tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("__rt").cast("double"), 6).alias(
            "p"
        ),
    )


def interarrival_burstiness(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    order_tiebreak_col: str,
    *,
    min_events: int = 3,
) -> DataFrame:
    """Per-user inter-arrival statistics + the Goh-Barabasi burstiness
    coefficient B = (sigma - mu) / (sigma + mu) over the gaps between
    consecutive events: B -> -1 periodic (bot-like regularity), ~0
    Poisson, -> +1 bursty (human sessions). Users with fewer than
    ``min_events`` events (< 2 gaps) are excluded. Output: (user,
    n_gaps BIGINT, mean_gap_s, std_gap_s, burstiness — rounded 6).

    Determinism: gaps are exact second differences (total-order
    tie-break); moments are DECIMAL sums; std uses the n-1 form.
    Scale: one user window + one user aggregation."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak_col).asc()
    )
    gaps = events.select(
        F.col(user_col).alias("u"),
        (
            F.unix_timestamp(F.col(ts_col))
            - F.unix_timestamp(F.lag(F.col(ts_col)).over(w))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    mom = gaps.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(F.col("gap").cast("decimal(38,0)")).alias("__s"),
        F.sum((F.col("gap") * F.col("gap")).cast("decimal(38,0)")).alias("__ss"),
    ).filter(F.col("n_gaps") >= min_events - 1)
    n = F.col("n_gaps").cast("double")
    mean = F.col("__s").cast("double") / n
    var = (F.col("__ss").cast("double") - F.col("__s").cast("double") * mean) / (
        n - 1.0
    )
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return mom.filter(F.col("n_gaps") >= 2).select(
        F.col("u").alias(user_col),
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(std, 6).alias("std_gap_s"),
        F.when(
            (std + mean) > 0.0, F.round((std - mean) / (std + mean), 6)
        ).alias("burstiness"),
    )


def path_surprisal(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    order_tiebreak_col: str,
) -> DataFrame:
    """(user, n_transitions BIGINT, surprisal_dec DECIMAL, surprisal
    DOUBLE): average negative log-likelihood of each user's event path
    under the corpus-wide first-order Markov model (the
    :func:`transition_matrix` MLE) — high surprisal = a journey the
    global model finds unusual, the sequence-level anomaly signal that
    pairs with the point-level z-score operator.

    Determinism: the per-transition -ln p is rounded to 8 decimals and
    cast DECIMAL before the exact per-user sum (the corpus-LM pattern:
    the only cross-engine float op is quantized before aggregation);
    the reported average divides the exact decimal sum once at the end.

    Scale: one user-keyed window + one broadcast join of the
    alphabet-squared model table + one user aggregation.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak_col).asc()
    )
    paired = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("to_type"),
        F.lag(F.col(type_col)).over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = paired.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ab")
    )
    row_tot = counts.groupBy("from_type").agg(
        F.sum("n_ab").cast("bigint").alias("n_a")
    )
    nll = counts.join(row_tot, "from_type").select(
        "from_type",
        "to_type",
        F.round(
            -F.log(F.col("n_ab").cast("double") / F.col("n_a").cast("double")), 8
        )
        .cast("decimal(18,8)")
        .alias("nll"),
    )
    scored = (
        paired.join(F.broadcast(nll), ["from_type", "to_type"])
        .groupBy("user")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.sum("nll").cast("decimal(28,8)").alias("surprisal_dec"),
        )
    )
    return scored.select(
        "user",
        "n_transitions",
        "surprisal_dec",
        (
            F.col("surprisal_dec").cast("double")
            / F.col("n_transitions").cast("double")
        ).alias("surprisal"),
    )


def linear_attribution(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    *,
    conversion_type: str,
    touch_types: tuple[str, ...],
    lookback_s: int,
    value_scale: int = 100,
) -> DataFrame:
    """(touch_type, n_touches BIGINT, attributed_scaled BIGINT): linear
    multi-touch attribution — each conversion's value splits equally
    across the user's preceding touch events inside the lookback
    window; conversions with no touch land on ``(none)``.

    Determinism: the conversion value is quantized to an exact BIGINT
    (``ROUND(value*scale)``); each of the n touches receives the
    integer share ``v DIV n`` and the EARLIEST touch (ts, id tie-break)
    absorbs the remainder ``v % n`` — so total credit is conserved
    exactly and every cell is an order-independent integer sum.

    Scale shape: the touch<->conversion pairing is the bucketed
    range-join pattern (range_join_pairs): both sides bucket at
    ``floor(epoch_us / lookback_us)``, the conversion side explodes
    into its two candidate buckets {b-1, b}, and the join is an
    EQUI-join on (user, bucket) with the time window as a residual
    filter — a fine-grained shuffle key, never a per-user theta join.
    The per-conversion share window partitions by conversion id
    (fan-out bounded by touch density x window width).
    """
    lookback_us = lookback_s * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        F.round(F.col(value_col) * value_scale).cast("bigint").alias("_v"),
        F.floor(us / lookback_us).alias("_b"),
    )
    conv = base.filter(F.col("_t") == conversion_type).select(
        F.col("_u"),
        F.col("_id").alias("conv_id"),
        F.col("_us").alias("conv_us"),
        F.col("_v").alias("conv_v"),
        F.explode(F.array(F.col("_b") - 1, F.col("_b"))).alias("_jb"),
    )
    touch = base.filter(F.col("_t").isin(*touch_types)).select(
        F.col("_u"),
        F.col("_t").alias("touch_type"),
        F.col("_id").alias("touch_id"),
        F.col("_us").alias("touch_us"),
        F.col("_b").alias("_jb"),
    )
    pairs = conv.join(touch, ["_u", "_jb"]).filter(
        (F.col("touch_us") < F.col("conv_us"))
        & (F.col("conv_us") - F.col("touch_us") <= lookback_us)
    )
    wconv = Window.partitionBy("conv_id")
    worder = wconv.orderBy(F.col("touch_us").asc(), F.col("touch_id").asc())
    credited = pairs.select(
        "touch_type",
        "conv_id",
        "conv_v",
        F.count(F.lit(1)).over(wconv).cast("bigint").alias("n"),
        F.row_number().over(worder).alias("rn"),
    ).select(
        "touch_type",
        (
            F.expr("conv_v DIV n")
            + F.when(F.col("rn") == 1, F.col("conv_v") % F.col("n")).otherwise(
                F.lit(0)
            )
        ).alias("credit"),
    )
    matched = pairs.select("conv_id").distinct()
    unattributed = (
        base.filter(F.col("_t") == conversion_type)
        .join(matched, base["_id"] == matched["conv_id"], "left_anti")
        .select(F.lit("(none)").alias("touch_type"), F.col("_v").alias("credit"))
    )
    return (
        credited.unionByName(unattributed)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit").cast("bigint").alias("attributed_scaled"),
        )
    )


def kaplan_meier(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    censor_after_s: int,
    day_s: int = 86_400,
) -> DataFrame:
    """(dur_day BIGINT, n_at_risk, n_churned, n_censored BIGINT,
    km_survival DOUBLE): Kaplan-Meier survival of user lifetime (days
    between a user's first and last event). Users whose last event is
    within ``censor_after_s`` of the observation end are right-CENSORED
    (still alive); everyone else churns at their last-event day.

    Determinism: the curve table is pure integer aggregation (counts
    per duration day, at-risk via a reverse cumulative sum). The KM
    product S(t) = prod_{u<=t}(1 - d_u/n_u) is an inherently SEQUENTIAL
    float product, so it is computed by folding the day-ordered factor
    array left-to-right — the curve is duration-day-bounded (calendar
    days, never corpus-scale), so it collapses to ONE array row and the
    fold order is identical on any engine/partitioning (the DuckDB
    oracle folds the same list with list_reduce; multiplication is
    correctly rounded IEEE, and the leading 1.0 * f1 is exact).

    Scale shape: one user-keyed aggregation (the only corpus-scale
    shuffle) -> duration-day aggregation (calendar-bounded) -> global
    window + single-row fold over <= observation-window-days rows.
    """
    day_us = day_s * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    spans = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(us).alias("f"), F.max(us).alias("l")
    )
    end = events.agg(F.max(us).alias("e"))
    du = spans.crossJoin(F.broadcast(end)).select(
        F.expr(f"CAST((l - f) DIV {day_us} AS BIGINT)").alias("dur"),
        F.when(
            F.col("e") - F.col("l") >= censor_after_s * 1_000_000, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("ch"),
    )
    curve = du.groupBy("dur").agg(
        F.sum("ch").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("ch")).cast("bigint").alias("c"),
    )
    # at-risk = users with duration >= this day: reverse running sum
    # over the day-bounded curve (HashAggregate below bounds the rows)
    wrev = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = curve.select(
        "dur", "d", "c",
        F.sum(F.col("d") + F.col("c")).over(wrev).cast("bigint").alias("n"),
    )
    one = risk.agg(
        F.sort_array(F.collect_list(F.struct("dur", "d", "c", "n"))).alias("arr")
    ).select(
        "arr",
        F.transform(
            "arr",
            lambda x: F.lit(1.0) - x["d"].cast("double") / x["n"].cast("double"),
        ).alias("fl"),
    )
    km = one.select(
        F.explode(
            F.transform(
                "arr",
                lambda x, i: F.struct(
                    x["dur"].alias("dur"),
                    x["d"].alias("d"),
                    x["c"].alias("c"),
                    x["n"].alias("n"),
                    F.aggregate(
                        F.slice("fl", F.lit(1), i + 1),
                        F.lit(1.0),
                        lambda a, b: a * b,
                    ).alias("s"),
                ),
            )
        ).alias("r")
    )
    return km.select(
        F.col("r.dur").alias("dur_day"),
        F.col("r.n").alias("n_at_risk"),
        F.col("r.d").alias("n_churned"),
        F.col("r.c").alias("n_censored"),
        F.col("r.s").alias("km_survival"),
    )


MARKOV_RANK_ONE = 1_000_000_000  # stationary mass units (1e-9)
MARKOV_PROP_ONE = 1_000_000  # transition-probability units (1e-6)


def markov_stationary(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    id_col: str,
    iterations: int = 12,
) -> DataFrame:
    """(state, pi_nano BIGINT): stationary distribution of the
    first-order event-type Markov chain by fixed-count power iteration
    pi' = pi P — "where does a user session settle" — in exact integer
    arithmetic (mass in 1e-9 units, transition proportions in 1e-6
    units, per-step floor division), bit-identical on any partitioning.

    States are the types with OUTGOING transitions; mass that flows
    into a sink state is dropped at the next step (the dangling
    convention, same as operators/graph.pagerank).

    Scale shape: ONE corpus pass builds the |types|^2-bounded cell
    table (per-user lag window + one aggregation); the iteration is a
    bounded-state FOLD over a single collected row (the r8 pattern —
    pagerank's ``folded=True``, Bradley-Terry): each step is a
    withColumn so the previous map is a bound multi-referenced column
    and Catalyst's CollapseProject cannot inline it per-element (the
    documented exponential-evaluation trap).
    """
    w = Window.partitionBy("u").orderBy("ts", "id")
    pairs = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("t"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
        )
        .select("u", F.col("t").alias("j"), F.lag("t").over(w).alias("i"))
        .filter(F.col("i").isNotNull())
    )
    counts = pairs.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ij")
    )
    wsrc = Window.partitionBy("i")
    cells = counts.select(
        "i",
        "j",
        F.expr(
            f"CAST(n_ij * {MARKOV_PROP_ONE} DIV SUM(n_ij) OVER (PARTITION BY i) AS BIGINT)"
        ).alias("p"),
    )
    row = cells.agg(
        F.array_sort(F.collect_set("i")).alias("states"),
        F.array_sort(
            F.collect_list(F.struct("i", "j", "p"))
        ).alias("cells"),
    ).select(
        "states", "cells", F.size("states").cast("bigint").alias("k")
    )
    # r14 (guide §1.2): the fold steps are SQL strings — identical
    # expression trees (same integer floor-division arithmetic), the
    # 12-step loop just parses in ~2 round-trips per step instead of
    # ~400. The pim map stays a real projection column per step, so
    # CollapseProject cannot inline it per-element (the documented trap).
    row = row.selectExpr(
        "states",
        "cells",
        "k",
        f"CAST(TRANSFORM(states, s -> ({MARKOV_RANK_ONE} - "
        f"{MARKOV_RANK_ONE} % k) / k) AS ARRAY<BIGINT>) AS pi",
    )
    prop = f"CAST({MARKOV_PROP_ONE} AS BIGINT)"
    step = (
        "TRANSFORM(states, s -> AGGREGATE(FILTER(cells, c -> c.j = s), "
        "CAST(0 AS BIGINT), (acc, c) -> acc + CAST("
        f"(ELEMENT_AT(pim, c.i) * c.p - (ELEMENT_AT(pim, c.i) * c.p) % {prop})"
        f" / {prop} AS BIGINT))) AS pi"
    )
    for _ in range(iterations):
        row = row.selectExpr(
            "states", "cells", "k", "pi", "MAP_FROM_ARRAYS(states, pi) AS pim"
        ).selectExpr("states", "cells", "k", step)
    return row.selectExpr(
        "EXPLODE(ARRAYS_ZIP(states, pi)) AS z"
    ).selectExpr("z.states AS state", "CAST(z.pi AS BIGINT) AS pi_nano")
