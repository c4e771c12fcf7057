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

from pyspark.sql import DataFrame
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
