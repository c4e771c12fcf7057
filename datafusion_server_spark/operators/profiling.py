"""Dataset profiling: per-column quality statistics in ONE pass.

Beyond-reference operator — the audit step a pipeline runs before and
after every transformation (ingest sanity, post-dedup drift, schema
debt): row count, null count/rate, exact distinct count, min/max.

Scale shape (100 TB): ALL columns profile in a single aggregation over
one scan — the per-column expressions (count, null-sum, min, max) are
plain map-side-combined aggregates. Exact ``countDistinct`` over many
columns expands the input (one Expand row per profiled column), so for
wide tables at extreme scale swap it for the mergeable HLL registers in
``operators.sketch`` (same one-pass shape, approximate); the exact form
is kept here because the oracle checks it value-for-value.

The long-format output (one row per column) melts driver-free via a
``stack`` expression over the single aggregated row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_null, null_rate, n_distinct, min_value,
    max_value) per profiled column; min/max render as canonical strings
    (numbers via BIGINT cast, dates ISO) so the schema is uniform.
    NULLs are excluded from distinct/min/max (SQL semantics)."""
    # the melt goes through a selectExpr stack() with interpolated
    # names — restrict to plain identifiers so a quoted/backticked
    # column fails loudly instead of generating broken SQL
    bad = [c for c in cols if not c.replace("_", "a").isalnum()]
    if bad:
        raise ValueError(f"profile_columns needs plain identifiers, got {bad}")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("bigint")).cast("bigint").alias(f"__null_{c}"),
            F.count_distinct(col).cast("bigint").alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    melted = one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_value, max_value)",
    )
    return melted.select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_null",
        F.round(F.col("n_null").cast("double") / F.col("__n").cast("double"), 6).alias(
            "null_rate"
        ),
        "n_distinct",
        "min_value",
        "max_value",
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    bins: int = 10,
    lo: float,
    hi: float,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard distribution-drift alarm between pipeline runs
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 action):

        psi = sum_bins (p_i - q_i) * ln(p_i / q_i)

    over a FIXED [lo, hi) grid of ``bins`` equal buckets (out-of-range
    values clamp to the edge buckets — same contract as the mergeable
    histogram sketch), with add-one smoothing on the counts so empty
    buckets stay defined. Output: one row per bucket
    (bin, n_a, n_b, psi_contrib) plus the total riding on every row
    (psi_total) for single-row consumption.

    Determinism: counts exact; p/q are exact-count ratios; each ln
    contribution rounds to 8 and sums as DECIMAL; the shares divide in
    double. Scale: one map-side-combined count aggregation per snapshot
    (output = ``bins`` rows each), everything after is on 2 x bins rows.
    """
    from pyspark.sql.window import Window

    if bins <= 0 or not hi > lo:
        raise ValueError(f"psi_drift needs bins > 0 and hi > lo, got bins={bins}, [{lo}, {hi})")
    width = (hi - lo) / bins

    def bucketed(df: DataFrame, alias: str) -> DataFrame:
        bucket = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col).cast("double") - lo) / width).cast("int"),
            ),
        )
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(bucket.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    grid = df_a.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        grid.join(bucketed(df_a, "n_a"), "bin", "left")
        .join(bucketed(df_b, "n_b"), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
        )
    )
    tot = joined.agg(
        F.sum("n_a").cast("bigint").alias("__ta"),
        F.sum("n_b").cast("bigint").alias("__tb"),
    )
    p = (F.col("n_a") + 1).cast("double") / (F.col("__ta") + bins).cast("double")
    q = (F.col("n_b") + 1).cast("double") / (F.col("__tb") + bins).cast("double")
    with_c = joined.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_a",
        "n_b",
        F.round((p - q) * F.log(p / q), 8).cast("decimal(18,8)").alias("__c"),
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return with_c.select(
        "bin",
        "n_a",
        "n_b",
        F.col("__c").cast("double").alias("psi_contrib"),
        F.round(F.sum("__c").over(w).cast("double"), 6).alias("psi_total"),
    )


def term_psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    *,
    top_n: int = 20,
) -> DataFrame:
    """Categorical PSI over TERM distributions — the text counterpart
    of ``psi_drift``: categories are the ``top_n`` terms of the COMBINED
    corpora (ties lexicographic — deterministic) plus an ``<other>``
    bucket; shares smooth add-one; same rounded-ln DECIMAL contribution
    sum. The vocabulary-shift alarm between two crawl snapshots.
    Output: (category, n_a, n_b, psi_contrib, psi_total).

    Scale: one term-count aggregation per snapshot (vocab-sized
    output); the top-n selection is a distributed TakeOrderedAndProject
    over the joined vocab tables (distinct terms scale with the corpus,
    so no single-partition rank); the category map broadcasts back onto
    them."""

    def counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    ca, cb = counts(df_a, "n_a"), counts(df_b, "n_b")
    both = ca.join(cb, "term", "full_outer").select(
        "term",
        F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
    )
    top = (
        both.orderBy(F.desc(F.col("n_a") + F.col("n_b")), F.asc("term"))
        .limit(top_n)
        .select(F.col("term").alias("__top"))
    )
    cat = (
        both.join(F.broadcast(top), both["term"] == top["__top"], "left")
        .select(
            F.when(F.col("__top").isNotNull(), F.col("term"))
            .otherwise(F.lit("<other>"))
            .alias("category"),
            "n_a",
            "n_b",
        )
        .groupBy("category")
        .agg(
            F.sum("n_a").cast("bigint").alias("n_a"),
            F.sum("n_b").cast("bigint").alias("n_b"),
        )
    )
    n_cats = top_n + 1
    tot = cat.agg(
        F.sum("n_a").cast("bigint").alias("__ta"),
        F.sum("n_b").cast("bigint").alias("__tb"),
    )
    p = (F.col("n_a") + 1).cast("double") / (F.col("__ta") + n_cats).cast("double")
    q = (F.col("n_b") + 1).cast("double") / (F.col("__tb") + n_cats).cast("double")
    with_c = cat.crossJoin(F.broadcast(tot)).select(
        "category",
        "n_a",
        "n_b",
        F.round((p - q) * F.log(p / q), 8).cast("decimal(18,8)").alias("__c"),
    )
    from pyspark.sql.window import Window

    win = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return with_c.select(
        "category",
        "n_a",
        "n_b",
        F.col("__c").cast("double").alias("psi_contrib"),
        F.round(F.sum("__c").over(win).cast("double"), 6).alias("psi_total"),
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE pass:
    every per-column and per-pair moment (S_x, S_xx, S_xy) accumulates
    as an exact DECIMAL sum in a single aggregation over one scan, and

        r = (n*S_xy - S_x*S_y) / sqrt((n*S_xx - S_x^2) (n*S_yy - S_y^2))

    evaluates on the aggregated row. Rows with a NULL in ANY profiled
    column are excluded (complete-case, the textbook definition for a
    matrix — pairwise-deletion r's are not comparable to each other).
    Output: (col_a, col_b, n BIGINT, corr DOUBLE rounded 6) for each
    unordered pair. Zero-variance columns yield NULL corr.

    Determinism: per-row products evaluate in IEEE double (identical
    both engines), round to 4 decimals, and sum as DECIMAL — exact and
    order-free; raw values sum as DECIMAL(38,6). (True int-exact
    products overflow DuckDB's int64 decimal kernel at this width, so
    the contract is "Pearson over 4-decimal-rounded products" —
    deterministic, and within 1e-4 of the unrounded moments.) Only the
    final formula runs in double, rounded to 6."""
    bad = [c for c in cols if not c.replace("_", "a").isalnum()]
    if bad:
        raise ValueError(f"correlation_matrix needs plain identifiers, got {bad}")
    # r14 (guide §1.2): SQL-string aggregates/projections — identical
    # expression trees, one parse per expression instead of ~12 py4j
    # round-trips per moment Column (3604 -> ~350 RTs on the 8-column
    # profile row).
    complete = df.where(" AND ".join(f"{c} IS NOT NULL" for c in cols))

    def dv(c: str) -> str:
        return f"CAST(ROUND(CAST({c} AS DOUBLE), 6) AS DECIMAL(38,6))"

    def dp(a: str, b: str) -> str:
        return (
            f"CAST(ROUND(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE), 4)"
            " AS DECIMAL(38,4))"
        )

    aggs = [F.expr("CAST(COUNT(1) AS BIGINT) AS __n")]
    for c in cols:
        aggs.append(F.expr(f"SUM({dv(c)}) AS __s_{c}"))
        aggs.append(F.expr(f"SUM({dp(c, c)}) AS __ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.expr(f"SUM({dp(a, b)}) AS __sp_{a}_{b}"))
    one = complete.agg(*aggs)

    def corr_sql(a: str, b: str) -> str:
        n = "CAST(__n AS DOUBLE)"
        sa, sb = f"CAST(__s_{a} AS DOUBLE)", f"CAST(__s_{b} AS DOUBLE)"
        ssa, ssb = f"CAST(__ss_{a} AS DOUBLE)", f"CAST(__ss_{b} AS DOUBLE)"
        sp = f"CAST(__sp_{a}_{b} AS DOUBLE)"
        va = f"({n} * {ssa} - {sa} * {sa})"
        vb = f"({n} * {ssb} - {sb} * {sb})"
        return (
            f"CASE WHEN {va} > 0.0D AND {vb} > 0.0D THEN "
            f"ROUND(({n} * {sp} - {sa} * {sb}) / SQRT({va} * {vb}), 6) END"
        )

    rows = [
        one.selectExpr(
            f"'{a}' AS col_a",
            f"'{b}' AS col_b",
            "__n AS n",
            f"{corr_sql(a, b)} AS corr",
        )
        for a, b in pairs
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def welch_ttest(df_a: DataFrame, df_b: DataFrame, value_col: str) -> DataFrame:
    """Welch's two-sample t statistic between snapshots of a metric —
    the significance companion to ``psi_drift`` (PSI says the SHAPE
    moved; Welch says whether the MEAN moved beyond sampling noise,
    without assuming equal variances):

        t = (m_a - m_b) / sqrt(v_a/n_a + v_b/n_b),
        dof = (v_a/n_a + v_b/n_b)^2
              / ((v_a/n_a)^2/(n_a - 1) + (v_b/n_b)^2/(n_b - 1))

    Output: ONE row (n_a, n_b, mean_a, mean_b, t_stat, dof), all
    rounded to 6. NULL values are excluded; degenerate inputs
    (n < 2 or both variances zero) yield NULL t/dof.

    Determinism: the moment sums are the correlation-matrix contract
    (values rounded to 6 -> DECIMAL, squares rounded to 4 -> DECIMAL,
    order-free); the statistic evaluates on the one aggregated row."""

    def moments(df: DataFrame, tag: str) -> DataFrame:
        v = F.col(value_col)
        return df.filter(v.isNotNull()).agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_{tag}"),
            F.sum(F.round(v.cast("double"), 6).cast("decimal(38,6)")).alias(
                f"__s_{tag}"
            ),
            F.sum(
                F.round(v.cast("double") * v.cast("double"), 4).cast("decimal(38,4)")
            ).alias(f"__ss_{tag}"),
        )

    one = moments(df_a, "a").crossJoin(moments(df_b, "b"))

    def stats(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"__s_{tag}").cast("double")
        ss = F.col(f"__ss_{tag}").cast("double")
        mean = s / n
        var = (ss - s * s / n) / (n - 1.0)
        return n, mean, var

    na, ma, va = stats("a")
    nb, mb, vb = stats("b")
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0)
    )
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0.0)
    return one.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.when(ok, F.round(t, 6)).alias("t_stat"),
        F.when(ok, F.round(dof, 6)).alias("dof"),
    )


def chi_squared_drift(
    df_a: DataFrame, df_b: DataFrame, cat_col: str
) -> DataFrame:
    """Two-sample chi-squared homogeneity statistic over a categorical
    column — the significance companion to the categorical PSI: for the
    contingency table (category x snapshot),

        chi2 = sum_cells (observed - expected)^2 / expected,
        expected = row_total * col_total / grand_total,

    with dof = (#categories - 1). Output: ONE row (n_a, n_b,
    n_categories, chi2, dof). Categories absent from one side count 0
    observed there; all-integer inputs, one rounded division chain.

    Scale: one count aggregation per snapshot (category-bounded), the
    statistic evaluates on the joined category table."""
    def counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.filter(F.col(cat_col).isNotNull())
            .groupBy(F.col(cat_col).alias("category"))
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    merged = counts(df_a, "n_a").join(counts(df_b, "n_b"), "category", "full_outer").select(
        "category",
        F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
    )
    tot = merged.agg(
        F.sum("n_a").cast("bigint").alias("__ta"),
        F.sum("n_b").cast("bigint").alias("__tb"),
        F.count(F.lit(1)).cast("bigint").alias("__k"),
    )
    j = merged.crossJoin(F.broadcast(tot))
    grand = (F.col("__ta") + F.col("__tb")).cast("double")
    row_t = (F.col("n_a") + F.col("n_b")).cast("double")
    ea = row_t * F.col("__ta").cast("double") / grand
    eb = row_t * F.col("__tb").cast("double") / grand
    cell = F.round(
        (F.col("n_a").cast("double") - ea) * (F.col("n_a").cast("double") - ea) / ea
        + (F.col("n_b").cast("double") - eb) * (F.col("n_b").cast("double") - eb) / eb,
        8,
    ).cast("decimal(18,8)")
    return (
        j.select("__ta", "__tb", "__k", cell.alias("__c"))
        .groupBy("__ta", "__tb", "__k")
        .agg(F.sum("__c").alias("__chi"))
        .select(
            F.col("__ta").alias("n_a"),
            F.col("__tb").alias("n_b"),
            F.col("__k").alias("n_categories"),
            F.round(F.col("__chi").cast("double"), 6).alias("chi2"),
            (F.col("__k") - 1).cast("bigint").alias("dof"),
        )
    )


def ks_statistic_binned(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    bins: int = 50,
    lo: float,
    hi: float,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic on the FIXED [lo, hi)
    grid: max over bin edges of |CDF_a - CDF_b|, with CDFs from the
    binned counts (the grid makes it mergeable and deterministic; the
    exact-order KS needs a global sort and adds nothing at drift-alarm
    granularity). Completes the drift family: PSI (shape), Welch
    (mean), chi-squared (categorical), KS (max CDF gap). Output: ONE
    row (n_a, n_b, ks_stat DOUBLE rounded 6, ks_bin BIGINT — the edge
    where the max occurs, lowest such bin on ties)."""
    from pyspark.sql.window import Window

    if bins <= 0 or not hi > lo:
        raise ValueError(f"ks needs bins > 0 and hi > lo, got bins={bins}, [{lo}, {hi})")
    width = (hi - lo) / bins

    def bucketed(df: DataFrame, alias: str) -> DataFrame:
        bucket = F.least(
            F.lit(bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(value_col).cast("double") - lo) / width).cast("int"),
            ),
        )
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(bucket.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        )

    grid = df_a.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        grid.join(bucketed(df_a, "ca"), "bin", "left")
        .join(bucketed(df_b, "cb"), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("ca"), F.lit(0)).cast("bigint").alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).cast("bigint").alias("cb"),
        )
    )
    # bounded window: cumulative over the fixed `bins`-row grid
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = joined.agg(
        F.sum("ca").cast("bigint").alias("__na"), F.sum("cb").cast("bigint").alias("__nb")
    )
    gaps = joined.crossJoin(F.broadcast(tot)).select(
        "bin",
        "__na",
        "__nb",
        F.round(
            F.abs(
                F.sum("ca").over(wcum).cast("double") / F.col("__na").cast("double")
                - F.sum("cb").over(wcum).cast("double") / F.col("__nb").cast("double")
            ),
            6,
        ).alias("gap"),
    )
    best = gaps.orderBy(F.desc("gap"), F.asc("bin")).limit(1)
    return best.select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.col("gap").alias("ks_stat"),
        F.col("bin").cast("bigint").alias("ks_bin"),
    )


def quantile_normalize(
    df: DataFrame, value_col: str, group_col: str, id_col: str
) -> DataFrame:
    """Cross-group quantile normalization: replace each row's value with
    the GLOBAL value at the same within-group rank position — after
    which every group has (as nearly as sizes allow) the same
    distribution. The harmonization step before mixing heterogeneous
    sources whose quality/score scales differ (a 0.8 from source A and
    a 0.8 from source B rarely mean the same thing).

        r = percent_rank of the row within its group,
        normalized = global value at rank ceil(r * (N - 1)) + 1
                     (1-based percentile_disc-style selection)

    Ties break by id on the group window and by (value, id) — a total
    order — on the global rank (determinism). Output: input id/group/
    value + (normalized DOUBLE).

    Scale: one group-keyed window, then the TWO-LEVEL distributed
    global rank (``scale.distributed_rank`` — repartitionByRange so
    partition order equals sort order, per-partition ``row_number``,
    broadcast cumulative per-partition counts as the global offset; the
    only unpartitioned window ranks the partition-count table,
    #partitions rows). Finally one join keyed by rank index."""
    from pyspark.sql.window import Window

    from datafusion_server_spark.operators.scale import distributed_rank

    wg = Window.partitionBy("grp").orderBy(F.col("value").asc(), F.col("id").asc())
    ranked = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("value"),
    ).withColumn("__pr", F.percent_rank().over(wg))
    glob = distributed_rank(
        df.select(
            F.col(id_col).alias("id"), F.col(value_col).cast("double").alias("value")
        ),
        [F.col("value").asc(), F.col("id").asc()],
        "__rn",
    ).select("__rn", F.col("value").alias("__gv"))
    n_glob = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    keyed = ranked.crossJoin(F.broadcast(n_glob)).select(
        "id",
        "grp",
        "value",
        (
            F.ceil(F.col("__pr") * (F.col("__n") - 1).cast("double")).cast("bigint")
            + 1
        ).alias("__rn"),
    )
    return keyed.join(glob, "__rn").select(
        "id", F.col("grp").alias(group_col), "value",
        F.round(F.col("__gv"), 6).alias("normalized"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier flags via the modified z-score
    (Iglewicz-Hoaglin): med = percentile_disc-median of the group,
    MAD = median of |x - med|,

        mz = 0.6745 * (x - med) / MAD,   outlier when |mz| > threshold.

    Median/MAD resist the very outliers a mean/stddev rule would be
    dragged by — the standard metric-cleaning gate. Output: id, group,
    value, med, mad, modified_z (rounded 6; NULL when MAD = 0),
    is_outlier BOOLEAN (false when MAD = 0 — a constant-bulk group
    flags nothing rather than everything).

    Determinism: discrete medians are SELECTIONS (rank ceil(n/2), ties
    by value then id — no interpolation float math); only the final
    ratio rounds. Scale: two group-keyed windows over the group's rows
    plus one broadcast join of the per-group med/MAD table."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull())

    def disc_median(d: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("grp").orderBy(F.col(col).asc(), F.col("id").asc())
        ranked = d.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("grp"))
        )
        return ranked.filter(
            F.col("__rn") == F.ceil(F.col("__n").cast("double") / 2.0)
        ).select("grp", F.col(col).alias(out))
    med = disc_median(base, "value", "med")
    absdev = base.join(F.broadcast(med), "grp").select(
        "id", "grp", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = disc_median(absdev, "adev", "mad")
    stats = med.join(mad, "grp")
    mz = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return base.join(F.broadcast(stats), "grp").select(
        "id",
        F.col("grp").alias(group_col),
        "value",
        "med",
        "mad",
        F.when(F.col("mad") > 0.0, F.round(mz, 6)).alias("modified_z"),
        F.when(
            F.col("mad") > 0.0, F.abs(mz) > threshold
        ).otherwise(F.lit(False)).alias("is_outlier"),
    )


def gini_coefficient(
    df: DataFrame, value_col: str, group_col: str, id_col: str
) -> DataFrame:
    """Per-group Gini concentration of a non-negative metric (how
    top-heavy is volume across users/sources — 0 equal, ->1 one member
    dominates), by the sorted-rank identity:

        G = (2 * sum_i i * x_(i)) / (n * sum_i x_(i)) - (n + 1) / n

    Output: (group, n BIGINT, total DOUBLE, gini DOUBLE rounded 6; NULL
    when the group total is 0). Negative inputs are invalid for Gini
    and raise at runtime via an ANSI-safe filter contract: they are
    EXCLUDED and counted in n_negative so silent nonsense can't pass.

    Determinism: the rank is a tie-broken window; i * x accumulates as
    DECIMAL. Scale: one group window + one group aggregation."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.col(value_col).cast("double").alias("x"),
    ).filter(F.col("x").isNotNull())
    neg = base.groupBy("grp").agg(
        F.sum((F.col("x") < 0).cast("bigint")).cast("bigint").alias("n_negative")
    )
    pos = base.filter(F.col("x") >= 0)
    w = Window.partitionBy("grp").orderBy(F.col("x").asc(), F.col("id").asc())
    ranked = pos.withColumn("__i", F.row_number().over(w).cast("bigint"))
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("x"), 6).cast("decimal(38,6)")).alias("__sx"),
        F.sum(
            F.round(F.col("__i").cast("double") * F.col("x"), 4).cast("decimal(38,4)")
        ).alias("__six"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    six = F.col("__six").cast("double")
    return agg.join(neg, "grp").select(
        F.col("grp").alias(group_col),
        "n",
        F.round(sx, 6).alias("total"),
        F.when(
            sx > 0.0, F.round(2.0 * six / (n * sx) - (n + 1.0) / n, 6)
        ).alias("gini"),
        "n_negative",
    )


def profile_columns_approx(df: DataFrame, cols: list[str]) -> DataFrame:
    """The promised scale variant of ``profile_columns`` for WIDE
    tables: distinct counts come from the deterministic md5-register
    HLL (operators.sketch) instead of exact count_distinct — no Expand
    node, still ONE pass per column family (a union of per-column
    register streams feeding one aggregation). Output:
    (column, n_rows, n_null, null_rate, approx_distinct DOUBLE).

    Same oracle-checkable determinism as the HLL sketch row."""
    from datafusion_server_spark.operators.sketch import hll_estimate, hll_registers

    bad = [c for c in cols if not c.replace("_", "a").isalnum()]
    if bad:
        raise ValueError(f"profile_columns_approx needs plain identifiers, got {bad}")
    base_aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")] + [
        F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"__null_{c}")
        for c in cols
    ]
    one = df.agg(*base_aggs)
    stack_args = ", ".join(f"'{c}', __null_{c}" for c in cols)
    nulls = one.selectExpr(
        "__n", f"stack({len(cols)}, {stack_args}) AS (column, n_null)"
    )
    streams = None
    for c in cols:
        s = df.filter(F.col(c).isNotNull()).select(
            F.lit(c).alias("column"), F.col(c).cast("string").alias("__k")
        )
        streams = s if streams is None else streams.unionByName(s)
    regs = hll_registers(streams, "__k", ["column"])
    est = hll_estimate(regs, ["column"]).select(
        "column", F.col("hll_estimate").alias("approx_distinct")
    )
    return nulls.join(est, "column", "left").select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_null",
        F.round(
            F.col("n_null").cast("double") / F.col("__n").cast("double"), 6
        ).alias("null_rate"),
        "approx_distinct",
    )


def corpus_snapshot_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Release diff between two corpus snapshots: FULL OUTER join on the
    document id comparing content hashes -> status in
    {added, removed, changed, unchanged} per id. One shuffle keyed by
    id at any corpus size; the md5 comparison keeps full texts out of
    the exchange (hash projection before the join)."""
    o = old.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("__ho"))
    n = new.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("__hn"))
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), "added")
        .when(F.col("__hn").isNull(), "removed")
        .when(F.col("__ho") != F.col("__hn"), "changed")
        .otherwise("unchanged")
    )
    return j.select("id", status.alias("status"))


# Poisson(1) CDF thresholds in 1e-6 units (floor(P(X<=k) * 1e6) for
# k = 0..7; residues >= the last threshold draw 8). Inlined as integer
# literals on BOTH engines so the replicate weights are pure integer
# comparisons — no exp/factorial at query time.
POISSON1_CDF_MICRO: tuple[int, ...] = (
    367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989,
)


def _poisson_weight(u_micro) -> "F.Column":
    w = F.lit(len(POISSON1_CDF_MICRO))
    for k in range(len(POISSON1_CDF_MICRO) - 1, -1, -1):
        w = F.when(u_micro < POISSON1_CDF_MICRO[k], F.lit(k)).otherwise(w)
    return w.cast("bigint")


def poisson_bootstrap_mean(
    df: DataFrame,
    id_col: str,
    value_col: str,
    *,
    replicates: int = 40,
    lo_idx: int = 2,
    hi_idx: int = 39,
) -> DataFrame:
    """One-row bootstrap confidence interval for the corpus mean of an
    integer column via the Poisson(1) bootstrap (Chamandy et al. 2012,
    "Estimating uncertainty for massive data streams"): each (row,
    replicate) pair draws a deterministic Poisson(1) weight from an
    md5 residue — the single-pass, no-resampling form of the bootstrap
    that works when n is unknown and the data is sharded.

    Determinism: weights are integer CASE thresholds over a 1e-6-unit
    hash residue (CDF literals precomputed, no float math); replicate
    means are single divisions of exact BIGINT sums; the CI bounds are
    ELEMENT selections (rows ``lo_idx``/``hi_idx`` of the
    (mean, replicate) order over the ``replicates``-bounded table).

    Scale shape: the replicate explode multiplies the SCAN ``replicates``
    x but map-side combine collapses it to ``replicates`` rows per
    partition before the shuffle; everything after is bounded.

    Output: (n_rows, n_replicates, mean_full, boot_lo, boot_hi) —
    unrounded doubles; round at the edge."""
    from pyspark.sql.window import Window

    reps = df.select(
        F.col(id_col).alias("id"),
        F.col(value_col).cast("bigint").alias("v"),
        F.explode(F.sequence(F.lit(1), F.lit(int(replicates)))).alias("r"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("id"), F.col("r"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )
    per = reps.select("r", "v", _poisson_weight(u).alias("w")).groupBy("r").agg(
        F.sum(F.col("w") * F.col("v")).cast("bigint").alias("swv"),
        F.sum("w").cast("bigint").alias("sw"),
    )
    means = per.select(
        "r", (F.col("swv").cast("double") / F.col("sw").cast("double")).alias("m")
    )
    # bounded window: `replicates` rows total
    wr = Window.orderBy("m", "r")
    ranked = means.withColumn("rn", F.row_number().over(wr))
    lo = ranked.filter(F.col("rn") == int(lo_idx)).select(F.col("m").alias("boot_lo"))
    hi = ranked.filter(F.col("rn") == int(hi_idx)).select(F.col("m").alias("boot_hi"))
    full = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            F.sum(F.col(value_col).cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_full"),
    ).withColumn("n_replicates", F.lit(int(replicates)).cast("bigint"))
    return (
        full.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select("n_rows", "n_replicates", "mean_full", "boot_lo", "boot_hi")
    )


def cramers_v(
    df: DataFrame, cat_a: str, cat_b: str
) -> DataFrame:
    """One-row Cramér's V association between two bounded categorical
    columns: V = sqrt(chi2 / (n * min(r-1, c-1))) over the r x c
    contingency table. Per-cell chi2 terms round to the 1e-6 grid and
    sum as DECIMAL(38,6) — exact, order-free — so the only raw-float
    ops are the per-cell expected-count divisions (identical IEEE
    inputs both engines) and the final sqrt.

    Scale: one count aggregation (cell-bounded) + broadcast totals.
    Output: (n, n_rows_cat, n_cols_cat, chi2, v) unrounded where noted.
    """
    obs = (
        df.filter(F.col(cat_a).isNotNull() & F.col(cat_b).isNotNull())
        .groupBy(F.col(cat_a).alias("a"), F.col(cat_b).alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    # the FULL r x c grid: zero cells contribute (0 - e)^2 / e and
    # omitting them understates chi2 (tested: a perfect 2x2 association
    # halves without them)
    cells = (
        obs.select("a").distinct()
        .crossJoin(obs.select("b").distinct())
        .join(obs, ["a", "b"], "left_outer")
        .select("a", "b", F.coalesce(F.col("o"), F.lit(0)).cast("bigint").alias("o"))
    )
    rowt = cells.groupBy("a").agg(F.sum("o").cast("bigint").alias("rt"))
    colt = cells.groupBy("b").agg(F.sum("o").cast("bigint").alias("ct"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("a").cast("bigint").alias("ra"),
        F.countDistinct("b").cast("bigint").alias("cb"),
    )
    j = (
        cells.join(F.broadcast(rowt), "a")
        .join(F.broadcast(colt), "b")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast(
        "double"
    )
    cell = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e, 6
    ).cast("decimal(38,6)")
    agg = j.groupBy("n", "ra", "cb").agg(F.sum(cell).alias("chi2d"))
    dof = F.least(F.col("ra") - 1, F.col("cb") - 1).cast("double")
    return agg.select(
        "n",
        F.col("ra").alias("n_rows_cat"),
        F.col("cb").alias("n_cols_cat"),
        F.col("chi2d").cast("double").alias("chi2"),
        F.sqrt(
            F.col("chi2d").cast("double") / (F.col("n").cast("double") * dof)
        ).alias("v"),
    )
