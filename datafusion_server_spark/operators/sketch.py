"""Deterministic mergeable sketches: KMV cardinality, Count-Min
frequency (+ exact heavy-hitter companion), and fixed-bin histograms.

Beyond-reference operator. The engine already exposes Spark's native
HyperLogLog++ (``approx_count_distinct_sketch`` — rows-only check, the
sketch values are engine-specific). KMV is the complementary sketch with
a fully DETERMINISTIC definition: the estimate is a pure function of the
k smallest md5 values of the key set, so Spark and the DuckDB oracle
reproduce it bit-for-bit — an oracle-checkable approximate-distinct.

Estimator (Bar-Yossef et al. 2002): with h uniform on [0,1) and h_(k)
the k-th smallest hash over the distinct keys, E[h_(k)] ~ k/(n+1), so
``n_hat = (k-1)/h_(k)``. When fewer than k distinct keys exist the count
is exact.

Scale notes (100 TB): the heavy reduction is the distinct-(group, hash)
aggregation — one shuffle with map-side partial dedup. The per-group
top-k window then runs on ~distinct-cardinality rows, and only k rows
per group survive into the final aggregate. Sketches merge by unioning
hash sets and re-taking the k minima, so partial sketches from
independent partitions/days combine without rescanning (the property
that makes KMV a streaming/incremental-rollup citizen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 15 hex digits = 60 bits: fits a BIGINT exactly in both engines, and
# 16^15 is a power of two, exactly representable as a double.
_HEX_DIGITS = 15
_HEX_SPAN = float(16**_HEX_DIGITS)


def kmv_estimate_from_hashes(
    hashed: DataFrame,
    group_cols: list[str],
    k: int,
) -> DataFrame:
    """Finish a KMV sketch from an (possibly over-complete) hash stream:
    per group, take the k smallest DISTINCT md5 hex values in column
    ``h`` and apply the Bar-Yossef estimator. Accepts any superset of
    the final k-min set (extra later-evicted hashes are re-filtered by
    the ranking) — the property that lets the streaming emitter append
    retained hashes incrementally. Output: (*group_cols, kmv_estimate
    DOUBLE, n_hashes BIGINT)."""
    distinct = hashed.select(*group_cols, "h").distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    kept = distinct.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = kept.groupBy(*group_cols).agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("bigint").alias("n_hashes"),
    )
    frac = F.conv(F.substring("h_k", 1, _HEX_DIGITS), 16, 10).cast("bigint") / F.lit(
        _HEX_SPAN
    )
    return agg.select(
        *group_cols,
        F.round(
            F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
                (F.lit(float(k - 1))) / frac
            ),
            6,
        ).alias("kmv_estimate"),
        "n_hashes",
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate. Output: (*group_cols,
    kmv_estimate DOUBLE, n_hashes BIGINT) where n_hashes = min(k,
    distinct) is the retained sketch size.

    Hash = md5 of the key as a string (identical in Spark and DuckDB);
    the fraction is the first 15 hex digits scaled by 16^-15.
    """
    hashed = df.select(
        *group_cols, F.md5(F.col(key_col).cast("string")).alias("h")
    )
    return kmv_estimate_from_hashes(hashed, group_cols, k)


def _cm_buckets(key: Column, depth: int, width: int) -> Column:
    """The Count-Min hash row: bucket_j = (first 8 hex chars of
    md5('{j}:' || key)) mod width, for j in 0..depth-1, as an array.
    ONE definition shared by build and probe — the sketch contract
    (estimates are upper bounds) holds only while both sides hash
    identically, so neither site may drift."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), key)), 1, 8), 16, 10
                ).cast("bigint")
                % width
            )
            for j in range(depth)
        ]
    )


def countmin_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): a depth x width
    grid of counters; row j increments cell ``h_j(key) = (first 8 hex
    chars of md5('{j}:' || key)) mod width``. Output: (j BIGINT, bucket
    BIGINT, cnt BIGINT) — only non-empty cells are materialized.

    Deterministic md5 bucketing makes the sketch oracle-checkable, and
    fixed (depth, width) makes it MERGEABLE: partial sketches from any
    partitioning/day combine by summing cells (same contract as the
    histogram sketch). Scale shape: one map-side-combined groupBy whose
    shuffle carries at most depth*width rows per mapper regardless of
    input size."""
    key = F.col(key_col).cast("string")
    rows = df.select(F.posexplode(_cm_buckets(key, depth, width)).alias("j", "bucket"))
    return (
        rows.groupBy(F.col("j").cast("bigint").alias("j"), "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a Count-Min sketch: for each query
    key, ``min over j of cell[j][h_j(key)]`` (absent cells read 0).
    Output: (key, cm_estimate BIGINT) — an upper bound on the true
    count, within eN/width with probability 1-(1/2)^depth.

    The query side is tiny (a handful of keys); the sketch side is at
    most depth*width cells — the join broadcasts whichever is smaller
    and never touches the original data."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.posexplode(_cm_buckets(key, depth, width)).alias("j", "bucket"),
    ).select("key", F.col("j").cast("bigint").alias("j"), "bucket")
    joined = probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return (
        joined.groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cm_estimate"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """Exact top-k most frequent keys per group — the ground-truth
    companion to the Count-Min estimate. Output: (*group_cols, key,
    cnt BIGINT, rank BIGINT), rank by count desc then key asc (the
    deterministic tie-break).

    Scale shape: the first groupBy is map-side combined (shuffle carries
    one row per distinct (group, key) per mapper); the top-k window then
    runs on the aggregated — already small — stream. For extreme
    cardinality use ``countmin_sketch`` + a candidate pass instead."""
    counted = df.groupBy(*group_cols, F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def quantiles_disc(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: list[float],
) -> DataFrame:
    """EXACT discrete quantiles per group (percentile_disc semantics):
    the value at 1-based rank ``ceil(q * n)`` of the group's sorted
    values — pure selection, no interpolation arithmetic, so both
    engines agree bit-for-bit on any input doubles. The ground truth
    the histogram-sketch estimates approximate.
    Output: (*group_cols, q DOUBLE, value DOUBLE).

    The rank is computed in EXACT integer arithmetic: each q becomes a
    driver-side Fraction num/den, and ceil(q*n) = (num*n + den-1 -
    remainder)/den with BIGINT ops only — float ``ceil(q * n)`` is off
    by one whenever q*n lands epsilon above an integer (0.07 * 100 =
    7.000000000000001 in IEEE doubles selects rank 8, not 7). q <= 0
    clamps to rank 1 (the minimum), q = 1 is the maximum.

    Scale shape: one shuffle to rank within groups (window), then a
    broadcast join against the tiny q list; per-group sort is the
    unavoidable cost of exact quantiles — use ``histogram_sketch`` +
    ``histogram_quantiles`` when approximate is acceptable."""
    from fractions import Fraction

    spark = df.sparkSession
    ranked = df.select(
        *group_cols, F.col(value_col).cast("double").alias("value")
    ).select(
        *group_cols,
        "value",
        F.row_number().over(
            Window.partitionBy(*group_cols).orderBy(F.col("value").asc())
        ).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*group_cols)).alias("n"),
    )
    fracs = [(float(q), *Fraction(str(q)).as_integer_ratio()) for q in qs]
    qdf = F.broadcast(
        spark.createDataFrame(fracs, "q double, num bigint, den bigint")
    )
    x = F.col("num") * F.col("n") + F.col("den") - 1
    k = F.greatest((x - x % F.col("den")) / F.col("den"), F.lit(1)).cast("bigint")
    return (
        ranked.join(qdf, F.col("rn") == k)
        .select(*group_cols, "q", "value")
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Fixed-bin equi-width histogram — the mergeable quantile summary.

    Bin boundaries are FIXED by (lo, hi, bins), not data-derived, which
    is what makes the sketch mergeable: partial histograms from any
    partitioning, day, or dataset combine by summing bin counts — no
    re-scan (the same property as KMV; contrast a sampled t-digest whose
    centroids are run-dependent). Out-of-range values clamp into the
    edge bins. Output: (bin BIGINT, n BIGINT). One map-side-combined
    groupBy — a single shuffle of at most ``bins`` rows per mapper.
    """
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) * bins / F.lit(float(hi) - float(lo)))
    # clamp in the BIGINT domain floor() returns — a narrowing int cast
    # would WRAP on extreme outliers and land them in the wrong edge bin
    bin_col = F.least(
        F.lit(bins - 1).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), raw)
    )
    return (
        df.groupBy(bin_col.cast("bigint").alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    qs: list[float],
) -> DataFrame:
    """Quantile estimates from a fixed-bin histogram sketch: for each q,
    find the bin where the cumulative count crosses q*total and linearly
    interpolate inside it. Output: (q DOUBLE, estimate DOUBLE).

    All arithmetic is plain double ops in a fixed order, so the DuckDB
    oracle reproduces the estimates bit-for-bit. The per-bin cumulative
    window runs over at most ``bins`` rows — negligible at any scale.
    """
    spark = sketch.sparkSession
    width = (float(hi) - float(lo)) / bins
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin",
        "n",
        F.sum("n").over(w).alias("cum"),
        (F.sum("n").over(w) - F.col("n")).alias("prev_cum"),
    )
    total = F.broadcast(sketch.agg(F.sum("n").cast("bigint").alias("__total")))
    qdf = F.broadcast(
        spark.createDataFrame([(float(q),) for q in qs], "q double")
    )
    hit = (
        cum.crossJoin(total)
        .crossJoin(qdf)
        .withColumn("target", F.col("q") * F.col("__total"))
        .filter(
            (
                (F.col("prev_cum").cast("double") < F.col("target"))
                & (F.col("cum").cast("double") >= F.col("target"))
            )
            # q=0 (target 0): the crossing condition above can never hold
            # (prev_cum < 0 is false) — define the estimate as the start
            # of the first non-empty bin (the interpolation term is 0)
            | (
                (F.col("target") == 0.0)
                & (F.col("prev_cum") == 0)
                & (F.col("n") > 0)
            )
        )
    )
    est = (
        F.lit(float(lo))
        + (
            F.col("bin").cast("double")
            + (F.col("target") - F.col("prev_cum").cast("double"))
            / F.col("n").cast("double")
        )
        * F.lit(width)
    )
    return hit.select("q", F.round(est, 6).alias("estimate"))


# -- deterministic HyperLogLog --------------------------------------------
#
# Spark's native HLL++ stays registered (approx_count_distinct_sketch,
# rows-only — its register values are engine-internal). This is the
# DETERMINISTIC counterpart: classic Flajolet HLL over the md5 60-bit
# hash already used by KMV, so every register value — and therefore the
# estimate — is a pure function of the key set that both engines (and a
# sequential replay) reproduce bit-for-bit.
#
# Register math is ALL integer: bucket = top b bits of the 60-bit hash,
# rho = leading zeros of the remaining (60-b)-bit tail + 1 (via
# length(bin(tail)), identical in Spark and DuckDB), M_j = max rho per
# bucket; the harmonic sum uses scaled longs 2^(53 - M_j) (M_j <= 53,
# exact, order-independent). Only the final division and the
# linear-counting ln are floats, both rounded.

_HLL_B = 8  # m = 256 registers
_HLL_M = 1 << _HLL_B
_HLL_TAIL_BITS = 60 - _HLL_B
# alpha_m * m^2 * 2^53 embedded as ONE double literal on both sides
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
HLL_NUMERATOR = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 53)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """(*group_cols, bucket, m_j): the dense part of the register
    vector (absent buckets are register 0 — the estimator accounts for
    them arithmetically instead of materializing m rows per group).
    Mergeable: max of registers across shards/periods."""
    h60 = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, _HEX_DIGITS), 16, 10).cast(
        "bigint"
    )
    bucket = F.shiftright(h60, _HLL_TAIL_BITS)
    tail = h60.bitwiseAND(F.lit((1 << _HLL_TAIL_BITS) - 1))
    rho = F.when(tail == 0, F.lit(_HLL_TAIL_BITS + 1)).otherwise(
        _HLL_TAIL_BITS - F.length(F.bin(tail)) + 1
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("bigint").alias("m_j"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers -> cardinality estimate with the standard small-range
    linear-counting correction. Output: (*group_cols, hll_estimate
    DOUBLE rounded to 4, n_registers BIGINT)."""
    # shiftleft's bit count must be an expression here (it varies per
    # row) — the Python API only takes an int, so go through SQL
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), cast(53 - m_j as int))")).alias(
            "__s_present"
        ),
        F.count(F.lit(1)).cast("bigint").alias("__present"),
    )
    # absent buckets are register 0: each contributes 2^53 to the scaled
    # harmonic sum and counts as an empty register for linear counting
    s = F.col("__s_present") + (F.lit(_HLL_M) - F.col("__present")) * F.lit(
        1 << 53
    ).cast("bigint")
    v = F.lit(_HLL_M) - F.col("__present")
    raw = F.lit(HLL_NUMERATOR) / s.cast("double")
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (v > 0),
        F.round(F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v.cast("double")), 4),
    ).otherwise(F.round(raw, 4))
    return agg.select(
        *group_cols,
        est.alias("hll_estimate"),
        F.col("__present").alias("n_registers"),
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Deterministic HLL approximate-distinct per group. Scale shape:
    ONE map-side-combined aggregation to (group, bucket) registers —
    at most m rows per group out of every mapper — then a group-level
    reduce; identical to the shape Spark's own HLL++ uses, but
    oracle-checkable."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)


# -- deterministic Bloom filter -------------------------------------------
#
# The join-pruning sketch: build a compact membership summary of a key
# set (e.g. "user_ids seen in the flagged partition"), broadcast it, and
# pre-filter a much larger stream before the real join — the same idea
# Spark's runtime bloom-filter join injects, here as an explicit,
# mergeable, ORACLE-CHECKABLE operator (register words OR together).
# All math is integer (md5 -> k positions -> 64-bit words), so DuckDB
# reproduces every word and every membership verdict.


def _bloom_positions(key, m: int, k: int):
    """k deterministic bit positions for a key: md5('{i}:{key}') mod m."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, _HEX_DIGITS
            ),
            16,
            10,
        ).cast("bigint")
        % m
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    m: int = 1024,
    k: int = 4,
) -> DataFrame:
    """(*group_cols, word, bits): the non-zero 64-bit words of each
    group's m-bit Bloom filter. Mergeable: OR words across shards.
    Scale: one explode (k rows per key) into one map-side-combined
    bit_or aggregation — output bounded by m/64 rows per group."""
    pos = df.select(
        *group_cols,
        F.explode(F.array(*_bloom_positions(F.col(key_col), m, k))).alias("__pos"),
    )
    return (
        pos.select(
            *group_cols,
            (F.col("__pos") / 64).cast("bigint").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(__pos % 64 as int))").alias(
                "__mask"
            ),
        )
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    m: int = 1024,
    k: int = 4,
) -> DataFrame:
    """Membership check of ``probes`` (*group_cols, key_col) against a
    built filter: TRUE iff all k bits are set (possibly-present — Bloom
    semantics admit false positives, never false negatives). A missing
    word row means a zero word: that bit is absent. Output: probes +
    ``might_contain`` BOOLEAN."""
    pos = probes.select(
        *group_cols,
        F.col(key_col),
        F.posexplode(F.array(*_bloom_positions(F.col(key_col), m, k))).alias(
            "__i", "__pos"
        ),
    ).select(
        *group_cols,
        key_col,
        (F.col("__pos") / 64).cast("bigint").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(__pos % 64 as int))").alias(
            "__mask"
        ),
    )
    joined = pos.join(F.broadcast(bloom), [*group_cols, "word"], "left").select(
        *group_cols,
        key_col,
        (
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__mask"))
            == F.col("__mask")
        ).alias("__hit"),
    )
    return joined.groupBy(*group_cols, key_col).agg(
        F.min(F.col("__hit").cast("int")).cast("boolean").alias("might_contain")
    )


def kmv_set_estimates(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    *,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch-style SET-OPERATION estimates from KMV sketches:
    distinct cardinality of the UNION, the Jaccard similarity, and the
    INTERSECTION of two key sets — without materializing either
    (Beyer et al. 2007: the k smallest hashes of A u B are a uniform
    sample of its distinct keys, so the fraction of them present in
    both sides estimates the Jaccard, and intersection = jaccard x
    union). Output: ONE row (union_est, jaccard_est, intersect_est,
    n_hashes).

    Exact when the union has fewer than k distinct keys. All math is
    the deterministic md5/KMV contract — oracle-reproducible.

    Scale: one distinct-hash aggregation per side (map-side combined),
    a distributed k-smallest selection (``orderBy.limit(k)`` compiles to
    TakeOrderedAndProject — per-partition k-row heaps, one
    k*partitions-row merge; NOT a single-partition window over every
    distinct hash of the union), two broadcast membership joins on the
    k surviving rows."""
    ha = df_a.select(F.md5(F.col(key_col).cast("string")).alias("h")).distinct()
    hb = df_b.select(F.md5(F.col(key_col).cast("string")).alias("h")).distinct()
    union = ha.unionByName(hb).distinct()
    kmin = union.orderBy(F.col("h").asc()).limit(int(k))
    flagged = (
        kmin.join(ha.select(F.col("h"), F.lit(1).alias("__a")), "h", "left")
        .join(hb.select(F.col("h"), F.lit(1).alias("__b")), "h", "left")
    )
    agg = flagged.agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("bigint").alias("n_hashes"),
        F.sum(
            ((F.col("__a").isNotNull()) & (F.col("__b").isNotNull())).cast("bigint")
        ).cast("bigint").alias("n_both"),
    )
    frac = F.conv(F.substring("h_k", 1, _HEX_DIGITS), 16, 10).cast("bigint") / F.lit(
        _HEX_SPAN
    )
    union_est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    jac = F.round(
        F.col("n_both").cast("double") / F.col("n_hashes").cast("double"), 6
    )
    return agg.select(
        F.round(union_est, 6).alias("union_est"),
        jac.alias("jaccard_est"),
        F.round(jac * F.round(union_est, 6), 6).alias("intersect_est"),
        "n_hashes",
    )
