"""Embedding-vector transforms for similarity pipelines.

Beyond-reference operators (the reference engine has no vector ops):
deterministic random projection (Johnson-Lindenstrauss dimensionality
reduction) and L2 normalization, both as pure column expressions — no
shuffle, no UDF, the whole transform stays in whole-stage codegen.

Determinism contract (shared with operators.similarity): element
products are scaled to 1e12 fixed-point and summed as BIGINTs, so the
result is independent of addition order and bit-identical to the DuckDB
oracle.

Scale notes (100 TB): both operators are narrow per-row maps — zero
shuffle. Projecting 100 TB of 1024-dim vectors to 64 dims is one scan;
the out_dim x in_dim multiply-add loop runs inside codegen. Use
``random_projection`` in front of the ANN operators to cut their
shuffle width by in_dim/out_dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_server_spark.operators.scale import quote_ident

SCALE = 1_000_000_000_000  # matches operators.similarity fixed-point


def projection_signs(j: int, in_dim: int) -> list[int]:
    """Deterministic sparse projection column j: s(i, j) in {-1, 0, +1}
    (Achlioptas-style sparse JL matrix, 1/3 density each), derived from
    ``md5('proj:{i}:{j}')``'s first hex digit mod 3 — per-cell
    independent pseudo-randomness (the same scheme as
    ``similarity.hyperplane_signs``; an arithmetic formula like
    ``(31i + 17j) mod 3`` is linear, repeats every 3 columns, and
    collapses the projection to rank <= 3). Computed driver-side once
    per output dimension and embedded as literals, so the oracle
    reproduces the identical matrix."""
    import hashlib

    return [
        int(hashlib.md5(f"proj:{i}:{j}".encode()).hexdigest()[0], 16) % 3 - 1
        for i in range(in_dim)
    ]


def _sign_string(j: int, in_dim: int) -> str:
    """projection_signs encoded as '0'/'1'/'2' chars (sign + 1)."""
    return "".join(str(s + 1) for s in projection_signs(j, in_dim))


def random_projection(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    in_dim: int,
    out_dim: int,
) -> DataFrame:
    """Project ``vec_col`` (array<float>, length in_dim) to ``out_dim``
    via the deterministic sparse sign matrix ``projection_signs``:

        y_j = round( sum_i round(x_i * 1e12) * s(i, j) / 1e12 / sqrt(out_dim), 6)

    The 1/sqrt(out_dim) factor is the JL norm-preserving scaling. The
    two divisions are performed in that exact order (not a reciprocal
    multiply) so the float result is bit-identical to the SQL oracle.
    Output: (id, proj) with proj an array<double> of length out_dim.

    Plan shape: one expression per output index, each an ``aggregate``
    over the input elements with a BIGINT accumulator and the sign
    column embedded as a literal '0'/'1'/'2' string (the same
    literal-string indexing trick as ``similarity._codes_norms``) —
    a narrow projection, no shuffle, no UDF."""
    import math

    sd = math.sqrt(float(out_dim))
    vec = F.col(vec_col)

    def out_elem(j: int) -> Column:
        sstr = F.lit(_sign_string(j, in_dim))
        acc = F.aggregate(
            F.sequence(F.lit(0), F.lit(in_dim - 1)),
            F.lit(0).cast("bigint"),
            lambda a, i: a
            + F.round(F.element_at(vec, i + 1).cast("double") * SCALE).cast("bigint")
            * (F.substring(sstr, i + 1, F.lit(1)).cast("bigint") - 1),
        )
        return F.round(acc.cast("double") / SCALE / sd, 6)

    return df.select(
        F.col(id_col).alias("id"),
        F.array(*[out_elem(j) for j in range(out_dim)]).alias("proj"),
    )


def l2_normalize(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Unit-normalize ``vec_col``: x / ||x||, with the norm computed via
    the exact fixed-point sum of squares (order-independent). Zero
    vectors pass through unchanged (norm 0 guard). Output: (id, unit)
    rounded to 6 decimals per element."""
    vec = F.col(vec_col)
    ssq = F.aggregate(
        vec,
        F.lit(0).cast("bigint"),
        lambda a, x: a
        + F.round(x.cast("double") * x.cast("double") * SCALE).cast("bigint"),
    )
    # norm hoisted into its own projection so the per-element lambda
    # references a computed COLUMN: inlining the aggregate into the
    # transform body would re-evaluate it per element (O(dim^2)/row —
    # the HOF interpreter does no loop-invariant hoisting)
    with_norm = df.select(
        F.col(id_col).alias("id"),
        vec.alias("__v"),
        F.sqrt(ssq.cast("double") / SCALE).alias("__nrm"),
    )
    nrm = F.col("__nrm")
    return with_norm.select(
        "id",
        F.transform(
            F.col("__v"),
            lambda x: F.when(nrm == 0.0, x.cast("double")).otherwise(
                F.round(x.cast("double") / nrm, 6)
            ),
        ).alias("unit"),
    )


def covariance_moments(df: DataFrame, vec_col: str) -> DataFrame:
    """Exact raw second-moment matrix of an embedding corpus: one row
    per (i, j) with i <= j holding ``m = sum(round(v_i * v_j * 1e12))``
    (BIGINT, order-free) plus the scaled first-moment sums and count —
    everything a covariance needs, in ONE pass.

    Plan: explode dim -> per-(row, i) product slice v_i * v[i:] ->
    posexplode the triangle -> groupBy (i, j) with map-side combine.
    Shuffle volume is dim^2/2-bounded partial aggregates per task,
    independent of corpus size; at dim 64 that is 2080 cells.

    r14 MEASURED NEGATIVE (kept for the record): the in-row variant —
    one INLINE(FLATTEN(TRANSFORM(...))) building all dim*(dim+1)/2
    cells per row in place of the two chained POSEXPLODEs — returned
    IDENTICAL values but ran 1.5x SLOWER on the ABTT row (interleaved
    A/B at sf0.1: two-generate 1.874/2.004 min/med vs in-row
    2.901/2.987). Unlike the LSH-codes case there is no element
    SHUFFLE to remove here (the partial aggregates are dim^2-bounded
    either way), so the interpreted nested-lambda cost is pure loss
    against two whole-stage-codegen generators. The exploded form
    stays."""
    # SQL-string stages (r13): same operators, ~500 fewer py4j
    # round-trips per build.
    d = df.selectExpr(f"{quote_ident(vec_col)} AS v")
    ex = d.selectExpr("v", "POSEXPLODE(v) AS (i, vi)")
    tri = ex.selectExpr(
        "i",
        "CAST(vi AS DOUBLE) AS vi",
        "POSEXPLODE(SLICE(v, i + 1, SIZE(v))) AS (dj, vj)",
    )
    cells = tri.selectExpr(
        "i",
        "i + dj AS j",
        f"CAST(ROUND(vi * CAST(vj AS DOUBLE) * {SCALE}) AS BIGINT) AS __m",
        f"CASE WHEN dj = 0 THEN CAST(ROUND(vi * {SCALE}) AS BIGINT) "
        "ELSE 0 END AS __s",
        "CASE WHEN dj = 0 THEN 1 ELSE 0 END AS __n",
    )
    return cells.groupBy("i", "j").agg(
        F.expr("SUM(__m) AS m"),
        F.expr("SUM(__s) AS s_i"),
        F.expr("CAST(SUM(__n) AS BIGINT) AS n_i"),
    )


def top_component_power(
    moments: DataFrame, dim: int, iterations: int = 12
) -> DataFrame:
    """Top principal component of the covariance implied by
    ``covariance_moments`` via POWER ITERATION with a fixed iteration
    count — deterministic (repr-rounded matvecs, DECIMAL sums) and
    therefore fully unrollable into a SQL oracle, converged or not.

    cov_ij = m_ij/(n*1e12) - mu_i*mu_j with mu from the scaled sums —
    pure double arithmetic on identical integers, engine-exact.
    Output: (i, mu, comp, eigenvalue) — component round 6, unit norm;
    the sign fixes to make the largest-|value| entry positive (ties to
    the lower index), so the output is orientation-stable.

    Bounded-state fold (r8): the corpus-scale work already happened in
    ``covariance_moments`` (one pass, dim^2/2-bounded output). The r7
    shape then ran each power step as checkpointed join+agg stages —
    47 driver-scheduled jobs whose scheduling overhead was ~70% of the
    ABTT query's wall time (profiled: loop 3.9 s / 47 jobs at sf0.1).
    The moment cells are dim^2-bounded by the embedding dimensionality
    (a model constant — 64 here, <= a few thousand anywhere), so fold
    them into ONE row (dense row-major matrix as array<array<double>>)
    and run every matvec / norm / update as JVM higher-order-function
    expressions: one job, zero loop shuffles. Arithmetic is IDENTICAL
    to the staged form (round(double, 8) per term, exact DECIMAL
    accumulation — decimal addition is associative, so aggregate()
    matches SUM()), keeping the unrolled SQL oracle byte-identical.
    """
    # fold the i<=j triangle into one sorted row-major array
    row = moments.agg(
        F.array_sort(
            F.collect_list(F.struct("i", "j", "m", "s_i", "n_i"))
        ).alias("cells")
    )
    # Positional-indexing guard (r9): the cov build below computes a
    # POSITION in the (i, j)-sorted cells array and mu indexes diag by
    # position, so a gap in the triangle (ragged/short embedding arrays
    # upstream) would silently misalign every later cell. Require the
    # dense contiguous grid — size == dc*(dc+1)/2, diag dims == 0..dc-1,
    # and dc pinned to the caller's dim (a UNIFORMLY truncated triangle
    # is still a dense grid) — and raise loudly otherwise. r13: these
    # pre-loop stages are SQL-string selectExpr (same parsed operators,
    # ~2000 fewer py4j round-trips per build).
    row = row.selectExpr("cells", "FILTER(cells, c -> c.i = c.j) AS diag")
    row = row.selectExpr("cells", "diag", "SIZE(diag) AS dc")
    _err = (
        "top_component_power: moments triangle is ragged — "
        "expected a dense i<=j grid over contiguous dims"
    )
    _tri_ok = (
        f"(((SIZE(cells) * 2) = (dc * (dc + 1))) AND (dc = {int(dim)})) AND "
        "(CASE WHEN dc = 0 THEN TRUE ELSE "
        "TRANSFORM(diag, c -> CAST(c.i AS BIGINT)) = "
        "SEQUENCE(CAST(0 AS BIGINT), CAST(dc - 1 AS BIGINT)) END)"
    )
    row = row.selectExpr(
        f"CASE WHEN {_tri_ok} THEN cells ELSE RAISE_ERROR('{_err}') END AS cells",
        "diag",
        "dc",
    )
    _dbl_scale = f"CAST({SCALE} AS DOUBLE)"
    row = row.selectExpr(
        "cells",
        "diag",
        "dc",
        f"TRANSFORM(diag, c -> CAST(c.s_i AS DOUBLE) / "
        f"(CAST(c.n_i AS DOUBLE) * {_dbl_scale})) AS mu",
    )
    # dense cov matrix: triangle cell (lo, hi) sits at 1-based index
    # lo*dc - lo*(lo-1)/2 + (hi-lo) + 1 in the (i, j)-sorted array
    _tri_m = (
        "ELEMENT_AT(cells, CAST(LEAST(i, j) * dc - "
        "CAST(LEAST(i, j) * (LEAST(i, j) - 1) AS BIGINT) / 2 + "
        "(GREATEST(i, j) - LEAST(i, j)) + 1 AS INT)).m"
    )
    row = row.selectExpr(
        "diag",
        "dc",
        "mu",
        f"TRANSFORM(SEQUENCE(0, dc - 1), i -> TRANSFORM(SEQUENCE(0, dc - 1), "
        f"j -> CAST({_tri_m} AS DOUBLE) / "
        f"(CAST(ELEMENT_AT(diag, CAST(i + 1 AS INT)).n_i AS DOUBLE) * {_dbl_scale}) "
        f"- ELEMENT_AT(mu, CAST(i + 1 AS INT)) * ELEMENT_AT(mu, CAST(j + 1 AS INT))"
        f")) AS cov",
    )
    # deterministic non-degenerate init: x_i = round8(1/sqrt(dim))
    row = row.selectExpr(
        "mu",
        "dc",
        "cov",
        f"TRANSFORM(SEQUENCE(0, dc - 1), t -> ROUND({1.0 / dim ** 0.5!r}D, 8)) AS x",
    )
    # NOTE: y is consumed by BOTH nrm and the x update, so Catalyst's
    # CollapseProject cannot inline it into per-element lookups (the
    # single-reference inlining is an exponential-evaluation trap —
    # measured and documented in graph._pagerank_folded). r13: the loop
    # body is SQL-string selectExpr stages — the Column-lambda form cost
    # ~600 py4j round-trips per iteration (~7200/build, the dominant
    # share of the ABTT row's wall). Each stage lists its passthrough
    # columns explicitly so every expensive alias (x into y's lambda, y
    # into nrm, nrm into the x update) keeps >= 2 references at the
    # collapse boundary, exactly like the old withColumn passthroughs;
    # the parsed operators and DECIMAL/rounding arithmetic are identical,
    # keeping the unrolled SQL oracle byte-identical.
    dec0 = "CAST(0 AS DECIMAL(37,8))"
    y_sql = (
        f"TRANSFORM(cov, r -> CAST(AGGREGATE(ZIP_WITH(r, x, (c, xv) -> "
        f"CAST(ROUND(c * xv, 8) AS DECIMAL(28,8))), {dec0}, "
        f"(acc, t) -> CAST(acc + t AS DECIMAL(37,8))) AS DOUBLE))"
    )
    nrm_sql = (
        f"SQRT(CAST(AGGREGATE(y, CAST(0 AS BIGINT), (acc, v) -> "
        f"acc + CAST(ROUND((v * v) * CAST({SCALE} AS DOUBLE)) AS BIGINT)) "
        f"AS DOUBLE) / CAST({SCALE} AS DOUBLE))"
    )
    for _ in range(iterations):
        row = row.selectExpr("mu", "cov", "dc", "x", f"{y_sql} AS y")
        row = row.selectExpr("mu", "cov", "dc", "y", f"{nrm_sql} AS nrm")
        row = row.selectExpr(
            "mu", "cov", "dc", "y", "nrm",
            "TRANSFORM(y, v -> ROUND(v / nrm, 8)) AS x",
        )
    # Rayleigh quotient lambda = x' C x (x unit up to rounding); the
    # nested exact-DECIMAL sums regroup the original flat SUM — decimal
    # addition is associative, so the value is unchanged
    row = row.selectExpr(
        "mu", "dc", "x", "cov",
        f"CAST(AGGREGATE(ZIP_WITH(cov, x, (r, xi) -> "
        f"AGGREGATE(ZIP_WITH(r, x, (c, xj) -> "
        f"CAST(ROUND((xi * c) * xj, 8) AS DECIMAL(28,8))), {dec0}, "
        f"(a, t) -> CAST(a + t AS DECIMAL(37,8)))), {dec0}, "
        f"(a, v) -> CAST(a + v AS DECIMAL(37,8))) AS DOUBLE) AS lam",
    )
    # orientation: flip so the max-|x| entry (ties -> lower i) is positive
    row = row.selectExpr(
        "mu",
        "dc",
        "x",
        "lam",
        "CASE WHEN ARRAY_MAX(TRANSFORM(x, (v, i) -> "
        "STRUCT(ABS(v) AS a, -i AS ni, v AS x))).x < 0 "
        "THEN -1.0D ELSE 1.0D END AS flip",
    )
    out = row.selectExpr(
        "EXPLODE(TRANSFORM(SEQUENCE(0, dc - 1), i -> STRUCT("
        "CAST(i AS BIGINT) AS i, "
        "ROUND(ELEMENT_AT(mu, CAST(i + 1 AS INT)), 6) AS mu, "
        "ROUND(ELEMENT_AT(x, CAST(i + 1 AS INT)) * flip, 6) AS comp, "
        "ROUND(lam, 6) AS eigenvalue))) AS r"
    )
    return out.select("r.i", "r.mu", "r.comp", "r.eigenvalue")


def remove_top_component(
    df: DataFrame, vec_col: str, id_col: str, component: DataFrame
) -> DataFrame:
    """All-But-The-Top (Mu & Viswanath 2018, arXiv:1702.01417) common-
    component removal: subtract each embedding's projection onto the
    corpus top principal direction, then L2-renormalize — the standard
    post-processing that makes cosine retrieval sharper when one
    dominant direction carries corpus-wide (non-semantic) variance.

    ``component`` is ``top_component_power`` output (dim rows,
    broadcast as ONE plan-embedded array row). Exact scaled-long dot
    products; projection coefficient and corrected norm round to 6.
    Output: (id, proj_coeff, corrected_norm, corrected array<double>
    round 6)."""
    comp_row = component.agg(
        F.array_sort(F.collect_list(F.struct("i", "comp"))).alias("cs")
    ).select(F.transform("cs", lambda s: s["comp"]).alias("carr"))
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).crossJoin(F.broadcast(comp_row))
    # r13: SQL-string stages (same operators, ~700 fewer py4j round
    # trips per build); each expensive alias keeps >= 2 references at
    # the collapse boundary, exactly like the old withColumn chain.
    proj_sql = (
        f"ROUND(CAST(AGGREGATE(ZIP_WITH(v, carr, (a, b) -> "
        f"CAST(ROUND(CAST(a AS DOUBLE) * b * {SCALE}) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, t) -> acc + t) AS DOUBLE) / {SCALE}, 8)"
    )
    norm_sql = (
        f"SQRT(CAST(AGGREGATE(TRANSFORM(__c, a -> "
        f"CAST(ROUND(a * a * {SCALE}) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, t) -> acc + t) AS DOUBLE) / {SCALE})"
    )
    return (
        base.selectExpr("id", "v", "carr", f"{proj_sql} AS __p")
        .selectExpr(
            "id",
            "__p",
            "ZIP_WITH(v, carr, (a, b) -> CAST(a AS DOUBLE) - __p * b) AS __c",
        )
        .selectExpr("id", "__p", "__c", f"{norm_sql} AS __n")
        .selectExpr(
            "id",
            "ROUND(__p, 6) AS proj_coeff",
            "ROUND(__n, 6) AS corrected_norm",
            "TRANSFORM(__c, a -> ROUND(CASE WHEN __n > 0 THEN a / __n "
            "ELSE 0.0D END, 6)) AS corrected",
        )
    )
