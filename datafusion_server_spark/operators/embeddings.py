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
    independent of corpus size; at dim 64 that is 2080 cells."""
    d = df.select(F.col(vec_col).alias("v"))
    ex = d.select("v", F.posexplode("v").alias("i", "vi"))
    tri = ex.select(
        "i",
        F.col("vi").cast("double").alias("vi"),
        F.posexplode(
            F.slice(F.col("v"), F.col("i") + 1, F.size("v"))
        ).alias("dj", "vj"),
    )
    cells = tri.select(
        "i",
        (F.col("i") + F.col("dj")).alias("j"),
        F.round(F.col("vi") * F.col("vj").cast("double") * SCALE)
        .cast("bigint")
        .alias("__m"),
        F.when(F.col("dj") == 0, F.round(F.col("vi") * SCALE).cast("bigint"))
        .otherwise(F.lit(0))
        .alias("__s"),
        F.when(F.col("dj") == 0, F.lit(1)).otherwise(F.lit(0)).alias("__n"),
    )
    return cells.groupBy("i", "j").agg(
        F.sum("__m").alias("m"),
        F.sum("__s").alias("s_i"),
        F.sum("__n").cast("bigint").alias("n_i"),
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
    row = row.withColumn(
        "diag", F.filter(F.col("cells"), lambda c: c["i"] == c["j"])
    )
    row = row.withColumn("dc", F.size("diag"))
    # Positional-indexing guard (r9): _tri below computes a POSITION in
    # the (i, j)-sorted cells array and mu indexes diag by position, so
    # a gap in the triangle (ragged/short embedding arrays upstream)
    # would silently misalign every later cell. Require the dense
    # contiguous grid — size == dc*(dc+1)/2 and diag dims == 0..dc-1 —
    # and raise loudly otherwise (the join-based form degraded
    # gracefully by key; the fold must not degrade silently).
    _dc = F.col("dc")
    _tri_ok = (
        (F.size("cells") * 2 == _dc * (_dc + 1))
        # r9 self-review: a UNIFORMLY truncated triangle (all embeddings
        # shorter than `dim`) is still a dense grid and passed the two
        # structural checks — pin the inferred dimension to the caller's
        & (_dc == F.lit(int(dim)))
        & (
            F.when(_dc == 0, F.lit(True)).otherwise(
                F.transform(F.col("diag"), lambda c: c["i"].cast("bigint"))
                == F.sequence(F.lit(0).cast("bigint"), (_dc - 1).cast("bigint"))
            )
        )
    )
    row = row.withColumn(
        "cells",
        F.when(_tri_ok, F.col("cells")).otherwise(
            F.raise_error(
                F.lit(
                    "top_component_power: moments triangle is ragged — "
                    "expected a dense i<=j grid over contiguous dims"
                )
            )
        ),
    )
    row = row.withColumn(
        "mu",
        F.transform(
            F.col("diag"),
            lambda c: c["s_i"].cast("double")
            / (c["n_i"].cast("double") * F.lit(float(SCALE))),
        ),
    )
    # dense cov matrix: triangle cell (lo, hi) sits at 1-based index
    # lo*dc - lo*(lo-1)/2 + (hi-lo) + 1 in the (i, j)-sorted array
    dc = F.col("dc")
    idx0 = F.sequence(F.lit(0), dc - 1)

    def _tri(i: Column, j: Column) -> Column:
        lo, hi = F.least(i, j), F.greatest(i, j)
        pos = lo * dc - (lo * (lo - 1)).cast("bigint") / 2 + (hi - lo) + 1
        return F.element_at(F.col("cells"), pos.cast("int"))

    row = row.withColumn(
        "cov",
        F.transform(
            idx0,
            lambda i: F.transform(
                idx0,
                lambda j: _tri(i, j)["m"].cast("double")
                / (
                    F.element_at(F.col("diag"), (i + 1).cast("int"))[
                        "n_i"
                    ].cast("double")
                    * F.lit(float(SCALE))
                )
                - F.element_at(F.col("mu"), (i + 1).cast("int"))
                * F.element_at(F.col("mu"), (j + 1).cast("int")),
            ),
        ),
    )
    # deterministic non-degenerate init: x_i = round8(1/sqrt(dim))
    row = row.withColumn(
        "x", F.transform(idx0, lambda _: F.round(F.lit(1.0 / dim**0.5), 8))
    )
    dec0 = F.lit(0).cast("decimal(37,8)")
    big0 = F.lit(0).cast("bigint")
    # NOTE: y is consumed by BOTH nrm and the x update, so Catalyst's
    # CollapseProject cannot inline it into per-element lookups (the
    # single-reference inlining is an exponential-evaluation trap —
    # measured and documented in graph._pagerank_folded)
    for _ in range(iterations):
        row = row.withColumn(
            "y",
            F.transform(
                F.col("cov"),
                lambda r: F.aggregate(
                    F.zip_with(
                        r,
                        F.col("x"),
                        lambda c, xv: F.round(c * xv, 8).cast("decimal(28,8)"),
                    ),
                    dec0,
                    lambda acc, t: (acc + t).cast("decimal(37,8)"),
                ).cast("double"),
            ),
        )
        row = row.withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.col("y"),
                    big0,
                    lambda acc, v: acc
                    + F.round(v * v * F.lit(float(SCALE))).cast("bigint"),
                ).cast("double")
                / F.lit(float(SCALE))
            ),
        )
        row = row.withColumn(
            "x",
            F.transform(F.col("y"), lambda v: F.round(v / F.col("nrm"), 8)),
        )
    # Rayleigh quotient lambda = x' C x (x unit up to rounding); the
    # nested exact-DECIMAL sums regroup the original flat SUM — decimal
    # addition is associative, so the value is unchanged
    row = row.withColumn(
        "lam",
        F.aggregate(
            F.zip_with(
                F.col("cov"),
                F.col("x"),
                lambda r, xi: F.aggregate(
                    F.zip_with(
                        r,
                        F.col("x"),
                        lambda c, xj: F.round(xi * c * xj, 8).cast(
                            "decimal(28,8)"
                        ),
                    ),
                    dec0,
                    lambda a, t: (a + t).cast("decimal(37,8)"),
                ),
            ),
            dec0,
            lambda a, v: (a + v).cast("decimal(37,8)"),
        ).cast("double"),
    )
    # orientation: flip so the max-|x| entry (ties -> lower i) is positive
    row = row.withColumn(
        "flip",
        F.when(
            F.array_max(
                F.transform(
                    F.col("x"),
                    lambda v, i: F.struct(
                        F.abs(v).alias("a"), (-i).alias("ni"), v.alias("x")
                    ),
                )
            )["x"]
            < 0,
            F.lit(-1.0),
        ).otherwise(F.lit(1.0)),
    )
    out = row.select(
        F.explode(
            F.transform(
                idx0,
                lambda i: F.struct(
                    i.cast("bigint").alias("i"),
                    F.round(
                        F.element_at(F.col("mu"), (i + 1).cast("int")), 6
                    ).alias("mu"),
                    F.round(
                        F.element_at(F.col("x"), (i + 1).cast("int"))
                        * F.col("flip"),
                        6,
                    ).alias("comp"),
                    F.round(F.col("lam"), 6).alias("eigenvalue"),
                ),
            )
        ).alias("r")
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
    proj = F.round(
        F.aggregate(
            F.zip_with(
                "v",
                "carr",
                lambda a, b: F.round(a.cast("double") * b * SCALE).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + t,
        ).cast("double")
        / SCALE,
        8,
    )
    corrected = F.zip_with(
        "v", "carr", lambda a, b: a.cast("double") - F.col("__p") * b
    )
    with_p = base.withColumn("__p", proj).withColumn("__c", corrected)
    norm = F.sqrt(
        F.aggregate(
            F.transform(
                "__c", lambda a: F.round(a * a * SCALE).cast("bigint")
            ),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + t,
        ).cast("double")
        / SCALE
    )
    return with_p.withColumn("__n", norm).select(
        "id",
        F.round(F.col("__p"), 6).alias("proj_coeff"),
        F.round(F.col("__n"), 6).alias("corrected_norm"),
        F.transform(
            "__c",
            lambda a: F.round(
                F.when(F.col("__n") > 0, a / F.col("__n")).otherwise(F.lit(0.0)), 6
            ),
        ).alias("corrected"),
    )
