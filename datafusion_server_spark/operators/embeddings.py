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
