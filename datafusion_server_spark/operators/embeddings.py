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


def projection_sign(i: int | Column, j: int | Column) -> Column:
    """Deterministic sparse projection entry s(i, j) in {-1, 0, +1}
    (Achlioptas-style sparse JL matrix, here with 1/3 density each):

        s = [(i*31 + j*17) mod 3] - 1   mapped  {0,1,2} -> {-1, 0, +1}

    Pure integer arithmetic, so the oracle reproduces it exactly."""
    i_c = F.lit(i) if isinstance(i, int) else i
    j_c = F.lit(j) if isinstance(j, int) else j
    return ((i_c * 31 + j_c * 17) % 3 - 1).cast("bigint")


def random_projection(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    in_dim: int,
    out_dim: int,
) -> DataFrame:
    """Project ``vec_col`` (array<float>, length in_dim) to ``out_dim``
    via the deterministic sparse sign matrix ``projection_sign``:

        y_j = round( sum_i round(x_i * 1e12) * s(i, j) / 1e12 / sqrt(out_dim), 6)

    The 1/sqrt(out_dim) factor is the JL norm-preserving scaling. The
    two divisions are performed in that exact order (not a reciprocal
    multiply) so the float result is bit-identical to the SQL oracle.
    Output: (id, proj) with proj an array<double> of length out_dim.

    Plan shape: one ``transform`` over the output indices, each an
    ``aggregate`` over the input elements with a BIGINT accumulator —
    a narrow projection, no shuffle, no UDF."""
    import math

    sd = math.sqrt(float(out_dim))
    vec = F.col(vec_col)

    def out_elem(j: Column) -> Column:
        acc = F.aggregate(
            F.sequence(F.lit(0), F.lit(in_dim - 1)),
            F.lit(0).cast("bigint"),
            lambda a, i: a
            + F.round(F.element_at(vec, i + 1).cast("double") * SCALE).cast("bigint")
            * projection_sign(i, j),
        )
        return F.round(acc.cast("double") / SCALE / sd, 6)

    return df.select(
        F.col(id_col).alias("id"),
        F.transform(F.sequence(F.lit(0), F.lit(out_dim - 1)), out_elem).alias("proj"),
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
    nrm = F.sqrt(ssq.cast("double") / SCALE)
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(
            vec,
            lambda x: F.when(nrm == 0.0, x.cast("double")).otherwise(
                F.round(x.cast("double") / nrm, 6)
            ),
        ).alias("unit"),
    )
