"""Vector similarity search over an ``array<float>`` embedding column.

Beyond-reference operators (BASELINE.json north-star):
- brute-force cosine top-k — the exactness baseline: broadcast the query
  vectors, score every (query, candidate) pair JVM-side with
  ``aggregate(zip_with(...))`` (no Python in the loop);
- sign-LSH (random hyperplanes) bucketed ANN — the 100 TB scale path:
  vectors are bucketed by a deterministic hyperplane-sign code so the
  candidate join touches only same-bucket pairs.

Determinism contract: dot products accumulate as DECIMAL(18,12) (exact,
order-independent), hyperplane signs derive from md5 — both
reproducible bit-for-bit by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "DECIMAL(18,12)"


def _dot_decimal(a: Column, b: Column) -> Column:
    """Exact dot product: per-element double multiply (IEEE, deterministic)
    accumulated in decimal (order-independent)."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC)
    )
    # (acc + v) widens under Spark's decimal-addition rule; cast back so
    # the merge type matches the zero type (lossless: addends carry
    # exactly 12 decimals and stay far below 18 digits; 18,12 keeps the
    # decimal long-backed instead of Int128).
    return F.aggregate(prods, F.lit(0).cast(DEC), lambda acc, v: (acc + v).cast(DEC))


def _norm(vec: Column) -> Column:
    return F.sqrt(_dot_decimal(vec, vec).cast("double"))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against every
    candidate; rank per query by (cosine desc, neighbor id).

    Output: (query_id, neighbor_id, cosine, rank). The query side is
    broadcast — at 100 TB the candidate scan is embarrassingly parallel
    and the only shuffle is the final per-query top-k (tiny).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot_decimal(F.col("q_vec"), F.col("c_vec")).cast("double")
            / (F.col("q_norm") * F.col("c_norm")),
            6,
        ).alias("cosine"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signs(plane: int, dim: int) -> list[int]:
    """Deterministic pseudo-random hyperplane weights in {+1,-1}: the high
    bit of the first hex digit of md5('{plane}:{j}'). The DuckDB oracle
    reproduces these with its own md5 over the same strings."""
    import hashlib

    return [
        1 if hashlib.md5(f"{plane}:{j}".encode()).hexdigest()[0] >= "8" else -1
        for j in range(dim)
    ]


def _hyperplane_bit(vec: Column, plane: int, dim: int) -> Column:
    """Sign of the hyperplane projection, accumulated as DECIMAL so the
    value is order-independent and engine-reproducible."""
    signs = F.array(*[F.lit(s) for s in hyperplane_signs(plane, dim)])
    prods = F.zip_with(vec, signs, lambda x, s: (x.cast("double") * s).cast(DEC))
    proj = F.aggregate(prods, F.lit(0).cast(DEC), lambda acc, v: (acc + v).cast(DEC))
    return F.when(proj > 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_bucket_code(vec: Column, planes: int, dim: int) -> Column:
    """Sign-LSH code: concat of hyperplane signs -> bucket key string."""
    return F.concat(*[_hyperplane_bit(vec, p, dim) for p in range(planes)])


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    At scale the bucket code is the shuffle key: candidates partition by
    bucket once (reusable across queries), each query probes exactly one
    partition's worth of vectors — no all-pairs crossjoin.
    Output: (query_id, neighbor_id, cosine, rank) — approximate; recall
    depends on `planes`.
    """
    # coded feeds both the query probe and the candidate side — persist
    # so the 8 hyperplane projections + norm run once per vector.
    coded = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket_code(F.col(vec_col), planes, dim).alias("bucket"),
        _norm(F.col(vec_col)).alias("nrm"),
    ).persist()
    q = queries.select(F.col(id_col).alias("query_id")).join(
        coded.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("bucket").alias("q_bucket"),
            F.col("nrm").alias("q_norm"),
        ),
        "query_id",
    )
    cand = coded.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("bucket").alias("c_bucket"),
        F.col("nrm").alias("c_norm"),
    )
    scored = cand.join(
        F.broadcast(q),
        (F.col("c_bucket") == F.col("q_bucket")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot_decimal(F.col("q_vec"), F.col("c_vec")).cast("double")
            / (F.col("q_norm") * F.col("c_norm")),
            6,
        ).alias("cosine"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets: only same-bucket
    pairs are scored; pairs with cosine >= threshold survive.
    Output: (id_a, id_b, cosine)."""
    coded = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_code(F.col(vec_col), planes, dim).alias("bucket"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a = coded.alias("a")
    b = coded.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                _dot_decimal(F.col("a.vec"), F.col("b.vec")).cast("double")
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
