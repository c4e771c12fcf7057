"""Scalar (int8) vector quantization + asymmetric-distance search.

Beyond-reference operators (the reference engine has no vector ops) —
the compression leg of the similarity-search family: brute force
(exact), sign-LSH / IVF (candidate pruning), and now quantization
(bandwidth/footprint). An int8 code table is 4x smaller than float32
vectors; at 100 TB the ANN scan reads the code table and only fetches
full-precision vectors for the small re-rank set — the standard
SQ8 + refine design (Faiss ``SQ8``; Milvus/pgvector offer the same).

Scheme: per-DIMENSION min/max over the corpus define a uniform grid,

    code_i  = clamp(floor((x_i - mn_i) / (mx_i - mn_i) * 2^bits), 0, 2^bits - 1)
    xhat_i  = mn_i + (code_i + 0.5) * (mx_i - mn_i) / 2^bits

and search scores queries (kept float — "asymmetric") against
RECONSTRUCTED candidates, then re-ranks a capped candidate set against
the true vectors.

Determinism contract: the grid math is IEEE-double add/sub/mul/div —
bit-identical across engines by the standard — with ``floor``/clamp on
top, and reconstructed values rounded to 6 decimals; dot products use
the exact scaled-long form shared with ``operators.similarity``. The
DuckDB oracle reproduces every code and every score bit-for-bit.

Scale shape (100 TB): the min/max profile is ONE aggregation over the
element view (dim-bounded output), re-packed to arrays by a broadcast
1-row aggregate embedded in the plan (no driver job); encoding is then
a narrow per-row map. Search shuffles nothing before the per-query
top-k: candidates broadcast-join the (tiny) query side and both ranking
windows key by query_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_server_spark.operators.scale import ensure_fanout_parallelism
from datafusion_server_spark.operators.similarity import (
    _dot_scaled,
    _elements,
    _unscale,
)


def dim_profile(embeddings: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """ONE-row (mns, mxs) arrays of per-dimension corpus min/max, built
    as: element view -> groupBy position (dim rows) -> sort_array over a
    collect_list 1-row aggregate. The single row is broadcast into the
    encoding plan — never collected to the driver."""
    el = _elements(ensure_fanout_parallelism(embeddings), id_col, vec_col, "id")
    stats = el.groupBy("i").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    return stats.agg(
        F.sort_array(F.collect_list(F.struct("i", "mn", "mx"))).alias("__s")
    ).select(
        F.transform(F.col("__s"), lambda s: s["mn"]).alias("mns"),
        F.transform(F.col("__s"), lambda s: s["mx"]).alias("mxs"),
    )


def _code_expr(vec, bits: int):
    """codes array expression for ``vec`` against the in-scope
    (mns, mxs) profile columns. A flat dimension (mx == mn) encodes 0."""
    levels = float(2**bits)
    top = int(2**bits - 1)
    mns, mxs = F.col("mns"), F.col("mxs")

    def code(x, i):
        mn = F.element_at(mns, i + 1)
        mx = F.element_at(mxs, i + 1)
        raw = F.floor((x.cast("double") - mn) / (mx - mn) * levels)
        return (
            F.when(mx == mn, F.lit(0))
            .otherwise(F.greatest(F.lit(0), F.least(F.lit(top), raw)))
            .cast("int")
        )

    return F.transform(vec, code)


def scalar_quantize(
    embeddings: DataFrame,
    vec_col: str,
    id_col: str,
    bits: int = 8,
    *,
    profile: DataFrame | None = None,
) -> DataFrame:
    """(id, codes array<int>): each element snapped to its dimension's
    2^bits-level uniform grid. Pass a precomputed ``profile`` to encode
    against a frozen grid (e.g. quantizing a new shard against the
    corpus profile)."""
    if profile is None:
        profile = dim_profile(embeddings, vec_col, id_col)
    return embeddings.crossJoin(F.broadcast(profile)).select(
        F.col(id_col).alias("id"),
        _code_expr(F.col(vec_col), bits).alias("codes"),
    )


def _reconstruct(codes, mns, mxs, bits: int):
    """codes array -> rounded xhat array under the (mns, mxs) grid."""
    levels = float(2**bits)

    def xhat(c, i):
        mn = F.element_at(mns, i + 1)
        mx = F.element_at(mxs, i + 1)
        return F.round(mn + (c.cast("double") + 0.5) * (mx - mn) / levels, 6)

    return F.transform(codes, xhat)


def quantized_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    rerank_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SQ + refine cosine search: score float queries against int8-
    reconstructed candidates (asymmetric distance), keep the top
    ``rerank_factor * k`` per query by (adc desc, id), re-rank those
    exactly against the true vectors, return the top k.

    Output: (query_id, neighbor_id, cosine, rank) — ``cosine`` is the
    EXACT re-ranked score, so results degrade only by candidate recall,
    never by score precision (the refine contract). Zero-norm vectors
    and reconstructions are dropped (no direction).
    """
    profile = dim_profile(embeddings, vec_col, id_col)
    # encode + dequantize fused into ONE projection over ONE broadcast of
    # the profile — a split scalar_quantize/reconstruct pair would embed
    # the profile subtree (a full element-view pass) twice in the plan
    recon = embeddings.crossJoin(F.broadcast(profile)).select(
        F.col(id_col).alias("neighbor_id"),
        _reconstruct(
            _code_expr(F.col(vec_col), bits), F.col("mns"), F.col("mxs"), bits
        ).alias("__rv"),
    ).select(
        "neighbor_id",
        "__rv",
        F.sqrt(_unscale(_dot_scaled(F.col("__rv"), F.col("__rv")))).alias("__rnrm"),
    ).filter(F.col("__rnrm") > 0.0)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.sqrt(
            _unscale(_dot_scaled(F.col(vec_col), F.col(vec_col)))
        ).alias("__qnrm"),
    ).filter(F.col("__qnrm") > 0.0)
    adc = recon.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            _unscale(_dot_scaled(F.col("__rv"), F.col("__qv")))
            / (F.col("__qnrm") * F.col("__rnrm")),
            6,
        ).alias("adc"),
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    cand = (
        adc.withColumn("__cr", F.row_number().over(wc))
        .filter(F.col("__cr") <= rerank_factor * k)
        .select("query_id", "neighbor_id")
    )
    true_c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.sqrt(
            _unscale(_dot_scaled(F.col(vec_col), F.col(vec_col)))
        ).alias("__cnrm"),
    ).filter(F.col("__cnrm") > 0.0)
    exact = (
        cand.join(true_c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _unscale(_dot_scaled(F.col("__cv"), F.col("__qv")))
                / (F.col("__qnrm") * F.col("__cnrm")),
                6,
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
