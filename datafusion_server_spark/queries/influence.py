"""TracIn data-attribution queries (operators.influence).

Oracle = the logreg unrolled-CTE chain (``queries.classifier``)
extended per iteration with the probe/doc error product, repr-rounded
onto a 1e-6 integer grid so the cross-iteration accumulation is an
order-free BIGINT sum — the same determinism contract that lets every
iterative family in this repo be replayed by DuckDB from raw parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import classifier, influence
from datafusion_server_spark.queries import df_query, rrepr
from datafusion_server_spark.queries.classifier import PROBE, _logreg_ctes

DIM = 256
ITERS = 8
LR = 5.0
PROBE_DOC = 0


def _tracin_ctes() -> str:
    """fe/lab/w0..w{ITERS} from the shared generator, plus per-iteration
    probe-error cross terms and the bucket-overlap table."""
    # repr-rounded-to-integer of the raw error product x 1e6
    def r0(expr: str) -> str:
        return f"CAST(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,0)) AS BIGINT)"

    parts = [_logreg_ctes(dim=DIM, iters=ITERS, lr=LR, probe=PROBE)]
    terms = []
    for t in range(1, ITERS + 1):
        parts.append(
            f"""
ipr{t} AS (SELECT p.p - l.y AS ep FROM p{t} p JOIN lab l ON l.id = p.id
           WHERE p.id = {PROBE_DOC}),
itm{t} AS (SELECT p.id,
           {r0(f"((r.ep * (p.p - l.y)) * 1000000.0)")} AS v
           FROM p{t} p JOIN lab l ON l.id = p.id, ipr{t} r)"""
        )
        terms.append(f"SELECT id, v FROM itm{t}")
    union = " UNION ALL ".join(terms)
    parts.append(
        f"""
iacc AS (SELECT id, CAST(SUM(v) AS BIGINT) AS acc FROM ({union}) GROUP BY id),
icm AS (SELECT f.id, CAST(COUNT(*) AS BIGINT) AS common_buckets
        FROM fe f JOIN fe p ON p.id = {PROBE_DOC} AND p.b = f.b
        GROUP BY f.id)"""
    )
    return ",".join(parts)


_TRACIN_ORACLE = f"""
WITH {_tracin_ctes()}
SELECT CAST(a.id AS BIGINT) AS id, c.common_buckets,
       {rrepr(f"{LR!r} * CAST(c.common_buckets AS DOUBLE) * (CAST(a.acc AS DOUBLE) / 1000000.0)", 6)} AS influence
FROM iacc a JOIN icm c ON c.id = a.id
"""


@df_query("influence_tracin_probe", _TRACIN_ORACLE)
def influence_tracin_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TracIn influence of every training document on probe document 0
    through 8 GD checkpoints (dim 256 so bucket overlap discriminates --
    at dim 64 every ~200-word doc saturates the bucket space) — which documents pushed the quality
    classifier toward (positive) or away from (negative) its behavior
    on the probe. Self-influence of the probe is the classic
    high-ranking sanity row, asserted in tests."""
    docs = tables.load(spark, sf_dir, "documents")
    feats = classifier.hashed_features(docs, "text", "doc_id", DIM)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.array_contains(F.split(F.col("text"), " "), PROBE), 1.0
        ).otherwise(0.0).alias("y"),
    )
    return influence.tracin_influence(feats, labels, PROBE_DOC, DIM, ITERS, LR)
