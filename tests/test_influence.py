"""Independent semantic properties of TracIn attribution — invariants a
faithful replay of a wrong algorithm could not pass (on top of the
unrolled-CTE oracle parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.queries.influence import PROBE_DOC, influence_tracin_probe


def test_tracin_same_label_documents_help_probe(spark, sf_dir):
    """Gradient alignment: documents sharing the probe's label push the
    model the probe's way (positive mean influence); opposite-label
    documents push against it (strictly lower mean)."""
    df = influence_tracin_probe.build(spark, sf_dir).cache()
    docs = tables.load(spark, sf_dir, "documents")
    lab = docs.select(
        F.col("doc_id").alias("id"),
        F.array_contains(F.split("text", " "), "vector").alias("pos"),
    )
    j = df.join(lab, "id")
    probe_pos = j.filter(F.col("id") == PROBE_DOC).collect()[0]["pos"]
    means = {
        r["same"]: r["m"]
        for r in j.groupBy((F.col("pos") == probe_pos).alias("same"))
        .agg(F.avg("influence").alias("m"))
        .collect()
    }
    assert means[True] > 0.0 > means[False] or means[True] > means[False] > 0.0
    assert means[True] > means[False]


def test_tracin_probe_self_influence_ranks_top_decile(spark, sf_dir):
    """TracIn's classic sanity check: an example is among the most
    influential examples FOR ITSELF (here: top decile — hashed features
    make near-identical twins possible, exact top-1 is not guaranteed)."""
    df = influence_tracin_probe.build(spark, sf_dir)
    probe_inf = df.filter(F.col("id") == PROBE_DOC).collect()[0]["influence"]
    n = df.count()
    above = df.filter(F.col("influence") > probe_inf).count()
    assert above <= n // 10
