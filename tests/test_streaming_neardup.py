"""Micro-batch invariance of the streaming near-dup probe: splitting
the incoming documents across many micro-batches must produce exactly
the batch operator's pair set."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.operators import dedup
from datafusion_server_spark.streaming.dedup import stream_near_dup_probe


def _pairs(df):
    return {
        (r["new_id"], r["index_id"], r["n_common"], r["jaccard"])
        for r in df.collect()
    }


def test_neardup_stream_matches_batch_across_microbatches(spark, sf_dir, tmp_path):
    docs = tables.load(spark, sf_dir, "documents")
    # lay the corpus out as several files so maxFilesPerTrigger=1 forces
    # multiple micro-batches
    multi = str(tmp_path / "docs_multi")
    docs.repartition(4).write.parquet(multi)
    streamed = stream_near_dup_probe(
        spark, f"{multi}/part-*.parquet", max_files_per_trigger=1
    )
    existing = docs.filter(F.col("doc_id") % 10 < 8)
    new_batch = docs.filter(F.col("doc_id") % 10 >= 8)
    index = dedup.lsh_signature_index(existing, "text", "doc_id")
    batch = dedup.lsh_pairs_against_index(new_batch, index, "text", "doc_id")
    assert _pairs(streamed) == _pairs(batch)
    assert streamed.count() == streamed.distinct().count()
