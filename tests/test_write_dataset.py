"""Sharded dataset writer (sources.writers.write_dataset): directory
partitioning, file-size bounding, and read-back pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datafusion_server_spark import tables
from datafusion_server_spark.sources import writers


def test_partitioned_layout_and_roundtrip(spark, sf_dir, tmp_path):
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out = str(tmp_path / "curated")
    writers.write_dataset(docs, out, partition_by=["lang"])
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == {f"lang={l}" for l in langs}
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    a = {(r.doc_id, r.lang, r.n_chars) for r in docs.collect()}
    b = {(r.doc_id, r.lang, r.n_chars) for r in back.collect()}
    assert a == b


def test_partition_pruning_on_readback(spark, sf_dir, tmp_path):
    """A lang filter on the written layout must prune at the source:
    the scan's partition filters carry the predicate and only that
    directory's files are read."""
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "pruned")
    writers.write_dataset(docs, out, partition_by=["lang"])
    q = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:1500]
    # runtime check: the rows actually read all come from the lang=en
    # directory (inputFiles() reports the unpruned relation, so ask the
    # executed scan itself)
    files = [r.f for r in q.select(F.input_file_name().alias("f")).distinct().collect()]
    assert files and all("lang=en" in f for f in files)


def test_max_records_per_file_bounds_output(spark, sf_dir, tmp_path):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "bounded")
    writers.write_dataset(
        docs, out, partition_by=["lang"], max_records_per_file=50
    )
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # no parquet file may hold more than 50 rows
    import pyarrow.parquet as pq

    for root, _, names in os.walk(out):
        for n in names:
            if n.endswith(".parquet"):
                assert pq.ParquetFile(os.path.join(root, n)).metadata.num_rows <= 50


def test_one_file_per_partition_value_by_default(spark, sf_dir, tmp_path):
    """The pre-write repartition keys output by the partition columns —
    without it every task writes into every directory (tasks x
    partitions small files)."""
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = str(tmp_path / "compact")
    writers.write_dataset(docs, out, partition_by=["lang"])
    for d in os.listdir(out):
        if d.startswith("lang="):
            files = [
                n for n in os.listdir(os.path.join(out, d)) if n.endswith(".parquet")
            ]
            assert len(files) == 1, (d, files)
