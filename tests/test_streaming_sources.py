"""Unbounded streaming sources: rate-source windowed aggregation runs and
makes progress; kafka gates with a clear error (no package in container)."""

from __future__ import annotations

import pytest

from datafusion_server_spark.streaming import sources


def test_rate_source_windowed_counts(spark):
    out = sources.rate_windowed_counts(
        spark, rows_per_second=500, width="1 second", run_seconds=4.0
    )
    assert dict(out.dtypes) == {
        "bucket": "timestamp",
        "n": "bigint",
        "total_value": "bigint",
    }
    rows = out.collect()
    assert rows, "standing query produced no windows in 4s"
    # windows are 1s-aligned and counts are positive
    for r in rows:
        assert r["bucket"].microsecond == 0
        assert r["n"] > 0
    # the generator emits value = 0,1,2,...: per-window sums must be
    # consistent with the counts (sum of n rows of consecutive ints)
    total_n = sum(r["n"] for r in rows)
    total_v = sum(r["total_value"] for r in rows)
    assert total_v == total_n * (total_n - 1) // 2


def test_kafka_source_gated(spark):
    with pytest.raises(RuntimeError, match="kafka source unavailable"):
        sources.kafka_stream(spark, "broker:9092", "events")
