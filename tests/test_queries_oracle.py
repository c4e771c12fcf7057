"""The correctness gate, locally: every inventory query vs its DuckDB
oracle at the smoke scale factor."""

from __future__ import annotations

import pytest

from datafusion_server_spark.queries import registry
from tests.harness import compare

QUERIES = registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    qd = QUERIES[name]
    df = qd.build(spark, sf_dir)
    ok, msg = compare(df, qd.oracle_for(sf_dir), sf_dir)
    assert ok, f"{name}: {msg}"
