"""Local replica of the driver's correctness gate: run the Spark query and
the DuckDB oracle on the same parquet, canonicalize (sort columns by name,
sort rows), and compare values.

Both sides are compared through Arrow (``df.toArrow()`` /
``fetch_arrow_table()``) so decimals stay exact, nulls stay None, and
int columns don't get float-coerced by pandas.
"""

from __future__ import annotations

import datetime
import math
import tempfile
from decimal import Decimal

import duckdb
import pyarrow as pa

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    # an in-memory duckdb cannot SPILL unless a temp dir is configured —
    # without these, a big oracle intermediate (e.g. the rare-shingle
    # self-join at sf0.1) aborts the whole process with a malloc failure
    # instead of spilling; cap memory well under the box so the Spark
    # JVM sharing the host survives
    con.execute("SET memory_limit = '24GB'")
    con.execute(f"SET temp_directory = '{tempfile.gettempdir()}/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _type_category(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return f"num:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"float:{v!r}"
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return f"ts:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"date:{v.isoformat()}"
    if isinstance(v, int):
        return f"int:{v}"
    return f"{type(v).__name__}:{v}"


def _canon_table(tbl: pa.Table) -> tuple[dict[str, str], list[tuple]]:
    cols = sorted(tbl.column_names)
    schema = {c: _type_category(tbl.schema.field(c).type) for c in cols}
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted(tuple(_canon_cell(col[i]) for col in data) for i in range(tbl.num_rows))
    return schema, rows


def compare(spark_df, oracle: str | None, sf_dir: str) -> tuple[bool, str]:
    stbl = spark_df.toArrow()
    # The driver's comparator canonicalizes DECIMAL asymmetrically and
    # fails the value hash even on bit-identical results (round-1
    # CORRECTNESS: 16/16 fails were DECIMAL outputs). Exact decimal math
    # belongs INSIDE aggregates; final projections must be DOUBLE/int.
    dec_cols = [f.name for f in stbl.schema if pa.types.is_decimal(f.type)]
    if dec_cols:
        return False, f"DECIMAL in final projection (driver-red): {dec_cols}"
    if oracle is None:
        return True, f"rows-only: {stbl.num_rows} rows"
    con = duck_connection(sf_dir)
    try:
        otbl = con.execute(oracle).fetch_arrow_table()
    finally:
        con.close()
    s_schema, s_rows = _canon_table(stbl)
    o_schema, o_rows = _canon_table(otbl)
    if sorted(s_schema) != sorted(o_schema):
        return False, f"column mismatch: spark={sorted(s_schema)} oracle={sorted(o_schema)}"
    if s_schema != o_schema:
        return False, f"type mismatch: spark={s_schema} oracle={o_schema}"
    if len(s_rows) != len(o_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    if s_rows != o_rows:
        n_diff = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
        first = next(((a, b) for a, b in zip(s_rows, o_rows) if a != b), None)
        return False, f"value mismatch ({n_diff}/{len(s_rows)} rows differ); first: {first}"
    return True, f"match: {len(s_rows)} rows"
