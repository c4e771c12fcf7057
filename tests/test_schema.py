from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datafusion_server_spark.schema import (
    SchemaError,
    from_spark_type,
    struct_to_schema_json,
    to_spark_type,
    to_struct_type,
)


def test_scalar_mappings():
    assert to_spark_type("Int64") == T.LongType()
    assert to_spark_type("Integer") == T.LongType()
    assert to_spark_type("Float") == T.DoubleType()
    assert to_spark_type("String") == T.StringType()
    assert to_spark_type("Boolean") == T.BooleanType()
    assert to_spark_type("Date32") == T.DateType()


def test_unsigned_widening():
    assert to_spark_type("UInt8") == T.ShortType()
    assert to_spark_type("UInt16") == T.IntegerType()
    assert to_spark_type("UInt32") == T.LongType()
    assert to_spark_type("UInt64") == T.DecimalType(20, 0)


def test_time_gap_policy():
    assert to_spark_type("Time64") == T.LongType()
    assert to_spark_type("Float16") == T.FloatType()


def test_decimal_bounds():
    assert to_spark_type({"type": "Decimal128", "precision": 12, "scale": 3}) == T.DecimalType(12, 3)
    with pytest.raises(SchemaError):
        to_spark_type({"type": "Decimal256", "precision": 50, "scale": 10})


def test_union_rejected():
    with pytest.raises(SchemaError):
        to_spark_type({"type": "Union", "types": []})


def test_nested():
    st = to_spark_type(
        {
            "type": "Struct",
            "fields": [
                {"name": "xs", "dataType": {"type": "List", "item": "Int32"}},
                {"name": "m", "dataType": {"type": "Map", "key": "String", "value": "Float64"}},
            ],
        }
    )
    assert isinstance(st, T.StructType)
    assert isinstance(st["xs"].dataType, T.ArrayType)
    assert isinstance(st["m"].dataType, T.MapType)


def test_roundtrip():
    schema = {
        "fields": [
            {"name": "a", "dataType": "Int64", "nullable": False},
            {"name": "b", "dataType": "String", "nullable": True},
            {"name": "c", "dataType": {"type": "List", "item": "Float64"}, "nullable": True},
        ]
    }
    st = to_struct_type(schema)
    back = struct_to_schema_json(st)
    assert [f["name"] for f in back["fields"]] == ["a", "b", "c"]
    assert back["fields"][0]["dataType"] == "Int64"
    assert back["fields"][2]["dataType"] == {"type": "List", "item": "Float64"}


def test_from_spark_decimal():
    assert from_spark_type(T.DecimalType(20, 0)) == {
        "type": "Decimal128",
        "precision": 20,
        "scale": 0,
    }
