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


def test_decimal256_widen_option():
    """Opt-in lossy widen: scale truncates, integer digits never do
    (Spark's allowPrecisionLoss spirit); int-part overflow stays rejected."""
    import pytest

    from datafusion_server_spark.schema import SchemaError, to_spark_type, to_struct_type

    # p=50, s=10 -> 40 integer digits > 38: rejected under BOTH policies
    with pytest.raises(SchemaError, match="integer digits"):
        to_spark_type(
            {"type": "Decimal256", "precision": 50, "scale": 10}, widen_decimal256=True
        )
    # p=50, s=20 -> 30 int digits: widen keeps them, scale clamps to 8
    assert to_spark_type(
        {"type": "Decimal256", "precision": 50, "scale": 20}, widen_decimal256=True
    ) == T.DecimalType(38, 8)
    # p=40, s=40 -> 0 int digits: full 38-digit scale retained
    assert to_spark_type(
        {"type": "Decimal256", "precision": 40, "scale": 40}, widen_decimal256=True
    ) == T.DecimalType(38, 38)
    # flag recurses through nested types and to_struct_type
    st = to_struct_type(
        {
            "fields": [
                {
                    "name": "xs",
                    "dataType": {
                        "type": "List",
                        "item": {"type": "Decimal256", "precision": 45, "scale": 12},
                    },
                }
            ]
        },
        widen_decimal256=True,
    )
    assert st["xs"].dataType == T.ArrayType(T.DecimalType(38, 5))
    # default policy still rejects, with the hint in the message
    with pytest.raises(SchemaError, match="widen_decimal256"):
        to_spark_type({"type": "Decimal256", "precision": 45, "scale": 12})


def test_monthdaynano_widen_option():
    """Default rejects; widen_interval=True decodes to the lossless
    component struct (months/days/nanos preserved exactly)."""
    mdn = {"type": "Interval", "unit": "MonthDayNano"}
    with pytest.raises(SchemaError, match="widen_interval"):
        to_spark_type(mdn)
    st = to_spark_type(mdn, widen_interval=True)
    assert [f.name for f in st.fields] == ["months", "days", "nanos"]
    assert isinstance(st["nanos"].dataType, T.LongType)


def test_union_widen_option():
    """Default rejects; widen_union=True flattens to the type-tagged
    struct of nullable branches, recursing into branch types."""
    u = {
        "type": "Union",
        "fields": [
            {"name": "s", "dataType": "string"},
            {"name": "big", "dataType": {"type": "Decimal256", "precision": 45, "scale": 20}},
        ],
    }
    with pytest.raises(SchemaError, match="widen_union"):
        to_spark_type(u)
    st = to_spark_type(u, widen_union=True, widen_decimal256=True)
    assert [f.name for f in st.fields] == ["type_id", "s", "big"]
    assert not st["type_id"].nullable and st["s"].nullable
    assert isinstance(st["big"].dataType, T.DecimalType)
    # widen_union alone must NOT silently enable the decimal widen
    with pytest.raises(SchemaError, match="widen_decimal256"):
        to_spark_type(u, widen_union=True)
    # a union with no branches is malformed even with the widen
    with pytest.raises(SchemaError, match="no branch"):
        to_spark_type({"type": "Union", "fields": []}, widen_union=True)


def test_struct_type_threads_all_widen_flags():
    sj = {
        "fields": [
            {"name": "iv", "dataType": {"type": "Interval", "unit": "MonthDayNano"}},
            {
                "name": "u",
                "dataType": {"type": "Union", "fields": [{"name": "x", "dataType": "int32"}]},
            },
        ]
    }
    st = to_struct_type(sj, widen_interval=True, widen_union=True)
    assert [f.name for f in st.fields] == ["iv", "u"]


def test_decimal256_as_string_is_lossless(spark):
    """The r6 third Decimal256 policy: p > 38 decodes to StringType
    carrying the EXACT digits (arrow decimal256 -> utf8 is exact) —
    zero value loss, arithmetic by explicit cast where 38 digits
    suffice."""
    import decimal

    import pyarrow as pa
    import pyarrow.compute as pc
    import pytest

    from datafusion_server_spark.schema import SchemaError, to_spark_type

    dt = {"type": "decimal256", "precision": 50, "scale": 5}
    assert to_spark_type(dt, decimal256_as_string=True) == T.StringType()
    # mutually exclusive with the lossy clamp
    with pytest.raises(SchemaError, match="mutually exclusive"):
        to_spark_type(dt, decimal256_as_string=True, widen_decimal256=True)
    # value-level proof of the documented decode recipe: a 45-integer-
    # digit value survives the arrow->string->Spark path digit-exact
    # (the lossy clamp REJECTS this value outright)
    big = decimal.Decimal("123456789012345678901234567890123456789012345.67890")
    arr = pa.array([big], type=pa.decimal256(50, 5))
    as_str = pc.cast(arr, pa.string())
    df = spark.createDataFrame([(as_str[0].as_py(),)], "v string")
    [row] = df.collect()
    assert decimal.Decimal(row["v"]) == big
