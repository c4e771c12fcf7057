"""Wire-level schema DSL <-> Spark StructType mapper.

Rebuilds the reference's ``DataSourceSchema`` JSON contract
(/root/reference/lib/src/data_source/schema.rs:385-417 — fields of
{name, dataType, nullable}) on Spark types, with the §1.2 gap policies:

- unsigned ints widen (UInt8->Short, UInt16->Int, UInt32->Long,
  UInt64->Decimal(20,0) — Spark's own Parquet convention);
- Decimal precision >38 is rejected (Spark's hard limit) by default;
  ``widen_decimal256=True`` opts into Decimal(38, clamped) with scale
  truncation only (integer digits preserved — see ``_widen_decimal``);
- Time32/Time64 map to LongType (microseconds since midnight);
- Float16 widens to FloatType;
- nanosecond timestamps map to TimestampType (µs) — ns truncation;
- MonthDayNano intervals are rejected by default (no single Spark type
  carries months+days+nanos); ``widen_interval=True`` opts into a
  LOSSLESS structural decode to struct<months int, days int,
  nanos long> — every component preserved exactly, queryable with
  plain arithmetic;
- Union is rejected by default (no Spark analog);
  ``widen_union=True`` opts into the standard relational flattening:
  struct<type_id tinyint, f0 .., f1 ..> with one nullable field per
  branch — lossless, the shape Arrow dense unions flatten to.

The JSON grammar accepted for ``dataType`` mirrors the reference enum
(schema.rs:12-46): plain strings for scalars, and structured forms for
parameterized types.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

_SCALARS: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "integer": T.LongType(),  # reference alias: Integer == Int64 (schema.rs:23)
    "uint8": T.ShortType(),  # widen (no unsigned in Spark)
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float16": T.FloatType(),  # lossy-widen
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float": T.DoubleType(),  # reference alias: Float == Float64 (schema.rs:27)
    "string": T.StringType(),
    "utf8": T.StringType(),
    "binary": T.BinaryType(),
    "unknown": T.BinaryType(),  # reference maps Unknown -> Binary (schema.rs:146)
    "date32": T.DateType(),
    "date64": T.TimestampType(),  # ms-precision date -> timestamp
    "date": T.TimestampType(),  # reference alias: Date == Date64 (schema.rs:34)
    "time32": T.LongType(),  # no TimeType in Spark: µs since midnight
    "time64": T.LongType(),
    "time": T.LongType(),
    "duration": T.DayTimeIntervalType(),
}

MAX_DECIMAL_PRECISION = 38


class SchemaError(ValueError):
    pass


def _widen_decimal(p: int, s: int) -> T.DecimalType:
    """Opt-in lossy Decimal256 widen (p > 38 -> Decimal(38, clamped)).

    Follows the spirit of Spark's own precision-loss rule
    (``spark.sql.decimalOperations.allowPrecisionLoss``): integer digits
    are NEVER sacrificed — the scale is truncated to whatever room is
    left (``38 - (p - s)``), so values round in the fractional digits but
    can never silently overflow. A type whose integer part alone exceeds
    38 digits stays rejected even with the widen enabled: rounding is a
    documented policy, wrap-around corruption is not.
    """
    int_digits = p - s
    if int_digits > MAX_DECIMAL_PRECISION:
        raise SchemaError(
            f"decimal({p},{s}) has {int_digits} integer digits — beyond "
            f"Spark's max precision {MAX_DECIMAL_PRECISION} even with "
            "widen_decimal256 (values could overflow, not just round)"
        )
    return T.DecimalType(MAX_DECIMAL_PRECISION, max(0, MAX_DECIMAL_PRECISION - int_digits))


def to_spark_type(
    dt: Any,
    *,
    widen_decimal256: bool = False,
    decimal256_as_string: bool = False,
    widen_interval: bool = False,
    widen_union: bool = False,
) -> T.DataType:
    """One ``dataType`` JSON value -> Spark DataType.

    ``widen_decimal256=True`` opts into the LOSSY Decimal256 policy (see
    ``_widen_decimal``); ``decimal256_as_string=True`` opts into the
    LOSSLESS textual decode instead — p > 38 columns arrive as
    StringType carrying the exact digits (arrow's decimal256 casts to
    utf8 exactly), trading native arithmetic for zero value loss (cast
    explicitly where 38 digits suffice). The two flags are mutually
    exclusive. ``widen_interval=True`` decodes MonthDayNano to a
    lossless component struct; ``widen_union=True`` flattens Union to
    a type-tagged struct of nullable branches. Defaults keep the §1.2
    reject policy.
    """
    if widen_decimal256 and decimal256_as_string:
        raise SchemaError(
            "widen_decimal256 and decimal256_as_string are mutually "
            "exclusive — pick the lossy numeric clamp OR the lossless "
            "textual decode"
        )
    _w = dict(
        widen_decimal256=widen_decimal256,
        decimal256_as_string=decimal256_as_string,
        widen_interval=widen_interval,
        widen_union=widen_union,
    )
    if isinstance(dt, str):
        key = dt.strip().lower()
        if key in _SCALARS:
            return _SCALARS[key]
        if key in ("decimal", "decimal128", "decimal256"):
            # bare decimal: reference defaults are (38, 10)-ish; we pick
            # Spark's max-precision default
            return T.DecimalType(38, 10)
        if key == "timestamp":
            return T.TimestampType()
        raise SchemaError(f"unknown dataType: {dt!r}")
    if isinstance(dt, dict):
        kind = str(dt.get("type", "")).strip().lower()
        if kind in ("decimal", "decimal128", "decimal256"):
            p = int(dt.get("precision", 38))
            s = int(dt.get("scale", 10))
            if p > MAX_DECIMAL_PRECISION:
                if decimal256_as_string:
                    return T.StringType()
                if widen_decimal256:
                    return _widen_decimal(p, s)
                raise SchemaError(
                    f"decimal precision {p} exceeds Spark's max {MAX_DECIMAL_PRECISION}"
                    " (pass widen_decimal256=True to clamp with documented"
                    " rounding, or decimal256_as_string=True for the"
                    " lossless textual decode)"
                )
            return T.DecimalType(p, s)
        if kind == "timestamp":
            # unit s/ms/us/ns all map to Spark µs TimestampType; tz-less
            # sources map to TimestampNTZ
            tz = dt.get("timezone")
            return T.TimestampType() if tz else T.TimestampNTZType()
        if kind in ("list", "largelist"):
            return T.ArrayType(to_spark_type(dt["item"], **_w))
        if kind == "map":
            return T.MapType(
                to_spark_type(dt["key"], **_w),
                to_spark_type(dt["value"], **_w),
            )
        if kind == "struct":
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        to_spark_type(f["dataType"], **_w),
                        bool(f.get("nullable", True)),
                    )
                    for f in dt["fields"]
                ]
            )
        if kind == "interval":
            unit = str(dt.get("unit", "")).lower()
            if unit == "yearmonth":
                return T.YearMonthIntervalType()
            if unit == "daytime":
                return T.DayTimeIntervalType()
            if unit == "monthdaynano":
                if widen_interval:
                    # LOSSLESS structural decode: no single Spark type
                    # carries months+days+nanos, so expose the exact
                    # Arrow components as a queryable struct
                    return T.StructType(
                        [
                            T.StructField("months", T.IntegerType(), True),
                            T.StructField("days", T.IntegerType(), True),
                            T.StructField("nanos", T.LongType(), True),
                        ]
                    )
                raise SchemaError(
                    "interval unit 'monthdaynano' has no single Spark analog "
                    "(pass widen_interval=True for the lossless "
                    "struct<months,days,nanos> decode)"
                )
            raise SchemaError(f"unsupported interval unit: {unit!r}")
        if kind == "union":
            if widen_union:
                # standard relational flattening of an Arrow union:
                # type_id tag + one nullable field per branch (lossless)
                branches = dt.get("fields") or []
                if not branches:
                    raise SchemaError("union with no branch fields")
                return T.StructType(
                    [T.StructField("type_id", T.ByteType(), False)]
                    + [
                        T.StructField(
                            str(f.get("name") or f"f{i}"),
                            to_spark_type(f["dataType"], **_w),
                            True,
                        )
                        for i, f in enumerate(branches)
                    ]
                )
            raise SchemaError(
                "Union types are not supported on Spark "
                "(pass widen_union=True for the lossless type-tagged "
                "struct-of-branches flattening)"
            )
        raise SchemaError(f"unknown structured dataType: {dt!r}")
    raise SchemaError(f"invalid dataType value: {dt!r}")


def to_struct_type(
    schema_json: dict,
    *,
    widen_decimal256: bool = False,
    widen_interval: bool = False,
    widen_union: bool = False,
) -> T.StructType:
    """Reference ``DataSourceSchema`` JSON -> StructType
    (schema.rs:419-432 equivalent)."""
    fields = schema_json.get("fields")
    if not isinstance(fields, list) or not fields:
        raise SchemaError("schema.fields must be a non-empty list")
    return T.StructType(
        [
            T.StructField(
                f["name"],
                to_spark_type(
                    f["dataType"],
                    widen_decimal256=widen_decimal256,
                    widen_interval=widen_interval,
                    widen_union=widen_union,
                ),
                bool(f.get("nullable", True)),
            )
            for f in fields
        ]
    )


_FROM_SPARK: dict[type, str] = {
    T.BooleanType: "Boolean",
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.StringType: "String",
    T.BinaryType: "Binary",
    T.DateType: "Date32",
}


def from_spark_type(dt: T.DataType) -> Any:
    """Spark DataType -> reference dataType JSON (for schema introspection
    responses; schema.rs:150-238 direction)."""
    if type(dt) in _FROM_SPARK:
        return _FROM_SPARK[type(dt)]
    if isinstance(dt, T.DecimalType):
        return {"type": "Decimal128", "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "Timestamp", "unit": "Microsecond"}
    if isinstance(dt, T.ArrayType):
        return {"type": "List", "item": from_spark_type(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {
            "type": "Map",
            "key": from_spark_type(dt.keyType),
            "value": from_spark_type(dt.valueType),
        }
    if isinstance(dt, T.StructType):
        return {
            "type": "Struct",
            "fields": [
                {"name": f.name, "dataType": from_spark_type(f.dataType), "nullable": f.nullable}
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.DayTimeIntervalType):
        return {"type": "Interval", "unit": "DayTime"}
    if isinstance(dt, T.YearMonthIntervalType):
        return {"type": "Interval", "unit": "YearMonth"}
    return "Unknown"


def struct_to_schema_json(st: T.StructType) -> dict:
    return {
        "fields": [
            {"name": f.name, "dataType": from_spark_type(f.dataType), "nullable": f.nullable}
            for f in st.fields
        ]
    }
