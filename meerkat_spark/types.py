"""KQL ↔ Spark type mapping.

The reference's column type system is exactly the KQL scalar type set
(reference src/store/segment_metadata.proto:17-28 and generated
src/store/segment_metadata.rs:131-142). This module is the single place
that encodes the mapping used by the engine, `getschema`, the ingest
path's schema enforcement, and the KQL front-end's cast functions.

Deltas vs the reference, by design (SURVEY.md §1.2):
- KQL datetime is 100ns ticks; Spark TimestampType is µs. Accepted
  precision loss, documented.
- `dynamic` is carried as a JSON string column (StringType) and accessed
  with get_json_object/from_json; Spark 4's VariantType is a future
  upgrade path.
- `guid` is carried as canonical lowercase string.
- `timespan` is carried as DayTimeIntervalType where interval arithmetic
  is needed and as long microseconds where aggregated.
"""

from __future__ import annotations

from pyspark.sql import types as T

# KQL type name -> Spark DataType
KQL_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "datetime": T.TimestampType(),
    "date": T.TimestampType(),
    "decimal": T.DecimalType(38, 18),
    "dynamic": T.StringType(),  # JSON-encoded
    "guid": T.StringType(),
    "uuid": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "real": T.DoubleType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timespan": T.DayTimeIntervalType(),
    "time": T.DayTimeIntervalType(),
}

# Spark DataType class name -> KQL type name (for getschema)
_SPARK_TO_KQL: dict[str, str] = {
    "BooleanType": "bool",
    "TimestampType": "datetime",
    "TimestampNTZType": "datetime",
    "DateType": "datetime",
    "DecimalType": "decimal",
    "IntegerType": "int",
    "ShortType": "int",
    "ByteType": "int",
    "LongType": "long",
    "DoubleType": "real",
    "FloatType": "real",
    "StringType": "string",
    "DayTimeIntervalType": "timespan",
}


def spark_to_kql(dt: T.DataType) -> str:
    """KQL name for a Spark type; nested/array/map types surface as dynamic."""
    name = type(dt).__name__
    if name in _SPARK_TO_KQL:
        return _SPARK_TO_KQL[name]
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "dynamic"
    return "dynamic"


def kql_to_spark(name: str) -> T.DataType:
    try:
        return KQL_TO_SPARK[name.lower()]
    except KeyError:
        raise ValueError(f"unknown KQL type: {name!r}") from None
