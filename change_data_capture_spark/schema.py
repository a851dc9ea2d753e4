"""Canonical change-record envelope and type rules.

Re-expresses the reference's envelope (reference
``common/Schemas.java:50-71``) as Spark ``StructType``s. Key design
decision carried over: *schemas travel inside the data* —
``rows_schema`` is a JSON-serialized Spark schema string and
``rows_values`` a ``map<string,string>`` of stringified values, so
one fixed envelope carries rows of any evolving table schema
(``Schemas.java:62``). Values are decoded at apply time with
``cast`` driven by the registered table schema.

Compat type rules preserved from the reference:
- op codes I/U/D parse to INSERT/UPDATE/DELETE
  (``common/OperationType.java:22-36``);
- table ids are ``namespace.table`` split on the first ``.``
  (``Schemas.java:87-89``);
- decimal compat mode: scale!=0 -> double, precision>9 -> long,
  else int (``common/DBUtils.java:131-137``) — lossy by design, kept
  behind ``compat_decimal_type`` so native DecimalType remains the
  default elsewhere.
"""

from __future__ import annotations

import json

from pyspark.sql.types import (
    ArrayType,
    DataType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

OP_INSERT = "INSERT"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"
OP_TYPES = (OP_INSERT, OP_UPDATE, OP_DELETE)

# Wire short names (reference OperationType.java:22-36).
_SHORT_OPS = {"I": OP_INSERT, "U": OP_UPDATE, "D": OP_DELETE}


def parse_op(op: str) -> str:
    """I/U/D or full names -> canonical op name; raises on junk."""
    op_u = op.upper()
    if op_u in _SHORT_OPS:
        return _SHORT_OPS[op_u]
    if op_u in OP_TYPES:
        return op_u
    raise ValueError(f"unknown op_type: {op!r}")


# DDLRecord (Schemas.java:50-54): full new column schema of `table`,
# serialized as a JSON string.
DDL_SCHEMA = StructType(
    [
        StructField("table", StringType(), False),
        StructField("schema", StringType(), False),
    ]
)

# DMLRecord (Schemas.java:56-65).
DML_SCHEMA = StructType(
    [
        StructField("op_type", StringType(), False),
        StructField("table", StringType(), False),
        StructField("primary_keys", ArrayType(StringType()), False),
        StructField("rows_schema", StringType(), False),
        StructField("rows_values", MapType(StringType(), StringType()), False),
        StructField("change_tracking_version", LongType(), False),
        StructField("cdc_current_timestamp", LongType(), True),  # epoch micros
    ]
)

# changeRecord (Schemas.java:67-71): tagged union — exactly one of
# ddl/dml is non-null.
CHANGE_SCHEMA = StructType(
    [
        StructField("ddl", DDL_SCHEMA, True),
        StructField("dml", DML_SCHEMA, True),
    ]
)


def split_table_id(table_id: str) -> tuple[str, str]:
    """'namespace.table' -> (namespace, table); bare name gets
    namespace 'default' (Schemas.java:87-89 takes the part after the
    first dot as the table name)."""
    if "." in table_id:
        ns, _, name = table_id.partition(".")
        return ns, name
    return "default", table_id


def compat_decimal_type(precision: int, scale: int) -> DataType:
    """Reference decimal compat mode (DBUtils.java:131-137)."""
    if scale != 0:
        return DoubleType()
    if precision > 9:
        return LongType()
    return IntegerType()


def native_decimal_type(precision: int, scale: int) -> DataType:
    """Spark-native lossless mapping (our default outside compat mode)."""
    return DecimalType(precision, scale)


def pk_compat_schema(schema: StructType, pks) -> StructType:
    """Keyed-store PK type restriction (CDCKudu.java:315-321): a
    primary-key column typed BOOLEAN, FLOAT, or DOUBLE is stored as
    STRING — those types cannot be key columns in the reference's
    sink, and the coercion is observable (it changes the stored value
    form and therefore row identity for float-keyed tables). Non-key
    columns keep their type."""
    from pyspark.sql.types import ArrayType, BooleanType, FloatType, MapType

    pk_set = set(pks or [])
    fields = []
    for f in schema.fields:
        if f.name in pk_set and isinstance(
            f.dataType, (ArrayType, MapType, StructType)
        ):
            # complex-typed columns travel as JSON in the envelope and
            # have no canonical scalar form for row identity / bucket
            # hashing — fail at registration, not as silent misroutes
            raise ValueError(
                f"primary-key column {f.name!r} has complex type "
                f"{f.dataType.simpleString()}; complex types cannot be "
                "key columns (store a scalar surrogate or a hash)"
            )
        if f.name in pk_set and isinstance(
            f.dataType, (BooleanType, FloatType, DoubleType)
        ):
            fields.append(StructField(f.name, StringType(), f.nullable, f.metadata))
        else:
            fields.append(f)
    return StructType(fields)


def schema_to_json(schema: StructType) -> str:
    return schema.json()


def schema_from_json(schema_json: str) -> StructType:
    return StructType.fromJson(json.loads(schema_json))
