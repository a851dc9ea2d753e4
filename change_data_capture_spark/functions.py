"""Type-normalization scalar functions (T11/T12 compat surface).

The reference converts JDBC values to engine values with hand-written
per-type rules (``common/DBUtils.java:97-209``,
``source/sqlserver/ResultSetToDMLRecord.java:96-113``). Spark has
native types for all of them, so each rule is a single Catalyst cast
chain — JVM-side, codegen'd, no Python in the loop. The compat rules
are kept exactly (they are observable in the reference's output) and
each pairs with a lossless native alternative.

| rule | reference | here |
|---|---|---|
| DECIMAL scale!=0 -> DOUBLE, prec>9 -> LONG, else INT | DBUtils.java:131-137, 180-191 | ``compat_decimal`` |
| DATE -> epoch days | ResultSetToDMLRecord.java:96-99 | ``date_to_epoch_days`` |
| TIME -> micros of day | ResultSetToDMLRecord.java:101-104 | ``time_to_micros_of_day`` |
| TIMESTAMP -> epoch micros | ResultSetToDMLRecord.java:106-109 | ``timestamp_to_epoch_micros`` |
| TINYINT/SMALLINT -> INT | DBUtils.java:174-179 | ``integral_widen`` |
| BIT -> BOOLEAN, CLOB -> STRING, BLOB/BINARY -> BYTES | DBUtils.java:127-129, 198-205 | native casts (``jdbc_compat_cast``) |
| ARRAY/STRUCT/REF/SQLXML | rejected (DBUtils.java:157-165) | ``UnsupportedTypeException`` in compat mode |
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    TimestampType,
)

from .schema import compat_decimal_type


class UnsupportedTypeException(TypeError):
    """Compat-mode rejection of JDBC types the reference refuses
    (``DBUtils.java:157-165``)."""


def compat_decimal(col: Column, precision: int, scale: int) -> Column:
    """Reference decimal narrowing (``DBUtils.java:131-137``): lossy by
    design; use a plain ``DecimalType`` cast outside compat mode.
    Goes through an exact decimal first so stringified inputs with a
    fractional part truncate (the reference reads a BigDecimal) instead
    of failing the ANSI string->integral cast."""
    return col.cast("decimal(38,10)").cast(compat_decimal_type(precision, scale))


def date_to_epoch_days(col: Column) -> Column:
    """DATE -> int epoch days (``ResultSetToDMLRecord.java:96-99``)."""
    return F.datediff(col.cast(DateType()), F.lit("1970-01-01")).cast(IntegerType())


def epoch_days_to_date(col: Column) -> Column:
    return F.date_add(F.lit("1970-01-01"), col.cast(IntegerType()))


def time_to_micros_of_day(col: Column) -> Column:
    """TIME -> long micros-of-day (``ResultSetToDMLRecord.java:101-104``).
    Spark has no time-of-day type; a timestamp's clock part is used."""
    ts = col.cast(TimestampType())
    return (
        F.hour(ts).cast(LongType()) * 3_600_000_000
        + F.minute(ts).cast(LongType()) * 60_000_000
        + F.second(ts).cast(LongType()) * 1_000_000
        + (F.unix_micros(ts) % 1_000_000 + 1_000_000) % 1_000_000
    )


def timestamp_to_epoch_micros(col: Column) -> Column:
    """TIMESTAMP -> long epoch micros (``ResultSetToDMLRecord.java:106-109``)."""
    return F.unix_micros(col.cast(TimestampType()))


def epoch_micros_to_timestamp(col: Column) -> Column:
    return F.timestamp_micros(col.cast(LongType()))


def integral_widen(col: Column) -> Column:
    """TINYINT/SMALLINT -> INT (``DBUtils.java:174-179``)."""
    return col.cast(IntegerType())


_JDBC_COMPAT: dict[str, DataType | None] = {
    # jdbc type name -> spark compat type (None = computed elsewhere)
    "BIT": BooleanType(),
    "BOOLEAN": BooleanType(),
    "TINYINT": IntegerType(),
    "SMALLINT": IntegerType(),
    "INTEGER": IntegerType(),
    "BIGINT": LongType(),
    "REAL": FloatType(),
    "FLOAT": DoubleType(),
    "DOUBLE": DoubleType(),
    "CHAR": StringType(),
    "VARCHAR": StringType(),
    "LONGVARCHAR": StringType(),
    "NVARCHAR": StringType(),
    "CLOB": StringType(),
    "ROWID": StringType(),
    "BINARY": BinaryType(),
    "VARBINARY": BinaryType(),
    "LONGVARBINARY": BinaryType(),
    "BLOB": BinaryType(),
}

_REJECTED = {"ARRAY", "STRUCT", "REF", "SQLXML", "DATALINK", "DISTINCT", "JAVA_OBJECT"}


def jdbc_compat_type(
    jdbc_type: str, precision: int = 0, scale: int = 0
) -> DataType:
    """JDBC type name -> Spark type under reference compat rules
    (``DBUtils.java:97-169``). Raises ``UnsupportedTypeException`` for
    the types the reference rejects."""
    t = jdbc_type.upper()
    if t in _REJECTED:
        raise UnsupportedTypeException(f"unsupported JDBC type {jdbc_type}")
    if t in ("DECIMAL", "NUMERIC"):
        return compat_decimal_type(precision, scale)
    if t == "DATE":
        return IntegerType()  # epoch days
    if t == "TIME":
        return LongType()  # micros of day
    if t in ("TIMESTAMP", "DATETIME"):
        return LongType()  # epoch micros
    if t in _JDBC_COMPAT:
        return _JDBC_COMPAT[t]
    raise UnsupportedTypeException(f"unsupported JDBC type {jdbc_type}")


def jdbc_compat_cast(col: Column, jdbc_type: str, precision: int = 0, scale: int = 0) -> Column:
    """Value-level compat conversion for one column."""
    t = jdbc_type.upper()
    if t == "DATE":
        return date_to_epoch_days(col)
    if t == "TIME":
        return time_to_micros_of_day(col)
    if t in ("TIMESTAMP", "DATETIME"):
        return timestamp_to_epoch_micros(col)
    return col.cast(jdbc_compat_type(jdbc_type, precision, scale))


def pseudonym(col: Column | str, *, salt: str, length: int = 16) -> Column:
    """Deterministic pseudonymization token: salted SHA-256 prefix.
    The same input always maps to the same token (joins, sessionization
    and dedup keep working across tables) while the identity is not
    recoverable without the salt — the standard PII-safe key transform
    for training-data exports (distinct from ``forget_keys``' erasure
    and from ``pii_scan``'s free-text redaction). Identical in DuckDB:
    ``substr(sha256(salt || ':' || x), 1, length)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.sha2(F.concat(F.lit(salt), F.lit(":"), c.cast("string")), 256), 1, length
    )


def mask_email(col: Column | str, *, salt: str) -> Column:
    """Email-shaped pseudonymization: the local part becomes a salted
    token, the domain is preserved (domain-level corpus statistics —
    provider mix, spam domains — survive masking). Non-email strings
    (no '@') are fully tokenized."""
    c = F.col(col) if isinstance(col, str) else col
    at = F.instr(c, "@")
    local_token = pseudonym(c, salt=salt, length=12)
    return F.when(
        at > 0, F.concat(local_token, F.lit("@"), F.substring_index(c, "@", -1))
    ).otherwise(local_token)
