"""Column-expression helpers over the change-record envelope.

Analog of the reference's ``Schemas.toCDCRecord`` wrapping
(``common/Schemas.java:73-85``) and the sinks' row-key construction
(``sink/CDCTableUtil.java:98-105``), expressed as Catalyst column
expressions so they stay JVM-side / codegen-able (no Python UDFs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def wrap_ddl(df: DataFrame) -> DataFrame:
    """DDL rows (table, schema) -> changeRecord envelope (ddl set, dml null)."""
    return df.select(
        F.struct(F.col("table"), F.col("schema")).alias("ddl"),
        F.lit(None)
        .cast(
            "struct<op_type:string,table:string,primary_keys:array<string>,"
            "rows_schema:string,rows_values:map<string,string>,"
            "change_tracking_version:bigint,cdc_current_timestamp:bigint>"
        )
        .alias("dml"),
    )


def wrap_dml(df: DataFrame) -> DataFrame:
    """DML rows -> changeRecord envelope (dml set, ddl null)."""
    return df.select(
        F.lit(None).cast("struct<table:string,schema:string>").alias("ddl"),
        F.struct(
            F.col("op_type"),
            F.col("table"),
            F.col("primary_keys"),
            F.col("rows_schema"),
            F.col("rows_values"),
            F.col("change_tracking_version"),
            F.col("cdc_current_timestamp"),
        ).alias("dml"),
    )


def rowkey_expr(pk_cols: Sequence[str], value_of=None) -> Column:
    """Row key = PK *names sorted*, values joined with ':' — exact
    reference semantics (CDCTableUtil.java:98-105); this string defines
    row identity in the keyed sinks, so the sort-by-name rule is
    load-bearing for composite keys.

    ``value_of`` maps a pk column name to a Column (defaults to
    ``F.col``), letting callers key off ``rows_values['pk']`` etc.
    """
    value_of = value_of or F.col
    return F.concat_ws(":", *[value_of(c).cast("string") for c in sorted(pk_cols)])


def envelope_kind() -> Column:
    """0 for DDL, 1 for DML — the explicit ordering key that replaces
    the reference's implicit union-order DDL-before-DML guarantee
    (CTInputDStream.java:128-133). Sorting each micro-batch by
    (table, kind, version) makes the ordering hold under parallelism."""
    return F.when(F.col("ddl").isNotNull(), F.lit(0)).otherwise(F.lit(1))
