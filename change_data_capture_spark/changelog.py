"""Deterministic change-log generators.

The reference's sources emit a stream of change records (SQL Server
Change Tracking polls, ``source/sqlserver/CTInputDStream.java:73-135``;
GoldenGate Kafka, ``source/oracle/GoldenGateKafka.java:117-140``).
For the test/bench harness we synthesize equivalent change logs from
the driver's parquet fixtures: a *snapshot* log (one DDL + one INSERT
per row) whose application must reproduce the table exactly, and
deterministic *mutation* logs (UPDATE / DELETE / PK-update suffixes)
derived purely from key arithmetic so a SQL oracle can reproduce the
expected final state.

Everything here builds Catalyst column expressions — generation is a
distributed job, never a driver loop, so a 100 TB table snapshots into
a change log at full cluster parallelism.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

from .envelope import wrap_ddl, wrap_dml
from .schema import OP_DELETE, OP_INSERT, OP_UPDATE

# Fixed, deterministic wall-clock origin for cdc_current_timestamp
# (epoch micros). The reference stamps CURRENT_TIMESTAMP
# (CTInputDStream.java:161); we need reproducible logs.
TS_ORIGIN_MICROS = 1_700_000_000_000_000


def _ts_expr(version: Column) -> Column:
    return (F.lit(TS_ORIGIN_MICROS) + version.cast("long")).cast("long")


def ddl_record(
    spark: SparkSession, table_id: str, schema_json: str
) -> DataFrame:
    """One DDL change record announcing `table_id`'s full column schema
    (reference ResultSetToDDLRecord.java:44-50)."""
    df = spark.createDataFrame([(table_id, schema_json)], "table string, schema string")
    return wrap_ddl(df)


def dml_records(
    df: DataFrame,
    table_id: str,
    pks: Sequence[str],
    *,
    op: str | Column = OP_INSERT,
    version: Column | int = 1,
    value_overrides: Mapping[str, Column] | None = None,
    keys_only: bool = False,
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows of ``df`` -> DML change records in the envelope.

    - ``op`` may be a per-row Column ('INSERT'/'UPDATE'/'DELETE').
    - ``version`` may be a per-row Column (monotone change sequence).
    - ``value_overrides`` replaces selected column values (for UPDATE
      logs) before stringification.
    - ``keys_only`` emits only PK values in rows_values (DELETE
      semantics: non-key columns null, per reference golden test
      CTSQLServerPluginIntegrationTest.java:308-317).
    - ``value_cols`` restricts rows_values to an explicit column list
      (so a per-row version/op Column can ride on ``df`` without
      leaking into the payload); default is every column of ``df``.
    """
    version_col = F.lit(version).cast("long") if isinstance(version, int) else version.cast("long")
    op_col = F.lit(op) if isinstance(op, str) else op
    overrides = dict(value_overrides or {})

    cols = list(pks) if keys_only else (
        list(value_cols) if value_cols is not None else df.columns
    )
    types = {f.name: f.dataType for f in df.schema.fields}
    kv: list[Column] = []
    for c in cols:
        v = overrides.get(c, F.col(c))
        # Complex-typed columns (array/struct/map — embedding vectors,
        # nested payloads) travel as JSON strings in the envelope's
        # map<string,string>, exactly as Debezium carries nested data;
        # decode_rows from_json's them back through the registered
        # schema. Scalars keep the canonical cast-to-string form the
        # rowkey/bucket machinery depends on.
        if isinstance(types.get(c), (ArrayType, MapType, StructType)):
            kv.append(F.lit(c))
            kv.append(F.to_json(v))
        else:
            kv.append(F.lit(c))
            kv.append(v.cast("string"))

    rows_schema_json = df.select(*cols).schema.json()

    dml = df.select(
        op_col.alias("op_type"),
        F.lit(table_id).alias("table"),
        F.array(*[F.lit(p) for p in pks]).alias("primary_keys"),
        F.lit(rows_schema_json).alias("rows_schema"),
        F.create_map(*kv).alias("rows_values"),
        version_col.alias("change_tracking_version"),
        _ts_expr(version_col).alias("cdc_current_timestamp"),
    )
    return wrap_dml(dml)


def snapshot_changelog(
    df: DataFrame,
    table_id: str,
    pks: Sequence[str],
    *,
    insert_version: Column | int = 1,
) -> DataFrame:
    """DDL + full-table INSERT log; applying it reproduces ``df``."""
    spark = df.sparkSession
    ddl = ddl_record(spark, table_id, df.schema.json())
    inserts = dml_records(df, table_id, pks, op=OP_INSERT, version=insert_version)
    return ddl.unionByName(inserts)


def mutation_changelog(
    df: DataFrame,
    table_id: str,
    pks: Sequence[str],
    *,
    update_where: Column | None = None,
    update_set: Mapping[str, Column] | None = None,
    update_version: Column | int = 2,
    delete_where: Column | None = None,
    delete_version: Column | int = 3,
) -> DataFrame:
    """Deterministic UPDATE/DELETE suffix over ``df``'s current rows.

    Caller supplies pure-key-arithmetic predicates so a SQL oracle can
    replay the same mutations (FIXTURES.md §3 'mutation fixture').
    """
    parts: list[DataFrame] = []
    if update_where is not None:
        parts.append(
            dml_records(
                df.filter(update_where),
                table_id,
                pks,
                op=OP_UPDATE,
                version=update_version,
                value_overrides=update_set,
            )
        )
    if delete_where is not None:
        parts.append(
            dml_records(
                df.filter(delete_where),
                table_id,
                pks,
                op=OP_DELETE,
                version=delete_version,
                keys_only=True,
            )
        )
    if not parts:
        raise ValueError("mutation_changelog needs update_where and/or delete_where")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
