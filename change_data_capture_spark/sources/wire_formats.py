"""Maxwell and AWS DMS change-event decode: the other two dominant
open CDC JSON wire formats, decoded into this engine's canonical
envelope alongside Debezium (``sources/debezium.py``).

The reference speaks SQL Server Change Tracking polls and GoldenGate's
Avro wrapper; real estates almost always also run Maxwell (the
standard MySQL binlog daemon) and/or AWS DMS (the managed migration
service, publishing to Kinesis/Kafka/S3). Accepting their formats
natively means a user can point ANY of the four feeds at the same
normalize -> apply engine. Formats per the public documentation:

Maxwell (maxwells-daemon.io "dataformat"):

  {"database": "db", "table": "t",
   "type": "insert"|"update"|"delete"|"bootstrap-insert"
          |"bootstrap-start"|"bootstrap-complete"|"table-create"|...,
   "ts": <commit epoch seconds>, "xid": <txn id>, "commit": true,
   "data": {col: val, ...},          # full row image
   "old":  {col: prev_val, ...}}     # update only: CHANGED columns'
                                     # previous values (incl. a PK if
                                     # the update moved the key)

AWS DMS (Kinesis/Kafka target record format):

  {"data": {col: val, ...},
   "before-image": {col: val, ...},  # only with BeforeImageSettings
   "metadata": {"timestamp": "2016-12-30T00:53:37.113Z",
                "record-type": "data"|"control",
                "operation": "load"|"insert"|"update"|"delete"
                            |"create-table"|...,
                "schema-name": "s", "table-name": "t",
                "transaction-id": <id>}}

Both decode with ONE from_json schema each — pure Catalyst, narrow
map stage, no Python (same plan discipline as debezium.py). Images
parse as map<string,string>: Catalyst renders scalar JSON tokens to
their literal text, the stringified-values contract of rows_values.

Mapping into the raw-op frame (normalize.RAW_OP_DDL contract):
- Maxwell: insert/bootstrap-insert -> INSERT, update -> UPDATE,
  delete -> DELETE. ``data`` is always the (post) full row; the UPDATE
  before image is reconstructed as ``data`` overridden by ``old``
  (old wins for its keys), which restores PK-update-split fidelity —
  Maxwell includes a moved PK's previous value in ``old``, so
  ``normalize_raw_ops`` emits DELETE(old key) + INSERT(new key)
  exactly as for the GoldenGate and Debezium feeds. Bootstrap
  start/complete markers, DDL events (table-create/alter/drop) and
  any other type are dropped (dead-letter them via
  ``maxwell_dead_letters``).
- DMS: load/insert -> INSERT, update -> UPDATE, delete -> DELETE;
  ``record-type: control`` rows (DDL notifications) are dropped.
  ``data`` is the post image; ``before-image`` rides along when the
  task enables it, restoring PK-update splits there too.
- Change version: Maxwell commit seconds carry sub-second txn order in
  ``xid``, so the default version is ``ts * 1_000_000 + xid mod 1e6``
  (documented heuristic; pass ``version_expr`` for a binlog-position
  feed). DMS timestamps are ISO millis -> epoch micros.
- Primary keys live outside both wire formats (Maxwell: in the Kafka
  message key as configured by ``kafka_key_format``; DMS: in the
  task's table mappings), so the decoders take the same per-table key
  map the reference requires as config; unlisted tables are dropped
  (whitelist semantics, CTInputDStream.java:230 / T9).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAXWELL_SCHEMA = (
    "`database` string, `table` string, `type` string, ts bigint, "
    "xid bigint, `commit` boolean, data map<string,string>, "
    "old map<string,string>"
)

_MAXWELL_OPS = {"insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D"}

_DMS_SCHEMA = (
    "data map<string,string>, `before-image` map<string,string>, "
    "metadata struct<`timestamp`:string,`record-type`:string,"
    "operation:string,`schema-name`:string,`table-name`:string,"
    "`transaction-id`:bigint>"
)

_DMS_OPS = {"load": "I", "insert": "I", "update": "U", "delete": "D"}


def _keys_and_schemas(
    table_id: Column,
    table_keys: Mapping[str, Sequence[str]],
    rows_schemas: Mapping[str, str] | None,
) -> tuple[Column, Column]:
    keys = F.lit(None).cast("array<string>")
    schemas = F.lit(None).cast("string")
    for t, pks in table_keys.items():
        keys = F.when(table_id == t, F.array(*[F.lit(p) for p in pks])).otherwise(keys)
    for t, sj in (rows_schemas or {}).items():
        schemas = F.when(table_id == t, F.lit(sj)).otherwise(schemas)
    return keys, schemas


def maxwell_raw_ops(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    rows_schemas: Mapping[str, str] | None = None,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """Maxwell JSON messages -> raw-op rows (normalize.RAW_OP_DDL)."""
    m = messages.select(F.from_json(F.col(message_col), _MAXWELL_SCHEMA).alias("__m"))
    table_id = F.concat_ws(".", F.col("__m.database"), F.col("__m.table"))
    typ = F.col("__m.type")
    op = F.lit(None).cast("string")
    for mx, short in _MAXWELL_OPS.items():
        op = F.when(typ == mx, F.lit(short)).otherwise(op)
    data = F.col("__m.data")
    old = F.col("__m.old")
    # UPDATE before image = data overridden by old (old wins): Maxwell's
    # `old` holds the previous values of exactly the changed columns,
    # so the merge reconstructs the full preimage — including a moved
    # primary key, which is what lets normalize_raw_ops run its
    # PK-update split on this feed. Per-row map ops on the narrow
    # decode stage only — never in a join/agg hot path.
    before_merged = F.map_concat(
        F.map_filter(data, lambda k, _: ~F.array_contains(F.map_keys(old), k)), old
    )
    before = (
        F.when(op == "D", data)
        .when((op == "U") & old.isNotNull(), before_merged)
        .otherwise(F.lit(None).cast("map<string,string>"))
    )
    after = F.when(op == "D", F.lit(None).cast("map<string,string>")).otherwise(data)
    version = (
        version_expr
        if version_expr is not None
        else F.col("__m.ts").cast("bigint") * 1_000_000
        + F.pmod(F.coalesce(F.col("__m.xid"), F.lit(0)), F.lit(1_000_000))
    )
    keys, schemas = _keys_and_schemas(table_id, table_keys, rows_schemas)
    return (
        m.filter(typ.isin(*_MAXWELL_OPS) & F.col("__m.data").isNotNull())
        .select(
            table_id.alias("table"),
            op.alias("op_type"),
            keys.alias("primary_keys"),
            before.alias("before"),
            after.alias("after"),
            schemas.alias("rows_schema"),
            version.cast("bigint").alias("change_tracking_version"),
            (F.col("__m.ts").cast("bigint") * 1_000_000).alias("cdc_current_timestamp"),
        )
        .filter(F.col("primary_keys").isNotNull())
        # a NULL version is unusable: it would apply on the create path
        # but silently vanish behind any later watermark (NULL > x is
        # NULL) — drop it here; the DLQ names it missing_version (r7)
        .filter(F.col("change_tracking_version").isNotNull())
    )


def maxwell_dead_letters(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """Rows ``maxwell_raw_ops`` drops, with a reason — same quarantine
    contract as ``debezium_dead_letters``: 'unparseable' (no
    database/type at all), 'unsupported_op' (bootstrap markers, DDL
    events, unknown types), 'unknown_table' (not whitelisted),
    'missing_data', 'missing_version' (no ts field). Pass the SAME
    ``version_expr`` given to ``maxwell_raw_ops`` so missing_version
    keys on the EFFECTIVE version expression (r8, ADVICE)."""
    m = messages.select(
        F.col(message_col).alias("message"),
        F.from_json(F.col(message_col), _MAXWELL_SCHEMA).alias("__m"),
    )
    typ = F.col("__m.type")
    table_id = F.concat_ws(".", F.col("__m.database"), F.col("__m.table"))
    known = table_id.isin(*table_keys) if table_keys else F.lit(False)
    reason = (
        F.when(typ.isNull() | F.col("__m.database").isNull(), F.lit("unparseable"))
        .when(~typ.isin(*_MAXWELL_OPS), F.lit("unsupported_op"))
        .when(~known, F.lit("unknown_table"))
        # a supported op with no row image is also dropped by the
        # decoder (data.isNotNull() filter) — it must land here, not
        # vanish from both outputs
        .when(F.col("__m.data").isNull(), F.lit("missing_data"))
        .when(
            (
                version_expr.try_cast("bigint")
                if version_expr is not None
                else F.col("__m.ts")
            ).isNull(),
            F.lit("missing_version"),
        )
    )
    return m.select(
        "message", reason.alias("reason"), typ.alias("op"), table_id.alias("table")
    ).filter(F.col("reason").isNotNull())


def dms_dead_letters(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """Rows ``dms_raw_ops`` drops, with a reason — the complement
    quarantine frame: 'unparseable' (no metadata at all), 'control'
    (DDL notification records), 'unsupported_op', 'unknown_table',
    'missing_data' (data-typed record with no row image),
    'missing_version' (no parseable metadata timestamp). Pass the SAME
    ``version_expr`` given to ``dms_raw_ops`` so missing_version keys
    on the EFFECTIVE version expression (r8, ADVICE)."""
    m = messages.select(
        F.col(message_col).alias("message"),
        F.from_json(F.col(message_col), _DMS_SCHEMA).alias("__m"),
    )
    md = F.col("__m.metadata")
    table_id = F.concat_ws(".", md["schema-name"], md["table-name"])
    op_raw = md["operation"]
    known = table_id.isin(*table_keys) if table_keys else F.lit(False)
    reason = (
        F.when(md.isNull() | md["record-type"].isNull(), F.lit("unparseable"))
        .when(md["record-type"] != "data", F.lit("control"))
        .when(~op_raw.isin(*_DMS_OPS), F.lit("unsupported_op"))
        .when(~known, F.lit("unknown_table"))
        .when(F.col("__m.data").isNull(), F.lit("missing_data"))
        .when(
            (
                version_expr.try_cast("bigint")
                if version_expr is not None
                else F.try_to_timestamp(md["timestamp"])
            ).isNull(),
            F.lit("missing_version"),
        )
    )
    return m.select(
        "message", reason.alias("reason"), op_raw.alias("op"), table_id.alias("table")
    ).filter(F.col("reason").isNotNull())


def dms_raw_ops(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    rows_schemas: Mapping[str, str] | None = None,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """AWS DMS JSON messages -> raw-op rows (normalize.RAW_OP_DDL)."""
    m = messages.select(F.from_json(F.col(message_col), _DMS_SCHEMA).alias("__m"))
    md = F.col("__m.metadata")
    table_id = F.concat_ws(".", md["schema-name"], md["table-name"])
    op_raw = md["operation"]
    op = F.lit(None).cast("string")
    for d, short in _DMS_OPS.items():
        op = F.when(op_raw == d, F.lit(short)).otherwise(op)
    data = F.col("__m.data")
    pre = F.col("__m.`before-image`")
    before = (
        F.when(op == "D", data)
        .when((op == "U") & pre.isNotNull(), pre)
        .otherwise(F.lit(None).cast("map<string,string>"))
    )
    after = F.when(op == "D", F.lit(None).cast("map<string,string>")).otherwise(data)
    # Pattern-less parse: Spark's ISO-8601 reader accepts DMS
    # timestamps at any fractional precision (none/millis/micros all
    # occur across DMS target versions); a fixed SSS pattern would
    # fail the job on the micros form. try_to_timestamp, because under
    # ANSI a plain to_timestamp THROWS on one malformed timestamp
    # string and kills the whole apply job (r7 review) — the record
    # quarantines as missing_version instead.
    ts_micros = F.unix_micros(F.try_to_timestamp(md["timestamp"]))
    version = version_expr if version_expr is not None else ts_micros
    keys, schemas = _keys_and_schemas(table_id, table_keys, rows_schemas)
    return (
        m.filter(
            (md["record-type"] == "data") & op_raw.isin(*_DMS_OPS) & data.isNotNull()
        )
        .select(
            table_id.alias("table"),
            op.alias("op_type"),
            keys.alias("primary_keys"),
            before.alias("before"),
            after.alias("after"),
            schemas.alias("rows_schema"),
            version.cast("bigint").alias("change_tracking_version"),
            ts_micros.alias("cdc_current_timestamp"),
        )
        .filter(F.col("primary_keys").isNotNull())
        # a NULL version is unusable: it would apply on the create path
        # but silently vanish behind any later watermark (NULL > x is
        # NULL) — drop it here; the DLQ names it missing_version (r7)
        .filter(F.col("change_tracking_version").isNotNull())
    )


def table_changes_to_maxwell(
    changes: DataFrame, *, table: str, ts: Column | int = 0
) -> DataFrame:
    """Outbound Maxwell: render a change-data-feed frame
    (``TableCatalog.table_changes`` output) as Maxwell JSON messages —
    insert -> type 'insert' (data = row), update_postimage -> 'update'
    (data = post row; the CDF carries no preimage so ``old`` is
    omitted, which Maxwell consumers accept — an empty old means
    'treat data as the row'), delete -> 'delete' (data = old row,
    exactly the daemon's convention). Pure projection, no shuffle."""
    db, _, tbl = table.partition(".")
    cols = [c for c in changes.columns if c != "_change_type"]
    full = F.struct(*[F.col(c) for c in cols])
    typ = (
        F.when(F.col("_change_type") == "insert", F.lit("insert"))
        .when(F.col("_change_type") == "update_postimage", F.lit("update"))
        .when(F.col("_change_type") == "delete", F.lit("delete"))
    )
    body = F.struct(
        F.lit(db).alias("database"),
        F.lit(tbl).alias("table"),
        typ.alias("type"),
        (F.lit(ts) if isinstance(ts, int) else ts).cast("long").alias("ts"),
        F.lit(0).cast("long").alias("xid"),
        F.lit(True).alias("commit"),
        full.alias("data"),
        F.lit(None).cast("string").alias("old"),
    )
    return changes.select(F.to_json(body, {"ignoreNullFields": "false"}).alias("message"))


def table_changes_to_dms(
    changes: DataFrame, *, table: str, timestamp: str = "1970-01-01T00:00:00.001Z"
) -> DataFrame:
    """Outbound AWS DMS: render a change-data-feed frame as DMS target
    records — insert/update_postimage/delete map to operation
    insert/update/delete with ``data`` carrying the appropriate image
    (post for upserts, old row for deletes, per the DMS record
    layout). Pure projection, no shuffle."""
    schema_name, _, tbl = table.partition(".")
    cols = [c for c in changes.columns if c != "_change_type"]
    full = F.struct(*[F.col(c) for c in cols])
    op = (
        F.when(F.col("_change_type") == "insert", F.lit("insert"))
        .when(F.col("_change_type") == "update_postimage", F.lit("update"))
        .when(F.col("_change_type") == "delete", F.lit("delete"))
    )
    md = F.struct(
        F.lit(timestamp).alias("timestamp"),
        F.lit("data").alias("record-type"),
        op.alias("operation"),
        F.lit(schema_name).alias("schema-name"),
        F.lit(tbl).alias("table-name"),
        F.lit(0).cast("long").alias("transaction-id"),
    )
    body = F.struct(
        full.alias("data"),
        F.lit(None).cast("string").alias("before-image"),
        md.alias("metadata"),
    )
    return changes.select(F.to_json(body, {"ignoreNullFields": "false"}).alias("message"))


def encode_maxwell_json(
    rows: DataFrame,
    *,
    table: str,
    typ: str,
    data: Column,
    old: Column | None = None,
    ts: Column | int = 1,
    xid: Column | int = 0,
) -> DataFrame:
    """Render rows as Maxwell JSON messages (test/replay utility).
    ``data``/``old`` are struct columns — typed values serialize
    unquoted exactly like the daemon's output."""
    db, _, tbl = table.partition(".")
    body = F.struct(
        F.lit(db).alias("database"),
        F.lit(tbl).alias("table"),
        F.lit(typ).alias("type"),
        (F.lit(ts) if isinstance(ts, int) else ts).cast("long").alias("ts"),
        (F.lit(xid) if isinstance(xid, int) else xid).cast("long").alias("xid"),
        F.lit(True).alias("commit"),
        data.alias("data"),
        (old if old is not None else F.lit(None)).alias("old"),
    )
    return rows.select(F.to_json(body, {"ignoreNullFields": "false"}).alias("message"))


def encode_dms_json(
    rows: DataFrame,
    *,
    table: str,
    operation: str,
    data: Column,
    before_image: Column | None = None,
    timestamp: str = "1970-01-01T00:00:00.001Z",
    record_type: str = "data",
) -> DataFrame:
    """Render rows as AWS DMS JSON messages (test/replay utility)."""
    schema_name, _, tbl = table.partition(".")
    md = F.struct(
        F.lit(timestamp).alias("timestamp"),
        F.lit(record_type).alias("record-type"),
        F.lit(operation).alias("operation"),
        F.lit(schema_name).alias("schema-name"),
        F.lit(tbl).alias("table-name"),
        F.lit(0).cast("long").alias("transaction-id"),
    )
    body = F.struct(
        data.alias("data"),
        (before_image if before_image is not None else F.lit(None)).alias(
            "before-image"
        ),
        md.alias("metadata"),
    )
    return rows.select(F.to_json(body, {"ignoreNullFields": "false"}).alias("message"))
