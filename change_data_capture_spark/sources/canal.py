"""Alibaba Canal FlatMessage decode: the fifth open CDC wire format
through the shared normalize -> apply engine (alongside GoldenGate,
Debezium — ``sources/debezium.py`` — and Maxwell/DMS —
``sources/wire_formats.py``).

Canal is the dominant MySQL binlog daemon in the Alibaba/RocketMQ
ecosystem; its Kafka/RocketMQ "flatMessage" JSON layout (public docs:
github.com/alibaba/canal, FlatMessage.java) is:

  {"data": [ {col: "val", ...}, ... ],   # ARRAY of row images —
                                          # Canal batches multi-row
                                          # statements in ONE message
   "database": "db", "table": "t",
   "type": "INSERT"|"UPDATE"|"DELETE"|"CREATE"|"ALTER"|"ERASE"|...,
   "isDdl": false,
   "es": <source binlog event time, epoch MILLIS>,
   "ts": <canal delivery time, epoch MILLIS>,
   "id": <canal batch id>,
   "old": [ {changed_col: "prev", ...}, ... ],  # UPDATE only: per-row
                                          # previous values of exactly
                                          # the changed columns,
                                          # index-aligned with data
   "pkNames": ["id"], "sql": "",
   "mysqlType": {...}, "sqlType": {...}}

All row values are ALREADY strings in the wire format (Canal
stringifies), which matches the engine's rows_values contract
directly. Decode is one ``from_json`` + one ``posexplode`` of the
row-image array — pure Catalyst narrow stages, no Python, same plan
discipline as the other four decoders.

Mapping into the raw-op frame (normalize.RAW_OP_DDL contract,
reference parity: ResultSetToDMLRecord CTSQLServer.java:271-320):
- INSERT -> I (after = row), DELETE -> D (before = row), UPDATE -> U
  with the before image reconstructed as ``data[i]`` overridden by
  ``old[i]`` (old wins for its keys) — Canal includes a moved primary
  key's previous value in ``old``, so ``normalize_raw_ops`` performs
  its PK-update split on this feed exactly as for the others.
- ``isDdl: true`` messages (CREATE/ALTER/ERASE/QUERY...) are dropped
  here and surfaced by ``canal_dead_letters`` — schema drift instead
  flows through ``debezium.evolve_from_observed_columns``, which works
  on any raw-op frame.
- Change version: ``es`` millis carry sub-ms batch order in ``id``,
  so the default version is ``es * 1000 + id mod 1000`` micros
  (documented heuristic, same shape as the Maxwell ts/xid rule; pass
  ``version_expr`` for a binlog-position feed).
- Canal DOES ship ``pkNames`` in-band, but the engine keys on the
  configured per-table map like every other decoder: ``table_keys``
  is both the whitelist (unlisted tables dropped,
  CTInputDStream.java:230 / T9) and the authoritative key list, so a
  misconfigured upstream daemon cannot silently re-key a table.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .wire_formats import _keys_and_schemas

_CANAL_SCHEMA = (
    "`data` array<map<string,string>>, `database` string, es bigint, "
    "id bigint, isDdl boolean, old array<map<string,string>>, "
    "pkNames array<string>, `sql` string, `table` string, ts bigint, "
    "`type` string"
)

_CANAL_OPS = {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}


def canal_raw_ops(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    rows_schemas: Mapping[str, str] | None = None,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """Canal flatMessage JSON -> raw-op rows (normalize.RAW_OP_DDL).

    One message may carry N row images; the decode posexplodes the
    ``data`` array and pairs each row with its index-aligned ``old``
    entry via a null-safe 0-based ``get`` (absent for inserts/deletes,
    and defensively for a malformed short ``old``).
    """
    m = messages.select(
        F.from_json(F.col(message_col), _CANAL_SCHEMA).alias("__m")
    )
    typ = F.col("__m.type")
    flat = (
        m.filter(
            typ.isin(*_CANAL_OPS)
            & ~F.coalesce(F.col("__m.isDdl"), F.lit(False))
            & F.col("__m.data").isNotNull()
        )
        .select(
            F.col("__m"),
            F.posexplode(F.col("__m.data")).alias("__pos", "__row"),
        )
        # a null ELEMENT inside the data array must not become a
        # keyless op row — it drops here and surfaces in
        # canal_dead_letters as 'null_row'
        .filter(F.col("__row").isNotNull())
    )
    table_id = F.concat_ws(".", F.col("__m.database"), F.col("__m.table"))
    op = F.lit(None).cast("string")
    for c, short in _CANAL_OPS.items():
        op = F.when(typ == c, F.lit(short)).otherwise(op)
    row = F.col("__row")
    old_row = F.get(F.col("__m.old"), F.col("__pos"))
    # UPDATE before image = row overridden by old (old wins): `old`
    # holds previous values of exactly the changed columns, so the
    # merge restores the full preimage — including a moved PK, which
    # is what lets normalize_raw_ops split the update. Same rule as
    # the Maxwell decoder (wire_formats.maxwell_raw_ops).
    before_merged = F.map_concat(
        F.map_filter(row, lambda k, _: ~F.array_contains(F.map_keys(old_row), k)),
        old_row,
    )
    before = (
        F.when(op == "D", row)
        .when((op == "U") & old_row.isNotNull(), before_merged)
        .otherwise(F.lit(None).cast("map<string,string>"))
    )
    after = F.when(op == "D", F.lit(None).cast("map<string,string>")).otherwise(row)
    version = (
        version_expr
        if version_expr is not None
        else F.col("__m.es").cast("bigint") * 1000
        + F.pmod(F.coalesce(F.col("__m.id"), F.lit(0)), F.lit(1000))
    )
    keys, schemas = _keys_and_schemas(table_id, table_keys, rows_schemas)
    return (
        flat.select(
            table_id.alias("table"),
            op.alias("op_type"),
            keys.alias("primary_keys"),
            before.alias("before"),
            after.alias("after"),
            schemas.alias("rows_schema"),
            version.cast("bigint").alias("change_tracking_version"),
            (F.col("__m.es").cast("bigint") * 1000).alias("cdc_current_timestamp"),
        )
        .filter(F.col("primary_keys").isNotNull())
        # a NULL version is unusable: it would apply on the create path
        # but silently vanish behind any later watermark (NULL > x is
        # NULL) — drop it here; the DLQ names it missing_version (r7)
        .filter(F.col("change_tracking_version").isNotNull())
    )


def canal_dead_letters(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """Rows ``canal_raw_ops`` drops, with a reason — the same
    quarantine contract as the Maxwell/DMS/Debezium dead-letter
    frames: 'unparseable' (no database/type at all), 'ddl'
    (``isDdl: true`` — CREATE/ALTER/ERASE/QUERY events),
    'unsupported_op', 'unknown_table', 'missing_data' (a DML-typed
    message with a null or empty row-image array), 'null_row',
    'missing_version' (no es event time). Pass the SAME
    ``version_expr`` given to ``canal_raw_ops`` so missing_version
    keys on the EFFECTIVE version expression (r8, ADVICE)."""
    m = messages.select(
        F.col(message_col).alias("message"),
        F.from_json(F.col(message_col), _CANAL_SCHEMA).alias("__m"),
    )
    typ = F.col("__m.type")
    table_id = F.concat_ws(".", F.col("__m.database"), F.col("__m.table"))
    known = table_id.isin(*table_keys) if table_keys else F.lit(False)
    reason = (
        F.when(typ.isNull() | F.col("__m.database").isNull(), F.lit("unparseable"))
        .when(F.coalesce(F.col("__m.isDdl"), F.lit(False)), F.lit("ddl"))
        .when(~typ.isin(*_CANAL_OPS), F.lit("unsupported_op"))
        .when(~known, F.lit("unknown_table"))
        .when(
            F.col("__m.data").isNull() | (F.size(F.col("__m.data")) == 0),
            F.lit("missing_data"),
        )
        # a null element inside a non-empty data array: the decoder
        # drops that row image (it has no key values) — quarantine the
        # message rather than letting the drop be silent
        .when(
            F.exists(F.col("__m.data"), lambda r: r.isNull()), F.lit("null_row")
        )
        .when(
            (
                version_expr.try_cast("bigint")
                if version_expr is not None
                else F.col("__m.es")
            ).isNull(),
            F.lit("missing_version"),
        )
    )
    return m.select(
        "message", reason.alias("reason"), typ.alias("op"), table_id.alias("table")
    ).filter(F.col("reason").isNotNull())


def table_changes_to_canal(
    changes: DataFrame,
    *,
    table: str,
    pk_names: Sequence[str],
    es: Column | int = 0,
    batch_id: Column | int = 0,
) -> DataFrame:
    """Outbound Canal: render a change-data-feed frame
    (``TableCatalog.table_changes`` output) as flatMessage JSON —
    insert -> INSERT (data = [row]), update_postimage -> UPDATE
    (data = [post row]; the CDF carries no preimage so ``old`` is
    omitted, which consumers treat as 'whole row changed'), delete ->
    DELETE (data = [old row], the daemon's convention). One row per
    message; pure projection, no shuffle."""
    db, _, tbl = table.partition(".")
    cols = [c for c in changes.columns if c != "_change_type"]
    full = F.struct(*[F.col(c) for c in cols])
    typ = (
        F.when(F.col("_change_type") == "insert", F.lit("INSERT"))
        .when(F.col("_change_type") == "update_postimage", F.lit("UPDATE"))
        .when(F.col("_change_type") == "delete", F.lit("DELETE"))
    )
    body = F.struct(
        F.array(full).alias("data"),
        F.lit(db).alias("database"),
        (F.lit(es) if isinstance(es, int) else es).cast("long").alias("es"),
        (F.lit(batch_id) if isinstance(batch_id, int) else batch_id)
        .cast("long")
        .alias("id"),
        F.lit(False).alias("isDdl"),
        F.lit(None).alias("old"),
        F.array(*[F.lit(p) for p in pk_names]).alias("pkNames"),
        F.lit("").alias("sql"),
        F.lit(tbl).alias("table"),
        (F.lit(es) if isinstance(es, int) else es).cast("long").alias("ts"),
        typ.alias("type"),
    )
    return changes.select(
        F.to_json(body, {"ignoreNullFields": "false"}).alias("message")
    )


def encode_canal_json(
    rows: DataFrame,
    *,
    table: str,
    typ: str,
    data: Column,
    old: Column | None = None,
    pk_names: Sequence[str] = (),
    es: Column | int = 1,
    batch_id: Column | int = 0,
    is_ddl: bool = False,
) -> DataFrame:
    """Render rows as Canal flatMessage JSON (test/replay utility).
    ``data``/``old`` are struct columns wrapped into single-element
    arrays — typed values serialize unquoted exactly like the daemon's
    output; multi-row batching is exercised by handing the decoder a
    hand-built message in tests."""
    db, _, tbl = table.partition(".")
    body = F.struct(
        F.array(data).alias("data"),
        F.lit(db).alias("database"),
        (F.lit(es) if isinstance(es, int) else es).cast("long").alias("es"),
        (F.lit(batch_id) if isinstance(batch_id, int) else batch_id)
        .cast("long")
        .alias("id"),
        F.lit(is_ddl).alias("isDdl"),
        (F.array(old) if old is not None else F.lit(None)).alias("old"),
        F.array(*[F.lit(p) for p in pk_names]).alias("pkNames"),
        F.lit("").alias("sql"),
        F.lit(tbl).alias("table"),
        (F.lit(es) if isinstance(es, int) else es).cast("long").alias("ts"),
        F.lit(typ).alias("type"),
    )
    return rows.select(
        F.to_json(body, {"ignoreNullFields": "false"}).alias("message")
    )
