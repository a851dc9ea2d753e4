"""Debezium change-event decode: the most widely deployed open CDC
wire format, decoded into this engine's canonical envelope.

The reference speaks two proprietary-ish feeds (SQL Server Change
Tracking polls, GoldenGate's Avro wrapper); a user migrating from it
almost always ALSO has Debezium topics (MySQL/Postgres/SQL Server
connectors all publish this envelope), so the engine accepts it
natively. Format per the public Debezium documentation:

  {"schema": {...},            # present when schemas.enable=true
   "payload": {
     "before": {col: val}|null,
     "after":  {col: val}|null,
     "source": {"db": ..., "schema": ..., "table": ..., "ts_ms": ...,
                "lsn"/"pos"/"txId": ...},
     "op": "c"|"r"|"u"|"d"     # create / snapshot read / update / delete
            |"t"|"m",          # truncate / logical message -> dropped
     "ts_ms": <processing time>}}

or the flat form (schemas.enable=false): the payload object at top
level. Both forms decode with ONE from_json schema + per-field
coalesce — pure Catalyst, no Python, narrow map stage (the same
plan discipline as normalize.py).

Mapping into the envelope:
- op c/r -> INSERT (a snapshot read is an insert to a keyed store —
  same call the reference's CT path makes for its initial snapshot),
  u -> UPDATE, d -> DELETE; t/m are dropped like GoldenGate wrapper
  notices (kafka.py T10); any OTHER op code fails the job downstream
  in normalize_raw_ops (silent nulls would upsert garbage).
- before/after image objects parse as map<string,string>: Catalyst
  renders scalar JSON tokens (numbers, booleans) to their literal
  text, which is exactly the stringified-values contract of
  rows_values. (Deploy note: Debezium encodes DECIMAL columns as
  base64 bytes by default — set the connector's
  decimal.handling.mode=string or double, the standard advice, so the
  wire carries a castable literal.)
- primary keys ride the Kafka message KEY in Debezium, not the value,
  so the decoder takes the same per-table key map the reference
  requires as config (CDCTableUtil's key-by-name contract); unknown
  tables are dropped (whitelist semantics, T9).
- change version: source.ts_ms (db commit time) with payload.ts_ms
  fallback — callers with LSN-bearing connectors can pass
  version_expr for total order.

The output matches normalize.RAW_OP_DDL, so the existing
``normalize_raw_ops`` (PK-update split, image merge) and the apply
engine run unchanged on a Debezium feed.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SOURCE = "struct<db:string,`schema`:string,`table`:string,ts_ms:bigint,lsn:bigint,pos:bigint>"
_ENVELOPE_SCHEMA = (
    f"payload struct<before:map<string,string>,after:map<string,string>,"
    f"source:{_SOURCE},op:string,ts_ms:bigint>, "
    f"before map<string,string>, after map<string,string>, "
    f"source {_SOURCE}, op string, ts_ms bigint"
)

_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def _pick(field: str) -> Column:
    """payload.<field> when the wrapped form parsed, else the flat
    top-level field."""
    return F.coalesce(F.col(f"__m.payload.{field}"), F.col(f"__m.{field}"))


def debezium_raw_ops(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    rows_schemas: Mapping[str, str] | None = None,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """Debezium JSON messages -> raw-op rows (normalize.RAW_OP_DDL).

    ``table_keys`` maps "db.table" ids to their primary-key column
    names (Debezium's keys live in the Kafka message key, outside the
    value envelope); tables not listed are dropped — the reference's
    whitelist semantics (T9). ``rows_schemas`` optionally maps the same
    ids to Spark schema JSON for the apply path's create-on-first-DML.
    """
    m = messages.select(F.from_json(F.col(message_col), _ENVELOPE_SCHEMA).alias("__m"))
    src = F.coalesce(F.col("__m.payload.source"), F.col("__m.source"))
    table_id = F.concat_ws(".", src["db"], src["table"])
    op_raw = _pick("op")
    # c/r/u/d -> the engine's I/U/D; truncate and logical-message
    # events carry no row images and are dropped like wrapper notices
    op = F.lit(None).cast("string")
    for dbz, short in _OP_MAP.items():
        op = F.when(op_raw == dbz, F.lit(short)).otherwise(op)
    version = (
        version_expr
        if version_expr is not None
        else F.coalesce(src["ts_ms"], _pick("ts_ms"))
    )

    keys = F.lit(None).cast("array<string>")
    schemas = F.lit(None).cast("string")
    for t, pks in table_keys.items():
        keys = F.when(table_id == t, F.array(*[F.lit(p) for p in pks])).otherwise(keys)
    for t, sj in (rows_schemas or {}).items():
        schemas = F.when(table_id == t, F.lit(sj)).otherwise(schemas)

    # The image that DEFINES the record must exist: c/r/u carry the row
    # in `after`, d carries the key row in `before`. Without the drop a
    # malformed frame sails through as an all-null-image op whose
    # rowkey renders EMPTY — it would collapse with every other
    # null-image row and upsert/delete a garbage '' key (r7 review;
    # the DLQ flags these as 'missing_image').
    has_image = F.when(op_raw == "d", _pick("before").isNotNull()).otherwise(
        _pick("after").isNotNull()
    )
    return (
        m.filter(op_raw.isin(*_OP_MAP) & src.isNotNull() & has_image)
        .select(
            table_id.alias("table"),
            op.alias("op_type"),
            keys.alias("primary_keys"),
            _pick("before").alias("before"),
            _pick("after").alias("after"),
            schemas.alias("rows_schema"),
            version.cast("bigint").alias("change_tracking_version"),
            (_pick("ts_ms") * 1000).cast("bigint").alias("cdc_current_timestamp"),
        )
        .filter(F.col("primary_keys").isNotNull())
        # a NULL version is unusable: it would apply on the create path
        # but silently vanish behind any later watermark (NULL > x is
        # NULL) — drop it here; the DLQ names it missing_version (r7)
        .filter(F.col("change_tracking_version").isNotNull())
    )


def evolve_from_observed_columns(raw_ops: DataFrame, catalog) -> dict[str, list[str]]:
    """Schema-drift handling for DDL-less feeds (Debezium emits no
    separate DDL event when a connector starts capturing a new column
    — the new field simply appears in the images): observe the column
    set per table in this batch, and evolve any registered table whose
    images carry columns its schema lacks. New columns are added as
    nullable STRING — the wire carries stringified values and the
    engine's decode casts by registered type, so STRING is the
    faithful type until a typed DDL says otherwise.

    One O(#tables) aggregation (distinct map keys per table) and a
    driver-side diff against catalog metadata; returns
    {table: [added columns]} for observability. Run before
    ``apply_changes`` in a foreachBatch body."""
    from pyspark.sql.types import StringType, StructField, StructType

    from ..schema import schema_from_json

    observed = (
        raw_ops.select(
            "table",
            F.explode(
                F.array_union(
                    F.coalesce(F.map_keys("before"), F.array()),
                    F.coalesce(F.map_keys("after"), F.array()),
                )
            ).alias("col"),
        )
        .groupBy("table")
        .agg(F.collect_set("col").alias("cols"))
        .collect()
    )
    added: dict[str, list[str]] = {}
    for r in observed:
        meta = catalog.meta(r["table"])
        if meta is None or meta.get("schema") is None:
            continue  # table not created yet: create-on-first-DML handles it
        schema = schema_from_json(meta["schema"])
        have = {f.name for f in schema.fields}
        new_cols = sorted(c for c in r["cols"] if c not in have)
        if not new_cols:
            continue
        evolved = StructType(
            [*schema.fields, *[StructField(c, StringType(), True) for c in new_cols]]
        )
        catalog.announce_schema(
            r["table"], evolved.json(), spark=raw_ops.sparkSession
        )
        added[r["table"]] = new_cols
    return added


def debezium_dead_letters(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """The rows ``debezium_raw_ops`` drops, with a reason column — the
    dead-letter queue a production feed routes to a quarantine sink
    instead of losing silently. Same parse expression as the decode
    (Catalyst dedupes the work when both run in one plan); reasons:
    'unparseable' (no envelope fields at all), 'unsupported_op'
    (truncate/message/unknown codes), 'unknown_table' (not in the key
    whitelist), 'missing_image' (c/r/u with no after row, or d with no
    before row — the image that defines the record), 'missing_version'
    (no source.ts_ms and no payload ts_ms).

    ``version_expr`` must be the SAME override passed to
    ``debezium_raw_ops`` (r8, ADVICE): missing_version is keyed on the
    EFFECTIVE version expression, not the default timestamps —
    otherwise a record with a null default ts but a valid custom
    version is both applied and quarantined, and one whose custom
    version is null is dropped with no DLQ record."""
    m = messages.select(
        F.col(message_col).alias("message"),
        F.from_json(F.col(message_col), _ENVELOPE_SCHEMA).alias("__m"),
    )
    src = F.coalesce(F.col("__m.payload.source"), F.col("__m.source"))
    op_raw = _pick("op")
    table_id = F.concat_ws(".", src["db"], src["table"])
    known = table_id.isin(*table_keys) if table_keys else F.lit(False)
    missing_image = F.when(op_raw == "d", _pick("before").isNull()).otherwise(
        _pick("after").isNull()
    )
    reason = (
        F.when(op_raw.isNull() | src.isNull(), F.lit("unparseable"))
        .when(~op_raw.isin(*_OP_MAP), F.lit("unsupported_op"))
        .when(~known, F.lit("unknown_table"))
        .when(missing_image, F.lit("missing_image"))
        .when(
            (
                version_expr.try_cast("bigint")
                if version_expr is not None
                else F.coalesce(src["ts_ms"], _pick("ts_ms"))
            ).isNull(),
            F.lit("missing_version"),
        )
    )
    return m.select("message", reason.alias("reason"), op_raw.alias("op"),
                    table_id.alias("table")).filter(F.col("reason").isNotNull())


def table_changes_to_debezium(
    changes: DataFrame, *, table: str, ts_ms: Column | int = 0,
    wrapped: bool = False,
) -> DataFrame:
    """Outbound half of the Debezium story: render a change-data-feed
    frame (``TableCatalog.table_changes`` output — row columns plus
    ``_change_type`` of insert/update_postimage/delete) as Debezium
    JSON messages, so the engine's own CDC output chains into any
    downstream Debezium consumer. insert -> 'c' (after image),
    update_postimage -> 'u' (after only — the CDF carries no preimage,
    which the inbound decoder and normalizer accept), delete -> 'd'
    (before image). Pure projection, no shuffle."""
    db, _, tbl = table.partition(".")
    cols = [c for c in changes.columns if c != "_change_type"]
    full = F.struct(*[F.col(c) for c in cols])
    op = (
        F.when(F.col("_change_type") == "insert", F.lit("c"))
        .when(F.col("_change_type") == "update_postimage", F.lit("u"))
        .when(F.col("_change_type") == "delete", F.lit("d"))
    )
    ts = (F.lit(ts_ms) if isinstance(ts_ms, int) else ts_ms).cast("long")
    payload = F.struct(
        F.when(op == "d", full).alias("before"),
        F.when(op != "d", full).alias("after"),
        F.struct(
            F.lit(db).alias("db"), F.lit(tbl).alias("table"), ts.alias("ts_ms")
        ).alias("source"),
        op.alias("op"),
        ts.alias("ts_ms"),
    )
    body = (
        F.to_json(F.struct(payload.alias("payload"))) if wrapped else F.to_json(payload)
    )
    return changes.select(body.alias("message"))


def encode_debezium_json(
    rows: DataFrame,
    *,
    table: str,
    op: str,
    before: Column | None,
    after: Column | None,
    ts_ms: Column | int,
    wrapped: Column | bool = True,
) -> DataFrame:
    """Render rows as Debezium JSON messages (test/replay utility, and
    the outbound half of a Debezium-compatible change feed). ``before``
    / ``after`` are struct columns (typed — numbers serialize unquoted,
    exactly like a real connector); ``wrapped`` toggles the
    schemas.enable envelope per row."""
    db, _, tbl = table.partition(".")
    ts = F.lit(ts_ms) if isinstance(ts_ms, int) else ts_ms
    payload = F.struct(
        (before if before is not None else F.lit(None)).alias("before"),
        (after if after is not None else F.lit(None)).alias("after"),
        F.struct(
            F.lit(db).alias("db"),
            F.lit(tbl).alias("table"),
            ts.cast("long").alias("ts_ms"),
        ).alias("source"),
        F.lit(op).alias("op"),
        ts.cast("long").alias("ts_ms"),
    )
    wrapped_col = F.lit(wrapped) if isinstance(wrapped, bool) else wrapped
    return rows.select(
        F.when(wrapped_col, F.to_json(F.struct(payload.alias("payload"))))
        .otherwise(F.to_json(payload))
        .alias("message")
    )
