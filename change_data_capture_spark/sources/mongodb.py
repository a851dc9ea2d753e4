"""Debezium MongoDB connector decode: the document-store CDC wire
format, decoded into this engine's canonical envelope — the seventh
wire format over the one shared normalize -> apply engine.

The reference speaks fixed-schema relational feeds (SQL Server Change
Tracking polls — CTSQLServer.java; GoldenGate's Avro wrapper —
GoldenGateKafka.java); MongoDB change streams are the dominant
document-store CDC feed, and Debezium's MongoDB connector publishes
them in a format that differs from its relational envelope in two
load-bearing ways (per the public Debezium MongoDB connector docs):

1. **Images are JSON STRINGS, not objects.** ``after`` carries the
   full document rendered as (extended) JSON text, because documents
   are schemaless — there is no connector-known column set to emit an
   object with. The decoder parses that string as
   ``map<string,string>`` (Catalyst renders scalar tokens to their
   literal text — the stringified-values contract of rows_values).
2. **Updates may carry NO after image.** Without post-images enabled
   on the change stream, an update event ships only
   ``updateDescription``: ``updatedFields`` (a JSON string of just
   the changed fields) and ``removedFields`` (field names $unset by
   the update). That is exactly the GoldenGate compressed-update
   shape this engine already applies via ``normalize.patch_updates``
   — updated fields become patch cells, removed fields become
   EXPLICIT NULL patch cells (a dropped document field reads as NULL
   through a relational projection).

Event envelope (payload-wrapped when schemas.enable=true, flat
otherwise — both forms decode with one ``from_json`` + coalesce,
pure Catalyst, no Python):

  {"payload": {
     "op": "c"|"r"|"u"|"d",
     "after": "<JSON document>"|null,
     "updateDescription": {"updatedFields": "<JSON object>",
                           "removedFields": ["f", ...]|null},
     "source": {"db": ..., "rs": ..., "collection": ...,
                "ts_ms": ..., "ord": ...},
     "ts_ms": ...}}

and the Kafka message KEY carries the document id:
``{"payload": {"id": "<extended JSON of _id>"}}``.

Mapping into the envelope:
- op c/r -> INSERT with the parsed ``after`` document (a snapshot
  read is an insert to a keyed store, same as every other feed here).
- op u WITH ``after`` (capture mode with post-images) -> UPDATE; the
  before image is absent by design. Mongo ``_id`` is immutable, so
  the PK-update split the relational feeds need cannot occur — a
  null before image loses nothing.
- op u WITHOUT ``after`` -> routed to ``mongodb_patch_ops`` (partial
  update), NOT to the raw-op frame: upserting a partial document
  would invent NULLs for fields the source never sent.
- op d -> DELETE keyed by the message-key id (deletes carry no
  document body at all).
- the id/_ID column: ``table_keys`` names each collection's id
  column (single-column — Mongo's key is always ``_id``; name it
  whatever the registered relational schema calls it). The decoder
  injects the message-key id into the image under that name when the
  document itself doesn't carry it.
- change version: ``source.ts_ms * 1000 + ord`` (cluster time plus
  the change stream's intra-timestamp order), payload ``ts_ms``
  fallback — pass ``version_expr`` for a resume-token-bearing feed.

The raw-op output matches normalize.RAW_OP_DDL, so
``normalize_raw_ops`` and the apply engine run unchanged; the patch
output matches ``normalize.patch_updates``'s contract, so partial
updates merge into stored rows column-wise with last-writer-wins.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

_MONGO_VALUE_SCHEMA = (
    "payload struct<"
    "op: string, after: string, "
    "updateDescription: struct<updatedFields: string, removedFields: array<string>>, "
    "source: struct<db: string, rs: string, collection: string, ts_ms: long, ord: int>, "
    "ts_ms: long>, "
    "op string, after string, "
    "updateDescription struct<updatedFields: string, removedFields: array<string>>, "
    "source struct<db: string, rs: string, collection: string, ts_ms: long, ord: int>, "
    "ts_ms long"
)

_MONGO_KEY_SCHEMA = "payload struct<id: string>, id string"

_OPS = ("c", "r", "u", "d")


def _pick(field: str) -> Column:
    """payload-wrapped field if present, flat field otherwise."""
    return F.coalesce(F.col(f"__m.payload.{field}"), F.col(f"__m.{field}"))


def _parsed(messages: DataFrame, message_col: str, key_col: str) -> DataFrame:
    return messages.select(
        F.from_json(F.col(message_col), _MONGO_VALUE_SCHEMA).alias("__m"),
        F.from_json(F.col(key_col), _MONGO_KEY_SCHEMA).alias("__k"),
    )


def _common(table_keys: Mapping[str, str]):
    """Shared decode columns: (table_id, op, id, version, ts, id_col)."""
    table_id = F.concat_ws(
        ".", _pick("source").getField("db"), _pick("source").getField("collection")
    )
    op = _pick("op")
    doc_id = F.coalesce(F.col("__k.payload.id"), F.col("__k.id"))
    src_ts = _pick("source").getField("ts_ms")
    ts_ms = F.coalesce(src_ts, _pick("ts_ms"))
    version = ts_ms.cast("bigint") * 1000 + F.coalesce(
        _pick("source").getField("ord").cast("bigint"), F.lit(0)
    )
    id_col = F.lit(None).cast("string")
    for t, idc in table_keys.items():
        id_col = F.when(table_id == t, F.lit(idc)).otherwise(id_col)
    return table_id, op, doc_id, version, ts_ms, id_col


def mongodb_raw_ops(
    messages: DataFrame,
    table_keys: Mapping[str, str],
    *,
    rows_schemas: Mapping[str, str] | None = None,
    message_col: str = "message",
    key_col: str = "key",
    version_expr: Column | None = None,
) -> DataFrame:
    """Debezium-MongoDB messages -> raw-op rows (normalize.RAW_OP_DDL)
    for the FULL-image events: c/r inserts, d deletes, and u updates
    that carry a post-image. Partial updates (u with only
    ``updateDescription``) are deliberately excluded — decode them
    with ``mongodb_patch_ops`` and merge via
    ``normalize.patch_updates``.

    ``table_keys`` maps "db.collection" ids to the single id column
    name of the registered relational schema (Mongo's ``_id``)."""
    m = _parsed(messages, message_col, key_col)
    table_id, op, doc_id, default_version, ts_ms, id_col = _common(table_keys)
    version = version_expr if version_expr is not None else default_version

    after_doc = F.from_json(_pick("after"), "map<string,string>")
    # Inject the message-key id under the configured id column when the
    # document body doesn't carry it (it normally does — the full
    # document includes _id — but the key is authoritative).
    after_with_id = F.when(
        F.map_contains_key(after_doc, id_col), after_doc
    ).otherwise(F.map_concat(after_doc, F.map_from_arrays(F.array(id_col), F.array(doc_id))))
    key_only = F.map_from_arrays(F.array(id_col), F.array(doc_id))

    op_short = (
        F.when(op.isin("c", "r"), F.lit("I"))
        .when(op == "u", F.lit("U"))
        .when(op == "d", F.lit("D"))
    )
    before = F.when(op == "d", key_only).otherwise(
        F.lit(None).cast("map<string,string>")
    )
    after = F.when(op == "d", F.lit(None).cast("map<string,string>")).otherwise(
        after_with_id
    )

    keys = F.lit(None).cast("array<string>")
    schemas = F.lit(None).cast("string")
    for t, idc in table_keys.items():
        keys = F.when(table_id == t, F.array(F.lit(idc))).otherwise(keys)
    for t, sj in (rows_schemas or {}).items():
        schemas = F.when(table_id == t, F.lit(sj)).otherwise(schemas)

    full_image = op.isin("c", "r", "d") | ((op == "u") & _pick("after").isNotNull())
    # c/r/u need an id FROM SOMEWHERE — the document body or the
    # message key; a parseable body with neither would otherwise merge
    # under a NULL primary key (advisor finding). Those rows land in
    # mongodb_dead_letters' missing_key branch instead.
    has_identity = F.when(op == "d", doc_id.isNotNull()).otherwise(
        after_doc.isNotNull()
        & (F.map_contains_key(after_doc, id_col) | doc_id.isNotNull())
    )
    return (
        m.filter(op.isin(*_OPS) & full_image & has_identity)
        .select(
            table_id.alias("table"),
            op_short.alias("op_type"),
            keys.alias("primary_keys"),
            before.alias("before"),
            after.alias("after"),
            schemas.alias("rows_schema"),
            version.cast("bigint").alias("change_tracking_version"),
            (ts_ms.cast("bigint") * 1000).alias("cdc_current_timestamp"),
        )
        .filter(F.col("primary_keys").isNotNull())
        # a NULL version is unusable: it would apply on the create path
        # but silently vanish behind any later watermark (NULL > x is
        # NULL) — drop it here; the DLQ names it missing_version (r7)
        .filter(F.col("change_tracking_version").isNotNull())
    )


def mongodb_patch_ops(
    messages: DataFrame,
    table_keys: Mapping[str, str],
    *,
    message_col: str = "message",
    key_col: str = "key",
    version_expr: Column | None = None,
) -> DataFrame:
    """Debezium-MongoDB PARTIAL updates (u with ``updateDescription``
    and no post-image) -> patch rows: one row per event with
    ``(table, id, version, patch)`` where ``patch`` holds the
    ``updatedFields`` cells plus an EXPLICIT NULL cell per
    ``removedFields`` entry ($unset -> relational NULL, distinct from
    absence). Feed a table's slice — id column renamed/cast to the
    registered PK — to ``normalize.patch_updates`` against the applied
    base table; orphan patches for ids never inserted drop there, the
    same rule as the GoldenGate compressed-update path."""
    m = _parsed(messages, message_col, key_col)
    table_id, op, doc_id, default_version, _ts, _idc = _common(table_keys)
    version = version_expr if version_expr is not None else default_version

    ud = _pick("updateDescription")
    updated = F.from_json(ud.getField("updatedFields"), "map<string,string>")
    # an updatedFields string that fails to parse must NOT degrade to
    # an empty $set (the patch would silently lose its cells) — those
    # events drop here and land in mongodb_dead_letters instead
    parse_ok = ud.getField("updatedFields").isNull() | updated.isNotNull()
    removed = F.coalesce(
        ud.getField("removedFields"), F.array().cast("array<string>")
    )
    tombstones = F.map_from_arrays(
        removed,
        F.transform(removed, lambda _: F.lit(None).cast("string")),
    )
    # map_concat rejects duplicate keys under ANSI; a field can't be
    # both set and removed in one Mongo update, but guard anyway by
    # dropping tombstones that collide with updated keys.
    safe_tombstones = F.map_filter(
        tombstones, lambda k, _: ~F.map_contains_key(F.coalesce(updated, F.create_map()), k)
    )
    patch = F.map_concat(F.coalesce(updated, F.create_map()), safe_tombstones)

    return m.filter(
        (op == "u")
        & _pick("after").isNull()
        & ud.isNotNull()
        & parse_ok
        & doc_id.isNotNull()
        & table_id.isin(*table_keys)
    ).select(
        table_id.alias("table"),
        doc_id.alias("id"),
        version.cast("bigint").alias("version"),
        patch.alias("patch"),
    ).filter(
        # null-version patches are unusable in the per-cell LWW and the
        # pipeline's floor filter drops them anyway — quarantine
        # instead (DLQ missing_version, r7)
        F.col("version").isNotNull()
    )


def mongodb_dead_letters(
    messages: DataFrame,
    table_keys: Mapping[str, str],
    *,
    message_col: str = "message",
    key_col: str = "key",
    version_expr: Column | None = None,
) -> DataFrame:
    """Rows BOTH decoders drop, with a reason — the same quarantine
    contract as the other wire formats: 'unparseable' (no op either
    wrapped or flat), 'unsupported_op', 'unknown_table',
    'missing_image' (c/r/u with neither after nor updateDescription),
    'missing_key' (d or partial u with no message-key id, or a
    full-image c/r/u whose body carries no id AND whose key is null),
    'unparseable_image' (an after string that is not a JSON object),
    'unparseable_patch' (an updatedFields string that is not a JSON
    object — the decoder refuses to degrade it to an empty $set),
    'missing_version' (no source.ts_ms and no payload ts_ms). Pass
    the SAME ``version_expr`` given to the raw-ops decoders so
    missing_version keys on the EFFECTIVE version expression (r8,
    ADVICE)."""
    m = messages.select(
        F.col(message_col).alias("message"),
        F.from_json(F.col(message_col), _MONGO_VALUE_SCHEMA).alias("__m"),
        F.from_json(F.col(key_col), _MONGO_KEY_SCHEMA).alias("__k"),
    )
    table_id, op, doc_id, _v, _ts, id_col = _common(table_keys)
    ud = _pick("updateDescription")
    after_map = F.from_json(_pick("after"), "map<string,string>")
    after_bad = _pick("after").isNotNull() & after_map.isNull()
    patch_bad = ud.getField("updatedFields").isNotNull() & F.from_json(
        ud.getField("updatedFields"), "map<string,string>"
    ).isNull()
    known = table_id.isin(*table_keys) if table_keys else F.lit(False)
    reason = (
        F.when(op.isNull(), F.lit("unparseable"))
        .when(~op.isin(*_OPS), F.lit("unsupported_op"))
        .when(~known, F.lit("unknown_table"))
        .when(
            op.isin("c", "r") & _pick("after").isNull(), F.lit("missing_image")
        )
        .when(
            (op == "u") & _pick("after").isNull() & ud.isNull(),
            F.lit("missing_image"),
        )
        .when(
            (op == "d") & doc_id.isNull(), F.lit("missing_key")
        )
        .when(
            (op == "u") & _pick("after").isNull() & doc_id.isNull(),
            F.lit("missing_key"),
        )
        .when(op.isin("c", "r", "u") & after_bad, F.lit("unparseable_image"))
        .when(
            # full-image c/r/u whose parsed body carries no id and
            # whose message key is null: nothing to merge under
            op.isin("c", "r", "u")
            & after_map.isNotNull()
            & ~F.map_contains_key(after_map, id_col)
            & doc_id.isNull(),
            F.lit("missing_key"),
        )
        .when(
            (op == "u") & _pick("after").isNull() & patch_bad,
            F.lit("unparseable_patch"),
        )
        .when(
            (
                version_expr.try_cast("bigint")
                if version_expr is not None
                else F.coalesce(_pick("source").getField("ts_ms"), _pick("ts_ms"))
            ).isNull(),
            F.lit("missing_version"),
        )
    )
    return m.select(
        "message", reason.alias("reason"), op.alias("op"), table_id.alias("table")
    ).filter(F.col("reason").isNotNull())


def table_changes_to_mongodb(
    changes: DataFrame,
    *,
    table: str,
    id_col: str,
    ts_ms: Column | int = 0,
) -> DataFrame:
    """Outbound Debezium-MongoDB: render a change-data-feed frame
    (``TableCatalog.table_changes`` output) as the connector's wire —
    insert -> op c (after = full document JSON string),
    update_postimage -> op u WITH after (the post-image capture-mode
    shape, so consumers need no patch merge), delete -> op d (key
    only, no body — exactly what change streams emit);
    update_preimage rows render to nothing (Mongo has no before
    image without pre-image capture). The message key carries the id
    as text. One row per message; pure projection, no shuffle —
    the renderer half that closes the inbound/outbound matrix for
    the document-store format."""
    row_cols = [c for c in changes.columns if c != "_change_type"]
    full = F.struct(*[F.col(c) for c in row_cols])
    doc_id = F.col(id_col)
    ct = F.col("_change_type")
    ins = encode_mongodb_json(
        changes.filter(ct == "insert"), table=table, op="c",
        after=full, doc_id=doc_id, ts_ms=ts_ms,
    )
    upd = encode_mongodb_json(
        changes.filter(ct == "update_postimage"), table=table, op="u",
        after=full, doc_id=doc_id, ts_ms=ts_ms,
    )
    dele = encode_mongodb_json(
        changes.filter(ct == "delete"), table=table, op="d",
        doc_id=doc_id, ts_ms=ts_ms,
    )
    return ins.unionByName(upd).unionByName(dele)


def encode_mongodb_json(
    rows: DataFrame,
    *,
    table: str,
    op: str,
    after: Column | None = None,
    updated_fields: Column | None = None,
    removed_fields: Column | None = None,
    doc_id: Column | None = None,
    ts_ms: Column | int = 1,
    ord_: Column | int = 0,
) -> DataFrame:
    """Render rows as Debezium-MongoDB (message, key) JSON pairs
    (test/replay utility). ``after``/``updated_fields`` are struct
    columns — they serialize to the JSON-STRING-valued fields the real
    connector emits (to_json applied twice, exactly the wire shape)."""
    db, _, coll = table.partition(".")
    ts = (F.lit(ts_ms) if isinstance(ts_ms, int) else ts_ms).cast("long")
    o = (F.lit(ord_) if isinstance(ord_, int) else ord_).cast("int")
    source = F.struct(
        F.lit(db).alias("db"),
        F.lit("rs0").alias("rs"),
        F.lit(coll).alias("collection"),
        ts.alias("ts_ms"),
        o.alias("ord"),
    )
    ud = (
        F.struct(
            (
                F.to_json(updated_fields, {"ignoreNullFields": "false"})
                if updated_fields is not None
                else F.lit(None).cast("string")
            ).alias("updatedFields"),
            (
                removed_fields
                if removed_fields is not None
                else F.lit(None).cast("array<string>")
            ).alias("removedFields"),
        )
        if (updated_fields is not None or removed_fields is not None)
        else F.lit(None).cast(
            "struct<updatedFields: string, removedFields: array<string>>"
        )
    )
    payload = F.struct(
        F.lit(op).alias("op"),
        (
            F.to_json(after, {"ignoreNullFields": "false"})
            if after is not None
            else F.lit(None).cast("string")
        ).alias("after"),
        ud.alias("updateDescription"),
        source.alias("source"),
        ts.alias("ts_ms"),
    )
    key_payload = F.struct(
        (doc_id if doc_id is not None else F.lit(None)).cast("string").alias("id")
    )
    return rows.select(
        F.to_json(F.struct(payload.alias("payload")), {"ignoreNullFields": "false"}).alias(
            "message"
        ),
        F.to_json(F.struct(key_payload.alias("payload"))).alias("key"),
    )
