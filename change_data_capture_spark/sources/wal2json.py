"""Postgres wal2json logical-decoding decode: the sixth open CDC wire
format through the shared normalize -> apply engine (alongside
GoldenGate, Debezium, Maxwell, AWS DMS, and Canal).

wal2json is the standard JSON output plugin for Postgres logical
replication (public docs and format reference:
github.com/eulerto/wal2json). It ships two layouts:

Format version 2 (``format-version=2``) — one JSON object per
CHANGE (plus begin/commit markers), the layout streaming estates
point at Kafka:

  {"action": "I"|"U"|"D"|"B"|"C"|"M"|"T",
   "xid": 563,                       # with include-xids
   "lsn": "0/16D3048",               # with include-lsn
   "timestamp": "2021-02-02 ...+00", # with include-timestamp
   "schema": "public", "table": "t",
   "columns":  [{"name": c, "type": t, "value": v}, ...],  # I/U post row
   "identity": [{"name": c, "type": t, "value": v}, ...],  # U/D old row
   "pk": [{"name": c, "type": t}, ...]}                    # with include-pk

Format version 1 (the default) — one JSON object per TRANSACTION,
changes batched in an array:

  {"xid": 563, "nextlsn": "0/16D3048", "timestamp": "...",
   "change": [
     {"kind": "insert"|"update"|"delete",
      "schema": "public", "table": "t",
      "columnnames": [...], "columntypes": [...],
      "columnvalues": [...],                  # post row, insert/update
      "oldkeys": {"keynames": [...], "keytypes": [...],
                  "keyvalues": [...]}},       # update/delete old row
     ...]}

Both decode with ONE ``from_json`` each — pure Catalyst narrow
stages, no Python (the plan discipline shared by all six decoders).
Heterogeneous JSON values (numbers, booleans, strings) parse into
``string`` fields as their literal token text, which is exactly the
engine's stringified-values contract (same Catalyst behavior the
Debezium map<string,string> decode relies on).

Mapping into the raw-op frame (normalize.RAW_OP_DDL contract,
reference parity: the T1/T7 ResultSet->DMLRecord semantics of
CTSQLServer.java:271-320 over a Postgres feed):

- v2 actions I -> INSERT, U -> UPDATE, D -> DELETE; B/C (transaction
  markers), M (logical messages) and T (truncate) carry no keyed row
  images and are dropped exactly like GoldenGate wrapper notices
  (kafka.py T10) — surfaced by ``wal2json_dead_letters``.
- The UPDATE before image is the post row overridden by ``identity``
  (identity wins for its keys). Under default REPLICA IDENTITY the
  identity array carries the OLD primary key, so a moved PK's previous
  value is restored and ``normalize_raw_ops`` performs its
  DELETE(old)+INSERT(new) PK-update split; under REPLICA IDENTITY FULL
  the identity array is the complete preimage and the merge yields it
  verbatim. DELETE's before image is the identity array alone (the
  only image Postgres emits for deletes).
- v1 ``kind`` maps the same way; the old row comes from ``oldkeys``
  (keynames/keyvalues), with the same override rule.
- Change version: Postgres LSNs are the feed's total order. The
  default version is the 64-bit LSN decoded from its "hi/lo" hex text
  (``lsn_version``) — v2's per-change ``lsn`` (include-lsn), v1's
  per-transaction ``nextlsn`` (write-in-chunks off) — with the commit
  timestamp in epoch micros as fallback when the feed was configured
  without LSNs. Pass ``version_expr`` to override.
- Primary keys: the engine keys on the configured per-table map like
  every other decoder — ``table_keys`` is both the whitelist (unlisted
  tables dropped, CTInputDStream.java:230 / T9) and the authoritative
  key list. wal2json CAN ship ``pk`` in-band (include-pk) but a
  misconfigured publication must not silently re-key a table.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .wire_formats import _keys_and_schemas

_COLS = "array<struct<name:string,type:string,value:string>>"
_V2_SCHEMA = (
    f"action string, xid bigint, lsn string, timestamp string, "
    f"`schema` string, `table` string, columns {_COLS}, identity {_COLS}, "
    f"pk array<struct<name:string,type:string>>"
)
_V1_SCHEMA = (
    "xid bigint, nextlsn string, timestamp string, "
    "change array<struct<kind:string,`schema`:string,`table`:string,"
    "columnnames:array<string>,columntypes:array<string>,"
    "columnvalues:array<string>,"
    "oldkeys:struct<keynames:array<string>,keytypes:array<string>,"
    "keyvalues:array<string>>>>"
)

_V2_OPS = {"I": "I", "U": "U", "D": "D"}
_V1_OPS = {"insert": "I", "update": "U", "delete": "D"}

# wal2json renders timestamps as '2021-02-02 12:00:00.123456+00'
_TS_FMT = "yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSS]X"


def lsn_version(lsn: Column) -> Column:
    """Postgres LSN text ("16D/3048A2B0") -> the 64-bit integer it
    names: hi segment is the high 32 bits, lo the low 32. Monotone in
    WAL order — the natural change_tracking_version domain for a
    logical-replication feed.

    Malformed text yields NULL, never a wrong version and never a
    crash (r7 review): a slash-less string used to hit ``parts[1]``
    out-of-bounds — an ANSI runtime error killing the whole job on one
    bad frame — and non-hex segments silently ``conv`` to 0, which the
    replay filter would then drop as an already-applied version. Both
    segments are validated as 1-8 hex digits first."""
    parts = F.split(lsn, "/")
    hi, lo = F.get(parts, 0), F.get(parts, 1)
    valid = (
        (F.size(parts) == 2)
        & hi.rlike("^[0-9a-fA-F]{1,8}$")
        & lo.rlike("^[0-9a-fA-F]{1,8}$")
    )
    return F.when(
        valid,
        F.conv(hi, 16, 10).cast("bigint") * F.lit(4294967296).cast("bigint")
        + F.conv(lo, 16, 10).cast("bigint"),
    )


def _ts_micros(ts: Column) -> Column:
    # try_to_timestamp: one malformed timestamp string must quarantine
    # that record (missing_version), not throw an ANSI parse error that
    # kills the whole apply job (r7 review).
    return F.unix_micros(F.try_to_timestamp(ts, F.lit(_TS_FMT)))


def _entries_map(entries: Column) -> Column:
    """[{name,type,value}...] -> map<string,string> of name -> value
    literal text (null-safe: a null array stays null)."""
    return F.map_from_entries(
        F.transform(entries, lambda e: F.struct(e["name"], e["value"]))
    )


def _before_after(op: Column, post: Column, old: Column) -> tuple[Column, Column]:
    """The shared image rule: UPDATE before = post overridden by the
    old row (old wins — restores a moved PK under default REPLICA
    IDENTITY, and is the identity function under REPLICA IDENTITY
    FULL); DELETE before = old row alone; INSERT has no before."""
    merged = F.when(
        old.isNotNull(),
        F.map_concat(
            F.map_filter(post, lambda k, _: ~F.array_contains(F.map_keys(old), k)),
            old,
        ),
    ).otherwise(post)
    before = (
        F.when(op == "D", old)
        .when(op == "U", merged)
        .otherwise(F.lit(None).cast("map<string,string>"))
    )
    after = F.when(op == "D", F.lit(None).cast("map<string,string>")).otherwise(post)
    return before, after


def wal2json_raw_ops(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    rows_schemas: Mapping[str, str] | None = None,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """wal2json format-version=2 messages (one action per message) ->
    raw-op rows (normalize.RAW_OP_DDL)."""
    m = messages.select(F.from_json(F.col(message_col), _V2_SCHEMA).alias("__m"))
    action = F.col("__m.action")
    # The image that DEFINES the record must exist: I/U carry the post
    # row in `columns`, D carries the old key row in `identity`.
    # Without the drop a malformed frame (flagged 'missing_columns' /
    # 'missing_identity' in the DLQ) still entered the apply path as a
    # null-image op with an EMPTY rowkey (r7 review).
    has_image = F.when(
        action == "D", F.col("__m.identity").isNotNull()
    ).otherwise(F.col("__m.columns").isNotNull())
    flat = m.filter(
        action.isin(*_V2_OPS) & F.col("__m.table").isNotNull() & has_image
    )
    table_id = F.concat_ws(".", F.col("__m.schema"), F.col("__m.table"))
    op = action  # v2 action codes are already the engine's I/U/D
    post = _entries_map(F.col("__m.columns"))
    old = _entries_map(F.col("__m.identity"))
    before, after = _before_after(op, post, old)
    version = (
        version_expr
        if version_expr is not None
        else F.coalesce(
            lsn_version(F.col("__m.lsn")), _ts_micros(F.col("__m.timestamp"))
        )
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
            _ts_micros(F.col("__m.timestamp")).alias("cdc_current_timestamp"),
        )
        .filter(F.col("primary_keys").isNotNull())
        # a NULL version is unusable: it would apply on the create path
        # but silently vanish behind any later watermark (NULL > x is
        # NULL) — drop it here; the DLQ names it missing_version (r7)
        .filter(F.col("change_tracking_version").isNotNull())
    )


def wal2json_v1_raw_ops(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    rows_schemas: Mapping[str, str] | None = None,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """wal2json format-version=1 messages (one TRANSACTION per message,
    changes batched in the ``change`` array) -> raw-op rows.

    The decode posexplodes the transaction's change array; intra-txn
    order rides in micro-steps on top of the per-transaction version
    (nextlsn when present, else commit-timestamp micros), so a
    same-key insert-then-update inside one transaction collapses to
    the update — Postgres commits are atomic, and the engine's
    last-writer-wins per version needs the sub-order only for
    determinism WITHIN the transaction.
    """
    m = messages.select(F.from_json(F.col(message_col), _V1_SCHEMA).alias("__m"))
    flat = (
        m.filter(F.col("__m.change").isNotNull())
        .select(
            F.col("__m"),
            F.posexplode(F.col("__m.change")).alias("__pos", "__c"),
        )
        .filter(F.col("__c").isNotNull() & F.col("__c.kind").isin(*_V1_OPS))
        # defining-image drop, same rule as v2 (DLQ reasons
        # 'missing_columns' / 'missing_identity' already cover these)
        .filter(
            F.when(
                F.col("__c.kind") == "delete",
                F.col("__c.oldkeys.keyvalues").isNotNull(),
            ).otherwise(F.col("__c.columnvalues").isNotNull())
        )
    )
    c = F.col("__c")
    table_id = F.concat_ws(".", c["schema"], c["table"])
    op = F.lit(None).cast("string")
    for kind, short in _V1_OPS.items():
        op = F.when(c["kind"] == kind, F.lit(short)).otherwise(op)
    post = F.when(
        c["columnnames"].isNotNull(),
        F.map_from_arrays(c["columnnames"], c["columnvalues"]),
    )
    old = F.when(
        c["oldkeys"].isNotNull(),
        F.map_from_arrays(c["oldkeys"]["keynames"], c["oldkeys"]["keyvalues"]),
    )
    before, after = _before_after(op, post, old)
    txn_version = (
        version_expr
        if version_expr is not None
        else F.coalesce(
            lsn_version(F.col("__m.nextlsn")), _ts_micros(F.col("__m.timestamp"))
        )
    )
    # micro-step the intra-transaction change order ADDITIVELY so
    # normalize's last-writer-wins is deterministic inside one commit.
    # Addition (not bit-packing) keeps the version in the LSN domain
    # with no overflow for the WAL's whole 64-bit life, and can never
    # collide across transactions: every change writes >= ~24 bytes of
    # WAL, so the change count of a transaction is always smaller than
    # the LSN gap to the next transaction's nextlsn.
    version = txn_version + F.col("__pos")
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
            _ts_micros(F.col("__m.timestamp")).alias("cdc_current_timestamp"),
        )
        .filter(F.col("primary_keys").isNotNull())
        # a NULL version is unusable: it would apply on the create path
        # but silently vanish behind any later watermark (NULL > x is
        # NULL) — drop it here; the DLQ names it missing_version (r7)
        .filter(F.col("change_tracking_version").isNotNull())
    )


def wal2json_dead_letters(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """The v2 rows ``wal2json_raw_ops`` drops, with a reason — the
    same quarantine contract as the other five decoders' dead-letter
    frames: 'unparseable' (no action at all), 'txn_marker' (B/C begin/
    commit framing — expected, routed so an operator can count txn
    boundaries), 'unsupported_op' (M logical messages, T truncate,
    unknown codes), 'unknown_table', 'missing_columns' (an I/U action
    with no post row), 'missing_identity' (a D action with no identity
    row), 'missing_version' (neither a decodable lsn nor a parseable
    timestamp — no version domain to order the record in)."""
    m = messages.select(
        F.col(message_col).alias("message"),
        F.from_json(F.col(message_col), _V2_SCHEMA).alias("__m"),
    )
    action = F.col("__m.action")
    table_id = F.concat_ws(".", F.col("__m.schema"), F.col("__m.table"))
    known = table_id.isin(*table_keys) if table_keys else F.lit(False)
    reason = (
        F.when(action.isNull(), F.lit("unparseable"))
        .when(action.isin("B", "C"), F.lit("txn_marker"))
        .when(~action.isin(*_V2_OPS), F.lit("unsupported_op"))
        .when(~known, F.lit("unknown_table"))
        .when(
            action.isin("I", "U") & F.col("__m.columns").isNull(),
            F.lit("missing_columns"),
        )
        .when(
            (action == "D") & F.col("__m.identity").isNull(),
            F.lit("missing_identity"),
        )
        .when(
            (
                version_expr.try_cast("bigint").isNull()
                if version_expr is not None
                else lsn_version(F.col("__m.lsn")).isNull()
                & _ts_micros(F.col("__m.timestamp")).isNull()
            ),
            F.lit("missing_version"),
        )
    )
    return m.select(
        "message", reason.alias("reason"), action.alias("op"), table_id.alias("table")
    ).filter(F.col("reason").isNotNull())


def wal2json_v1_dead_letters(
    messages: DataFrame,
    table_keys: Mapping[str, Sequence[str]],
    *,
    message_col: str = "message",
    version_expr: Column | None = None,
) -> DataFrame:
    """The format-version=1 twin of ``wal2json_dead_letters`` — the
    rows ``wal2json_v1_raw_ops`` drops, classified with the V1 schema
    (a v2-schema parse would mark every valid v1 transaction
    'unparseable'; the pipeline front door routes each format version
    to its own quarantine): 'unparseable' (no ``change`` array),
    'unsupported_op' (a change whose kind is not insert/update/
    delete — v1 has no message/truncate kinds but defensive),
    'unknown_table', 'missing_columns' (insert/update with no column
    values), 'missing_identity' (a delete with no oldkeys),
    'missing_version' (neither a decodable nextlsn nor a parseable
    timestamp on the transaction).
    Message-grain for unparseable frames, change-grain otherwise (one
    row per offending change, with its position)."""
    m = messages.select(
        F.col(message_col).alias("message"),
        F.from_json(F.col(message_col), _V1_SCHEMA).alias("__m"),
    )
    unparseable = m.filter(F.col("__m.change").isNull()).select(
        "message",
        F.lit("unparseable").alias("reason"),
        F.lit(None).cast("string").alias("op"),
        F.lit(None).cast("string").alias("table"),
    )
    flat = (
        m.filter(F.col("__m.change").isNotNull())
        .select(
            "message",
            F.col("__m"),
            F.posexplode(F.col("__m.change")).alias("__pos", "__c"),
        )
        .filter(F.col("__c").isNotNull())
    )
    c = F.col("__c")
    table_id = F.concat_ws(".", c["schema"], c["table"])
    known = table_id.isin(*table_keys) if table_keys else F.lit(False)
    reason = (
        F.when(~c["kind"].isin(*_V1_OPS), F.lit("unsupported_op"))
        .when(~known, F.lit("unknown_table"))
        .when(
            c["kind"].isin("insert", "update") & c["columnvalues"].isNull(),
            F.lit("missing_columns"),
        )
        .when(
            (c["kind"] == "delete") & c["oldkeys"].getField("keyvalues").isNull(),
            F.lit("missing_identity"),
        )
        .when(
            # the version is per-TRANSACTION (nextlsn/timestamp): when
            # both are unusable every change of the txn is versionless;
            # a caller's version_expr override replaces the whole
            # default (r8, ADVICE — key on the EFFECTIVE expression)
            (
                version_expr.try_cast("bigint").isNull()
                if version_expr is not None
                else lsn_version(F.col("__m.nextlsn")).isNull()
                & _ts_micros(F.col("__m.timestamp")).isNull()
            ),
            F.lit("missing_version"),
        )
    )
    per_change = flat.select(
        "message", reason.alias("reason"), c["kind"].alias("op"), table_id.alias("table")
    ).filter(F.col("reason").isNotNull())
    return unparseable.unionByName(per_change)


_PG_TYPES = {
    "tinyint": "smallint", "smallint": "smallint", "int": "integer",
    "bigint": "bigint", "float": "real", "double": "double precision",
    "string": "text", "boolean": "boolean", "date": "date",
    "timestamp": "timestamp with time zone", "binary": "bytea",
}


def table_changes_to_wal2json(
    changes: DataFrame,
    *,
    table: str,
    pk_names: Sequence[str],
    lsn: Column | str = "0/0",
    xid: Column | int = 0,
) -> DataFrame:
    """Outbound wal2json: render a change-data-feed frame
    (``TableCatalog.table_changes`` output) as format-version=2
    messages — insert -> I (columns = full row), update_postimage ->
    U (columns = post row, identity = PK values, the default-REPLICA-
    IDENTITY shape), delete -> D (identity only, exactly what Postgres
    emits); update_preimage rows render to nothing (the v2 wire's
    identity slot carries the key, not a full preimage). Column pg
    types derive from the frame's Spark types. One row per message;
    pure projection, no shuffle."""
    row_cols = [c for c in changes.columns if c != "_change_type"]
    dtypes = dict(changes.dtypes)
    cols = {c: (_PG_TYPES.get(dtypes[c], "text"), F.col(c)) for c in row_cols}
    ident = {p: (_PG_TYPES.get(dtypes[p], "text"), F.col(p)) for p in pk_names}
    ct = F.col("_change_type")
    ins = encode_wal2json(
        changes.filter(ct == "insert"), table=table, action="I",
        columns=cols, lsn=lsn, xid=xid,
    )
    upd = encode_wal2json(
        changes.filter(ct == "update_postimage"), table=table, action="U",
        columns=cols, identity=ident, lsn=lsn, xid=xid,
    )
    dele = encode_wal2json(
        changes.filter(ct == "delete"), table=table, action="D",
        columns={}, identity=ident, lsn=lsn, xid=xid,
    )
    return ins.unionByName(upd).unionByName(dele)


def _entries_json(cols: Mapping[str, tuple[str, Column]]) -> Column:
    """name -> (pg type, value Column) rendered as the wire's
    [{"name":...,"type":...,"value":...}, ...] array — each entry its
    own to_json so heterogeneous value types serialize with native
    JSON typing (numbers unquoted, strings escaped), which one shared
    Spark struct type cannot express."""
    entries = [
        F.to_json(
            F.struct(
                F.lit(name).alias("name"),
                F.lit(pg_type).alias("type"),
                value.alias("value"),
            ),
            {"ignoreNullFields": "false"},
        )
        for name, (pg_type, value) in cols.items()
    ]
    return F.concat(F.lit("["), F.concat_ws(",", *entries), F.lit("]"))


def encode_wal2json(
    rows: DataFrame,
    *,
    table: str,
    action: str,
    columns: Mapping[str, tuple[str, Column]] | None = None,
    identity: Mapping[str, tuple[str, Column]] | None = None,
    lsn: Column | str | None = None,
    xid: Column | int = 0,
    timestamp: str | None = None,
) -> DataFrame:
    """Render rows as wal2json format-version=2 messages (test/replay
    utility). ``columns``/``identity`` map column name -> (pg type
    text, value Column); ``columns`` defaults to every row column as
    pg ``text``. The message is assembled by splicing the per-column
    entry arrays into the header JSON because the wire's column
    entries are heterogeneously typed."""
    header_fields = [
        F.lit(action).alias("action"),
        (F.lit(xid) if isinstance(xid, int) else xid).cast("long").alias("xid"),
    ]
    if lsn is not None:
        header_fields.append(
            (F.lit(lsn) if isinstance(lsn, str) else lsn).alias("lsn")
        )
    if timestamp is not None:
        header_fields.append(F.lit(timestamp).alias("timestamp"))
    sch, _, tbl = table.partition(".")
    header_fields += [F.lit(sch).alias("schema"), F.lit(tbl).alias("table")]
    header = F.to_json(F.struct(*header_fields))
    # splice: header minus its closing brace + ,"columns":[...] (+ identity) + }
    pieces: list[Column] = [F.regexp_replace(header, r"\}$", "")]
    if columns is None:
        columns = {c: ("text", F.col(c)) for c in rows.columns}
    if columns:
        pieces.append(F.lit(',"columns":'))
        pieces.append(_entries_json(columns))
    if identity:
        pieces.append(F.lit(',"identity":'))
        pieces.append(_entries_json(identity))
    pieces.append(F.lit("}"))
    return rows.select(F.concat(*pieces).alias("message"))
