"""Binlog DDL -> engine schema evolution: the control-plane half of
the Maxwell and Canal feeds.

The data-plane decoders (``wire_formats.maxwell_raw_ops``,
``canal.canal_raw_ops``) deliberately drop DDL events into the
dead-letter frames; this module CONSUMES those events and turns them
into the engine's native schema announcements (T2/K3,
``TableCatalog.announce_schema``), optionally through the
compatibility gate (``compat.gate_announce``):

- Maxwell ships STRUCTURED DDL: ``table-create`` / ``table-alter``
  events carry a ``def`` object with the full column list and
  primary key (maxwells-daemon.io dataformat docs) — no SQL parsing
  needed, just the MySQL -> Spark type map.
- Canal ships the RAW SQL statement in the ``sql`` field; a bounded
  parser handles the overwhelmingly-common online-evolution form
  ``ALTER TABLE [db.]t ADD [COLUMN] name TYPE [...]`` (multiple
  comma-separated ADDs included). Anything else — renames, drops,
  type changes — is returned as unhandled for the operator to review
  (renames/drops are exactly what a compatibility policy should stop
  anyway).

DDL events are metadata-scale (a handful per deploy, never per-row),
so both entry points collect them driver-side — O(#DDL events), the
same budget as the reference's DDL handling (CTInputDStream.java
DDL-before-DML path) — and apply them in message order. The
classification to DDL-only happens IN SPARK (``ddl_candidates``, a
``get_json_object`` filter below the collect), so a 100k-message
micro-batch that carries 3 ALTERs ships 3 rows to the driver, not
100k; ``tests/test_plans.py`` guards the filter's presence in the
plan.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, _parse_datatype_string

# MySQL column type -> Spark SQL type (public MySQL reference types).
_MYSQL_TYPES = {
    "tinyint": "int",
    "smallint": "int",
    "mediumint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "real": "double",
    "char": "string",
    "varchar": "string",
    "tinytext": "string",
    "text": "string",
    "mediumtext": "string",
    "longtext": "string",
    "enum": "string",
    "set": "string",
    "json": "string",
    "date": "date",
    "datetime": "timestamp",
    "timestamp": "timestamp",
    "time": "string",
    "year": "int",
    "binary": "binary",
    "varbinary": "binary",
    "tinyblob": "binary",
    "blob": "binary",
    "mediumblob": "binary",
    "longblob": "binary",
    "bit": "long",
    "boolean": "boolean",
    "bool": "boolean",
}

_DECIMAL_RE = re.compile(
    r"^(?:decimal|numeric)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$", re.I
)


def mysql_type_to_spark(t: str) -> str:
    """One MySQL column type -> Spark SQL type string. ``tinyint(1)``
    follows the MySQL convention of being a boolean; decimals keep
    their precision/scale. UNSIGNED integer types widen to the next
    Spark type that holds their full range (``int unsigned`` exceeds
    INT, ``bigint unsigned`` exceeds BIGINT — mapping them signed
    would silently wrap values above 2^31/2^63; r6 review finding)."""
    t = t.strip().lower()
    if t in ("tinyint(1)", "bool", "boolean"):
        return "boolean"
    unsigned = bool(re.search(r"\bunsigned\b", t))
    t = re.sub(r"\b(unsigned|zerofill)\b", "", t).strip()
    m = _DECIMAL_RE.match(t)
    if m:
        # bare DECIMAL/NUMERIC defaults to (10,0) per MySQL
        return f"decimal({m.group(1) or 10},{m.group(2) or 0})"
    base = re.split(r"[(\s]", t, 1)[0]
    mapped = _MYSQL_TYPES.get(base)
    if mapped is None:
        raise ValueError(f"unmapped MySQL type {t!r}")
    if unsigned:
        if base == "int" or base == "integer":
            return "bigint"
        if base == "bigint":
            return "decimal(20,0)"  # full 0..2^64-1 range
    return mapped


def maxwell_def_to_schema(defn: dict) -> tuple[StructType, list[str]]:
    """Maxwell ``def`` object -> (Spark schema, primary key list)."""
    fields = []
    for c in defn.get("columns", []):
        spark_t = mysql_type_to_spark(c["type"])
        fields.append(
            StructField(c["name"], _parse_datatype_string(spark_t), nullable=True)
        )
    return StructType(fields), list(defn.get("primary-key", []))


def ddl_candidates(
    messages: DataFrame, dialect: str, message_col: str = "message"
) -> DataFrame:
    """Spark-side DDL classification — the filter that keeps the
    driver collect O(#DDL events). ``dialect`` is ``"maxwell"``
    (structured ``type`` field) or ``"canal"`` (``isDdl`` flag).
    Runs as a pushed ``get_json_object`` filter, never a full-frame
    collect (plan-guarded in tests/test_plans.py)."""
    msg = F.col(message_col)
    if dialect == "maxwell":
        pred = F.get_json_object(msg, "$.type").isin(
            "table-create", "table-alter"
        ) & F.get_json_object(msg, "$.def").isNotNull()
    elif dialect == "canal":
        pred = (F.get_json_object(msg, "$.isDdl") == "true") & F.get_json_object(
            msg, "$.sql"
        ).isNotNull()
    else:
        raise ValueError(f"unknown DDL dialect {dialect!r}")
    return messages.filter(pred).select(msg.alias("message"))


def apply_maxwell_ddl(
    messages: DataFrame,
    catalog,
    *,
    message_col: str = "message",
    compat_mode: str | None = None,
    tables: set[str] | None = None,
) -> list[dict]:
    """Consume Maxwell ``table-create`` / ``table-alter`` events and
    announce the carried schema to the catalog (through
    ``compat.gate_announce`` when ``compat_mode`` is set). ``tables``
    whitelists which table ids may evolve (T9 semantics — events for
    other tables are ignored BEFORE any announcement, never after).
    Returns one report dict per applied event: table, event type,
    columns, pks."""
    from ..compat import gate_announce

    rows = ddl_candidates(messages, "maxwell", message_col).collect()
    out: list[dict] = []
    for r in rows:
        try:
            m = json.loads(r["message"])
        except (TypeError, ValueError):
            # A frame that passed get_json_object's lenient parse but
            # fails strict json.loads must stay VISIBLE: the front
            # door's dead-letter anti-join removes every
            # ddl_candidates match, so a silent continue here would
            # make the event vanish from both channels (r6 review —
            # same invisibility class as the whitelist finding).
            out.append({"table": None, "event": None, "error": "unparseable json"})
            continue
        if m.get("type") not in ("table-create", "table-alter") or "def" not in m:
            continue
        if not m.get("database") or not m.get("table"):
            # malformed control message: surfaced as a report row, and
            # the rest of the DDL batch still applies (same per-event
            # guard rule as the unmapped-type case below)
            out.append(
                {"table": None, "event": m.get("type"),
                 "error": "missing database/table"}
            )
            continue
        table_id = f"{m['database']}.{m['table']}"
        if tables is not None and table_id not in tables:
            # Visibility over silence: the front door's dead-letter
            # anti-join removes every ddl_candidates match, so a
            # whitelist-filtered event that also vanished from the DDL
            # report would be invisible to the operator (ADVICE r5) —
            # it is skipped, not applied, but it IS reported.
            out.append(
                {"table": table_id, "event": m.get("type"),
                 "skipped": "table not whitelisted"}
            )
            continue
        # per-event guard: one unmapped column type (e.g. geometry)
        # must not abort the whole DDL batch — it becomes an error
        # report row the operator reviews, and later events still apply
        try:
            schema, pks = maxwell_def_to_schema(m["def"])
        except ValueError as e:
            out.append({"table": table_id, "event": m["type"], "error": str(e)})
            continue
        if compat_mode:
            gate_announce(
                catalog, table_id, schema.json(), compat_mode,
                spark=messages.sparkSession,
            )
        else:
            catalog.announce_schema(
                table_id, schema.json(), spark=messages.sparkSession
            )
        out.append(
            {
                "table": table_id,
                "event": m["type"],
                "columns": [f.name for f in schema.fields],
                "pks": pks,
            }
        )
    return out


_ALTER_RE = re.compile(
    r"^\s*alter\s+table\s+(?P<table>[`\"\w.]+)\s+(?P<body>.*)$",
    re.I | re.S,
)
_ADD_COL_RE = re.compile(
    r"^add\s+(?:column\s+)?[`\"]?(?P<name>\w+)[`\"]?\s+"
    r"(?P<type>\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?(?:\s+unsigned)?)",
    re.I,
)


def _split_clauses(body: str) -> list[str]:
    """Split an ALTER body on top-level commas — a character scanner
    that respects BOTH paren nesting (``decimal(10,2)``) and quoted
    string literals (``DEFAULT 'a,b'``; ADVICE r6: the old regex split
    inside quoted defaults, emitting phantom unhandled rows). MySQL
    doubles quotes to escape them inside literals ('' / "" / ``) —
    handled naturally: the first quote closes, the second reopens,
    and no comma can hide between them. Backslash escapes (MySQL's
    DEFAULT mode, ``'it\\'s, fine'``) are handled explicitly: a
    backslashed character inside a literal never closes the quote
    (r6 review follow-up)."""
    clauses: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None
    escaped = False
    for ch in body:
        if quote is not None:
            buf.append(ch)
            if escaped:
                escaped = False
            elif ch == "\\":
                escaped = True
            elif ch == quote:
                quote = None
        elif ch in "'\"`":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth = max(0, depth - 1)
            buf.append(ch)
        elif ch == "," and depth == 0:
            clauses.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    clauses.append("".join(buf))
    return clauses


def parse_canal_alter(sql: str) -> tuple[str, list[tuple[str, str]], list[str]]:
    """Bounded MySQL ALTER parser: returns (table, added columns as
    (name, spark_type), unhandled clause texts). Only ``ADD [COLUMN]``
    clauses are translated; everything else is surfaced, not guessed."""
    m = _ALTER_RE.match(sql or "")
    if not m:
        return "", [], [sql] if sql else []
    # strip ALL backtick/quote characters: the standard MySQL form
    # `db`.`t` keeps interior quoting after an end-strip and would
    # silently never match the catalog
    table = re.sub(r'[`"]', "", m.group("table")).strip()
    added: list[tuple[str, str]] = []
    unhandled: list[str] = []
    for clause in _split_clauses(m.group("body")):
        clause = clause.strip().rstrip(";").strip()
        if not clause:
            continue
        am = _ADD_COL_RE.match(clause)
        if am:
            try:
                added.append((am.group("name"), mysql_type_to_spark(am.group("type"))))
                continue
            except ValueError:
                pass
        unhandled.append(clause)
    return table, added, unhandled


def apply_canal_ddl(
    messages: DataFrame,
    catalog,
    *,
    message_col: str = "message",
    compat_mode: str | None = None,
    tables: set[str] | None = None,
) -> list[dict]:
    """Consume Canal ``isDdl`` events: parse each ``sql`` statement,
    evolve the named table by its ADD COLUMN clauses (merged onto the
    catalog's current schema so evolution is add-nullable, matching
    ``announce_schema`` semantics), and report unhandled clauses for
    operator review. Unknown tables are skipped (whitelist semantics:
    nothing to evolve before the data plane creates them)."""
    from ..compat import gate_announce
    from ..schema import schema_from_json

    rows = ddl_candidates(messages, "canal", message_col).collect()
    out: list[dict] = []
    for r in rows:
        try:
            m = json.loads(r["message"])
        except (TypeError, ValueError):
            # visible, not vanished (see apply_maxwell_ddl; r6 review)
            out.append(
                {"table": "", "added": [], "unhandled": [],
                 "applied": False, "error": "unparseable json"}
            )
            continue
        if not m.get("isDdl") or not m.get("sql"):
            continue
        table, added, unhandled = parse_canal_alter(m["sql"])
        if "." not in table and m.get("database"):
            table = f"{m['database']}.{table}" if table else ""
        if tables is not None and table and table not in tables:
            # whitelist applies to PARSED table ids only — statements
            # the bounded parser could not attribute (DROP/RENAME/...,
            # table == "") still surface as unhandled report rows.
            # Skipped events stay visible in the report (ADVICE r5:
            # the front door's dead-letter anti-join would otherwise
            # make them vanish from both channels).
            out.append(
                {"table": table, "added": added, "unhandled": unhandled,
                 "applied": False, "skipped": "table not whitelisted"}
            )
            continue
        rec = {"table": table, "added": added, "unhandled": unhandled}
        meta = catalog.meta(table) if table else None
        current = (meta or {}).get("schema") or (meta or {}).get("pending_schema")
        if added and current:
            schema = schema_from_json(current)
            have = {f.name for f in schema.fields}
            new_fields = list(schema.fields) + [
                StructField(n, _parse_datatype_string(t), nullable=True)
                for n, t in added
                if n not in have
            ]
            evolved = StructType(new_fields)
            if compat_mode:
                gate_announce(
                    catalog, table, evolved.json(), compat_mode,
                    spark=messages.sparkSession,
                )
            else:
                catalog.announce_schema(
                    table, evolved.json(), spark=messages.sparkSession
                )
            rec["applied"] = True
        else:
            rec["applied"] = False
        out.append(rec)
    return out
