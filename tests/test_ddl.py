"""Binlog DDL -> schema evolution tests: MySQL type map, Maxwell
structured defs (create + alter e2e with data), Canal ALTER parsing
(multi-clause, unhandled surfaced), and the compat gate wired in."""

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.compat import IncompatibleSchemaError
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.sources import ddl
from change_data_capture_spark.sources import wire_formats as wf

KEYS = {"shop.orders": ["id"]}


def test_mysql_type_map():
    assert ddl.mysql_type_to_spark("INT") == "int"
    assert ddl.mysql_type_to_spark("bigint") == "bigint"
    assert ddl.mysql_type_to_spark("varchar(255)") == "string"
    assert ddl.mysql_type_to_spark("tinyint(1)") == "boolean"
    assert ddl.mysql_type_to_spark("tinyint(4)") == "int"
    assert ddl.mysql_type_to_spark("DECIMAL(12, 3)") == "decimal(12,3)"
    assert ddl.mysql_type_to_spark("numeric(8)") == "decimal(8,0)"
    assert ddl.mysql_type_to_spark("datetime") == "timestamp"
    assert ddl.mysql_type_to_spark("mediumblob") == "binary"
    with pytest.raises(ValueError):
        ddl.mysql_type_to_spark("geometry")


def test_parse_canal_alter():
    t, added, un = ddl.parse_canal_alter(
        "ALTER TABLE shop.orders ADD COLUMN ship_mode varchar(32), "
        "ADD priority int, DROP COLUMN legacy, ADD amount decimal(10,2)"
    )
    assert t == "shop.orders"
    assert added == [("ship_mode", "string"), ("priority", "int"),
                     ("amount", "decimal(10,2)")]
    assert un == ["DROP COLUMN legacy"]
    # non-alter statements are surfaced whole
    t2, a2, u2 = ddl.parse_canal_alter("TRUNCATE TABLE shop.orders")
    assert t2 == "" and a2 == [] and u2 == ["TRUNCATE TABLE shop.orders"]


def test_maxwell_ddl_create_then_alter_end_to_end(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    create = (
        '{"type":"table-create","database":"shop","table":"orders","ts":1,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"},{"type":"double","name":"amount"}],'
        '"primary-key":["id"]}}'
    )
    alter = (
        '{"type":"table-alter","database":"shop","table":"orders","ts":2,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"},{"type":"double","name":"amount"},'
        '{"type":"varchar(16)","name":"ship_mode"}],"primary-key":["id"]}}'
    )
    rep = ddl.apply_maxwell_ddl(
        spark.createDataFrame([(create,)], "message string"), cat
    )
    assert rep[0]["event"] == "table-create" and rep[0]["pks"] == ["id"]

    # data plane: insert through the normal decoder; table created from
    # the announced (pending) schema
    base = spark.createDataFrame([(1, 10.0)], "id long, amount double")
    raw = wf.maxwell_raw_ops(
        wf.encode_maxwell_json(
            base, table="shop.orders", typ="insert",
            data=F.struct(F.col("id"), F.col("amount")), ts=1, xid=1,
        ),
        KEYS,
    )
    apply_changelog(spark, normalize_raw_ops(raw), cat)

    rep2 = ddl.apply_maxwell_ddl(
        spark.createDataFrame([(alter,)], "message string"), cat
    )
    assert rep2[0]["columns"] == ["id", "amount", "ship_mode"]
    got = cat.read(spark, "shop.orders")
    assert "ship_mode" in got.columns
    assert got.count() == 1


def test_canal_ddl_alter_applies_and_gate_blocks(spark, tmp_path):
    from change_data_capture_spark.changelog import snapshot_changelog

    cat = TableCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame([(1, 10.0)], "id long, amount double")
    apply_changelog(spark, snapshot_changelog(base, "shop.orders", ["id"]), cat)

    msg = (
        '{"isDdl":true,"database":"shop","table":"orders","type":"ALTER",'
        '"sql":"ALTER TABLE orders ADD COLUMN note text, DROP COLUMN junk"}'
    )
    rep = ddl.apply_canal_ddl(
        spark.createDataFrame([(msg,)], "message string"), cat,
        compat_mode="FULL",
    )
    assert rep[0]["applied"] and rep[0]["added"] == [("note", "string")]
    assert rep[0]["unhandled"] == ["DROP COLUMN junk"]
    assert "note" in cat.read(spark, "shop.orders").columns

    # unknown table: nothing to evolve, reported not applied
    other = '{"isDdl":true,"database":"x","table":"y","type":"ALTER","sql":"ALTER TABLE y ADD c int"}'
    rep2 = ddl.apply_canal_ddl(
        spark.createDataFrame([(other,)], "message string"), cat
    )
    assert not rep2[0]["applied"]


def test_backtick_qualified_table_and_bare_decimal():
    t, added, un = ddl.parse_canal_alter(
        "ALTER TABLE `mydb`.`users` ADD COLUMN bal decimal"
    )
    assert t == "mydb.users"
    assert added == [("bal", "decimal(10,0)")]
    assert un == []
    assert ddl.mysql_type_to_spark("NUMERIC") == "decimal(10,0)"


def test_maxwell_unmapped_type_reports_not_aborts(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    bad = (
        '{"type":"table-create","database":"shop","table":"geo","ts":1,'
        '"def":{"columns":[{"type":"geometry","name":"shape"}],"primary-key":[]}}'
    )
    good = (
        '{"type":"table-create","database":"shop","table":"ok","ts":2,'
        '"def":{"columns":[{"type":"bigint","name":"id"}],"primary-key":["id"]}}'
    )
    rep = ddl.apply_maxwell_ddl(
        spark.createDataFrame([(bad,), (good,)], "message string"), cat
    )
    assert "error" in rep[0] and "geometry" in rep[0]["error"]
    assert rep[1]["columns"] == ["id"]  # later event still applied
    assert cat.meta("shop.ok") is not None


def test_canal_ddl_whitelist_param(spark, tmp_path):
    """tables= whitelists which ids may evolve — an ALTER for a
    non-whitelisted table is ignored before any catalog touch."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.sources import ddl

    cat = TableCatalog(str(tmp_path / "c"))
    base = spark.createDataFrame([(1, "a")], "id long, v string")
    apply_changelog(spark, snapshot_changelog(base, "db.t", ["id"]), cat)
    apply_changelog(spark, snapshot_changelog(base, "db.other", ["id"]), cat)
    msgs = spark.createDataFrame(
        [
            ('{"isDdl":true,"database":"db","sql":"ALTER TABLE db.t ADD c1 int"}',),
            ('{"isDdl":true,"database":"db","sql":"ALTER TABLE db.other ADD c2 int"}',),
        ],
        "message string",
    )
    out = ddl.apply_canal_ddl(msgs, cat, tables={"db.t"})
    by_table = {r["table"]: r for r in out}
    assert by_table["db.t"]["applied"]
    # the non-whitelisted event is skipped but VISIBLE (ADVICE r5: the
    # front door's dead-letter anti-join removes all ddl_candidates, so
    # a silent skip here would make the event vanish from both channels)
    assert by_table["db.other"]["skipped"] == "table not whitelisted"
    assert not by_table["db.other"]["applied"]
    assert "c1" in [f.name for f in cat.read(spark, "db.t").schema.fields]
    assert "c2" not in [f.name for f in cat.read(spark, "db.other").schema.fields]


def test_maxwell_missing_db_table_reports_not_aborts(spark, tmp_path):
    """A malformed control message without database/table becomes an
    error report row; later DDL in the same batch still applies."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.sources import ddl

    cat = TableCatalog(str(tmp_path / "c"))
    msgs = spark.createDataFrame(
        [
            ('{"type":"table-create","ts":1,"def":{"columns":'
             '[{"name":"id","type":"bigint"}],"primary-key":["id"]}}',),
            ('{"type":"table-create","database":"db","table":"t","ts":2,'
             '"def":{"columns":[{"name":"id","type":"bigint"}],'
             '"primary-key":["id"]}}',),
        ],
        "message string",
    )
    out = ddl.apply_maxwell_ddl(msgs, cat)
    assert out[0]["error"] == "missing database/table" and out[0]["table"] is None
    assert out[1]["table"] == "db.t" and "error" not in out[1]


def test_canal_whitelist_keeps_unparsed_statements_for_review(spark, tmp_path):
    """The whitelist filters PARSED table ids only: a DROP TABLE the
    bounded parser can't attribute still surfaces as an unhandled
    report row."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.sources import ddl

    cat = TableCatalog(str(tmp_path / "c"))
    msgs = spark.createDataFrame(
        [('{"isDdl":true,"database":"db","sql":"DROP TABLE db.t"}',)],
        "message string",
    )
    out = ddl.apply_canal_ddl(msgs, cat, tables={"db.t"})
    assert len(out) == 1 and not out[0]["applied"] and out[0]["unhandled"]


def test_maxwell_whitelist_skip_is_reported(spark, tmp_path):
    """ADVICE r5: a non-whitelisted table's DDL event must surface as
    a skipped report row, not vanish (the pipeline's dead-letter
    anti-join removes every ddl_candidates match, so the report is the
    only remaining channel)."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.sources import ddl

    cat = TableCatalog(str(tmp_path / "c"))
    msgs = spark.createDataFrame(
        [('{"type":"table-create","database":"other","table":"t","ts":1,'
          '"def":{"columns":[{"name":"id","type":"bigint"}],'
          '"primary-key":["id"]}}',)],
        "message string",
    )
    out = ddl.apply_maxwell_ddl(msgs, cat, tables={"db.t"})
    assert out == [
        {"table": "other.t", "event": "table-create",
         "skipped": "table not whitelisted"}
    ]
    assert cat.meta("other.t") is None


def test_unsigned_integer_types_widen():
    """r6 review: UNSIGNED int/bigint exceed their signed Spark
    counterparts — values above 2^31/2^63 would silently wrap. They
    widen to bigint / decimal(20,0); smaller unsigned ints already fit."""
    assert ddl.mysql_type_to_spark("int unsigned") == "bigint"
    assert ddl.mysql_type_to_spark("INT(10) UNSIGNED") == "bigint"
    assert ddl.mysql_type_to_spark("bigint unsigned") == "decimal(20,0)"
    assert ddl.mysql_type_to_spark("bigint(20) unsigned zerofill") == "decimal(20,0)"
    assert ddl.mysql_type_to_spark("smallint unsigned") == "int"
    assert ddl.mysql_type_to_spark("tinyint(1)") == "boolean"  # unchanged
    # the Canal ALTER parser carries the unsigned token through
    t, added, un = ddl.parse_canal_alter(
        "ALTER TABLE shop.orders ADD views bigint unsigned, ADD n int UNSIGNED"
    )
    assert added == [("views", "decimal(20,0)"), ("n", "bigint")] and un == []


def test_unparseable_ddl_candidate_reports_not_vanishes(spark, tmp_path):
    """r6 review: a frame passing get_json_object's lenient classifier
    but failing strict json.loads must surface as an error report row
    (the dead-letter anti-join removes every ddl_candidates match, so
    a silent continue would vanish from both channels)."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.sources import ddl as ddl_mod

    cat = TableCatalog(str(tmp_path / "c"))
    # duplicate-free JSON for get_json_object, but a trailing garbage
    # byte breaks json.loads
    mx = '{"type":"table-create","def":{"columns":[]}}x'
    out = ddl_mod.apply_maxwell_ddl(
        spark.createDataFrame([(mx,)], "message string"), cat
    )
    assert out == [{"table": None, "event": None, "error": "unparseable json"}]
    cn = '{"isDdl":true,"sql":"ALTER TABLE t ADD c int"}x'
    out2 = ddl_mod.apply_canal_ddl(
        spark.createDataFrame([(cn,)], "message string"), cat
    )
    assert out2 == [{"table": "", "added": [], "unhandled": [],
                     "applied": False, "error": "unparseable json"}]


def test_canal_clause_split_respects_quoted_literals():
    """r6 review: commas inside quoted DEFAULT literals must not split
    clauses (the old regex emitted phantom unhandled rows); doubled
    quotes (MySQL escaping) and parens keep working."""
    t, added, un = ddl.parse_canal_alter(
        "ALTER TABLE shop.orders ADD c varchar(16) DEFAULT 'a,b', "
        "ADD d decimal(10,2), ADD e varchar(8) DEFAULT 'it''s, fine', "
        "DROP COLUMN legacy"
    )
    assert t == "shop.orders"
    assert added == [("c", "string"), ("d", "decimal(10,2)"), ("e", "string")]
    assert un == ["DROP COLUMN legacy"]


def test_canal_clause_split_respects_backslash_escapes():
    """r6 review follow-up: MySQL's default backslash escaping —
    a comma after an escaped quote must not split the literal."""
    t, added, un = ddl.parse_canal_alter(
        "ALTER TABLE t ADD c varchar(8) DEFAULT 'it\\'s, fine', ADD d int"
    )
    assert t == "t"
    assert added == [("c", "string"), ("d", "int")]
    assert un == []
