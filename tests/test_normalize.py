"""Normalizer semantics — mirror the reference's GoldenGate golden
tests (Normalizer.java: PK-update split, before/after merge, delete
takes before image) and the CT net-change golden test."""

from pyspark.sql import functions as F

from change_data_capture_spark.normalize import (
    RAW_OP_DDL,
    collapse_net_changes,
    dedupe_ddl_announcements,
    dml_flattener,
    normalize_raw_ops,
)
from change_data_capture_spark.changelog import dml_records


def _raw(spark, rows):
    return spark.createDataFrame(rows, RAW_OP_DDL)


SCHEMA_JSON = '{"type":"struct","fields":[]}'


def test_insert_takes_after_image(spark):
    raw = _raw(
        spark,
        [("t.x", "I", ["id"], None, {"id": "1", "v": "a"}, SCHEMA_JSON, 1, 10)],
    )
    out = normalize_raw_ops(raw).select("dml.*").collect()
    assert len(out) == 1
    assert out[0]["op_type"] == "INSERT"
    assert out[0]["rows_values"] == {"id": "1", "v": "a"}


def test_delete_takes_before_image(spark):
    raw = _raw(
        spark,
        [("t.x", "D", ["id"], {"id": "1", "v": "old"}, None, SCHEMA_JSON, 2, 10)],
    )
    out = normalize_raw_ops(raw).select("dml.*").collect()
    assert out[0]["op_type"] == "DELETE"
    assert out[0]["rows_values"] == {"id": "1", "v": "old"}


def test_update_merges_missing_columns_from_before(spark):
    # after image lacks column 'w' (the reference's _isMissing flag;
    # here absence from the map) -> merged from before.
    raw = _raw(
        spark,
        [
            (
                "t.x",
                "U",
                ["id"],
                {"id": "1", "v": "old", "w": "keep"},
                {"id": "1", "v": "new"},
                SCHEMA_JSON,
                3,
                10,
            )
        ],
    )
    out = normalize_raw_ops(raw).select("dml.*").collect()
    assert out[0]["op_type"] == "UPDATE"
    assert out[0]["rows_values"] == {"id": "1", "v": "new", "w": "keep"}


def test_pk_update_splits_into_delete_plus_insert(spark):
    raw = _raw(
        spark,
        [
            (
                "t.x",
                "U",
                ["id"],
                {"id": "1", "v": "a"},
                {"id": "2", "v": "a"},
                SCHEMA_JSON,
                4,
                10,
            )
        ],
    )
    out = sorted(
        [(r["op_type"], r["rows_values"]["id"]) for r in normalize_raw_ops(raw).select("dml.*").collect()]
    )
    assert out == [("DELETE", "1"), ("INSERT", "2")]


def test_composite_pk_update_split_only_when_pk_changes(spark):
    raw = _raw(
        spark,
        [
            # composite pk unchanged -> single UPDATE
            ("t.x", "U", ["a", "b"], {"a": "1", "b": "2", "v": "x"},
             {"a": "1", "b": "2", "v": "y"}, SCHEMA_JSON, 5, 10),
            # second pk col changes -> split
            ("t.x", "U", ["a", "b"], {"a": "1", "b": "2", "v": "x"},
             {"a": "1", "b": "3", "v": "x"}, SCHEMA_JSON, 6, 10),
        ],
    )
    ops = sorted(r["op_type"] for r in normalize_raw_ops(raw).select("dml.*").collect())
    assert ops == ["DELETE", "INSERT", "UPDATE"]


def test_dml_flattener(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    log = dml_records(base, "t.x", ["id"], op="INSERT", version=7)
    flat = dml_flattener(log, base.schema, include_timestamp=True)
    rows = {r["id"]: r for r in flat.collect()}
    assert rows[1]["v"] == "a"
    assert rows[1]["CDC_OP_TYPE"] == "INSERT"
    assert rows[1]["CHANGE_TRACKING_VERSION"] == 7
    assert rows[1]["CDC_CURRENT_TIMESTAMP"] is not None


def test_ddl_dedup_suppresses_unchanged_schema(spark):
    ddl = spark.createDataFrame(
        [
            ("t.x", "s1", 1),
            ("t.x", "s1", 2),  # suppressed
            ("t.x", "s2", 3),  # emitted (changed)
            ("t.x", "s2", 4),  # suppressed
            ("t.x", "s1", 5),  # emitted (changed back)
            ("t.y", "s1", 6),  # different table, first -> emitted
        ],
        "table string, schema string, seq int",
    )
    out = dedupe_ddl_announcements(ddl, ["seq"])
    assert sorted(r["seq"] for r in out.collect()) == [1, 3, 5, 6]


def test_net_change_collapse(spark):
    dml = spark.createDataFrame(
        [
            ("t.x", "INSERT", {"id": "1", "v": "a"}, 1),
            ("t.x", "UPDATE", {"id": "1", "v": "b"}, 2),  # -> INSERT(b)
            ("t.x", "UPDATE", {"id": "2", "v": "c"}, 3),  # -> UPDATE(c)
            ("t.x", "INSERT", {"id": "3", "v": "d"}, 4),
            ("t.x", "DELETE", {"id": "3"}, 5),            # -> DELETE
        ],
        "table string, op_type string, rows_values map<string,string>, change_tracking_version bigint",
    )
    out = {
        r["rows_values"]["id"]: (r["op_type"], r["rows_values"].get("v"))
        for r in collapse_net_changes(dml, ["id"]).collect()
    }
    assert out["1"] == ("INSERT", "b")
    assert out["2"] == ("UPDATE", "c")
    assert out["3"] == ("DELETE", None)


def test_net_change_collapse_survives_null_versions(spark):
    """max_by skips NULL ordering keys; the struct-wrapped order must
    still pick a REAL row when every version for a key is null (a
    Debezium feed with no ts anywhere), never a phantom all-null row."""
    from change_data_capture_spark.normalize import collapse_net_changes

    dml = spark.createDataFrame(
        [
            ("t.x", "INSERT", {"id": "1", "v": "a"}, None),
            ("t.x", "UPDATE", {"id": "1", "v": "b"}, None),
            ("t.x", "UPDATE", {"id": "2", "v": "c"}, 5),
        ],
        "table string, op_type string, rows_values map<string,string>, "
        "change_tracking_version bigint",
    )
    out = collapse_net_changes(dml, ["id"]).collect()
    by_key = {r["rows_values"]["id"]: r for r in out}
    assert set(by_key) == {"1", "2"}  # no phantom null row
    assert by_key["1"]["op_type"] == "INSERT"  # key was inserted in-window
    assert by_key["1"]["rows_values"]["v"] in ("a", "b")  # a REAL row
    assert by_key["2"]["rows_values"]["v"] == "c"


def test_patch_updates_partial_images(spark):
    """Compressed-update semantics: last-writer per (key, column),
    explicit NULL set, unpatched columns kept, orphan patches dropped."""
    from change_data_capture_spark.normalize import patch_updates
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, amount double",
    )
    patches = spark.createDataFrame(
        [
            (1, 1, {"amount": "11.5"}),
            (1, 3, {"amount": "99.5"}),        # later version wins
            (1, 2, {"name": None}),            # explicit NULL set
            (2, 1, {"name": "B2", "amount": "21.0"}),  # multi-column patch
            (9, 5, {"name": "ghost"}),         # orphan: no base row
        ],
        "id long, version int, patch map<string,string>",
    )
    rows = {r.id: r for r in patch_updates(base, patches, ["id"]).collect()}
    assert len(rows) == 3  # orphan dropped, no row invented
    assert rows[1].amount == 99.5 and rows[1].name is None
    assert rows[2].name == "B2" and rows[2].amount == 21.0
    assert rows[3].name == "c" and rows[3].amount == 30.0  # untouched


def test_patch_updates_skips_uncastable_cells_and_quarantines(spark):
    """An uncastable patch value no longer throws under ANSI (nor
    silently nulls): the stored value is kept, and the skipped cell is
    visible in undecodable_patch_cells with its reason — same DLQ
    contract as the decode path."""
    from change_data_capture_spark.normalize import (
        patch_updates, undecodable_patch_cells,
    )
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, amount double"
    )
    patches = spark.createDataFrame(
        [
            (1, 1, {"amount": "N/A"}),        # uncastable -> skipped
            (1, 2, {"name": "A2"}),            # fine
            (2, 1, {"ghost_col": "x"}),        # unknown column -> no-op
            (2, 2, {"amount": None}),          # explicit NULL still works
        ],
        "id long, version int, patch map<string,string>",
    )
    rows = {r.id: r for r in patch_updates(base, patches, ["id"]).collect()}
    assert rows[1].amount == 10.0 and rows[1].name == "A2"
    assert rows[2].amount is None and rows[2].name == "b"
    q = undecodable_patch_cells(patches, base.schema)
    got = {(r.id, r.column, r.reason) for r in q.collect()}
    assert got == {(1, "amount", "uncastable"), (2, "ghost_col", "unknown_column")}


def test_update_set_null_wins_over_before(spark):
    """r6 review (confirmed by execution pre-fix): a column PRESENT in
    the after map with a NULL value is an explicit SET NULL and must
    reach the replica — coalesce kept the stale before value."""
    raw = _raw(
        spark,
        [("t.x", "U", ["id"],
          {"id": "1", "x": "old"}, {"id": "1", "x": None}, SCHEMA_JSON, 1, 10)],
    )
    rows = normalize_raw_ops(raw).select("dml.*").collect()
    assert len(rows) == 1 and rows[0]["op_type"] == "UPDATE"
    vals = rows[0]["rows_values"]
    assert vals["id"] == "1"
    assert "x" in vals and vals["x"] is None  # explicit null survives


def test_update_missing_pk_in_after_merges_instead_of_splitting(spark):
    """r6 review (confirmed by execution pre-fix): a compressed update
    whose after image omits the unchanged pk must MERGE (pk from the
    before image), never split into DELETE + a keyless INSERT."""
    raw = _raw(
        spark,
        [("t.x", "U", ["id"],
          {"id": "1", "x": "old"}, {"x": "new"}, SCHEMA_JSON, 2, 10)],
    )
    rows = normalize_raw_ops(raw).select("dml.*").collect()
    assert [r["op_type"] for r in rows] == ["UPDATE"]
    assert rows[0]["rows_values"] == {"id": "1", "x": "new"}
