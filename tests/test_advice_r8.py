"""Round-8 regression tests for the r7 judge/advisor findings
(ADVICE.md): undecodable PRIMARY-KEY values under ``undecodable='skip'``
(apply.py pk_value_of), the typed-decode quarantine's schema resolution
under same-batch DDL (typed_dead_letters vs apply's announce-first
ordering), the DLQ missing_version reason honoring a custom
``version_expr``, and version_schemas staying in step with a
metadata-only evolution."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import (
    TableCatalog,
    apply_changelog,
    typed_dead_letters,
    undecodable_rows,
)
from change_data_capture_spark.changelog import ddl_record, dml_records, snapshot_changelog
from change_data_capture_spark.schema import schema_from_json


def _mk_table(spark, tmp_path, rows, ddl, table="shop.t", pks=("id",), name="cat"):
    df = spark.createDataFrame(rows, ddl)
    cat = TableCatalog(str(tmp_path / name))
    apply_changelog(spark, snapshot_changelog(df, table, list(pks)), cat)
    return cat, df


def _dml_env(spark, table, pks, rows, version):
    """Hand-built DML envelope rows with raw rows_values strings (so a
    value can be deliberately undecodable — dml_records stringifies
    typed columns and can't produce 'N/A' in an int column)."""
    from change_data_capture_spark.envelope import wrap_dml

    data = [
        ("INSERT", table, list(pks), None, rv, version + i, 0)
        for i, rv in enumerate(rows)
    ]
    dml = spark.createDataFrame(
        data,
        "op_type string, table string, primary_keys array<string>, "
        "rows_schema string, rows_values map<string,string>, "
        "change_tracking_version long, cdc_current_timestamp long",
    )
    return wrap_dml(dml)


def test_skip_survives_undecodable_pk_merge_path(spark, tmp_path):
    """ADVICE (medium): pk_value_of ran a plain ANSI cast inside the
    collapse groupBy and the meta-scan bucket arms — BEFORE the
    winners skip-filter — so one 'N/A' in an int PK column killed the
    whole batch even under undecodable='skip'. The bad-PK row must
    quarantine; the valid rows of the same batch must apply."""
    cat, _ = _mk_table(
        spark, tmp_path, [(1, "a"), (2, "b")], "id long, note string"
    )
    batch = _dml_env(
        spark,
        "shop.t",
        ["id"],
        [{"id": "N/A", "note": "poison"}, {"id": "3", "note": "c"}],
        version=10,
    )
    apply_changelog(spark, batch, cat, undecodable="skip")
    got = {r.id: r.note for r in cat.read(spark, "shop.t").collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # the quarantine frame names the PK column for the dropped row
    schema = schema_from_json(cat.meta("shop.t")["schema"])
    bad = undecodable_rows(
        batch.filter(F.col("dml").isNotNull()).select("dml.*"), schema
    ).collect()
    assert [r.bad_columns for r in bad] == [["id"]]


def test_skip_survives_undecodable_pk_create_path(spark, tmp_path):
    """Same class on the CREATE path: the bucketed collapse hashes PK
    values before any data exists — a bad PK value in the first batch
    of a brand-new table must not ANSI-throw."""
    cat = TableCatalog(str(tmp_path / "cat"))
    ddl = ddl_record(
        spark,
        "shop.new",
        spark.createDataFrame([], "id long, note string").schema.json(),
    )
    batch = ddl.unionByName(
        _dml_env(
            spark,
            "shop.new",
            ["id"],
            [{"id": "oops", "note": "poison"}, {"id": "1", "note": "ok"}],
            version=1,
        )
    )
    apply_changelog(spark, batch, cat, undecodable="skip")
    got = cat.read(spark, "shop.new").collect()
    assert [(r.id, r.note) for r in got] == [(1, "ok")]


def test_undecodable_pk_raise_still_fails_loudly(spark, tmp_path):
    """undecodable='raise' (the default) keeps ANSI fail-loud
    semantics for a poisoned PK value — the fallback identity only
    changes WHERE the row goes under 'skip', never silently applies a
    garbage key."""
    import pytest
    from py4j.protocol import Py4JJavaError

    cat, _ = _mk_table(
        spark, tmp_path, [(1, "a")], "id long, note string", name="cat2"
    )
    batch = _dml_env(spark, "shop.t", ["id"], [{"id": "N/A", "note": "x"}], 10)
    with pytest.raises((Py4JJavaError, Exception)):
        apply_changelog(spark, batch, cat)
    # and nothing was published past the failure
    assert {r.id for r in cat.read(spark, "shop.t").collect()} == {1}


def test_typed_dead_letters_sees_same_batch_ddl_narrowing(spark, tmp_path):
    """ADVICE (medium): the quarantine was computed against the
    PRE-announce schema while apply decodes POST-announce. A batch
    carrying a type-narrowing ALTER (string -> bigint, physical
    re-type) plus a value invalid under the NEW type lost the row with
    no quarantine record. typed_dead_letters must flag it."""
    cat, df = _mk_table(
        spark, tmp_path, [(1, "10"), (2, "20")], "id long, note string"
    )
    new_schema = spark.createDataFrame([], "id long, note bigint").schema
    batch = ddl_record(spark, "shop.t", new_schema.json()).unionByName(
        _dml_env(
            spark,
            "shop.t",
            ["id"],
            [{"id": "3", "note": "abc"}, {"id": "4", "note": "40"}],
            version=10,
        )
    )
    dlq = typed_dead_letters(batch, cat)
    assert [
        (r.change_tracking_version, r.bad_columns) for r in dlq.collect()
    ] == [(10, ["note"])]
    apply_changelog(spark, batch, cat, undecodable="skip")
    got = {r.id: r.note for r in cat.read(spark, "shop.t").collect()}
    assert got == {1: 10, 2: 20, 4: 40}  # id=3 skipped AND quarantined


def test_typed_dead_letters_no_false_positive_on_widening(spark, tmp_path):
    """The widening direction of the same finding: a batch whose ALTER
    widens a column (bigint -> string) plus a value only valid under
    the NEW type produced false-positive quarantine entries for rows
    that actually applied. Post-announce resolution: empty DLQ."""
    cat, _ = _mk_table(spark, tmp_path, [(1, 10)], "id long, amount long")
    new_schema = spark.createDataFrame([], "id long, amount string").schema
    batch = ddl_record(spark, "shop.t", new_schema.json()).unionByName(
        _dml_env(spark, "shop.t", ["id"], [{"id": "2", "amount": "xyz"}], 10)
    )
    dlq = typed_dead_letters(batch, cat)
    assert dlq.count() == 0
    apply_changelog(spark, batch, cat, undecodable="skip")
    got = {r.id: r.amount for r in cat.read(spark, "shop.t").collect()}
    assert got == {1: "10", 2: "xyz"}


def test_typed_dead_letters_create_path_pk_compat(spark, tmp_path):
    """Create-path resolution mirrors ensure_table's pk_compat: a
    DOUBLE primary key is registered as STRING (CDCKudu.java:315-321),
    so a value like 'N/A' in it applies as a string key and must NOT
    quarantine — the pre-fix raw-schema check false-positived it."""
    cat = TableCatalog(str(tmp_path / "cat3"))
    sj = spark.createDataFrame([], "k double, v string").schema.json()
    batch = ddl_record(spark, "shop.fk", sj).unionByName(
        _dml_env(spark, "shop.fk", ["k"], [{"k": "N/A", "v": "a"}], 1)
    )
    dlq = typed_dead_letters(batch, cat)
    assert dlq is None or dlq.count() == 0
    apply_changelog(spark, batch, cat, undecodable="skip")
    assert [(r.k, r.v) for r in cat.read(spark, "shop.fk").collect()] == [
        ("N/A", "a")
    ]


def test_debezium_dead_letters_honor_version_expr(spark):
    """ADVICE (low): missing_version was keyed on the DEFAULT version
    expression, ignoring the documented version_expr override — a
    record with a null default timestamp but a valid custom version
    was both applied and quarantined, and one whose custom version is
    null was dropped with no DLQ record."""
    from change_data_capture_spark.sources.debezium import (
        debezium_dead_letters,
        debezium_raw_ops,
    )

    msgs = spark.createDataFrame(
        [
            # no ts_ms anywhere, but source.pos present: valid under
            # the custom version, missing_version under the default
            ('{"op":"c","source":{"db":"d","table":"t","pos":99},'
             '"after":{"id":"1"}}',),
            # ts_ms present but NO pos: valid under the default,
            # missing_version under the custom expression
            ('{"op":"c","source":{"db":"d","table":"t","ts_ms":5},'
             '"after":{"id":"2"}}',),
        ],
        "message string",
    )
    keys = {"d.t": ["id"]}
    vexpr = F.coalesce(F.col("__m.payload.source"), F.col("__m.source"))["pos"]

    # default: record 1 dropped+DLQ'd, record 2 applied
    assert debezium_raw_ops(msgs, keys).count() == 1
    dflt = debezium_dead_letters(msgs, keys).collect()
    assert [r.reason for r in dflt] == ["missing_version"]
    # record 1 (pos, no ts) is the one the DEFAULT flags
    assert '"pos":99' in dflt[0].message

    # custom version_expr on BOTH: the decode and the DLQ agree
    ops = debezium_raw_ops(msgs, keys, version_expr=vexpr).collect()
    assert [r.change_tracking_version for r in ops] == [99]
    dlq = debezium_dead_letters(msgs, keys, version_expr=vexpr).collect()
    assert [r.reason for r in dlq] == ["missing_version"]
    assert '"ts_ms":5' in dlq[0].message


def test_maxwell_dead_letters_honor_version_expr(spark):
    """Same contract for the Maxwell decoder pair."""
    from change_data_capture_spark.sources.wire_formats import (
        maxwell_dead_letters,
        maxwell_raw_ops,
    )

    msgs = spark.createDataFrame(
        [
            ('{"database":"d","table":"t","type":"insert","xid":7,'
             '"data":{"id":"1"}}',),
            ('{"database":"d","table":"t","type":"insert","ts":9,'
             '"data":{"id":"2"}}',),
        ],
        "message string",
    )
    keys = {"d.t": ["id"]}
    vexpr = F.col("__m.xid")
    assert maxwell_raw_ops(msgs, keys, version_expr=vexpr).count() == 1
    dlq = maxwell_dead_letters(msgs, keys, version_expr=vexpr).collect()
    assert [r.reason for r in dlq] == ["missing_version"]
    assert '"ts":9' in dlq[0].message
    # decode+DLQ partition the feed exactly under the SAME override
    assert (
        maxwell_raw_ops(msgs, keys, version_expr=vexpr).count()
        + maxwell_dead_letters(msgs, keys, version_expr=vexpr).count()
        == msgs.count()
    )


def test_version_schemas_stamped_on_metadata_only_evolution(spark, tmp_path):
    """ADVICE (low): version_schemas was stamped only by
    write_new_version, so a METADATA-ONLY column drop after a physical
    re-type left read(version=<latest>) serving the stale pre-drop
    schema — exposing the dropped column's bytes the tombstone
    discipline exists to bury. The latest version's explicit read must
    match the default read."""
    cat, _ = _mk_table(
        spark,
        tmp_path,
        [(1, "10", "x"), (2, "20", "y")],
        "id long, amount string, note string",
    )
    # physical re-type (string -> bigint is not read-compatible)
    # creates version_schemas history
    cat.announce_schema(
        "shop.t",
        spark.createDataFrame([], "id long, amount bigint, note string")
        .schema.json(),
        spark=spark,
    )
    assert cat.meta("shop.t").get("version_schemas")
    # metadata-only evolution: drop `note`
    cat.announce_schema(
        "shop.t",
        spark.createDataFrame([], "id long, amount bigint").schema.json(),
        spark=spark,
    )
    latest = cat.versions("shop.t")[-1]
    explicit = cat.read(spark, "shop.t", version=latest)
    default = cat.read(spark, "shop.t")
    assert explicit.columns == default.columns == ["id", "amount"]
    assert sorted(map(tuple, explicit.collect())) == sorted(
        map(tuple, default.collect())
    ) == [(1, 10), (2, 20)]


def test_skip_does_not_shadow_valid_older_row_same_key(spark, tmp_path):
    """r8 self-review: under undecodable='skip' the quarantine filter
    must run BEFORE the last-writer collapse — filtering the winners
    let a poisoned high-version row win the collapse and then be
    dropped, taking the same key's VALID older row down with it (an
    INSERT at v10 vanished behind a quarantined UPDATE at v11 with no
    DLQ record of its own). The newest DECODABLE row must apply."""
    cat, _ = _mk_table(
        spark, tmp_path, [(1, "5")], "id long, amount string", name="shadow"
    )
    # re-type so amount is long (make 'N/A' undecodable)
    cat.announce_schema(
        "shop.t",
        spark.createDataFrame([], "id long, amount long").schema.json(),
        spark=spark,
    )
    batch = _dml_env(
        spark, "shop.t", ["id"],
        [{"id": "2", "amount": "7"},      # valid INSERT, v10
         {"id": "2", "amount": "N/A"}],   # poisoned UPDATE, v11
        version=10,
    )
    apply_changelog(spark, batch, cat, undecodable="skip")
    got = {r.id: r.amount for r in cat.read(spark, "shop.t").collect()}
    assert got == {1: 5, 2: 7}

    # and the same on the CREATE path
    batch2 = _dml_env(
        spark, "shop.fresh", ["id"],
        [{"id": "9", "amount": "1"}, {"id": "9", "amount": "bad"}],
        version=1,
    )
    from change_data_capture_spark.changelog import ddl_record as _ddl

    create = _ddl(
        spark, "shop.fresh",
        spark.createDataFrame([], "id long, amount long").schema.json(),
    ).unionByName(batch2)
    apply_changelog(spark, create, cat, undecodable="skip")
    assert [(r.id, r.amount) for r in cat.read(spark, "shop.fresh").collect()] == [
        (9, 1)
    ]


def test_bootstrap_replica_across_retype_matches_source_exactly(spark, tmp_path):
    """r8 seam review: bootstrap_replica from a PRE-re-type snapshot
    version used to register the replica under the old schema — the
    replica ended string-typed while the source was bigint (and a
    post-add column's CDF values were silently dropped by the
    replica's old-schema decode). The snapshot leg now bootstraps
    under the source's CURRENT registered schema with a lenient align;
    replica must equal the source in VALUES AND TYPES."""
    from change_data_capture_spark.apply import bootstrap_replica

    src = TableCatalog(str(tmp_path / "src"))
    dst = TableCatalog(str(tmp_path / "dst"))
    df = spark.createDataFrame([(1, "abc"), (2, "10")], "id long, note string")
    apply_changelog(spark, snapshot_changelog(df, "t.b", ["id"]), src)
    # delete the uncastable row, re-type, add a column, update a row
    apply_changelog(
        spark,
        dml_records(df.filter("id = 1"), "t.b", ["id"], op="DELETE",
                    version=2, keys_only=True),
        src,
    )
    src.announce_schema(
        "t.b",
        spark.createDataFrame([], "id long, note bigint, extra string")
        .schema.json(),
        spark=spark,
    )
    apply_changelog(
        spark,
        dml_records(
            spark.createDataFrame([(2, 999, "added")],
                                  "id long, note bigint, extra string"),
            "t.b", ["id"], op="UPDATE", version=3,
        ),
        src,
    )
    got = bootstrap_replica(spark, src, "t.b", dst)
    assert dict(got.dtypes) == dict(src.read(spark, "t.b").dtypes)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, src.read(spark, "t.b").collect())
    ) == [(2, 999, "added")]
    # the replica's registered schema matches the source's
    assert dst.meta("t.b")["schema"] == src.meta("t.b")["schema"]
