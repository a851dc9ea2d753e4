"""Maxwell + AWS DMS wire-format decode tests: envelope parse, op
mapping, before-image reconstruction (incl. PK-update split through
normalize_raw_ops), dead letters, and end-to-end apply through the
shared engine."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.sources import wire_formats as wf

KEYS = {"shop.orders": ["id"]}


def _decoded(spark, messages, fn=None):
    fn = fn or wf.maxwell_raw_ops
    return {
        (r["op_type"], r["change_tracking_version"]): r
        for r in fn(spark.createDataFrame(messages, "message string"), KEYS).collect()
    }


def test_maxwell_insert_update_delete_decode(spark):
    msgs = [
        ('{"database":"shop","table":"orders","type":"insert","ts":1,"xid":7,'
         '"commit":true,"data":{"id":1,"amount":10.5}}',),
        ('{"database":"shop","table":"orders","type":"update","ts":2,"xid":8,'
         '"data":{"id":1,"amount":99.0},"old":{"amount":10.5}}',),
        ('{"database":"shop","table":"orders","type":"delete","ts":3,"xid":9,'
         '"data":{"id":1,"amount":99.0}}',),
    ]
    out = _decoded(spark, msgs)
    ins = out[("I", 1_000_007)]
    assert ins["after"] == {"id": "1", "amount": "10.5"} and ins["before"] is None
    upd = out[("U", 2_000_008)]
    assert upd["after"] == {"id": "1", "amount": "99.0"}
    # before = data overridden by old -> full preimage
    assert upd["before"] == {"id": "1", "amount": "10.5"}
    dele = out[("D", 3_000_009)]
    assert dele["before"] == {"id": "1", "amount": "99.0"} and dele["after"] is None


def test_maxwell_pk_move_splits_via_normalizer(spark):
    # Maxwell puts a moved PK's previous value in `old`; the
    # reconstructed preimage lets normalize_raw_ops split the update.
    msgs = [
        ('{"database":"shop","table":"orders","type":"update","ts":5,"xid":1,'
         '"data":{"id":2,"amount":7.0},"old":{"id":1}}',),
    ]
    raw = wf.maxwell_raw_ops(spark.createDataFrame(msgs, "message string"), KEYS)
    recs = normalize_raw_ops(raw).select("dml.op_type", "dml.rows_values").collect()
    ops = {r["op_type"]: r["rows_values"] for r in recs}
    assert set(ops) == {"DELETE", "INSERT"}
    assert ops["DELETE"]["id"] == "1" and ops["INSERT"]["id"] == "2"


def test_maxwell_dead_letters(spark):
    msgs = [
        ('{"database":"shop","table":"orders","type":"bootstrap-start","ts":1,'
         '"data":{}}',),
        ('{"database":"shop","table":"orders","type":"table-create","ts":1}',),
        ('{"database":"other","table":"t","type":"insert","ts":1,"data":{"id":1}}',),
        ("not json at all",),
    ]
    dl = wf.maxwell_dead_letters(
        spark.createDataFrame(msgs, "message string"), KEYS
    ).collect()
    reasons = sorted(r["reason"] for r in dl)
    assert reasons == ["unknown_table", "unparseable", "unsupported_op", "unsupported_op"]


def test_dms_decode_and_control_drop(spark):
    msgs = [
        ('{"data":{"id":1,"amount":10.5},"metadata":{"timestamp":'
         '"1970-01-01T00:00:00.001Z","record-type":"data","operation":"load",'
         '"schema-name":"shop","table-name":"orders","transaction-id":1}}',),
        ('{"data":{"id":1,"amount":99.0},"before-image":{"id":1,"amount":10.5},'
         '"metadata":{"timestamp":"1970-01-01T00:00:00.002Z","record-type":"data",'
         '"operation":"update","schema-name":"shop","table-name":"orders"}}',),
        ('{"data":{"id":1,"amount":99.0},"metadata":{"timestamp":'
         '"1970-01-01T00:00:00.003Z","record-type":"data","operation":"delete",'
         '"schema-name":"shop","table-name":"orders"}}',),
        ('{"metadata":{"timestamp":"1970-01-01T00:00:00.004Z","record-type":'
         '"control","operation":"create-table","schema-name":"shop",'
         '"table-name":"orders"}}',),
    ]
    out = _decoded(spark, msgs, fn=wf.dms_raw_ops)
    assert set(out) == {("I", 1000), ("U", 2000), ("D", 3000)}
    upd = out[("U", 2000)]
    assert upd["before"] == {"id": "1", "amount": "10.5"}
    assert upd["after"] == {"id": "1", "amount": "99.0"}
    assert out[("D", 3000)]["before"]["amount"] == "99.0"


def _apply_feed(spark, raw, tmp_path, sub):
    cat = TableCatalog(str(tmp_path / sub))
    apply_changelog(spark, normalize_raw_ops(raw), cat)
    return {r["id"]: r["amount"] for r in cat.read(spark, "shop.orders").collect()}


def test_maxwell_end_to_end_apply(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 8)], "id long, amount double"
    )
    full = F.struct(F.col("id"), F.col("amount"))
    snap = wf.encode_maxwell_json(
        base, table="shop.orders", typ="bootstrap-insert", data=full, ts=1,
        xid=F.col("id"),
    )
    upd = wf.encode_maxwell_json(
        base.filter(F.col("id") % 3 == 0),
        table="shop.orders", typ="update",
        data=F.struct(F.col("id"), (F.col("amount") + 5).alias("amount")),
        old=F.struct(F.col("amount")), ts=2, xid=F.col("id"),
    )
    dele = wf.encode_maxwell_json(
        base.filter(F.col("id") % 3 == 1),
        table="shop.orders", typ="delete", data=full, ts=3, xid=F.col("id"),
    )
    schema_json = base.schema.json()
    raw = wf.maxwell_raw_ops(
        snap.unionByName(upd).unionByName(dele), KEYS,
        rows_schemas={"shop.orders": schema_json},
    )
    got = _apply_feed(spark, raw, tmp_path, "mx")
    want = {
        i: (10.0 * i + 5 if i % 3 == 0 else 10.0 * i)
        for i in range(1, 8)
        if i % 3 != 1
    }
    assert got == want


def test_dms_end_to_end_apply(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 8)], "id long, amount double"
    )
    full = F.struct(F.col("id"), F.col("amount"))
    snap = wf.encode_dms_json(
        base, table="shop.orders", operation="load", data=full,
        timestamp="1970-01-01T00:00:00.001Z",
    )
    upd = wf.encode_dms_json(
        base.filter(F.col("id") % 3 == 0),
        table="shop.orders", operation="update",
        data=F.struct(F.col("id"), (F.col("amount") + 5).alias("amount")),
        timestamp="1970-01-01T00:00:00.002Z",
    )
    dele = wf.encode_dms_json(
        base.filter(F.col("id") % 3 == 1),
        table="shop.orders", operation="delete", data=full,
        timestamp="1970-01-01T00:00:00.003Z",
    )
    raw = wf.dms_raw_ops(
        snap.unionByName(upd).unionByName(dele), KEYS,
        rows_schemas={"shop.orders": base.schema.json()},
    )
    got = _apply_feed(spark, raw, tmp_path, "dms")
    want = {
        i: (10.0 * i + 5 if i % 3 == 0 else 10.0 * i)
        for i in range(1, 8)
        if i % 3 != 1
    }
    assert got == want


def test_maxwell_schema_drift_evolves_mid_stream(spark, tmp_path):
    """A column appearing mid-feed (MySQL ALTER; Maxwell just starts
    including it in `data`) evolves the table via the SHARED drift
    helper — evolve_from_observed_columns works on any raw-op frame,
    not just Debezium's."""
    from change_data_capture_spark.sources.debezium import evolve_from_observed_columns

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, amount double")
    full = F.struct(F.col("id"), F.col("amount"))
    snap = wf.encode_maxwell_json(
        base, table="shop.orders", typ="insert", data=full, ts=1, xid=F.col("id")
    )
    raw1 = wf.maxwell_raw_ops(
        snap, KEYS, rows_schemas={"shop.orders": base.schema.json()}
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, normalize_raw_ops(raw1), cat)

    drifted = spark.createDataFrame(
        [(3, 30.0, "express")], "id long, amount double, ship_mode string"
    )
    raw2 = wf.maxwell_raw_ops(
        wf.encode_maxwell_json(
            drifted, table="shop.orders", typ="insert",
            data=F.struct(F.col("id"), F.col("amount"), F.col("ship_mode")),
            ts=2, xid=F.col("id"),
        ),
        KEYS,
    )
    added = evolve_from_observed_columns(raw2, cat)
    assert added == {"shop.orders": ["ship_mode"]}
    apply_changelog(spark, normalize_raw_ops(raw2), cat)
    got = {r["id"]: (r["amount"], r["ship_mode"]) for r in cat.read(spark, "shop.orders").collect()}
    assert got == {1: (10.0, None), 2: (20.0, None), 3: (30.0, "express")}


def test_outbound_roundtrip_maxwell_and_dms(spark, tmp_path):
    """CDC chain symmetry: apply a mutation batch, diff versions into
    a change feed, render it as OUTBOUND Maxwell and DMS messages,
    decode each through its own inbound path, and apply onto a replica
    seeded at the old version — both replicas converge to the source."""
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 10)], "id long, amount double"
    )
    src = TableCatalog(str(tmp_path / "src"))
    apply_changelog(spark, snapshot_changelog(base, "shop.orders", ["id"]), src)
    upd = dml_records(
        base.filter(F.col("id") % 2 == 0), "shop.orders", ["id"], op="UPDATE",
        version=2, value_overrides={"amount": F.col("amount") + 1},
    )
    dele = dml_records(
        base.filter(F.col("id") == 9), "shop.orders", ["id"], op="DELETE",
        version=2, keys_only=True,
    )
    apply_changelog(spark, upd.unionByName(dele), src)
    feed = src.table_changes(spark, "shop.orders", 1, 2)
    want = {r["id"]: r["amount"] for r in src.read(spark, "shop.orders").collect()}

    for name, render, decode in (
        ("mx", lambda f: wf.table_changes_to_maxwell(f, table="shop.orders", ts=2),
         wf.maxwell_raw_ops),
        ("dms", lambda f: wf.table_changes_to_dms(
            f, table="shop.orders", timestamp="1970-01-01T00:00:00.002Z"),
         wf.dms_raw_ops),
    ):
        replica = TableCatalog(str(tmp_path / f"rep_{name}"))
        apply_changelog(
            spark, snapshot_changelog(base, "shop.orders", ["id"]), replica
        )
        raw = decode(render(feed), KEYS)
        apply_changelog(spark, normalize_raw_ops(raw), replica)
        got = {r["id"]: r["amount"] for r in replica.read(spark, "shop.orders").collect()}
        assert got == want, name


def test_dead_letters_cover_missing_data_and_dms(spark):
    """Decoder/dead-letter complement: a supported-op row with no row
    image must appear in the quarantine (missing_data), for both
    formats; dms_dead_letters also tags control records."""
    mx = [
        ('{"database":"shop","table":"orders","type":"insert","ts":1,"xid":2}',),
    ]
    mdf = spark.createDataFrame(mx, "message string")
    assert wf.maxwell_raw_ops(mdf, KEYS).count() == 0
    (dl,) = wf.maxwell_dead_letters(mdf, KEYS).collect()
    assert dl["reason"] == "missing_data"

    dms = [
        ('{"metadata":{"timestamp":"1970-01-01T00:00:00.001Z","record-type":"data",'
         '"operation":"insert","schema-name":"shop","table-name":"orders"}}',),
        ('{"metadata":{"timestamp":"1970-01-01T00:00:00.002Z","record-type":"control",'
         '"operation":"create-table","schema-name":"shop","table-name":"orders"}}',),
        ('{"data":{"id":1},"metadata":{"timestamp":"1970-01-01T00:00:00.003Z",'
         '"record-type":"data","operation":"insert","schema-name":"other",'
         '"table-name":"t"}}',),
        ("garbage",),
    ]
    ddf = spark.createDataFrame(dms, "message string")
    assert wf.dms_raw_ops(ddf, KEYS).count() == 0
    reasons = sorted(r["reason"] for r in wf.dms_dead_letters(ddf, KEYS).collect())
    assert reasons == ["control", "missing_data", "unknown_table", "unparseable"]


def test_missing_or_malformed_version_drops_and_quarantines(spark):
    """r7 review: a record whose version expression is NULL (missing
    ts/es/lsn, or malformed timestamp text) must be dropped by the
    decoder and named missing_version in the DLQ — not applied on the
    create path and then silently vanished behind any later watermark.
    Also pins the ANSI-crash regressions: a malformed DMS/wal2json
    timestamp or a slash-less LSN used to THROW and kill the job."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.sources import canal as canal_mod
    from change_data_capture_spark.sources import debezium as dbz_mod
    from change_data_capture_spark.sources import mongodb as mongo_mod
    from change_data_capture_spark.sources import wal2json as wj_mod
    from change_data_capture_spark.sources import wire_formats as wf_mod

    # lsn_version: malformed forms -> NULL, never a crash or a bogus 0
    lsns = spark.createDataFrame(
        [("0/10",), ("nolsn",), ("zz/12",), ("1/2/3",), (None,)], "lsn string"
    )
    got = {
        r["lsn"]: r["v"]
        for r in lsns.select("lsn", wj_mod.lsn_version(F.col("lsn")).alias("v")).collect()
    }
    assert got["0/10"] == 16
    assert got["nolsn"] is None and got["zz/12"] is None and got["1/2/3"] is None

    keys = {"db.t": ["id"]}
    cases = [
        (
            wf_mod.maxwell_raw_ops, wf_mod.maxwell_dead_letters,
            '{"database":"db","table":"t","type":"insert","data":{"id":"1"}}',
        ),
        (
            wf_mod.dms_raw_ops, wf_mod.dms_dead_letters,
            '{"data":{"id":"1"},"metadata":{"timestamp":"junk-not-a-ts",'
            '"record-type":"data","operation":"insert",'
            '"schema-name":"db","table-name":"t"}}',
        ),
        (
            canal_mod.canal_raw_ops, canal_mod.canal_dead_letters,
            '{"database":"db","table":"t","type":"INSERT",'
            '"data":[{"id":"1"}],"isDdl":false}',
        ),
        (
            dbz_mod.debezium_raw_ops, dbz_mod.debezium_dead_letters,
            '{"op":"c","source":{"db":"db","table":"t"},"after":{"id":"1"}}',
        ),
        (
            wj_mod.wal2json_raw_ops, wj_mod.wal2json_dead_letters,
            '{"action":"I","schema":"db","table":"t","lsn":"garbage",'
            '"timestamp":"not a time",'
            '"columns":[{"name":"id","type":"int","value":"1"}]}',
        ),
    ]
    for raw_fn, dlq_fn, msg in cases:
        mdf = spark.createDataFrame([(msg,)], "message string")
        assert raw_fn(mdf, keys).count() == 0, raw_fn.__name__
        reasons = {r["reason"] for r in dlq_fn(mdf, keys).collect()}
        assert "missing_version" in reasons, (raw_fn.__name__, reasons)

    # mongodb (separate signature: id column map + message key)
    mmsg = (
        '{"payload":{"op":"c","after":"{\\"id\\": 1}",'
        '"source":{"db":"db","rs":"rs0","collection":"t"}}}'
    )
    mdf = spark.createDataFrame([(mmsg, '{"payload":{"id":"1"}}')],
                                "message string, key string")
    assert mongo_mod.mongodb_raw_ops(mdf, {"db.t": "id"}).count() == 0
    reasons = {r["reason"] for r in mongo_mod.mongodb_dead_letters(mdf, {"db.t": "id"}).collect()}
    assert "missing_version" in reasons, reasons

    # wal2json v1: versionless transaction quarantines every change
    v1msg = (
        '{"xid":5,"nextlsn":"junk","timestamp":"not a time","change":['
        '{"kind":"insert","schema":"db","table":"t",'
        '"columnnames":["id"],"columntypes":["int"],"columnvalues":["1"]}]}'
    )
    v1df = spark.createDataFrame([(v1msg,)], "message string")
    assert wj_mod.wal2json_v1_raw_ops(v1df, keys).count() == 0
    reasons = {r["reason"] for r in wj_mod.wal2json_v1_dead_letters(v1df, keys).collect()}
    assert "missing_version" in reasons, reasons
