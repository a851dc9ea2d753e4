"""wal2json (Postgres logical decoding) decode tests: v2 action
decode with identity images, LSN-domain versions, v1 transaction
batches with intra-txn micro-versions, PK-update split through
normalize_raw_ops, dead letters, and end-to-end apply with the
keys-only delete image Postgres actually emits — mirror of the
Maxwell/DMS/Canal suites."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.sources import wal2json as wj

KEYS = {"public.orders": ["id"]}


def test_wal2json_v2_decode_images_and_lsn_version(spark):
    msgs = [
        # insert: columns only
        ('{"action":"I","xid":7,"lsn":"0/10","timestamp":'
         '"2021-02-02 12:00:00.123456+00","schema":"public","table":"orders",'
         '"columns":[{"name":"id","type":"integer","value":1},'
         '{"name":"amount","type":"numeric","value":10.5}]}',),
        # update under default REPLICA IDENTITY: full post row +
        # key-only identity
        ('{"action":"U","xid":8,"lsn":"1/0","schema":"public","table":"orders",'
         '"columns":[{"name":"id","type":"integer","value":1},'
         '{"name":"amount","type":"numeric","value":99.0}],'
         '"identity":[{"name":"id","type":"integer","value":1}]}',),
        # delete: identity only (the only image Postgres emits)
        ('{"action":"D","xid":9,"lsn":"1/A","schema":"public","table":"orders",'
         '"identity":[{"name":"id","type":"integer","value":1}]}',),
    ]
    out = wj.wal2json_raw_ops(spark.createDataFrame(msgs, "message string"), KEYS)
    rows = {r["op_type"]: r for r in out.collect()}
    assert set(rows) == {"I", "U", "D"}
    ins = rows["I"]
    assert ins["before"] is None
    assert ins["after"] == {"id": "1", "amount": "10.5"}
    assert ins["change_tracking_version"] == 0x10
    assert ins["cdc_current_timestamp"] == 1612267200123456
    upd = rows["U"]
    # before = post overridden by identity: key restored, non-key
    # columns carried from the post image
    assert upd["before"] == {"id": "1", "amount": "99.0"}
    assert upd["after"] == {"id": "1", "amount": "99.0"}
    assert upd["change_tracking_version"] == 1 << 32
    dele = rows["D"]
    assert dele["after"] is None
    assert dele["before"] == {"id": "1"}
    assert dele["change_tracking_version"] == (1 << 32) + 0xA


def test_wal2json_pk_move_splits_via_normalizer(spark):
    msgs = [
        ('{"action":"U","lsn":"0/5","schema":"public","table":"orders",'
         '"columns":[{"name":"id","type":"integer","value":2},'
         '{"name":"amount","type":"numeric","value":7.0}],'
         '"identity":[{"name":"id","type":"integer","value":1}]}',),
    ]
    raw = wj.wal2json_raw_ops(spark.createDataFrame(msgs, "message string"), KEYS)
    recs = normalize_raw_ops(raw).select("dml.op_type", "dml.rows_values").collect()
    ops = {r["op_type"]: r["rows_values"] for r in recs}
    assert set(ops) == {"DELETE", "INSERT"}
    assert ops["DELETE"]["id"] == "1" and ops["INSERT"]["id"] == "2"


def test_wal2json_v1_txn_decode_microsteps_order(spark):
    msgs = [
        ('{"xid":5,"nextlsn":"0/20","timestamp":'
         '"2021-02-02 12:00:00.123456+00","change":['
         '{"kind":"insert","schema":"public","table":"orders",'
         '"columnnames":["id","amount"],"columnvalues":[1,2.5]},'
         '{"kind":"update","schema":"public","table":"orders",'
         '"columnnames":["id","amount"],"columnvalues":[1,3.5],'
         '"oldkeys":{"keynames":["id"],"keyvalues":[1]}},'
         '{"kind":"delete","schema":"public","table":"orders",'
         '"oldkeys":{"keynames":["id"],"keyvalues":[9]}}]}',),
    ]
    out = wj.wal2json_v1_raw_ops(spark.createDataFrame(msgs, "message string"), KEYS)
    rows = sorted(out.collect(), key=lambda r: r["change_tracking_version"])
    assert [r["op_type"] for r in rows] == ["I", "U", "D"]
    # intra-txn order rides ADDITIVELY on the LSN (change count is
    # always below the WAL-byte gap to the next txn, and addition
    # never overflows late-life LSNs the way bit-packing would)
    base = 0x20
    assert [r["change_tracking_version"] for r in rows] == [base, base + 1, base + 2]
    assert rows[1]["after"] == {"id": "1", "amount": "3.5"}
    assert rows[2]["before"] == {"id": "9"}
    # unknown tables drop (whitelist semantics)
    assert wj.wal2json_v1_raw_ops(
        spark.createDataFrame(msgs, "message string"), {"other.t": ["id"]}
    ).count() == 0


def test_wal2json_dead_letters(spark):
    msgs = [
        ('{"action":"B","xid":1}',),
        ('{"action":"C","xid":1}',),
        ('{"action":"T","schema":"public","table":"orders"}',),
        ('{"action":"M","schema":"public","table":"orders"}',),
        ('{"action":"I","schema":"other","table":"t","columns":[]}',),
        ('{"action":"I","schema":"public","table":"orders"}',),
        ("not json at all",),
    ]
    mdf = spark.createDataFrame(msgs, "message string")
    # the missing-columns I is QUARANTINED, not decoded (r7 review:
    # raw_ops and the DLQ must partition the feed, never overlap)
    assert wj.wal2json_raw_ops(mdf, KEYS).count() == 0
    reasons = sorted(
        r["reason"] for r in wj.wal2json_dead_letters(mdf, KEYS).collect()
    )
    assert reasons == [
        "missing_columns", "txn_marker", "txn_marker", "unknown_table",
        "unparseable", "unsupported_op", "unsupported_op",
    ]


def test_lsn_version_monotone_in_wal_order(spark):
    df = spark.createDataFrame(
        [("0/16D3048",), ("0/16D3049",), ("1/0",), ("A/FFFF0001",)], "lsn string"
    )
    vals = [r["v"] for r in df.select(wj.lsn_version(F.col("lsn")).alias("v")).collect()]
    assert vals == sorted(vals)
    assert vals[2] == 1 << 32


def test_wal2json_end_to_end_apply(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 8)], "id long, amount double"
    )
    cols = {"id": ("bigint", F.col("id")), "amount": ("numeric", F.col("amount"))}
    upd_cols = {
        "id": ("bigint", F.col("id")),
        "amount": ("numeric", F.col("amount") + 5),
    }
    ident = {"id": ("bigint", F.col("id"))}
    snap = wj.encode_wal2json(base, table="public.orders", action="I",
                              columns=cols, lsn="0/1")
    upd = wj.encode_wal2json(base.filter(F.col("id") % 2 == 0),
                             table="public.orders", action="U",
                             columns=upd_cols, identity=ident, lsn="0/2")
    # Postgres deletes carry ONLY the identity image
    dele = wj.encode_wal2json(base.filter(F.col("id") == 7).select("id"),
                              table="public.orders", action="D",
                              columns={}, identity=ident, lsn="0/3")
    raw = wj.wal2json_raw_ops(
        snap.unionByName(upd).unionByName(dele),
        {"public.orders": ["id"]},
        rows_schemas={"public.orders": base.schema.json()},
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, normalize_raw_ops(raw), cat)
    got = {r["id"]: r["amount"] for r in cat.read(spark, "public.orders").collect()}
    want = {i: 10.0 * i + (5 if i % 2 == 0 else 0) for i in range(1, 7)}
    assert got == want


def test_wal2json_outbound_roundtrip(spark, tmp_path):
    """Render a change feed as outbound wal2json v2 messages, decode
    them through the inbound path, apply onto a replica seeded at the
    old version — replica converges to the source (the same symmetry
    proof as the Maxwell/DMS/Canal/Debezium/GoldenGate outbound
    paths; renderer matrix 6/6)."""
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 10)], "id long, amount double"
    )
    src = TableCatalog(str(tmp_path / "src"))
    apply_changelog(spark, snapshot_changelog(base, "public.orders", ["id"]), src)
    upd = dml_records(
        base.filter(F.col("id") % 2 == 0), "public.orders", ["id"], op="UPDATE",
        version=2, value_overrides={"amount": F.col("amount") + 1},
    )
    dele = dml_records(
        base.filter(F.col("id") == 9), "public.orders", ["id"], op="DELETE",
        version=2, keys_only=True,
    )
    apply_changelog(spark, upd.unionByName(dele), src)
    feed = src.table_changes(spark, "public.orders", 1, 2)
    want = {r["id"]: r["amount"] for r in src.read(spark, "public.orders").collect()}

    replica = TableCatalog(str(tmp_path / "rep"))
    apply_changelog(spark, snapshot_changelog(base, "public.orders", ["id"]), replica)
    msgs = wj.table_changes_to_wal2json(
        feed, table="public.orders", pk_names=["id"], lsn="0/2"
    )
    raw = wj.wal2json_raw_ops(msgs, {"public.orders": ["id"]})
    apply_changelog(spark, normalize_raw_ops(raw), replica)
    got = {r["id"]: r["amount"] for r in replica.read(spark, "public.orders").collect()}
    assert got == want


def test_missing_image_rows_dropped_and_quarantined(spark):
    """r7 review: rows the DLQ flags (missing_columns / missing_identity)
    must NOT also enter the apply path as null-image ops with an empty
    rowkey — v2 and v1 alike drop them at the raw-op stage."""
    from change_data_capture_spark.sources.wal2json import (
        wal2json_dead_letters,
        wal2json_raw_ops,
        wal2json_v1_dead_letters,
        wal2json_v1_raw_ops,
    )

    keys = {"public.t": ["id"]}
    v2 = spark.createDataFrame(
        [
            ('{"action":"U","schema":"public","table":"t","lsn":"0/10",'
             '"identity":[{"name":"id","type":"int","value":"1"}]}',),
            ('{"action":"D","schema":"public","table":"t","lsn":"0/11"}',),
            ('{"action":"I","schema":"public","table":"t","lsn":"0/12",'
             '"columns":[{"name":"id","type":"int","value":"2"}]}',),
        ],
        "message string",
    )
    ops = wal2json_raw_ops(v2, keys).collect()
    assert [r["op_type"] for r in ops] == ["I"]
    reasons = {r["reason"] for r in wal2json_dead_letters(v2, keys).collect()}
    assert reasons == {"missing_columns", "missing_identity"}

    v1 = spark.createDataFrame(
        [
            ('{"xid":1,"nextlsn":"0/20","change":['
             '{"kind":"update","schema":"public","table":"t",'
             '"columnnames":null,"columnvalues":null},'
             '{"kind":"delete","schema":"public","table":"t"},'
             '{"kind":"insert","schema":"public","table":"t",'
             '"columnnames":["id"],"columntypes":["int"],"columnvalues":["3"]}]}',),
        ],
        "message string",
    )
    ops1 = wal2json_v1_raw_ops(v1, keys).collect()
    assert [r["op_type"] for r in ops1] == ["I"]
    reasons1 = {r["reason"] for r in wal2json_v1_dead_letters(v1, keys).collect()}
    assert {"missing_columns", "missing_identity"} <= reasons1
