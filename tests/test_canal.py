"""Canal flatMessage decode tests: multi-row array decode with
index-aligned `old`, op mapping, PK-update split through
normalize_raw_ops, dead letters, end-to-end apply, and outbound
roundtrip — mirror of the Maxwell/DMS suites."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.sources import canal

KEYS = {"shop.orders": ["id"]}


def test_canal_multirow_decode_aligns_old_by_index(spark):
    msgs = [
        # one message, two row images; `old` aligned by position and
        # carrying only the changed column
        ('{"data":[{"id":"1","amount":"99.0"},{"id":"2","amount":"88.0"}],'
         '"database":"shop","table":"orders","type":"UPDATE","isDdl":false,'
         '"es":2,"id":5,"old":[{"amount":"10.0"},{"amount":"20.0"}],'
         '"pkNames":["id"]}',),
        ('{"data":[{"id":"3","amount":"30.0"}],"database":"shop",'
         '"table":"orders","type":"INSERT","isDdl":false,"es":1,"id":4,'
         '"pkNames":["id"]}',),
        ('{"data":[{"id":"3","amount":"30.0"}],"database":"shop",'
         '"table":"orders","type":"DELETE","isDdl":false,"es":3,"id":6,'
         '"pkNames":["id"]}',),
    ]
    out = canal.canal_raw_ops(spark.createDataFrame(msgs, "message string"), KEYS)
    rows = {(r["op_type"], r["after"]["id"] if r["after"] else r["before"]["id"]): r
            for r in out.collect()}
    u1 = rows[("U", "1")]
    assert u1["before"] == {"id": "1", "amount": "10.0"}
    assert u1["after"] == {"id": "1", "amount": "99.0"}
    assert u1["change_tracking_version"] == 2005
    u2 = rows[("U", "2")]
    assert u2["before"] == {"id": "2", "amount": "20.0"}
    ins = rows[("I", "3")]
    assert ins["before"] is None and ins["after"]["amount"] == "30.0"
    dele = rows[("D", "3")]
    assert dele["after"] is None and dele["before"]["amount"] == "30.0"
    assert dele["cdc_current_timestamp"] == 3000


def test_canal_pk_move_splits_via_normalizer(spark):
    msgs = [
        ('{"data":[{"id":"2","amount":"7.0"}],"database":"shop",'
         '"table":"orders","type":"UPDATE","isDdl":false,"es":5,"id":1,'
         '"old":[{"id":"1"}],"pkNames":["id"]}',),
    ]
    raw = canal.canal_raw_ops(spark.createDataFrame(msgs, "message string"), KEYS)
    recs = normalize_raw_ops(raw).select("dml.op_type", "dml.rows_values").collect()
    ops = {r["op_type"]: r["rows_values"] for r in recs}
    assert set(ops) == {"DELETE", "INSERT"}
    assert ops["DELETE"]["id"] == "1" and ops["INSERT"]["id"] == "2"


def test_canal_dead_letters(spark):
    msgs = [
        ('{"data":null,"database":"shop","table":"orders","type":"CREATE",'
         '"isDdl":true,"es":1,"sql":"create table orders(...)"}',),
        ('{"data":[{"id":"1"}],"database":"shop","table":"orders",'
         '"type":"TRUNCATE","isDdl":false,"es":1}',),
        ('{"data":[{"id":"1"}],"database":"other","table":"t",'
         '"type":"INSERT","isDdl":false,"es":1}',),
        ('{"data":[],"database":"shop","table":"orders","type":"INSERT",'
         '"isDdl":false,"es":1}',),
        ("not json at all",),
    ]
    mdf = spark.createDataFrame(msgs, "message string")
    assert canal.canal_raw_ops(mdf, KEYS).count() == 0
    reasons = sorted(r["reason"] for r in canal.canal_dead_letters(mdf, KEYS).collect())
    assert reasons == ["ddl", "missing_data", "unknown_table", "unparseable",
                       "unsupported_op"]


def test_canal_end_to_end_apply(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 8)], "id long, amount double"
    )
    full = F.struct(F.col("id"), F.col("amount"))
    snap = canal.encode_canal_json(
        base, table="shop.orders", typ="INSERT", data=full, es=1,
        batch_id=F.col("id"), pk_names=["id"],
    )
    upd = canal.encode_canal_json(
        base.filter(F.col("id") % 3 == 0),
        table="shop.orders", typ="UPDATE",
        data=F.struct(F.col("id"), (F.col("amount") + 5).alias("amount")),
        old=F.struct(F.col("amount")), es=2, batch_id=F.col("id"),
        pk_names=["id"],
    )
    dele = canal.encode_canal_json(
        base.filter(F.col("id") % 3 == 1),
        table="shop.orders", typ="DELETE", data=full, es=3,
        batch_id=F.col("id"), pk_names=["id"],
    )
    raw = canal.canal_raw_ops(
        snap.unionByName(upd).unionByName(dele), KEYS,
        rows_schemas={"shop.orders": base.schema.json()},
    )
    cat = TableCatalog(str(tmp_path / "canal"))
    apply_changelog(spark, normalize_raw_ops(raw), cat)
    got = {r["id"]: r["amount"] for r in cat.read(spark, "shop.orders").collect()}
    want = {
        i: (10.0 * i + 5 if i % 3 == 0 else 10.0 * i)
        for i in range(1, 8)
        if i % 3 != 1
    }
    assert got == want


def test_canal_outbound_roundtrip(spark, tmp_path):
    """Render a change feed as outbound Canal messages, decode them
    through the inbound path, apply onto a replica seeded at the old
    version — replica converges to the source (same symmetry proof as
    the Maxwell/DMS/Debezium outbound paths)."""
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

    replica = TableCatalog(str(tmp_path / "rep"))
    apply_changelog(spark, snapshot_changelog(base, "shop.orders", ["id"]), replica)
    msgs = canal.table_changes_to_canal(
        feed, table="shop.orders", pk_names=["id"], es=2
    )
    raw = canal.canal_raw_ops(msgs, KEYS)
    apply_changelog(spark, normalize_raw_ops(raw), replica)
    got = {r["id"]: r["amount"] for r in replica.read(spark, "shop.orders").collect()}
    assert got == want


def test_canal_null_row_element_quarantined(spark):
    msgs = [
        ('{"data":[null,{"id":"1","amount":"5.0"}],"database":"shop",'
         '"table":"orders","type":"INSERT","isDdl":false,"es":1}',),
    ]
    mdf = spark.createDataFrame(msgs, "message string")
    rows = canal.canal_raw_ops(mdf, KEYS).collect()
    # the real row decodes; the null element never becomes a keyless op
    assert len(rows) == 1 and rows[0]["after"]["id"] == "1"
    (dl,) = canal.canal_dead_letters(mdf, KEYS).collect()
    assert dl["reason"] == "null_row"
