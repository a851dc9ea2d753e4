"""Debezium-MongoDB decode tests: JSON-string images, post-image vs
updateDescription routing, $unset -> explicit-NULL patches, dead
letters, and the end-to-end apply + patch-merge flow — mirror of the
Maxwell/DMS/Canal suites for the document-store wire format."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.normalize import normalize_raw_ops, patch_updates
from change_data_capture_spark.sources import mongodb

KEYS = {"appdb.customers": "_id"}


def _mdf(spark, pairs):
    return spark.createDataFrame(pairs, "message string, key string")


def test_mongodb_decode_full_images(spark):
    msgs = [
        # create: after is a JSON STRING of the document
        ('{"payload":{"op":"c","after":"{\\"_id\\": \\"1\\", \\"name\\": \\"ann\\", \\"bal\\": 10.5}",'
         '"source":{"db":"appdb","rs":"rs0","collection":"customers","ts_ms":1000,"ord":2},"ts_ms":1001}}',
         '{"payload":{"id":"1"}}'),
        # snapshot read, flat (schemas.enable=false) form
        ('{"op":"r","after":"{\\"_id\\": \\"2\\", \\"name\\": \\"bob\\", \\"bal\\": 7}",'
         '"source":{"db":"appdb","rs":"rs0","collection":"customers","ts_ms":1000,"ord":3},"ts_ms":1002}',
         '{"id":"2"}'),
        # update WITH post-image; document body omits _id -> key injected
        ('{"payload":{"op":"u","after":"{\\"name\\": \\"carol\\", \\"bal\\": 3}",'
         '"source":{"db":"appdb","rs":"rs0","collection":"customers","ts_ms":2000,"ord":1},"ts_ms":2001}}',
         '{"payload":{"id":"3"}}'),
        # delete: no body at all, keyed by the message key
        ('{"payload":{"op":"d","after":null,'
         '"source":{"db":"appdb","rs":"rs0","collection":"customers","ts_ms":3000,"ord":4},"ts_ms":3001}}',
         '{"payload":{"id":"1"}}'),
    ]
    out = mongodb.mongodb_raw_ops(_mdf(spark, msgs), KEYS)
    rows = {(r["op_type"], (r["after"] or r["before"])["_id"]): r for r in out.collect()}
    assert set(rows) == {("I", "1"), ("I", "2"), ("U", "3"), ("D", "1")}
    ins = rows[("I", "1")]
    assert ins["after"] == {"_id": "1", "name": "ann", "bal": "10.5"}
    assert ins["before"] is None
    assert ins["primary_keys"] == ["_id"]
    assert ins["change_tracking_version"] == 1000 * 1000 + 2
    upd = rows[("U", "3")]
    assert upd["after"] == {"_id": "3", "name": "carol", "bal": "3"}
    assert upd["before"] is None  # _id immutable: no PK-move split needed
    dele = rows[("D", "1")]
    assert dele["before"] == {"_id": "1"} and dele["after"] is None
    assert dele["change_tracking_version"] == 3000 * 1000 + 4


def test_mongodb_patch_ops_routes_partial_updates(spark):
    msgs = [
        # partial update: $set bal + name, $unset tag -> explicit NULL
        ('{"payload":{"op":"u","after":null,"updateDescription":{'
         '"updatedFields":"{\\"bal\\": 99, \\"name\\": \\"dee\\"}",'
         '"removedFields":["tag"]},'
         '"source":{"db":"appdb","rs":"rs0","collection":"customers","ts_ms":5000,"ord":7},"ts_ms":5001}}',
         '{"payload":{"id":"4"}}'),
        # full-image update must NOT appear in the patch frame
        ('{"payload":{"op":"u","after":"{\\"_id\\": \\"5\\", \\"bal\\": 1}",'
         '"source":{"db":"appdb","rs":"rs0","collection":"customers","ts_ms":5000,"ord":8},"ts_ms":5001}}',
         '{"payload":{"id":"5"}}'),
    ]
    mdf = _mdf(spark, msgs)
    patches = mongodb.mongodb_patch_ops(mdf, KEYS).collect()
    assert len(patches) == 1
    p = patches[0]
    assert p["table"] == "appdb.customers" and p["id"] == "4"
    assert p["version"] == 5000 * 1000 + 7
    assert p["patch"] == {"bal": "99", "name": "dee", "tag": None}
    # and the raw-op frame sees only the full-image update
    raws = mongodb.mongodb_raw_ops(mdf, KEYS).collect()
    assert len(raws) == 1 and raws[0]["after"]["_id"] == "5"


def test_mongodb_dead_letters(spark):
    msgs = [
        ("not json at all", "also not json"),
        # unsupported op code
        ('{"payload":{"op":"x","source":{"db":"appdb","rs":"r","collection":"customers","ts_ms":1,"ord":1}}}',
         '{"payload":{"id":"9"}}'),
        # unknown collection
        ('{"payload":{"op":"c","after":"{\\"_id\\": \\"1\\"}",'
         '"source":{"db":"other","rs":"r","collection":"t","ts_ms":1,"ord":1}}}',
         '{"payload":{"id":"1"}}'),
        # create with no image
        ('{"payload":{"op":"c","after":null,'
         '"source":{"db":"appdb","rs":"r","collection":"customers","ts_ms":1,"ord":1}}}',
         '{"payload":{"id":"1"}}'),
        # partial update with neither after nor updateDescription
        ('{"payload":{"op":"u","after":null,'
         '"source":{"db":"appdb","rs":"r","collection":"customers","ts_ms":1,"ord":1}}}',
         '{"payload":{"id":"1"}}'),
        # delete with no key id
        ('{"payload":{"op":"d","after":null,'
         '"source":{"db":"appdb","rs":"r","collection":"customers","ts_ms":1,"ord":1}}}',
         "{}"),
    ]
    mdf = _mdf(spark, msgs)
    assert mongodb.mongodb_raw_ops(mdf, KEYS).count() == 0
    assert mongodb.mongodb_patch_ops(mdf, KEYS).count() == 0
    reasons = sorted(r["reason"] for r in mongodb.mongodb_dead_letters(mdf, KEYS).collect())
    assert reasons == [
        "missing_image", "missing_image", "missing_key",
        "unknown_table", "unparseable", "unsupported_op",
    ]


def test_mongodb_outbound_roundtrip(spark, tmp_path):
    """Render a change feed as outbound Debezium-MongoDB messages,
    decode them through the inbound path, apply onto a replica seeded
    at the old version — replica converges to the source (the same
    symmetry proof as the other six formats' outbound renderers)."""
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 10)], "_id long, bal double"
    )
    src = TableCatalog(str(tmp_path / "src"))
    apply_changelog(spark, snapshot_changelog(base, "appdb.customers", ["_id"]), src)
    upd = dml_records(
        base.filter(F.col("_id") % 2 == 0), "appdb.customers", ["_id"], op="UPDATE",
        version=2, value_overrides={"bal": F.col("bal") + 1},
    )
    dele = dml_records(
        base.filter(F.col("_id") == 9), "appdb.customers", ["_id"], op="DELETE",
        version=2, keys_only=True,
    )
    apply_changelog(spark, upd.unionByName(dele), src)
    feed = src.table_changes(spark, "appdb.customers", 1, 2)
    want = {r["_id"]: r["bal"] for r in src.read(spark, "appdb.customers").collect()}

    replica = TableCatalog(str(tmp_path / "rep"))
    apply_changelog(
        spark, snapshot_changelog(base, "appdb.customers", ["_id"]), replica
    )
    msgs = mongodb.table_changes_to_mongodb(
        feed, table="appdb.customers", id_col="_id", ts_ms=2
    )
    raw = mongodb.mongodb_raw_ops(msgs, KEYS)
    apply_changelog(spark, normalize_raw_ops(raw), replica)
    got = {r["_id"]: r["bal"] for r in replica.read(spark, "appdb.customers").collect()}
    assert got == want


def test_mongodb_end_to_end_apply_with_patches(spark, tmp_path):
    """Insert snapshot through the raw-op path, then merge a partial
    (updateDescription) stream via normalize.patch_updates: the
    document-store feed lands in a typed relational table with $set
    and $unset honored column-wise."""
    base = spark.createDataFrame(
        [(i, f"n{i}", 10.0 * i) for i in range(1, 8)],
        "_id long, name string, bal double",
    )
    snap = mongodb.encode_mongodb_json(
        base, table="appdb.customers", op="c",
        after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=1, ord_=F.col("_id").cast("int"),
    )
    raw = mongodb.mongodb_raw_ops(
        snap, KEYS, rows_schemas={"appdb.customers": base.schema.json()}
    )
    cat = TableCatalog(str(tmp_path / "mongo"))
    apply_changelog(spark, normalize_raw_ops(raw), cat)

    # partial stream: bump bal on ids % 3 == 0, $unset name on ids % 2 == 0
    part1 = mongodb.encode_mongodb_json(
        base.filter(F.col("_id") % 3 == 0), table="appdb.customers", op="u",
        updated_fields=F.struct((F.col("bal") + 5).alias("bal")),
        doc_id=F.col("_id"), ts_ms=2,
    )
    part2 = mongodb.encode_mongodb_json(
        base.filter(F.col("_id") % 2 == 0), table="appdb.customers", op="u",
        removed_fields=F.array(F.lit("name")),
        doc_id=F.col("_id"), ts_ms=3,
    )
    patches = (
        mongodb.mongodb_patch_ops(part1.unionByName(part2), KEYS)
        .select(F.col("id").cast("long").alias("_id"), "version", "patch")
    )
    merged = patch_updates(cat.read(spark, "appdb.customers"), patches, ["_id"])
    got = {r["_id"]: (r["name"], r["bal"]) for r in merged.collect()}
    want = {
        i: (None if i % 2 == 0 else f"n{i}",
            10.0 * i + 5 if i % 3 == 0 else 10.0 * i)
        for i in range(1, 8)
    }
    assert got == want


def test_mongodb_unparseable_images_quarantined_not_dropped(spark):
    """Review regression: a present-but-unparseable after/updatedFields
    string must land in the dead-letter frame (and the patch decoder
    must NOT degrade a failed updatedFields parse to an empty $set)."""
    msgs = [
        # create whose after string is not a JSON object
        ('{"payload":{"op":"c","after":"not{json",'
         '"source":{"db":"appdb","rs":"r","collection":"customers","ts_ms":1,"ord":1}}}',
         '{"payload":{"id":"1"}}'),
        # partial update whose updatedFields string is garbage
        ('{"payload":{"op":"u","after":null,"updateDescription":{'
         '"updatedFields":"][","removedFields":["x"]},'
         '"source":{"db":"appdb","rs":"r","collection":"customers","ts_ms":1,"ord":2}}}',
         '{"payload":{"id":"2"}}'),
    ]
    mdf = _mdf(spark, msgs)
    assert mongodb.mongodb_raw_ops(mdf, KEYS).count() == 0
    assert mongodb.mongodb_patch_ops(mdf, KEYS).count() == 0
    reasons = sorted(r["reason"] for r in mongodb.mongodb_dead_letters(mdf, KEYS).collect())
    assert reasons == ["unparseable_image", "unparseable_patch"]


def test_mongodb_idless_full_image_quarantined_not_null_key(spark):
    """Advisor regression: a c/r/u whose document PARSES but carries
    no id anywhere (no id field in the body, null message key) must
    not pass has_identity and merge under a NULL primary key — it is
    quarantined as missing_key; the same shape WITH a key id still
    decodes (key injected)."""
    idless = (
        '{"payload":{"op":"c","after":"{\\"name\\": \\"ghost\\", \\"bal\\": 1}",'
        '"source":{"db":"appdb","rs":"r","collection":"customers","ts_ms":1,"ord":1}}}',
        "{}",
    )
    keyed = (
        '{"payload":{"op":"u","after":"{\\"name\\": \\"ok\\", \\"bal\\": 2}",'
        '"source":{"db":"appdb","rs":"r","collection":"customers","ts_ms":2,"ord":1}}}',
        '{"payload":{"id":"7"}}',
    )
    mdf = _mdf(spark, [idless, keyed])
    rows = mongodb.mongodb_raw_ops(mdf, KEYS).collect()
    assert len(rows) == 1 and rows[0]["after"]["_id"] == "7"
    dead = mongodb.mongodb_dead_letters(mdf, KEYS).collect()
    assert [r["reason"] for r in dead] == ["missing_key"]
