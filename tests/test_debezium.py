"""Debezium envelope decode: wrapped + flat forms, op-code mapping,
whitelist drop semantics, typed-JSON -> string-map coercion, and the
full decode -> normalize -> apply pipeline."""

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changes
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.sources import debezium


KEYS = {"shop.orders": ["id"]}


def msgs(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "message string")


WRAPPED_INSERT = (
    '{"schema": {"type": "struct"}, "payload": {"before": null, '
    '"after": {"id": 7, "item": "ax", "qty": 2, "price": 10.5, "rush": true}, '
    '"source": {"db": "shop", "table": "orders", "ts_ms": 100, "lsn": 55}, '
    '"op": "c", "ts_ms": 990}}'
)
FLAT_UPDATE = (
    '{"before": {"id": 7, "item": "ax", "qty": 2, "price": 10.5, "rush": true}, '
    '"after": {"id": 7, "item": "ax", "qty": 5, "price": 10.5, "rush": false}, '
    '"source": {"db": "shop", "table": "orders", "ts_ms": 200}, "op": "u", "ts_ms": 991}'
)
FLAT_DELETE = (
    '{"before": {"id": 7, "item": "ax", "qty": 5}, "after": null, '
    '"source": {"db": "shop", "table": "orders", "ts_ms": 300}, "op": "d", "ts_ms": 992}'
)
SNAPSHOT_READ = (
    '{"payload": {"before": null, "after": {"id": 1, "item": "b"}, '
    '"source": {"db": "shop", "table": "orders", "ts_ms": 50}, "op": "r", "ts_ms": 900}}'
)
TRUNCATE = (
    '{"before": null, "after": null, '
    '"source": {"db": "shop", "table": "orders", "ts_ms": 400}, "op": "t", "ts_ms": 993}'
)
OTHER_TABLE = (
    '{"before": null, "after": {"id": 9}, '
    '"source": {"db": "shop", "table": "audit_log", "ts_ms": 10}, "op": "c", "ts_ms": 11}'
)


def test_wrapped_and_flat_forms_decode_identically(spark):
    raw = debezium.debezium_raw_ops(
        msgs(spark, WRAPPED_INSERT, FLAT_UPDATE, FLAT_DELETE, SNAPSHOT_READ), KEYS
    )
    rows = {(r["op_type"], r["change_tracking_version"]): r for r in raw.collect()}
    assert set(rows) == {("I", 100), ("U", 200), ("D", 300), ("I", 50)}
    ins = rows[("I", 100)]
    # typed JSON values coerce to the stringified-values contract
    assert ins["after"] == {"id": "7", "item": "ax", "qty": "2", "price": "10.5", "rush": "true"}
    assert ins["before"] is None
    assert ins["primary_keys"] == ["id"]
    assert ins["table"] == "shop.orders"
    assert ins["cdc_current_timestamp"] == 990_000
    upd = rows[("U", 200)]
    assert upd["before"]["qty"] == "2" and upd["after"]["qty"] == "5"
    assert rows[("D", 300)]["after"] is None


def test_truncate_and_unlisted_tables_are_dropped(spark):
    raw = debezium.debezium_raw_ops(
        msgs(spark, WRAPPED_INSERT, TRUNCATE, OTHER_TABLE), KEYS
    )
    assert raw.count() == 1


def test_decode_plan_is_jvm_only(spark):
    raw = debezium.debezium_raw_ops(msgs(spark, WRAPPED_INSERT), KEYS)
    plan = raw._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map stage, no shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pk_update_split_applies_through_normalize(spark):
    """A Debezium 'u' that changes the key splits into DELETE(before)
    + INSERT(after) — the engine's subtlest shared semantic, running
    unchanged on the Debezium path."""
    key_change = (
        '{"before": {"id": 7, "item": "ax"}, "after": {"id": 8, "item": "ax"}, '
        '"source": {"db": "shop", "table": "orders", "ts_ms": 500}, "op": "u", "ts_ms": 994}'
    )
    raw = debezium.debezium_raw_ops(msgs(spark, key_change), KEYS)
    recs = normalize_raw_ops(raw).select("dml.op_type", "dml.rows_values").collect()
    got = sorted((r["op_type"], r["rows_values"]["id"]) for r in recs)
    assert got == [("DELETE", "7"), ("INSERT", "8")]


def test_decode_normalize_apply_end_to_end(spark, tmp_path):
    schema_json = (
        spark.createDataFrame([], "id bigint, item string, qty bigint").schema.json()
    )
    raw = debezium.debezium_raw_ops(
        msgs(
            spark,
            '{"payload": {"before": null, "after": {"id": 1, "item": "a", "qty": 3}, '
            '"source": {"db": "shop", "table": "orders", "ts_ms": 1}, "op": "r", "ts_ms": 1}}',
            '{"before": null, "after": {"id": 2, "item": "b", "qty": 4}, '
            '"source": {"db": "shop", "table": "orders", "ts_ms": 2}, "op": "c", "ts_ms": 2}',
            '{"before": {"id": 1, "item": "a", "qty": 3}, "after": {"id": 1, "item": "a", "qty": 9}, '
            '"source": {"db": "shop", "table": "orders", "ts_ms": 3}, "op": "u", "ts_ms": 3}',
            '{"before": {"id": 2, "item": "b", "qty": 4}, "after": null, '
            '"source": {"db": "shop", "table": "orders", "ts_ms": 4}, "op": "d", "ts_ms": 4}',
        ),
        KEYS,
        rows_schemas={"shop.orders": schema_json},
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changes(spark, normalize_raw_ops(raw), cat)
    got = {r["id"]: (r["item"], r["qty"]) for r in cat.read(spark, "shop.orders").collect()}
    assert got == {1: ("a", 9)}


def test_encode_roundtrips_through_decode(spark):
    rows = spark.range(1, 6).select(
        F.col("id"), F.concat(F.lit("item"), F.col("id")).alias("item")
    )
    enc = debezium.encode_debezium_json(
        rows,
        table="shop.orders",
        op="c",
        before=None,
        after=F.struct("id", "item"),
        ts_ms=F.col("id") + 100,
        wrapped=F.col("id") % 2 == 0,  # exercise BOTH forms in one feed
    )
    raw = debezium.debezium_raw_ops(enc, KEYS)
    got = sorted(
        (r["after"]["id"], r["after"]["item"], r["change_tracking_version"])
        for r in raw.collect()
    )
    assert got == [(str(i), f"item{i}", i + 100) for i in range(1, 6)]


def test_outbound_cdf_renders_and_roundtrips(spark, tmp_path):
    """table_changes -> Debezium messages -> inbound decode closes the
    loop: image placement per op (delete carries before, insert/update
    after), ts threading, and op-code mapping all roundtrip."""
    from change_data_capture_spark.changelog import mutation_changelog, snapshot_changelog
    from change_data_capture_spark.apply import apply_changelog

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id bigint, v string, bal double"
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "shop.t", ["id"]), cat)
    mut = mutation_changelog(
        base, "shop.t", ["id"],
        update_where=F.col("id") == 1, update_set={"bal": F.lit(99.0)},
        update_version=2,
        delete_where=F.col("id") == 3, delete_version=3,
    )
    apply_changelog(spark, mut, cat)
    feed = cat.table_changes(spark, "shop.t", from_version=1, to_version=2)
    msgs_df = debezium.table_changes_to_debezium(feed, table="shop.t", ts_ms=7)
    raw = debezium.debezium_raw_ops(msgs_df, {"shop.t": ["id"]})
    rows = {r["op_type"]: r for r in raw.collect()}
    assert set(rows) == {"U", "D"}
    assert rows["U"]["after"] == {"id": "1", "v": "a", "bal": "99.0"}
    assert rows["U"]["before"] is None
    assert rows["D"]["before"] == {"id": "3", "v": "c", "bal": "30.0"}
    assert rows["D"]["after"] is None
    assert all(r["change_tracking_version"] == 7 for r in rows.values())


def test_dead_letters_complement_the_decode(spark):
    feed = msgs(
        spark,
        WRAPPED_INSERT,          # good
        TRUNCATE,                # unsupported_op
        OTHER_TABLE,             # unknown_table
        "not json at all",       # unparseable
        '{"op": "z", "source": {"db": "shop", "table": "orders"}}',  # unsupported_op
    )
    good = debezium.debezium_raw_ops(feed, KEYS)
    dead = debezium.debezium_dead_letters(feed, KEYS)
    assert good.count() == 1
    got = {r["reason"] for r in dead.collect()}
    assert got == {"unsupported_op", "unknown_table", "unparseable"}
    assert dead.count() + good.count() == feed.count()
    # dead letters carry the original message for replay
    assert all(r["message"] for r in dead.collect())


def test_streaming_debezium_feed_applies_end_to_end(spark, tmp_path):
    """A file-backed stream of Debezium messages drives the full
    decode -> normalize -> foreachBatch apply pipeline: the same
    Structured Streaming shape a Kafka-backed deployment runs, with
    the source swapped for files (no broker in the container)."""
    from change_data_capture_spark.apply import apply_changes

    schema_json = (
        spark.createDataFrame([], "id bigint, item string, qty bigint").schema.json()
    )
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    batch1 = [
        '{"payload": {"before": null, "after": {"id": 1, "item": "a", "qty": 3}, '
        '"source": {"db": "shop", "table": "orders", "ts_ms": 1}, "op": "r", "ts_ms": 1}}',
        '{"before": null, "after": {"id": 2, "item": "b", "qty": 4}, '
        '"source": {"db": "shop", "table": "orders", "ts_ms": 2}, "op": "c", "ts_ms": 2}',
    ]
    batch2 = [
        '{"before": {"id": 1, "item": "a", "qty": 3}, "after": {"id": 1, "item": "a", "qty": 9}, '
        '"source": {"db": "shop", "table": "orders", "ts_ms": 3}, "op": "u", "ts_ms": 3}',
        '{"before": {"id": 2, "item": "b", "qty": 4}, "after": null, '
        '"source": {"db": "shop", "table": "orders", "ts_ms": 4}, "op": "d", "ts_ms": 4}',
    ]
    msgs(spark, *batch1).coalesce(1).write.mode("append").text(in_dir)
    msgs(spark, *batch2).coalesce(1).write.mode("append").text(in_dir)

    cat = TableCatalog(str(tmp_path / "cat"))
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .text(in_dir)
        .select(F.col("value").alias("message"))
    )

    def on_batch(batch_df, _):
        raw = debezium.debezium_raw_ops(
            batch_df, KEYS, rows_schemas={"shop.orders": schema_json}
        )
        apply_changes(batch_df.sparkSession, normalize_raw_ops(raw), cat)

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["id"]: (r["item"], r["qty"]) for r in cat.read(spark, "shop.orders").collect()}
    assert got == {1: ("a", 9)}


def test_schema_drift_evolves_table_mid_stream(spark, tmp_path):
    """A Debezium feed that starts carrying a new column (connector
    schema drift, no DDL event) evolves the managed table: the new
    column lands as nullable STRING, earlier rows read NULL, and the
    merge keeps working."""
    from change_data_capture_spark.apply import apply_changes
    from change_data_capture_spark.sources.debezium import evolve_from_observed_columns

    schema_json = spark.createDataFrame([], "id bigint, item string").schema.json()
    cat = TableCatalog(str(tmp_path / "cat"))

    batch1 = debezium.debezium_raw_ops(
        msgs(
            spark,
            '{"before": null, "after": {"id": 1, "item": "a"}, '
            '"source": {"db": "shop", "table": "orders", "ts_ms": 1}, "op": "c", "ts_ms": 1}',
        ),
        KEYS, rows_schemas={"shop.orders": schema_json},
    )
    assert evolve_from_observed_columns(batch1, cat) == {}  # not created yet
    apply_changes(spark, normalize_raw_ops(batch1), cat)

    batch2 = debezium.debezium_raw_ops(
        msgs(
            spark,
            '{"before": null, "after": {"id": 2, "item": "b", "color": "red"}, '
            '"source": {"db": "shop", "table": "orders", "ts_ms": 2}, "op": "c", "ts_ms": 2}',
        ),
        KEYS, rows_schemas={"shop.orders": schema_json},
    )
    added = evolve_from_observed_columns(batch2, cat)
    assert added == {"shop.orders": ["color"]}
    apply_changes(spark, normalize_raw_ops(batch2), cat)

    got = {r["id"]: (r["item"], r["color"]) for r in cat.read(spark, "shop.orders").collect()}
    assert got == {1: ("a", None), 2: ("b", "red")}

    # idempotent: re-observing the same columns adds nothing
    assert evolve_from_observed_columns(batch2, cat) == {}


def test_debezium_vector_payload_applies_typed(spark, sf_dir, tmp_path):
    """A Debezium feed carrying an array column lands as TYPED vectors
    in the managed table: Catalyst's from_json into map<string,string>
    preserves nested values as their raw JSON text (probed behavior),
    and the apply's schema-driven decode from_json's them back — no
    wire-format change needed for complex columns."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.normalize import normalize_raw_ops
    from change_data_capture_spark.sources import debezium
    from tests.conftest import load

    emb = load(spark, sf_dir, "embeddings").limit(20)
    full = F.struct(*[F.col(c) for c in emb.columns])
    msgs = debezium.encode_debezium_json(
        emb, table="ml.emb", op="r", before=None, after=full, ts_ms=1
    )
    raw = debezium.debezium_raw_ops(
        msgs, {"ml.emb": ["vec_id"]}, rows_schemas={"ml.emb": emb.schema.json()}
    )
    cat = TableCatalog(str(tmp_path / "vec"))
    apply_changelog(spark, normalize_raw_ops(raw), cat)
    got = cat.read(spark, "ml.emb")
    assert dict(got.dtypes)["embedding"].startswith("array<")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, emb.collect()))


def test_missing_image_rows_dropped_and_quarantined(spark):
    """r7 review: a c/r/u frame with no after row (or d with no before
    row) must be dropped from the raw-op path — not enter the apply as
    a null-image op with an empty rowkey — and the DLQ names it
    'missing_image'."""
    from change_data_capture_spark.sources.debezium import (
        debezium_dead_letters,
        debezium_raw_ops,
    )

    keys = {"db.t": ["id"]}
    msgs = spark.createDataFrame(
        [
            ('{"op":"u","source":{"db":"db","table":"t","ts_ms":5}}',),
            ('{"op":"d","source":{"db":"db","table":"t","ts_ms":6}}',),
            ('{"op":"c","source":{"db":"db","table":"t","ts_ms":7},'
             '"after":{"id":"1","v":"x"}}',),
        ],
        "message string",
    )
    ops = debezium_raw_ops(msgs, keys).collect()
    assert [r["op_type"] for r in ops] == ["I"]
    dl = debezium_dead_letters(msgs, keys).collect()
    assert {r["reason"] for r in dl} == {"missing_image"}
    assert {r["op"] for r in dl} == {"u", "d"}
