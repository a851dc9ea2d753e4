"""Structured Streaming with mid-stream DDL: a file-backed Maxwell
feed whose second micro-batch carries a table-alter BEFORE rows using
the new column — the foreachBatch body routes control-plane events
through sources/ddl and data-plane rows through the decoder, in order
(DDL-before-DML per batch, T3), and the table evolves live."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changes
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.sources import ddl
from change_data_capture_spark.sources import wire_formats as wf

KEYS = {"shop.orders": ["id"]}


def test_maxwell_stream_with_midstream_alter(spark, tmp_path):
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    create = (
        '{"type":"table-create","database":"shop","table":"orders","ts":1,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"},{"type":"double","name":"amount"}],'
        '"primary-key":["id"]}}'
    )
    ins1 = (
        '{"database":"shop","table":"orders","type":"insert","ts":1,"xid":1,'
        '"data":{"id":1,"amount":10.0}}'
    )
    alter = (
        '{"type":"table-alter","database":"shop","table":"orders","ts":2,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"},{"type":"double","name":"amount"},'
        '{"type":"varchar(16)","name":"ship_mode"}],"primary-key":["id"]}}'
    )
    ins2 = (
        '{"database":"shop","table":"orders","type":"insert","ts":2,"xid":2,'
        '"data":{"id":2,"amount":20.0,"ship_mode":"express"}}'
    )
    spark.createDataFrame([(create,), (ins1,)], "value string").coalesce(1)\
        .write.mode("append").text(in_dir)
    spark.createDataFrame([(alter,), (ins2,)], "value string").coalesce(1)\
        .write.mode("append").text(in_dir)

    cat = TableCatalog(str(tmp_path / "cat"))

    def on_batch(batch_df, _):
        msgs = batch_df.select(F.col("value").alias("message"))
        # control plane first: DDL-before-DML within the micro-batch
        ddl.apply_maxwell_ddl(msgs, cat, compat_mode="BACKWARD")
        raw = wf.maxwell_raw_ops(msgs, KEYS)
        apply_changes(batch_df.sparkSession, normalize_raw_ops(raw), cat)

    q = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .text(in_dir)
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["id"]: (r["amount"], r["ship_mode"])
           for r in cat.read(spark, "shop.orders").collect()}
    assert got == {1: (10.0, None), 2: (20.0, "express")}

# --- ST1 two-phase state contract (VERDICT r6 watch item #2 /
# directive #6): a FAILED apply must leave the caller-held dedup dict
# untouched so the retried batch re-announces instead of being
# suppressed forever (and every later DML applying under a stale
# schema — the silent-wrong-answer mode the contract exists to block).

from change_data_capture_spark.changelog import ddl_record
from change_data_capture_spark.streaming import dedupe_ddl_batch


class _FlakyCatalog(TableCatalog):
    """announce_schema raises on the first N calls, then delegates."""

    def __init__(self, root, fail_times):
        super().__init__(root)
        self._fails_left = fail_times

    def announce_schema(self, table_id, schema_json, spark=None):
        if self._fails_left > 0:
            self._fails_left -= 1
            raise RuntimeError("injected announce failure")
        return super().announce_schema(table_id, schema_json, spark=spark)


def test_failed_announce_leaves_dedup_state_untouched_for_retry(spark, tmp_path):
    """apply_changes owns the merge (announce first, record after):
    when announce_schema raises, ddl_dedup_state must not have recorded
    the schema, and the at-least-once retry of the SAME batch must
    re-announce and land it."""
    base = spark.createDataFrame([(1, "a")], "id long, v string")
    cat = _FlakyCatalog(str(tmp_path / "cat"), fail_times=1)
    state: dict[str, str] = {}
    batch = ddl_record(spark, "ns.t", base.schema.json())

    try:
        apply_changes(spark, batch, cat, ddl_dedup_state=state)
        raise AssertionError("expected injected announce failure")
    except RuntimeError:
        pass
    # the failed announcement was NOT recorded as done
    assert state == {}

    # at-least-once redelivery of the same batch: not suppressed,
    # announce succeeds, state records it only now
    apply_changes(spark, batch, cat, ddl_dedup_state=state)
    assert state == {"ns.t": base.schema.json()}
    assert "ns.t" in cat.tables()

    # third delivery: suppressed by state, still no error, state stable
    apply_changes(spark, batch, cat, ddl_dedup_state=state)
    assert state == {"ns.t": base.schema.json()}


def test_failed_announce_mid_batch_keeps_earlier_tables_recorded(spark, tmp_path):
    """Two tables in one batch, the SECOND announce fails: the first
    table's announcement is durable and recorded; the retry re-runs the
    first announce as an idempotent no-op (suppressed by state) and
    lands the second."""
    a = spark.createDataFrame([(1,)], "id long")
    b = spark.createDataFrame([(1,)], "k long")
    cat = _FlakyCatalog(str(tmp_path / "cat"), fail_times=0)
    state: dict[str, str] = {}
    batch = ddl_record(spark, "ns.a", a.schema.json()).unionByName(
        ddl_record(spark, "ns.b", b.schema.json())
    )

    # fail exactly the second announce of the first attempt
    cat._fails_left = 0
    orig = TableCatalog.announce_schema
    calls = {"n": 0}

    def flaky(self, table_id, schema_json, spark=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected announce failure")
        return orig(self, table_id, schema_json, spark=spark)

    cat.announce_schema = flaky.__get__(cat)
    try:
        apply_changes(spark, batch, cat, ddl_dedup_state=state)
        raise AssertionError("expected injected announce failure")
    except RuntimeError:
        pass
    # exactly the one announce that landed is recorded (cross-table
    # order in the metadata collect is not guaranteed, so don't assume
    # WHICH of the two failed — only that the failed one is absent)
    assert len(state) == 1
    assert state.items() <= {
        "ns.a": a.schema.json(), "ns.b": b.schema.json()
    }.items()

    apply_changes(spark, batch, cat, ddl_dedup_state=state)
    assert state == {"ns.a": a.schema.json(), "ns.b": b.schema.json()}
    assert set(cat.tables()) >= {"ns.a", "ns.b"}


def test_dedupe_ddl_batch_two_phase_contract_survives_failed_apply(spark):
    """The standalone foreachBatch twin: following the documented
    two-phase pattern (merge updates ONLY after a successful apply), a
    failed apply plus redelivery re-emits the DDL; merging records it;
    a third delivery is then suppressed."""
    schema_json = spark.createDataFrame([(1,)], "id long").schema.json()
    batch = ddl_record(spark, "ns.t", schema_json)
    state: dict[str, str] = {}

    frame1, updates1 = dedupe_ddl_batch(batch, state)
    assert frame1.filter(F.col("ddl").isNotNull()).count() == 1
    assert updates1 == {"ns.t": schema_json}
    # apply FAILED -> per contract the caller does NOT merge updates1
    assert state == {}

    # redelivery with untouched state: the DDL must pass through again
    frame2, updates2 = dedupe_ddl_batch(batch, state)
    assert frame2.filter(F.col("ddl").isNotNull()).count() == 1

    # apply succeeded this time -> merge, then a re-announcement dedups
    state.update(updates2)
    frame3, updates3 = dedupe_ddl_batch(batch, state)
    assert frame3.filter(F.col("ddl").isNotNull()).count() == 0
    assert updates3 == {"ns.t": schema_json}
