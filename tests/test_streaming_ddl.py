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
