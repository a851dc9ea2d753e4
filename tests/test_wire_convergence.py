"""Cross-format convergence: the SAME logical change stream rendered
in each JSON wire format (Debezium, Maxwell, DMS, Canal, wal2json,
GoldenGate wrapper wire), decoded by
its own inbound path, and applied through the one shared engine must
produce BYTE-IDENTICAL table content — proven with the audit module's
order-insensitive content checksums against a directly-applied
baseline catalog."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.audit import checksum_diff, table_checksum
from change_data_capture_spark.changelog import mutation_changelog, snapshot_changelog
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.sources import canal, debezium, kafka
from change_data_capture_spark.sources import mongodb as mg
from change_data_capture_spark.sources import wal2json as wj
from change_data_capture_spark.sources import wire_formats as wf

T = "shop.orders"
KEYS = {T: ["id"]}


def test_all_wire_formats_converge_to_identical_checksums(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, 10.0 * i, f"c{i % 4}") for i in range(1, 40)],
        "id long, amount double, tag string",
    )
    upd_where = F.col("id") % 3 == 0
    del_where = F.col("id") % 7 == 2
    upd_data = F.struct(
        F.col("id"), (F.col("amount") + 5).alias("amount"), F.col("tag")
    )
    full = F.struct(F.col("id"), F.col("amount"), F.col("tag"))
    schema_json = base.schema.json()

    # baseline: the same logical stream applied directly
    ref = TableCatalog(str(tmp_path / "ref"))
    apply_changelog(spark, snapshot_changelog(base, T, ["id"]), ref)
    apply_changelog(
        spark,
        mutation_changelog(
            base, T, ["id"],
            update_where=upd_where, update_set={"amount": F.col("amount") + 5},
            update_version=2, delete_where=del_where, delete_version=3,
        ),
        ref,
    )
    ref_sum = table_checksum(spark, ref, T)

    def mx_feed():
        snap = wf.encode_maxwell_json(base, table=T, typ="bootstrap-insert",
                                      data=full, ts=1, xid=F.col("id"))
        upd = wf.encode_maxwell_json(base.filter(upd_where), table=T, typ="update",
                                     data=upd_data, old=F.struct(F.col("amount")),
                                     ts=2, xid=F.col("id"))
        dele = wf.encode_maxwell_json(base.filter(del_where), table=T, typ="delete",
                                      data=full, ts=3, xid=F.col("id"))
        return wf.maxwell_raw_ops(
            snap.unionByName(upd).unionByName(dele), KEYS,
            rows_schemas={T: schema_json},
        )

    def dms_feed():
        snap = wf.encode_dms_json(base, table=T, operation="load", data=full,
                                  timestamp="1970-01-01T00:00:00.001Z")
        upd = wf.encode_dms_json(base.filter(upd_where), table=T, operation="update",
                                 data=upd_data, timestamp="1970-01-01T00:00:00.002Z")
        dele = wf.encode_dms_json(base.filter(del_where), table=T, operation="delete",
                                  data=full, timestamp="1970-01-01T00:00:00.003Z")
        return wf.dms_raw_ops(
            snap.unionByName(upd).unionByName(dele), KEYS,
            rows_schemas={T: schema_json},
        )

    def canal_feed():
        snap = canal.encode_canal_json(base, table=T, typ="INSERT", data=full,
                                       es=1, batch_id=F.col("id"), pk_names=["id"])
        upd = canal.encode_canal_json(base.filter(upd_where), table=T, typ="UPDATE",
                                      data=upd_data, old=F.struct(F.col("amount")),
                                      es=2, batch_id=F.col("id"), pk_names=["id"])
        dele = canal.encode_canal_json(base.filter(del_where), table=T, typ="DELETE",
                                       data=full, es=3, batch_id=F.col("id"),
                                       pk_names=["id"])
        return canal.canal_raw_ops(
            snap.unionByName(upd).unionByName(dele), KEYS,
            rows_schemas={T: schema_json},
        )

    def dbz_feed():
        snap = debezium.encode_debezium_json(base, table=T, op="r", before=None, after=full, ts_ms=1)
        upd = debezium.encode_debezium_json(
            base.filter(upd_where), table=T, op="u", after=upd_data,
            before=full, ts_ms=2,
        )
        dele = debezium.encode_debezium_json(
            base.filter(del_where), table=T, op="d", before=full, after=None,
            ts_ms=3,
        )
        return debezium.debezium_raw_ops(
            snap.unionByName(upd).unionByName(dele), KEYS,
            rows_schemas={T: schema_json},
        )

    def gg_feed():
        tag = lambda df, t: df.withColumn("_change_type", F.lit(t))  # noqa: E731
        render = lambda df, v: kafka.table_changes_to_goldengate(  # noqa: E731
            df, table=T, fingerprint=99, pk_names=["id"], version=v, ts_micros=v
        )
        msgs = (
            kafka.goldengate_schema_message(
                spark, table=T, fingerprint=99, schema_json=schema_json
            )
            .unionByName(render(tag(base, "insert"), 1))
            .unionByName(
                render(
                    tag(
                        base.filter(upd_where).withColumn(
                            "amount", F.col("amount") + 5
                        ),
                        "update_postimage",
                    ),
                    2,
                )
            )
            .unionByName(render(tag(base.filter(del_where), "delete"), 3))
        )
        return kafka.goldengate_changelog(msgs)

    def wal_feed():
        cols = {"id": ("bigint", F.col("id")),
                "amount": ("numeric", F.col("amount")),
                "tag": ("text", F.col("tag"))}
        upd_cols = dict(cols, amount=("numeric", F.col("amount") + 5))
        ident = {"id": ("bigint", F.col("id"))}
        snap = wj.encode_wal2json(base, table=T, action="I", columns=cols,
                                  lsn="0/1")
        upd = wj.encode_wal2json(base.filter(upd_where), table=T, action="U",
                                 columns=upd_cols, identity=ident, lsn="0/2")
        # deletes carry ONLY the identity image, as Postgres emits them
        dele = wj.encode_wal2json(base.filter(del_where).select("id"), table=T,
                                  action="D", columns={}, identity=ident,
                                  lsn="0/3")
        return wj.wal2json_raw_ops(
            snap.unionByName(upd).unionByName(dele), KEYS,
            rows_schemas={T: schema_json},
        )

    def mongo_feed():
        mkeys = {T: "id"}
        snap = mg.encode_mongodb_json(base, table=T, op="c", after=full,
                                      doc_id=F.col("id"), ts_ms=1)
        upd = mg.encode_mongodb_json(base.filter(upd_where), table=T, op="u",
                                     after=upd_data, doc_id=F.col("id"), ts_ms=2)
        # deletes carry NO body at all, keyed by the message key
        dele = mg.encode_mongodb_json(base.filter(del_where), table=T, op="d",
                                      doc_id=F.col("id"), ts_ms=3)
        return mg.mongodb_raw_ops(
            snap.unionByName(upd).unionByName(dele), mkeys,
            rows_schemas={T: schema_json},
        )

    for name, feed in (
        ("maxwell", mx_feed), ("dms", dms_feed),
        ("canal", canal_feed), ("debezium", dbz_feed),
        ("wal2json", wal_feed), ("mongodb", mongo_feed),
    ):
        cat = TableCatalog(str(tmp_path / name))
        apply_changelog(spark, normalize_raw_ops(feed()), cat)
        diff = checksum_diff(ref_sum, table_checksum(spark, cat, T)).collect()
        assert diff == [], (name, diff)

    # fifth format: the engine's OWN outbound GoldenGate wrapper wire,
    # decoded by its own inbound path — renderer matrix closed 5/5
    cat = TableCatalog(str(tmp_path / "goldengate"))
    apply_changelog(spark, gg_feed(), cat)
    diff = checksum_diff(ref_sum, table_checksum(spark, cat, T)).collect()
    assert diff == [], ("goldengate", diff)


def test_goldengate_render_drops_preimage_and_raises_on_unknown(spark):
    """Producer-side contract: update_preimage rows (Delta-style CDF)
    render to NOTHING (the wrapper wire has no preimage slot); any
    other unknown _change_type fails AT RENDER, before junk reaches
    the wire."""
    import pytest
    from change_data_capture_spark.sources import kafka

    cdf = spark.createDataFrame(
        [(1, 10.0, "update_preimage"), (1, 15.0, "update_postimage")],
        "id long, amount double, _change_type string",
    )
    out = kafka.table_changes_to_goldengate(
        cdf, table="t.x", fingerprint=1, pk_names=["id"]
    ).collect()
    assert len(out) == 1 and '"op_type":"U"' in out[0]["message"]

    bad = spark.createDataFrame(
        [(1, 10.0, "truncate")], "id long, amount double, _change_type string"
    )
    with pytest.raises(Exception, match="unknown _change_type"):
        kafka.table_changes_to_goldengate(
            bad, table="t.x", fingerprint=1, pk_names=["id"]
        ).collect()

    null_t = spark.createDataFrame(
        [(1, 10.0, None)], "id long, amount double, _change_type string"
    )
    with pytest.raises(Exception, match="unknown _change_type"):
        kafka.table_changes_to_goldengate(
            null_t, table="t.x", fingerprint=1, pk_names=["id"]
        ).collect()


def test_outbound_renderers_survive_retype_boundary_cdf(spark, tmp_path):
    """r8 seam: a CDF crossing a physical re-type boundary can carry a
    DELETE whose non-key column is NULL (the since-deleted row's value
    was uncastable under the new type — table_changes nulls it rather
    than crash). Every outbound renderer must render that frame, and
    each message format's own inbound decoder must classify the delete
    with the right key."""
    from change_data_capture_spark.changelog import dml_records
    from change_data_capture_spark.sources import mssql_cdc as ms

    cat = TableCatalog(str(tmp_path / "src"))
    df = spark.createDataFrame([(1, "abc"), (2, "10")], "id long, note string")
    apply_changelog(spark, snapshot_changelog(df, T, ["id"]), cat)
    apply_changelog(
        spark,
        dml_records(df.filter("id = 1"), T, ["id"], op="DELETE",
                    version=2, keys_only=True),
        cat,
    )
    cat.announce_schema(
        T, spark.createDataFrame([], "id long, note bigint").schema.json(),
        spark=spark,
    )
    changes = cat.table_changes(spark, T, 1)
    assert [(r.id, r.note, r._change_type) for r in changes.collect()] == [
        (1, None, "delete")
    ]

    # message formats: render -> inbound decode -> one D/delete for id 1
    renders = {
        "debezium": (
            lambda: debezium.table_changes_to_debezium(changes, table=T),
            lambda m: debezium.debezium_raw_ops(m, KEYS),
        ),
        "maxwell": (
            lambda: wf.table_changes_to_maxwell(changes, table=T),
            lambda m: wf.maxwell_raw_ops(m, KEYS),
        ),
        "dms": (
            lambda: wf.table_changes_to_dms(changes, table=T),
            lambda m: wf.dms_raw_ops(m, KEYS),
        ),
        "canal": (
            lambda: canal.table_changes_to_canal(changes, table=T,
                                                 pk_names=["id"]),
            lambda m: canal.canal_raw_ops(m, KEYS),
        ),
        "wal2json": (
            lambda: wj.table_changes_to_wal2json(changes, table=T,
                                                 pk_names=["id"]),
            lambda m: wj.wal2json_raw_ops(m, KEYS),
        ),
        "mongodb": (
            lambda: mg.table_changes_to_mongodb(changes, table=T,
                                                id_col="id"),
            lambda m: mg.mongodb_raw_ops(m, {T: "id"}),
        ),
    }
    for name, (render, decode) in renders.items():
        msgs = render()
        ops = decode(msgs).collect()
        assert len(ops) == 1, f"{name}: {ops}"
        r = ops[0]
        key = (r.before or r.after)["id" if name != "mongodb" else "id"]
        assert r.op_type == "D" and key == "1", f"{name}: {r}"

    # row-shaped protocol: render -> pairing decode -> one D for id 1
    rows = ms.table_changes_to_mssql_cdc(changes, pk_names=["id"])
    ops = ms.mssql_cdc_raw_ops(rows, T, ["id"]).collect()
    assert len(ops) == 1 and ops[0].op_type == "D"
    assert ops[0].before["id"] == "1"
