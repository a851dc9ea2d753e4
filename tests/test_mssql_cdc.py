"""SQL Server CDC-table normalize tests: 3/4 update-image pairing on
the shared __$seqval, operation mapping, missing-preimage degradation,
binary-LSN canonicalization, dense cross-batch versioning, PK-update
split through normalize_raw_ops, and end-to-end apply."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.sources import mssql_cdc as ms

SHAPE = ("`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
         "`__$update_mask` string, id long, amount double")


def _changes(spark, rows):
    return spark.createDataFrame(
        [(lsn, seq, op, None, i, a) for lsn, seq, op, i, a in rows], SHAPE
    )


def test_update_pair_folds_into_one_raw_op(spark):
    ch = _changes(spark, [
        ("0A", "01", 3, 1, 10.0),   # update before
        ("0A", "01", 4, 1, 99.0),   # update after, SAME seqval
        ("0A", "02", 2, 2, 20.0),   # insert, same txn, later seqval
        ("0B", "01", 1, 3, 30.0),   # delete, next txn
    ])
    out = ms.mssql_cdc_raw_ops(ch, "dbo.orders", ["id"])
    rows = {r["op_type"]: r for r in out.collect()}
    assert set(rows) == {"U", "I", "D"}
    upd = rows["U"]
    assert upd["before"] == {"id": "1", "amount": "10.0"}
    assert upd["after"] == {"id": "1", "amount": "99.0"}
    ins = rows["I"]
    assert ins["before"] is None and ins["after"]["amount"] == "20.0"
    dele = rows["D"]
    assert dele["after"] is None and dele["before"]["amount"] == "30.0"
    # dense versions: txn 0A -> 1, 0B -> 2; intra-txn order in low bits
    assert upd["change_tracking_version"] == 1 * 1048576
    assert ins["change_tracking_version"] == 1 * 1048576 + 1
    assert dele["change_tracking_version"] == 2 * 1048576
    # base_version shifts the whole batch (cross-poll monotonicity)
    shifted = ms.mssql_cdc_raw_ops(ch, "dbo.orders", ["id"], base_version=7)
    v = {r["op_type"]: r["change_tracking_version"] for r in shifted.collect()}
    assert v["U"] == 8 * 1048576 and v["D"] == 9 * 1048576


def test_update_without_before_row_degrades_to_after_image(spark):
    # capture instance without 'all update old': only 4-rows arrive
    ch = _changes(spark, [("0A", "01", 4, 1, 55.0)])
    out = ms.mssql_cdc_raw_ops(ch, "dbo.orders", ["id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["op_type"] == "U"
    assert r["before"] == r["after"] == {"id": "1", "amount": "55.0"}


def test_orphan_before_row_is_dropped_not_upserted(spark):
    # a 3-row whose 4-row never arrived (torn export) must not become
    # an UPDATE carrying no post image
    ch = _changes(spark, [("0A", "01", 3, 1, 10.0), ("0A", "02", 2, 2, 20.0)])
    out = ms.mssql_cdc_raw_ops(ch, "dbo.orders", ["id"]).collect()
    assert [r["op_type"] for r in out] == ["I"]


def test_binary_lsn_canonicalizes_to_hex_order(spark):
    ch = spark.createDataFrame(
        [(bytes([0, 0, 0, 0, 0, 0, 0, 0, 0, n]), b"\x00\x01", 2, None, n, 1.0)
         for n in (2, 1)],
        ("`__$start_lsn` binary, `__$seqval` binary, `__$operation` int, "
         "`__$update_mask` binary, id long, amount double"),
    )
    out = ms.mssql_cdc_raw_ops(ch, "dbo.orders", ["id"])
    got = {r["after"]["id"]: r["change_tracking_version"] for r in out.collect()}
    assert got["1"] < got["2"]  # LSN order preserved through hex text


def test_pk_move_splits_via_normalizer(spark):
    ch = _changes(spark, [
        ("0A", "01", 3, 1, 5.0),
        ("0A", "01", 4, 2, 5.0),   # key moved 1 -> 2
    ])
    raw = ms.mssql_cdc_raw_ops(ch, "dbo.orders", ["id"])
    recs = normalize_raw_ops(raw).select("dml.op_type", "dml.rows_values").collect()
    ops = {r["op_type"]: r["rows_values"] for r in recs}
    assert set(ops) == {"DELETE", "INSERT"}
    assert ops["DELETE"]["id"] == "1" and ops["INSERT"]["id"] == "2"


def test_missing_pk_column_raises(spark):
    ch = _changes(spark, [("0A", "01", 2, 1, 1.0)])
    try:
        ms.mssql_cdc_raw_ops(ch, "dbo.orders", ["nope"])
    except ValueError as e:
        assert "nope" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_end_to_end_apply_via_encoder(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 8)], "id long, amount double"
    )
    snap = ms.encode_mssql_cdc(base, operation=2, lsn="0A",
                               seqval=F.lpad(F.col("id").cast("string"), 4, "0"))
    upd_rows = base.filter(F.col("id") % 2 == 0)
    upd3 = ms.encode_mssql_cdc(upd_rows, operation=3, lsn="0B",
                               seqval=F.lpad(F.col("id").cast("string"), 4, "0"))
    upd4 = ms.encode_mssql_cdc(
        upd_rows.withColumn("amount", F.col("amount") + 5), operation=4, lsn="0B",
        seqval=F.lpad(F.col("id").cast("string"), 4, "0"))
    dele = ms.encode_mssql_cdc(base.filter(F.col("id") == 7), operation=1,
                               lsn="0C", seqval="0001")
    feed = snap.unionByName(upd3).unionByName(upd4).unionByName(dele)
    raw = ms.mssql_cdc_raw_ops(feed, "dbo.orders", ["id"],
                               rows_schema=base.schema.json())
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, normalize_raw_ops(raw), cat)
    got = {r["id"]: r["amount"] for r in cat.read(spark, "dbo.orders").collect()}
    want = {i: 10.0 * i + (5 if i % 2 == 0 else 0) for i in range(1, 7)}
    assert got == want


def test_mssql_cdc_outbound_roundtrip(spark, tmp_path):
    """Render a change feed as outbound cdc-table rows, decode them
    through the inbound path, apply onto a replica seeded at the old
    version — replica converges to the source (the renderer symmetry
    proof, now for the row-shaped protocol)."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.normalize import normalize_raw_ops
    from change_data_capture_spark.sources import mssql_cdc

    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 12)], "id long, amount double"
    )
    src = TableCatalog(str(tmp_path / "src"))
    apply_changelog(spark, snapshot_changelog(base, "s.t", ["id"]), src)
    upd = dml_records(
        base.filter(F.col("id") % 2 == 0), "s.t", ["id"], op="UPDATE",
        version=2, value_overrides={"amount": F.col("amount") + 1},
    )
    dele = dml_records(
        base.filter(F.col("id") == 11), "s.t", ["id"], op="DELETE",
        version=2, keys_only=True,
    )
    apply_changelog(spark, upd.unionByName(dele), src)
    feed = src.table_changes(spark, "s.t", 1, 2)
    want = sorted(tuple(r) for r in src.read(spark, "s.t").collect())

    replica = TableCatalog(str(tmp_path / "rep"))
    apply_changelog(spark, snapshot_changelog(base, "s.t", ["id"]), replica)
    rows = mssql_cdc.table_changes_to_mssql_cdc(feed, pk_names=["id"])
    raw = mssql_cdc.mssql_cdc_raw_ops(
        rows, "s.t", ["id"], rows_schema=base.schema.json(), base_version=1,
    )
    apply_changelog(spark, normalize_raw_ops(raw), replica)
    got = sorted(tuple(r) for r in replica.read(spark, "s.t").collect())
    assert got == want


def test_base_version_must_be_transaction_domain(spark):
    """r7 review: the emitted version is (base + txn) * 2^20 + intra,
    so a caller passing the previous poll's max VERSION (already
    shifted by 2^20) instead of the transaction watermark
    (max_version >> 20) would overflow bigint within a few polls —
    fail fast on values that can only be version-domain."""
    import pytest

    from change_data_capture_spark.sources.mssql_cdc import mssql_cdc_raw_ops

    df = spark.createDataFrame(
        [("00A", "001", 2, 1)],
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, id int",
    )
    with pytest.raises(ValueError, match="transaction-count watermark"):
        mssql_cdc_raw_ops(df, "t", ["id"], base_version=1 << 42)
    with pytest.raises(ValueError, match="transaction-count watermark"):
        mssql_cdc_raw_ops(df, "t", ["id"], base_version=-1)
    # a sane transaction watermark passes validation
    out = mssql_cdc_raw_ops(df, "t", ["id"], base_version=7)
    assert out.select("change_tracking_version").first()[0] == 8 * 1048576


def test_mssql_cdc_dead_letters_partition_the_feed(spark):
    """r8 parity: the row-shaped decoder gets the same quarantine twin
    as the seven message-shaped decoders. Reasons cover out-of-domain
    ops, null pairing keys (which would FOLD distinct changes into one
    record — the decoder now drops them), and torn 3-row pairs."""
    from change_data_capture_spark.sources.mssql_cdc import (
        mssql_cdc_dead_letters,
        mssql_cdc_raw_ops,
    )

    rows = [
        # valid insert
        ("0A", "01", 2, 1, "a"),
        # torn update: 3-row with no 4-row
        ("0B", "01", 3, 2, "b"),
        # unsupported op code
        ("0C", "01", 9, 3, "c"),
        # null lsn: pairing key broken
        (None, "01", 2, 4, "d"),
        # null seqval: pairing key broken
        ("0D", None, 2, 5, "e"),
    ]
    changes = spark.createDataFrame(
        rows,
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "id long, v string",
    )
    ops = mssql_cdc_raw_ops(changes, "db.t", ["id"]).collect()
    assert [(r.op_type, r.after["id"]) for r in ops] == [("I", "1")]
    dlq = mssql_cdc_dead_letters(changes).collect()
    reasons = sorted((r.reason, r.op) for r in dlq)
    assert reasons == [
        ("missing_image", 3),
        ("missing_lsn", 2),
        ("missing_lsn", 2),
        ("unsupported_op", 9),
    ]
    # decode + DLQ partition the feed's change records exactly
    assert len(ops) + len(dlq) == 5


def test_mssql_cdc_null_custom_version_drops_and_quarantines(spark):
    """A caller version_expr that evaluates null: the record is
    dropped by raw_ops (NULL would vanish behind any watermark) and
    the DLQ names it missing_version under the SAME override."""
    from pyspark.sql import functions as F
    from change_data_capture_spark.sources.mssql_cdc import (
        mssql_cdc_dead_letters,
        mssql_cdc_raw_ops,
    )

    changes = spark.createDataFrame(
        [("0A", "01", 2, 1, "a"), ("FF", "01", 2, 2, "b")],
        "`__$start_lsn` string, `__$seqval` string, `__$operation` int, "
        "id long, v string",
    )
    # version only decodable for lsn 0A
    vexpr = F.when(F.col("__lsn") == "0A", F.lit(7)).cast("bigint")
    ops = mssql_cdc_raw_ops(changes, "db.t", ["id"], version_expr=vexpr).collect()
    assert [(r.change_tracking_version, r.after["id"]) for r in ops] == [(7, "1")]
    dlq = mssql_cdc_dead_letters(changes, version_expr=vexpr).collect()
    assert [(r.lsn, r.reason) for r in dlq] == [("FF", "missing_version")]
