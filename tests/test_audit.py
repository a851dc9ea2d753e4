"""Consistency audit + repair tests: identical replicas checksum
equal, a corrupted bucket is localized exactly, repair converges only
the touched buckets (file reuse intact), and bucket-count mismatch is
refused."""

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.audit import (
    checksum_diff,
    repair_buckets,
    table_checksum,
)
from change_data_capture_spark.changelog import dml_records, snapshot_changelog

T = "shop.orders"


def _pair(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, 10.0 * i, f"n{i}") for i in range(200)],
        "id long, amount double, name string",
    )
    src = TableCatalog(str(tmp_path / "src"))
    dst = TableCatalog(str(tmp_path / "dst"))
    for cat in (src, dst):
        apply_changelog(spark, snapshot_changelog(base, T, ["id"]), cat)
    return base, src, dst


def test_identical_replicas_checksum_clean(spark, tmp_path):
    _, src, dst = _pair(spark, tmp_path)
    assert checksum_diff(
        table_checksum(spark, src, T), table_checksum(spark, dst, T)
    ).count() == 0


def test_corruption_localized_and_repaired(spark, tmp_path):
    base, src, dst = _pair(spark, tmp_path)
    # corrupt the replica out-of-band: one row's value drifts
    rogue = dml_records(
        base.filter(F.col("id") == 42), T, ["id"], op="UPDATE",
        version=99, value_overrides={"amount": F.lit(-1.0)},
    )
    apply_changelog(spark, rogue, dst)

    diff = checksum_diff(
        table_checksum(spark, src, T), table_checksum(spark, dst, T)
    ).collect()
    assert len(diff) == 1, diff
    bad = diff[0]
    assert bad["src_rows"] == bad["dst_rows"]  # same count, drifted content
    assert bad["src_checksum"] != bad["dst_checksum"]

    before_version = dst.meta(T)["current"]
    repair_buckets(spark, src, dst, T, [bad["bucket"]])
    assert dst.meta(T)["current"] != before_version  # versioned like any write
    assert checksum_diff(
        table_checksum(spark, src, T), table_checksum(spark, dst, T)
    ).count() == 0
    got = {r["id"]: r["amount"] for r in dst.read(spark, T).collect()}
    assert got[42] == 420.0


def test_missing_rows_detected(spark, tmp_path):
    base, src, dst = _pair(spark, tmp_path)
    dele = dml_records(
        base.filter(F.col("id").isin(7, 8)), T, ["id"], op="DELETE",
        version=99, keys_only=True,
    )
    apply_changelog(spark, dele, dst)
    diff = checksum_diff(
        table_checksum(spark, src, T), table_checksum(spark, dst, T)
    ).collect()
    assert 1 <= len(diff) <= 2
    assert all(r["src_rows"] > r["dst_rows"] for r in diff)
    repair_buckets(spark, src, dst, T, [r["bucket"] for r in diff])
    assert dst.read(spark, T).count() == src.read(spark, T).count()


def test_bucket_count_mismatch_refused(spark, tmp_path):
    _, src, dst = _pair(spark, tmp_path)
    dst.compact(spark, T, n_buckets=4)
    with pytest.raises(ValueError, match="bucket counts differ"):
        repair_buckets(spark, src, dst, T, [0])


def test_replication_lag_report(spark, tmp_path):
    from change_data_capture_spark.audit import replication_lag_report

    base, src, dst = _pair(spark, tmp_path)
    upd = dml_records(
        base.filter(F.col("id") % 5 == 0), T, ["id"], op="UPDATE",
        version=7, value_overrides={"amount": F.col("amount") + 1},
    )
    apply_changelog(spark, upd, src)  # source moves ahead
    (r,) = replication_lag_report(src, dst)
    assert r["status"] == "behind" and r["versions_behind"] == 6
    apply_changelog(spark, upd, dst)  # replica catches up
    (r2,) = replication_lag_report(src, dst)
    assert r2["status"] == "ok" and r2["versions_behind"] == 0
    # a table missing on the replica is flagged
    other = TableCatalog(str(tmp_path / "empty"))
    (r3,) = replication_lag_report(src, other)
    assert r3["status"] == "missing"


def test_checksum_survives_nan_and_inf(spark, tmp_path):
    dirty = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, 1e33), (4, 2.0)],
        "id long, amount double",
    )
    cat = TableCatalog(str(tmp_path / "dirty"))
    apply_changelog(spark, snapshot_changelog(dirty, T, ["id"]), cat)
    out = table_checksum(spark, cat, T).collect()
    assert sum(r["n_rows"] for r in out) == 4  # no ANSI trap, all hashed


def test_feed_gap_report_pins_gaps_and_dups(spark):
    from change_data_capture_spark.audit import feed_gap_report

    feed = spark.createDataFrame(
        # t1: versions 1,2,5 (gap [3,4]), version 2 delivered twice (dup)
        # t2: dense 1..3 -> clean
        [("t1", 1), ("t1", 2), ("t1", 2), ("t1", 5), ("t2", 1), ("t2", 2), ("t2", 3)],
        "table string, version long",
    )
    rows = {(r.table, r.kind, r.v_from): r for r in feed_gap_report(feed).collect()}
    assert rows[("t1", "gap", 3)].v_to == 4 and rows[("t1", "gap", 3)].n == 2
    assert rows[("t1", "dup", 2)].v_to == 2 and rows[("t1", "dup", 2)].n == 2
    assert len(rows) == 2  # t2 clean: no rows at all


def test_feed_gap_report_clean_feed_is_empty(spark):
    from change_data_capture_spark.audit import feed_gap_report

    feed = spark.createDataFrame(
        [("t", v) for v in range(1, 6)], "table string, version long"
    )
    assert feed_gap_report(feed).count() == 0


def test_feed_gap_report_row_grain_with_key_cols(spark):
    """Row-grain feeds (many rows per transaction version) need
    key_cols: a 3-row transaction at one version is NOT a dup; the
    same (version, key) delivered twice IS."""
    from change_data_capture_spark.audit import feed_gap_report

    feed = spark.createDataFrame(
        # v1: 3-row transaction (clean); v2: replayed twice per key (dup)
        [("t", 1, 10), ("t", 1, 11), ("t", 1, 12), ("t", 2, 10), ("t", 2, 10)],
        "table string, version long, k long",
    )
    # without keys: both versions misread as dups (documented grain contract)
    naive = feed_gap_report(feed).collect()
    assert {(r.kind, r.v_from) for r in naive} == {("dup", 1), ("dup", 2)}
    rows = feed_gap_report(feed, key_cols=["k"]).collect()
    assert [(r.kind, r.v_from, r.n) for r in rows] == [("dup", 2, 2)]


def test_vector_table_lifecycle_checksum_cdf_compact_repair(spark, sf_dir, tmp_path):
    """Complex-typed (array<float>) tables ride the whole table-
    management surface: CDF diff shows the vector update, compact is
    reader-invisible, the replica checksum audit detects a drifted
    vector and bucket repair converges it — array columns hash through
    their canonical Spark string form on both sides."""
    from change_data_capture_spark.audit import (
        checksum_diff, repair_buckets, table_checksum,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from tests.conftest import load

    emb = load(spark, sf_dir, "embeddings")
    src = TableCatalog(str(tmp_path / "src"))
    apply_changelog(spark, snapshot_changelog(emb, "ml.emb", ["vec_id"]), src)
    upd = dml_records(
        emb.filter(F.col("vec_id") == 3), "ml.emb", ["vec_id"],
        op="UPDATE", version=2,
        value_overrides={"embedding": F.expr("array(9.0f, 9.0f)")},
    )
    apply_changelog(spark, upd, src)

    cdf = src.table_changes(spark, "ml.emb", 1, 2)
    rows = cdf.collect()  # this CDF carries postimages only (see the
    # GoldenGate renderer docstring: no preimage slot on this feed)
    assert [r["_change_type"] for r in rows] == ["update_postimage"]
    assert list(rows[0]["embedding"]) == [9.0, 9.0]

    src.compact(spark, "ml.emb", n_buckets=4)
    assert src.read(spark, "ml.emb").count() == emb.count()

    # replica drifts out-of-band on one vector; audit finds the bucket
    dst = TableCatalog(str(tmp_path / "dst"))
    apply_changelog(spark, snapshot_changelog(emb, "ml.emb", ["vec_id"]), dst)
    apply_changelog(spark, upd, dst)
    dst.compact(spark, "ml.emb", n_buckets=4)
    rogue = dml_records(
        emb.filter(F.col("vec_id") == 11), "ml.emb", ["vec_id"],
        op="UPDATE", version=3,
        value_overrides={"embedding": F.expr("array(-1.0f)")},
    )
    apply_changelog(spark, rogue, dst)
    diff = checksum_diff(
        table_checksum(spark, src, "ml.emb"), table_checksum(spark, dst, "ml.emb")
    ).collect()
    assert len(diff) >= 1
    repair_buckets(spark, src, dst, "ml.emb", [r["bucket"] for r in diff])
    assert checksum_diff(
        table_checksum(spark, src, "ml.emb"), table_checksum(spark, dst, "ml.emb")
    ).collect() == []
