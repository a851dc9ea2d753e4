"""Regression tests for the round-9 advisory findings (ADVICE.md r8):

1. ``import_group_snapshot`` treats a row-count-matching table whose
   watermark lags the manifest as a RESUMABLE partial restore (crash
   between ``apply_changes`` and the watermark stamp), not a refusal.
2. ``drop_table`` no longer orphans the meta-lock inode: lock files
   live outside the table dir and are never unlinked, so waiters
   blocked across a drop/recreate cycle still mutually exclude.
3. ``forget_keys`` reports derived-index versions it CANNOT verify
   (no base-PK columns to semi-join on) as ``versions_unverified``
   instead of a vacuous pass.
4. ``announce_schema`` runs the physical re-type rewrite WITHOUT
   holding the per-table meta lock (concurrent writers proceed) and
   replans on a concurrent publish instead of losing it.
"""

import os
import threading

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import (
    TableCatalog,
    apply_changelog,
    forget_keys,
    import_group_snapshot,
)
from change_data_capture_spark.changelog import dml_records, snapshot_changelog
from change_data_capture_spark.schema import schema_from_json

try:
    import fcntl
except ImportError:  # pragma: no cover - non-POSIX
    fcntl = None


# -- 1. resumable partial restore ------------------------------------

def test_import_resumes_after_crash_before_watermark_stamp(spark, tmp_path):
    """A crash in the window between apply_changes (rows landed,
    applied_version = the snapshot-insert constant) and
    _stamp_tracking_watermark used to make the re-run refuse with
    'wrong catalog' — fail-safe but misdiagnosed, requiring manual
    surgery. The re-run must instead complete the interrupted stamp."""
    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame([(i, f"a{i}") for i in range(6)], "id long, v string")
    apply_changelog(spark, snapshot_changelog(a, "g.a", ["id"], insert_version=3), src)
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a"], watermark=5, dest_dir=exp)

    dst = TableCatalog(str(tmp_path / "dst"))
    import_group_snapshot(spark, exp, dst)
    # simulate the crash state: rows restored, watermark never stamped
    # (apply_changes left the snapshot-insert constant 1)
    m = dst.meta("g.a")
    m["applied_version"] = 1
    dst.put_meta("g.a", m)

    rep = import_group_snapshot(spark, exp, dst)
    assert rep["tables"]["g.a"]["resumed"] is True
    assert int(dst.meta("g.a")["applied_version"]) == 3  # stamp completed
    assert dst.read(spark, "g.a").count() == 6
    # a DIVERGED occupied table (content ahead of the manifest) still
    # refuses — resumability must not weaken the wrong-catalog guard
    apply_changelog(
        spark,
        dml_records(a.limit(1), "g.a", ["id"], op="DELETE", version=9,
                    keys_only=True),
        dst,
    )
    with pytest.raises(ValueError, match="different content"):
        import_group_snapshot(spark, exp, dst)


# -- 2. lock inode survives drop_table --------------------------------

@pytest.mark.skipif(fcntl is None, reason="POSIX flock only")
def test_drop_table_does_not_orphan_blocked_lock_waiters(tmp_path):
    """Old layout kept the flock file INSIDE the table dir, so
    drop_table's rmtree unlinked it under blocked waiters: a waiter
    then 'acquired' the orphaned inode while a later locker created a
    fresh file at the same path — two simultaneous holders after a
    drop/recreate. With locks in root/.locks (never unlinked), a
    waiter blocked across the drop and a locker arriving after it must
    still mutually exclude."""
    cat = TableCatalog(str(tmp_path / "c"))
    t = "d.t"
    cat.put_meta(t, {"table": t, "schema": None, "pks": None,
                     "current": None, "applied_version": 0})
    lock_path = os.path.join(cat._locks_dir, f"{t}.lock")

    order: list[str] = []
    a_in, a_release = threading.Event(), threading.Event()
    b_in, b_release = threading.Event(), threading.Event()

    def holder_and_dropper():
        with cat._meta_lock(t):
            a_in.set()
            assert a_release.wait(10)
            cat.drop_table(t)  # reentrant; rmtree must not kill the lock

    def waiter_b():
        a_in.wait(10)
        with cat._meta_lock(t):
            order.append("b-in")
            b_in.set()
            assert b_release.wait(10)
            order.append("b-out")

    def waiter_c():
        b_in.wait(10)
        with cat._meta_lock(t):
            order.append("c-in")

    ino = None
    ta = threading.Thread(target=holder_and_dropper)
    tb = threading.Thread(target=waiter_b)
    ta.start()
    a_in.wait(10)
    ino = os.stat(lock_path).st_ino
    tb.start()
    import time

    time.sleep(0.25)  # b is parked on the flock before the drop
    a_release.set()
    ta.join(10)
    # the lock file survived the drop with the SAME inode
    assert os.path.exists(lock_path) and os.stat(lock_path).st_ino == ino
    b_in.wait(10)
    tc = threading.Thread(target=waiter_c)
    tc.start()
    time.sleep(0.25)
    assert order == ["b-in"], "c entered while b still held the lock"
    b_release.set()
    tb.join(10)
    tc.join(10)
    assert order == ["b-in", "b-out", "c-in"]


# -- 3. honest unverifiable-derived reporting --------------------------

def test_forget_keys_reports_unverifiable_derived_versions(
    spark, tmp_path, monkeypatch
):
    """A derived index whose schema carries NO base-PK columns cannot
    be semi-join-verified; counting it as verified was a vacuous pass
    recorded as a real erasure check. It must surface as
    versions_unverified."""
    import change_data_capture_spark.apply as apply_mod

    T = "shop.users"
    base = spark.createDataFrame(
        [(i, f"u{i}") for i in range(20)], "id long, name string"
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, T, ["id"]), cat)
    # a child index with no 'id' column anywhere in its schema
    child = spark.createDataFrame([("a", 1), ("b", 2)], "tok string, cnt long")
    apply_changelog(spark, snapshot_changelog(child, "ml.idx", ["tok"]), cat)
    m = cat.meta("ml.idx")
    m["derived"] = {"base": T, "kind": "minhash_sigs", "params": {}}
    cat.put_meta("ml.idx", m)
    # the refresh leg is the kind's own machinery — not under test here
    monkeypatch.setattr(
        apply_mod, "_refresh_derived_index", lambda *a, **k: {}
    )

    keys = spark.createDataFrame([(3,), (7,)], "id long")
    rep = forget_keys(spark, cat, T, keys)
    d = rep["derived"]["ml.idx"]
    assert d.get("versions_unverified"), "unverifiable versions must be reported"
    assert set(d["versions_verified"]).isdisjoint(d["versions_unverified"])
    # the base itself verified normally
    assert rep["versions_verified"]


# -- 4. announce_schema rewrite runs unlocked, replans on conflict ----

class _GatedReadCatalog(TableCatalog):
    """Catalog whose next read() (once armed) parks until released —
    stands in for a long physical re-type rewrite."""

    def __init__(self, root):
        super().__init__(root)
        self.armed = False
        self.read_entered = threading.Event()
        self.release = threading.Event()

    def read(self, spark, table_id, buckets=None, version=None):
        if self.armed:
            self.armed = False
            self.read_entered.set()
            assert self.release.wait(60)
        return super().read(spark, table_id, buckets=buckets, version=version)


@pytest.mark.skipif(fcntl is None, reason="POSIX flock only")
def test_retype_rewrite_does_not_hold_meta_lock(spark, tmp_path):
    """The physical re-type is a full-table Spark job; holding the
    no-timeout flock across it stalled every concurrent writer and
    maintenance pass for the rewrite's duration (r9 advisory). While
    the rewrite's table read is in flight, the per-table lock must be
    acquirable by others."""
    cat = _GatedReadCatalog(str(tmp_path / "c"))
    t = "shop.t"
    df = spark.createDataFrame([(1, "10"), (2, "20")], "id long, amount string")
    apply_changelog(spark, snapshot_changelog(df, t, ["id"]), cat)

    cat.armed = True
    err: list[BaseException] = []

    def announce():
        try:
            cat.announce_schema(
                t,
                spark.createDataFrame([], "id long, amount bigint").schema.json(),
                spark=spark,
            )
        except BaseException as e:  # noqa: BLE001
            err.append(e)

    th = threading.Thread(target=announce)
    th.start()
    assert cat.read_entered.wait(60)
    # mid-rewrite: the lock must be FREE (non-blocking acquire succeeds)
    fd = os.open(os.path.join(cat._locks_dir, f"{t}.lock"),
                 os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)  # raises if held
        fcntl.flock(fd, fcntl.LOCK_UN)
    finally:
        os.close(fd)
    cat.release.set()
    th.join(120)
    assert not err, err
    meta = cat.meta(t)
    fields = {f.name: f.dataType.typeName() for f in
              schema_from_json(meta["schema"]).fields}
    assert fields["amount"] == "long"
    got = sorted(map(tuple, cat.read(spark, t).collect()))
    assert got == [(1, 10), (2, 20)]


def test_retype_rewrite_replans_on_concurrent_publish(spark, tmp_path):
    """A batch published DURING the unlocked rewrite must not be lost:
    the rewrite's commit CAS fires and the announcement replans from
    fresh meta — final state carries BOTH the new type and the
    concurrent batch's rows."""
    cat = _GatedReadCatalog(str(tmp_path / "c"))
    t = "shop.t"
    df = spark.createDataFrame([(1, "10"), (2, "20")], "id long, amount string")
    apply_changelog(spark, snapshot_changelog(df, t, ["id"]), cat)

    cat.armed = True
    err: list[BaseException] = []
    reports: list[dict] = []

    def announce():
        try:
            reports.append(
                cat.announce_schema(
                    t,
                    spark.createDataFrame(
                        [], "id long, amount bigint"
                    ).schema.json(),
                    spark=spark,
                )
            )
        except BaseException as e:  # noqa: BLE001
            err.append(e)

    th = threading.Thread(target=announce)
    th.start()
    assert cat.read_entered.wait(60)
    # concurrent publish through a SECOND handle while the rewrite is
    # parked (possible at all only because the rewrite is unlocked)
    other = TableCatalog(str(tmp_path / "c"))
    upd = dml_records(
        spark.createDataFrame([(2, "99")], "id long, amount string"),
        t, ["id"], op="UPDATE", version=7,
    )
    apply_changelog(spark, upd, other)
    cat.release.set()
    th.join(180)
    assert not err, err
    meta = cat.meta(t)
    fields = {f.name: f.dataType.typeName() for f in
              schema_from_json(meta["schema"]).fields}
    assert fields["amount"] == "long"
    got = sorted(map(tuple, cat.read(spark, t).collect()))
    assert got == [(1, 10), (2, 99)], "concurrent batch lost by the rewrite"
    assert int(meta["applied_version"]) == 7
    # the contention is VISIBLE in the announce report (r10 directive:
    # a hot-writer deployment monitors replans to schedule re-types)
    assert reports and reports[0]["rewrite"] is True
    assert reports[0]["replans"] >= 1
    assert reports[0]["locked_fallback"] is False


# -- 5. folded DLQ capture matches the standalone quarantine ----------

def test_on_dead_letters_matches_typed_dead_letters(spark, tmp_path):
    """The folded capture (apply_changes' own meta scan) and the
    standalone typed_dead_letters must quarantine the SAME rows for
    the same batch — including under same-batch narrowing DDL, where
    both must use the POST-announce schema."""
    from change_data_capture_spark.apply import typed_dead_letters
    from change_data_capture_spark.changelog import ddl_record
    from change_data_capture_spark.envelope import wrap_dml

    def dml_env(table, pks, rows, version):
        data = [
            ("INSERT", table, list(pks), None, rv, version + i, 0)
            for i, rv in enumerate(rows)
        ]
        d = spark.createDataFrame(
            data,
            "op_type string, table string, primary_keys array<string>, "
            "rows_schema string, rows_values map<string,string>, "
            "change_tracking_version long, cdc_current_timestamp long",
        )
        return wrap_dml(d)

    base = spark.createDataFrame([(1, "10")], "id long, note string")
    cat_a = TableCatalog(str(tmp_path / "a"))
    cat_b = TableCatalog(str(tmp_path / "b"))
    for cat in (cat_a, cat_b):
        apply_changelog(spark, snapshot_changelog(base, "shop.t", ["id"]), cat)
    # narrowing ALTER (note -> bigint) + one row invalid under the NEW
    # type + one valid row
    new_schema = spark.createDataFrame([], "id long, note bigint").schema
    batch = ddl_record(spark, "shop.t", new_schema.json()).unionByName(
        dml_env("shop.t", ["id"],
                [{"id": "3", "note": "abc"}, {"id": "4", "note": "40"}], 10)
    )
    standalone = sorted(
        (r.change_tracking_version, tuple(r.bad_columns))
        for r in typed_dead_letters(batch, cat_a).collect()
    )
    captured: list = []
    apply_changelog(
        spark, batch, cat_b, undecodable="skip",
        on_dead_letters=lambda df: captured.extend(
            (r.change_tracking_version, tuple(r.bad_columns))
            for r in df.collect()
        ),
    )
    assert sorted(captured) == standalone == [(10, ("note",))]
    # and the apply itself landed the valid row only
    got = {r.id: r.note for r in cat_b.read(spark, "shop.t").collect()}
    assert got == {1: 10, 4: 40}


def test_retype_rewrite_does_not_clobber_concurrent_metadata_ddl(spark, tmp_path):
    """r9 self-review of the unlocked rewrite itself: a METADATA-ONLY
    DDL landing mid-rewrite doesn't move the data pointer, so the
    pointer CAS alone let the re-type's schema swap commit a schema
    computed from PRE-DDL state — the concurrent column vanished
    WITHOUT a drop tombstone, i.e. a non-serializable lost update the
    pre-r9 full lock made impossible (a later re-add would silently
    resurrect stale bytes). The commit now schema-CASes
    (expected_schema) and the announcement REPLANS from the evolved
    schema, so the outcome equals the serialization 'add then
    re-type-drop': the re-type's column set wins (new-schema-wins
    evolution contract) but extra_col is recorded as a PROPER drop
    in dropped_columns."""
    cat = _GatedReadCatalog(str(tmp_path / "c"))
    t = "shop.t"
    df = spark.createDataFrame([(1, "10"), (2, "20")], "id long, amount string")
    apply_changelog(spark, snapshot_changelog(df, t, ["id"]), cat)

    cat.armed = True
    err: list[BaseException] = []

    def announce_retype():
        try:
            cat.announce_schema(
                t,
                spark.createDataFrame([], "id long, amount bigint").schema.json(),
                spark=spark,
            )
        except BaseException as e:  # noqa: BLE001
            err.append(e)

    th = threading.Thread(target=announce_retype)
    th.start()
    assert cat.read_entered.wait(60)
    # concurrent METADATA-ONLY evolution through a second handle while
    # the rewrite is parked: adds extra_col, moves no data pointer
    other = TableCatalog(str(tmp_path / "c"))
    other.announce_schema(
        t,
        spark.createDataFrame([], "id long, amount string, extra_col string")
        .schema.json(),
        spark=spark,
    )
    cat.release.set()
    th.join(180)
    assert not err, err
    meta = cat.meta(t)
    fields = {f.name: f.dataType.typeName() for f in
              schema_from_json(meta["schema"]).fields}
    assert fields == {"id": "long", "amount": "long"}
    # the serializable outcome: extra_col was DROPPED by the re-type's
    # column set, and the drop is tombstoned (the clobber path lost it
    # with NO tombstone — a later re-add would resurrect stale bytes)
    assert "extra_col" in (meta.get("dropped_columns") or {}), (
        f"concurrent DDL silently clobbered (no tombstone): {meta}"
    )
    got = sorted(map(tuple, cat.read(spark, t).collect()))
    assert got == [(1, 10), (2, 20)]
