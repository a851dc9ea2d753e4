"""Round-10 adversarial seam sweep (VERDICT r9 directive #4) — the
unreviewed interleavings of the r9-new surfaces:

- TWO concurrent ``import_group_snapshot`` runs restoring overlapping
  table sets into one catalog (same export: both must converge; a
  DIVERGENT overlap: the later import must refuse, never merge);
- ``forget_column`` dropping a derived child built from the dying
  column while a scheduled ``auto_maintain`` pass planned against the
  pre-drop report is mid-flight (the hold vanishes WITH the meta — the
  pass must skip-report the ghost, not crash into refreshing it);
- a crash between ``_set_maintenance_hold`` and the first delete leg
  of an erasure (a hold with ZERO work done must be resumable: the
  re-run completes and clears it; until then every maintenance report
  says why nothing is happening).
"""

import threading

import pytest
from pyspark.sql import functions as F  # noqa: F401

import change_data_capture_spark.apply as apply_mod
from change_data_capture_spark.apply import (
    TableCatalog,
    apply_changelog,
    auto_maintain,
    forget_keys,
    import_group_snapshot,
    register_derived_index,
)
from change_data_capture_spark.changelog import dml_records, snapshot_changelog


# -- concurrent imports -------------------------------------------------

def test_concurrent_imports_of_same_export_converge(spark, tmp_path):
    """Two operators restoring the SAME group snapshot into one
    catalog (a realistic DR fumble): the per-table locked restore legs
    serialize — one import physically restores, the other resumes the
    already-correct state; both succeed and the final state matches
    the manifest exactly (no double-apply, no refusal)."""
    src = TableCatalog(str(tmp_path / "src"))
    for t, n in (("g.a", 6), ("g.b", 4)):
        df = spark.createDataFrame(
            [(i, f"{t}_{i}") for i in range(n)], "id long, v string"
        )
        apply_changelog(
            spark, snapshot_changelog(df, t, ["id"], insert_version=5), src
        )
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a", "g.b"], watermark=5, dest_dir=exp)

    root = str(tmp_path / "dst")
    errors: list[BaseException] = []
    reports: list[dict] = []
    barrier = threading.Barrier(2)

    def run_import():
        try:
            barrier.wait(30)
            # each worker uses its OWN handle (separate lock fds)
            reports.append(import_group_snapshot(spark, exp, TableCatalog(root)))
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    ths = [threading.Thread(target=run_import) for _ in range(2)]
    for th in ths:
        th.start()
    for th in ths:
        th.join(300)
    assert not errors, errors
    assert len(reports) == 2
    dst = TableCatalog(root)
    for t, n in (("g.a", 6), ("g.b", 4)):
        assert dst.read(spark, t).count() == n
        assert int(dst.meta(t)["applied_version"]) == 5
    # exactly the manifest state in both reports
    for rep in reports:
        assert rep["tables"]["g.a"]["n_rows"] == 6
        assert rep["tables"]["g.b"]["n_rows"] == 4


def test_concurrent_divergent_overlap_refuses_never_merges(spark, tmp_path):
    """Overlapping imports from DIFFERENT cuts (export at watermark 3,
    then more changes, export at watermark 9): whichever lands second
    on the shared table must refuse — the under-lock re-verification
    catches the diverged content in either order, and the refusing
    import leaves the first import's state untouched."""
    src = TableCatalog(str(tmp_path / "src"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(5)], "id long, v string")
    apply_changelog(spark, snapshot_changelog(df, "g.t", ["id"], insert_version=3), src)
    exp_old = str(tmp_path / "exp_old")
    src.export_group_snapshot(spark, ["g.t"], watermark=3, dest_dir=exp_old)
    # advance the source: 2 new rows at version 9, re-export
    more = dml_records(
        spark.createDataFrame([(7, "new7"), (8, "new8")], "id long, v string"),
        "g.t", ["id"], op="INSERT", version=9,
    )
    apply_changelog(spark, more, src)
    exp_new = str(tmp_path / "exp_new")
    src.export_group_snapshot(spark, ["g.t"], watermark=9, dest_dir=exp_new)

    root = str(tmp_path / "dst")
    import_group_snapshot(spark, exp_new, TableCatalog(root))  # 7 rows @ wm 9
    with pytest.raises(ValueError):
        import_group_snapshot(spark, exp_old, TableCatalog(root))
    dst = TableCatalog(root)
    assert dst.read(spark, "g.t").count() == 7  # first import intact
    assert int(dst.meta("g.t")["applied_version"]) == 9
    # and the opposite order: old first, new second — the new cut's
    # watermark is AHEAD, the count mismatches -> refusal again
    root2 = str(tmp_path / "dst2")
    import_group_snapshot(spark, exp_old, TableCatalog(root2))
    with pytest.raises(ValueError):
        import_group_snapshot(spark, exp_new, TableCatalog(root2))
    assert TableCatalog(root2).read(spark, "g.t").count() == 5


# -- forget_column child drop vs scheduled maintenance -------------------

def _seed_with_value_index(spark, tmp_path):
    from change_data_capture_spark.derive import maintain_value_index

    base = spark.createDataFrame(
        [(i, f"u{i}@x.com", i % 3) for i in range(12)],
        "id long, email string, grp long",
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "db.users", ["id"]), cat)
    maintain_value_index(spark, cat, "db.users", ["email"], "db.users_by_email")
    register_derived_index(
        cat, "db.users_by_email", base_table="db.users", kind="value_index",
        params={"value_cols": ["email"]},
    )
    return base, cat


def test_auto_maintain_skip_reports_child_dropped_mid_pass(
    spark, tmp_path, monkeypatch
):
    """forget_column on a column that is a value index's IDENTITY
    drops the child outright — removing its meta AND the hold the
    erasure stamped on it. An auto_maintain pass that planned against
    the pre-drop report must skip-report the vanished table
    (``skipped_dropped``), never crash into refreshing or compacting a
    ghost (r10 seam sweep finding, fixed same round)."""
    base, cat = _seed_with_value_index(spark, tmp_path)
    # make the index stale so the pass WANTS to refresh it
    upd = dml_records(
        spark.createDataFrame([(1, "changed@x.com", 1)],
                              "id long, email string, grp long"),
        "db.users", ["id"], op="UPDATE", version=7,
    )
    apply_changelog(spark, upd, cat)

    real_report = apply_mod.maintenance_report
    state = {"dropped": False}

    def report_then_drop(catalog_, **kw):
        rep = real_report(catalog_, **kw)
        if not state["dropped"]:
            state["dropped"] = True
            # the erasure's step-0 child drop lands right here, after
            # the pass read its plan and before it acts
            cat.drop_table("db.users_by_email")
        return rep

    monkeypatch.setattr(apply_mod, "maintenance_report", report_then_drop)
    acts = auto_maintain(spark, cat, keep_last=1)  # must not raise
    dropped = [a for a in acts if a.get("skipped_dropped")]
    assert any(a["table"] == "db.users_by_email" for a in dropped), acts
    # no refresh/compact/vacuum was attempted on the ghost
    for a in acts:
        if a["table"] == "db.users_by_email" and not a.get("skipped_dropped"):
            raise AssertionError(f"acted on dropped table: {a}")


# -- crash between hold-set and the first delete leg ---------------------

def test_zero_work_hold_is_resumable_and_loud(spark, tmp_path, monkeypatch):
    """A crash immediately after ``_set_maintenance_hold`` (before the
    erasure did ANY work) must behave like every other erasure crash:
    the hold stays visible in every maintenance report, and a clean
    re-run completes the erasure and clears it — a zero-work hold is
    not a special case that wedges or self-clears."""
    cat = TableCatalog(str(tmp_path / "c"))
    df = spark.createDataFrame([(i, f"u{i}") for i in range(8)], "id long, v string")
    apply_changelog(spark, snapshot_changelog(df, "t.u", ["id"]), cat)
    # history so maintenance genuinely wants to vacuum
    apply_changelog(
        spark,
        dml_records(
            spark.createDataFrame([(0, "x")], "id long, v string"),
            "t.u", ["id"], op="UPDATE", version=2,
        ),
        cat,
    )
    keys = spark.createDataFrame([(3,)], "id long")

    def crash_impl(*a, **kw):
        raise OSError("injected: process killed right after hold stamp")

    monkeypatch.setattr(apply_mod, "_forget_keys_impl", crash_impl)
    with pytest.raises(OSError, match="injected"):
        forget_keys(spark, cat, "t.u", keys)
    monkeypatch.undo()
    # zero work done, hold present, data fully intact
    assert (cat.meta("t.u") or {}).get("maintenance_hold", {}).get("op") == "forget_keys"
    assert cat.read(spark, "t.u").count() == 8
    # every maintenance pass says WHY it is doing nothing
    acts = auto_maintain(spark, cat, keep_last=1)
    assert any(a.get("table") == "t.u" and "skipped_hold" in a for a in acts)
    # the clean re-run resumes from zero work and clears the hold
    rep = forget_keys(spark, cat, "t.u", keys)
    assert rep["rows_deleted"] == 1
    assert "maintenance_hold" not in (cat.meta("t.u") or {})
    assert cat.read(spark, "t.u").count() == 7
    # maintenance is unblocked again
    acts = auto_maintain(spark, cat, keep_last=1)
    assert not any("skipped_hold" in a for a in acts if a.get("table") == "t.u")


# -- erasure-vs-erasure: holds collide loudly ----------------------------

def test_concurrent_live_erasures_collide_loudly(spark, tmp_path):
    """CONCURRENCY.md's matrix says erasure-vs-erasure holds collide
    loudly; pre-r10 the second stamp silently OVERWROTE the first's
    hold (and the first's success-clear then unprotected the second
    mid-verification). A hold owned by a LIVE foreign pid must refuse;
    a DEAD holder's hold (the crash signature) stays re-claimable."""
    import subprocess

    from change_data_capture_spark.apply import ConcurrentWriteError

    cat = TableCatalog(str(tmp_path / "c"))
    df = spark.createDataFrame([(i, f"u{i}") for i in range(6)], "id long, v string")
    apply_changelog(spark, snapshot_changelog(df, "t.u", ["id"]), cat)
    keys = spark.createDataFrame([(1,)], "id long")

    live = subprocess.Popen(["sleep", "60"])
    try:
        cat.update_meta(
            "t.u",
            lambda m: {**m, "maintenance_hold": {"op": "forget_keys",
                                                 "pid": live.pid}},
        )
        with pytest.raises(ConcurrentWriteError, match="live 'forget_keys'"):
            forget_keys(spark, cat, "t.u", keys)
        # the live erasure's hold is untouched by the refusal
        assert (cat.meta("t.u") or {})["maintenance_hold"]["pid"] == live.pid
    finally:
        live.kill()
        live.wait()
    # holder now DEAD: the hold is the crash signature — re-claimable,
    # the erasure runs and clears it
    rep = forget_keys(spark, cat, "t.u", keys)
    assert rep["rows_deleted"] == 1
    assert "maintenance_hold" not in (cat.meta("t.u") or {})


def test_hold_collision_rollback_restores_prior_dead_hold(spark, tmp_path):
    """A multi-table hold stamp that collides midway must roll back the
    holds it stamped — RESTORING a pre-existing dead-crash hold it had
    reclaimed, never clearing it (the interrupted erasure's crash
    signature survives this call's failure)."""
    import subprocess

    import change_data_capture_spark.apply as am
    from change_data_capture_spark.apply import ConcurrentWriteError

    cat = TableCatalog(str(tmp_path / "c"))
    for t in ("t.a", "t.b"):
        df = spark.createDataFrame([(1, "x")], "id long, v string")
        apply_changelog(spark, snapshot_changelog(df, t, ["id"]), cat)
    # t.a: DEAD holder's hold (a crashed prior erasure)
    dead = subprocess.Popen(["true"]); dead.wait()
    dead_hold = {"op": "forget_column", "pid": dead.pid}
    cat.update_meta("t.a", lambda m: {**m, "maintenance_hold": dead_hold})
    # t.b: LIVE foreign holder
    live = subprocess.Popen(["sleep", "60"])
    try:
        cat.update_meta(
            "t.b",
            lambda m: {**m, "maintenance_hold": {"op": "forget_keys",
                                                 "pid": live.pid}},
        )
        with pytest.raises(ConcurrentWriteError):
            am._set_maintenance_hold(cat, ["t.a", "t.b"], "forget_keys")
    finally:
        live.kill()
        live.wait()
    # t.a's crash signature was RESTORED, not cleared or replaced
    assert (cat.meta("t.a") or {})["maintenance_hold"] == dead_hold


# -- durable egress / restore vs erasure: exports refuse a held table ----

def _held_table(spark, tmp_path, name="t.h"):
    """A table mid-erasure: the hold stamped, zero work done (the
    crash/failed-erasure signature — partially-present data)."""
    cat = TableCatalog(str(tmp_path / "hc"))
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(6)], "id long, v string"
    )
    apply_changelog(
        spark, snapshot_changelog(df, name, ["id"], insert_version=3), cat
    )
    apply_mod._set_maintenance_hold(cat, [name], "forget_keys")
    return cat


def test_export_refuses_held_table_then_succeeds_after_erasure(
    spark, tmp_path
):
    """A DR export taken mid-erasure would durably persist the keys
    being forgotten OUTSIDE the catalog — the one copy the erasure's
    proof legs can never reach. Both export doors refuse while the
    hold stands (live or dead holder: partial erasure is the state
    that must not escape) and work again once the erasure completes."""
    from change_data_capture_spark.apply import ErasureInProgressError

    cat = _held_table(spark, tmp_path)
    with pytest.raises(ErasureInProgressError, match="forget_keys"):
        cat.export_snapshot(spark, "t.h", str(tmp_path / "exp1"))
    with pytest.raises(ErasureInProgressError, match="t.h"):
        cat.export_group_snapshot(
            spark, ["t.h"], watermark=3, dest_dir=str(tmp_path / "exp2")
        )
    # the complete-the-erasure path unblocks export
    keys = spark.createDataFrame([(0,)], "id long")
    forget_keys(spark, cat, "t.h", keys)
    man = cat.export_snapshot(spark, "t.h", str(tmp_path / "exp3"))
    assert man["n_rows"] == 5  # and the erased key is genuinely absent


def test_group_export_hold_precheck_writes_nothing(spark, tmp_path):
    """The group door prechecks EVERY member's hold before any bytes
    land: one held table among many must not leave N-1 exported table
    dirs of a group that can never complete."""
    import os as _os

    from change_data_capture_spark.apply import ErasureInProgressError

    cat = TableCatalog(str(tmp_path / "gc"))
    for t in ("g.clean", "g.held"):
        df = spark.createDataFrame([(1, t)], "id long, v string")
        apply_changelog(
            spark, snapshot_changelog(df, t, ["id"], insert_version=2), cat
        )
    apply_mod._set_maintenance_hold(cat, ["g.held"], "forget_column")
    dest = str(tmp_path / "gexp")
    with pytest.raises(ErasureInProgressError, match="g.held"):
        cat.export_group_snapshot(
            spark, ["g.clean", "g.held"], watermark=2, dest_dir=dest
        )
    assert not _os.path.exists(dest) or _os.listdir(dest) == []


def test_import_refuses_resume_into_held_table(spark, tmp_path):
    """The restore leg must not stamp/resume over a half-erased table:
    a hold on the target refuses the import until the erasure is
    re-run to completion."""
    from change_data_capture_spark.apply import ErasureInProgressError

    src = TableCatalog(str(tmp_path / "src"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(4)], "id long, v string")
    apply_changelog(
        spark, snapshot_changelog(df, "g.r", ["id"], insert_version=5), src
    )
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.r"], watermark=5, dest_dir=exp)
    dst = TableCatalog(str(tmp_path / "dst"))
    import_group_snapshot(spark, exp, dst)
    apply_mod._set_maintenance_hold(dst, ["g.r"], "forget_keys")
    with pytest.raises(ErasureInProgressError, match="g.r"):
        import_group_snapshot(spark, exp, dst)
