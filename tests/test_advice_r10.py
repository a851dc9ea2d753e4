"""Regression tests for the round-10 advisory findings (ADVICE.md r9):

1. ``import_group_snapshot``'s locked restore leg re-verifies the ROW
   COUNT for every resumed table before stamping: a table created by a
   live apply between the unlocked precheck and the lock at a LAGGING
   watermark used to be silently watermark-stamped with the snapshot
   never restored (the report claimed the manifest's n_rows and the
   live feed's versions <= wm were thereafter skipped as replays).
2. A FAILED erasure (``forget_keys`` / ``forget_column``) keeps the
   ``maintenance_hold`` — the clear used to run in a ``finally``, so
   the data could still be present while auto_maintain resumed
   compacting/vacuuming over it.
3. ``tools/partest.py`` records each worker's OWN exit wall — the old
   sequential ``p.wait()`` reap made ``min(walls)`` always worker 0's
   finish, collapsing the printed max/min balance toward 1.0.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401 (parity with suite style)

from change_data_capture_spark.apply import (
    TableCatalog,
    apply_changelog,
    auto_maintain,
    forget_column,
    forget_keys,
    import_group_snapshot,
)
from change_data_capture_spark.changelog import snapshot_changelog


# -- 1. live-created table at a lagging watermark ----------------------

class _FirstMetaNoneCatalog(TableCatalog):
    """Simulates a live apply CREATING the table in the window between
    import's unlocked precheck and its locked restore leg: the first
    meta() call for the target table answers None (the precheck sees
    it absent, so its row-count check never runs), every later call
    answers the real state."""

    def __init__(self, root, race_table):
        super().__init__(root)
        self._race_table = race_table
        self._armed = False
        self._lied = False

    def meta(self, table_id):
        if self._armed and table_id == self._race_table and not self._lied:
            self._lied = True
            return None
        return super().meta(table_id)


def test_import_refuses_live_created_table_at_lagging_watermark(spark, tmp_path):
    """The dangerous direction the r9 test missed: the live-created
    table's watermark is AT OR BELOW the manifest's, so it hits the
    crash-resume branch — which used to re-stamp the watermark with NO
    content verification (the precheck never saw the table). The
    locked leg must refuse on the row-count mismatch, leave the live
    watermark alone, and leave the live content untouched."""
    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame([(i, f"a{i}") for i in range(4)], "id long, v string")
    apply_changelog(spark, snapshot_changelog(a, "g.a", ["id"], insert_version=7), src)
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a"], watermark=7, dest_dir=exp)

    dst = _FirstMetaNoneCatalog(str(tmp_path / "dst"), "g.a")
    # the "live apply": ONE row at version 2 — watermark 2 <= manifest
    # 7, row count 1 != manifest 4
    live = spark.createDataFrame([(1, "live")], "id long, v string")
    apply_changelog(
        spark, snapshot_changelog(live, "g.a", ["id"], insert_version=2), dst
    )
    dst._armed = True
    with pytest.raises(ValueError, match="row\\(s\\) but the manifest says"):
        import_group_snapshot(spark, exp, dst)
    assert dst._lied is True  # the precheck-blind window was exercised
    # live state untouched: content not merged, watermark NOT stamped
    # to the manifest's 7 (stamping would make the live feed's own
    # versions <= 7 be skipped as replays — lost updates)
    assert sorted(map(tuple, dst.read(spark, "g.a").collect())) == [(1, "live")]
    assert int(dst.meta("g.a")["applied_version"]) == 2


def test_import_refuses_equal_count_different_content(spark, tmp_path):
    """The residual the count check cannot see: a live-created table
    whose row count COINCIDENTALLY equals the manifest's. The export's
    order-insensitive content checksum (r10, `content_sum`) refuses it
    under the lock; manifests predating the field fall back to the
    count-only check."""
    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame([(1, "real1"), (2, "real2")], "id long, v string")
    apply_changelog(spark, snapshot_changelog(a, "g.a", ["id"], insert_version=6), src)
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a"], watermark=6, dest_dir=exp)

    dst = _FirstMetaNoneCatalog(str(tmp_path / "dst"), "g.a")
    # live content: SAME count (2), SAME schema, different values,
    # lagging watermark — count check alone would stamp and skip
    live = spark.createDataFrame([(1, "live1"), (9, "live9")], "id long, v string")
    apply_changelog(
        spark, snapshot_changelog(live, "g.a", ["id"], insert_version=2), dst
    )
    dst._armed = True
    with pytest.raises(ValueError, match="content checksum"):
        import_group_snapshot(spark, exp, dst)
    assert dst._lied is True
    assert sorted(map(tuple, dst.read(spark, "g.a").collect())) == [
        (1, "live1"), (9, "live9"),
    ]
    assert int(dst.meta("g.a")["applied_version"]) == 2  # never stamped


def test_import_still_resumes_the_genuine_crash_signature(spark, tmp_path):
    """rows-match + lagging-watermark (a crash between apply_changes
    and the stamp) must STILL resume — the tightened check refuses
    only content mismatches."""
    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame([(i, i * 3) for i in range(5)], "id long, n long")
    apply_changelog(spark, snapshot_changelog(a, "g.a", ["id"], insert_version=4), src)
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a"], watermark=4, dest_dir=exp)

    dst = TableCatalog(str(tmp_path / "dst"))
    import_group_snapshot(spark, exp, dst)
    m = dst.meta("g.a")
    m["applied_version"] = 1  # crash state: rows landed, stamp lost
    dst.put_meta("g.a", m)
    rep = import_group_snapshot(spark, exp, dst)
    assert rep["tables"]["g.a"]["resumed"] is True
    assert int(dst.meta("g.a")["applied_version"]) == 4


def test_export_and_resume_checksum_handle_map_columns(spark, tmp_path):
    """r10 regression: Spark prohibits xxhash64 on MAP elements, so the
    first cut of the content checksum threw AnalysisException for any
    table with a map column — on export AND on the resumed-restore
    re-check. ``_content_hash`` canonicalizes maps (sorted entries) so
    both legs work and the crash-resume equality still holds."""
    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame(
        [(1, {"b": "y", "a": "x"}), (2, {"c": "z"}), (3, None)],
        "id long, props map<string,string>",
    )
    apply_changelog(spark, snapshot_changelog(a, "g.m", ["id"], insert_version=4), src)
    exp = str(tmp_path / "exp")
    man = src.export_group_snapshot(spark, ["g.m"], watermark=4, dest_dir=exp)
    assert man["tables"]["g.m"]  # export no longer throws

    dst = TableCatalog(str(tmp_path / "dst"))
    import_group_snapshot(spark, exp, dst)
    # crash state (stamp lost) -> the resume path runs the checksum
    # re-check over the map-bearing table and must MATCH
    m = dst.meta("g.m")
    m["applied_version"] = 1
    dst.put_meta("g.m", m)
    rep = import_group_snapshot(spark, exp, dst)
    assert rep["tables"]["g.m"]["resumed"] is True
    assert int(dst.meta("g.m")["applied_version"]) == 4
    got = {r["id"]: r["props"] for r in dst.read(spark, "g.m").collect()}
    assert got == {1: {"a": "x", "b": "y"}, 2: {"c": "z"}, 3: None}


# -- 2. failed erasure keeps the maintenance hold ----------------------

class _VacuumFailsOnceCatalog(TableCatalog):
    def __init__(self, root):
        super().__init__(root)
        self.fail_next_vacuum = False

    def vacuum(self, table_id, keep_last=2, protect_from=None):
        if self.fail_next_vacuum:
            self.fail_next_vacuum = False
            raise RuntimeError("injected vacuum failure mid-erasure")
        return super().vacuum(table_id, keep_last, protect_from)


def test_failed_forget_keys_keeps_hold_until_successful_rerun(spark, tmp_path):
    cat = _VacuumFailsOnceCatalog(str(tmp_path / "c"))
    df = spark.createDataFrame(
        [(i, f"u{i}@x") for i in range(10)], "id long, email string"
    )
    apply_changelog(spark, snapshot_changelog(df, "t.users", ["id"]), cat)
    keys = spark.createDataFrame([(3,), (7,)], "id long")

    cat.fail_next_vacuum = True
    with pytest.raises(RuntimeError, match="injected vacuum failure"):
        forget_keys(spark, cat, "t.users", keys)
    # the erasure is INCOMPLETE (history versions still hold the rows):
    # the hold must stay, and auto_maintain must skip-report, not act
    hold = (cat.meta("t.users") or {}).get("maintenance_hold")
    assert hold is not None and hold["op"] == "forget_keys"
    # keep_last=1 makes the pre-delete version reclaimable, so the
    # maintenance pass genuinely WANTS to vacuum — and must skip-report
    acts = [
        a
        for a in auto_maintain(spark, cat, keep_last=1)
        if a.get("table") == "t.users"
    ]
    assert acts and all("skipped_hold" in a for a in acts)
    # the re-run completes the erasure and ONLY THEN clears the hold
    rep = forget_keys(spark, cat, "t.users", keys)
    assert rep["versions_verified"]
    assert "maintenance_hold" not in (cat.meta("t.users") or {})


def test_failed_forget_column_keeps_hold(spark, tmp_path):
    cat = _VacuumFailsOnceCatalog(str(tmp_path / "c"))
    df = spark.createDataFrame(
        [(i, f"u{i}", f"s{i}") for i in range(6)], "id long, name string, ssn string"
    )
    apply_changelog(spark, snapshot_changelog(df, "t.people", ["id"]), cat)
    cat.fail_next_vacuum = True
    with pytest.raises(RuntimeError, match="injected vacuum failure"):
        forget_column(spark, cat, "t.people", "ssn", keep_last=1)
    hold = (cat.meta("t.people") or {}).get("maintenance_hold")
    assert hold is not None and hold["op"] == "forget_column"
    # re-run resumes (the announce already tombstoned the column) and
    # clears the hold on completion
    rep = forget_column(spark, cat, "t.people", "ssn", keep_last=1)
    assert rep["column"] == "ssn"
    assert "maintenance_hold" not in (cat.meta("t.people") or {})


# -- announce_schema contention report (VERDICT r9 directive #5) -------

def test_announce_schema_reports_replans_and_rewrite(spark, tmp_path):
    """Uncontended paths: a metadata-only announce reports {0, False,
    False}; an uncontended physical re-type reports rewrite=True with
    zero replans and no locked fallback. (The contended >=1-replan
    case is pinned by test_retype_rewrite_replans_on_concurrent_publish
    in tests/test_advice_r9.py.)"""
    cat = TableCatalog(str(tmp_path / "c"))
    df = spark.createDataFrame([(1, "10", "x")], "id long, amount string, note string")
    apply_changelog(spark, snapshot_changelog(df, "shop.t", ["id"]), cat)

    # metadata-only: drop a column
    rep = cat.announce_schema(
        "shop.t", spark.createDataFrame([], "id long, amount string").schema.json()
    )
    assert rep == {"replans": 0, "locked_fallback": False, "rewrite": False}
    # physical re-type (string -> bigint is not read-compatible)
    rep = cat.announce_schema(
        "shop.t",
        spark.createDataFrame([], "id long, amount bigint").schema.json(),
        spark=spark,
    )
    assert rep == {"replans": 0, "locked_fallback": False, "rewrite": True}
    assert [tuple(r) for r in cat.read(spark, "shop.t").collect()] == [(1, 10)]


# -- 3. partest per-worker wall measurement -----------------------------

def test_partest_poll_walls_records_each_workers_own_exit(monkeypatch):
    """Worker 0 finishing LAST used to make min(walls) its own reap
    time, printing balance ~1.0 for a genuinely 5x-imbalanced pack."""
    import tools.partest as pt

    clock = {"t": 100.0}
    monkeypatch.setattr(pt.time, "time", lambda: clock["t"])
    monkeypatch.setattr(
        pt.time, "sleep", lambda s: clock.__setitem__("t", clock["t"] + s)
    )

    class _P:
        def __init__(self, done_at):
            self.done_at = done_at
            self.returncode = None

        def poll(self):
            if clock["t"] >= self.done_at:
                self.returncode = 0
                return 0
            return None

    procs = [_P(110.0), _P(102.0)]  # worker 0 is the straggler
    walls = pt._poll_walls(procs, t0=100.0)
    assert walls[1] < walls[0]
    assert max(walls) / min(walls) > 4.0  # the imbalance is visible now


# -- ddl contention surfaced in the batch report ------------------------

def test_apply_reports_ddl_contention_rows(spark, tmp_path, monkeypatch):
    """announce_schema's contention report must reach the per-batch
    apply report (the on_report observability hook) — an operator
    watching micro-batch metrics sees re-type replans, not just the
    announce's own return value deep inside apply."""
    from change_data_capture_spark.changelog import ddl_record

    cat = TableCatalog(str(tmp_path / "c"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    apply_changelog(spark, snapshot_changelog(df, "t.x", ["id"]), cat)

    real = TableCatalog.announce_schema

    def contended(self, table_id, schema_json, spark=None):
        real(self, table_id, schema_json, spark=spark)
        return {"replans": 2, "locked_fallback": False, "rewrite": True}

    monkeypatch.setattr(TableCatalog, "announce_schema", contended)
    batch = ddl_record(
        spark, "t.x",
        spark.createDataFrame([], "id long, v string, extra string").schema.json(),
    )
    rep = apply_changelog(spark, batch, cat)
    rows = [r for r in rep if r.get("action") == "ddl_contention"]
    assert rows == [{
        "table": "t.x", "action": "ddl_contention",
        "replans": 2, "locked_fallback": False,
    }]
    # zero contention adds NO report rows (the common case stays clean)
    monkeypatch.undo()
    batch2 = ddl_record(
        spark, "t.x",
        spark.createDataFrame(
            [], "id long, v string, extra string, more string"
        ).schema.json(),
    )
    rep2 = apply_changelog(spark, batch2, cat)
    assert not [r for r in rep2 if r.get("action") == "ddl_contention"]
