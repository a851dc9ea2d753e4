"""Round-9 adversarial seam sweep (VERDICT r8 directive #2) — the
unreviewed interleavings of the r8-new surfaces:

- ``import_group_snapshot`` racing a live apply on the target catalog
  (the occupied-table precheck reads meta UNLOCKED; the restore leg
  must be torn-safe under the per-table meta lock);
- ``forget_keys`` / ``forget_column`` vs a scheduled ``auto_maintain``
  on the same table (the documented quiesce rule is now machine-
  checked via ``maintenance_hold``);
- a crash INSIDE ``_refresh_derived_index`` mid-erasure (the re-run
  must scrub and verify the torn index, and a crashed process's stale
  hold must be visible, not silently swallowed).
"""

import os
import threading

import pytest
from pyspark.sql import functions as F

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

try:
    import fcntl
except ImportError:  # pragma: no cover - non-POSIX
    fcntl = None


# -- restore vs live apply ---------------------------------------------

class _FirstMetaNoneCatalog(TableCatalog):
    """Simulates a live apply CREATING a table in the window between
    import's unlocked precheck and its locked restore leg: the first
    meta() call for the target table answers None (precheck sees it
    absent), every later call answers the real state."""

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


def test_import_refuses_table_created_by_live_apply_mid_import(spark, tmp_path):
    """If a live feed creates/advances the target table AFTER the
    precheck, the locked restore leg's re-read must catch it and
    refuse loudly (naming the live feed) — never merge snapshot rows
    into live content."""
    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame([(i, f"a{i}") for i in range(4)], "id long, v string")
    apply_changelog(spark, snapshot_changelog(a, "g.a", ["id"], insert_version=3), src)
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a"], watermark=5, dest_dir=exp)

    dst = _FirstMetaNoneCatalog(str(tmp_path / "dst"), "g.a")
    # the "live apply": table already exists with content AHEAD of the
    # manifest (watermark 9 > 3) — but the precheck will see None
    live = spark.createDataFrame([(1, "live")], "id long, v string")
    apply_changelog(
        spark, snapshot_changelog(live, "g.a", ["id"], insert_version=9), dst
    )
    dst._armed = True
    with pytest.raises(ValueError, match="advanced past the manifest"):
        import_group_snapshot(spark, exp, dst)
    assert dst._lied is True  # the race window was actually exercised
    # live content untouched — nothing merged
    got = sorted(map(tuple, dst.read(spark, "g.a").collect()))
    assert got == [(1, "live")]


class _GatedCountCatalog(TableCatalog):
    """Parks inside the restore leg's under-lock row-count read so the
    test can probe the lock from outside while the restore is
    mid-flight."""

    def __init__(self, root):
        super().__init__(root)
        self.armed = False
        self.parked = threading.Event()
        self.release = threading.Event()

    def read(self, spark, table_id, buckets=None, version=None):
        df = super().read(spark, table_id, buckets=buckets, version=version)
        if self.armed:
            self.armed = False
            self.parked.set()
            assert self.release.wait(60)
        return df


@pytest.mark.skipif(fcntl is None, reason="POSIX flock only")
def test_restore_leg_holds_the_table_lock(spark, tmp_path):
    """The whole restore leg (create -> stamp -> verify) must run
    under the table's meta lock, so a concurrent applier blocks
    instead of interleaving."""
    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame([(i, i * 2) for i in range(5)], "id long, n long")
    apply_changelog(spark, snapshot_changelog(a, "g.a", ["id"], insert_version=2), src)
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a"], watermark=4, dest_dir=exp)

    dst = _GatedCountCatalog(str(tmp_path / "dst"))
    dst.armed = True
    err: list[BaseException] = []

    def run_import():
        try:
            import_group_snapshot(spark, exp, dst)
        except BaseException as e:  # noqa: BLE001
            err.append(e)

    th = threading.Thread(target=run_import)
    th.start()
    assert dst.parked.wait(120)
    # mid-restore: the table lock must be HELD (non-blocking acquire fails)
    fd = os.open(os.path.join(dst._locks_dir, "g.a.lock"),
                 os.O_CREAT | os.O_RDWR, 0o644)
    try:
        with pytest.raises(BlockingIOError):
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    finally:
        os.close(fd)
    dst.release.set()
    th.join(120)
    assert not err, err
    assert dst.read(spark, "g.a").count() == 5


# -- erasure vs auto_maintain ------------------------------------------

def _seed_with_index(spark, tmp_path):
    from change_data_capture_spark.extensions import dedup

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog number {i} "
              f"with shared boilerplate padding text") for i in range(30)],
        "doc_id long, text string",
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(docs, "ml.docs", ["doc_id"]), cat)
    apply_changelog(
        spark, dedup.signature_changelog(docs, "ml.sigs", n=5, k=32), cat
    )
    register_derived_index(
        cat, "ml.sigs", base_table="ml.docs", kind="minhash_sigs",
        params={"n": 5, "k": 32},
    )
    return docs, cat


def test_auto_maintain_skips_held_tables_and_reports(spark, tmp_path):
    """A maintenance_hold (the machine-checked quiesce) makes
    auto_maintain skip-and-report the held table; clearing it restores
    normal maintenance."""
    docs, cat = _seed_with_index(spark, tmp_path)
    # create reclaimable history on the base
    apply_changelog(
        spark,
        dml_records(docs.filter("doc_id < 5"), "ml.docs", ["doc_id"],
                    op="UPDATE", version=2,
                    value_overrides={"text": F.concat(F.col("text"), F.lit("!"))}),
        cat,
    )
    apply_mod._set_maintenance_hold(cat, ["ml.docs", "ml.sigs"], "forget_keys")
    try:
        acts = auto_maintain(spark, cat, keep_last=1)
        held = {a["table"]: a for a in acts if "skipped_hold" in a}
        # the stale index's refresh is the held action (the base's
        # vacuum is a no-op while the index floor protects history —
        # which is exactly why the skip must be REPORTED, or a stale
        # hold would freeze maintenance invisibly)
        assert "ml.sigs" in held
        assert held["ml.sigs"]["skipped_hold"]["op"] == "forget_keys"
        # nothing was vacuumed or refreshed on held tables
        for a in acts:
            if a["table"] in ("ml.docs", "ml.sigs") and "skipped_hold" not in a:
                raise AssertionError(f"held table acted on: {a}")
    finally:
        apply_mod._clear_maintenance_hold(cat, ["ml.docs", "ml.sigs"])
    # after the clear, maintenance proceeds (vacuum reclaims history)
    acts = auto_maintain(spark, cat, keep_last=1)
    assert any(
        a["table"] == "ml.docs" and a.get("vacuumed_versions") for a in acts
    )


def test_forget_keys_sets_and_clears_hold(spark, tmp_path):
    """The hold exists exactly for the erasure's duration — stamped on
    base AND children, gone on success (and on clean failure)."""
    _, cat = _seed_with_index(spark, tmp_path)
    seen: dict = {}
    real = apply_mod._refresh_derived_index

    def spying(spark_, catalog, child, dinfo):
        seen["base_hold"] = (catalog.meta("ml.docs") or {}).get("maintenance_hold")
        seen["child_hold"] = (catalog.meta("ml.sigs") or {}).get("maintenance_hold")
        return real(spark_, catalog, child, dinfo)

    keys = spark.createDataFrame([(3,), (7,)], "doc_id long")
    try:
        apply_mod._refresh_derived_index = spying
        forget_keys(spark, cat, "ml.docs", keys)
    finally:
        apply_mod._refresh_derived_index = real
    assert seen["base_hold"]["op"] == "forget_keys"
    assert seen["child_hold"]["op"] == "forget_keys"
    assert "maintenance_hold" not in cat.meta("ml.docs")
    assert "maintenance_hold" not in cat.meta("ml.sigs")


# -- crash inside _refresh_derived_index mid-erasure -------------------

def test_crash_mid_index_refresh_rerun_scrubs_and_verifies(spark, tmp_path):
    """Inject a kill INSIDE the derived-index refresh (before AND
    after the child's publish) — the erasure fails loudly each time,
    and the clean re-run must leave every remaining child version free
    of the erased keys and fully verified."""
    _, cat = _seed_with_index(spark, tmp_path)
    keys = spark.createDataFrame([(3,), (17,)], "doc_id long")
    real = apply_mod._refresh_derived_index

    # kill BEFORE the refresh does anything (child untouched, stale)
    def kill_before(*a, **k):
        raise RuntimeError("injected kill: before refresh")

    apply_mod._refresh_derived_index = kill_before
    try:
        with pytest.raises(RuntimeError, match="before refresh"):
            forget_keys(spark, cat, "ml.docs", keys)
    finally:
        apply_mod._refresh_derived_index = real
    # base delete committed; child still serves the keys — the torn state
    assert cat.read(spark, "ml.docs").filter(
        F.col("doc_id").isin(3, 17)).count() == 0

    # kill AFTER the refresh published but before vacuum/verify
    def kill_after(spark_, catalog, child, dinfo):
        real(spark_, catalog, child, dinfo)
        raise RuntimeError("injected kill: after refresh publish")

    apply_mod._refresh_derived_index = kill_after
    try:
        with pytest.raises(RuntimeError, match="after refresh publish"):
            forget_keys(spark, cat, "ml.docs", keys)
    finally:
        apply_mod._refresh_derived_index = real

    # clean re-run completes the erasure end-to-end
    rep = forget_keys(spark, cat, "ml.docs", keys)
    assert rep["derived"]["ml.sigs"]["versions_verified"]
    for v in cat.versions("ml.sigs"):
        got = cat.read(spark, "ml.sigs", version=v)
        assert got.filter(F.col("doc_id").isin(3, 17)).count() == 0
    assert "maintenance_hold" not in cat.meta("ml.docs")


def test_stale_hold_from_crashed_process_is_visible_then_cleared_by_rerun(
    spark, tmp_path
):
    """A process that DIES mid-erasure leaves the hold (no finally ran)
    — maintenance must keep reporting it, and the erasure re-run is the
    documented way to clear it."""
    docs, cat = _seed_with_index(spark, tmp_path)
    apply_changelog(
        spark,
        dml_records(docs.filter("doc_id < 5"), "ml.docs", ["doc_id"],
                    op="UPDATE", version=2,
                    value_overrides={"text": F.concat(F.col("text"), F.lit("!"))}),
        cat,
    )
    # what a crashed forget_keys leaves behind
    apply_mod._set_maintenance_hold(cat, ["ml.docs", "ml.sigs"], "forget_keys")
    acts = auto_maintain(spark, cat, keep_last=1)
    assert any("skipped_hold" in a for a in acts), acts
    # the re-run completes and clears the hold
    keys = spark.createDataFrame([(3,), (17,)], "doc_id long")
    forget_keys(spark, cat, "ml.docs", keys)
    assert "maintenance_hold" not in cat.meta("ml.docs")
    assert "maintenance_hold" not in cat.meta("ml.sigs")
    acts = auto_maintain(spark, cat, keep_last=1)
    assert not any("skipped_hold" in a for a in acts)


def test_forget_column_resumes_after_crash_between_announce_and_compact(
    spark, tmp_path
):
    """r9 self-review: a crash between forget_column's announce
    (metadata drop, tombstone written) and its compact left the
    column's BYTES in every file while the re-run refused with
    'has no column' — the erasure was permanently un-completable.
    The tombstone is the crash signature: the re-run must resume the
    physical legs and the verification must then prove the bytes gone."""
    import pyarrow.parquet as pq
    from change_data_capture_spark.apply import forget_column

    base = spark.createDataFrame(
        [(i, f"u{i}@mail.test", i * 1.0) for i in range(20)],
        "id long, email string, balance double",
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "shop.u", ["id"]), cat)

    real_compact = TableCatalog.compact
    calls = {"n": 0}

    def dying_compact(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected kill: before compact")
        return real_compact(self, *a, **k)

    TableCatalog.compact = dying_compact
    try:
        with pytest.raises(RuntimeError, match="before compact"):
            forget_column(spark, cat, "shop.u", "email")
        # torn state: column gone from the registered schema, bytes
        # still physically present in the current version's files
        from change_data_capture_spark.schema import schema_from_json as sfj
        meta = cat.meta("shop.u")
        assert "email" not in [f.name for f in sfj(meta["schema"]).fields]
        vdir = os.path.join(cat.table_dir("shop.u"), meta["current"])
        assert "email" in set(spark.read.parquet(vdir).columns)
        # re-run resumes (no 'has no column' refusal) and completes
        rep = forget_column(spark, cat, "shop.u", "email")
    finally:
        TableCatalog.compact = real_compact
    assert rep["versions_verified"]
    for v in cat.versions("shop.u"):
        vdir = os.path.join(cat.table_dir("shop.u"), f"data_v{v:06d}")
        assert "email" not in set(spark.read.parquet(vdir).columns)
    # a column that never existed still refuses
    with pytest.raises(KeyError, match="no column"):
        forget_column(spark, cat, "shop.u", "ghost")
