"""MetaBackend contract tests (r9, VERDICT r8 directive #6).

The race fake proves ``TableCatalog.update_meta`` holds its atomicity
contract with NO lock at all — exactly the situation on an object
store, where ``lock()`` cannot exist and a conditional PUT
(``put_if``) is the only primitive. The local backend must pass the
same contract under its flock."""

import json
import os
import threading
from contextlib import contextmanager

import pytest

from change_data_capture_spark.apply import TableCatalog
from change_data_capture_spark.metastore import (
    ConcurrentWriteError,
    LocalFSMetaBackend,
    MetaBackend,
)


class ConditionalPutFake(MetaBackend):
    """In-memory backend with S3/GCS-style semantics: no lock (a
    no-op context), a monotonically bumped generation token per key,
    and an optional ``interleave`` hook fired between a reader's get
    and its put_if — the injected race."""

    def __init__(self):
        self._store: dict[str, tuple[dict, int]] = {}
        self._mu = threading.Lock()  # models the store's own atomicity
        self.interleave = None
        self.put_if_conflicts = 0

    def get(self, table_id):
        with self._mu:
            if table_id not in self._store:
                return None, None
            meta, gen = self._store[table_id]
            return json.loads(json.dumps(meta)), gen

    def put(self, table_id, meta):
        with self._mu:
            _, gen = self._store.get(table_id, (None, 0))
            self._store[table_id] = (json.loads(json.dumps(meta)), gen + 1)

    def put_if(self, table_id, meta, expected_token):
        hook, self.interleave = self.interleave, None
        if hook is not None:
            hook()  # a rival writer lands between our get and put_if
        with self._mu:
            cur = self._store.get(table_id)
            tok = cur[1] if cur is not None else None
            if tok != expected_token:
                self.put_if_conflicts += 1
                raise ConcurrentWriteError(
                    f"{table_id}: generation {expected_token} != {tok}"
                )
            self._store[table_id] = (json.loads(json.dumps(meta)), (tok or 0) + 1)

    def remove(self, table_id):
        with self._mu:
            self._store.pop(table_id, None)

    def list_tables(self):
        with self._mu:
            return sorted(self._store)

    @contextmanager
    def lock(self, table_id):
        yield  # object stores cannot lock — that is the point


@pytest.fixture(params=["local", "fake", "genfs"])
def catalog(request, tmp_path):
    if request.param == "local":
        return TableCatalog(str(tmp_path / "c"))
    if request.param == "genfs":
        from change_data_capture_spark.metastore import GenerationFSMetaBackend

        return TableCatalog(
            str(tmp_path / "c"),
            backend=GenerationFSMetaBackend(str(tmp_path / "c")),
        )
    return TableCatalog(str(tmp_path / "c"), backend=ConditionalPutFake())


def test_update_meta_read_modify_put(catalog):
    catalog.put_meta("t.a", {"table": "t.a", "n": 0})
    out = catalog.update_meta("t.a", lambda m: {**m, "n": m["n"] + 1})
    assert out["n"] == 1
    assert catalog.meta("t.a")["n"] == 1
    # no-op leg: fn returning None writes nothing and returns current
    assert catalog.update_meta("t.a", lambda m: None)["n"] == 1
    # missing table: fn sees None
    seen = []
    catalog.update_meta("t.missing", lambda m: seen.append(m))
    assert seen == [None]


def test_update_meta_survives_injected_race():
    """A rival publish landing between get and put_if must not be
    reverted: update_meta retries against fresh state and BOTH
    mutations survive — the exact CAS window the r7 verdict documented
    for the lockless filesystem catalog."""
    be = ConditionalPutFake()
    cat = TableCatalog.__new__(TableCatalog)  # no fs root needed
    cat.backend = be
    be.put("t.a", {"table": "t.a", "n": 0, "rival": 0})

    def rival():
        # unconditional in the hook = a writer that won the race
        meta, _ = be.get("t.a")
        be.put("t.a", {**meta, "rival": meta["rival"] + 1})

    be.interleave = rival
    cat.update_meta("t.a", lambda m: {**m, "n": m["n"] + 1})
    final = be.get("t.a")[0]
    assert final == {"table": "t.a", "n": 1, "rival": 1}
    assert be.put_if_conflicts == 1  # the race actually happened


def test_update_meta_lockless_hammer_loses_nothing():
    """16 threads x 25 increments through update_meta on the lock-less
    fake: every increment must survive (the hammer that proves the
    optimistic loop is a real substitute for the flock)."""
    be = ConditionalPutFake()
    cat = TableCatalog.__new__(TableCatalog)
    cat.backend = be
    be.put("t.a", {"n": 0})
    N_THREADS, N_INCR = 16, 25
    errors = []

    def worker():
        try:
            for _ in range(N_INCR):
                cat.update_meta(
                    "t.a", lambda m: {**m, "n": m["n"] + 1}, attempts=10_000
                )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(N_THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert be.get("t.a")[0]["n"] == N_THREADS * N_INCR


def test_local_backend_hammer_loses_nothing(tmp_path):
    """Same hammer against the real filesystem backend (flock path)."""
    cat = TableCatalog(str(tmp_path / "c"))
    cat.put_meta("t.a", {"n": 0})
    N_THREADS, N_INCR = 8, 15
    errors = []

    def worker():
        try:
            for _ in range(N_INCR):
                cat.update_meta("t.a", lambda m: {**m, "n": m["n"] + 1})
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(N_THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors
    assert cat.meta("t.a")["n"] == N_THREADS * N_INCR


def test_fn_exceptions_propagate_not_retried(catalog):
    """Business-level refusals raised BY fn must abort immediately —
    only the backend's put_if conflict is retried."""
    catalog.put_meta("t.a", {"n": 0})
    calls = []

    def fn(m):
        calls.append(1)
        raise ValueError("refused")

    with pytest.raises(ValueError, match="refused"):
        catalog.update_meta("t.a", fn)
    assert len(calls) == 1


def test_local_token_changes_on_every_put(tmp_path):
    be = LocalFSMetaBackend(str(tmp_path / "c"))
    be.put("t.a", {"n": 0})
    _, t1 = be.get("t.a")
    be.put("t.a", {"n": 1})
    _, t2 = be.get("t.a")
    assert t1 != t2
    with pytest.raises(ConcurrentWriteError):
        be.put_if("t.a", {"n": 2}, t1)
    be.put_if("t.a", {"n": 2}, t2)
    assert be.get("t.a")[0] == {"n": 2}


def test_catalog_flows_work_on_fake_backend(spark, tmp_path):
    """A TableCatalog running on the conditional-PUT fake supports the
    core apply flow end-to-end (data dirs stay on the filesystem; only
    the meta pointer moves through the backend) — the drop-in seam the
    S3/GCS backend will use."""
    from change_data_capture_spark.apply import apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog

    cat = TableCatalog(str(tmp_path / "c"), backend=ConditionalPutFake())
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    apply_changelog(spark, snapshot_changelog(df, "t.x", ["id"]), cat)
    assert sorted(map(tuple, cat.read(spark, "t.x").collect())) == [
        (1, "a"), (2, "b"),
    ]
    assert cat.tables() == ["t.x"]
    # no _meta.json on disk — the pointer lives in the backend
    assert not os.path.exists(str(tmp_path / "c" / "t.x" / "_meta.json"))
    # idempotent replay through the same backend
    apply_changelog(spark, snapshot_changelog(df, "t.x", ["id"]), cat)
    assert cat.read(spark, "t.x").count() == 2


# -- GenerationFSMetaBackend: the second CONCRETE lock-free backend ----
# (r10, VERDICT r9 directive #3 — the injected-race fake proved the
# update_meta contract; this proves a real conditional-PUT store.)

from change_data_capture_spark.metastore import (  # noqa: E402
    GenerationFSMetaBackend,
    QuiesceRequiredError,
)


def test_genfs_token_and_conditional_put_contract(tmp_path):
    be = GenerationFSMetaBackend(str(tmp_path / "g"))
    assert be.supports_locks is False
    assert be.get("t.a") == (None, None)
    be.put_if("t.a", {"n": 0}, None)  # exclusive create
    m, t1 = be.get("t.a")
    assert m == {"n": 0} and t1 == 1
    # stale-token swap refuses; fresh one lands
    with pytest.raises(ConcurrentWriteError):
        be.put_if("t.a", {"n": 9}, None)
    be.put_if("t.a", {"n": 1}, t1)
    m, t2 = be.get("t.a")
    assert m == {"n": 1} and t2 == 2
    with pytest.raises(ConcurrentWriteError):
        be.put_if("t.a", {"n": 9}, t1)
    # blind put still advances the generation
    be.put("t.a", {"n": 2})
    assert be.get("t.a")[0] == {"n": 2}
    assert be.list_tables() == ["t.a"]
    be.remove("t.a")
    assert be.get("t.a") == (None, None)
    assert be.list_tables() == []


def test_genfs_retires_deep_generation_tail(tmp_path):
    """Retirement truncates content but KEEPS every claim name (the
    marker is what makes a deeply-stale link collide)."""
    import os

    be = GenerationFSMetaBackend(str(tmp_path / "g"))
    for i in range(12):
        be.put("t.a", {"n": i})
    gens = be._gens("t.a")
    assert gens == list(range(1, 13))  # names are forever
    live = [g for g in gens if os.path.getsize(be._gen_path("t.a", g))]
    assert len(live) <= be._KEEP_GENERATIONS
    assert be.get("t.a")[0] == {"n": 11}


def test_genfs_deeply_stale_token_raises_not_lost_update(tmp_path):
    """r10 regression: with unlink-based retirement, a writer whose
    token predates the retired tail (the worst case: ``None`` from a
    pre-create read, racing a hot stream past _KEEP_GENERATIONS
    publishes) could link a LOW generation successfully — put_if
    reported success but the write was never current: a silent lost
    update. The kept zero-byte markers make every such link collide."""
    be = GenerationFSMetaBackend(str(tmp_path / "g"))
    _, stale_none = be.get("t.a")  # None: read before the table existed
    tok = None
    for i in range(be._KEEP_GENERATIONS + 4):
        be.put_if("t.a", {"n": i}, tok)
        _, tok = be.get("t.a")
    for bad in (stale_none, 1, 3):  # create-race + two retired gens
        with pytest.raises(ConcurrentWriteError):
            be.put_if("t.a", {"n": "stale"}, bad)
    assert be.get("t.a")[0] == {"n": be._KEEP_GENERATIONS + 3}


def test_genfs_update_meta_hammer_loses_nothing(tmp_path):
    """The real-filesystem twin of the lockless fake hammer: 8 threads
    x 15 increments through update_meta with lock() a no-op — every
    increment must survive purely on link()-claimed generations."""
    cat = TableCatalog(
        str(tmp_path / "g"), backend=GenerationFSMetaBackend(str(tmp_path / "g"))
    )
    cat.put_meta("t.a", {"n": 0})
    N_THREADS, N_INCR = 8, 15
    errors = []

    def worker():
        try:
            for _ in range(N_INCR):
                cat.update_meta(
                    "t.a", lambda m: {**m, "n": m["n"] + 1}, attempts=10_000
                )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(N_THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors
    assert cat.meta("t.a")["n"] == N_THREADS * N_INCR


def test_catalog_flows_work_on_genfs_backend(spark, tmp_path):
    """Core apply flow end-to-end on the conditional-PUT-only backend:
    create, merge, idempotent replay, vacuum, metadata-only announce —
    all through put_if-exact commits, no lock anywhere."""
    from change_data_capture_spark.apply import apply_changelog
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    root = str(tmp_path / "g")
    cat = TableCatalog(root, backend=GenerationFSMetaBackend(root))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(6)], "id long, v string")
    apply_changelog(spark, snapshot_changelog(df, "t.x", ["id"]), cat)
    upd = dml_records(
        spark.createDataFrame([(2, "patched")], "id long, v string"),
        "t.x", ["id"], op="UPDATE", version=5,
    )
    apply_changelog(spark, upd, cat)
    apply_changelog(spark, upd, cat)  # replay: watermark-suppressed
    got = {r.id: r.v for r in cat.read(spark, "t.x").collect()}
    assert got[2] == "patched" and len(got) == 6
    assert cat.vacuum("t.x", keep_last=1)  # history retires cleanly
    rep = cat.announce_schema(
        "t.x", spark.createDataFrame([], "id long, v string, extra string").schema.json()
    )
    assert rep["replans"] == 0 and rep["locked_fallback"] is False
    assert "extra" in cat.read(spark, "t.x").columns
    # no _meta.json: the pointer lives in generation files
    assert not os.path.exists(os.path.join(root, "t.x", "_meta.json"))


def test_stream_apply_works_on_genfs_backend(spark, sf_dir, tmp_path):
    """The streaming front door against the conditional-PUT-only
    backend — the actual S3/GCS deployment shape the genfs backend
    exists to prove: every micro-batch's create/merge commit rides
    put_if, watermark stamps ride update_meta, and a checkpointed
    RESTART resumes with only the new files (offsets in the
    checkpoint, table state in lock-free meta)."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.changelog import (
        mutation_changelog,
        snapshot_changelog,
    )
    from change_data_capture_spark.streaming import (
        run_apply_stream,
        write_changelog,
    )
    from conftest import load

    region = load(spark, sf_dir, "region")
    logdir, ckpt = str(tmp_path / "log"), str(tmp_path / "ckpt")
    root = str(tmp_path / "gcat")
    cat = TableCatalog(root, backend=GenerationFSMetaBackend(root))

    write_changelog(
        snapshot_changelog(region, "t.region", ["r_regionkey"]), logdir
    )
    run_apply_stream(spark, logdir, cat, ckpt)
    assert cat.read(spark, "t.region").count() == region.count()

    write_changelog(
        mutation_changelog(
            region, "t.region", ["r_regionkey"],
            delete_where=F.col("r_regionkey") == 0, delete_version=2,
        ),
        logdir,
    )
    run_apply_stream(spark, logdir, cat, ckpt)  # restart: resumes
    got = cat.read(spark, "t.region")
    assert got.count() == region.count() - 1
    assert got.filter("r_regionkey = 0").count() == 0
    assert not os.path.exists(os.path.join(root, "t.region", "_meta.json"))


def test_quiesce_required_restore_on_lockfree_backend(spark, tmp_path):
    """import_group_snapshot's restore leg NEEDS held exclusivity; on
    a backend that cannot lock it must refuse with the typed error,
    not silently race (r10 directive #3)."""
    from change_data_capture_spark.apply import (
        apply_changelog,
        import_group_snapshot,
    )
    from change_data_capture_spark.changelog import snapshot_changelog

    src = TableCatalog(str(tmp_path / "src"))
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    apply_changelog(spark, snapshot_changelog(df, "g.a", ["id"], insert_version=2), src)
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a"], watermark=3, dest_dir=exp)
    dst = TableCatalog(
        str(tmp_path / "dst"), backend=GenerationFSMetaBackend(str(tmp_path / "dst"))
    )
    with pytest.raises(QuiesceRequiredError, match="restore leg"):
        import_group_snapshot(spark, exp, dst)
    assert dst.tables() == []  # nothing half-restored


def test_quiesce_required_announce_terminal_fallback(spark, tmp_path):
    """When every optimistic announce replan loses on a lock-less
    backend, the terminal serialized pass is impossible — the typed
    error must name the contention, never a silent locked no-op."""
    root = str(tmp_path / "g")

    class AlwaysConflict(GenerationFSMetaBackend):
        def __init__(self, root):
            super().__init__(root)
            self.conflict_tables: set = set()

        def put_if(self, table_id, meta, expected_token):
            if table_id in self.conflict_tables:
                raise ConcurrentWriteError(f"{table_id}: injected rival")
            super().put_if(table_id, meta, expected_token)

    be = AlwaysConflict(root)
    cat = TableCatalog(root, backend=be)
    from change_data_capture_spark.apply import apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    apply_changelog(spark, snapshot_changelog(df, "t.x", ["id"]), cat)
    be.conflict_tables.add("t.x")
    with pytest.raises(QuiesceRequiredError, match="optimistic"):
        cat.announce_schema(
            "t.x",
            spark.createDataFrame([], "id long, v string, e string").schema.json(),
        )


def test_erasure_flow_works_on_genfs_backend(spark, tmp_path):
    """forget_keys end-to-end on the conditional-PUT-only backend:
    the hold stamps, the DELETE merge, vacuum's history prune, and the
    every-remaining-version proof all ride update_meta/put_if — no
    lock anywhere in the flow (drop_table and restore are the only
    quiesce-class operations; erasure is not one of them)."""
    from change_data_capture_spark.apply import apply_changelog, forget_keys
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    root = str(tmp_path / "g")
    cat = TableCatalog(root, backend=GenerationFSMetaBackend(root))
    df = spark.createDataFrame(
        [(i, f"u{i}@x") for i in range(10)], "id long, email string"
    )
    apply_changelog(spark, snapshot_changelog(df, "t.users", ["id"]), cat)
    # pre-erasure history so vacuum has real bytes to retire
    apply_changelog(
        spark,
        dml_records(
            spark.createDataFrame([(0, "v2@x")], "id long, email string"),
            "t.users", ["id"], op="UPDATE", version=2,
        ),
        cat,
    )
    keys = spark.createDataFrame([(3,), (7,)], "id long")
    rep = forget_keys(spark, cat, "t.users", keys)
    assert rep["rows_deleted"] == 2
    assert rep["versions_purged"] and rep["versions_verified"]
    assert cat.read(spark, "t.users").count() == 8
    assert "maintenance_hold" not in (cat.meta("t.users") or {})


def test_genfs_torn_tmp_never_surfaces(tmp_path):
    """Crash mid put_if (content tmp written+fsync'd, link never
    claimed): the torn tmp must be invisible to get/list, and the next
    conditional PUT proceeds normally — content-before-claim is the
    generation backend's torn-write discipline."""
    be = GenerationFSMetaBackend(str(tmp_path / "g"))
    be.put("t.a", {"n": 0})
    with open(os.path.join(be._tdir("t.a"), "crash123.gen.tmp"), "w") as f:
        f.write('{"n": 99}')  # the stranded tmp of a killed writer
    meta, tok = be.get("t.a")
    assert meta == {"n": 0}  # torn write invisible
    assert be.list_tables() == ["t.a"]
    be.put_if("t.a", {"n": 1}, tok)
    assert be.get("t.a")[0] == {"n": 1}


def test_genfs_cross_process_hammer_loses_nothing(tmp_path):
    """Threads share one interpreter; the real object-store analogy is
    SEPARATE PROCESSES racing conditional PUTs. 4 subprocesses x 10
    update_meta increments against one root — every increment must
    survive purely on the kernel's atomic link() claims (no flock, no
    shared memory, no GIL)."""
    import subprocess
    import sys

    root = str(tmp_path / "g")
    be = GenerationFSMetaBackend(root)
    be.put("t.a", {"n": 0})
    script = f"""
import sys
sys.path.insert(0, "/root/repo")
from change_data_capture_spark.apply import TableCatalog
from change_data_capture_spark.metastore import GenerationFSMetaBackend
cat = TableCatalog({root!r}, backend=GenerationFSMetaBackend({root!r}))
for _ in range(10):
    cat.update_meta("t.a", lambda m: {{**m, "n": m["n"] + 1}}, attempts=100000)
"""
    procs = [
        subprocess.Popen([sys.executable, "-c", script]) for _ in range(4)
    ]
    rcs = [p.wait(timeout=120) for p in procs]
    assert rcs == [0, 0, 0, 0]
    assert be.get("t.a")[0]["n"] == 40
