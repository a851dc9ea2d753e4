"""Model-based randomized check of the apply/MERGE engine.

A seeded random sequence of upserts/deletes over a small key space is
applied batch-by-batch through the full engine (envelope -> collapse ->
bucketed merge -> versioned write) and compared against a plain Python
dict model of the reference's semantics: last-writer-wins by change
version, DELETE removes by PK, replays are idempotent. This is the
property the reference's golden sink tests sample by hand
(CDCBigTablePluginIntegrationTest / CTSQLServerPluginIntegrationTest
:263-317), exercised here over hundreds of interleaved ops."""

import random

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.changelog import dml_records

N_KEYS = 12
N_BATCHES = 5
OPS_PER_BATCH = 40


def _gen_batches(seed: int):
    rng = random.Random(seed)
    version = 0
    batches = []
    for _ in range(N_BATCHES):
        ops = []
        for _ in range(OPS_PER_BATCH):
            version += 1
            key = rng.randrange(N_KEYS)
            if rng.random() < 0.25:
                ops.append((version, key, "DELETE", None))
            else:
                ops.append((version, key, "INSERT" if rng.random() < 0.5 else "UPDATE",
                            f"val{version}"))
        batches.append(ops)
    return batches


def _model_apply(model: dict, ops) -> None:
    # engine semantics: per-key last-writer-wins inside a batch (highest
    # version), then the surviving op applies
    last = {}
    for version, key, op, val in ops:
        if key not in last or version > last[key][0]:
            last[key] = (version, op, val)
    for key, (version, op, val) in last.items():
        if op == "DELETE":
            model.pop(key, None)
        else:
            model[key] = val


def _batch_changelog(spark, ops):
    rows = [(v, k, op, val) for v, k, op, val in ops]
    df = spark.createDataFrame(rows, "__ver long, id long, __op string, v string")
    ups = dml_records(
        df.filter(F.col("__op") != "DELETE").select("id", "v", "__op", "__ver"),
        "t.model", ["id"], op=F.col("__op"), version=F.col("__ver"),
    )
    # (helper columns __op/__ver ride along in rows_values for the
    # upserts; decode uses the registered table schema, so extras are
    # ignored — keys_only already limits the deletes to the PK)
    dels = dml_records(
        df.filter(F.col("__op") == "DELETE").select("id", "__op", "__ver"),
        "t.model", ["id"], op=F.col("__op"), version=F.col("__ver"), keys_only=True,
    )
    return ups.unionByName(dels)


def test_apply_matches_python_model(spark, tmp_path):
    batches = _gen_batches(seed=7)
    cat = TableCatalog(str(tmp_path / "cat"))
    model: dict = {}

    # seed the table so the schema is (id, v) without helper columns
    seed_df = spark.createDataFrame([(999, "seed", "INSERT", 0)],
                                    "id long, v string, __op string, __ver long")
    apply_changelog(
        spark,
        dml_records(seed_df.select("id", "v"), "t.model", ["id"], op="INSERT", version=0),
        cat,
    )
    model[999] = "seed"

    for i, ops in enumerate(batches):
        apply_changelog(spark, _batch_changelog(spark, ops), cat)
        _model_apply(model, ops)
        if i == 2:  # at-least-once: replay the same batch verbatim
            apply_changelog(spark, _batch_changelog(spark, ops), cat)
        got = {r["id"]: r["v"] for r in cat.read(spark, "t.model").collect()}
        assert got == model, f"divergence after batch {i}: {got} != {model}"


def test_bootstrap_replica_from_any_version_matches_current(spark, tmp_path):
    """Property: for a randomized mutation history, a replica
    bootstrapped from ANY published snapshot version + the source's
    own change feed always converges to the source's current state —
    the no-gap / no-overlap contract of the initial-load handoff."""
    from change_data_capture_spark.apply import bootstrap_replica

    batches = _gen_batches(seed=23)
    cat = TableCatalog(str(tmp_path / "src"))
    seed_df = spark.createDataFrame([(999, "seed")], "id long, v string")
    apply_changelog(
        spark,
        dml_records(seed_df, "t.model", ["id"], op="INSERT", version=0),
        cat,
    )
    for ops in batches:
        apply_changelog(spark, _batch_changelog(spark, ops), cat)

    want = sorted(tuple(r) for r in cat.read(spark, "t.model").collect())
    published = cat.versions("t.model")
    assert len(published) >= 3
    for i, v in enumerate([published[0], published[len(published) // 2], published[-1]]):
        replica = TableCatalog(str(tmp_path / f"rep{i}"))
        out = bootstrap_replica(spark, cat, "t.model", replica, snapshot_version=v)
        assert sorted(tuple(r) for r in out.collect()) == want, f"from v{v}"


def test_apply_matches_model_with_interleaved_maintenance(spark, tmp_path):
    """Same randomized stream, but a maintenance pass (compact to a NEW
    bucket count, then vacuum) runs between batches: re-bucketing must
    be invisible to the merge — the next batch's touched-bucket arms
    and pruned reads recompute against the republished layout (r7: the
    interleave class the concurrency contract governs, exercised
    sequentially so divergence is deterministic)."""
    batches = _gen_batches(seed=41)
    cat = TableCatalog(str(tmp_path / "cat"))
    model: dict = {}
    seed_df = spark.createDataFrame([(999, "seed")], "id long, v string")
    apply_changelog(
        spark,
        dml_records(seed_df, "t.model", ["id"], op="INSERT", version=0),
        cat,
    )
    model[999] = "seed"
    buckets = [4, 32, 8, 16]
    for i, ops in enumerate(batches):
        apply_changelog(spark, _batch_changelog(spark, ops), cat)
        _model_apply(model, ops)
        cat.compact(spark, "t.model", n_buckets=buckets[i % len(buckets)])
        cat.vacuum("t.model", keep_last=2)
        got = {r["id"]: r["v"] for r in cat.read(spark, "t.model").collect()}
        assert got == model, f"divergence after batch {i}: {got} != {model}"


def test_apply_matches_model_with_replay_floor_second_leg(spark, tmp_path):
    """Randomized two-leg property (r7 review regression class): leg 1
    applies a batch and advances the stored watermark to its max; leg 2
    carries per-key rows at versions INTERLEAVED below that max but
    above the pre-leg-1 floor, applied with replay_floor. Engine
    semantics: every leg-2 row re-opened by the floor replaces the
    stored row (per-table watermark, not per-key) — exactly the Mongo
    patch-merge contract. The model mirrors that."""
    rng = random.Random(97)
    cat = TableCatalog(str(tmp_path / "cat"))
    model: dict = {}
    t = "t.model"
    seed_df = spark.createDataFrame([(999, "seed")], "id long, v string")
    apply_changelog(
        spark, dml_records(seed_df, "t.model", ["id"], op="INSERT", version=0), cat
    )
    model[999] = "seed"
    version = 0
    for round_i in range(3):
        floor = int(cat.meta(t).get("applied_version", 0))
        # leg 1: normal ops at fresh versions
        ops1 = []
        for _ in range(30):
            version += 2  # leave odd gaps for leg 2 to land in
            key = rng.randrange(N_KEYS)
            if rng.random() < 0.2:
                ops1.append((version, key, "DELETE", None))
            else:
                ops1.append((version, key, "UPDATE", f"v{version}"))
        apply_changelog(spark, _batch_changelog(spark, ops1), cat)
        _model_apply(model, ops1)
        # leg 2: rows at versions BELOW the new stored watermark but
        # above the pre-leg floor (the odd gaps), applied with the floor
        ops2 = []
        used = set()
        for _ in range(10):
            v2 = rng.randrange(floor + 1, version) | 1  # odd -> unused by leg 1
            if v2 in used:
                continue
            used.add(v2)
            ops2.append((v2, rng.randrange(N_KEYS), "UPDATE", f"patch{v2}"))
        if not ops2:
            continue
        from change_data_capture_spark.apply import apply_changes

        apply_changes(spark, _batch_changelog(spark, ops2), cat, replay_floor={t: floor})
        _model_apply(model, ops2)
        got = {r["id"]: r["v"] for r in cat.read(spark, t).collect()}
        assert got == model, f"divergence in round {round_i}: {got} != {model}"


def test_bucketed_collapse_equals_plain_collapse(spark):
    """collapse_last_writer_bucketed (the single-exchange create path)
    must pick exactly the winners of collapse_last_writer and stamp
    each with the write-path bucket expression — randomized over
    duplicate keys, version ties, op tie-breaks, and non-canonical key
    spellings ('007' vs '7')."""
    from pyspark.sql import functions as F

    from change_data_capture_spark.apply import (
        bucket_expr,
        collapse_last_writer,
        collapse_last_writer_bucketed,
        pk_value_of,
    )
    from change_data_capture_spark.changelog import dml_records

    rng = random.Random(13)
    # one payload per (typed key, version, op): an exact tie on the
    # max_by ordering key is resolved arbitrarily, and the two
    # implementations may legitimately pick different winners — the
    # equivalence under test is about everything BUT that tie.
    by_combo: dict = {}
    for _ in range(300):
        key = rng.randrange(20)
        spelled = str(key) if rng.random() < 0.7 else f"00{key}"
        combo = (key, rng.randrange(1, 12), rng.choice(["INSERT", "UPDATE", "DELETE"]))
        by_combo.setdefault(combo, (spelled, f"v{len(by_combo)}", combo[2], combo[1]))
    rows = list(by_combo.values())
    df = spark.createDataFrame(rows, "id string, v string, __op string, __ver long")
    log = dml_records(
        df, "t.x", ["id"], op=F.col("__op"), version=F.col("__ver"),
        value_cols=["id", "v"],
    )
    dml = log.filter(F.col("dml").isNotNull()).select("dml.*")
    schema = spark.createDataFrame([(1, "a")], "id long, v string").schema
    vo = pk_value_of(schema)

    plain = collapse_last_writer(dml, ["id"], value_of=vo)
    plain_with_bucket = plain.withColumn(
        "__bucket", bucket_expr(["id"], 16, value_of=vo)
    )
    bucketed = collapse_last_writer_bucketed(dml, ["id"], 16, value_of=vo)

    def canon(frame):
        return sorted(
            (r["rows_values"]["id"], r["rows_values"]["v"], r["op_type"],
             r["change_tracking_version"], r["__bucket"])
            for r in frame.collect()
        )

    a, b = canon(plain_with_bucket), canon(bucketed)
    assert a == b
    # the version winner is unique per TYPED key even when ops tie
    typed_keys = {int(r[0]) for r in a}
    assert len(a) == len(typed_keys)


def test_apply_matches_model_under_randomized_evolution(spark, tmp_path):
    """Randomized schema-evolution property over the r7 machinery:
    rounds interleave {add column, drop column, re-add a dropped
    column, unsafe re-type (string->long, long->double)} with upsert
    batches, all through announce_schema(spark=...) and the normal
    apply. The Python model mirrors the engine's observable contract:
    a dropped column's values are GONE (re-add yields nulls — the
    tombstone purge), a re-type casts surviving values, reads show
    exactly the registered columns."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    TYPES = {"string": StringType(), "long": LongType(), "double": DoubleType()}
    RETYPE = {"string": "long", "long": "double"}  # probed-unsafe changes

    def spark_schema(cols):
        return StructType(
            [StructField("id", LongType()), *[
                StructField(n, TYPES[t]) for n, t in sorted(cols.items())
            ]]
        )

    def cast_val(v, t):
        if v is None:
            return None
        if t == "string":
            return str(v)
        if t == "long":
            return int(float(v))
        return float(v)

    rng = random.Random(71)
    cat = TableCatalog(str(tmp_path / "cat"))
    t = "db.evo"
    cols = {"a": "string"}          # registered non-pk columns: name -> type
    dropped: set = set()
    model: dict = {}                # key -> {col: typed value}
    version = 0

    # create with the initial schema
    df0 = spark.createDataFrame([(999, "seed")], spark_schema(cols))
    apply_changelog(spark, dml_records(df0, t, ["id"], version=0), cat)
    model[999] = {"a": "seed"}

    for rnd in range(6):
        op = rng.choice(["add", "drop", "readd", "retype", "none"])
        if op == "add" and len(cols) < 4:
            name = f"c{rnd}"
            cols[name] = rng.choice(list(TYPES))
            for vals in model.values():
                vals.setdefault(name, None)
        elif op == "drop" and len(cols) > 1:
            name = rng.choice(sorted(cols))
            dropped.add(name)
            del cols[name]
            for vals in model.values():
                vals.pop(name, None)  # purge-on-readd => observably gone
        elif op == "readd" and dropped:
            name = rng.choice(sorted(dropped))
            dropped.discard(name)
            cols[name] = rng.choice(list(TYPES))
            for vals in model.values():
                vals[name] = None
        elif op == "retype":
            name = rng.choice(sorted(cols))
            if cols[name] in RETYPE:
                new_t = RETYPE[cols[name]]
                cols[name] = new_t
                for vals in model.values():
                    vals[name] = cast_val(vals.get(name), new_t)
        if op != "none":
            cat.announce_schema(t, spark_schema(cols).json(), spark=spark)

        # a batch of typed upserts under the current schema
        rows = []
        for _ in range(8):
            version += 1
            key = rng.randrange(8)
            vals = {n: cast_val(rng.randrange(100), typ) for n, typ in cols.items()}
            rows.append((version, key, vals))
        data = [
            tuple([key] + [vals[n] for n in sorted(cols)]) for _, key, vals in rows
        ]
        vdf = spark.createDataFrame(
            [(v, *d) for (v, _, _), d in zip(rows, data)],
            StructType([StructField("__ver", LongType()),
                        *spark_schema(cols).fields]),
        )
        log = dml_records(
            vdf, t, ["id"], version=F.col("__ver"),
            value_cols=["id", *sorted(cols)],
        )
        apply_changelog(spark, log, cat)
        last = {}
        for v, key, vals in rows:
            if key not in last or v > last[key][0]:
                last[key] = (v, vals)
        for key, (_, vals) in last.items():
            model[key] = dict(vals)

        got = {
            r["id"]: {n: r[n] for n in sorted(cols)}
            for r in cat.read(spark, t).collect()
        }
        want = {k: {n: vals.get(n) for n in sorted(cols)} for k, vals in model.items()}
        assert got == want, f"divergence after round {rnd} (op={op})"


# ---------------------------------------------------------------------------
# r8 crash-consistency matrix (VERDICT r7 directive #6): injected kill
# points around every publish path must leave either old-version or
# new-version state — never a torn read — and the next run must heal.
# ---------------------------------------------------------------------------


def _mk(spark, tmp_path, name="t.c", versions=3):
    from change_data_capture_spark.changelog import snapshot_changelog

    cat = TableCatalog(str(tmp_path / "crash"))
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, val string"
    )
    apply_changelog(spark, snapshot_changelog(base, name, ["id"]), cat)
    for v in range(2, versions + 1):
        upd = dml_records(
            base.limit(3), name, ["id"], op="UPDATE", version=v,
            value_overrides={"val": F.concat(F.lit(f"u{v}_"), F.col("val"))},
        )
        apply_changelog(spark, upd, cat)
    return cat, name


def test_crash_between_data_write_and_meta_publish_reads_old_state(
    spark, tmp_path, monkeypatch
):
    """Kill injected INSIDE write_new_version after the parquet write,
    before put_meta: readers see the OLD version exactly; the orphan
    dir is not a version; the retried batch self-heals by overwriting
    the orphan seq."""
    cat, t = _mk(spark, tmp_path)
    before_rows = sorted(map(tuple, cat.read(spark, t).collect()))
    before_versions = cat.versions(t)
    # the commit swap goes through the backend's put_if since r10 —
    # inject the power loss at that layer
    real_put_if = type(cat.backend).put_if
    boom = {"armed": True}

    def exploding_put_if(be, tid, meta, tok):
        if boom["armed"]:
            boom["armed"] = False
            raise OSError("injected: power loss before meta publish")
        return real_put_if(be, tid, meta, tok)

    upd = dml_records(
        spark.createDataFrame([(1, "post-crash")], "id long, val string"),
        t, ["id"], op="UPDATE", version=50,
    )
    monkeypatch.setattr(type(cat.backend), "put_if", exploding_put_if)
    import pytest
    with pytest.raises(OSError, match="injected"):
        apply_changelog(spark, upd, cat)
    # old-version state, exactly
    assert cat.versions(t) == before_versions
    assert sorted(map(tuple, cat.read(spark, t).collect())) == before_rows
    # retry (at-least-once redelivery) heals: overwrites the orphan seq
    apply_changelog(spark, upd, cat)
    got = {r.id: r.val for r in cat.read(spark, t).collect()}
    assert got[1] == "post-crash"
    assert len(cat.versions(t)) == len(before_versions) + 1


def test_crash_between_vacuum_deletes_and_meta_cleanup_self_heals(
    spark, tmp_path, monkeypatch
):
    """Kill injected between vacuum's directory deletes and its
    history cleanup: the dangling version_watermarks/version_schemas
    entries must never wedge the AS-OF cut (read path intersects the
    readable set), and the NEXT vacuum — even a non-reclaiming one —
    prunes them."""
    cat, t = _mk(spark, tmp_path, versions=4)
    hist_before = dict(cat.meta(t)["version_watermarks"])
    assert len(hist_before) == 4
    # the history cleanup rides update_meta -> backend.put_if since
    # r10 — inject the power loss at that layer
    real_put_if = type(cat.backend).put_if
    boom = {"armed": True}

    def exploding_put_if(be, tid, meta, tok):
        if boom["armed"]:
            boom["armed"] = False
            raise OSError("injected: power loss before history cleanup")
        return real_put_if(be, tid, meta, tok)

    monkeypatch.setattr(type(cat.backend), "put_if", exploding_put_if)
    import pytest
    with pytest.raises(OSError, match="injected"):
        cat.vacuum(t, keep_last=1)
    monkeypatch.setattr(type(cat.backend), "put_if", real_put_if)
    # dirs are gone but the history still names them — the torn state
    assert len(cat.versions(t)) == 1
    assert len(cat.meta(t)["version_watermarks"]) == 4
    # read path self-heals: the cut never selects an unreadable version
    cut = cat.version_at_watermark(t, watermark=10**9)
    assert cut == cat.versions(t)[-1]
    cat.read_asof_watermark(spark, t, 10**9).collect()
    # a non-reclaiming vacuum prunes the dangling entries
    assert cat.vacuum(t, keep_last=1) == []
    assert set(cat.meta(t)["version_watermarks"]) == {
        str(v) for v in cat.versions(t)
    }


def test_crash_between_compact_and_vacuum_converges_on_rerun(spark, tmp_path):
    """auto_maintain killed after its compact but before its vacuum
    leaves a consistent (just unreclaimed) catalog; the next scheduled
    run converges."""
    from change_data_capture_spark.apply import auto_maintain

    cat, t = _mk(spark, tmp_path, versions=3)
    rows_before = sorted(map(tuple, cat.read(spark, t).collect()))
    cat.compact(spark, t)  # the "crashed" maintenance run got this far
    assert sorted(map(tuple, cat.read(spark, t).collect())) == rows_before
    auto_maintain(spark, cat, keep_last=1)
    assert sorted(map(tuple, cat.read(spark, t).collect())) == rows_before
    assert len(cat.versions(t)) == 1


def test_crash_inside_put_meta_leaves_old_pointer(spark, tmp_path, monkeypatch):
    """Kill inside put_meta AFTER the temp write, BEFORE the atomic
    rename: the meta pointer is the old one, readers are unaffected,
    and the stranded .meta.tmp never shadows the real file."""
    import os as _os

    cat, t = _mk(spark, tmp_path)
    meta_before = cat.meta(t)
    real_replace = _os.replace
    boom = {"armed": True}

    def exploding_replace(src, dst):
        if boom["armed"] and dst.endswith("_meta.json"):
            boom["armed"] = False
            raise OSError("injected: power loss before rename")
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", exploding_replace)
    import pytest
    tampered = dict(meta_before, applied_version=999)
    with pytest.raises(OSError, match="injected"):
        cat.put_meta(t, tampered)
    monkeypatch.setattr(_os, "replace", real_replace)
    assert cat.meta(t) == meta_before
    cat.read(spark, t).collect()
    # and a later put works over the stranded tmp
    cat.put_meta(t, tampered)
    assert cat.meta(t)["applied_version"] == 999


def test_crash_mid_erasure_rerun_completes(spark, tmp_path, monkeypatch):
    """forget_keys killed after its DELETE batch but before its vacuum
    (history still holds the rows): the re-run completes the erasure
    and the verification passes."""
    from change_data_capture_spark.apply import forget_keys

    cat, t = _mk(spark, tmp_path)
    keys = spark.createDataFrame([(3,), (7,)], "id long")
    real_vac = TableCatalog.vacuum
    boom = {"armed": True}

    def exploding_vacuum(self, tid, keep_last=2, protect_from=None):
        if boom["armed"]:
            boom["armed"] = False
            raise OSError("injected: power loss before erasure vacuum")
        return real_vac(self, tid, keep_last=keep_last, protect_from=protect_from)

    monkeypatch.setattr(TableCatalog, "vacuum", exploding_vacuum)
    import pytest
    with pytest.raises(OSError, match="injected"):
        forget_keys(spark, cat, t, keys)
    monkeypatch.setattr(TableCatalog, "vacuum", real_vac)
    # current state already lacks the keys, but history still has them
    assert cat.read(spark, t).filter(F.col("id").isin(3, 7)).count() == 0
    rep = forget_keys(spark, cat, t, keys)  # idempotent completion
    assert rep["rows_deleted"] == 0
    for v in cat.versions(t):
        assert (
            cat.read(spark, t, version=v).filter(F.col("id").isin(3, 7)).count()
            == 0
        )


def test_apply_vs_apply_cas_retry_lands_both_batches(spark, tmp_path, monkeypatch):
    """r8: the CAS-retry loop's OTHER first-class interleaving — apply
    racing a CONCURRENT APPLY on the same table (not maintenance). A
    competing writer publishes between this apply's merge computation
    and its publish: the CAS must refuse the stale publish, and the
    retry (fast=False, fresh meta) must land ON TOP of the competitor
    — both batches visible, no lost update, no duplicate."""
    cat, t = _mk(spark, tmp_path, versions=1)
    batch_mine = dml_records(
        spark.createDataFrame([(1, "mine")], "id long, val string"),
        t, ["id"], op="UPDATE", version=20,
    )
    batch_theirs = dml_records(
        spark.createDataFrame([(2, "theirs")], "id long, val string"),
        t, ["id"], op="UPDATE", version=10,
    )
    real = TableCatalog.write_new_version
    state = {"injected": False}

    def racing(self, table_id, df, *a, **kw):
        if not state["injected"] and table_id == t:
            state["injected"] = True
            competitor = TableCatalog(self.root)
            apply_changelog(spark, batch_theirs, competitor)
        return real(self, table_id, df, *a, **kw)

    monkeypatch.setattr(TableCatalog, "write_new_version", racing)
    apply_changelog(spark, batch_mine, cat)
    got = {r.id: r.val for r in cat.read(spark, t).collect()}
    assert got[1] == "mine" and got[2] == "theirs"
    assert int(cat.meta(t)["applied_version"]) == 20
    # every other row untouched
    assert len(got) == 20


def test_meta_lock_reentrant_and_mutually_exclusive(tmp_path):
    """r8: the per-table meta lock is reentrant within one thread
    (announce -> physical-rewrite publish re-enters), mutually
    exclusive across threads AND across TableCatalog instances on the
    same root (flock is on the file, not the object), and per-table
    (different tables never contend)."""
    import threading
    import time

    from change_data_capture_spark.apply import TableCatalog

    cat_a = TableCatalog(str(tmp_path / "c"))
    cat_b = TableCatalog(str(tmp_path / "c"))  # second handle, same root

    # reentrancy
    with cat_a._meta_lock("t.x"):
        with cat_a._meta_lock("t.x"):
            pass  # no deadlock

    # cross-instance exclusion
    order: list[str] = []
    entered = threading.Event()
    release = threading.Event()

    def holder():
        with cat_a._meta_lock("t.x"):
            order.append("a-in")
            entered.set()
            release.wait(timeout=10)
            order.append("a-out")

    def waiter():
        entered.wait(timeout=10)
        t0 = time.time()
        with cat_b._meta_lock("t.x"):
            order.append("b-in")
        assert time.time() - t0 >= 0.15  # it actually waited

    ta = threading.Thread(target=holder)
    tb = threading.Thread(target=waiter)
    ta.start()
    tb.start()
    entered.wait(timeout=10)
    time.sleep(0.2)
    assert order == ["a-in"]  # b is blocked
    release.set()
    ta.join(timeout=10)
    tb.join(timeout=10)
    assert order == ["a-in", "a-out", "b-in"]

    # different tables never contend
    with cat_a._meta_lock("t.x"):
        done = []

        def other():
            with cat_b._meta_lock("t.y"):
                done.append(True)

        t = threading.Thread(target=other)
        t.start()
        t.join(timeout=5)
        assert done == [True]


@pytest.mark.parametrize("backend_kind", ["local", "genfs"])
def test_concurrent_apply_and_announce_hammer_loses_nothing(
    spark, tmp_path, backend_kind
):
    """r8 meta-lock end-to-end: one thread streams apply batches while
    another streams metadata-only schema evolutions on the SAME table.
    Pre-lock, an announce's read-put could silently un-publish a
    concurrent version (the documented filesystem-CAS revert window).
    Post-hammer invariants: every batch's rows landed at their final
    values, the registered schema is the last announcement's, and
    every published version has a watermark-history entry.

    Parameterized over BOTH concrete backends (r10 directive #3): the
    flock backend serializes under the lock; the conditional-PUT-only
    ``GenerationFSMetaBackend`` has a NO-OP lock, so the same hammer
    proves the put_if-threaded commit/announce paths are exact with no
    lock at all — the object-store deployment story, run for real."""
    import threading

    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.schema import schema_from_json

    base = spark.createDataFrame([(i, f"v0_{i}") for i in range(8)],
                                 "id long, val string")
    root = str(tmp_path / "h")
    if backend_kind == "genfs":
        from change_data_capture_spark.metastore import GenerationFSMetaBackend

        cat = TableCatalog(root, backend=GenerationFSMetaBackend(root))
    else:
        cat = TableCatalog(root)
    apply_changelog(spark, snapshot_changelog(base, "h.t", ["id"]), cat)

    N_BATCHES, N_DDL = 6, 6
    errors: list[BaseException] = []

    def applier():
        try:
            for b in range(1, N_BATCHES + 1):
                upd = dml_records(
                    spark.createDataFrame([(b % 8, f"b{b}")],
                                          "id long, val string"),
                    "h.t", ["id"], op="UPDATE", version=10 + b,
                )
                apply_changelog(spark, upd, cat)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    def announcer():
        try:
            cols = "id long, val string"
            for d in range(1, N_DDL + 1):
                cols += f", extra{d} string"
                cat.announce_schema(
                    "h.t", spark.createDataFrame([], cols).schema.json(),
                    spark=spark,
                )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    ta = threading.Thread(target=applier)
    tb = threading.Thread(target=announcer)
    ta.start(); tb.start()
    ta.join(timeout=300); tb.join(timeout=300)
    assert not errors, errors

    meta = cat.meta("h.t")
    # the last announcement's schema won (no reverted evolution)
    names = [f.name for f in schema_from_json(meta["schema"]).fields]
    assert names == ["id", "val"] + [f"extra{d}" for d in range(1, N_DDL + 1)]
    # no lost update: the final batch per key is visible
    got = {r.id: r.val for r in cat.read(spark, "h.t").collect()}
    assert got[N_BATCHES % 8] == f"b{N_BATCHES}"
    assert int(meta["applied_version"]) == 10 + N_BATCHES
    # every published version has a watermark-history entry (a revert
    # would have dropped one)
    hist = meta.get("version_watermarks") or {}
    for v in cat.versions("h.t"):
        assert str(v) in hist, (v, sorted(hist))


@pytest.mark.parametrize("backend_kind", ["local", "genfs"])
def test_apply_matches_model_with_interleaved_erasure(
    spark, tmp_path, backend_kind
):
    """Randomized property over the r8/r9 erasure machinery: rounds
    interleave upsert batches, forget_keys erasures (keep_last=1),
    auto_maintain passes, compactions, and REPLAYS of previously
    applied batches. The Python model mirrors the observable contract:
    erased keys are gone from every remaining version (forget's own
    proof leg raises otherwise), a replay of any pre-erasure batch is
    fully watermark-suppressed (the erasure DELETE stamps above every
    prior version, so erased rows can never resurrect through
    at-least-once redelivery), and a genuinely NEW batch may lawfully
    re-insert an erased key (erasure is not a tombstone against future
    consent)."""
    import random as _random

    from change_data_capture_spark.apply import auto_maintain, forget_keys
    from change_data_capture_spark.changelog import snapshot_changelog

    rng = _random.Random(92)
    root = str(tmp_path / "erm")
    if backend_kind == "genfs":
        # r10: the full erasure/maintenance/replay interleaving on the
        # conditional-PUT-only backend — holds, vacuum's history prune,
        # the proof legs, all with lock() a no-op
        from change_data_capture_spark.metastore import GenerationFSMetaBackend

        cat = TableCatalog(root, backend=GenerationFSMetaBackend(root))
    else:
        cat = TableCatalog(root)
    t = "db.erase"
    base = spark.createDataFrame(
        [(i, f"v0_{i}") for i in range(12)], "id long, val string"
    )
    apply_changelog(spark, snapshot_changelog(base, t, ["id"]), cat)
    model = {i: f"v0_{i}" for i in range(12)}
    version = 1
    applied_batches: list = []  # (version, rows) for replay rounds

    for rnd in range(10):
        op = rng.choice(["batch", "batch", "erase", "maintain", "compact", "replay"])
        if op == "batch":
            version += 1
            rows = [(rng.randrange(16), f"r{rnd}_{j}") for j in range(4)]
            df = spark.createDataFrame(rows, "id long, val string")
            log = dml_records(df, t, ["id"], op="UPDATE", version=version)
            apply_changelog(spark, log, cat)
            applied_batches.append((version, rows))
            last = {}
            for k, v in rows:
                last[k] = v  # dml_records rows share one version; last write
            model.update(last)
        elif op == "erase":
            doomed = sorted(rng.sample(range(16), 3))
            keys = spark.createDataFrame([(k,) for k in doomed], "id long")
            rep = forget_keys(spark, cat, t, keys, keep_last=1)
            for k in doomed:
                model.pop(k, None)
            assert len(rep["versions_verified"]) == 1
            version += 1  # the DELETE stamped applied+1
        elif op == "maintain":
            auto_maintain(spark, cat, keep_last=2)
        elif op == "compact":
            cat.compact(spark, t)
        elif op == "replay" and applied_batches:
            v, rows = rng.choice(applied_batches)
            df = spark.createDataFrame(rows, "id long, val string")
            apply_changelog(
                spark, dml_records(df, t, ["id"], op="UPDATE", version=v), cat
            )
            # watermark suppression: NOTHING changes — in particular no
            # erased key resurrects (the model is not updated)
        got = {r["id"]: r["val"] for r in cat.read(spark, t).collect()}
        assert got == model, f"divergence after round {rnd} (op={op})"
    # final: erased keys absent from EVERY remaining readable version
    for v in cat.versions(t):
        ids = {r["id"] for r in cat.read(spark, t, version=v).collect()}
        assert ids <= (set(model) | set()), f"version {v} serves unmodeled keys"
