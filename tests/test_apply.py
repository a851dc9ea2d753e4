"""Apply/MERGE engine tests — mirror the reference's golden sink tests
(CDCBigTablePluginIntegrationTest: DDL creates table, inserts land,
update overwrites, insert+delete removes; CDCKudu deferred-create and
schema-evolution semantics)."""

import json

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog, apply_changes
from change_data_capture_spark.changelog import (
    ddl_record,
    dml_records,
    mutation_changelog,
    snapshot_changelog,
)
from conftest import load


def sorted_rows(df, *keys):
    return [tuple(r) for r in df.orderBy(*keys).collect()]


def test_snapshot_roundtrip(spark, sf_dir, tmp_path):
    nation = load(spark, sf_dir, "nation")
    log = snapshot_changelog(nation, "tpch.nation", ["n_nationkey"])
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, log, cat)
    got = cat.read(spark, "tpch.nation")
    assert sorted_rows(got, "n_nationkey") == sorted_rows(nation, "n_nationkey")
    assert [f.name for f in got.schema.fields] == nation.columns


def test_composite_pk_snapshot(spark, sf_dir, tmp_path):
    # The synthetic lineitem has duplicate (l_orderkey, l_linenumber)
    # pairs; a keyed store collapses them (last-writer-wins), so feed a
    # deduped snapshot and expect an exact roundtrip on the composite key.
    li = (
        load(spark, sf_dir, "lineitem")
        .dropDuplicates(["l_orderkey", "l_linenumber"])
        .limit(500)
    )
    li = li.persist()
    log = snapshot_changelog(li, "tpch.lineitem", ["l_orderkey", "l_linenumber"])
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, log, cat)
    got = cat.read(spark, "tpch.lineitem")
    assert got.count() == li.count()
    li.unpersist()


def test_update_overwrites_and_delete_removes(spark, sf_dir, tmp_path):
    cust = load(spark, sf_dir, "customer")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(cust, "tpch.customer", ["c_custkey"]), cat)

    mut = mutation_changelog(
        cust,
        "tpch.customer",
        ["c_custkey"],
        update_where=F.col("c_custkey") % 7 == 3,
        update_set={"c_acctbal": F.col("c_acctbal") + 100.0},
        update_version=2,
        delete_where=F.col("c_custkey") % 7 == 5,
        delete_version=3,
    )
    apply_changelog(spark, mut, cat)
    got = cat.read(spark, "tpch.customer")

    exp = (
        cust.withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 7 == 3, F.col("c_acctbal") + 100.0).otherwise(
                F.col("c_acctbal")
            ),
        )
        .filter(F.col("c_custkey") % 7 != 5)
    )
    assert sorted_rows(got, "c_custkey") == sorted_rows(exp, "c_custkey")


def test_last_writer_wins_within_batch(spark, tmp_path):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    cat = TableCatalog(str(tmp_path / "cat"))
    # Net-change semantics: insert then two updates to the same key in
    # ONE batch -> final values only (CTSQLServerPluginIntegrationTest
    # :263-292 — CT returns the net row).
    ins = dml_records(base, "t.x", ["id"], op="INSERT", version=1)
    up1 = dml_records(
        base.filter("id = 1"), "t.x", ["id"], op="UPDATE", version=2,
        value_overrides={"v": F.lit("mid")},
    )
    up2 = dml_records(
        base.filter("id = 1"), "t.x", ["id"], op="UPDATE", version=3,
        value_overrides={"v": F.lit("final")},
    )
    log = ins.unionByName(up1).unionByName(up2)
    apply_changelog(spark, log, cat)
    got = {r["id"]: r["v"] for r in cat.read(spark, "t.x").collect()}
    assert got == {1: "final", 2: "b"}


def test_idempotent_replay(spark, tmp_path):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    cat = TableCatalog(str(tmp_path / "cat"))
    log = snapshot_changelog(base, "t.x", ["id"])
    apply_changelog(spark, log, cat)
    apply_changelog(spark, log, cat)  # at-least-once replay
    assert cat.read(spark, "t.x").count() == 2
    assert cat.meta("t.x")["applied_version"] == 1


def test_deferred_create_until_first_dml(spark, tmp_path):
    # DDL alone must NOT create the table (no PKs yet) — CDCKudu.java:80-85.
    cat = TableCatalog(str(tmp_path / "cat"))
    schema_json = spark.createDataFrame([(1, "a")], "id bigint, v string").schema.json()
    apply_changelog(spark, ddl_record(spark, "t.x", schema_json), cat)
    assert cat.meta("t.x")["schema"] is None
    assert cat.meta("t.x")["pending_schema"] == schema_json

    base = spark.createDataFrame([(1, "a")], "id bigint, v string")
    apply_changelog(spark, dml_records(base, "t.x", ["id"], version=2), cat)
    meta = cat.meta("t.x")
    assert meta["schema"] == schema_json and meta["pks"] == ["id"]
    assert cat.read(spark, "t.x").count() == 1


def test_schema_evolution_add_and_drop(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    apply_changelog(spark, snapshot_changelog(v1, "t.x", ["id"]), cat)

    # evolve: drop v, add w (set-difference alter, CDCKudu.java:78-137)
    v2_schema = spark.createDataFrame([(1, 9)], "id bigint, w int").schema
    apply_changelog(spark, ddl_record(spark, "t.x", v2_schema.json()), cat)
    got = cat.read(spark, "t.x")
    assert [f.name for f in got.schema.fields] == ["id", "w"]
    assert {r["w"] for r in got.collect()} == {None}  # added col null-filled

    # new-schema DML upserts
    v2 = spark.createDataFrame([(1, 42)], "id bigint, w int")
    apply_changelog(spark, dml_records(v2, "t.x", ["id"], op="UPDATE", version=5), cat)
    rows = {r["id"]: r["w"] for r in cat.read(spark, "t.x").collect()}
    assert rows == {1: 42, 2: None}


def test_delete_carries_keys_only(spark, tmp_path):
    base = spark.createDataFrame([(1, "a")], "id bigint, v string")
    log = dml_records(base, "t.x", ["id"], op="DELETE", version=9, keys_only=True)
    row = log.select("dml.rows_values").collect()[0][0]
    assert row == {"id": "1"}  # non-key columns absent/null


def test_multi_table_batch(spark, sf_dir, tmp_path):
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    log = snapshot_changelog(region, "tpch.region", ["r_regionkey"]).unionByName(
        snapshot_changelog(nation, "tpch.nation", ["n_nationkey"])
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, log, cat)
    assert cat.read(spark, "tpch.region").count() == region.count()
    assert cat.read(spark, "tpch.nation").count() == nation.count()
    assert cat.tables() == ["tpch.nation", "tpch.region"]


def test_two_table_snapshot_batch_matches_sequential_and_costs_fewer_actions(
    spark, sf_dir, tmp_path
):
    """r11: several registry builders merged same-step independent-table
    snapshot applies into ONE batch. Pin the contract that makes the
    merge a pure optimization: identical per-table end state (rows AND
    version trail) with strictly fewer Spark actions than the
    sequential form."""
    from change_data_capture_spark.planaudit import ExecutedPlanCollector

    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    log_r = snapshot_changelog(region, "tpch.region", ["r_regionkey"])
    log_n = snapshot_changelog(nation, "tpch.nation", ["n_nationkey"])

    seq = TableCatalog(str(tmp_path / "seq"))
    with ExecutedPlanCollector(spark) as col:
        col.drain(); col.clear()
        apply_changelog(spark, log_r, seq)
        apply_changelog(spark, log_n, seq)
        n_seq = len(col.drain())

    merged = TableCatalog(str(tmp_path / "merged"))
    with ExecutedPlanCollector(spark) as col:
        col.drain(); col.clear()
        apply_changelog(spark, log_r.unionByName(log_n), merged)
        n_merged = len(col.drain())

    for t, key in (("tpch.region", "r_regionkey"), ("tpch.nation", "n_nationkey")):
        a = sorted(map(tuple, seq.read(spark, t).collect()))
        b = sorted(map(tuple, merged.read(spark, t).collect()))
        assert a == b, t
        assert seq.versions(t) == merged.versions(t), t
    assert n_merged < n_seq, (n_merged, n_seq)


def test_unchanged_buckets_are_file_reused(spark, sf_dir, tmp_path):
    """A small mutation batch must rewrite only the touched PK-hash
    buckets; every other bucket's files are hard-linked (same inode)
    from the previous version — per-batch write cost is O(changed
    buckets), not O(table)."""
    import os

    from pyspark.sql import functions as F

    from change_data_capture_spark.apply import TableCatalog, apply_changelog, apply_changes
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from tests.conftest import load

    cust = load(spark, sf_dir, "customer")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(cust, "t.c", ["c_custkey"]), cat)
    one = cust.limit(1)
    upd = dml_records(
        one, "t.c", ["c_custkey"], op="UPDATE", version=2,
        value_overrides={"c_acctbal": F.col("c_acctbal") + 1.0},
    )
    apply_changelog(spark, upd, cat)

    tdir = cat.table_dir("t.c")
    versions = sorted(d for d in os.listdir(tdir) if d.startswith("data_v"))
    assert len(versions) == 2
    old, new = (os.path.join(tdir, v) for v in versions)

    def inodes(root):
        out = {}
        for b in os.listdir(root):
            if not b.startswith("__bucket="):
                continue
            for f in os.listdir(os.path.join(root, b)):
                if f.endswith(".parquet"):
                    out[f"{b}/{f}"] = os.stat(os.path.join(root, b, f)).st_ino
        return out

    old_i, new_i = inodes(old), inodes(new)
    shared = {k for k in old_i if k in new_i and old_i[k] == new_i[k]}
    # exactly one bucket rewritten; all other buckets reuse old files
    old_buckets = {k.split("/")[0] for k in old_i}
    reused_buckets = {k.split("/")[0] for k in shared}
    assert len(old_buckets - reused_buckets) == 1
    # and the merged table still reads correctly
    got = cat.read(spark, "t.c")
    assert got.count() == cust.count()


def test_rows_schema_is_valid_spark_schema(spark):
    base = spark.createDataFrame([(1, "a")], "id bigint, v string")
    log = dml_records(base, "t.x", ["id"])
    sj = log.select("dml.rows_schema").collect()[0][0]
    from pyspark.sql.types import StructType

    st = StructType.fromJson(json.loads(sj))
    assert [f.name for f in st.fields] == ["id", "v"]


def test_float_bool_pk_coerced_to_string(spark, tmp_path):
    """Kudu PK-type restriction (CDCKudu.java:315-321): BOOL/FLOAT/
    DOUBLE primary-key columns are stored as STRING; non-key columns
    keep their type, and mutations keyed by the coerced columns still
    target the right rows."""
    base = spark.createDataFrame(
        [(0.5, True, "a", 1.25), (1.0, False, "b", 2.5), (1.5, True, "c", 3.75)],
        "kf double, kb boolean, v string, d double",
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "t.fk", ["kf", "kb"]), cat)
    got = cat.read(spark, "t.fk")
    types = {f.name: f.dataType.simpleString() for f in got.schema.fields}
    assert types["kf"] == "string" and types["kb"] == "string"
    assert types["d"] == "double"  # non-key double untouched

    mut = mutation_changelog(
        base,
        "t.fk",
        ["kf", "kb"],
        update_where=F.col("kf") == 0.5,
        update_set={"v": F.lit("A")},
        update_version=2,
        delete_where=F.col("kf") == 1.0,
        delete_version=3,
    )
    apply_changelog(spark, mut, cat)
    rows = sorted_rows(cat.read(spark, "t.fk"), "kf")
    assert rows == [("0.5", "true", "A", 1.25), ("1.5", "true", "c", 3.75)]


def test_partial_rewrite_after_evolution_keeps_new_column(spark, tmp_path):
    """Regression: a post-evolution version mixes hard-linked old-schema
    files with rewritten new-schema files; the read must use the
    registered schema (not one-file parquet inference, which can sample
    an old file and silently null the added column everywhere)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from change_data_capture_spark.changelog import ddl_record

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "id bigint, v string"
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "t.evo", ["id"]), cat)

    evolved = StructType([*base.schema.fields, StructField("flag", StringType(), True)])
    # touch only a FEW keys so most buckets are hard-linked old files
    touched = base.filter(F.col("id") < 3).withColumn("flag", F.lit("y"))
    batch = ddl_record(spark, "t.evo", evolved.json()).unionByName(
        dml_records(touched, "t.evo", ["id"], op="UPDATE", version=2)
    )
    apply_changelog(spark, batch, cat)

    got = {r["id"]: r["flag"] for r in cat.read(spark, "t.evo").collect()}
    assert len(got) == 40
    assert all(got[i] == "y" for i in range(3))
    assert all(got[i] is None for i in range(3, 40))


def test_noncanonical_pk_string_hits_the_typed_bucket(spark, tmp_path):
    """A mutation whose rows_values PK string is NOT the canonical
    Spark cast-to-string form ('007' for int 7) must still merge into
    the same PK-hash bucket as the typed row it targets. Before the
    schema-normalized bucket arm, the precomputed touched-bucket set
    hashed the raw string, wrote the upsert into one bucket and
    hard-linked the old row's bucket untouched — a duplicate."""
    base = spark.range(1, 21).select(
        F.col("id").cast("bigint").alias("id"), F.lit("orig").alias("v")
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "t.pad", ["id"]), cat)

    upd = dml_records(
        base.filter("id <= 5"), "t.pad", ["id"], op="UPDATE", version=2,
        value_overrides={
            "id": F.format_string("%03d", F.col("id")),  # '001'..'005'
            "v": F.lit("upd"),
        },
    )
    apply_changelog(spark, upd, cat)

    got = cat.read(spark, "t.pad")
    assert got.count() == 20  # no duplicates, no losses
    vals = {r["id"]: r["v"] for r in got.collect()}
    assert all(vals[i] == "upd" for i in range(1, 6))
    assert all(vals[i] == "orig" for i in range(6, 21))


def test_collapse_unifies_pk_string_spellings(spark, tmp_path):
    """Two spellings of the same typed key inside ONE batch ('1' at v2,
    '001' at v3) are one row identity: last-writer-wins keeps only v3."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "t.sp", ["id"]), cat)

    one = base.filter("id = 1")
    up_canon = dml_records(
        one, "t.sp", ["id"], op="UPDATE", version=2,
        value_overrides={"v": F.lit("mid")},
    )
    up_padded = dml_records(
        one, "t.sp", ["id"], op="UPDATE", version=3,
        value_overrides={"id": F.lit("001"), "v": F.lit("final")},
    )
    apply_changelog(spark, up_canon.unionByName(up_padded), cat)
    got = {r["id"]: r["v"] for r in cat.read(spark, "t.sp").collect()}
    assert got == {1: "final", 2: "b"}


def test_compact_publishes_bucket_count_atomically(spark, tmp_path):
    """compact(n_buckets=N) must publish the new bucket count in the
    SAME meta swap as the new data pointer: no intermediate meta state
    may pair the new count with the old layout (bucket pruning against
    a mismatched hash silently skips changed keys' old rows)."""
    import os

    base = spark.range(0, 50).select(
        F.col("id").cast("bigint").alias("id"), (F.col("id") % 7).alias("v")
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "t.cb", ["id"]), cat)
    assert cat.meta("t.cb")["buckets"] == 16

    metas = []
    orig_put = TableCatalog.put_meta
    try:
        TableCatalog.put_meta = lambda self, t, m: (
            metas.append(dict(m)), orig_put(self, t, m))[-1]
        cat.compact(spark, "t.cb", n_buckets=4)
    finally:
        TableCatalog.put_meta = orig_put

    # every meta write during compact that carries the new count also
    # carries the new data pointer (single atomic swap)
    final_current = cat.meta("t.cb")["current"]
    for m in metas:
        if m.get("buckets") == 4:
            assert m.get("current") == final_current
    assert cat.meta("t.cb")["buckets"] == 4

    vdir = os.path.join(cat.table_dir("t.cb"), final_current)
    got_buckets = sorted(
        int(d.split("=")[1]) for d in os.listdir(vdir) if d.startswith("__bucket=")
    )
    assert got_buckets == [0, 1, 2, 3]

    # merges after re-bucketing still prune/merge correctly
    upd = dml_records(
        base.filter("id = 13"), "t.cb", ["id"], op="UPDATE", version=2,
        value_overrides={"v": F.lit(99)},
    )
    apply_changelog(spark, upd, cat)
    got = {r["id"]: r["v"] for r in cat.read(spark, "t.cb").collect()}
    assert len(got) == 50 and got[13] == 99


def test_evolution_cannot_drop_pk_columns(spark, tmp_path):
    """A DDL whose schema omits a registered PK column must not un-key
    the table (Kudu refuses key-column drops, CDCKudu.java:78-137):
    the PK field is re-added with its existing type, and subsequent
    merges keep working."""
    base = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "id bigint, v string, n bigint")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, "t.e", ["id"]), cat)

    # evolve: drop 'n', add 'w' — and (incorrectly) omit the PK 'id'
    bad = spark.createDataFrame([], "v string, w string")
    apply_changelog(spark, ddl_record(spark, "t.e", bad.schema.json()), cat)

    meta_fields = [f["name"] for f in __import__("json").loads(cat.meta("t.e")["schema"])["fields"]]
    assert "id" in meta_fields and "w" in meta_fields and "n" not in meta_fields

    upd = dml_records(
        spark.createDataFrame([(1, "a2", "x")], "id bigint, v string, w string"),
        "t.e", ["id"], op="UPDATE", version=2,
    )
    apply_changelog(spark, upd, cat)
    got = {r["id"]: (r["v"], r["w"]) for r in cat.read(spark, "t.e").collect()}
    assert got == {1: ("a2", "x"), 2: ("b", None)}


def test_apply_report_describes_batch_outcomes(spark, tmp_path):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    cat = TableCatalog(str(tmp_path / "cat"))
    r1 = apply_changelog(spark, snapshot_changelog(base, "t.r", ["id"]), cat)
    assert r1 == [
        {"table": "t.r", "action": "create", "applied_version": 1,
         "buckets_written": 16, "buckets_total": 16}
    ]
    upd = dml_records(
        base.filter("id = 1"), "t.r", ["id"], op="UPDATE", version=2,
        value_overrides={"v": F.lit("z")},
    )
    r2 = apply_changelog(spark, upd, cat)
    assert r2 == [
        {"table": "t.r", "action": "merge", "applied_version": 2,
         "buckets_written": 1, "buckets_total": 16}
    ]
    r3 = apply_changelog(spark, upd, cat)  # replay
    assert r3 == [{"table": "t.r", "action": "skip_replay"}]


def test_bootstrap_replica_handoff_matches_source(spark, tmp_path):
    from change_data_capture_spark.apply import TableCatalog, apply_changelog, apply_changes, bootstrap_replica
    from change_data_capture_spark.changelog import mutation_changelog, snapshot_changelog
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"n{i}", 10.0 * i) for i in range(1, 21)],
        "id long, name string, bal double",
    )
    src = TableCatalog(str(tmp_path / "src"))
    apply_changelog(spark, snapshot_changelog(df, "t.acct", ["id"]), src)
    apply_changelog(
        spark,
        mutation_changelog(
            df, "t.acct", ["id"],
            update_where=F.col("id") % 3 == 0,
            update_set={"bal": F.col("bal") + 5},
            delete_where=F.col("id") % 4 == 0,
        ),
        src,
    )

    replica = TableCatalog(str(tmp_path / "replica"))
    out = bootstrap_replica(spark, src, "t.acct", replica)
    want = sorted(tuple(r) for r in src.read(spark, "t.acct").collect())
    got = sorted(tuple(r) for r in out.collect())
    assert got == want and len(got) == 15  # 20 - 5 deletes (4,8,12,16,20)

    # replaying the handoff leg is idempotent under the version watermark
    out2 = bootstrap_replica(spark, src, "t.acct", replica)
    assert sorted(tuple(r) for r in out2.collect()) == want


def test_lookup_keys_prunes_to_requested_buckets(spark, tmp_path):
    from change_data_capture_spark.apply import TableCatalog, apply_changelog, apply_changes, lookup_keys
    from change_data_capture_spark.changelog import snapshot_changelog

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(60)], "id long, v string"
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(df, "t.kv", ["id"]), cat)

    seen: dict = {}
    orig_read = cat.read

    def spy_read(spark_, table_id, buckets=None, version=None):
        seen["buckets"] = buckets
        return orig_read(spark_, table_id, buckets=buckets, version=version)

    cat.read = spy_read
    keys = spark.createDataFrame([(3,), (17,), (42,)], "id long")
    out = lookup_keys(spark, cat, "t.kv", keys)
    rows = sorted((r.id, r.v) for r in out.collect())
    assert rows == [(3, "v3"), (17, "v17"), (42, "v42")]
    # 3 keys can touch at most 3 of the 16 bucket dirs: the scan is
    # pruned, never a full read
    assert seen["buckets"] is not None and 1 <= len(seen["buckets"]) <= 3

    # wrong key columns fail fast (ValueError, active under python -O)
    bad = spark.createDataFrame([(1, "x")], "id long, extra string")
    try:
        lookup_keys(spark, cat, "t.kv", bad)
        raise SystemExit("expected ValueError")
    except ValueError:
        pass

    # a keys frame typed differently from the registered schema still
    # hashes into the writer's bucket: '007' as a string for a long PK
    # must find the row, not silently return nothing
    str_keys = spark.createDataFrame([("007",), ("17",)], "id string")
    out2 = lookup_keys(spark, cat, "t.kv", str_keys)
    assert sorted((r.id, r.v) for r in out2.collect()) == [(7, "v7"), (17, "v17")]


def test_bootstrap_replica_resumes_live_feed_without_skip(spark, tmp_path):
    """The replica's post-bootstrap watermark must live in the SOURCE
    FEED's tracking domain, not the catalog's dir-seq domain: when
    tracking versions lag dir seqs, the next real feed batch must not
    be skipped as a replay (lost updates on the replica)."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog, apply_changes, bootstrap_replica
    from change_data_capture_spark.changelog import dml_records

    src = TableCatalog(str(tmp_path / "src"))
    # Feed versions START AT 0 — after two applies the source has dir
    # seqs {1, 2} but tracking watermark 1 (lagging the dir seq).
    df0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    apply_changelog(spark, dml_records(df0, "t.f", ["id"], op="INSERT", version=0), src)
    df1 = spark.createDataFrame([(3, "c")], "id long, v string")
    apply_changelog(spark, dml_records(df1, "t.f", ["id"], op="INSERT", version=1), src)
    assert int(src.meta("t.f")["applied_version"]) == 1

    replica = TableCatalog(str(tmp_path / "replica"))
    bootstrap_replica(spark, src, "t.f", replica)
    # watermark re-homed to the tracking domain
    assert int(replica.meta("t.f")["applied_version"]) == 1

    # the NEXT live feed batch (tracking version 2 == source dir seq)
    # must apply, not be skipped as a replay
    df2 = spark.createDataFrame([(4, "d")], "id long, v string")
    feed = dml_records(df2, "t.f", ["id"], op="INSERT", version=2)
    report = apply_changelog(spark, feed, replica)
    assert report[0]["action"] == "merge", report
    got = sorted((r.id, r.v) for r in replica.read(spark, "t.f").collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_concurrent_publish_raises_and_leaves_no_partial_state(spark, tmp_path):
    """Optimistic concurrency: a publish whose merge base was
    superseded by another writer must raise ConcurrentWriteError and
    publish nothing — readers keep seeing the interfering writer's
    version, and the loser's data dir is cleaned up."""
    from change_data_capture_spark.apply import (
        ConcurrentWriteError,
        TableCatalog,
        apply_changelog,
    )
    from change_data_capture_spark.changelog import snapshot_changelog

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(df, "t.occ", ["id"]), cat)
    base = cat.meta("t.occ")["current"]

    # writer B publishes first (same root, separate handle)
    other = TableCatalog(str(tmp_path / "cat"))
    other.write_new_version(
        "t.occ",
        spark.createDataFrame([(1, "B"), (2, "B"), (3, "B")], "id long, v string"),
        applied_version=5,
        expected_current=base,
    )

    # writer A, whose merge was computed against the old base, must fail
    stale = spark.createDataFrame([(1, "A"), (2, "A")], "id long, v string")
    try:
        cat.write_new_version("t.occ", stale, applied_version=6, expected_current=base)
        raise SystemExit("expected ConcurrentWriteError")
    except ConcurrentWriteError:
        pass

    got = sorted((r.id, r.v) for r in cat.read(spark, "t.occ").collect())
    assert got == [(1, "B"), (2, "B"), (3, "B")]
    # loser's data dir was removed; only seed + B's versions remain
    assert len(cat.versions("t.occ")) == 2


def test_multiple_same_batch_ddls_apply_in_union_order(spark, tmp_path):
    """Two DDLs for one table in ONE batch, deliberately spread across
    partitions: the SECOND (wider) announcement must win — pinned
    against collect_list's nondeterministic merge order."""
    from change_data_capture_spark.apply import apply_changes
    from change_data_capture_spark.changelog import ddl_record
    from change_data_capture_spark.schema import schema_from_json

    cat = TableCatalog(str(tmp_path / "cat"))
    v1 = spark.createDataFrame([], "id long, a double").schema.json()
    v2 = spark.createDataFrame([], "id long, a double, b string").schema.json()
    batch = ddl_record(spark, "shop.orders", v1).unionByName(
        ddl_record(spark, "shop.orders", v2)
    )
    assert batch.rdd.getNumPartitions() >= 2
    apply_changes(spark, batch, cat)
    pending = cat.meta("shop.orders")["pending_schema"]
    names = [f.name for f in schema_from_json(pending).fields]
    assert names == ["id", "a", "b"], names


def test_decode_dlq_routes_poisoned_rows(spark):
    """decode_rows_safe never throws on undecodable values; the poisoned
    rows land in undecodable_rows with the offending columns, and the
    two legs partition the feed exactly."""
    from pyspark.sql import functions as F
    from change_data_capture_spark.apply import decode_rows_safe, undecodable_rows

    schema = spark.createDataFrame([], "id long, amount double, note string").schema
    dml = spark.createDataFrame(
        [
            ("INSERT", {"id": "1", "amount": "1.5", "note": "ok"}, 1),
            ("INSERT", {"id": "2", "amount": "N/A", "note": "bad-double"}, 2),
            ("INSERT", {"id": "x", "amount": "oops", "note": None}, 3),
            ("INSERT", {"id": "4", "amount": None, "note": None}, 4),  # nulls fine
        ],
        "op_type string, rows_values map<string,string>, change_tracking_version long",
    )
    good = decode_rows_safe(dml, schema).collect()
    assert sorted(r.id for r in good) == [1, 4]
    assert {r.id: r.amount for r in good} == {1: 1.5, 4: None}
    bad = {r.change_tracking_version: r.bad_columns for r in undecodable_rows(dml, schema).collect()}
    assert bad == {2: ["amount"], 3: ["id", "amount"]}


def test_complex_typed_columns_roundtrip_envelope(spark, sf_dir, tmp_path):
    """Vector columns as first-class CDC citizens: array<float>
    embeddings travel the envelope as JSON strings and decode back
    bit-exactly through the registered schema; updates merge arrays;
    complex PKs are rejected at registration; malformed JSON routes to
    the decode DLQ instead of nulling silently."""
    import pytest
    from change_data_capture_spark.apply import (
        TableCatalog, apply_changelog, decode_rows_safe, undecodable_rows,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from conftest import load

    emb = load(spark, sf_dir, "embeddings")
    cat = TableCatalog(str(tmp_path / "veccat"))
    apply_changelog(spark, snapshot_changelog(emb, "ml.emb", ["vec_id"]), cat)
    got = cat.read(spark, "ml.emb")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, emb.collect()))

    # update one vector through the feed: the merged row carries the new array
    upd = dml_records(
        emb.filter(F.col("vec_id") == 1), "ml.emb", ["vec_id"],
        op="UPDATE", version=2,
        value_overrides={"embedding": F.expr("array(1.5f, -2.25f)")},
    )
    apply_changelog(spark, upd, cat)
    row = cat.read(spark, "ml.emb").filter(F.col("vec_id") == 1).first()
    assert list(row.embedding) == [1.5, -2.25]

    # complex PK rejected at registration
    with pytest.raises(ValueError, match="complex type"):
        cat2 = TableCatalog(str(tmp_path / "bad"))
        apply_changelog(
            spark, snapshot_changelog(emb, "ml.bad", ["embedding"]), cat2
        )

    # malformed JSON in an array column -> quarantine, not silent null
    schema = emb.schema
    dml = spark.createDataFrame(
        [("INSERT", {"vec_id": "7", "embedding": "not-json"}, 5),
         ("INSERT", {"vec_id": "8", "embedding": "[0.5,1.0]"}, 5)],
        "op_type string, rows_values map<string,string>, change_tracking_version long",
    )
    assert [r.bad_columns for r in undecodable_rows(dml, schema).collect()] == [["embedding"]]
    ok = decode_rows_safe(dml, schema).collect()
    assert len(ok) == 1 and list(ok[0].embedding) == [0.5, 1.0]


def test_decode_dlq_catches_malformed_struct_json(spark):
    """PERMISSIVE from_json yields a non-null all-null struct for
    malformed input, so struct columns need the JSON-validity check —
    unparseable text quarantines; a valid empty object does not (schema
    evolution tolerance)."""
    from change_data_capture_spark.apply import decode_rows_safe, undecodable_rows

    schema = spark.createDataFrame(
        [], "id long, payload struct<x:long,y:string>"
    ).schema
    dml = spark.createDataFrame(
        [
            ("INSERT", {"id": "1", "payload": '{"x": 5, "y": "ok"}'}, 1),
            ("INSERT", {"id": "2", "payload": '{"x": 1'}, 2),     # truncated
            ("INSERT", {"id": "3", "payload": "{}"}, 3),            # valid, empty
        ],
        "op_type string, rows_values map<string,string>, change_tracking_version long",
    )
    bad = undecodable_rows(dml, schema).collect()
    assert [(r.change_tracking_version, r.bad_columns) for r in bad] == [(2, ["payload"])]
    ok = {r.id: r for r in decode_rows_safe(dml, schema).collect()}
    assert set(ok) == {1, 3}
    assert ok[1].payload.x == 5 and ok[3].payload.x is None


def test_replay_floor_reopened_versions_merge_correctly(spark, tmp_path):
    """r7 review regression: a replay_floor BELOW the stored watermark
    (the Mongo patch-merge leg's contract) re-opens versions in
    (floor, stored]. The fast path's precomputed touched-bucket arms
    filtered on the STORED watermark, so a re-opened row's bucket was
    missing from changed_buckets: its old row survived the (pruned)
    anti-join AND its bucket's old files were hard-linked next to the
    fresh upsert file — duplicate rows."""
    cat = TableCatalog(str(tmp_path / "cat"))
    t = "db.docs"
    # Leg 1 (raw): full images A@5, B@20 -> stored watermark 20.
    full = spark.createDataFrame(
        [("A", "alpha", 5), ("B", "beta", 20)], "id string, body string, v int"
    )
    leg1 = dml_records(
        full, t, ["id"], op="INSERT", version=F.col("v").cast("long"),
        value_cols=["id", "body"],
    )
    apply_changes(spark, leg1, cat)
    assert int(cat.meta(t)["applied_version"]) == 20

    # Leg 2 (patch): A patched at v10 — <= stored watermark, > floor 0.
    patched = spark.createDataFrame([("A", "alpha-patched")], "id string, body string")
    leg2 = dml_records(patched, t, ["id"], op="UPDATE", version=10)
    apply_changes(spark, leg2, cat, replay_floor={t: 0})

    got = cat.read(spark, t)
    rows = {r["id"]: r["body"] for r in got.collect()}
    assert got.count() == 2, f"duplicate rows: {sorted(got.collect())}"
    assert rows == {"A": "alpha-patched", "B": "beta"}


def test_dropped_column_does_not_resurrect_on_readd(spark, tmp_path):
    """r7 review (reproduced by execution): evolution is metadata-only,
    so a dropped column's bytes persist in the table's parquet files —
    re-adding the name used to RESURRECT the stale values (the
    reference's sink physically deletes column data on ALTER DROP,
    CDCKudu.java:78-137, so its re-added column is empty). The catalog
    now tombstones dropped names and a re-add purges physically first
    (or raises without a session)."""
    import pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    cat = TableCatalog(str(tmp_path / "cat"))
    t = "db.t"
    df = spark.createDataFrame(
        [(1, "x", "secret1"), (2, "y", "secret2")], "id long, a string, b string"
    )
    apply_changelog(spark, snapshot_changelog(df, t, ["id"]), cat)

    s_no_b = StructType([StructField("id", LongType()), StructField("a", StringType())])
    cat.announce_schema(t, s_no_b.json())  # DROP b (metadata-only: ok)
    assert cat.read(spark, t).columns == ["id", "a"]
    assert "b" in (cat.meta(t).get("dropped_columns") or {})

    s_re = StructType([*s_no_b.fields, StructField("b", StringType())])
    # no session: loud failure naming the workaround
    with pytest.raises(ValueError, match="resurrect"):
        cat.announce_schema(t, s_re.json())
    # with a session: physical purge, then evolve — b is NULL everywhere
    cat.announce_schema(t, s_re.json(), spark=spark)
    rows = {r["id"]: r["b"] for r in cat.read(spark, t).collect()}
    assert rows == {1: None, 2: None}
    assert "b" not in (cat.meta(t).get("dropped_columns") or {})

    # and through the apply path (DDL records carry spark implicitly)
    cat.announce_schema(t, s_no_b.json())  # drop again
    log = ddl_record(spark, t, s_re.json())
    apply_changelog(spark, log, cat)  # re-add via a DDL record
    rows2 = {r["id"]: r["b"] for r in cat.read(spark, t).collect()}
    assert rows2 == {1: None, 2: None}


def test_type_changing_evolution_rewrites_instead_of_bricking(spark, tmp_path):
    """r7 review (reproduced): announcing a type change that the
    parquet reader cannot apply over the old physical encoding
    (string->int) used to brick every subsequent read of the table.
    Such changes now trigger a physical re-type rewrite (schema + data
    pointer move in one atomic meta swap); read-compatible widenings
    (int->long) stay metadata-only — no new version published."""
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    import pytest

    def mk(vtype):
        return StructType([StructField("id", LongType()), StructField("v", vtype)])

    # unsafe change: physical rewrite, values cast
    cat = TableCatalog(str(tmp_path / "a"))
    df = spark.createDataFrame([(1, "10"), (2, "20")], mk(StringType()))
    apply_changelog(spark, snapshot_changelog(df, "db.a", ["id"]), cat)
    with pytest.raises(ValueError, match="PHYSICAL rewrite"):
        cat.announce_schema("db.a", mk(IntegerType()).json())  # no session
    v_before = cat.versions("db.a")[-1]
    cat.announce_schema("db.a", mk(IntegerType()).json(), spark=spark)
    got = {r["id"]: r["v"] for r in cat.read(spark, "db.a").collect()}
    assert got == {1: 10, 2: 20}
    assert dict(cat.read(spark, "db.a").dtypes)["v"] == "int"
    assert cat.versions("db.a")[-1] == v_before + 1  # one rewrite published

    # read-compatible widening: metadata-only, no rewrite
    cat2 = TableCatalog(str(tmp_path / "b"))
    df2 = spark.createDataFrame([(1, 10), (2, 20)], mk(IntegerType()))
    apply_changelog(spark, snapshot_changelog(df2, "db.b", ["id"]), cat2)
    v0 = cat2.versions("db.b")[-1]
    cat2.announce_schema("db.b", mk(LongType()).json())
    assert cat2.versions("db.b")[-1] == v0  # no new version
    got2 = {r["id"]: r["v"] for r in cat2.read(spark, "db.b").collect()}
    assert got2 == {1: 10, 2: 20}
    assert dict(cat2.read(spark, "db.b").dtypes)["v"] == "bigint"

    # a genuinely un-castable value fails LOUDLY at evolve time
    cat3 = TableCatalog(str(tmp_path / "c"))
    df3 = spark.createDataFrame([(1, "xx")], mk(StringType()))
    apply_changelog(spark, snapshot_changelog(df3, "db.c", ["id"]), cat3)
    with pytest.raises(Exception):
        cat3.announce_schema("db.c", mk(IntegerType()).json(), spark=spark)


def test_time_travel_and_cdf_survive_a_retype(spark, tmp_path):
    """r7 follow-on: after a physical re-type, time travel must read
    pre-rewrite versions under the schema they were PUBLISHED with
    (per-version schema history), and the change feed across the
    boundary must align both sides — values equal across the re-type
    diff as empty updates."""
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    def mk(vtype):
        return StructType([StructField("id", LongType()), StructField("v", vtype)])

    cat = TableCatalog(str(tmp_path / "cat"))
    df = spark.createDataFrame([(1, "10"), (2, "20")], mk(StringType()))
    apply_changelog(spark, snapshot_changelog(df, "db.t", ["id"]), cat)
    v_str = cat.versions("db.t")[-1]
    cat.announce_schema("db.t", mk(IntegerType()).json(), spark=spark)
    v_int = cat.versions("db.t")[-1]

    # time travel to the pre-re-type version: string-typed, readable
    old = cat.read(spark, "db.t", version=v_str)
    assert dict(old.dtypes)["v"] == "string"
    assert {r["id"]: r["v"] for r in old.collect()} == {1: "10", 2: "20"}

    # CDF across the re-type boundary: same values, so no changes
    cdf = cat.table_changes(spark, "db.t", from_version=v_str, to_version=v_int)
    assert cdf.count() == 0


def test_same_batch_pk_retype_with_dml_merges_correctly(spark, tmp_path):
    """r7 review: a DDL in the same batch that changes a PK column's
    TYPE alters the canonical key strings the bucket hash uses
    ('007' as string vs 7 as long) — the precomputed touched-bucket
    arms hashed under the PRE-announce schema would name the wrong
    buckets (the replay_floor duplicate class). Announced tables now
    take the slow path, recomputing buckets from the fresh meta."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from change_data_capture_spark.envelope import wrap_ddl

    cat = TableCatalog(str(tmp_path / "cat"))
    t = "db.t"
    # create with a STRING pk, seeded via non-canonical spellings
    df = spark.createDataFrame(
        [("007", "old7"), ("08", "old8"), ("9", "old9")], "id string, v string"
    )
    apply_changelog(spark, snapshot_changelog(df, t, ["id"]), cat)

    # one batch: DDL re-typing the pk to LONG + updates spelled canonically
    new_schema = StructType(
        [StructField("id", LongType()), StructField("v", StringType())]
    )
    ddl = ddl_record(spark, t, new_schema.json())
    upd = spark.createDataFrame([(7, "new7"), (9, "new9")], new_schema)
    batch = ddl.unionByName(dml_records(upd, t, ["id"], op="UPDATE", version=2))
    apply_changes(spark, batch, cat)

    got = {r["id"]: r["v"] for r in cat.read(spark, t).collect()}
    assert got == {7: "new7", 8: "old8", 9: "new9"}, got
    assert dict(cat.read(spark, t).dtypes)["id"] == "bigint"


def test_known_tables_pool_is_correctness_neutral_and_bounds_meta_reads(
    spark, tmp_path
):
    """r9: apply_changes(known_tables=...) restricts the batch meta
    scan's candidate pool — a hinted-out table must land EXACTLY the
    same state through the fresh-stats fallback, and unrelated
    catalog tables' metas must not be read at all (the O(#tables)
    per-batch driver cost this exists to cut)."""
    from change_data_capture_spark.apply import TableCatalog, apply_changes
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.metastore import LocalFSMetaBackend

    class CountingBackend(LocalFSMetaBackend):
        def __init__(self, root):
            super().__init__(root)
            self.gets: dict[str, int] = {}

        def get(self, table_id):
            self.gets[table_id] = self.gets.get(table_id, 0) + 1
            return super().get(table_id)

    def seed(root):
        be = CountingBackend(str(root))
        cat = TableCatalog(str(root), backend=be)
        for name in ("db.target", "db.bystander1", "db.bystander2"):
            df = spark.createDataFrame(
                [(i, f"{name}_{i}") for i in range(6)], "id long, val string"
            )
            apply_changes(
                spark, snapshot_changelog(df, name, ["id"]), cat
            )
        return cat, be

    upd = lambda: dml_records(  # noqa: E731
        spark.createDataFrame([(2, "patched"), (9, "new")], "id long, val string"),
        "db.target", ["id"], op="UPDATE", version=5,
    )

    cat_full, _ = seed(tmp_path / "full")
    apply_changes(spark, upd(), cat_full)  # default: full-catalog pool

    cat_hint, be = seed(tmp_path / "hint")
    be.gets.clear()
    # hint EXCLUDES the batch's table: fallback leg must still land it
    apply_changes(spark, upd(), cat_hint, known_tables=["db.bystander1"])
    assert be.gets.get("db.bystander2", 0) == 0, (
        f"unhinted bystander meta was read: {be.gets}"
    )

    a = sorted(map(tuple, cat_full.read(spark, "db.target").collect()))
    b = sorted(map(tuple, cat_hint.read(spark, "db.target").collect()))
    assert a == b
    assert (2, "patched") in b and (9, "new") in b and len(b) == 7


def test_auto_pool_kicks_in_above_threshold(spark, tmp_path, monkeypatch):
    """r9: with no known_tables hint and a catalog above
    _POOL_AUTO_THRESHOLD, apply_changes derives its candidate pool
    from the batch itself — bystander tables' metas are never read and
    the result is identical to the full-pool apply."""
    import change_data_capture_spark.apply as apply_mod
    from change_data_capture_spark.apply import TableCatalog, apply_changes
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.metastore import LocalFSMetaBackend

    class CountingBackend(LocalFSMetaBackend):
        def __init__(self, root):
            super().__init__(root)
            self.gets: dict[str, int] = {}

        def get(self, table_id):
            self.gets[table_id] = self.gets.get(table_id, 0) + 1
            return super().get(table_id)

    be = CountingBackend(str(tmp_path / "auto"))
    cat = TableCatalog(str(tmp_path / "auto"), backend=be)
    for name in ("db.target", "db.by1", "db.by2", "db.by3"):
        df = spark.createDataFrame(
            [(i, f"{name}_{i}") for i in range(5)], "id long, val string"
        )
        apply_changes(spark, snapshot_changelog(df, name, ["id"]), cat)

    monkeypatch.setattr(apply_mod, "_POOL_AUTO_THRESHOLD", 2)
    be.gets.clear()
    upd = dml_records(
        spark.createDataFrame([(1, "patched")], "id long, val string"),
        "db.target", ["id"], op="UPDATE", version=7,
    )
    apply_changes(spark, upd, cat)  # no hint: auto-pool from the batch
    for by in ("db.by1", "db.by2", "db.by3"):
        assert be.gets.get(by, 0) == 0, f"bystander meta read: {be.gets}"
    got = {r["id"]: r["val"] for r in cat.read(spark, "db.target").collect()}
    assert got[1] == "patched" and len(got) == 5


def test_auto_pool_boundary_is_exact(spark, tmp_path, monkeypatch):
    """r10 (VERDICT directive #7): the POOL_AUTO_THRESHOLD behavior
    flip is part of the public apply_changes contract — pin BOTH sides
    of the boundary. At catalog size == threshold the full-catalog
    pool is used (every table's meta read, no extra batch action); at
    size == threshold + 1 the auto-pool kicks in (bystander metas
    never read)."""
    import change_data_capture_spark.apply as apply_mod
    from change_data_capture_spark.apply import TableCatalog, apply_changes
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.metastore import LocalFSMetaBackend

    class CountingBackend(LocalFSMetaBackend):
        def __init__(self, root):
            super().__init__(root)
            self.gets: dict[str, int] = {}

        def get(self, table_id):
            self.gets[table_id] = self.gets.get(table_id, 0) + 1
            return super().get(table_id)

    be = CountingBackend(str(tmp_path / "b"))
    cat = TableCatalog(str(tmp_path / "b"), backend=be)
    names = ["db.target", "db.by1", "db.by2", "db.by3"]  # 4 tables
    for name in names:
        df = spark.createDataFrame([(1, name)], "id long, val string")
        apply_changes(spark, snapshot_changelog(df, name, ["id"]), cat)

    def batch(v):
        return dml_records(
            spark.createDataFrame([(1, f"p{v}")], "id long, val string"),
            "db.target", ["id"], op="UPDATE", version=v,
        )

    # AT the threshold (4 == 4): full-catalog pool — every catalog
    # table's meta is read to build its arm
    monkeypatch.setattr(apply_mod, "_POOL_AUTO_THRESHOLD", 4)
    be.gets.clear()
    apply_changes(spark, batch(5), cat)
    assert all(be.gets.get(n, 0) >= 1 for n in names), be.gets
    # ONE past the threshold (4 > 3): auto-pool — bystanders untouched
    monkeypatch.setattr(apply_mod, "_POOL_AUTO_THRESHOLD", 3)
    be.gets.clear()
    apply_changes(spark, batch(6), cat)
    assert all(be.gets.get(n, 0) == 0 for n in names[1:]), be.gets
    got = {r["id"]: r["val"] for r in cat.read(spark, "db.target").collect()}
    assert got[1] == "p6"
    # the public constant tracks the internal one
    assert apply_mod.POOL_AUTO_THRESHOLD == 64
