"""TableCatalog version management: time travel, vacuum under file
reuse, and the change-data-feed diff."""

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.changelog import dml_records, snapshot_changelog
from tests.conftest import load


@pytest.fixture()
def versioned_cat(spark, sf_dir, tmp_path):
    nation = load(spark, sf_dir, "nation")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(nation, "t.n", ["n_nationkey"]), cat)  # v1
    upd = dml_records(
        nation.filter(F.col("n_nationkey") < 5), "t.n", ["n_nationkey"],
        op="UPDATE", version=2,
        value_overrides={"n_name": F.concat(F.col("n_name"), F.lit("_X"))},
    )
    dele = dml_records(
        nation.filter(F.col("n_nationkey") == 20), "t.n", ["n_nationkey"],
        op="DELETE", version=3, keys_only=True,
    )
    apply_changelog(spark, upd.unionByName(dele), cat)  # v2
    return cat, nation


def test_time_travel_reads_old_version(spark, versioned_cat):
    cat, nation = versioned_cat
    assert cat.versions("t.n") == [1, 2]
    v1 = cat.read(spark, "t.n", version=1)
    assert v1.count() == nation.count()
    assert v1.filter(F.col("n_name").endswith("_X")).count() == 0
    v2 = cat.read(spark, "t.n")
    assert v2.count() == nation.count() - 1
    assert v2.filter(F.col("n_name").endswith("_X")).count() == 5
    with pytest.raises(KeyError):
        cat.read(spark, "t.n", version=99)


def test_table_changes_cdf(spark, versioned_cat):
    cat, _ = versioned_cat
    cdf = cat.table_changes(spark, "t.n", from_version=1, to_version=2)
    by_type = {r["_change_type"]: r["n"] for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type == {"update_postimage": 5, "delete": 1}
    keys = sorted(
        r["n_nationkey"] for r in cdf.filter("_change_type = 'update_postimage'").collect()
    )
    assert keys == [0, 1, 2, 3, 4]


def test_vacuum_keeps_current_readable(spark, versioned_cat):
    cat, nation = versioned_cat
    dropped = cat.vacuum("t.n", keep_last=1)
    assert dropped == [1]
    assert cat.versions("t.n") == [2]
    # file reuse: v2 hard-links some v1 files; vacuum of v1 must not
    # corrupt v2
    assert cat.read(spark, "t.n").count() == nation.count() - 1
    with pytest.raises(KeyError):
        cat.read(spark, "t.n", version=1)


def test_compact_rebuckets_invisibly(spark, sf_dir):
    import os
    import tempfile

    from pyspark.sql import functions as F

    from change_data_capture_spark.changelog import mutation_changelog, snapshot_changelog

    cust = load(spark, sf_dir, "customer")
    cat = TableCatalog(tempfile.mkdtemp())
    apply_changelog(spark, snapshot_changelog(cust, "t.c", ["c_custkey"]), cat)
    before = {tuple(r) for r in cat.read(spark, "t.c").collect()}

    cat.compact(spark, "t.c", n_buckets=4)
    tdir = cat.table_dir("t.c")
    cur = cat.meta("t.c")["current"]
    bucket_dirs = [d for d in os.listdir(os.path.join(tdir, cur)) if d.startswith("__bucket=")]
    assert len(bucket_dirs) == 4
    assert {tuple(r) for r in cat.read(spark, "t.c").collect()} == before

    # merges after the relayout use the new bucket count and stay correct
    mut = mutation_changelog(
        cust, "t.c", ["c_custkey"],
        update_where=F.col("c_custkey") % 5 == 0,
        update_set={"c_acctbal": F.col("c_acctbal") + 1.0},
        update_version=7,
        delete_where=F.lit(False),
        delete_version=8,
    )
    apply_changelog(spark, mut, cat)
    got = {r["c_custkey"]: r["c_acctbal"] for r in cat.read(spark, "t.c").collect()}
    for r in cust.collect():
        expect = r["c_acctbal"] + (1.0 if r["c_custkey"] % 5 == 0 else 0.0)
        assert abs(got[r["c_custkey"]] - expect) < 1e-6


def test_export_snapshot_roundtrip_with_manifest(spark, versioned_cat, tmp_path):
    import json
    import os

    cat, nation = versioned_cat
    dest = str(tmp_path / "export")
    manifest = cat.export_snapshot(spark, "t.n", dest)
    # manifest describes exactly what landed
    assert manifest["table"] == "t.n"
    assert manifest["primary_keys"] == ["n_nationkey"]
    assert manifest["n_rows"] == nation.count() - 1  # v2: one delete
    disk = json.load(open(os.path.join(dest, "manifest.json")))
    assert disk == manifest
    sizes = {f["name"]: f["bytes"] for f in manifest["files"]}
    assert len(sizes) == manifest["n_files"] and all(b > 0 for b in sizes.values())
    # exported data matches the catalog read, column-for-column
    exported = spark.read.parquet(os.path.join(dest, "data"))
    assert sorted(exported.columns) == sorted(manifest["columns"])
    got = {tuple(r) for r in exported.collect()}
    want = {tuple(r) for r in cat.read(spark, "t.n").collect()}
    assert got == want
    with pytest.raises(KeyError):
        cat.export_snapshot(spark, "t.unknown", str(tmp_path / "x"))


def test_export_after_evolution_keeps_added_column(spark, versioned_cat, tmp_path):
    """Export must read through the REGISTERED schema: after an
    evolution the current version mixes pre-evolution files (hard-
    linked) with rewritten ones, and the export has to surface the
    added column (null for old rows) rather than sample-infer it away."""
    import os

    from change_data_capture_spark.changelog import ddl_record
    from pyspark.sql.types import LongType, StructField

    cat, nation = versioned_cat
    old_schema = cat.read(spark, "t.n").schema
    evolved = old_schema.add(StructField("extra_rank", LongType(), True))
    upd = dml_records(
        nation.filter(F.col("n_nationkey") == 0).withColumn("extra_rank", F.lit(7)),
        "t.n", ["n_nationkey"], op="UPDATE", version=9,
    )
    apply_changelog(spark, ddl_record(spark, "t.n", evolved.json()).unionByName(upd), cat)

    dest = str(tmp_path / "export_evolved")
    manifest = cat.export_snapshot(spark, "t.n", dest)
    assert "extra_rank" in manifest["columns"]
    exported = spark.read.parquet(os.path.join(dest, "data"))
    vals = {r.n_nationkey: r.extra_rank for r in exported.collect()}
    assert vals[0] == 7
    assert all(v is None for k, v in vals.items() if k != 0)


def test_compact_sort_by_lays_out_zone_maps_invisibly(spark, tmp_path):
    """compact(sort_by=...) must be reader-invisible (same rows) while
    physically ordering each bucket's file by the sort column — the
    zone-map layout parquet row-group stats make prunable."""
    import glob
    import pyarrow.parquet as pq

    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog

    df = spark.createDataFrame(
        [(i, float((i * 37) % 100)) for i in range(200)], "id long, score double"
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(df, "t.scores", ["id"]), cat)
    before = sorted(tuple(r) for r in cat.read(spark, "t.scores").collect())

    cat.compact(spark, "t.scores", sort_by=["score"])
    after = sorted(tuple(r) for r in cat.read(spark, "t.scores").collect())
    assert after == before, "re-layout must be invisible to readers"

    meta = cat.meta("t.scores")
    cur = tmp_path / "cat" / "t.scores" / meta["current"]
    files = glob.glob(str(cur / "__bucket=*" / "*.parquet"))
    assert files
    for f in files:
        scores = pq.read_table(f, columns=["score"])["score"].to_pylist()
        assert scores == sorted(scores), f"bucket file not sorted: {f}"


def test_maintenance_report_recommends_rebucket_and_vacuum(spark, tmp_path):
    """The advisor flags growth past the per-bucket target and counts
    reclaimable versions — all from metadata, zero Spark jobs."""
    from change_data_capture_spark.apply import (
        TableCatalog,
        apply_changelog,
        maintenance_report,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    df = spark.createDataFrame(
        [(i, "x" * 50) for i in range(200)], "id long, v string"
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(df, "t.m", ["id"]), cat)
    for ver in (2, 3):
        upd = dml_records(
            df.limit(3), "t.m", ["id"], op="UPDATE", version=ver
        )
        apply_changelog(spark, upd, cat)

    (r,) = maintenance_report(cat, target_bucket_bytes=1024, keep_last=2)
    assert r["table"] == "t.m" and r["files"] > 0 and r["bytes"] > 0
    # tiny target forces a rebucket recommendation, power-of-two growth
    assert r["needs_rebucket"] and r["recommended_buckets"] > r["buckets"]
    assert r["recommended_buckets"] % r["buckets"] == 0
    # 3 versions, keep 2 -> exactly one reclaimable
    assert r["versions"] == 3 and r["reclaimable_versions"] == [1]

    # generous target: healthy table, nothing to do
    (r2,) = maintenance_report(cat, target_bucket_bytes=256 * 1024 * 1024)
    assert not r2["needs_rebucket"]

    # acting on the advice keeps the table identical
    cat.compact(spark, "t.m", n_buckets=r["recommended_buckets"])
    assert cat.read(spark, "t.m").count() == 200
    assert cat.meta("t.m")["buckets"] == r["recommended_buckets"]


def test_compact_race_with_concurrent_apply_refuses(spark, tmp_path):
    """A compact whose source snapshot was superseded by a concurrent
    apply must refuse to publish (it would silently revert the batch);
    the applied batch survives."""
    from change_data_capture_spark.apply import (
        ConcurrentWriteError,
        TableCatalog,
        apply_changelog,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, v string")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(df, "t.race", ["id"]), cat)

    # simulate the race: capture compact's inputs, publish in between
    meta = cat.meta("t.race")
    pinned = int(meta["current"].rsplit("_v", 1)[1])
    current = cat.read(spark, "t.race", version=pinned)
    upd = dml_records(
        df.limit(1), "t.race", ["id"], op="UPDATE", version=2,
        value_overrides={"v": __import__("pyspark").sql.functions.lit("LIVE")},
    )
    apply_changelog(spark, upd, cat)  # concurrent writer lands
    try:
        cat.write_new_version(
            "t.race", current, int(meta.get("applied_version", 0)),
            changed_buckets=None, n_buckets=32,
            expected_current=meta["current"],
        )
        raise SystemExit("expected ConcurrentWriteError")
    except ConcurrentWriteError:
        pass
    assert "LIVE" in {r.v for r in cat.read(spark, "t.race").collect()}


def test_register_views_exposes_sql_surface(spark, tmp_path):
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import snapshot_changelog

    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id long, v double")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(df, "tpch.scores", ["id"]), cat)
    names = cat.register_views(spark)
    assert names == ["tpch_scores"]
    got = spark.sql("SELECT SUM(v) AS s FROM tpch_scores WHERE id = 2").first()["s"]
    assert got == 7.0
    spark.catalog.dropTempView("tpch_scores")


def test_compact_sets_persistent_bloom_filters(spark, tmp_path):
    """compact(bloom_filter_cols=[pk]) writes parquet bloom filters AND
    persists the setting so subsequent MERGE writes keep emitting them
    — the file-skipping layer below bucket pruning for point lookups.
    pyarrow 16 can't read bloom metadata, so the physical check is the
    deterministic size delta the filters add to every bucket file."""
    import glob
    import os

    from pyspark.sql import functions as F

    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    df = spark.createDataFrame([(i, float(i)) for i in range(2000)],
                               "id long, v double")

    def total_bytes(cat):
        root = cat.root + "/t.pts/" + cat.meta("t.pts")["current"]
        return sum(
            os.path.getsize(f)
            for f in glob.glob(root + "/__bucket=*/*.parquet")
        )

    plain = TableCatalog(str(tmp_path / "plain"))
    apply_changelog(spark, snapshot_changelog(df, "t.pts", ["id"]), plain)
    plain.compact(spark, "t.pts")
    assert plain.meta("t.pts")["bloom_filter_cols"] == []

    bloomed = TableCatalog(str(tmp_path / "bloomed"))
    apply_changelog(spark, snapshot_changelog(df, "t.pts", ["id"]), bloomed)
    bloomed.compact(spark, "t.pts", bloom_filter_cols=["id"])
    assert bloomed.meta("t.pts")["bloom_filter_cols"] == ["id"]
    base, with_bloom = total_bytes(plain), total_bytes(bloomed)
    assert with_bloom > base + 1000, (base, with_bloom)

    # a later merge keeps the setting without being told again, and
    # the rewritten bucket files still carry the size overhead
    upd = dml_records(df.filter(F.col("id") % 50 == 0), "t.pts", ["id"],
                      op="UPDATE", version=2,
                      value_overrides={"v": F.col("v") + 1})
    apply_changelog(spark, upd, bloomed)
    assert bloomed.meta("t.pts")["bloom_filter_cols"] == ["id"]
    assert total_bytes(bloomed) > base + 1000


def test_asof_watermark_cross_table_consistent_cut(spark, sf_dir, tmp_path):
    """Cross-table AS-OF in the feed's tracking domain: each table cuts
    at its newest published version whose watermark <= W; batches that
    span W publish above it and are excluded whole."""
    from change_data_capture_spark.changelog import mutation_changelog

    nation, region = load(spark, sf_dir, "nation"), load(spark, sf_dir, "region")
    cat = TableCatalog(str(tmp_path / "gcat"))
    # batch A: nation snapshot @1, region snapshot @2
    a = snapshot_changelog(nation, "t.n", ["n_nationkey"]).unionByName(
        snapshot_changelog(region, "t.r", ["r_regionkey"], insert_version=2)
    )
    apply_changelog(spark, a, cat)
    # batch B: nation updates @3, region updates @5
    b = mutation_changelog(
        nation, "t.n", ["n_nationkey"],
        update_where=F.col("n_nationkey") % 2 == 0,
        update_set={"n_name": F.concat(F.col("n_name"), F.lit("_b"))},
        update_version=3,
    ).unionByName(
        mutation_changelog(
            region, "t.r", ["r_regionkey"],
            update_where=F.col("r_regionkey") % 2 == 0,
            update_set={"r_name": F.concat(F.col("r_name"), F.lit("_b"))},
            update_version=5,
        )
    )
    apply_changelog(spark, b, cat)
    # batch C: nation only @6
    c = mutation_changelog(
        nation, "t.n", ["n_nationkey"],
        update_where=F.col("n_nationkey") % 3 == 0,
        update_set={"n_name": F.concat(F.col("n_name"), F.lit("_c"))},
        update_version=6,
    )
    apply_changelog(spark, c, cat)

    # cut at W=4: nation includes batch B (wm 3) but not C (wm 6);
    # region excludes batch B (wm 5) -> original snapshot
    assert cat.version_at_watermark("t.n", 4) == 2
    assert cat.version_at_watermark("t.r", 4) == 1
    n = {r.n_nationkey: r.n_name for r in cat.read_asof_watermark(spark, "t.n", 4).collect()}
    r_ = {r.r_regionkey: r.r_name for r in cat.read_asof_watermark(spark, "t.r", 4).collect()}
    base_n = {r.n_nationkey: r.n_name for r in nation.collect()}
    base_r = {r.r_regionkey: r.r_name for r in region.collect()}
    assert all(n[k] == (v + "_b" if k % 2 == 0 else v) for k, v in base_n.items())
    assert r_ == base_r
    # below the first publish: no cut exists
    assert cat.version_at_watermark("t.r", 1) is None
    with pytest.raises(KeyError):
        cat.read_asof_watermark(spark, "t.r", 1)
    # current watermark reads current state
    assert cat.version_at_watermark("t.n", 10**9) == 3
    # vacuum prunes the index with the data dirs
    cat.vacuum("t.n", keep_last=1)
    assert set(cat.meta("t.n")["version_watermarks"]) == {"3"}
    with pytest.raises(KeyError):
        cat.read_asof_watermark(spark, "t.n", 4)  # cut version vacuumed


def test_export_group_snapshot_consistent_cut(spark, sf_dir, tmp_path):
    """Group export at a shared watermark: per-table manifests pin the
    cut versions, the group manifest lands last, and the exported data
    equals the AS-OF reads. A table with no cut fails the export."""
    import json
    from change_data_capture_spark.changelog import mutation_changelog

    nation, region = load(spark, sf_dir, "nation"), load(spark, sf_dir, "region")
    cat = TableCatalog(str(tmp_path / "gexp"))
    apply_changelog(
        spark,
        snapshot_changelog(nation, "t.n", ["n_nationkey"]).unionByName(
            snapshot_changelog(region, "t.r", ["r_regionkey"], insert_version=2)
        ),
        cat,
    )
    apply_changelog(
        spark,
        mutation_changelog(
            nation, "t.n", ["n_nationkey"],
            update_where=F.col("n_nationkey") % 2 == 0,
            update_set={"n_name": F.concat(F.col("n_name"), F.lit("_b"))},
            update_version=5,
        ),
        cat,
    )
    dest = str(tmp_path / "out")
    group = cat.export_group_snapshot(spark, ["t.n", "t.r"], 4, dest)
    assert group["tables"]["t.n"]["cut_version"] == 1  # wm 5 excluded
    assert group["tables"]["t.r"]["cut_version"] == 1
    assert group["tables"]["t.n"]["applied_version"] == 1
    on_disk = json.load(open(f"{dest}/manifest.json"))
    assert on_disk == group
    exported = spark.read.parquet(f"{dest}/t_n/data")
    asof = cat.read_asof_watermark(spark, "t.n", 4)
    assert sorted(map(tuple, exported.select(*asof.columns).collect())) == sorted(
        map(tuple, asof.collect())
    )
    with pytest.raises(KeyError, match="t.r"):
        cat.export_group_snapshot(spark, ["t.n", "t.r"], 1, str(tmp_path / "bad"))


def test_auto_maintain_executes_advisor_actions(spark, tmp_path):
    """Closed-loop maintenance: dry_run plans without touching anything;
    the real run compacts small-file tables and vacuums reclaimable
    versions; reader-visible content never changes."""
    from change_data_capture_spark.apply import (
        TableCatalog, apply_changelog, auto_maintain,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    cat = TableCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame(
        [(i, 1.0 * i) for i in range(200)], "id long, v double"
    )
    apply_changelog(spark, snapshot_changelog(base, "t.a", ["id"]), cat)
    for ver in (2, 3, 4):  # several tiny batches -> small files + history
        apply_changelog(
            spark,
            dml_records(base.filter(F.col("id") % 5 == ver), "t.a", ["id"],
                        op="UPDATE", version=ver,
                        value_overrides={"v": F.col("v") + ver}),
            cat,
        )
    before = sorted(tuple(r) for r in cat.read(spark, "t.a").collect())
    n_versions = len(cat.versions("t.a"))
    assert n_versions >= 3

    # a tiny bucket-byte target makes the advisor recommend growth,
    # driving the rebucket-compact path
    planned = auto_maintain(spark, cat, keep_last=2, target_bucket_bytes=256,
                            dry_run=True)
    assert planned and planned[0]["table"] == "t.a" and planned[0]["compacted"]
    assert planned[0]["new_buckets"] and planned[0]["new_buckets"] > 16
    assert len(cat.versions("t.a")) == n_versions  # dry run touched nothing

    acted = auto_maintain(spark, cat, keep_last=2, target_bucket_bytes=256)
    assert acted and acted[0]["compacted"]
    assert acted[0]["vacuumed_versions"], "old versions reclaimed"
    after = sorted(tuple(r) for r in cat.read(spark, "t.a").collect())
    assert after == before  # reader-invisible
    # at the realistic default target the catalog is converged: one
    # pass may vacuum the pre-compact version, after which a second
    # pass is a full no-op (parquet's per-file byte floor makes toy
    # tables diverge under toy byte targets — a non-issue at real
    # bucket sizes, so convergence is asserted at the default)
    auto_maintain(spark, cat, keep_last=2)
    assert auto_maintain(spark, cat, keep_last=2) == []


def test_auto_maintain_refreshes_stale_signature_index(spark, tmp_path):
    """Directive: auto-maintenance closes the loop with the persisted
    MinHash index. After the base corpus moves, maintenance_report
    flags the registered index stale and auto_maintain runs the
    INCREMENTAL refresh — signing only the changed docs, deleting
    departed ids — after which the index equals a full re-sign and the
    next pass is a no-op."""
    from change_data_capture_spark.apply import (
        TableCatalog, apply_changelog, auto_maintain, maintenance_report,
        register_derived_index,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.extensions import dedup

    cat = TableCatalog(str(tmp_path / "cat"))
    docs = spark.createDataFrame(
        [(i, f"document number {i} " + " ".join(f"w{i}x{j}" for j in range(30)))
         for i in range(60)],
        "doc_id long, text string",
    )
    apply_changelog(spark, snapshot_changelog(docs, "ml.docs", ["doc_id"]), cat)
    apply_changelog(
        spark, dedup.signature_changelog(docs, "ml.sigs", n=5, k=32), cat
    )
    register_derived_index(
        cat, "ml.sigs", base_table="ml.docs", kind="minhash_sigs",
        params={"n": 5, "k": 32},
    )
    rep = {r["table"]: r for r in maintenance_report(cat)}
    assert rep["ml.sigs"]["index_stale"] is False

    # base moves: 5 inserts, 3 updates, 2 deletes
    ins = spark.createDataFrame(
        [(100 + i, f"fresh doc {i} " + " ".join(f"n{i}y{j}" for j in range(30)))
         for i in range(5)],
        "doc_id long, text string",
    )
    upd = docs.filter(F.col("doc_id").isin(1, 2, 3)).select(
        "doc_id", F.concat(F.col("text"), F.lit(" EDITED")).alias("text")
    )
    dele = docs.filter(F.col("doc_id").isin(10, 11)).select("doc_id", "text")
    batch = (
        dml_records(ins, "ml.docs", ["doc_id"], op="INSERT", version=2)
        .unionByName(dml_records(upd, "ml.docs", ["doc_id"], op="UPDATE", version=2))
        .unionByName(dml_records(dele, "ml.docs", ["doc_id"], op="DELETE",
                                 version=2, keys_only=True))
    )
    apply_changelog(spark, batch, cat)
    rep = {r["table"]: r for r in maintenance_report(cat)}
    assert rep["ml.sigs"]["index_stale"] is True

    acted = {a["table"]: a for a in auto_maintain(spark, cat)}
    assert acted["ml.sigs"]["refreshed"]
    r = acted["ml.sigs"]["refresh"]
    assert r["signed"] == 8 and r["deleted"] == 2  # incremental, not a rebuild

    # index now equals a from-scratch signing of the current base
    want = {
        tuple(row)
        for row in dedup.minhash_signatures(
            dedup.shingles(cat.read(spark, "ml.docs"), n=5, distinct=False), k=32
        ).collect()
    }
    got = {tuple(row) for row in cat.read(spark, "ml.sigs").collect()}
    assert got == want

    # watermark advanced: nothing stale on the next pass
    rep = {r["table"]: r for r in maintenance_report(cat)}
    assert rep["ml.sigs"]["index_stale"] is False


def test_auto_maintain_never_vacuums_a_refresh_basis(spark, tmp_path):
    """Review regression: base sorts BEFORE its index in
    catalog.tables() and has vacuum-able history while the index is
    stale several versions behind. auto_maintain must refresh first
    and vacuum must keep the diff basis (protect_from) — previously
    the vacuum deleted it and every subsequent run raised KeyError."""
    from change_data_capture_spark.apply import (
        TableCatalog, apply_changelog, auto_maintain, register_derived_index,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.extensions import dedup

    cat = TableCatalog(str(tmp_path / "cat"))
    docs = spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(20)))
         for i in range(30)],
        "doc_id long, text string",
    )
    # 'a.docs' < 'z.sigs' lexicographically: base row acts first
    apply_changelog(spark, snapshot_changelog(docs, "a.docs", ["doc_id"]), cat)
    apply_changelog(spark, dedup.signature_changelog(docs, "z.sigs", n=5, k=16), cat)
    register_derived_index(
        cat, "z.sigs", base_table="a.docs", kind="minhash_sigs",
        params={"n": 5, "k": 16},
    )
    # three more base versions WITHOUT refreshing the index
    for ver in (2, 3, 4):
        upd = docs.filter(F.col("doc_id") % 3 == ver % 3).select(
            "doc_id", F.concat("text", F.lit(f" v{ver}")).alias("text")
        )
        apply_changelog(
            spark, dml_records(upd, "a.docs", ["doc_id"], op="UPDATE", version=ver), cat
        )
    acts = {a["table"]: a for a in auto_maintain(spark, cat, keep_last=1)}
    assert acts["z.sigs"]["refresh"]["resync"] is False  # incremental, basis intact
    # index equals a from-scratch signing of the current base
    want = {
        tuple(r)
        for r in dedup.minhash_signatures(
            dedup.shingles(cat.read(spark, "a.docs"), n=5, distinct=False), k=16
        ).collect()
    }
    assert {tuple(r) for r in cat.read(spark, "z.sigs").collect()} == want
    # and the next run neither wedges nor re-refreshes
    again = auto_maintain(spark, cat, keep_last=1)
    assert all(not a.get("refresh") for a in again)


def test_refresh_signature_index_resync_and_unregistered_meta(spark, tmp_path):
    """Review regression pair: (1) a standalone (unregistered) refresh
    must not synthesize a partial derived meta record that breaks
    maintenance_report; (2) once the diff basis is manually vacuumed
    away the refresh falls back to a full resync instead of KeyError."""
    from change_data_capture_spark.apply import (
        TableCatalog, apply_changelog, maintenance_report, register_derived_index,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.extensions import dedup

    cat = TableCatalog(str(tmp_path / "cat"))
    docs = spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(20)))
         for i in range(20)],
        "doc_id long, text string",
    )
    apply_changelog(spark, snapshot_changelog(docs, "b.docs", ["doc_id"]), cat)
    apply_changelog(spark, dedup.signature_changelog(docs, "b.sigs", n=5, k=16), cat)
    upd = docs.filter(F.col("doc_id") < 5).select(
        "doc_id", F.concat("text", F.lit(" v2")).alias("text")
    )
    apply_changelog(
        spark, dml_records(upd, "b.docs", ["doc_id"], op="UPDATE", version=2), cat
    )
    # (1) standalone refresh with explicit from_version: no derived record
    r = dedup.refresh_signature_index(
        spark, cat, "b.docs", "b.sigs", n=5, k=16, from_version=1
    )
    assert r["signed"] == 5 and r["resync"] is False
    assert (cat.meta("b.sigs") or {}).get("derived") is None
    assert all(row["derived"] is None for row in maintenance_report(cat))
    # (2) register, mutate again, vacuum away the basis, refresh -> resync
    register_derived_index(
        cat, "b.sigs", base_table="b.docs", kind="minhash_sigs",
        params={"n": 5, "k": 16}, refreshed_to=2,
    )
    dele = docs.filter(F.col("doc_id") >= 18).select("doc_id", "text")
    apply_changelog(
        spark,
        dml_records(dele, "b.docs", ["doc_id"], op="DELETE", version=3, keys_only=True),
        cat,
    )
    cat.vacuum("b.docs", keep_last=1)  # manual vacuum drops the v2 basis
    r2 = dedup.refresh_signature_index(spark, cat, "b.docs", "b.sigs", n=5, k=16)
    assert r2["resync"] is True and r2["deleted"] == 2
    want = {
        tuple(r)
        for r in dedup.minhash_signatures(
            dedup.shingles(cat.read(spark, "b.docs"), n=5, distinct=False), k=16
        ).collect()
    }
    assert {tuple(r) for r in cat.read(spark, "b.sigs").collect()} == want


def test_register_derived_index_fails_fast_on_bad_kind_or_params(spark, tmp_path):
    """ADVICE r5: a typo'd kind or param key must raise AT REGISTRATION,
    not as a TypeError inside a scheduled auto_maintain weeks later."""
    import pytest

    from change_data_capture_spark.apply import (
        TableCatalog, apply_changelog, register_derived_index,
    )
    from change_data_capture_spark.changelog import snapshot_changelog

    cat = TableCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame([(1, "a@x")], "id long, email string")
    apply_changelog(spark, snapshot_changelog(base, "t.u", ["id"]), cat)
    apply_changelog(spark, snapshot_changelog(base, "t.u_idx", ["email"]), cat)

    with pytest.raises(ValueError, match="unknown derived-index kind"):
        register_derived_index(cat, "t.u_idx", base_table="t.u",
                               kind="minhash_sig")  # typo
    with pytest.raises(ValueError, match="requires params.*value_cols"):
        register_derived_index(cat, "t.u_idx", base_table="t.u",
                               kind="value_index")
    with pytest.raises(ValueError, match="unknown params.*shingle"):
        register_derived_index(cat, "t.u_idx", base_table="t.u",
                               kind="minhash_sigs", params={"n": 5, "shingle": 3})
    # nothing was recorded by the failed attempts; a valid call works
    assert (cat.meta("t.u_idx") or {}).get("derived") is None
    register_derived_index(cat, "t.u_idx", base_table="t.u",
                           kind="value_index", params={"value_cols": ["email"]})
    assert cat.meta("t.u_idx")["derived"]["kind"] == "value_index"


def test_auto_maintain_dry_run_matches_real_vacuum_with_stale_index(spark, tmp_path):
    """ADVICE r5: dry_run previously reported reclaimable_versions from
    the PRE-refresh floor while a real run refreshes first, raises the
    protect_from floor, and reclaims more. The planned vacuum must now
    equal what the live run actually reclaims."""
    from change_data_capture_spark.apply import (
        TableCatalog, apply_changelog, auto_maintain, register_derived_index,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog
    from change_data_capture_spark.derive import maintain_value_index

    cat = TableCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame(
        [(i, f"u{i}@x", 1.0 * i) for i in range(40)],
        "id long, email string, v double",
    )
    apply_changelog(spark, snapshot_changelog(base, "t.u", ["id"]), cat)
    maintain_value_index(spark, cat, "t.u", ["email"], "t.u_idx")
    register_derived_index(cat, "t.u_idx", base_table="t.u",
                           kind="value_index", params={"value_cols": ["email"]})
    # base moves three versions past the index watermark
    for ver in (2, 3, 4):
        apply_changelog(
            spark,
            dml_records(base.filter(F.col("id") % 5 == ver), "t.u", ["id"],
                        op="UPDATE", version=ver,
                        value_overrides={"v": F.col("v") + ver}),
            cat,
        )
    planned = {a["table"]: a for a in auto_maintain(spark, cat, keep_last=1,
                                                    dry_run=True)}
    assert planned["t.u_idx"]["refreshed"]
    planned_vacuum = planned["t.u"]["vacuumed_versions"]
    assert planned_vacuum, "dry_run must report the post-refresh reclaim"
    n_versions_before = len(cat.versions("t.u"))

    acted = {a["table"]: a for a in auto_maintain(spark, cat, keep_last=1)}
    assert acted["t.u"]["vacuumed_versions"] == planned_vacuum
    assert len(cat.versions("t.u")) < n_versions_before


def test_auto_maintain_skips_and_reports_on_concurrent_writer(spark, tmp_path, monkeypatch):
    """A live apply racing a table's compact (commit CAS) must not
    kill the whole scheduled maintenance pass: the raced table is
    skipped with a report note, other tables still get maintained,
    and the next pass retries naturally."""
    from change_data_capture_spark import apply as apply_mod
    from change_data_capture_spark.apply import (
        ConcurrentWriteError, TableCatalog, apply_changelog, auto_maintain,
    )
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    cat = TableCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame([(i, 1.0 * i) for i in range(100)], "id long, v double")
    for t in ("t.a", "t.b"):
        apply_changelog(spark, snapshot_changelog(base, t, ["id"]), cat)
        for ver in (2, 3, 4):
            apply_changelog(
                spark,
                dml_records(base.filter(F.col("id") % 5 == ver), t, ["id"],
                            op="UPDATE", version=ver,
                            value_overrides={"v": F.col("v") + ver}),
                cat,
            )

    real_compact = TableCatalog.compact

    def racy_compact(self, spark_, table_id, **kw):
        if table_id == "t.a":
            raise ConcurrentWriteError(f"{table_id}: version superseded during write")
        return real_compact(self, spark_, table_id, **kw)

    monkeypatch.setattr(TableCatalog, "compact", racy_compact)
    acts = {a["table"]: a for a in auto_maintain(spark, cat, keep_last=1,
                                                 target_bucket_bytes=256)}
    assert "concurrent writer" in acts["t.a"]["skipped"]
    assert acts["t.a"]["vacuumed_versions"] == []  # nothing claimed
    assert "skipped" not in acts["t.b"]           # the other table maintained
    assert acts["t.b"]["vacuumed_versions"]
    # raced table's data intact and next pass (no race) succeeds
    monkeypatch.setattr(TableCatalog, "compact", real_compact)
    assert cat.read(spark, "t.a").count() == 100
    acts2 = {a["table"]: a for a in auto_maintain(spark, cat, keep_last=1,
                                                  target_bucket_bytes=256)}
    assert "skipped" not in acts2.get("t.a", {})


def test_apply_retries_and_lands_when_compact_publishes_mid_merge(
    spark, tmp_path, monkeypatch
):
    """Concurrency contract, apply side (r7): a scheduled compact that
    publishes BETWEEN a stream batch's merge-read and its write trips
    the publish CAS; apply_changes must retry against the fresh meta —
    including a NEW BUCKET COUNT from a re-bucketing compact (the old
    touched-bucket set is invalid in the new layout) — and land the
    batch exactly once."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    cat = TableCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame(
        [(i, 1.0 * i) for i in range(200)], "id long, v double"
    )
    apply_changelog(spark, snapshot_changelog(base, "t.r", ["id"]), cat)
    old_buckets = int(cat.meta("t.r")["buckets"])

    real_read = TableCatalog.read
    raced = {"done": False}

    def read_with_racing_compact(self, spark_, table_id, **kw):
        # fire exactly once, on apply's bucket-pruned merge read (the
        # compact's own full read passes version=, not buckets=)
        if table_id == "t.r" and "buckets" in kw and not raced["done"]:
            raced["done"] = True
            real_compact(self, spark_, table_id, n_buckets=old_buckets * 2)
        return real_read(self, spark_, table_id, **kw)

    real_compact = TableCatalog.compact
    monkeypatch.setattr(TableCatalog, "read", read_with_racing_compact)

    updates = dml_records(
        base.filter(F.col("id") % 7 == 0), "t.r", ["id"],
        op="UPDATE", version=2, value_overrides={"v": F.col("v") + 1000},
    )
    report = apply_changelog(spark, updates, cat)

    assert raced["done"], "the racing compact never fired"
    assert [r["action"] for r in report] == ["merge"]
    monkeypatch.setattr(TableCatalog, "read", real_read)
    meta = cat.meta("t.r")
    assert int(meta["buckets"]) == old_buckets * 2  # compact's layout won
    assert int(meta["applied_version"]) == 2        # and the batch landed on it
    got = {r["id"]: r["v"] for r in cat.read(spark, "t.r").collect()}
    assert len(got) == 200  # no duplicates, no resurrections
    for i in range(200):
        assert got[i] == (1.0 * i + 1000 if i % 7 == 0 else 1.0 * i)


def test_apply_retry_respects_watermark_advanced_by_concurrent_writer(
    spark, tmp_path, monkeypatch
):
    """If the concurrent writer was ANOTHER APPLY that advanced the
    watermark past this batch's versions, the CAS-retry must re-filter
    against the fresh watermark and skip — re-upserting the stale
    batch's older values would silently regress the newer rows."""
    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    cat = TableCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame(
        [(i, 1.0 * i) for i in range(50)], "id long, v double"
    )
    apply_changelog(spark, snapshot_changelog(base, "t.w", ["id"]), cat)

    newer = dml_records(
        base.filter(F.col("id") < 10), "t.w", ["id"],
        op="UPDATE", version=9, value_overrides={"v": F.lit(9999.0)},
    )
    real_read = TableCatalog.read
    raced = {"done": False}

    def read_with_racing_apply(self, spark_, table_id, **kw):
        if table_id == "t.w" and "buckets" in kw and not raced["done"]:
            raced["done"] = True
            # a competing consumer lands version 9 first
            monkeypatch.setattr(TableCatalog, "read", real_read)
            apply_changelog(spark_, newer, self)
            monkeypatch.setattr(TableCatalog, "read", read_with_racing_apply)
        return real_read(self, spark_, table_id, **kw)

    monkeypatch.setattr(TableCatalog, "read", read_with_racing_apply)

    stale = dml_records(
        base.filter(F.col("id") < 10), "t.w", ["id"],
        op="UPDATE", version=2, value_overrides={"v": F.lit(-1.0)},
    )
    report = apply_changelog(spark, stale, cat)

    assert raced["done"]
    assert [r["action"] for r in report] == ["skip_replay"]
    monkeypatch.setattr(TableCatalog, "read", real_read)
    got = {r["id"]: r["v"] for r in cat.read(spark, "t.w").collect()}
    assert all(got[i] == 9999.0 for i in range(10))  # newer writer kept
    assert int(cat.meta("t.w")["applied_version"]) == 9


def test_orphan_data_dir_from_crashed_publish_is_not_a_version(spark, tmp_path):
    """r7 review: a crash between write_new_version's parquet write and
    its meta swap leaves a data_v{current+1} dir that was never
    committed. It must not appear in versions(), must not be
    time-travel readable (it may be half-written), and must be
    harmlessly overwritten by the next real publish."""
    import os

    from change_data_capture_spark.apply import TableCatalog, apply_changelog
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    cat = TableCatalog(str(tmp_path / "cat"))
    base = spark.createDataFrame([(i, 1.0 * i) for i in range(20)], "id long, v double")
    apply_changelog(spark, snapshot_changelog(base, "t.o", ["id"]), cat)
    upd = dml_records(base.filter(F.col("id") < 5), "t.o", ["id"],
                      op="UPDATE", version=2, value_overrides={"v": F.lit(7.0)})
    apply_changelog(spark, upd, cat)
    assert cat.versions("t.o") == [1, 2]

    # simulate the crash: an orphan dir one past current, half-written
    orphan = os.path.join(cat.table_dir("t.o"), "data_v000003")
    os.makedirs(os.path.join(orphan, "__bucket=0"))
    with open(os.path.join(orphan, "__bucket=0", "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")

    assert cat.versions("t.o") == [1, 2]  # orphan invisible
    try:
        cat.read(spark, "t.o", version=3)
        raise AssertionError("orphan must not be time-travel readable")
    except KeyError:
        pass
    assert cat.read(spark, "t.o").count() == 20  # current read unaffected

    # the next real publish reuses seq 3, overwriting the junk
    upd2 = dml_records(base.filter(F.col("id") >= 15), "t.o", ["id"],
                       op="UPDATE", version=3, value_overrides={"v": F.lit(9.0)})
    apply_changelog(spark, upd2, cat)
    assert cat.versions("t.o") == [1, 2, 3]
    got = {r["id"]: r["v"] for r in cat.read(spark, "t.o", version=3).collect()}
    assert len(got) == 20 and got[19] == 9.0 and got[0] == 7.0


def test_import_group_snapshot_restores_and_resumes_feed(spark, tmp_path):
    """r8: the restore inverse of export_group_snapshot — a fresh
    catalog recreated from the export equals every table's cut state,
    re-homes each table's feed watermark to its OWN exported value,
    and a live-feed resume replays idempotently with no gap and no
    overlap (including a batch that SPANNED the group watermark and
    was therefore excluded whole from the cut)."""
    import pytest

    from change_data_capture_spark.apply import import_group_snapshot
    from change_data_capture_spark.changelog import dml_records, snapshot_changelog

    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame([(i, f"a{i}") for i in range(10)], "id long, v string")
    b = spark.createDataFrame([(i, 10 * i) for i in range(5)], "k long, n long")
    apply_changelog(spark, snapshot_changelog(a, "g.a", ["id"], insert_version=5), src)
    apply_changelog(spark, snapshot_changelog(b, "g.b", ["k"], insert_version=5), src)
    # a batch on g.a SPANNING watermark 10: versions 8 and 12 publish
    # atomically at watermark 12 (> 10), so the cut excludes it whole
    span = dml_records(
        a.filter("id = 1"), "g.a", ["id"], op="UPDATE", version=8,
        value_overrides={"v": F.lit("below")},
    ).unionByName(
        dml_records(
            a.filter("id = 2"), "g.a", ["id"], op="UPDATE", version=12,
            value_overrides={"v": F.lit("above")},
        )
    )
    apply_changelog(spark, span, src)

    exp = str(tmp_path / "exp")
    group = src.export_group_snapshot(spark, ["g.a", "g.b"], watermark=10, dest_dir=exp)
    assert group["tables"]["g.a"]["applied_version"] == 5  # spanning batch excluded

    dst = TableCatalog(str(tmp_path / "dst"))
    rep = import_group_snapshot(spark, exp, dst)
    assert rep["tables"]["g.a"]["applied_version"] == 5
    # restored content equals the cut (no 'below'/'above' rows)
    assert sorted(map(tuple, dst.read(spark, "g.a").collect())) == sorted(
        map(tuple, a.collect())
    )
    assert sorted(map(tuple, dst.read(spark, "g.b").collect())) == sorted(
        map(tuple, b.collect())
    )
    # live-feed resume: replaying the spanning batch applies BOTH rows
    # (versions 8 and 12 are above the re-homed watermark 5) — no gap
    apply_changelog(spark, span, dst)
    got = {r.id: r.v for r in dst.read(spark, "g.a").collect()}
    assert got[1] == "below" and got[2] == "above"
    # and the restored catalog now equals the live source
    assert sorted(map(tuple, dst.read(spark, "g.a").collect())) == sorted(
        map(tuple, src.read(spark, "g.a").collect())
    )
    # refuses to restore over an occupied table
    with pytest.raises(ValueError, match="already has table"):
        import_group_snapshot(spark, exp, dst)


def test_import_group_snapshot_resumes_after_partial_crash(spark, tmp_path):
    """r8: a crash mid-restore leaves some tables created — the re-run
    must RESUME (skip tables whose watermark and row count match the
    manifest, restore the rest), not wedge on the occupied-table rule;
    an occupied table with DIFFERENT content still refuses."""
    import pytest

    from change_data_capture_spark.apply import import_group_snapshot
    from change_data_capture_spark.changelog import snapshot_changelog

    src = TableCatalog(str(tmp_path / "src"))
    a = spark.createDataFrame([(i, f"a{i}") for i in range(6)], "id long, v string")
    b = spark.createDataFrame([(i, 2 * i) for i in range(4)], "k long, n long")
    apply_changelog(spark, snapshot_changelog(a, "g.a", ["id"], insert_version=3), src)
    apply_changelog(spark, snapshot_changelog(b, "g.b", ["k"], insert_version=3), src)
    exp = str(tmp_path / "exp")
    src.export_group_snapshot(spark, ["g.a", "g.b"], watermark=5, dest_dir=exp)

    dst = TableCatalog(str(tmp_path / "dst"))
    import_group_snapshot(spark, exp, dst)
    # simulate the crash: g.b never landed
    dst.drop_table("g.b")
    rep = import_group_snapshot(spark, exp, dst)
    assert rep["tables"]["g.a"]["resumed"] is True
    assert rep["tables"]["g.b"]["resumed"] is False
    assert dst.read(spark, "g.b").count() == 4
    # diverged occupied table still refuses
    from change_data_capture_spark.changelog import dml_records

    apply_changelog(
        spark,
        dml_records(a.limit(1), "g.a", ["id"], op="DELETE", version=9,
                    keys_only=True),
        dst,
    )
    with pytest.raises(ValueError, match="different content"):
        import_group_snapshot(spark, exp, dst)
