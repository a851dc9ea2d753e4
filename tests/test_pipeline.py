"""Declarative pipeline front door: config-driven runs must equal the
hand-wired decode->normalize->apply calls, dead letters must surface,
and bad configs must fail fast BEFORE any job runs — the reference's
plugin-configuration contract re-expressed for this engine."""

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.normalize import normalize_raw_ops
from change_data_capture_spark.pipeline import run_pipeline
from change_data_capture_spark.sources import debezium
from change_data_capture_spark.sources import mongodb as mg
from change_data_capture_spark.sources.config import InvalidConfigError

T = "shop.orders"


def _base(spark):
    return spark.createDataFrame(
        [(i, 10.0 * i, f"c{i % 3}") for i in range(1, 20)],
        "id long, amount double, tag string",
    )


def _dbz_feed(spark, base):
    full = F.struct(F.col("id"), F.col("amount"), F.col("tag"))
    upd = F.struct(F.col("id"), (F.col("amount") + 5).alias("amount"), F.col("tag"))
    snap = debezium.encode_debezium_json(base, table=T, op="r", before=None,
                                         after=full, ts_ms=1)
    mut = debezium.encode_debezium_json(base.filter(F.col("id") % 3 == 0), table=T,
                                        op="u", before=full, after=upd, ts_ms=2)
    dele = debezium.encode_debezium_json(base.filter(F.col("id") % 7 == 0), table=T,
                                         op="d", before=full, after=None, ts_ms=3)
    junk = spark.createDataFrame([("not json",)], "message string")
    return snap.unionByName(mut).unionByName(dele).unionByName(junk)


def test_pipeline_debezium_equals_direct_wiring(spark, tmp_path):
    base = _base(spark)
    msgs = _dbz_feed(spark, base)
    cfg = {
        "source": {"format": "debezium"},
        "tables": {T: {"keys": ["id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "cfg"))
    report = run_pipeline(spark, msgs, cfg, cat)
    assert report["tables"] == [T]
    # dead letters surfaced, not dropped
    reasons = [r["reason"] for r in report["dead_letters"].collect()]
    assert reasons == ["unparseable"]

    ref = TableCatalog(str(tmp_path / "ref"))
    raw = debezium.debezium_raw_ops(
        msgs, {T: ["id"]}, rows_schemas={T: base.schema.json()}
    )
    apply_changelog(spark, normalize_raw_ops(raw), ref)
    got = sorted(tuple(r) for r in cat.read(spark, T).collect())
    want = sorted(tuple(r) for r in ref.read(spark, T).collect())
    assert got == want and len(got) > 0


def test_pipeline_mongodb_applies_patch_leg(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, f"n{i}", 1.0 * i) for i in range(1, 10)],
        "_id long, name string, bal double",
    )
    keys = {"appdb.users": "_id"}
    snap = mg.encode_mongodb_json(
        base, table="appdb.users", op="c",
        after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=1,
    )
    part = mg.encode_mongodb_json(
        base.filter(F.col("_id") % 2 == 0), table="appdb.users", op="u",
        updated_fields=F.struct((F.col("bal") + 7).alias("bal")),
        removed_fields=F.array(F.lit("name")),
        doc_id=F.col("_id"), ts_ms=2,
    )
    cfg = {
        "source": {"format": "mongodb"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "mongo"))
    run_pipeline(spark, snap.unionByName(part), cfg, cat)
    got = {r["_id"]: (r["name"], r["bal"]) for r in cat.read(spark, "appdb.users").collect()}
    want = {
        i: (None if i % 2 == 0 else f"n{i}", 1.0 * i + 7 if i % 2 == 0 else 1.0 * i)
        for i in range(1, 10)
    }
    assert got == want
    assert keys  # silence unused warning


def test_pipeline_config_fails_fast(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "x"))
    msgs = spark.createDataFrame([("{}",)], "message string")
    with pytest.raises(InvalidConfigError) as e:
        run_pipeline(spark, msgs, {"source": {"format": "nope"}, "tables": {"a.b": {"keys": ["k"]}}}, cat)
    assert e.value.property == "source.format"
    with pytest.raises(InvalidConfigError) as e:
        run_pipeline(spark, msgs, {"source": {"format": "debezium"}, "tables": {}}, cat)
    assert e.value.property == "tables"
    with pytest.raises(InvalidConfigError) as e:
        run_pipeline(spark, msgs, {"source": {"format": "debezium"}, "tables": {"a.b": {}}}, cat)
    assert e.value.property == "tables.a.b.keys"
    with pytest.raises(InvalidConfigError) as e:
        run_pipeline(
            spark, msgs,
            {"source": {"format": "mongodb"}, "tables": {"a.b": {"keys": ["x", "y"]}}},
            cat,
        )
    assert e.value.property == "tables.a.b.keys"
    with pytest.raises(InvalidConfigError) as e:
        run_pipeline(
            spark, msgs,
            {"source": {"format": "mssql_cdc"},
             "tables": {"a.b": {"keys": ["x"]}, "a.c": {"keys": ["x"]}}},
            cat,
        )
    assert e.value.property == "tables"


def test_pipeline_goldengate_whitelist(spark, tmp_path):
    from change_data_capture_spark.sources import kafka

    base = _base(spark)
    schema_json = base.schema.json()
    tag = base.withColumn("_change_type", F.lit("insert"))
    msgs = (
        kafka.goldengate_schema_message(spark, table=T, fingerprint=5,
                                        schema_json=schema_json)
        .unionByName(
            kafka.table_changes_to_goldengate(
                tag, table=T, fingerprint=5, pk_names=["id"], version=1, ts_micros=1
            )
        )
        .unionByName(
            kafka.goldengate_schema_message(spark, table="other.t", fingerprint=6,
                                            schema_json=schema_json)
        )
        .unionByName(
            kafka.table_changes_to_goldengate(
                tag, table="other.t", fingerprint=6, pk_names=["id"], version=1,
                ts_micros=1,
            )
        )
    )
    cfg = {"source": {"format": "goldengate"}, "tables": {T: {"keys": ["id"]}}}
    cat = TableCatalog(str(tmp_path / "gg"))
    run_pipeline(spark, msgs, cfg, cat)
    assert cat.read(spark, T).count() == base.count()
    assert cat.meta("other.t") is None  # whitelist enforced


def test_pipeline_mongodb_patch_older_than_other_docs_raw_still_applies(spark, tmp_path):
    """Review regression: a partial update whose source version is
    OLDER than another doc's same-batch full image must still apply —
    the raw leg's watermark advance must not suppress it (pre-leg
    replay floor)."""
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "_id long, name string, bal double"
    )
    snap = mg.encode_mongodb_json(
        base, table="appdb.users", op="c",
        after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=1,
    )
    cfg = {
        "source": {"format": "mongodb"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "m"))
    run_pipeline(spark, snap, cfg, cat)
    # batch 2: doc 1 gets a PARTIAL update at ts 5; doc 2 a FULL
    # image at ts 9 (raw leg pushes the watermark to 9xxx)
    patch = mg.encode_mongodb_json(
        base.filter(F.col("_id") == 1), table="appdb.users", op="u",
        updated_fields=F.struct(F.lit(99.0).alias("bal")),
        doc_id=F.col("_id"), ts_ms=5,
    )
    full = mg.encode_mongodb_json(
        base.filter(F.col("_id") == 2), table="appdb.users", op="u",
        after=F.struct(F.col("_id"), F.lit("B").alias("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=9,
    )
    run_pipeline(spark, full.unionByName(patch), cfg, cat)
    got = {r["_id"]: (r["name"], r["bal"]) for r in cat.read(spark, "appdb.users").collect()}
    assert got == {1: ("a", 99.0), 2: ("B", 2.0)}


def test_pipeline_mongodb_patch_superseded_by_newer_full_image(spark, tmp_path):
    """A patch OLDER than the same doc's same-batch full image is
    wholly superseded (full images carry every column); a patch NEWER
    than the full image applies on top of it."""
    base = spark.createDataFrame([(1, "a", 1.0)], "_id long, name string, bal double")
    cfg = {
        "source": {"format": "mongodb"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "m"))
    run_pipeline(
        spark,
        mg.encode_mongodb_json(
            base, table="appdb.users", op="c",
            after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
            doc_id=F.col("_id"), ts_ms=1,
        ),
        cfg, cat,
    )
    stale_patch = mg.encode_mongodb_json(   # ts 3 < full image's ts 5
        base, table="appdb.users", op="u",
        updated_fields=F.struct(F.lit(111.0).alias("bal")),
        doc_id=F.col("_id"), ts_ms=3,
    )
    full = mg.encode_mongodb_json(
        base, table="appdb.users", op="u",
        after=F.struct(F.col("_id"), F.lit("full").alias("name"),
                       F.lit(50.0).alias("bal")),
        doc_id=F.col("_id"), ts_ms=5,
    )
    fresh_patch = mg.encode_mongodb_json(   # ts 7 > 5: applies on top
        base, table="appdb.users", op="u",
        updated_fields=F.struct(F.lit("fresh").alias("name")),
        doc_id=F.col("_id"), ts_ms=7,
    )
    run_pipeline(
        spark, stale_patch.unionByName(full).unionByName(fresh_patch), cfg, cat
    )
    (row,) = cat.read(spark, "appdb.users").collect()
    assert (row["name"], row["bal"]) == ("fresh", 50.0)


def test_pipeline_mongodb_absent_tables_and_orphan_patches_no_crash(spark, tmp_path):
    """Whitelisted tables the batch never mentions must not crash the
    run; patch-only batches for a never-created table drop (the
    orphan rule) instead of KeyError-ing."""
    base = spark.createDataFrame([(1, "a", 1.0)], "_id long, name string, bal double")
    cfg = {
        "source": {"format": "mongodb"},
        "tables": {
            "appdb.a": {"keys": ["_id"], "schema": base.schema.json()},
            "appdb.b": {"keys": ["_id"], "schema": base.schema.json()},
        },
    }
    cat = TableCatalog(str(tmp_path / "m"))
    only_a = mg.encode_mongodb_json(
        base, table="appdb.a", op="c",
        after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=1,
    )
    report = run_pipeline(spark, only_a, cfg, cat)
    assert cat.meta("appdb.b") is None and report["tables"] == ["appdb.a", "appdb.b"]
    # patch-only batch for the never-created appdb.b: dropped, no crash
    orphan = mg.encode_mongodb_json(
        base, table="appdb.b", op="u",
        updated_fields=F.struct(F.lit(9.0).alias("bal")),
        doc_id=F.col("_id"), ts_ms=2,
    )
    run_pipeline(spark, orphan, cfg, cat)
    assert cat.meta("appdb.b") is None


def test_pipeline_mongodb_surfaces_undecodable_patch_cells(spark, tmp_path):
    base = spark.createDataFrame([(1, "a", 1.0)], "_id long, name string, bal double")
    cfg = {
        "source": {"format": "mongodb"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "m"))
    run_pipeline(
        spark,
        mg.encode_mongodb_json(
            base, table="appdb.users", op="c",
            after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
            doc_id=F.col("_id"), ts_ms=1,
        ),
        cfg, cat,
    )
    bad = mg.encode_mongodb_json(
        base, table="appdb.users", op="u",
        updated_fields=F.struct(
            F.lit("N/A").alias("bal"),            # uncastable for double
            F.lit("x").alias("no_such_column"),   # unknown column
        ),
        doc_id=F.col("_id"), ts_ms=2,
    )
    report = run_pipeline(spark, bad, cfg, cat)
    reasons = sorted(
        (r["column"], r["reason"])
        for r in report["undecodable_patch_cells"].collect()
    )
    assert reasons == [("bal", "uncastable"), ("no_such_column", "unknown_column")]
    (row,) = cat.read(spark, "appdb.users").collect()
    assert row["bal"] == 1.0  # stored value kept, skip visible above


def test_pipeline_nonmapping_table_spec_fails_fast(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "x"))
    msgs = spark.createDataFrame([("{}",)], "message string")
    with pytest.raises(InvalidConfigError) as e:
        run_pipeline(
            spark, msgs,
            {"source": {"format": "debezium"}, "tables": {"a.b": ["id"]}}, cat,
        )
    assert e.value.property == "tables.a.b"


def test_pipeline_stream_meta_reads_are_bounded_by_feed_tables(spark, tmp_path):
    """r10 (VERDICT directive #2): the declarative front door threads
    the config's table whitelist as apply's ``known_tables`` pool, so
    a micro-batch's driver-side meta reads are O(feed tables) — a
    catalog full of bystander tables must contribute ZERO meta reads
    per batch (run_apply_stream already had this via its seen-tables
    set; run_pipeline paid the full-catalog pool / the auto-pool's
    extra collect)."""
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.metastore import LocalFSMetaBackend
    from change_data_capture_spark.pipeline import run_pipeline_stream

    class CountingBackend(LocalFSMetaBackend):
        def __init__(self, root):
            super().__init__(root)
            self.gets: dict[str, int] = {}

        def get(self, table_id):
            self.gets[table_id] = self.gets.get(table_id, 0) + 1
            return super().get(table_id)

    be = CountingBackend(str(tmp_path / "cat"))
    cat = TableCatalog(str(tmp_path / "cat"), backend=be)
    # a populated catalog: bystander tables the feed never writes
    for i in range(5):
        df = spark.createDataFrame([(1, "x")], "id long, v string")
        apply_changelog(
            spark, snapshot_changelog(df, f"by.t{i}", ["id"]), cat
        )

    base = _base(spark)
    cfg = {
        "source": {"format": "debezium"},
        "tables": {T: {"keys": ["id"], "schema": base.schema.json()}},
    }
    msgs_dir = str(tmp_path / "msgs")
    _dbz_feed(spark, base).write.mode("append").parquet(msgs_dir)
    be.gets.clear()
    run_pipeline_stream(
        spark, msgs_dir, cfg, cat, str(tmp_path / "ckpt")
    )
    bystanders = {t: n for t, n in be.gets.items() if t.startswith("by.")}
    assert not bystanders, f"bystander meta reads per batch: {bystanders}"
    # and the feed still landed correctly through the pooled path
    got = {r["id"]: r["amount"] for r in cat.read(spark, T).collect()}
    assert 7 not in got and got[3] == 35.0 and len(got) == 17


def test_pipeline_stream_applies_batches_and_resumes(spark, tmp_path):
    """Streaming front door: wire-message files stream through
    run_pipeline per micro-batch; a restart with the same checkpoint
    picks up only new files; the MongoDB patch leg works per batch."""
    from change_data_capture_spark.pipeline import run_pipeline_stream

    base = spark.createDataFrame(
        [(i, f"n{i}", 1.0 * i) for i in range(1, 6)],
        "_id long, name string, bal double",
    )
    cfg = {
        "source": {"format": "mongodb"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    msgs_dir = str(tmp_path / "msgs")
    ckpt = str(tmp_path / "ckpt")
    cat = TableCatalog(str(tmp_path / "cat"))

    snap = mg.encode_mongodb_json(
        base, table="appdb.users", op="c",
        after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=1,
    )
    snap.write.mode("append").parquet(msgs_dir)
    run_pipeline_stream(spark, msgs_dir, cfg, cat, ckpt)
    assert cat.read(spark, "appdb.users").count() == 5

    # second file: a partial-update batch; restartable query resumes
    # from the checkpoint and applies only the new file
    part = mg.encode_mongodb_json(
        base.filter(F.col("_id") % 2 == 1), table="appdb.users", op="u",
        updated_fields=F.struct((F.col("bal") + 100).alias("bal")),
        doc_id=F.col("_id"), ts_ms=2,
    )
    part.write.mode("append").parquet(msgs_dir)
    run_pipeline_stream(spark, msgs_dir, cfg, cat, ckpt)
    got = {r["_id"]: r["bal"] for r in cat.read(spark, "appdb.users").collect()}
    assert got == {i: (1.0 * i + 100 if i % 2 == 1 else 1.0 * i) for i in range(1, 6)}

    # bad config still fails fast BEFORE any stream starts
    with pytest.raises(InvalidConfigError):
        run_pipeline_stream(
            spark, msgs_dir, {"source": {"format": "nope"}, "tables": {}}, cat, ckpt
        )


def test_pipeline_mongodb_stale_cross_batch_patch_suppressed(spark, tmp_path):
    """Advisor regression: a patch OLDER than the pre-batch watermark
    (a cross-partition late delivery / offset replay of something a
    prior batch already superseded) must NOT regress its doc, even
    when the same batch carries a FRESH patch for another doc. Before
    the per-row version stamps, the leg-wide max stamp let the stale
    doc ride through the replay floor on the fresh doc's version."""
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "_id long, name string, bal double"
    )
    cfg = {
        "source": {"format": "mongodb"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "m"))
    # batch 1: snapshot at ts 1, then doc 1 patched to bal=77 at ts 6
    # (watermark advances to 6xxx)
    run_pipeline(
        spark,
        mg.encode_mongodb_json(
            base, table="appdb.users", op="c",
            after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
            doc_id=F.col("_id"), ts_ms=1,
        ),
        cfg, cat,
    )
    run_pipeline(
        spark,
        mg.encode_mongodb_json(
            base.filter(F.col("_id") == 1), table="appdb.users", op="u",
            updated_fields=F.struct(F.lit(77.0).alias("bal")),
            doc_id=F.col("_id"), ts_ms=6,
        ),
        cfg, cat,
    )
    # batch 2: a REPLAYED stale patch for doc 1 (ts 3 < watermark)
    # alongside a fresh patch for doc 2 (ts 9)
    stale = mg.encode_mongodb_json(
        base.filter(F.col("_id") == 1), table="appdb.users", op="u",
        updated_fields=F.struct(F.lit(11.0).alias("bal")),
        doc_id=F.col("_id"), ts_ms=3,
    )
    fresh = mg.encode_mongodb_json(
        base.filter(F.col("_id") == 2), table="appdb.users", op="u",
        updated_fields=F.struct(F.lit("B2").alias("name")),
        doc_id=F.col("_id"), ts_ms=9,
    )
    run_pipeline(spark, stale.unionByName(fresh), cfg, cat)
    got = {r["_id"]: (r["name"], r["bal"]) for r in cat.read(spark, "appdb.users").collect()}
    assert got == {1: ("a", 77.0), 2: ("B2", 2.0)}


def test_stream_source_spec_kafka_transport_validates_offline(spark, tmp_path):
    """Directive #6: the declarative streaming front door's kafka
    transport builds its reader options from sources.kafka.kafka_options
    with the same fail-fast validation — asserted OFFLINE (no broker),
    the reference's deploy-time contract
    (GoldenGateKafkaConfig.java:103-129)."""
    from change_data_capture_spark.pipeline import stream_source_spec

    tables = {"db.t": {"keys": ["id"]}}
    transport, mcol, kcol, opts = stream_source_spec(
        {
            "source": {
                "format": "debezium", "transport": "kafka",
                "broker": "broker1:9092", "topic": "cdc.db.t",
                "initial_offset": -2, "max_rate_per_partition": 500,
            },
            "tables": tables,
        }
    )
    assert transport == "kafka" and (mcol, kcol) == ("message", "key")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092",
        "subscribe": "cdc.db.t",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "500",
    }
    # default transport is the file source with empty kafka options
    t2, m2, k2, o2 = stream_source_spec(
        {"source": {"format": "mongodb", "message_col": "payload",
                    "key_col": "k"}, "tables": tables}
    )
    assert (t2, m2, k2, o2) == ("file", "payload", "k", {})
    for bad, prop in (
        ({"format": "debezium", "transport": "pulsar"}, "source.transport"),
        ({"format": "debezium", "transport": "kafka", "topic": "t"}, "source.broker"),
        ({"format": "debezium", "transport": "kafka", "broker": "b"}, "source.topic"),
        ({"format": "debezium", "transport": "kafka", "broker": "b",
          "topic": "t", "initial_offset": -7}, "source.initial_offset"),
    ):
        with pytest.raises(InvalidConfigError):
            stream_source_spec({"source": bad, "tables": tables})


def test_pipeline_stream_honors_configured_column_names(spark, tmp_path):
    """Advisor regression: the streaming front door must derive its
    file-source schema from source.message_col / source.key_col — the
    same config keys the batch front door honors — not hardcode
    message/key."""
    from change_data_capture_spark.pipeline import run_pipeline_stream

    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "_id long, name string, bal double"
    )
    cfg = {
        "source": {"format": "mongodb", "message_col": "payload", "key_col": "mk"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    msgs_dir = str(tmp_path / "msgs")
    cat = TableCatalog(str(tmp_path / "cat"))
    snap = mg.encode_mongodb_json(
        base, table="appdb.users", op="c",
        after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=1,
    ).withColumnsRenamed({"message": "payload", "key": "mk"})
    snap.write.mode("append").parquet(msgs_dir)
    run_pipeline_stream(spark, msgs_dir, cfg, cat, str(tmp_path / "ckpt"))
    assert cat.read(spark, "appdb.users").count() == 2


def test_pipeline_batch_honors_message_col_across_formats(spark, tmp_path):
    """source.message_col is one contract across the batch front door:
    a debezium feed arriving under a custom column name decodes the
    same as under the default."""
    from change_data_capture_spark.sources import debezium as dz

    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, bal double"
    )
    msgs = dz.encode_debezium_json(
        base, table="db.t", op="c", before=None,
        after=F.struct(F.col("id"), F.col("name"), F.col("bal")),
        ts_ms=1,
    ).withColumnRenamed("message", "payload")
    cfg = {
        "source": {"format": "debezium", "message_col": "payload"},
        "tables": {"db.t": {"keys": ["id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "c"))
    out = run_pipeline(spark, msgs, cfg, cat)
    assert cat.read(spark, "db.t").count() == 2
    assert out["dead_letters"].count() == 0


def test_stream_source_spec_names_correct_bad_property(spark):
    """Review regression: a malformed max_rate_per_partition must name
    ITS property, not source.initial_offset; a file transport with no
    messages_dir fails fast at validation, not inside Spark."""
    from change_data_capture_spark.pipeline import run_pipeline_stream, stream_source_spec

    tables = {"db.t": {"keys": ["id"]}}
    with pytest.raises(InvalidConfigError) as e:
        stream_source_spec(
            {"source": {"format": "debezium", "transport": "kafka",
                        "broker": "b", "topic": "t",
                        "max_rate_per_partition": "lots"}, "tables": tables}
        )
    assert e.value.property == "source.max_rate_per_partition"
    with pytest.raises(InvalidConfigError) as e2:
        run_pipeline_stream(
            spark, None, {"source": {"format": "debezium"}, "tables": tables},
            TableCatalog("/tmp/unused_cat"), "/tmp/unused_ckpt",
        )
    assert "messages_dir" in str(e2.value) or e2.value.property == "source.transport"


def test_pipeline_goldengate_honors_message_col(spark, tmp_path):
    """Review regression: the goldengate leg silently ignored
    source.message_col; it now renames the configured column into the
    wrapper decode path."""
    from change_data_capture_spark.sources import kafka as kf

    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    tag = base.withColumn("_change_type", F.lit("insert"))
    wire = (
        kf.goldengate_schema_message(spark, table="db.t", fingerprint=9,
                                     schema_json=base.schema.json())
        .unionByName(
            kf.table_changes_to_goldengate(
                tag, table="db.t", fingerprint=9, pk_names=["id"], version=1,
                ts_micros=1,
            )
        )
        .withColumnRenamed("message", "payload")
    )
    cfg = {
        "source": {"format": "goldengate", "message_col": "payload"},
        "tables": {"db.t": {"keys": ["id"]}},
    }
    cat = TableCatalog(str(tmp_path / "gg"))
    run_pipeline(spark, wire, cfg, cat)
    assert cat.read(spark, "db.t").count() == 2


def test_pipeline_goldengate_message_col_with_bystander_message(spark, tmp_path):
    """ADVICE r5 regression: with a custom message_col, a bystander
    column literally named `message` must not collide — the old
    withColumnRenamed produced duplicate `message` columns and an
    ambiguous-reference failure in the decode path."""
    from change_data_capture_spark.sources import kafka as kf

    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    tag = base.withColumn("_change_type", F.lit("insert"))
    wire = (
        kf.goldengate_schema_message(spark, table="db.t", fingerprint=9,
                                     schema_json=base.schema.json())
        .unionByName(
            kf.table_changes_to_goldengate(
                tag, table="db.t", fingerprint=9, pk_names=["id"], version=1,
                ts_micros=1,
            )
        )
        .withColumnRenamed("message", "payload")
        .withColumn("message", F.lit("bystander: not the wire frame"))
    )
    cfg = {
        "source": {"format": "goldengate", "message_col": "payload"},
        "tables": {"db.t": {"keys": ["id"]}},
    }
    cat = TableCatalog(str(tmp_path / "ggb"))
    run_pipeline(spark, wire, cfg, cat)
    assert cat.read(spark, "db.t").count() == 2


def test_pipeline_maxwell_apply_ddl_in_band(spark, tmp_path):
    """source.apply_ddl: the Maxwell front door consumes table-create/
    table-alter events DDL-before-DML in the same call — a column added
    mid-feed lands for rows that carry it, earlier rows read NULL — and
    DDL for non-whitelisted tables never touches the catalog."""
    cfg = {
        "source": {"format": "maxwell", "apply_ddl": True},
        "tables": {"shop.orders": {"keys": ["id"]}},
    }
    cat = TableCatalog(str(tmp_path / "mx"))
    create = (
        '{"type":"table-create","database":"shop","table":"orders","ts":1,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"},{"type":"double","name":"amount"}],'
        '"primary-key":["id"]}}'
    )
    rogue = (
        '{"type":"table-create","database":"other","table":"t","ts":1,'
        '"def":{"database":"other","table":"t","columns":['
        '{"type":"bigint","name":"id"}],"primary-key":["id"]}}'
    )
    ins1 = ('{"database":"shop","table":"orders","type":"insert","ts":1,"xid":1,'
            '"data":{"id":1,"amount":10.0}}')
    b1 = spark.createDataFrame([(create,), (rogue,), (ins1,)], "message string")
    out1 = run_pipeline(spark, b1, cfg, cat)
    rep1 = {r["table"]: r for r in out1["ddl_applied"]}
    assert "error" not in rep1["shop.orders"] and "skipped" not in rep1["shop.orders"]
    # the rogue table's DDL is skipped but stays VISIBLE in the report
    # (ADVICE r5: the dead-letter anti-join removes all ddl_candidates,
    # so a silent skip would vanish from both channels)
    assert rep1["other.t"]["skipped"] == "table not whitelisted"
    assert cat.meta("other.t") is None  # whitelist enforced pre-announce

    alter = (
        '{"type":"table-alter","database":"shop","table":"orders","ts":2,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"},{"type":"double","name":"amount"},'
        '{"type":"varchar(16)","name":"ship_mode"}],"primary-key":["id"]}}'
    )
    ins2 = ('{"database":"shop","table":"orders","type":"insert","ts":2,"xid":2,'
            '"data":{"id":2,"amount":20.0,"ship_mode":"express"}}')
    b2 = spark.createDataFrame([(alter,), (ins2,)], "message string")
    run_pipeline(spark, b2, cfg, cat)
    got = {r["id"]: (r["amount"], r["ship_mode"])
           for r in cat.read(spark, "shop.orders").collect()}
    assert got == {1: (10.0, None), 2: (20.0, "express")}


def test_pipeline_stream_applies_in_band_ddl_per_batch(spark, tmp_path):
    """source.apply_ddl through run_pipeline_stream: each micro-batch
    consumes its DDL before its DML, so a mid-stream ALTER lands for
    the rows that follow it."""
    from change_data_capture_spark.pipeline import run_pipeline_stream

    cfg = {
        "source": {"format": "maxwell", "apply_ddl": True},
        "tables": {"shop.orders": {"keys": ["id"]}},
    }
    msgs_dir = str(tmp_path / "msgs")
    cat = TableCatalog(str(tmp_path / "cat"))
    create = (
        '{"type":"table-create","database":"shop","table":"orders","ts":1,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"},{"type":"double","name":"amount"}],'
        '"primary-key":["id"]}}'
    )
    ins1 = ('{"database":"shop","table":"orders","type":"insert","ts":1,"xid":1,'
            '"data":{"id":1,"amount":10.0}}')
    alter = (
        '{"type":"table-alter","database":"shop","table":"orders","ts":2,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"},{"type":"double","name":"amount"},'
        '{"type":"varchar(16)","name":"ship_mode"}],"primary-key":["id"]}}'
    )
    ins2 = ('{"database":"shop","table":"orders","type":"insert","ts":2,"xid":2,'
            '"data":{"id":2,"amount":20.0,"ship_mode":"express"}}')
    spark.createDataFrame([(create,), (ins1,)], "message string").coalesce(1)\
        .write.mode("append").parquet(msgs_dir)
    spark.createDataFrame([(alter,), (ins2,)], "message string").coalesce(1)\
        .write.mode("append").parquet(msgs_dir)
    run_pipeline_stream(
        spark, msgs_dir, cfg, cat, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    got = {r["id"]: (r["amount"], r["ship_mode"])
           for r in cat.read(spark, "shop.orders").collect()}
    assert got == {1: (10.0, None), 2: (20.0, "express")}


def test_pipeline_v1_dead_letters_and_apply_ddl_validation(spark, tmp_path):
    """Review regressions: (1) the wal2json_v1 leg classifies dead
    letters with the V1 schema — a valid v1 transaction is NOT
    'unparseable'; (2) source.apply_ddl on a non-binlog format fails
    fast naming the property; (3) with apply_ddl on, consumed DDL
    events are excluded from the dead-letter frame."""
    from change_data_capture_spark.pipeline import run_pipeline

    # (1) valid v1 txn + junk + unknown table
    v1 = ('{"xid":5,"nextlsn":"0/20","timestamp":"2021-02-02 12:00:00.123456+00",'
          '"change":[{"kind":"insert","schema":"db","table":"t",'
          '"columnnames":["id","v"],"columnvalues":[1,"a"]}]}')
    rogue = v1.replace('"table":"t"', '"table":"zz"')
    msgs = spark.createDataFrame([(v1,), ("junk",), (rogue,)], "message string")
    tschema = spark.createDataFrame([(1, "a")], "id long, v string").schema.json()
    cfg = {"source": {"format": "wal2json_v1"},
           "tables": {"db.t": {"keys": ["id"], "schema": tschema}}}
    cat = TableCatalog(str(tmp_path / "v1"))
    out = run_pipeline(spark, msgs, cfg, cat)
    reasons = sorted(r["reason"] for r in out["dead_letters"].collect())
    assert reasons == ["unknown_table", "unparseable"]
    assert cat.read(spark, "db.t").count() == 1

    # (2) apply_ddl rejected for formats with no structured DDL
    with pytest.raises(InvalidConfigError) as e:
        run_pipeline(
            spark, msgs,
            {"source": {"format": "wal2json_v1", "apply_ddl": True},
             "tables": {"db.t": {"keys": ["id"]}}},
            cat,
        )
    assert e.value.property == "source.apply_ddl"

    # (3) maxwell: a consumed DDL event is not also a dead letter
    create = (
        '{"type":"table-create","database":"shop","table":"orders","ts":1,'
        '"def":{"database":"shop","table":"orders","columns":['
        '{"type":"bigint","name":"id"}],"primary-key":["id"]}}'
    )
    ins = ('{"database":"shop","table":"orders","type":"insert","ts":1,"xid":1,'
           '"data":{"id":1}}')
    mcfg = {"source": {"format": "maxwell", "apply_ddl": True},
            "tables": {"shop.orders": {"keys": ["id"]}}}
    mcat = TableCatalog(str(tmp_path / "mx"))
    mout = run_pipeline(
        spark, spark.createDataFrame([(create,), (ins,)], "message string"),
        mcfg, mcat)
    assert mout["ddl_applied"] and mout["dead_letters"].count() == 0


def test_pipeline_stream_kafka_transport_parity_with_injected_frames(
    spark, tmp_path, monkeypatch
):
    """VERDICT r5 directive #5: exercise the kafka transport leg
    end-to-end MINUS the socket. The injected stream carries Kafka's
    exact wire shape (binary key/value + topic/partition/offset
    metadata); everything downstream of pipeline._kafka_stream — the
    binary casts under configured column names, the per-batch decode,
    normalize, apply — is the real kafka code path. The applied table
    must be byte-identical to the file-transport run of the same
    config. Uses mongodb so BOTH the value->message and key->key_col
    casts are exercised."""
    from change_data_capture_spark import pipeline

    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "_id long, name string, bal double",
    )
    wire = mg.encode_mongodb_json(
        base, table="appdb.users", op="c",
        after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=1,
    )

    # file-transport reference run
    file_cfg = {
        "source": {"format": "mongodb"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    file_msgs = str(tmp_path / "file_msgs")
    wire.write.mode("append").parquet(file_msgs)
    file_cat = TableCatalog(str(tmp_path / "file_cat"))
    pipeline.run_pipeline_stream(
        spark, file_msgs, file_cfg, file_cat, str(tmp_path / "file_ckpt")
    )

    # kafka-transport run: same frames in Kafka's wire schema
    kwire_dir = str(tmp_path / "kwire")
    wire.select(
        F.encode(F.col("key"), "UTF-8").alias("key"),
        F.encode(F.col("message"), "UTF-8").alias("value"),
        F.lit("cdc.appdb.users").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    ).write.mode("append").parquet(kwire_dir)

    captured: dict = {}

    def fake_kafka_stream(sp, kopts):
        captured["opts"] = kopts
        return sp.readStream.schema(
            "key binary, value binary, topic string, partition int, "
            "offset bigint, timestamp timestamp, timestampType int"
        ).parquet(kwire_dir)

    monkeypatch.setattr(pipeline, "_kafka_stream", fake_kafka_stream)
    kafka_cfg = {
        "source": {"format": "mongodb", "transport": "kafka",
                   "broker": "broker1:9092", "topic": "cdc.appdb.users",
                   "initial_offset": -2},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    kafka_cat = TableCatalog(str(tmp_path / "kafka_cat"))
    pipeline.run_pipeline_stream(
        spark, None, kafka_cfg, kafka_cat, str(tmp_path / "kafka_ckpt")
    )
    # the validated option set reached the reader seam
    assert captured["opts"]["kafka.bootstrap.servers"] == "broker1:9092"
    assert captured["opts"]["startingOffsets"] == "earliest"

    got_file = sorted(tuple(r) for r in file_cat.read(spark, "appdb.users").collect())
    got_kafka = sorted(tuple(r) for r in kafka_cat.read(spark, "appdb.users").collect())
    assert got_kafka == got_file and len(got_kafka) == 3
    assert (
        file_cat.read(spark, "appdb.users").schema
        == kafka_cat.read(spark, "appdb.users").schema
    )


def test_pipeline_stream_dead_letter_sink(spark, tmp_path):
    """r6 review finding: the batch front door RETURNS dead letters,
    but inside foreachBatch there is no caller — without a sink a
    streaming feed's quarantined messages vanished. dead_letter_dir
    persists each micro-batch's dead letters with its epoch."""
    from change_data_capture_spark.pipeline import run_pipeline_stream

    base = spark.createDataFrame([(1, "a", 1.0)], "id long, name string, bal double")
    good = debezium.encode_debezium_json(
        base, table="db.t", op="c", before=None,
        after=F.struct(F.col("id"), F.col("name"), F.col("bal")), ts_ms=1,
    )
    junk = spark.createDataFrame([("{not json",)], "message string")
    msgs_dir, dlq = str(tmp_path / "msgs"), str(tmp_path / "dlq")
    good.unionByName(junk).write.mode("append").parquet(msgs_dir)
    cfg = {
        "source": {"format": "debezium"},
        "tables": {"db.t": {"keys": ["id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "cat"))
    run_pipeline_stream(spark, msgs_dir, cfg, cat, str(tmp_path / "ckpt"),
                        dead_letter_dir=dlq)
    assert cat.read(spark, "db.t").count() == 1
    dl = spark.read.parquet(str(tmp_path / "dlq" / "decode")).collect()
    assert len(dl) == 1 and dl[0]["reason"] == "unparseable"
    assert dl[0]["batch_epoch"] == 0


def test_pipeline_stream_kafka_tombstones_split_from_dead_letters(
    spark, tmp_path, monkeypatch
):
    """r6 review finding: compacted-topic tombstones (null value, key
    present) are protocol metadata — they must not decode (no phantom
    `unparseable` rows) and, with a DLQ configured, their keys are
    recorded separately."""
    from change_data_capture_spark import pipeline

    base = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)],
                                 "_id long, name string, bal double")
    wire = mg.encode_mongodb_json(
        base, table="appdb.users", op="c",
        after=F.struct(F.col("_id"), F.col("name"), F.col("bal")),
        doc_id=F.col("_id"), ts_ms=1,
    )
    kwire_dir, dlq = str(tmp_path / "kwire"), str(tmp_path / "dlq")
    frames = wire.select(
        F.encode(F.col("key"), "UTF-8").alias("key"),
        F.encode(F.col("message"), "UTF-8").alias("value"),
    ).unionByName(
        spark.createDataFrame([("gone-key",)], "k string").select(
            F.encode(F.col("k"), "UTF-8").alias("key"),
            F.lit(None).cast("binary").alias("value"),  # the tombstone
        )
    )
    frames.select(
        "key", "value", F.lit("t").alias("topic"), F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"), F.lit(0).alias("timestampType"),
    ).write.mode("append").parquet(kwire_dir)

    monkeypatch.setattr(
        pipeline, "_kafka_stream",
        lambda sp, kopts: sp.readStream.schema(
            "key binary, value binary, topic string, partition int, "
            "offset bigint, timestamp timestamp, timestampType int"
        ).parquet(kwire_dir),
    )
    cfg = {
        "source": {"format": "mongodb", "transport": "kafka",
                   "broker": "b:9092", "topic": "t"},
        "tables": {"appdb.users": {"keys": ["_id"], "schema": base.schema.json()}},
    }
    cat = TableCatalog(str(tmp_path / "cat"))
    pipeline.run_pipeline_stream(spark, None, cfg, cat, str(tmp_path / "ckpt"),
                                 dead_letter_dir=dlq)
    assert cat.read(spark, "appdb.users").count() == 2
    tomb = spark.read.parquet(str(tmp_path / "dlq" / "tombstones")).collect()
    assert [r["key"] for r in tomb] == ["gone-key"]
    # no phantom unparseable rows from the tombstone
    import os
    if os.path.isdir(str(tmp_path / "dlq" / "decode")):
        dl = spark.read.parquet(str(tmp_path / "dlq" / "decode"))
        assert dl.count() == 0


def test_undecodable_skip_routes_and_continues(spark, tmp_path):
    """source.undecodable=skip (r7): a value the registered schema
    cannot cast ('N/A' in a double column) must not kill the batch
    under ANSI — the row quarantines into report['undecodable_rows']
    and every other row lands. Default 'raise' keeps fail-loud."""
    import pytest

    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.pipeline import run_pipeline

    schema_json = (
        '{"type":"struct","fields":['
        '{"name":"id","type":"long","nullable":false,"metadata":{}},'
        '{"name":"amount","type":"double","nullable":true,"metadata":{}}]}'
    )
    msgs = spark.createDataFrame(
        [
            ('{"op":"c","source":{"db":"db","table":"t","ts_ms":1},'
             '"after":{"id":"1","amount":"10.5"}}',),
            ('{"op":"c","source":{"db":"db","table":"t","ts_ms":2},'
             '"after":{"id":"2","amount":"N/A"}}',),
            ('{"op":"c","source":{"db":"db","table":"t","ts_ms":3},'
             '"after":{"id":"3","amount":"30.25"}}',),
        ],
        "message string",
    )
    base_cfg = {
        "source": {"format": "debezium"},
        "tables": {"db.t": {"keys": ["id"], "schema": schema_json}},
    }

    # default: fail-loud under ANSI
    with pytest.raises(Exception):
        run_pipeline(spark, msgs, base_cfg, TableCatalog(str(tmp_path / "c1")))

    # skip: good rows land, the bad row is quarantined with its column
    cfg = {**base_cfg, "source": {"format": "debezium", "undecodable": "skip"}}
    cat = TableCatalog(str(tmp_path / "c2"))
    rep = run_pipeline(spark, msgs, cfg, cat)
    got = {r["id"]: r["amount"] for r in cat.read(spark, "db.t").collect()}
    assert got == {1: 10.5, 3: 30.25}
    q = rep["undecodable_rows"].collect()
    assert len(q) == 1
    assert q[0]["rows_values"]["id"] == "2"
    assert list(q[0]["bad_columns"]) == ["amount"]
    # the skipped row's version still advanced the watermark — the
    # quarantine frame is the only record (documented contract)
    assert int(cat.meta("db.t")["applied_version"]) == 3


def test_stream_on_report_delivers_batch_reports(spark, tmp_path):
    """r9: run_pipeline_stream(on_report=...) hands each micro-batch's
    run_pipeline report (tables, ddl_applied, quarantine frames) to
    the caller's metrics sink."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.pipeline import run_pipeline_stream

    msgs = spark.createDataFrame(
        [
            ('{"op":"c","source":{"db":"db","table":"t","ts_ms":1},'
             '"after":{"id":"1","v":"a"}}',),
            ('{"op":"c","source":{"db":"db","table":"t","ts_ms":2},'
             '"after":{"id":"2","v":"b"}}',),
        ],
        "message string",
    )
    src = str(tmp_path / "msgs")
    msgs.write.parquet(src)
    cat = TableCatalog(str(tmp_path / "cat"))
    schema_json = spark.createDataFrame([], "id long, v string").schema.json()
    got: list = []
    run_pipeline_stream(
        spark, src,
        {"source": {"format": "debezium"},
         "tables": {"db.t": {"keys": ["id"], "schema": schema_json}}},
        cat, str(tmp_path / "ckpt"),
        on_report=lambda epoch, rep: got.append((epoch, rep)),
    )
    assert len(got) == 1
    _, rep = got[0]
    assert rep["tables"] == ["db.t"]
    assert cat.read(spark, "db.t").count() == 2
