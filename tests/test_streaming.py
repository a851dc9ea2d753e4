"""Streaming pipeline tests: changelog files -> stateful DDL dedup ->
foreachBatch apply -> materialized tables; restart/checkpoint resume."""

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog
from change_data_capture_spark.changelog import (
    ddl_record,
    dml_records,
    mutation_changelog,
    snapshot_changelog,
)
from change_data_capture_spark.schema import CHANGE_SCHEMA
from change_data_capture_spark.streaming import (
    dedupe_ddl_stream,
    run_apply_stream,
    write_changelog,
)
from conftest import load


def test_stream_apply_end_to_end(spark, sf_dir, tmp_path):
    nation = load(spark, sf_dir, "nation")
    logdir = str(tmp_path / "log")
    write_changelog(snapshot_changelog(nation, "tpch.nation", ["n_nationkey"]), logdir)

    cat = TableCatalog(str(tmp_path / "cat"))
    run_apply_stream(spark, logdir, cat, str(tmp_path / "ckpt"))
    got = cat.read(spark, "tpch.nation")
    assert sorted(r["n_nationkey"] for r in got.collect()) == sorted(
        r["n_nationkey"] for r in nation.collect()
    )


def test_stream_resume_applies_only_new_files(spark, sf_dir, tmp_path):
    region = load(spark, sf_dir, "region")
    logdir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    cat = TableCatalog(str(tmp_path / "cat"))

    write_changelog(snapshot_changelog(region, "tpch.region", ["r_regionkey"]), logdir)
    run_apply_stream(spark, logdir, cat, ckpt)
    assert cat.read(spark, "tpch.region").count() == region.count()

    # second batch of files: mutations; restart the stream on the same
    # checkpoint — only the new files are processed.
    mut = mutation_changelog(
        region,
        "tpch.region",
        ["r_regionkey"],
        delete_where=F.col("r_regionkey") == 0,
        delete_version=2,
    )
    write_changelog(mut, logdir)
    run_apply_stream(spark, logdir, cat, ckpt)
    got = cat.read(spark, "tpch.region")
    assert got.count() == region.count() - 1
    assert got.filter("r_regionkey = 0").count() == 0


def test_json_changelog_stream_roundtrip(spark, sf_dir, tmp_path):
    """JSON-lines changelog files (non-Spark-producer interop) stream
    through the same dedup+apply path as parquet."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.streaming import run_apply_stream, write_changelog

    region = load(spark, sf_dir, "region")
    log_dir, ckpt = str(tmp_path / "jlog"), str(tmp_path / "jckpt")
    write_changelog(
        snapshot_changelog(region, "t.region", ["r_regionkey"]), log_dir, fmt="json"
    )
    cat = TableCatalog(str(tmp_path / "jcat"))
    run_apply_stream(spark, log_dir, cat, ckpt, fmt="json")
    got = cat.read(spark, "t.region")
    assert got.count() == region.count()
    assert set(got.columns) >= set(region.columns)


def test_windowed_agg_runs_as_stream(spark, sf_dir, tmp_path):
    """The windowed_event_counts plan executes as a real Structured
    Streaming query (watermark + event-time tumbling window) and its
    final counts equal the batch execution of the same plan."""
    import os

    from pyspark.sql import functions as F

    from change_data_capture_spark.streaming import windowed_event_counts

    from change_data_capture_spark.registry import _events

    ev = _events(spark, sf_dir)
    src = str(tmp_path / "ev_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    counts = windowed_event_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in windowed_event_counts(ev).collect()
    }
    assert got == want and len(want) > 0


def test_stateful_ddl_dedup_across_batches(spark, tmp_path):
    base = spark.createDataFrame([(1, "a")], "id bigint, v string")
    schema_json = base.schema.json()
    logdir = str(tmp_path / "log")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: DDL + insert; batch 2: SAME DDL again + another insert
    write_changelog(ddl_record(spark, "t.x", schema_json), logdir)
    write_changelog(dml_records(base, "t.x", ["id"], version=1), logdir)
    write_changelog(ddl_record(spark, "t.x", schema_json), logdir)
    b2 = spark.createDataFrame([(2, "b")], "id bigint, v string")
    write_changelog(dml_records(b2, "t.x", ["id"], version=2), logdir)

    stream = dedupe_ddl_stream(
        spark.readStream.schema(CHANGE_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .load(logdir)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(outdir)
    # 1 DDL survives (second suppressed by state), 2 DMLs pass through
    assert out.filter(F.col("ddl").isNotNull()).count() == 1
    assert out.filter(F.col("dml").isNotNull()).count() == 2


def test_dedupe_ddl_batch_bypasses_ddl_free_batches(spark):
    """The foreachBatch dedup returns the INPUT FRAME OBJECT for a
    DML-only micro-batch — proof the common case pays one pruned
    collect and zero plan rewrite — and likewise when every DDL row is
    novel (nothing suppressed). The input state dict is NEVER mutated
    (two-phase contract, r6 review: commit updates only after a
    successful apply)."""
    from change_data_capture_spark.streaming import dedupe_ddl_batch

    base = spark.createDataFrame([(1, "a")], "id bigint, v string")
    dml_only = dml_records(base, "t.x", ["id"], version=1)
    state: dict = {}
    out, upd = dedupe_ddl_batch(dml_only, state)
    assert out is dml_only and upd == {} and state == {}

    with_ddl = ddl_record(spark, "t.x", base.schema.json()).unionByName(dml_only)
    out2, upd2 = dedupe_ddl_batch(with_ddl, state)
    assert out2 is with_ddl
    assert upd2 == {"t.x": base.schema.json()}
    assert state == {}, "frame-build must not mutate the caller's state"


def test_dedupe_ddl_batch_suppresses_repeats_across_batches(spark):
    """Consecutive-duplicate suppression with driver-dict carry-over:
    batch 2 re-announcing batch 1's schema is dropped; a changed
    schema then the original again both pass (A,B,A keeps all —
    last-announcement-wins semantics, same as the stateful leg)."""
    from change_data_capture_spark.streaming import dedupe_ddl_batch

    s_a = spark.createDataFrame([(1, "a")], "id bigint, v string").schema.json()
    s_b = spark.createDataFrame([(1, "a", 0.0)], "id bigint, v string, w double").schema.json()
    state: dict = {}

    b1, u1 = dedupe_ddl_batch(ddl_record(spark, "t.x", s_a), state)
    assert b1.filter(F.col("ddl").isNotNull()).count() == 1
    state.update(u1)  # the caller commits after a successful apply

    base = spark.createDataFrame([(2, "b")], "id bigint, v string")
    b2_in = ddl_record(spark, "t.x", s_a).unionByName(
        dml_records(base, "t.x", ["id"], version=2)
    )
    b2, u2 = dedupe_ddl_batch(b2_in, state)
    assert b2.filter(F.col("ddl").isNotNull()).count() == 0  # suppressed
    assert b2.filter(F.col("dml").isNotNull()).count() == 1  # DML intact
    state.update(u2)

    b3_in = (
        ddl_record(spark, "t.x", s_b)
        .unionByName(ddl_record(spark, "t.x", s_b))
        .unionByName(ddl_record(spark, "t.y", s_a))
    )
    b3, u3 = dedupe_ddl_batch(b3_in, state)
    got = [
        (r["ddl"]["table"], r["ddl"]["schema"])
        for r in b3.filter(F.col("ddl").isNotNull()).collect()
    ]
    assert sorted(got) == sorted([("t.x", s_b), ("t.y", s_a)])

    # failed-apply semantics: WITHOUT committing u3, a retry sees the
    # same novel DDL again (nothing was poisoned at frame-build time)
    b3r, _ = dedupe_ddl_batch(ddl_record(spark, "t.x", s_b), state)
    assert b3r.filter(F.col("ddl").isNotNull()).count() == 1
    state.update(u3)
    # committed: now the same re-announcement is suppressed
    b3s, _ = dedupe_ddl_batch(ddl_record(spark, "t.x", s_b), state)
    assert b3s.filter(F.col("ddl").isNotNull()).count() == 0
    # A again after B: passes (consecutive semantics, not seen-ever)
    b4, _ = dedupe_ddl_batch(ddl_record(spark, "t.x", s_a), state)
    assert b4.filter(F.col("ddl").isNotNull()).count() == 1


def test_stream_apply_dedups_repeated_ddl_across_microbatches(spark, tmp_path):
    """End-to-end run_apply_stream with a re-announced schema in a
    later micro-batch: the duplicate is suppressed driver-side and the
    applied table is correct (same observable as the old stateful
    leg)."""
    base = spark.createDataFrame([(1, "a")], "id bigint, v string")
    schema_json = base.schema.json()
    logdir = str(tmp_path / "log")
    write_changelog(ddl_record(spark, "t.x", schema_json), logdir)
    write_changelog(dml_records(base, "t.x", ["id"], version=1), logdir)
    write_changelog(ddl_record(spark, "t.x", schema_json), logdir)  # dup
    b2 = spark.createDataFrame([(2, "b")], "id bigint, v string")
    write_changelog(dml_records(b2, "t.x", ["id"], version=2), logdir)

    cat = TableCatalog(str(tmp_path / "cat"))
    run_apply_stream(
        spark, logdir, cat, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    got = {r["id"]: r["v"] for r in cat.read(spark, "t.x").collect()}
    assert got == {1: "a", 2: "b"}


def test_sessionize_batch_matches_window_query(spark, sf_dir):
    """Batch execution of the stateful sessionizer agrees with the
    q_user_sessions window formulation on session counts per user."""
    from pyspark.sql import Window, functions as F

    from change_data_capture_spark.streaming import sessionize_stream

    from change_data_capture_spark.registry import _events

    ev = _events(spark, sf_dir)
    got = {
        r["user_id"]: r["n"]
        for r in sessionize_stream(ev, gap_seconds=1800)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(F.lag("ts").over(w).isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    want = {
        r["user_id"]: r["n"]
        for r in ev.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n"))
        .collect()
    }
    assert got == want and len(want) > 0


def test_sessionize_stream_stitches_and_times_out(spark, tmp_path):
    """Sessions survive microbatch boundaries (events 10 min apart in
    different files join one session) and open sessions close via
    event-time timeout once the watermark passes."""
    import datetime as dt
    import os

    from change_data_capture_spark.streaming import sessionize_stream

    def ts(minute):
        return dt.datetime(2024, 1, 1, 0, minute)

    schema = "user_id bigint, ts timestamp, value double"
    srcdir = str(tmp_path / "sess_src")
    os.makedirs(srcdir)
    # file 1: two events 10 min apart; file 2: third event in-gap,
    # then a far-future event that both splits a new session for user
    # 1 and advances the watermark far enough to time everything out.
    spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(10), 2.0)], schema
    ).coalesce(1).write.mode("append").parquet(srcdir)
    spark.createDataFrame(
        [(1, ts(20), 3.0), (2, dt.datetime(2024, 1, 2), 9.0)], schema
    ).coalesce(1).write.mode("append").parquet(srcdir)
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3), 5.0)], schema
    ).coalesce(1).write.mode("append").parquet(srcdir)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(srcdir)
    )
    out = sessionize_stream(stream, gap_seconds=1800, watermark_delay="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # user 1's first session stitches all three 10-min-apart events
    assert (1, ts(0), ts(20), 3, 6.0) in rows


def test_sessionize_stream_late_event_extends_not_regresses(spark, tmp_path):
    """A late event (within the watermark horizon) arriving in a LATER
    micro-batch with ts inside the open session must extend the
    session's bounds, never regress them: before the r7 review fix,
    the fold set last_ts = t unconditionally, so a late event shrank
    session_end below already-seen events and pulled the state timeout
    earlier (premature close — silent session truncation)."""
    import datetime as dt
    import os

    from change_data_capture_spark.streaming import sessionize_stream

    def ts(minute, second=0):
        return dt.datetime(2024, 1, 1, 0, minute, second)

    schema = "user_id bigint, ts timestamp, value double"
    srcdir = str(tmp_path / "late_src")
    os.makedirs(srcdir)
    # batch 1: session open at [10, 20]
    spark.createDataFrame(
        [(1, ts(10), 1.0), (1, ts(20), 2.0)], schema
    ).coalesce(1).write.mode("append").parquet(srcdir)
    # batch 2: LATE event at minute 5 — watermark_delay=2h keeps it in
    # the horizon; it must EXTEND session_start down to 5 and leave
    # session_end at 20
    spark.createDataFrame([(1, ts(5), 4.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(srcdir)
    # batch 3: a far-future event to advance the watermark past the
    # session's (end + gap) so the timeout closes it
    spark.createDataFrame(
        [(2, dt.datetime(2024, 1, 5), 9.0)], schema
    ).coalesce(1).write.mode("append").parquet(srcdir)
    # batch 4: one more tick so the timeout fires after the watermark
    # from batch 3 is committed
    spark.createDataFrame(
        [(2, dt.datetime(2024, 1, 6), 9.0)], schema
    ).coalesce(1).write.mode("append").parquet(srcdir)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(srcdir)
    )
    out = sessionize_stream(stream, gap_seconds=1800, watermark_delay="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM late_sessions WHERE user_id = 1").collect()
    }
    assert rows == {(1, ts(5), ts(20), 3, 7.0)}


def test_stream_document_dedup_across_batches(spark, tmp_path):
    """dedupe_documents_stream suppresses redelivered content across
    micro-batches: batch 2 redelivers batch 1's rows plus one new doc;
    only the new doc is emitted in the second trigger."""
    from change_data_capture_spark.streaming import dedupe_documents_stream

    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "in")
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(b1.schema).parquet(in_dir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        dedupe_documents_stream(stream)
        .select("doc_id", "text")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    assert got == [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")]


def test_stream_document_dedup_state_survives_restart(spark, tmp_path):
    """The dedup state is checkpointed: a restarted stream (same
    checkpoint) still suppresses content it saw before the restart."""
    from change_data_capture_spark.streaming import dedupe_documents_stream

    schema = "doc_id long, text string"
    in_dir = str(tmp_path / "in")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            dedupe_documents_stream(stream)
            .select("doc_id", "text")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(1, "alpha"), (2, "beta")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_once()
    # restart: redeliver old content (new file) + one new doc
    spark.createDataFrame([(9, "alpha"), (3, "gamma")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run_once()
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma")]


def test_interval_join_stream_matches_batch(spark, sf_dir, tmp_path):
    """The watermarked stream-stream interval join emits exactly the
    batch join's rows once all data is within the watermark."""
    from change_data_capture_spark.streaming import interval_join_streams
    from tests.conftest import load

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    in_dir = str(tmp_path / "in")
    ev.coalesce(2).write.mode("append").parquet(in_dir)

    def split(df):
        # watermark needs TIMESTAMP (session-zoned); fixture ts is NTZ
        ts = F.col("ts").cast("timestamp")
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", ts.alias("click_ts")
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            ts.alias("purchase_ts"),
        )
        return clicks, purchases

    bc, bp = split(ev)
    expect = sorted(
        (r["click_id"], r["purchase_id"])
        for r in interval_join_streams(
            bc, bp, key="user_id", left_ts="click_ts", right_ts="purchase_ts",
            delay="6 hours",
        ).collect()
    )
    assert expect, "fixture produced no joinable pairs"

    stream = spark.readStream.schema(ev.schema).parquet(in_dir)
    sc, sp = split(stream)
    joined = interval_join_streams(
        sc, sp, key="user_id", left_ts="click_ts", right_ts="purchase_ts",
        delay="6 hours",
    ).select("click_id", "purchase_id")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["click_id"], r["purchase_id"]) for r in spark.read.parquet(out_dir).collect()
    )
    assert got == expect


def test_interval_join_watermarks_gate_per_side(spark, sf_dir, tmp_path):
    """Mixed batch/stream calls must watermark exactly the streaming
    side(s): a batch left with a streaming right previously got NO
    watermark anywhere (the gate keyed off left.isStreaming only),
    an unbounded-state shape."""
    from change_data_capture_spark.streaming import interval_join_streams
    from tests.conftest import load

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    in_dir = str(tmp_path / "in")
    ev.limit(100).write.mode("append").parquet(in_dir)

    ts = F.col("ts").cast("timestamp")
    batch_left = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", ts.alias("click_ts")
    )
    stream_right = (
        spark.readStream.schema(ev.schema)
        .parquet(in_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"), "user_id", ts.alias("purchase_ts")
        )
    )
    joined = interval_join_streams(
        batch_left, stream_right,
        key="user_id", left_ts="click_ts", right_ts="purchase_ts", delay="6 hours",
    )
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan, "streaming right side lost its watermark"

    # and the pure stream-stream shape watermarks BOTH sides
    stream_left = (
        spark.readStream.schema(ev.schema)
        .parquet(in_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", ts.alias("click_ts"))
    )
    both = interval_join_streams(
        stream_left, stream_right,
        key="user_id", left_ts="click_ts", right_ts="purchase_ts", delay="6 hours",
    )
    plan2 = both._jdf.queryExecution().analyzed().toString()
    assert plan2.count("EventTimeWatermark") == 2


def test_trending_topk_boundary_and_tiebreak(spark, sf_dir):
    """q_trending_topk: per hour at most 3 rows, rnk dense from 1, and
    the (count desc, event_type asc) order is what rnk encodes — pinned
    against the real events fixture so builder and oracle cannot drift
    together unnoticed."""
    from change_data_capture_spark import registry

    rows = registry.queries()["q_trending_topk"](spark, sf_dir).collect()
    assert rows, "fixture produced no hourly groups"
    by_hour = {}
    for r in rows:
        by_hour.setdefault(r.hour, []).append(r)
    for hour, group in by_hour.items():
        group.sort(key=lambda r: r.rnk)
        assert 1 <= len(group) <= 3
        assert [r.rnk for r in group] == list(range(1, len(group) + 1))
        key = [(-r.n, r.event_type) for r in group]
        assert key == sorted(key), f"rank order broken in {hour}"


def test_stream_neardup_against_corpus_foreachbatch(spark, tmp_path):
    """Streaming NEAR-dup gate: each micro-batch of incoming docs is
    LSH-checked against the persisted corpus via minhash_lsh_against
    inside foreachBatch — the daily-ingest composition (per-batch cost
    O(new + collisions), the corpus side is the persisted index). A
    batch doc near-identical to a corpus doc is flagged; novel docs
    pass."""
    from change_data_capture_spark.extensions import dedup

    body = "the quick brown fox jumps over the lazy dog again and again in autumn "
    corpus = spark.createDataFrame(
        [(100, body * 4), (101, "completely different corpus material here " * 5)],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(1, body * 4 + "tail"), (2, "novel content one " * 6)],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "novel content two " * 6), (4, body * 4 + "coda")],
        "doc_id long, text string",
    )
    in_dir = str(tmp_path / "in")
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    flagged: list[tuple] = []

    def gate(batch_df, epoch_id):
        hits = dedup.minhash_lsh_against(
            batch_df, corpus, n=5, k=32, bands=8, threshold=0.8
        )
        flagged.extend((r.a_id, r.b_id) for r in hits.collect())

    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert (1, 100) in flagged and (4, 100) in flagged, flagged
    assert not any(a in (2, 3) for a, _ in flagged), flagged


def test_stream_apply_records_watermark_history_for_asof(spark, sf_dir, tmp_path):
    """Streaming applies record the same per-version watermark history
    as batch applies, so a consistent cross-table AS-OF cut works on a
    table maintained by run_apply_stream: the second run (restart on
    the same checkpoint) publishes at watermark 5, and the cut at 3
    still reads the first run's snapshot state."""
    region = load(spark, sf_dir, "region")
    logdir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    cat = TableCatalog(str(tmp_path / "cat"))

    write_changelog(snapshot_changelog(region, "tpch.region", ["r_regionkey"]), logdir)
    run_apply_stream(spark, logdir, cat, ckpt)
    mut = mutation_changelog(
        region, "tpch.region", ["r_regionkey"],
        update_where=F.col("r_regionkey") % 2 == 0,
        update_set={"r_name": F.concat(F.col("r_name"), F.lit("_s"))},
        update_version=5,
    )
    write_changelog(mut, logdir)
    run_apply_stream(spark, logdir, cat, ckpt)

    assert cat.version_at_watermark("tpch.region", 3) == 1
    old = cat.read_asof_watermark(spark, "tpch.region", 3)
    assert old.filter(F.col("r_name").endswith("_s")).count() == 0
    cur = cat.read_asof_watermark(spark, "tpch.region", 5)
    assert cur.filter(F.col("r_name").endswith("_s")).count() == 3  # keys 0,2,4


def test_event_rate_anomaly_flags_bursts(spark, tmp_path):
    """Hand-built stream: a flat baseline then one 10x burst hour —
    only the burst flags, warmup hours never flag."""
    import datetime as dt

    from change_data_capture_spark import registry

    rows = []
    eid = 0
    for hour in range(30):
        n = 100 if hour == 28 else 10
        for i in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(hours=hour, seconds=i),
                 i % 7, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/events.parquet")
    out = {r["hour"].hour + 24 * (r["hour"].day - 1): r
           for r in registry.REGISTRY["q_event_rate_anomaly"].fn(spark, sf).collect()}
    flagged = [h for h, r in out.items() if r["is_anomaly"]]
    assert flagged == [28]
    assert out[28]["rate_ratio"] == 10.0  # 100 vs trailing mean 10
    # warmup: first 6 buckets can never flag
    assert all(not out[h]["is_anomaly"] for h in range(6))


def test_stream_document_dedup_watermarked_suppresses_restamped_redelivery(
    spark, tmp_path
):
    """Watermarked mode (r7 review): a redelivered document typically
    carries a NEW event time (re-crawl stamp). Within the watermark
    horizon it must still be suppressed — dropDuplicatesWithinWatermark
    keys on content alone, unlike dropDuplicates([hash, ts]) which
    would emit every re-stamped duplicate."""
    from change_data_capture_spark.streaming import dedupe_documents_stream

    schema = "doc_id long, text string, ts timestamp"
    in_dir = str(tmp_path / "in")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = "2024-01-01 00:00:00"
    t1 = "2024-01-01 00:10:00"  # re-crawl 10 min later, inside the horizon
    b1 = spark.sql(
        f"SELECT 1L doc_id, 'alpha' text, timestamp'{t0}' ts "
        f"UNION ALL SELECT 2L, 'beta', timestamp'{t0}'"
    )
    b2 = spark.sql(
        f"SELECT 9L doc_id, 'alpha' text, timestamp'{t1}' ts "
        f"UNION ALL SELECT 3L, 'gamma', timestamp'{t1}'"
    )
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    # one file per trigger: the redelivery must arrive in a LATER
    # micro-batch (in one batch, which copy survives is arbitrary)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        dedupe_documents_stream(stream, watermark=("ts", "1 hour"))
        .select("doc_id", "text")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    # the re-stamped 'alpha' (doc_id 9) is suppressed; 'gamma' passes
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma")]


def test_sessionize_drops_null_event_times(spark):
    """A null ts crosses Arrow as NaT (int64 min) and would poison the
    gap arithmetic of its user's whole session history — dropped up
    front (r7)."""
    from change_data_capture_spark.streaming import sessionize_stream

    ev = spark.sql(
        "SELECT 1L user_id, timestamp'2024-01-01 00:00:00' ts, 1.0 value "
        "UNION ALL SELECT 1L, NULL, 9.0 "
        "UNION ALL SELECT 1L, timestamp'2024-01-01 00:10:00', 2.0"
    )
    rows = sessionize_stream(ev, gap_seconds=1800).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == 2 and r["total_value"] == 3.0


def test_run_apply_stream_skip_routes_quarantine_to_sink(spark, tmp_path):
    """r8 parity with the declarative front door: the hand-wired
    streaming path supports route-and-continue — a poisoned value in a
    micro-batch quarantines into <dead_letter_dir>/typed (its ONLY
    durable record, the watermark advances past it) while the batch's
    valid rows apply; the stream does not die."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.changelog import ddl_record
    from change_data_capture_spark.envelope import wrap_dml
    from change_data_capture_spark.streaming import (
        run_apply_stream,
        write_changelog,
    )

    schema_json = spark.createDataFrame([], "id long, amount long").schema.json()
    dml = wrap_dml(spark.createDataFrame(
        [
            ("INSERT", "s.t", ["id"], None, {"id": "1", "amount": "10"}, 1, 0),
            ("INSERT", "s.t", ["id"], None, {"id": "2", "amount": "N/A"}, 2, 0),
            ("INSERT", "s.t", ["id"], None, {"id": "3", "amount": "30"}, 3, 0),
        ],
        "op_type string, table string, primary_keys array<string>, "
        "rows_schema string, rows_values map<string,string>, "
        "change_tracking_version long, cdc_current_timestamp long",
    ))
    log = ddl_record(spark, "s.t", schema_json).unionByName(dml)
    log_dir = str(tmp_path / "log")
    write_changelog(log, log_dir)
    cat = TableCatalog(str(tmp_path / "cat"))
    dlq_dir = str(tmp_path / "dlq")
    run_apply_stream(
        spark, log_dir, cat, str(tmp_path / "ckpt"),
        undecodable="skip", dead_letter_dir=dlq_dir,
    )
    got = {r.id: r.amount for r in cat.read(spark, "s.t").collect()}
    assert got == {1: 10, 3: 30}
    q = spark.read.parquet(dlq_dir + "/typed").collect()
    assert [(r.change_tracking_version, list(r.bad_columns)) for r in q] == [
        (2, ["amount"])
    ]
    assert all(r.batch_epoch is not None for r in q)


def test_dead_letter_sink_idempotent_under_checkpoint_replay(spark, tmp_path):
    """r8: foreachBatch side effects are at-least-once — replaying the
    stream from scratch (lost checkpoint, the worst case) must not
    duplicate quarantine rows. The sink is epoch-partitioned dynamic
    overwrite: the replayed epoch overwrites ITS OWN partition; the
    catalog stays correct via the version watermark as before."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.changelog import ddl_record
    from change_data_capture_spark.envelope import wrap_dml
    from change_data_capture_spark.streaming import (
        run_apply_stream,
        write_changelog,
    )

    schema_json = spark.createDataFrame([], "id long, amount long").schema.json()
    dml = wrap_dml(spark.createDataFrame(
        [("INSERT", "r.t", ["id"], None, {"id": "1", "amount": "bad"}, 1, 0),
         ("INSERT", "r.t", ["id"], None, {"id": "2", "amount": "2"}, 2, 0)],
        "op_type string, table string, primary_keys array<string>, "
        "rows_schema string, rows_values map<string,string>, "
        "change_tracking_version long, cdc_current_timestamp long",
    ))
    log_dir = str(tmp_path / "log")
    write_changelog(ddl_record(spark, "r.t", schema_json).unionByName(dml), log_dir)
    cat = TableCatalog(str(tmp_path / "cat"))
    dlq_dir = str(tmp_path / "dlq")
    run_apply_stream(spark, log_dir, cat, str(tmp_path / "ckpt1"),
                     undecodable="skip", dead_letter_dir=dlq_dir)
    first = spark.read.parquet(dlq_dir + "/typed").count()
    assert first == 1
    # full replay: FRESH checkpoint, same log, same catalog, same sink
    run_apply_stream(spark, log_dir, cat, str(tmp_path / "ckpt2"),
                     undecodable="skip", dead_letter_dir=dlq_dir)
    again = spark.read.parquet(dlq_dir + "/typed").collect()
    assert len(again) == 1 and again[0].change_tracking_version == 1
    # table content unchanged and correct
    assert [(r.id, r.amount) for r in cat.read(spark, "r.t").collect()] == [(2, 2)]


def test_on_report_delivers_per_batch_action_reports(spark, tmp_path):
    """r9: run_apply_stream(on_report=...) hands each micro-batch's
    per-table action report (already built from driver metadata) to
    the caller — the metrics/lag-monitor hook."""
    from change_data_capture_spark.apply import TableCatalog
    from change_data_capture_spark.changelog import snapshot_changelog
    from change_data_capture_spark.streaming import (
        run_apply_stream,
        write_changelog,
    )

    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)],
                               "id long, val string")
    root = tmp_path / "rep"
    write_changelog(snapshot_changelog(df, "m.t", ["id"]), str(root / "log"))
    cat = TableCatalog(str(root / "cat"))
    got: list = []
    run_apply_stream(
        spark, str(root / "log"), cat, str(root / "ckpt"),
        on_report=lambda epoch, rep: got.append((epoch, rep)),
    )
    assert len(got) == 1
    epoch, rep = got[0]
    actions = {r["table"]: r["action"] for r in rep}
    assert actions == {"m.t": "create"}
    assert rep[0]["applied_version"] >= 1
