"""As-of and range join semantics + plan-shape guards."""

import datetime as dt

from pyspark.sql import functions as F

from change_data_capture_spark.extensions import temporal
from change_data_capture_spark import registry


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),  # matches r2 (exact tie)
            (1, _ts("2024-01-01T09:00:00"), "b"),  # matches r1
            (1, _ts("2024-01-01T07:00:00"), "c"),  # before all -> null
            (2, _ts("2024-01-01T12:00:00"), "d"),  # other key -> r3
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (101, 1, _ts("2024-01-01T08:30:00")),  # r1
            (102, 1, _ts("2024-01-01T10:00:00")),  # r2
            (103, 2, _ts("2024-01-01T11:00:00")),  # r3
        ],
        "event_id int, user_id int, ts timestamp",
    )
    out = temporal.asof_join(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["event_id", "ts"],
    )
    got = {r["tag"]: r["right_event_id"] for r in out.collect()}
    assert got == {"a": 102, "b": 101, "c": None, "d": 103}


def test_asof_is_single_shuffle_no_nested_loop(spark, sf_dir):
    df = registry.queries()["temporal_asof_attribution"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T00:00:00"))],
        "interval_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (201, 1, _ts("2024-01-01T00:00:00")),  # start inclusive
            (202, 1, _ts("2024-01-01T23:59:59")),  # inside
            (203, 1, _ts("2024-01-02T00:00:00")),  # end exclusive
            (204, 1, _ts("2023-12-31T23:59:59")),  # before
            (205, 2, _ts("2024-01-01T12:00:00")),  # wrong key
        ],
        "event_id int, user_id int, ts timestamp",
    )
    out = temporal.range_join(
        left,
        right,
        on=["user_id"],
        start_expr=F.col("ts"),
        end_expr=F.col("ts") + F.expr("INTERVAL 1 DAY"),
        right_ts="ts",
        bucket_seconds=3600,
    )
    assert sorted(r["right_event_id"] for r in out.collect()) == [201, 202]


def test_range_join_is_hash_join(spark, sf_dir):
    df = registry.queries()["temporal_range_error_clicks"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_join_randomized_vs_python_reference(spark):
    """Property check of the union+window as-of join against a
    brute-force Python reference over randomized keys/timestamps with
    deliberate ties (right rows AT the left timestamp must match —
    inclusive backward semantics; right-side ties resolve to the
    greatest value_cols[0])."""
    import random

    from change_data_capture_spark.extensions.temporal import asof_join

    rng = random.Random(1234)
    keys = ["a", "b", "c"]
    lrows = [
        (rng.choice(keys), rng.randint(0, 20), i) for i in range(40)
    ]
    rrows = [
        (rng.choice(keys), rng.randint(0, 20), 100 + i) for i in range(25)
    ]
    left = spark.createDataFrame(lrows, "k string, ts long, lid long")
    right = spark.createDataFrame(rrows, "k string, ts long, rid long")

    out = asof_join(left, right, ["k"], "ts", "ts", ["rid"])
    got = {(r["k"], r["ts"], r["lid"]): r["right_rid"] for r in out.collect()}
    assert len(got) == len(lrows)

    for k, ts, lid in lrows:
        cands = [rid for (rk, rts, rid) in rrows if rk == k and rts <= ts]
        want = max(cands) if cands else None  # engine tiebreak: last by rid
        # reference: latest ts wins; ties by greatest rid (window order
        # is ts asc, rid asc with last() carrying forward)
        if cands:
            best_ts = max(rts for (rk, rts, rid) in rrows if rk == k and rts <= ts)
            want = max(
                rid for (rk, rts, rid) in rrows if rk == k and rts == best_ts
            )
        assert got[(k, ts, lid)] == want, (k, ts, lid)


def test_range_join_randomized_vs_python_reference(spark):
    """Property check of the bucketed range join against brute force:
    interval containment [start, end) with randomized intervals
    spanning 0-3 buckets."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from change_data_capture_spark.extensions.temporal import range_join

    rng = random.Random(77)
    base = dt.datetime(2020, 1, 1)
    keys = ["x", "y"]
    lrows = []
    for i in range(20):
        s = rng.randint(0, 600)
        lrows.append((rng.choice(keys), base + dt.timedelta(seconds=s),
                      base + dt.timedelta(seconds=s + rng.randint(1, 240)), i))
    rrows = [
        (rng.choice(keys), base + dt.timedelta(seconds=rng.randint(0, 900)), 100 + i)
        for i in range(40)
    ]
    left = spark.createDataFrame(lrows, "k string, s timestamp, e timestamp, lid long")
    right = spark.createDataFrame(rrows, "k string, ts timestamp, rid long")
    out = range_join(
        left, right, ["k"], F.col("s"), F.col("e"), "ts", bucket_seconds=120
    )
    got = {(r["lid"], r["right_rid"]) for r in out.collect()}
    want = {
        (lid, rid)
        for (lk, s, e, lid) in lrows
        for (rk, ts, rid) in rrows
        if lk == rk and s <= ts < e
    }
    assert got == want


def test_resample_gapfill_hand_computed(spark):
    from change_data_capture_spark.extensions.temporal import resample_gapfill

    ev = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00", 1.0),
            ("a", "2024-01-01 00:40:00", 2.0),
            ("a", "2024-01-01 02:05:00", 5.0),   # hour 1 is a gap
            ("b", "2024-01-01 03:59:00", 7.0),   # b: gaps before + after
            ("b", "2024-01-01 09:00:00", 9.0),   # outside [start,end) -> dropped
        ],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_gapfill(
        ev, key_col="k", ts_col="ts", value_col="v",
        start="2024-01-01 00:00:00", end="2024-01-01 04:00:00",
        interval="1 hour",
    )
    rows = {(r["k"], str(r["bucket_ts"])): r for r in out.collect()}
    assert len(rows) == 8  # 2 keys x 4 buckets, dense
    a0 = rows[("a", "2024-01-01 00:00:00")]
    assert a0["n_events"] == 2 and a0["sum_value"] == 3.0
    a1 = rows[("a", "2024-01-01 01:00:00")]
    assert a1["n_events"] == 0 and a1["sum_value"] is None
    assert a1["sum_value_filled"] == 3.0  # carried forward
    a2 = rows[("a", "2024-01-01 02:00:00")]
    assert a2["sum_value"] == 5.0 and a2["sum_value_filled"] == 5.0
    b0 = rows[("b", "2024-01-01 00:00:00")]
    assert b0["n_events"] == 0 and b0["sum_value_filled"] is None  # before first obs
    b3 = rows[("b", "2024-01-01 03:00:00")]
    assert b3["sum_value"] == 7.0 and b3["sum_value_filled"] == 7.0


def test_asof_join_carry_is_row_atomic(spark):
    """A matched right row whose value column is NULL must yield NULL —
    not a backfill from an older right row (the per-column ignorenulls
    stitching bug)."""
    from change_data_capture_spark.extensions.temporal import asof_join

    right = spark.createDataFrame(
        [(1, 10, 5.0, "x"), (1, 20, None, "y")],
        "k long, rts long, v double, tag string",
    )
    left = spark.createDataFrame([(1, 30)], "k long, lts long")
    (r,) = asof_join(left, right, ["k"], "lts", "rts", ["tag", "v"]).collect()
    # latest right row at ts=20 has v=NULL, tag='y' — both must come
    # from THAT row
    assert r["right_tag"] == "y" and r["right_v"] is None


def test_resample_gapfill_rejects_calendar_intervals(spark):
    import pytest

    from change_data_capture_spark.extensions.temporal import resample_gapfill

    ev = spark.createDataFrame([("a", "2024-01-05 00:00:00", 1.0)],
                               "k string, ts string, v double")
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="fixed-width"):
        resample_gapfill(ev, key_col="k", ts_col="ts", value_col="v",
                         start="2024-01-01 00:00:00", end="2024-06-01 00:00:00",
                         interval="1 month")
