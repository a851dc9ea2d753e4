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
