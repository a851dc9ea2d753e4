"""Temporal join operators Spark lacks natively: as-of join and
range (interval) join.

The reference system has no temporal joins at all (SURVEY.md §2.6) —
these are north-star additions a training-data / event-analytics
pipeline needs (point-in-time feature lookup, attribution, windowed
incident correlation).

Both operators are pure relational compositions — no Python eval, no
collect — so they inherit Catalyst/AQE planning and scale with the
shuffle, not the driver:

- ``asof_join`` uses the union+window pattern: tag both sides, union,
  and carry the last right-side value forward per key with an ordered
  window. ONE shuffle on (key), no range-condition nested-loop join,
  no per-key skew beyond what the data itself has. This is the plan
  you want at 100 TB — the naive alternative (theta-join on
  ``l.ts >= r.ts`` + argmax) is a broadcast-nested-loop blow-up.
- ``range_join`` buckets time so the interval predicate becomes an
  equi-join on (key, bucket) plus a residual filter. Intervals are
  exploded to the buckets they span (bounded by
  ``interval_length/bucket + 2``), events map to exactly one bucket —
  so no post-join dedup is needed and the join is hash-partitioned,
  never nested-loop.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "resample_gapfill"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row with ``right.right_ts <= left.left_ts`` (direction='backward',
    inclusive), per ``on`` key. Unmatched left rows keep nulls (left
    as-of join semantics).

    Right-side ties on (key, ts) are resolved by the order of
    ``value_cols[0]`` — pass a unique id first for determinism.
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    on = list(on)
    value_cols = list(value_cols)

    # Common event-time axis + side tag (right=0 sorts before left=1 on
    # ties, making the match inclusive). The right values travel as ONE
    # struct so the carry is ROW-ATOMIC: a matched right row whose
    # value column is NULL yields NULL (per-column ignorenulls would
    # backfill it from an OLDER right row, stitching together a row
    # that never existed).
    r_struct_t = right.select(
        F.struct(*[F.col(c) for c in value_cols]).alias("__r")
    ).schema["__r"].dataType
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct_t).alias("__r"),
        F.struct(*[c for c in left.columns]).alias("__l"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
        F.lit(None)
        .cast(l_tagged.schema["__l"].dataType)
        .alias("__l"),
    )

    tiebreak = [F.col("__r").getField(value_cols[0]).asc_nulls_first()]
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__m"),
    )
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            F.col("__l.*"),
            *[F.col("__m").getField(c).alias(f"right_{c}") for c in value_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    start_expr,
    end_expr,
    right_ts: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner-join left interval rows [start_expr, end_expr) to right
    point rows on ``on`` equality plus interval containment of
    ``right.right_ts``.

    ``bucket_seconds`` trades shuffle width for residual-filter work:
    choose it near the typical interval length so each interval
    explodes into O(1) buckets.
    """
    on = list(on)
    b = F.lit(bucket_seconds).cast("long")

    li = left.select(
        "*",
        start_expr.alias("__start"),
        end_expr.alias("__end"),
    ).select(
        "*",
        F.sequence(
            (F.unix_timestamp("__start") / b).cast("long"),
            (F.unix_timestamp("__end") / b).cast("long"),
        ).alias("__buckets"),
    )
    li = li.select("*", F.explode("__buckets").alias("__bucket")).drop("__buckets")

    ri = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in right.columns],
        (F.unix_timestamp(F.col(right_ts)) / b).cast("long").alias("__bucket"),
        *[F.col(c).alias(f"__rk_{c}") for c in on],
    )

    joined = li.join(ri, [*(li[k] == ri[f"__rk_{k}"] for k in on), li["__bucket"] == ri["__bucket"]])
    refined = joined.filter(
        (F.col(f"__r_{right_ts}") >= F.col("__start"))
        & (F.col(f"__r_{right_ts}") < F.col("__end"))
    )
    keep_left = [c for c in left.columns]
    keep_right = [F.col(f"__r_{c}").alias(f"right_{c}") for c in right.columns]
    return refined.select(*keep_left, "__start", "__end", *keep_right).drop(
        "__start", "__end"
    )


def resample_gapfill(
    events: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    start: str,
    end: str,
    interval: str = "1 hour",
) -> DataFrame:
    """Regular-grid resampling with gap fill — the time-series
    alignment step (pandas ``resample``/``asfreq`` + ``ffill``,
    TimescaleDB ``time_bucket_gapfill``) every metric/feature pipeline
    runs before joining series of different densities: per key, a
    dense bucket grid over [start, end), exact per-bucket aggregates,
    and empty buckets carried forward from the last observed value.

    Output per (key, bucket_ts): ``n_events`` (0 on gaps),
    ``sum_value`` (NULL on gaps; DECIMAL-exact sum cast back to
    double), ``sum_value_filled`` (previous non-gap sum carried
    forward — NULL until the key's first observation).

    ``start``/``end``/``interval`` are caller literals (embed the SAME
    literals in any oracle). Scale shape: one (key, bucket) aggregate
    shuffle over the events; the grid is distinct-keys x sequence
    explode (|keys| * |buckets| rows — grid-sized, not event-sized); a
    left join aligns them and ONE per-key ordered window does the
    fill. No Python, no collect."""
    # Fixed-width intervals only: the bucket id is floor(epoch-delta /
    # step-seconds), which is only correct when every step has the
    # same length — calendar units ('1 month') and DST-varying local
    # days would assign events to buckets the calendar-built grid
    # doesn't have. The engine pins sessions to UTC, where day/week
    # are fixed-width.
    if not re.fullmatch(
        r"\s*\d+\s+(second|minute|hour|day|week)s?\s*", interval, re.I
    ):
        raise ValueError(
            f"interval {interval!r} is not fixed-width; use N "
            "second/minute/hour/day/week (calendar months/years cannot "
            "be bucketed by epoch arithmetic)"
        )
    step = F.expr(f"INTERVAL {interval}")
    start_ts = F.lit(start).cast("timestamp")
    end_ts = F.lit(end).cast("timestamp")
    step_sec = F.unix_timestamp(start_ts + step) - F.unix_timestamp(start_ts)
    off = F.floor(
        (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(start_ts)) / step_sec
    )
    agg = (
        events.filter((F.col(ts_col) >= start_ts) & (F.col(ts_col) < end_ts))
        .groupBy(
            F.col(key_col).alias("key"),
            (start_ts + off.cast("int") * step).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    grid = (
        events.select(F.col(key_col).alias("key"))
        .distinct()
        .crossJoin(
            F.broadcast(
                events.sparkSession.range(1)
                .select(
                    F.explode(F.sequence(start_ts, end_ts, step)).alias("bucket_ts")
                )
                .filter(F.col("bucket_ts") < end_ts)
            )
        )
    )
    joined = grid.join(agg, ["key", "bucket_ts"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_filled"),
    )
