"""Data profiling and distribution-drift detection over tables and
corpus snapshots — the pipeline-health checks a training-data estate
runs between ingests (Great-Expectations/Deequ-style column profiles;
PSI / total-variation drift monitors between yesterday's and today's
corpus, or between a source and its replica).

Beyond the reference (its only data-quality surface is schema
validation at apply time, CDCTableUtil.java type checks); these are
the operations that decide whether a new crawl/feed batch is safe to
train on.

Engine-exact oracle discipline (registry docstring rules):
- All counts are exact BIGINTs in one hash-shuffle aggregation.
- min/max are stringified through a per-type canonical form that
  renders identically in Spark and DuckDB (integrals: plain cast;
  floating: DECIMAL(38,6) then cast; timestamps: plain cast — both
  engines print 'yyyy-MM-dd HH:mm:ss'; strings: as-is).
- Drift magnitude is an INTEGER-exact total-variation numerator:
  |c_base * T_cur - c_cur * T_base| per bucket (BIGINT — no float
  division in the hashed path; TVD itself = sum / (2*T_base*T_cur)).
- PSI, which needs ln(), stays a driver-side helper over the exact
  binned counts (`psi_from_bins`, hand-verified in unit tests) so no
  cross-engine libm difference can touch a value hash.

Scale: `column_profile` is ONE pass over the table (multiple exact
COUNT DISTINCTs compile to a single Expand + hash aggregate — a
deliberate N+1x row expansion of one scan, still one shuffle, vs N
separate jobs); the drift frames are one union + one hash-shuffle
groupBy on the bucket/category key; grand totals ride a window over
the already-aggregated (n_buckets)-row frame, never the raw data.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _canon_str(expr: Column, dtype: str) -> Column:
    """Cross-engine canonical string form (see module docstring);
    keeps value hashes stable between Spark and DuckDB. Applied to the
    TYPED aggregate result — min/max must compare in the column's own
    type, never lexicographically on the rendered strings.

    NaN / Infinity / |x| >= 1e32 cannot go through the DECIMAL(38,6)
    rendering (ANSI cast traps); they render as sentinel markers so a
    profile over dirty data reports it instead of dying on it.
    Cross-engine hash parity holds for finite |x| < 1e32; the
    sentinels are engine-portable too (same literal strings)."""
    if dtype in ("double", "float"):
        return (
            F.when(F.isnan(expr), F.lit("<nan>"))
            .when(expr == float("inf"), F.lit("<inf>"))
            .when(expr == float("-inf"), F.lit("<-inf>"))
            .when(F.abs(expr) >= 1e32, F.concat(F.lit("<big>"), expr.cast("string")))
            .otherwise(expr.cast("decimal(38,6)").cast("string"))
        )
    return expr.cast("string")


def column_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    exact_distinct: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str) — one row per column, one pass.

    ``exact_distinct=False`` is the 100 TB path: HyperLogLog++
    ``approx_count_distinct`` (relative error ``rsd``) replaces the
    exact distincts, which removes the Expand N+1x row amplification
    AND the exact-distinct hash state — the profile becomes a plain
    single-pass aggregate whose memory is O(columns), not
    O(distinct values). Keep the default for oracle-checked runs
    (the hash gate needs exact integers)."""
    cols = list(cols or df.columns)
    dtypes = dict(df.dtypes)
    # index-based internal aliases + backtick-quoted column refs: a
    # column name containing a dot must not be re-parsed as a
    # field-access path on the way through the aggregate
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        ref = F.col(f"`{c}`")
        aggs.append(F.count(ref).alias(f"__nn_{i}"))
        aggs.append(
            (
                F.count_distinct(ref)
                if exact_distinct
                else F.approx_count_distinct(ref, rsd)
            ).alias(f"__nd_{i}")
        )
        aggs.append(_canon_str(F.min(ref), dtypes[c]).alias(f"__min_{i}"))
        aggs.append(_canon_str(F.max(ref), dtypes[c]).alias(f"__max_{i}"))
    one = df.agg(*aggs)
    stack_args: list[Column] = []
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.col(f"__nn_{i}"),
            F.col(f"__nd_{i}"),
            F.col(f"__min_{i}"),
            F.col(f"__max_{i}"),
        ]
    return one.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "column", "n_non_null", "n_distinct", "min_str", "max_str"
        ),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )


def _drift_frame(tagged: DataFrame, bucket: Column) -> DataFrame:
    """Shared drift shape: one groupBy on the bucket key with
    conditional exact counts per side, then the BIGINT total-variation
    numerator |c_base*T_cur - c_cur*T_base| per bucket."""
    agg = tagged.groupBy(bucket.alias("bucket")).agg(
        F.sum(F.when(F.col("__side") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c_base"),
        F.sum(F.when(F.col("__side") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c_cur"),
    )
    w = Window.partitionBy()  # over the n_buckets-row agg only
    t_base = F.sum("c_base").over(w)
    t_cur = F.sum("c_cur").over(w)
    # count x total products go through DECIMAL so the intermediate
    # multiply cannot trap under ANSI at multi-billion-row snapshots;
    # the final value casts back to BIGINT (engine-portable rendering
    # — DuckDB hands wide decimals to the comparator as floats).
    # Headroom: tv_num <= max(c_base*T_cur, c_cur*T_base) <
    # T_base*T_cur, so the BIGINT result is exact while
    # T_base * T_cur < 2^63 (~both snapshots under ~3e9 rows);
    # beyond that, drift-sample the snapshots first.
    d = "decimal(19,0)"
    return agg.select(
        "bucket",
        "c_base",
        "c_cur",
        F.abs(
            F.col("c_base").cast(d) * t_cur.cast(d)
            - F.col("c_cur").cast(d) * t_base.cast(d)
        )
        .cast("bigint")
        .alias("tv_num"),
    )


def numeric_drift(
    base: DataFrame,
    current: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-width histogram drift between two snapshots of a numeric
    column: per bin, exact counts on each side and the BIGINT
    total-variation numerator. ``lo``/``hi``/``n_bins`` are caller
    literals (embed the SAME literals in any oracle) so the bin edge
    arithmetic is bit-identical across engines; values outside the
    range clamp into the edge bins."""
    width = (hi - lo) / n_bins
    tagged = base.select(F.col(col).alias("__x"), F.lit(0).alias("__side")).unionByName(
        current.select(F.col(col).alias("__x"), F.lit(1).alias("__side"))
    )
    # clamp in the DOUBLE domain BEFORE floor: a far-out-of-range
    # value (or inf) would overflow floor's long under ANSI mode;
    # clamped first, the floor is always in [0, n_bins-1]. NaNs join
    # nulls in the dropped set (they have no bin).
    scaled = (F.col("__x") - F.lit(lo)) / F.lit(width)
    b = F.floor(
        F.least(F.lit(float(n_bins - 1)), F.greatest(F.lit(0.0), scaled))
    )
    return _drift_frame(
        tagged.filter(F.col("__x").isNotNull() & ~F.isnan(F.col("__x"))),
        b.cast("bigint"),
    )


def categorical_drift(
    base: DataFrame, current: DataFrame, col: str
) -> DataFrame:
    """Category-share drift between two snapshots: per category, exact
    counts on each side and the BIGINT total-variation numerator
    (nulls bucketed as the sentinel '<null>')."""
    tagged = base.select(F.col(col).alias("__x"), F.lit(0).alias("__side")).unionByName(
        current.select(F.col(col).alias("__x"), F.lit(1).alias("__side"))
    )
    cat = F.coalesce(F.col("__x").cast("string"), F.lit("<null>"))
    return _drift_frame(tagged, cat)


def tvd(drift: DataFrame) -> float:
    """Total-variation distance from a drift frame: sum(tv_num) /
    (2 * T_base * T_cur). One collect of three scalars."""
    r = drift.agg(
        F.sum("tv_num").alias("s"),
        F.sum("c_base").alias("tb"),
        F.sum("c_cur").alias("tc"),
    ).first()
    if not r["tb"] or not r["tc"]:
        return 0.0
    return float(r["s"]) / (2.0 * r["tb"] * r["tc"])


def psi_from_bins(drift_rows, *, eps: float = 1e-6) -> float:
    """Population Stability Index from collected drift rows
    [(c_base, c_cur), ...]: sum((p-q) * ln(p/q)) with epsilon-floored
    shares. Driver-side math over the exact binned counts — ln() never
    enters a hashed query result (cross-engine libm differences)."""
    tb = sum(c for c, _ in drift_rows) or 1
    tc = sum(c for _, c in drift_rows) or 1
    out = 0.0
    for cb, cc in drift_rows:
        p = max(cb / tb, eps)
        q = max(cc / tc, eps)
        out += (q - p) * math.log(q / p)
    return out


def ks_drift(base: DataFrame, current: DataFrame, col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between snapshots of a
    numeric column, computed EXACTLY in integers: the KS distance is
    ``max_x |F_base(x) - F_cur(x)|``; over empirical CDFs that is
    ``ks_num / (T_base * T_cur)`` with

        ks_num = max over distinct values of
                 |cum_base(x) * T_cur - cum_cur(x) * T_base|

    — all BIGINT/DECIMAL, no float CDFs, so the one-row result
    (ks_num, t_base, t_cur) hashes engine-exact and the caller divides
    driver-side. Complements the binned TVD: KS needs no bin choice
    and catches shifts TVD's fixed bins can smear.

    Scale shape: one (value) groupBy shuffle to per-value pair counts,
    then the two-phase deterministic-range ``prefix_sum`` (never a
    single-partition global window) over the O(distinct) frame, and a
    final 1-row max aggregate. NaNs join nulls in the dropped set."""
    from .scale import prefix_sum

    tagged = base.select(F.col(col).alias("__x"), F.lit(0).alias("__side")).unionByName(
        current.select(F.col(col).alias("__x"), F.lit(1).alias("__side"))
    )
    per_value = (
        tagged.filter(F.col("__x").isNotNull() & ~F.isnan(F.col("__x")))
        .groupBy("__x")
        .agg(
            F.sum(F.when(F.col("__side") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("c_base"),
            F.sum(F.when(F.col("__side") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("c_cur"),
        )
        # persisted: the two nested prefix_sum calls each issue TWO
        # driver actions (min/max + per-bucket partials) and the final
        # aggregates rescan — without the cache the union+groupBy over
        # both FULL snapshots recomputes ~5x (r6 review; the
        # kth_order_statistic persist rule). O(distinct values) rows.
        .persist()
    )
    cum = prefix_sum(
        prefix_sum(per_value, "__x", "c_base", out_col="cum_base"),
        "__x",
        "c_cur",
        out_col="cum_cur",
    )
    d = "decimal(19,0)"
    # totals as a broadcast 1-row constant (a global window here would
    # collapse the O(distinct) frame into one partition)
    totals = per_value.agg(
        F.sum("c_base").cast("bigint").alias("t_base"),
        F.sum("c_cur").cast("bigint").alias("t_cur"),
    )
    scored = cum.crossJoin(F.broadcast(totals))
    out = scored.agg(
        F.max(
            F.abs(
                F.col("cum_base").cast(d) * F.col("t_cur").cast(d)
                - F.col("cum_cur").cast(d) * F.col("t_base").cast(d)
            )
        )
        .cast("bigint")
        .alias("ks_num"),
        F.first("t_base").alias("t_base"),
        F.first("t_cur").alias("t_cur"),
    ).persist()
    try:
        out.count()  # materialize the 1-row result, then release the
        # O(distinct) cache (persist-once-materialized discipline)
        return out
    finally:
        per_value.unpersist()


def ks_stat(ks_row) -> float:
    """KS distance from a collected ``ks_drift`` row."""
    if not ks_row["t_base"] or not ks_row["t_cur"]:
        return 0.0
    return float(ks_row["ks_num"]) / (ks_row["t_base"] * ks_row["t_cur"])


def expect(df: DataFrame, rules: Sequence[tuple[str, str]]) -> DataFrame:
    """Deequ/Great-Expectations-style constraint suite in ONE pass:
    ``rules`` are (name, boolean SQL expression) pairs evaluated
    per-row; the report has one row per rule with exact violation
    counts — the ingest gate that blocks a batch, where
    ``column_profile`` merely describes it.

    Output: (rule, n_rows, n_violations, passed). A NULL predicate
    result counts as a violation (unknown is not compliance). All
    rules share a single scan + single aggregate (no per-rule jobs);
    cross-row rules (uniqueness, referential integrity) have their
    own helpers below because they need a shuffle by nature."""
    if not rules:
        raise ValueError("expect() needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, expr) in enumerate(rules):
        ok = F.coalesce(F.expr(expr).cast("boolean"), F.lit(False))
        aggs.append(F.sum((~ok).cast("long")).alias(f"__v_{i}"))
    one = df.agg(*aggs)
    stack = []
    for i, (name, _) in enumerate(rules):
        stack += [F.lit(name), F.col(f"__v_{i}")]
    return one.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(len(rules)), *stack).alias("rule", "n_violations"),
    ).select(
        "rule",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def expect_unique(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Uniqueness constraint: rows whose key occurs more than once.
    Output matches ``expect``'s report shape (one row). One hash
    shuffle on the key."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.sum("__c").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        )
    )
    return dup.select(
        F.lit("unique(" + ",".join(cols) + ")").alias("rule"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def expect_references(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Referential-integrity constraint: child keys with no parent
    (orphans). NULL child keys are exempt (SQL FK convention). One
    anti-join; broadcast-eligible when the parent key set is small."""
    n_rows = child.count()
    orphans = (
        child.filter(F.col(child_col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(child_col)).distinct(),
            on=child_col,
            how="left_anti",
        )
        .count()
    )
    spark = child.sparkSession
    return spark.createDataFrame(
        [(f"references({child_col}->{parent_col})", n_rows, orphans, orphans == 0)],
        "rule string, n_rows bigint, n_violations bigint, passed boolean",
    )


def embedding_drift(
    base: DataFrame,
    cur: DataFrame,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION embedding drift between two corpus snapshots —
    the ingest-health monitor for the vector column itself (a new
    encoder version, a normalization bug, or a domain shift moves
    dimension means long before any scalar column notices): for every
    dimension, row counts and means of both snapshots plus the mean
    delta.

    Numerically engine-exact: element sums go through DECIMAL(38,6)
    (the repo's float->double->decimal idiom, order-independent), and
    each mean is ONE double division of the exact sum — no
    order-dependent float accumulation anywhere, so the monitor
    hash-verifies like the scalar drift profiles.

    Plan: both snapshots union with a side tag, one posexplode, ONE
    hash aggregation keyed by dimension — O(dims) result rows at any
    corpus size."""
    tagged = base.select(
        F.lit("b").alias("__side"), F.col(vec_col).alias("__v")
    ).unionByName(cur.select(F.lit("c").alias("__side"), F.col(vec_col).alias("__v")))
    x = tagged.select(
        "__side", F.posexplode("__v").alias("__i", "__x")
    ).select(
        "__side",
        (F.col("__i") + 1).alias("dim"),
        F.col("__x").cast("double").cast("decimal(38,6)").alias("__e"),
    )
    is_b = F.col("__side") == "b"
    agg = x.groupBy("dim").agg(
        F.count(F.when(is_b, 1)).cast("bigint").alias("n_base"),
        F.count(F.when(~is_b, 1)).cast("bigint").alias("n_cur"),
        F.sum(F.when(is_b, F.col("__e"))).alias("__sb"),
        F.sum(F.when(~is_b, F.col("__e"))).alias("__sc"),
    )
    mean_b = F.round(F.col("__sb").cast("double") / F.col("n_base"), 8)
    mean_c = F.round(F.col("__sc").cast("double") / F.col("n_cur"), 8)
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        "n_base",
        "n_cur",
        mean_b.alias("mean_base"),
        mean_c.alias("mean_cur"),
        F.round(mean_c - mean_b, 8).alias("mean_delta"),
    )
