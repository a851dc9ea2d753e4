"""Profiling/drift tests: hand-computed column profile, exact
integer TVD numerators, bin-edge clamping, and PSI over exact bins."""

import math

from pyspark.sql import functions as F

from change_data_capture_spark.extensions import profile as pr


def test_column_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, 10.5, "a"), (2, None, "b"), (2, 99.25, None), (None, 10.5, "a")],
        "k long, x double, s string",
    )
    rows = {r["column"]: r for r in pr.column_profile(df).collect()}
    assert rows["k"]["n_rows"] == 4 and rows["k"]["n_nulls"] == 1
    assert rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_str"] == "1" and rows["k"]["max_str"] == "2"
    assert rows["x"]["min_str"] == "10.500000" and rows["x"]["max_str"] == "99.250000"
    assert rows["s"]["n_nulls"] == 1 and rows["s"]["max_str"] == "b"


def test_column_profile_min_max_typed_not_lexicographic(spark):
    # 9.0 > 10.5 lexicographically as strings — the aggregate must
    # compare in the column's own type
    df = spark.createDataFrame([(9.0,), (10.5,)], "x double")
    (r,) = pr.column_profile(df).collect()
    assert r["min_str"] == "9.000000" and r["max_str"] == "10.500000"


def test_numeric_drift_exact_and_clamped(spark):
    base = spark.createDataFrame([(v,) for v in [0.0, 5.0, 15.0, -3.0]], "x double")
    cur = spark.createDataFrame([(v,) for v in [5.0, 5.0, 25.0, 99.0]], "x double")
    # bins over [0,20) width 10, n=2 -> clamp: -3 -> bin 0, 25/99 -> bin 1
    d = {r["bucket"]: r for r in pr.numeric_drift(
        base, cur, "x", lo=0.0, hi=20.0, n_bins=2).collect()}
    assert (d[0]["c_base"], d[0]["c_cur"]) == (3, 2)
    assert (d[1]["c_base"], d[1]["c_cur"]) == (1, 2)
    # tv_num = |c_base*T_cur - c_cur*T_base|, T_base=T_cur=4
    assert d[0]["tv_num"] == abs(3 * 4 - 2 * 4) == 4
    assert d[1]["tv_num"] == 4
    # TVD = (4+4)/(2*4*4) = 0.25
    assert pr.tvd(pr.numeric_drift(base, cur, "x", lo=0.0, hi=20.0, n_bins=2)) == 0.25


def test_categorical_drift_with_null_sentinel(spark):
    base = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "c string")
    cur = spark.createDataFrame([("a",), ("b",), ("b",), ("b",)], "c string")
    d = {r["bucket"]: (r["c_base"], r["c_cur"], r["tv_num"])
         for r in pr.categorical_drift(base, cur, "c").collect()}
    assert d["a"] == (2, 1, abs(2 * 4 - 1 * 4))
    assert d["b"] == (1, 3, 8)
    assert d["<null>"] == (1, 0, 4)


def test_psi_zero_on_identical_and_positive_on_shift(spark):
    same = [(10, 10), (5, 5)]
    assert pr.psi_from_bins(same) == 0.0
    shifted = [(10, 2), (5, 13)]
    got = pr.psi_from_bins(shifted)
    p0, q0 = 10 / 15, 2 / 15
    p1, q1 = 5 / 15, 13 / 15
    want = (q0 - p0) * math.log(q0 / p0) + (q1 - p1) * math.log(q1 / p1)
    assert abs(got - want) < 1e-12 and got > 0


def test_profile_single_pass_plan(spark):
    """The N-column profile must stay ONE aggregation job (Expand +
    hash aggregate), not N separate scans."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"), (F.col("id") % 3).alias("t")
    )
    plan = pr.column_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1, plan
    assert "Expand" in plan, plan


def test_profile_and_drift_survive_nan_inf_and_outliers(spark):
    dirty = spark.createDataFrame(
        [(float("nan"),), (float("inf",),), (1e33,), (2.5,)], "x double"
    )
    (r,) = pr.column_profile(dirty).collect()
    assert r["max_str"] == "<nan>"  # NaN sorts greatest in Spark
    clean = spark.createDataFrame([(2.5,), (3.5,)], "x double")
    (r2,) = pr.column_profile(clean).collect()
    assert r2["min_str"] == "2.500000"
    # drift: NaN dropped with nulls, inf/outliers clamp to edge bins
    d = {row["bucket"]: row for row in pr.numeric_drift(
        dirty, clean, "x", lo=0.0, hi=4.0, n_bins=4).collect()}
    assert d[3]["c_base"] == 2  # inf + 1e33 clamped into top bin
    assert d[2]["c_base"] == 1 and d[2]["c_cur"] == 1  # the 2.5s
    assert sum(row["c_base"] for row in d.values()) == 3  # NaN dropped


def test_profile_handles_dotted_column_names(spark):
    df = spark.range(3).toDF("id").withColumnRenamed("id", "price.usd")
    (r,) = pr.column_profile(df).collect()
    assert r["column"] == "price.usd" and r["n_distinct"] == 3


def test_ks_drift_hand_computed(spark):
    from change_data_capture_spark.extensions.profile import ks_drift, ks_stat

    base = spark.createDataFrame([(v,) for v in [1.0, 2.0, 3.0, 4.0]], "x double")
    cur = spark.createDataFrame([(v,) for v in [3.0, 4.0, 5.0, 6.0]], "x double")
    (r,) = ks_drift(base, cur, "x").collect()
    # CDFs: at x=2, F_base=2/4, F_cur=0 -> |2*4 - 0*4| = 8 is the max
    assert r["ks_num"] == 8 and r["t_base"] == 4 and r["t_cur"] == 4
    assert ks_stat(r) == 0.5
    # identical snapshots -> 0
    (r2,) = ks_drift(base, base, "x").collect()
    assert r2["ks_num"] == 0 and ks_stat(r2) == 0.0


def test_expectations_hand_computed(spark):
    from change_data_capture_spark.extensions.profile import (
        expect,
        expect_references,
        expect_unique,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 7.0), (None, None)],
        "k long, v double",
    )
    rep = {r["rule"]: r for r in expect(
        df, [("k_not_null", "k IS NOT NULL"), ("v_positive", "v > 0")]
    ).collect()}
    assert rep["k_not_null"]["n_violations"] == 1
    # NULL predicate counts as violation: v>0 is NULL for the null row
    assert rep["v_positive"]["n_violations"] == 2
    assert not rep["v_positive"]["passed"] and rep["k_not_null"]["n_rows"] == 4

    (u,) = expect_unique(df, ["k"]).collect()
    assert u["n_violations"] == 2 and not u["passed"]  # both k=2 rows

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame([(1,), (3,), (None,)], "k long")
    (fk,) = expect_references(child, "k", parent, "pk").collect()
    assert fk["n_violations"] == 1  # 3 is an orphan; NULL exempt
    assert fk["n_rows"] == 3 and not fk["passed"]


def test_column_profile_approx_distinct_path(spark):
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 500).alias("m")
    )
    exact = {r["column"]: r["n_distinct"]
             for r in pr.column_profile(df).collect()}
    approx_df = pr.column_profile(df, exact_distinct=False, rsd=0.02)
    approx = {r["column"]: r["n_distinct"] for r in approx_df.collect()}
    for c in ("id", "m"):
        assert abs(approx[c] - exact[c]) <= 0.1 * exact[c], (c, approx[c], exact[c])
    # the scale payoff: no Expand row amplification in the approx plan
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan


def test_embedding_drift_hand_computed(spark):
    from change_data_capture_spark.extensions.profile import embedding_drift

    base = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], "id long, embedding array<float>"
    )
    cur = spark.createDataFrame(
        [(1, [2.0, 2.0]), (2, [4.0, 4.0]), (3, [6.0, 4.0])],
        "id long, embedding array<float>",
    )
    out = {r["dim"]: r for r in embedding_drift(base, cur).collect()}
    d1 = out[1]
    assert (d1["n_base"], d1["n_cur"]) == (2, 3)
    assert d1["mean_base"] == 2.0 and d1["mean_cur"] == 4.0
    assert d1["mean_delta"] == 2.0
    d2 = out[2]
    assert d2["mean_base"] == 3.0 and d2["mean_cur"] == round(10 / 3, 8)
    assert d2["mean_delta"] == round(round(10 / 3, 8) - 3.0, 8)
