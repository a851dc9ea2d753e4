"""Sampling / histogram / salting operators: exactness and stability."""

from pyspark.sql import functions as F

from change_data_capture_spark.extensions import scale


def test_deterministic_sample_is_repartition_stable(spark):
    df = spark.range(0, 2000).withColumn("grp", (F.col("id") % 3).cast("string"))
    a = scale.deterministic_sample(df, "id", 0.25, strata=["grp"])
    b = scale.deterministic_sample(df.repartition(13), "id", 0.25, strata=["grp"])
    ids_a = sorted(r["id"] for r in a.collect())
    ids_b = sorted(r["id"] for r in b.collect())
    assert ids_a == ids_b
    # ~25% with md5 uniformity at n=2000
    assert 0.18 < len(ids_a) / 2000 < 0.32


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (9.9,), (10.0,), (99.0,)], "v double")
    out = {r["bucket"]: r["n"] for r in scale.histogram(df, "v", lo=0.0, hi=10.0, buckets=2).collect()}
    assert out == {0: 2, 1: 3}  # -5 clamps low; 10 and 99 clamp high


def test_salted_agg_matches_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 4).alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in scale.salted_agg(
            df, ["k"], {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")}, salt=16
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    left = spark.range(0, 5000).select((F.col("id") % 10).alias("k"), F.col("id").alias("lv"))
    right = spark.createDataFrame([(i, f"r{i}") for i in range(10)], "k long, rv string")
    plain = sorted((r["lv"], r["rv"]) for r in left.join(right, "k").collect())
    salted = sorted(
        (r["lv"], r["rv"]) for r in scale.salted_join(left, right, on=["k"], salt=4).collect()
    )
    assert plain == salted


def test_salted_agg_two_exchanges(spark):
    """The salted plan must actually have the two-phase shape: a
    shuffle on (keys, salt) then a shuffle on keys."""
    df = spark.range(0, 1000).select((F.col("id") % 2).alias("k"), F.col("id").alias("v"))
    out = scale.salted_agg(df, ["k"], {"n": ("v", "count")}, salt=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") >= 2
