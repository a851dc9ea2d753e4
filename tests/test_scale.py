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


def _docs(spark, n=40, sources=3):
    from pyspark.sql import functions as F

    return (
        spark.range(0, n)
        .select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % sources)).alias("source"),
            F.concat(F.lit("word "), F.repeat(F.lit("token x y "), (F.col("id") % 7 + 1).cast("int"))).alias("text"),
        )
    )


def test_shard_manifest_partitions_everything(spark):
    df = _docs(spark, n=200)
    man = scale.shard_manifest(df, n_shards=8).collect()
    assert sum(r["n_docs"] for r in man) == 200
    assert {r["shard"] for r in man} <= set(range(8))
    # deterministic under reshuffle
    man2 = scale.shard_manifest(df.repartition(17), n_shards=8).collect()
    assert sorted(map(tuple, man)) == sorted(map(tuple, man2))


def test_mixture_rebalance_uniform_and_stable(spark):
    from pyspark.sql import functions as F

    df = _docs(spark, n=90, sources=3).filter(
        ~((F.col("source") == "src0") & (F.col("doc_id").isin("d0", "d3", "d6")))
    )  # src0 now smallest: 27 docs
    out = scale.mixture_rebalance(df, by="source")
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"src0": 27, "src1": 27, "src2": 27}
    ids_a = sorted(r["doc_id"] for r in out.collect())
    ids_b = sorted(r["doc_id"] for r in scale.mixture_rebalance(df.repartition(13), by="source").collect())
    assert ids_a == ids_b


def test_pack_batches_matches_python_recompute(spark):
    """Recompute the closed form (floor((running_sum - own)/budget) in
    deterministic md5 order) driver-side and require exact agreement,
    plus dense batch ids per group."""
    import collections
    import hashlib

    df = _docs(spark, n=60)
    out = {r["doc_id"]: r for r in scale.pack_batches(df, budget=20, by="source").collect()}
    rows = df.select("doc_id", "source", "text").collect()

    def est(text):
        import math, re

        return math.ceil(len(re.sub(r"\s", "", text)) / 4)

    def okey(source, doc_id):
        return int(hashlib.md5(f"{source}:{doc_id}".encode()).hexdigest()[:8], 16)

    groups = collections.defaultdict(list)
    for r in rows:
        groups[r["source"]].append(r)
    for src, rs in groups.items():
        rs.sort(key=lambda r: (okey(r["source"], r["doc_id"]), r["doc_id"]))
        cum = 0
        seen = set()
        for r in rs:
            e = est(r["text"])
            cum += e
            expect = (cum - e) // 20
            got = out[r["doc_id"]]
            assert (got["n_subword_est"], got["batch_id"]) == (e, expect), r["doc_id"]
            seen.add(expect)
        assert sorted(seen) == list(range(len(seen)))


def test_split_assign_deterministic_and_exhaustive(spark, sf_dir):
    import hashlib

    from tests.conftest import load

    docs = load(spark, sf_dir, "documents").select("doc_id")
    out = scale.split_assign(docs, "doc_id", train=0.9, val=0.05)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    # exhaustive + reshuffle-stable (recompute on a repartitioned input)
    again = {
        r["doc_id"]: r["split"]
        for r in scale.split_assign(docs.repartition(7), "doc_id").collect()
    }
    assert rows == again
    assert set(rows.values()) <= {"train", "val", "test"}
    # python-side replay of the md5 rule
    for doc_id, split in rows.items():
        h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:8]
        expect = "train" if h < "e6666666" else ("val" if h < "f3333333" else "test")
        assert split == expect, doc_id


def test_temperature_mixture_flattens_toward_mean(spark):
    import math

    from change_data_capture_spark.extensions import scale

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = scale.temperature_mixture(df, by="source")
    got = {r.source: r.target_n for r in out.select("source", "target_n").distinct().collect()}
    mean = 425 / 2
    assert got["big"] == math.floor(math.sqrt(400 * mean))  # thinned toward mean
    assert got["small"] == 25  # small sources keep everything
    kept = out.groupBy("source").count().collect()
    assert {r.source: r["count"] for r in kept} == {"big": got["big"], "small": 25}
    # reshuffle-stable membership
    again = {r.doc_id for r in scale.temperature_mixture(df.repartition(5), by="source").collect()}
    assert again == {r.doc_id for r in out.collect()}


def test_key_skew_profile_shares_and_ranks(spark):
    from change_data_capture_spark.extensions import scale

    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 6 + ["b"] * 3 + ["c"] * 1], "k string"
    )
    rows = scale.key_skew_profile(df, "k", top_n=2).collect()
    got = [(r.key, r.n, r.share, r.cum_share, r.rank) for r in rows]
    assert got == [("a", 6, 0.6, 0.6, 1), ("b", 3, 0.3, 0.9, 2)]


def test_hex_threshold_boundary_keeps_everything(spark):
    from change_data_capture_spark.extensions.scale import (
        deterministic_sample,
        split_assign,
    )

    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    assert deterministic_sample(df, "k", 1.0).count() == 500
    # train+val == 1.0: no row may silently become 'test'
    out = split_assign(df, "k", train=0.95, val=0.05)
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert "test" not in counts, counts
    assert sum(counts.values()) == 500


def test_salted_join_rejects_right_outer(spark):
    import pytest

    from change_data_capture_spark.extensions.scale import salted_join

    l = spark.range(5).select(F.col("id").alias("k"))
    r = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    with pytest.raises(ValueError, match="replicated"):
        salted_join(l, r, ["k"], how="full")


def test_prefix_sum_rejects_fractional_values(spark):
    import pytest

    from change_data_capture_spark.extensions.scale import prefix_sum

    df = spark.range(10).select(F.col("id").alias("o"), F.lit(1.5).alias("v"))
    with pytest.raises(ValueError, match="integer-exact"):
        prefix_sum(df, "o", "v")


def test_context_windows_hand_computed_boundary_split(spark):
    from change_data_capture_spark.extensions.scale import context_windows

    # doc 1: 3 tokens [0,3), doc 2: 4 tokens [3,7), doc 3: 2 tokens [7,9)
    # size=4 -> w0=[0,4) holds d1 full + d2[0,1); w1=[4,8) holds d2[1,4)
    # + d3[0,1); w2=[8,9) holds d3[1,2)
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, "h i")], "doc_id long, text string"
    )
    rows = {
        (r.window_id, r.doc_id): r
        for r in context_windows(docs, size=4).collect()
    }
    assert rows[(0, 1)].tok_start == 0 and rows[(0, 1)].tok_end == 3
    assert rows[(0, 1)].pos_in_window == 0
    assert rows[(0, 2)].tok_start == 0 and rows[(0, 2)].tok_end == 1
    assert rows[(0, 2)].pos_in_window == 3
    assert rows[(1, 2)].tok_start == 1 and rows[(1, 2)].tok_end == 4
    assert rows[(1, 2)].pos_in_window == 0
    assert rows[(1, 3)].tok_start == 0 and rows[(1, 3)].tok_end == 1
    assert rows[(1, 3)].pos_in_window == 3
    assert rows[(2, 3)].tok_start == 1 and rows[(2, 3)].tok_end == 2
    assert len(rows) == 5


def test_context_windows_invariants_cover_and_fill(spark):
    from change_data_capture_spark.extensions.scale import context_windows
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(1 + (i * 7) % 23))) for i in range(40)],
        "doc_id long, text string",
    ).repartition(8)
    out = context_windows(docs, size=16)
    # every doc's spans concatenate to exactly its token range
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.sum(F.col("tok_end") - F.col("tok_start")).alias("covered"),
            F.min("tok_start").alias("lo"),
        )
        .collect()
    )
    n_by_doc = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    for r in per_doc:
        assert r.covered == n_by_doc[r.doc_id] and r.lo == 0
    # every window except the last is exactly full
    per_w = (
        out.groupBy("window_id")
        .agg(F.sum(F.col("tok_end") - F.col("tok_start")).alias("filled"))
        .collect()
    )
    last = max(r.window_id for r in per_w)
    for r in per_w:
        if r.window_id != last:
            assert r.filled == 16, (r.window_id, r.filled)


def test_context_windows_incremental_base_offset_continues_packing(spark):
    from change_data_capture_spark.extensions.scale import context_windows
    from pyspark.sql import functions as F

    day1 = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g h")], "doc_id long, text string"
    )  # 8 tokens
    day2 = spark.createDataFrame(
        [(3, "i j k"), (4, "l m")], "doc_id long, text string"
    )
    full = context_windows(day1.unionByName(day2), size=4)
    incr = context_windows(day1, size=4).unionByName(
        context_windows(day2, size=4, base_offset=8)
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, incr.collect()))


def test_context_windows_incremental_mid_window_base_offset(spark):
    """base_offset landing INSIDE a window (7 tokens into size=4 windows:
    window 1 is half-filled) — the new batch's first span must continue
    window 1 at pos_in_window=3, split across the boundary, and the
    union with day 1's output must equal the full repack."""
    from change_data_capture_spark.extensions.scale import context_windows

    day1 = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g")], "doc_id long, text string"
    )  # 7 tokens -> window 1 has one remainder slot filled
    day2 = spark.createDataFrame(
        [(3, "i j k"), (4, "l m n o p q")], "doc_id long, text string"
    )
    full = context_windows(day1.unionByName(day2), size=4)
    d2 = context_windows(day2, size=4, base_offset=7)
    incr = context_windows(day1, size=4).unionByName(d2)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, incr.collect()))
    # the continuation span itself: doc 3 starts in window 1 at slot 3,
    # contributes 1 token there, and splits into window 2
    spans3 = {r.window_id: r for r in d2.filter(F.col("doc_id") == 3).collect()}
    assert spans3[1].pos_in_window == 3
    assert (spans3[1].tok_start, spans3[1].tok_end) == (0, 1)
    assert (spans3[2].tok_start, spans3[2].tok_end) == (1, 3)


class TestExactQuantiles:
    def test_matches_sorted_oracle_with_plateau_and_recursion(self, spark):
        import math, random

        rng = random.Random(7)
        vals = [rng.uniform(-100, 100) for _ in range(2000)] + [42.0] * 1500
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        qs = [0.0, 0.25, 0.5, 0.9, 1.0]
        # tiny collect_limit + few buckets forces multi-round refinement
        got = {
            r["q"]: r["value"]
            for r in scale.exact_quantiles(
                df, "x", qs, n_ranges=8, collect_limit=50
            ).collect()
        }
        sv = sorted(vals)
        for q in qs:
            assert got[q] == sv[int(math.floor(q * (len(vals) - 1)))], q

    def test_kth_bounds_and_empty(self, spark):
        import pytest

        df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
        assert scale.kth_order_statistic(df, "x", 1) == 2.0
        with pytest.raises(ValueError):
            scale.kth_order_statistic(df, "x", 2)
        with pytest.raises(ValueError):
            scale.kth_order_statistic(df, "x", -1)
        empty = df.filter("x > 99")
        assert scale.kth_order_statistic(empty, "x", 0) is None

    def test_nulls_excluded_and_typed_result(self, spark):
        df = spark.createDataFrame(
            [(i,) for i in range(1, 101)] + [(None,)] * 20, "x bigint"
        )
        out = scale.exact_quantiles(df, "x", [0.5])
        assert dict(out.dtypes)["value"] == "bigint"
        assert out.collect()[0]["value"] == 50  # nulls not counted

    def test_no_shuffle_of_data_rows(self, spark):
        """Plan shape: the histogram rounds aggregate counts only —
        the selection never exchanges data rows on a sort. (TakeOrdered
        on the final bounded candidate set is not a sort exchange.)"""
        df = spark.range(0, 200_000).select(
            (F.col("id") % 977).cast("double").alias("x")
        )
        # the per-round aggregates are the whole plan; assert the
        # count-histogram round contains no Sort exchange
        plan = df.groupBy(F.floor(F.col("x") / 10).alias("b")).count()
        s = plan._jdf.queryExecution().executedPlan().toString()
        assert "Sort" not in s
        got = scale.kth_order_statistic(df, "x", 100_000, collect_limit=1000)
        import math
        vals = sorted([(i % 977) for i in range(200_000)])
        assert got == float(vals[100_000])


class TestExactQuantilesByGroup:
    def test_all_groups_match_sorted_oracle(self, spark):
        """Skewed group sizes + a plateau group + a constant group,
        tiny buckets/collect_limit to force several refinement rounds;
        every (group, q) must equal the per-group sorted order
        statistic floor(q*(n-1))."""
        import math, random

        rng = random.Random(11)
        data = []
        groups = {
            "big": [rng.uniform(-1000, 1000) for _ in range(3000)],
            "plateau": [rng.uniform(0, 10) for _ in range(400)] + [5.0] * 800,
            "tiny": [3.0, 1.0, 2.0],
            "const": [7.0] * 50,
        }
        for g, vals in groups.items():
            data += [(g, v) for v in vals]
        rng.shuffle(data)
        df = spark.createDataFrame(data, "g string, x double")
        qs = [0.0, 0.25, 0.5, 0.99, 1.0]
        out = scale.exact_quantiles_by_group(
            df, ["g"], "x", qs, n_ranges=8, collect_limit=40
        )
        got = {(r["g"], r["q"]): r["value"] for r in out.collect()}
        assert len(got) == len(groups) * len(qs)
        for g, vals in groups.items():
            sv = sorted(vals)
            for q in qs:
                want = sv[int(math.floor(q * (len(vals) - 1)))]
                assert got[(g, q)] == want, (g, q)

    def test_nulls_excluded_typed_result_multi_key(self, spark):
        """Two-column group key, bigint values, null values excluded
        from the count (a group of only nulls disappears)."""
        rows = (
            [("a", 1, i) for i in range(1, 11)]
            + [("a", 1, None)] * 3
            + [("a", 2, 100)]
            + [("b", 1, None)] * 2
        )
        df = spark.createDataFrame(rows, "k1 string, k2 int, x bigint")
        out = scale.exact_quantiles_by_group(df, ["k1", "k2"], "x", [0.5])
        assert dict(out.dtypes)["value"] == "bigint"
        got = {(r["k1"], r["k2"]): r["value"] for r in out.collect()}
        assert got == {("a", 1): 5, ("a", 2): 100}

    def test_rejects_bad_quantile(self, spark):
        import pytest

        df = spark.createDataFrame([("a", 1.0)], "g string, x double")
        with pytest.raises(ValueError):
            scale.exact_quantiles_by_group(df, ["g"], "x", [1.5])

    def test_max_selectors_fail_fast_on_high_cardinality_key(self, spark):
        """Driver-state contract: #groups x #quantiles over
        max_selectors fails fast with the contract named, instead of
        melting the driver; raising the cap deliberately works."""
        import pytest

        df = spark.range(0, 40).select(
            F.col("id").cast("string").alias("g"),
            F.col("id").cast("double").alias("x"),
        )
        with pytest.raises(ValueError, match="max_selectors"):
            scale.exact_quantiles_by_group(
                df, ["g"], "x", [0.25, 0.5, 0.75], max_selectors=100
            )
        out = scale.exact_quantiles_by_group(
            df, ["g"], "x", [0.5], max_selectors=100
        )
        assert out.count() == 40


class TestMadOutliers:
    def test_known_outliers_and_zero_mad_group(self, spark):
        """Group 'a': symmetric bulk around 100 plus two far points ->
        median/MAD from sorted lists, outliers = |x-med| > 3*MAD.
        Group 'b': constant values (MAD=0) -> every deviating row is an
        outlier, the rest are not."""
        import statistics

        a_vals = list(range(90, 111)) + [1000, -500]  # 23 values
        b_vals = [7] * 10 + [8, 9]
        rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
        df = spark.createDataFrame(rows, "g string, x long")
        got = {
            r["g"]: (r["median"], r["mad"], r["n"], r["n_outliers"])
            for r in scale.mad_outliers(df, ["g"], "x").collect()
        }

        def lower_median(vs):
            sv = sorted(vs)
            return sv[(len(sv) - 1) // 2]

        for g, vals in (("a", a_vals), ("b", b_vals)):
            med = lower_median(vals)
            mad = lower_median([abs(v - med) for v in vals])
            out = sum(1 for v in vals if abs(v - med) > 3 * mad)
            assert got[g] == (med, mad, len(vals), out), g
        assert got["b"][1] == 0  # constant bulk -> MAD 0
        assert got["b"][3] == 2  # the two deviants flagged


def test_kth_order_statistic_ignores_nulls(spark):
    """r6 review: orderBy sorts NULLS FIRST — the small-frame collect
    path must not return a null or shift k by the null count."""
    from change_data_capture_spark.extensions.scale import kth_order_statistic

    df = spark.createDataFrame(
        [(None,), (10.0,), (None,), (20.0,), (30.0,)], "v double"
    )
    assert kth_order_statistic(df, "v", 0) == 10.0
    assert kth_order_statistic(df, "v", 2) == 30.0


def test_histogram_clamps_outliers_before_floor(spark):
    """r6 review: a far-outlier/inf value must clamp into the edge
    bucket, not overflow floor's BIGINT under ANSI."""
    from change_data_capture_spark.extensions.scale import histogram

    df = spark.createDataFrame(
        [(0.05,), (1e300,), (float("inf"),), (-1e300,)], "v double"
    )
    got = {r["bucket"]: r["n"] for r in histogram(df, "v", lo=0.0, hi=1.0, buckets=10).collect()}
    assert got == {0: 2, 9: 2}  # outliers clamp to the edges


def test_zorder_expr_clamps_outliers_before_floor(spark):
    from change_data_capture_spark.extensions.scale import zorder_expr

    df = spark.createDataFrame([(1e300, -1e300), (0.5, 0.5)], "x double, y double")
    rows = df.select(zorder_expr(("x", 0.0, 1.0), ("y", 0.0, 1.0)).alias("z")).collect()
    assert all(r["z"] is not None and r["z"] >= 0 for r in rows)


def test_context_windows_empty_docs_occupy_no_tokens(spark):
    """r6 review: split('') returns [''] (size 1) — empty docs must
    contribute ZERO tokens and no window span, or every downstream
    offset shifts."""
    from change_data_capture_spark.extensions.scale import context_windows

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, ""), (3, "   "), (4, "e f g h")],
        "doc_id long, text string",
    )
    out = context_windows(docs, size=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 4}  # empty docs emit no span
    # doc 4 starts exactly where doc 1 ended: window 1, position 0
    (w4,) = by_doc[4]
    assert (w4["window_id"], w4["pos_in_window"]) == (1, 0)


def test_prefix_sum_rejects_non_numeric_order_column(spark):
    import pytest

    from change_data_capture_spark.extensions.scale import prefix_sum

    df = spark.createDataFrame([("doc_001", 3)], "id string, n bigint")
    with pytest.raises(ValueError, match="'id' is string"):
        prefix_sum(df, "id", "n")


def test_exact_quantiles_by_group_small_groups_resolve_in_two_actions(spark):
    """r11 structural pin: with every group under collect_limit the
    whole call is TWO Spark actions — the limited base-stats collect
    and ONE batched k-th-smallest finish. The pre-r11 shape paid a
    separate cardinality probe, a histogram-count round, and one
    TakeOrdered job PER selector (G groups x Q quantiles of pure
    scheduler fixed cost)."""
    from change_data_capture_spark.planaudit import ExecutedPlanCollector

    df = spark.createDataFrame(
        [("a", float(i)) for i in range(20)]
        + [("b", float(i)) for i in range(30)],
        "g string, x double",
    )
    with ExecutedPlanCollector(spark) as col:
        col.drain()
        col.clear()
        out = scale.exact_quantiles_by_group(df, ["g"], "x", [0.25, 0.5, 0.75])
        n_build = len(col.drain())
    assert n_build == 2, f"expected 2 build actions, saw {n_build}"
    got = {(r["g"], r["q"]): r["value"] for r in out.collect()}
    import math as _m

    for g, n in (("a", 20), ("b", 30)):
        vals = sorted(range(n))
        for q in (0.25, 0.5, 0.75):
            assert got[(g, q)] == float(vals[int(_m.floor(q * (n - 1)))])
