"""Entity resolution: blocked matching, multi-pass union, survivorship.

Hand-built golden cases pin the match semantics (distance threshold,
block-key confinement, multi-pass dedup) and the survivorship policy
(left-preferred with NULL fallback, max-collapse on multi-match); the
oracle queries (er_blocked_match, er_golden_records) cross-check the
same operators against DuckDB's levenshtein at corpus shape."""

from pyspark.sql import functions as F

from change_data_capture_spark.extensions import er


def _pairs(df):
    return sorted((r.left_id, r.right_id, r.distance) for r in df.collect())


def test_blocked_match_confined_to_blocks(spark):
    left = spark.createDataFrame(
        [(1, "anna", "b1"), (2, "kurt", "b2")], "rec_id long, name string, blk string"
    )
    right = spark.createDataFrame(
        [(101, "anba", "b1"), (102, "annz", "b2")], "rec_id long, name string, blk string"
    )
    # annz is distance 1 from anna but sits in another block: no pair
    got = _pairs(
        er.blocked_match(left, right, block_cols=["blk"], max_distance=1)
    )
    assert got == [(1, 101, 1)]


def test_multi_pass_union_dedups_and_extends_recall(spark):
    left = spark.createDataFrame(
        [(1, "anna", "b1", "x"), (2, "kurt", "b2", "y")],
        "rec_id long, name string, blk string, blk2 string",
    )
    right = spark.createDataFrame(
        # found by BOTH passes (same blk and blk2) -> must dedup;
        # annz only shares blk2 -> only pass 2 finds it
        [(101, "anba", "b1", "x"), (102, "annz", "b9", "x")],
        "rec_id long, name string, blk string, blk2 string",
    )
    got = _pairs(
        er.match_pairs_multi_pass(
            left, right, passes=[("blk",), ("blk2",)], max_distance=1
        )
    )
    assert got == [(1, 101, 1), (1, 102, 1)]


def test_golden_records_left_preferred_with_null_fallback(spark):
    left = spark.createDataFrame(
        [(1, "anna", None), (2, "kurt", 50.0)],
        "rec_id long, name string, bal double",
    )
    right = spark.createDataFrame(
        [(101, "anna", 10.0), (102, "kurt", 99.0)],
        "rec_id long, name string, bal double",
    )
    matches = spark.createDataFrame(
        [(1, 101, 0), (2, 102, 0)], "left_id long, right_id long, distance int"
    )
    rows = {
        r.left_id: (r.name, r.bal)
        for r in er.golden_records(
            matches, left, right, prefer=["name", "bal"]
        ).collect()
    }
    # 1 has no master bal -> feed fills it; 2 keeps the master's 50
    assert rows == {1: ("anna", 10.0), 2: ("kurt", 50.0)}


def test_blocked_match_degenerate_block_cap(spark):
    """max_block_size drops non-selective blocks (default-value zip)
    before the join; selective blocks still match."""
    from change_data_capture_spark.extensions import er

    left = spark.createDataFrame(
        [(i, f"alice-{i}", "00000") for i in range(50)]  # degenerate block
        + [(90, "bob smith", "12345")],
        "rec_id long, name string, zip string",
    )
    right = spark.createDataFrame(
        [(1000 + i, f"alice-{i}", "00000") for i in range(50)]
        + [(1090, "bob smyth", "12345")],
        "rec_id long, name string, zip string",
    )
    capped = er.blocked_match(
        left, right, block_cols=["zip"], max_distance=1, max_block_size=10
    )
    pairs = {(r.left_id, r.right_id) for r in capped.collect()}
    assert pairs == {(90, 1090)}, pairs

    # uncapped: the degenerate block floods the candidate set (every
    # alice-i matches alice-j at distance <= 1 for single-digit i, j)
    full = er.blocked_match(left, right, block_cols=["zip"], max_distance=1)
    full_pairs = {(r.left_id, r.right_id) for r in full.collect()}
    assert (90, 1090) in full_pairs
    assert len(full_pairs) > 51


def test_golden_records_requires_prefer_columns(spark):
    """r6 review: the old default prefer=() crashed inside
    groupBy().agg() with a bare assertion; it now fails fast."""
    import pytest

    from change_data_capture_spark.extensions import er

    m = spark.createDataFrame([(1, 2)], "left_id long, right_id long")
    l = spark.createDataFrame([(1, "a")], "rec_id long, name string")
    r = spark.createDataFrame([(2, "b")], "rec_id long, name string")
    with pytest.raises(ValueError, match="prefer is empty"):
        er.golden_records(m, l, r)


def test_multi_pass_per_pass_block_caps(spark):
    """r8 (VERDICT directive #7): max_block_size accepts a per-pass
    sequence — the degenerate bounded-cardinality pass is capped while
    the recall pass stays exact. A capped-out block contributes no
    pairs; pairs still reachable through the uncapped pass survive."""
    import pytest
    from change_data_capture_spark.extensions.er import match_pairs_multi_pass

    left = spark.createDataFrame(
        [(i, f"name{i:03d}", i % 2, "XX") for i in range(10)],
        "rec_id long, name string, blk_a int, blk_all string",
    )
    right = spark.createDataFrame(
        [(100 + i, f"name{i:03d}", i % 2, "XX") for i in range(10)],
        "rec_id long, name string, blk_a int, blk_all string",
    )
    # blk_all is one mega-block (10 rows/side); blk_a splits 5/5
    capped = match_pairs_multi_pass(
        left, right, passes=[("blk_a",), ("blk_all",)],
        max_distance=0, max_block_size=[None, 8],
    )
    exact = match_pairs_multi_pass(
        left, right, passes=[("blk_a",), ("blk_all",)], max_distance=0,
    )
    # the mega-block pass capped out, but every true pair rides pass A
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, exact.collect()))
    # cap below pass A's block size too: everything drops
    none_left = match_pairs_multi_pass(
        left, right, passes=[("blk_a",), ("blk_all",)],
        max_distance=0, max_block_size=4,
    )
    assert none_left.count() == 0
    with pytest.raises(ValueError, match="length"):
        match_pairs_multi_pass(
            left, right, passes=[("blk_a",)], max_block_size=[None, 8],
        )
