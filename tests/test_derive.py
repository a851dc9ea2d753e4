"""Incremental aggregate maintenance (derive.py): after every batch,
the incrementally-maintained materialization must equal a full
recomputation — including group-moving updates (old group's
contribution dropped) and deletes."""

import random

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.changelog import dml_records
from change_data_capture_spark.derive import maintain_aggregate

AGGS = lambda: {  # noqa: E731
    "n": F.count("*"),
    "total": F.sum(F.col("amount")).cast("long"),
}


def _full(spark, cat):
    return cat.read(spark, "t.sales").groupBy("region").agg(
        *[e.alias(n) for n, e in AGGS().items()]
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_agg_matches_full_recompute(spark, tmp_path):
    rng = random.Random(11)
    cat = TableCatalog(str(tmp_path / "cat"))
    regions = ["east", "west", "north", "south"]

    version = 1
    base = [(i, regions[i % 4], (i * 7) % 100) for i in range(60)]
    seed = spark.createDataFrame(base, "id long, region string, amount long")
    apply_changelog(
        spark, dml_records(seed, "t.sales", ["id"], op="INSERT", version=1), cat
    )
    agg = maintain_aggregate(spark, cat, "t.sales", ["region"], AGGS())
    assert _rows(agg) == _rows(_full(spark, cat))

    for _ in range(3):
        from_version = cat.versions("t.sales")[-1]
        prev = agg.localCheckpoint()  # freeze the previous materialization
        ops = []
        for _ in range(15):
            version += 1
            key = rng.randrange(80)  # moves groups, inserts new, hits existing
            if rng.random() < 0.3:
                ops.append((version, key, "DELETE", None, None))
            else:
                ops.append(
                    (version, key, "UPDATE", regions[rng.randrange(4)], rng.randrange(100))
                )
        df = spark.createDataFrame(
            [(v, k, op, r, a) for v, k, op, r, a in ops],
            "__ver long, id long, __op string, region string, amount long",
        )
        ups = dml_records(
            df.filter(F.col("__op") != "DELETE"),
            "t.sales", ["id"], op=F.col("__op"), version=F.col("__ver"),
        )
        dels = dml_records(
            df.filter(F.col("__op") == "DELETE"),
            "t.sales", ["id"], op=F.col("__op"), version=F.col("__ver"), keys_only=True,
        )
        apply_changelog(spark, ups.unionByName(dels), cat)

        agg = maintain_aggregate(
            spark, cat, "t.sales", ["region"], AGGS(),
            prev=prev, from_version=from_version,
        )
        assert _rows(agg) == _rows(_full(spark, cat))


def test_scd2_history_interval_semantics(spark):
    from change_data_capture_spark.derive import scd2_history

    flat = spark.createDataFrame(
        [
            # k=1: insert -> update -> delete (two closed intervals)
            (1, "a", "INSERT", 10),
            (1, "b", "UPDATE", 20),
            (1, None, "DELETE", 30),
            # k=2: insert only (one open interval)
            (2, "x", "INSERT", 15),
            # k=3: insert -> update, still current
            (3, "p", "INSERT", 5),
            (3, "q", "UPDATE", 25),
        ],
        "k int, val string, CDC_OP_TYPE string, CHANGE_TRACKING_VERSION long",
    )
    out = {
        (r["k"], r["valid_from"]): (r["val"], r["valid_to"], r["is_current"])
        for r in scd2_history(flat, ["k"]).collect()
    }
    assert out == {
        (1, 10): ("a", 20, False),
        (1, 20): ("b", 30, False),  # closed by the DELETE
        (2, 15): ("x", None, True),
        (3, 5): ("p", 25, False),
        (3, 25): ("q", None, True),
    }
