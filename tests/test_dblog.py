"""DBLog chunked-snapshot tests: watermark-window key-drop prevents
raced-chunk clobbering (pinned BOTH ways), arbitrary chunk/feed
interleavings converge to the live source state, and keyset chunks
push their range predicate into the scan."""

import random

from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog
from change_data_capture_spark.changelog import dml_records
from change_data_capture_spark.dblog import ChunkedSnapshot, select_chunk

SCHEMA = "id long, amount double"


def _rows(df):
    return {r["id"]: r["amount"] for r in df.collect()}


def _snapshotter(spark, tmp_path, sub):
    cat = TableCatalog(str(tmp_path / sub))
    base = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(1, 13)], SCHEMA
    )
    cs = ChunkedSnapshot(spark, cat, "shop.orders", ["id"], base.schema.json())
    cs.begin()
    return base, cs


def test_raced_chunk_window_drop_prevents_clobber(spark, tmp_path):
    """A chunk whose select raced a feed commit may carry the STALE
    image at a version ABOVE the applied event — the paper's window
    drop is what keeps the event's value. Pin both directions."""
    for use_drop in (True, False):
        base, cs = _snapshotter(spark, tmp_path, f"race_{use_drop}")
        feed = dml_records(
            base.filter(F.col("id") == 5), "shop.orders", ["id"], op="UPDATE",
            version=100, value_overrides={"amount": F.lit(999.0)},
        )
        cs.apply_feed(feed)
        # chunk selected across the commit: it still shows id=5's old
        # image (stale read), plus clean rows 1-6
        raced = base.filter(F.col("id") <= 6)
        v = cs.apply_chunk(raced, window_events=feed if use_drop else None)
        assert v == 101
        got = _rows(cs.result())
        if use_drop:
            assert got[5] == 999.0  # event survived the chunk
        else:
            assert got[5] == 50.0  # clobbered: the drop is load-bearing


def test_interleavings_converge_to_live_source(spark, tmp_path):
    """Random chunk boundaries x fixed feed schedule: a simulated live
    source mutates between steps; every interleaving must land exactly
    on the source's final state (including a mid-bootstrap insert and
    a delete that must NOT be resurrected by a later chunk)."""
    rng = random.Random(7)
    for trial in range(3):
        base, cs = _snapshotter(spark, tmp_path, f"il_{trial}")
        # live source as a dict simulation
        src = {i: 10.0 * i for i in range(1, 13)}

        def live(spark=spark):
            return spark.createDataFrame(sorted(src.items()), SCHEMA)

        bounds = sorted(rng.sample(range(2, 13), 2))
        cuts = [1, *bounds, None]
        chunks = list(zip(cuts[:-1], cuts[1:]))

        # step 1: first chunk from the pristine source
        cs.apply_chunk(select_chunk(live(), "id", *chunks[0]))
        # step 2: feed batch A — update evens, insert id=20
        for k in list(src):
            if k % 2 == 0:
                src[k] += 5
        src[20] = 200.0
        upd = dml_records(
            live().filter((F.col("id") % 2 == 0)), "shop.orders", ["id"],
            op="UPDATE", version=1000,
        )
        cs.apply_feed(upd)
        # step 3: second chunk from the NOW-mutated source
        cs.apply_chunk(select_chunk(live(), "id", *chunks[1]))
        # step 4: feed batch B — delete id=3 and id=11
        dele = dml_records(
            live().filter(F.col("id").isin(3, 11)), "shop.orders", ["id"],
            op="DELETE", version=2000, keys_only=True,
        )
        for k in (3, 11):
            src.pop(k)
        cs.apply_feed(dele)
        # step 5: last chunk, read after the delete — must not
        # resurrect 3/11 even if its range covers them
        cs.apply_chunk(select_chunk(live(), "id", *chunks[2]))

        assert _rows(cs.result()) == src, (trial, chunks)


def test_chunk_range_pushes_down(spark, tmp_path):
    src = spark.createDataFrame([(i, 1.0 * i) for i in range(100)], SCHEMA)
    p = str(tmp_path / "src_pq")
    src.write.parquet(p)
    chunk = select_chunk(spark.read.parquet(p), "id", 10, 20)
    plan = chunk._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(id,10)" in plan, plan
    assert chunk.count() == 10


def test_dense_version_feed_collision_raises(spark, tmp_path):
    """Dense feed versions (e.g. raw SYS_CHANGE_VERSION ints): a chunk
    stamp at applied+1 collides with the next feed version; the guard
    must raise instead of silently losing those events."""
    import pytest

    from change_data_capture_spark.dblog import VersionCollisionError

    base, cs = _snapshotter(spark, tmp_path, "dense")
    cs.apply_feed(dml_records(base.filter(F.col("id") <= 2), "shop.orders",
                              ["id"], op="UPDATE", version=5))
    cs.apply_chunk(base.filter(F.col("id") <= 6))  # stamps version 6
    nxt = dml_records(base.filter(F.col("id") == 3), "shop.orders", ["id"],
                      op="UPDATE", version=6,
                      value_overrides={"amount": F.lit(777.0)})
    with pytest.raises(VersionCollisionError):
        cs.apply_feed(nxt)
    # sparse domains never trigger it; redeliveries still skip silently
    base2, cs2 = _snapshotter(spark, tmp_path, "sparse")
    feed = dml_records(base2.filter(F.col("id") <= 2), "shop.orders", ["id"],
                       op="UPDATE", version=5_000_000)
    cs2.apply_feed(feed)
    cs2.apply_chunk(base2)
    cs2.apply_feed(feed)  # at-least-once redelivery: no raise
    cs2.apply_feed(dml_records(base2.filter(F.col("id") == 3), "shop.orders",
                               ["id"], op="UPDATE", version=6_000_000))


def test_sparse_versions_unblocks_dense_feeds(spark, tmp_path):
    from change_data_capture_spark.dblog import sparse_versions

    base, cs = _snapshotter(spark, tmp_path, "remap")
    feed1 = sparse_versions(dml_records(
        base.filter(F.col("id") <= 2), "shop.orders", ["id"],
        op="UPDATE", version=5))
    cs.apply_feed(feed1)
    cs.apply_chunk(base)  # stamps 5001 — in the gap
    nxt = sparse_versions(dml_records(
        base.filter(F.col("id") == 3), "shop.orders", ["id"], op="UPDATE",
        version=6, value_overrides={"amount": F.lit(777.0)}))
    cs.apply_feed(nxt)  # 6000 > 5001: no collision
    assert _rows(cs.result())[3] == 777.0
