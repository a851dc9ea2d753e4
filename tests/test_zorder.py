"""Z-order layout tests: hand-computed Morton interleave, clamping,
compact(sort_by=zorder) physical layout + reader invisibility, and
the multi-dimensional zone-map payoff (row-group stats selective on
BOTH columns, where a lexicographic sort only serves its leading
column)."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.changelog import snapshot_changelog
from change_data_capture_spark.extensions.scale import zorder_expr


def test_zorder_hand_computed_interleave(spark):
    # bits=2 over [0,4): cell width 1. (x=1, y=2) -> qx=01, qy=10;
    # interleave LSB-first (x at even positions, y at odd):
    # bit0(x)=1 -> pos0; bit1(y)=1 -> pos3 => key = 1 + 8 = 9
    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    (r,) = df.select(
        zorder_expr(("x", 0, 4), ("y", 0, 4), bits=2).alias("z")
    ).collect()
    assert r["z"] == 9
    # clamping: out-of-range values land in edge cells
    df2 = spark.createDataFrame([(-5.0, 99.0)], "x double, y double")
    (r2,) = df2.select(
        zorder_expr(("x", 0, 4), ("y", 0, 4), bits=2).alias("z")
    ).collect()
    # qx=0 (00), qy=3 (11) -> bits at pos1 and pos3 -> 2 + 8 = 10
    assert r2["z"] == 10


def test_zorder_validation():
    with pytest.raises(ValueError):
        zorder_expr(("x", 0, 1))
    with pytest.raises(ValueError):
        zorder_expr(("x", 0, 1), ("y", 0, 1), ("z", 0, 1), bits=22)


def _rg_ranges(files, col):
    """(min, max) per parquet row group across files."""
    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def test_compact_zorder_is_invisible_and_prunes_both_dims(spark, tmp_path):
    n = 4096
    df = spark.createDataFrame(
        [(i, float((i * 37) % 256), float((i * 101) % 256)) for i in range(n)],
        "id long, x double, y double",
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(df, "t.pts", ["id"]), cat)
    before = sorted(tuple(r) for r in cat.read(spark, "t.pts").collect())

    cat.compact(
        spark, "t.pts",
        sort_by=[zorder_expr(("x", 0, 256), ("y", 0, 256), bits=8)],
    )
    after = sorted(tuple(r) for r in cat.read(spark, "t.pts").collect())
    assert after == before, "re-layout must be invisible to readers"

    meta = cat.meta("t.pts")
    cur = tmp_path / "cat" / "t.pts" / meta["current"]
    files = glob.glob(str(cur / "__bucket=*" / "*.parquet"))
    assert files
    # each bucket file must be physically z-key sorted
    for f in files:
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        zs = [_z8(x, y) for x, y in zip(xs, ys)]
        assert zs == sorted(zs), f"bucket file not z-sorted: {f}"


def _z8(x, y):
    qx, qy = min(255, max(0, int(x))), min(255, max(0, int(y)))
    z = 0
    for i in range(8):
        z |= ((qx >> i) & 1) << (2 * i)
        z |= ((qy >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_beats_lexicographic_on_trailing_dim(spark, tmp_path):
    """The point of z-order: with row groups laid out along the
    z-curve, a range predicate on the SECOND column is selective in
    the row-group stats; under a lexicographic (x, y) sort the
    y-stats of every row group span the whole domain."""
    n = 1 << 14
    rows = [(i, float((i * 37) % 256), float((i * 101) % 256)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    def write(sort_cols, sub):
        cat = TableCatalog(str(tmp_path / sub))
        apply_changelog(spark, snapshot_changelog(df, "t.pts", ["id"]), cat)
        # single bucket so layout differences come from the sort alone
        cat.compact(spark, "t.pts", n_buckets=1, sort_by=sort_cols)
        meta = cat.meta("t.pts")
        return glob.glob(
            str(tmp_path / sub / "t.pts" / meta["current"] / "__bucket=*" / "*.parquet")
        )

    # force many small row groups so stats granularity exists —
    # parquet.block.size is a writer-side hadoop conf, not a SQL conf
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    old_page = hconf.get("parquet.page.size")
    hconf.set("parquet.block.size", "8192")
    hconf.set("parquet.page.size", "1024")
    try:
        lex = write([F.col("x"), F.col("y")], "lex")
        zed = write([zorder_expr(("x", 0, 256), ("y", 0, 256), bits=8)], "zed")
    finally:
        for k, v in (("parquet.block.size", old_block), ("parquet.page.size", old_page)):
            if v is None:
                hconf.unset(k)
            else:
                hconf.set(k, v)

    def overlap_frac(files, col, lo, hi):
        rgs = _rg_ranges(files, col)
        hit = sum(1 for mn, mx in rgs if not (mx < lo or mn > hi))
        return hit / len(rgs), len(rgs)

    lex_frac, lex_n = overlap_frac(lex, "y", 0, 31)
    zed_frac, zed_n = overlap_frac(zed, "y", 0, 31)
    assert lex_n > 4 and zed_n > 4, (lex_n, zed_n)
    # lexicographic: nearly every row group spans y's whole domain;
    # z-order: only ~the y-slice of the curve overlaps
    assert zed_frac < lex_frac, (zed_frac, lex_frac)
    assert zed_frac <= 0.75, zed_frac
