"""TableCatalog version management: time travel, vacuum under file
reuse, and the change-data-feed diff."""

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.apply import TableCatalog, apply_changelog
from change_data_capture_spark.changelog import dml_records, snapshot_changelog
from tests.conftest import load


@pytest.fixture()
def versioned_cat(spark, sf_dir, tmp_path):
    nation = load(spark, sf_dir, "nation")
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(nation, "t.n", ["n_nationkey"]), cat)  # v1
    upd = dml_records(
        nation.filter(F.col("n_nationkey") < 5), "t.n", ["n_nationkey"],
        op="UPDATE", version=2,
        value_overrides={"n_name": F.concat(F.col("n_name"), F.lit("_X"))},
    )
    dele = dml_records(
        nation.filter(F.col("n_nationkey") == 20), "t.n", ["n_nationkey"],
        op="DELETE", version=3, keys_only=True,
    )
    apply_changelog(spark, upd.unionByName(dele), cat)  # v2
    return cat, nation


def test_time_travel_reads_old_version(spark, versioned_cat):
    cat, nation = versioned_cat
    assert cat.versions("t.n") == [1, 2]
    v1 = cat.read(spark, "t.n", version=1)
    assert v1.count() == nation.count()
    assert v1.filter(F.col("n_name").endswith("_X")).count() == 0
    v2 = cat.read(spark, "t.n")
    assert v2.count() == nation.count() - 1
    assert v2.filter(F.col("n_name").endswith("_X")).count() == 5
    with pytest.raises(KeyError):
        cat.read(spark, "t.n", version=99)


def test_table_changes_cdf(spark, versioned_cat):
    cat, _ = versioned_cat
    cdf = cat.table_changes(spark, "t.n", from_version=1, to_version=2)
    by_type = {r["_change_type"]: r["n"] for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert by_type == {"update_postimage": 5, "delete": 1}
    keys = sorted(
        r["n_nationkey"] for r in cdf.filter("_change_type = 'update_postimage'").collect()
    )
    assert keys == [0, 1, 2, 3, 4]


def test_vacuum_keeps_current_readable(spark, versioned_cat):
    cat, nation = versioned_cat
    dropped = cat.vacuum("t.n", keep_last=1)
    assert dropped == [1]
    assert cat.versions("t.n") == [2]
    # file reuse: v2 hard-links some v1 files; vacuum of v1 must not
    # corrupt v2
    assert cat.read(spark, "t.n").count() == nation.count() - 1
    with pytest.raises(KeyError):
        cat.read(spark, "t.n", version=1)
