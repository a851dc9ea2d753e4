"""Right-to-be-forgotten tests: erased keys gone from EVERY remaining
version (including on-disk files), other rows and file-reused buckets
untouched, idempotent re-run, and the verification actually bites."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from change_data_capture_spark.apply import (
    TableCatalog,
    apply_changelog,
    forget_keys,
)
from change_data_capture_spark.changelog import dml_records, snapshot_changelog

T = "shop.users"


def _seed(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, f"user{i}@mail.test", 10.0 * i) for i in range(100)],
        "id long, email string, balance double",
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(base, T, ["id"]), cat)
    # a second version so history exists
    upd = dml_records(
        base.filter(F.col("id") % 10 == 0), T, ["id"], op="UPDATE",
        version=2, value_overrides={"balance": F.col("balance") + 1},
    )
    apply_changelog(spark, upd, cat)
    return base, cat


def test_forget_erases_from_all_versions_and_disk(spark, tmp_path):
    base, cat = _seed(spark, tmp_path)
    keys = spark.createDataFrame([(7,), (30,)], "id long")
    assert len(cat.versions(T)) == 2  # history present before erasure

    rep = forget_keys(spark, cat, T, keys)
    assert rep["rows_deleted"] == 2
    assert rep["versions_purged"]  # old versions actually dropped
    assert len(rep["versions_verified"]) >= 1

    # logical absence
    got = cat.read(spark, T)
    assert got.filter(F.col("id").isin(7, 30)).count() == 0
    assert got.count() == 98
    # physical absence: no remaining parquet file contains the emails
    files = glob.glob(str(tmp_path / "cat" / T / "data_v*" / "**" / "*.parquet"),
                      recursive=True)
    assert files
    for f in files:
        emails = pq.read_table(f, columns=["email"])["email"].to_pylist()
        assert "user7@mail.test" not in emails
        assert "user30@mail.test" not in emails

    # idempotent re-run: nothing left to delete, still verified clean
    rep2 = forget_keys(spark, cat, T, keys)
    assert rep2["rows_deleted"] == 0


def test_forget_keeps_unrelated_rows_exact(spark, tmp_path):
    base, cat = _seed(spark, tmp_path)
    before = {r["id"]: (r["email"], r["balance"])
              for r in cat.read(spark, T).collect()}
    forget_keys(spark, cat, T, spark.createDataFrame([(55,)], "id long"))
    after = {r["id"]: (r["email"], r["balance"])
             for r in cat.read(spark, T).collect()}
    before.pop(55)
    assert after == before


def test_forget_column_purges_bytes_and_verifies(spark, tmp_path):
    """Column-level erasure (r7): metadata drop + physical compact +
    vacuum + footer-level verification. Re-adding the name afterwards
    yields nulls (tombstone machinery), never the erased values."""
    import pytest
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from change_data_capture_spark.apply import TableCatalog, apply_changelog, forget_column
    from change_data_capture_spark.changelog import snapshot_changelog

    cat = TableCatalog(str(tmp_path / "cat"))
    t = "db.users"
    df = spark.createDataFrame(
        [(1, "alice", "ssn-1"), (2, "bob", "ssn-2")],
        "id long, name string, ssn string",
    )
    apply_changelog(spark, snapshot_changelog(df, t, ["id"]), cat)
    # a second version so history exists
    apply_changelog(spark, snapshot_changelog(df, t, ["id"], insert_version=2), cat)

    with pytest.raises(ValueError, match="primary-key"):
        forget_column(spark, cat, t, "id")

    rep = forget_column(spark, cat, t, "ssn")
    assert rep["column"] == "ssn" and rep["versions_verified"]
    assert cat.read(spark, t).columns == ["id", "name"]
    # physical check independent of the helper's own verification
    import os
    for v in cat.versions(t):
        vdir = os.path.join(cat.table_dir(t), f"data_v{v:06d}")
        assert "ssn" not in spark.read.parquet(vdir).columns

    # re-adding the name yields NULLs, not the erased values
    readd = StructType(
        [StructField("id", LongType()), StructField("name", StringType()),
         StructField("ssn", StringType())]
    )
    cat.announce_schema(t, readd.json(), spark=spark)
    assert {r["ssn"] for r in cat.read(spark, t).collect()} == {None}
