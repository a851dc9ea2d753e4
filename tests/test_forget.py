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


def test_forget_keys_propagates_to_value_index(spark, tmp_path):
    """r8 seam review (VERDICT directive #5): a registered derived
    VALUE INDEX is a copy of the indexed values + PK postings — after
    forget_keys the index must no longer serve the erased keys from
    ANY remaining version, and the report must say it was checked."""
    from change_data_capture_spark.apply import register_derived_index
    from change_data_capture_spark.derive import maintain_value_index

    base, cat = _seed(spark, tmp_path)
    maintain_value_index(spark, cat, T, ["email"], "shop.users_by_email")
    register_derived_index(
        cat, "shop.users_by_email", base_table=T, kind="value_index",
        params={"value_cols": ["email"]},
    )
    # the erased user's email is readable through the index before
    erased_email = "user7@mail.test"
    idx = cat.read(spark, "shop.users_by_email")
    assert idx.filter(F.col("email") == erased_email).count() == 1

    keys = spark.createDataFrame([(7,), (30,)], "id long")
    rep = forget_keys(spark, cat, T, keys)
    assert "shop.users_by_email" in rep["derived"]
    assert rep["derived"]["shop.users_by_email"]["versions_verified"]
    # no remaining index version serves the erased ids or values
    for v in cat.versions("shop.users_by_email"):
        idx_v = cat.read(spark, "shop.users_by_email", version=v)
        assert idx_v.filter(F.col("email") == erased_email).count() == 0
        assert (
            idx_v.select(F.explode("postings").alias("p"))
            .filter(F.col("p.id").isin(7, 30))
            .count()
            == 0
        )
    # unrelated postings intact
    assert cat.read(spark, "shop.users_by_email").count() == 98


def test_forget_keys_propagates_to_minhash_signature_index(spark, tmp_path):
    """The signature catalog keyed by doc id must drop (and purge from
    history) the erased documents' signature rows."""
    from change_data_capture_spark.apply import register_derived_index
    from change_data_capture_spark.extensions import dedup

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog number {i} "
              f"with some shared boilerplate text padding") for i in range(40)],
        "doc_id long, text string",
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(docs, "ml.docs", ["doc_id"]), cat)
    apply_changelog(
        spark, dedup.signature_changelog(docs, "ml.sigs", n=5, k=32), cat
    )
    register_derived_index(
        cat, "ml.sigs", base_table="ml.docs", kind="minhash_sigs",
        params={"n": 5, "k": 32},
    )
    keys = spark.createDataFrame([(3,), (17,)], "doc_id long")
    rep = forget_keys(spark, cat, "ml.docs", keys)
    assert "ml.sigs" in rep["derived"]
    for v in cat.versions("ml.sigs"):
        got = cat.read(spark, "ml.sigs", version=v)
        assert got.filter(F.col("doc_id").isin(3, 17)).count() == 0
    assert cat.read(spark, "ml.sigs").count() == 38


def test_forget_column_drops_indexes_built_from_the_column(spark, tmp_path):
    """forget_column on a column that IS a derived index's identity
    (value_cols member / minhash text_col): no rewrite can scrub the
    index — it must be dropped outright and reported."""
    from change_data_capture_spark.apply import (
        forget_column,
        register_derived_index,
    )
    from change_data_capture_spark.derive import maintain_value_index

    base, cat = _seed(spark, tmp_path)
    maintain_value_index(spark, cat, T, ["email"], "shop.users_by_email")
    register_derived_index(
        cat, "shop.users_by_email", base_table=T, kind="value_index",
        params={"value_cols": ["email"]},
    )
    rep = forget_column(spark, cat, T, "email")
    assert rep["derived"] == {"shop.users_by_email": {"dropped": True}}
    assert "shop.users_by_email" not in cat.tables()
    import os
    assert not os.path.isdir(cat.table_dir("shop.users_by_email"))
    # base survived, column physically gone (existing contract)
    assert cat.read(spark, T).columns == ["id", "balance"]


def test_forget_column_leaves_unrelated_indexes_alone(spark, tmp_path):
    """A derived index NOT built from the erased column holds only
    base-PK postings — it survives the erasure untouched."""
    from change_data_capture_spark.apply import (
        forget_column,
        register_derived_index,
    )
    from change_data_capture_spark.derive import maintain_value_index

    base, cat = _seed(spark, tmp_path)
    maintain_value_index(spark, cat, T, ["email"], "shop.users_by_email")
    register_derived_index(
        cat, "shop.users_by_email", base_table=T, kind="value_index",
        params={"value_cols": ["email"]},
    )
    rep = forget_column(spark, cat, T, "balance")
    assert rep["derived"] == {}
    assert "shop.users_by_email" in cat.tables()
    assert cat.read(spark, "shop.users_by_email").count() == 100


def test_keep_last_1_verifies_exactly_one_version_per_artifact(spark, tmp_path):
    """r9 cost bound: the erasure proof scans every REMAINING version
    of the base and each derived child — with the documented
    keep_last=1 that must be exactly ONE version per artifact (the
    verification read is bucket-unpruned by design, so the version
    count IS the cost knob)."""
    from change_data_capture_spark.apply import register_derived_index
    from change_data_capture_spark.extensions import dedup

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox jumps over dog number {i} "
              f"with some shared boilerplate text padding") for i in range(30)],
        "doc_id long, text string",
    )
    cat = TableCatalog(str(tmp_path / "cat"))
    apply_changelog(spark, snapshot_changelog(docs, "ml.docs", ["doc_id"]), cat)
    # second base version so pre-erasure history exists
    apply_changelog(
        spark,
        dml_records(docs.filter("doc_id < 3"), "ml.docs", ["doc_id"],
                    op="UPDATE", version=2,
                    value_overrides={"text": F.concat(F.col("text"), F.lit("!"))}),
        cat,
    )
    apply_changelog(
        spark, dedup.signature_changelog(docs, "ml.sigs", n=5, k=32), cat
    )
    register_derived_index(
        cat, "ml.sigs", base_table="ml.docs", kind="minhash_sigs",
        params={"n": 5, "k": 32},
    )
    keys = spark.createDataFrame([(7,), (11,)], "doc_id long")
    rep = forget_keys(spark, cat, "ml.docs", keys, keep_last=1)
    assert len(rep["versions_verified"]) == 1
    for child_rep in rep["derived"].values():
        assert len(child_rep["versions_verified"]) == 1
        assert "versions_unverified" not in child_rep
