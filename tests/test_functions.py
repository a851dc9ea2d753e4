"""T11 compat-mode type rules (DBUtils.java / ResultSetToDMLRecord.java)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, LongType, StringType

from change_data_capture_spark import functions as cf
from change_data_capture_spark.schema import compat_decimal_type


class TestDecimalCompat:
    def test_rules(self):
        # scale != 0 -> double; precision > 9 -> long; else int
        assert isinstance(compat_decimal_type(10, 2), DoubleType)
        assert isinstance(compat_decimal_type(18, 0), LongType)
        assert isinstance(compat_decimal_type(9, 0), IntegerType)

    def test_cast_values(self, spark):
        df = spark.createDataFrame([("123.45",)], "d string").select(
            cf.compat_decimal(F.col("d"), 10, 2).alias("dbl"),
            cf.compat_decimal(F.col("d"), 18, 0).alias("lng"),
            cf.compat_decimal(F.col("d"), 9, 0).alias("it"),
        )
        row = df.collect()[0]
        assert row["dbl"] == pytest.approx(123.45)
        assert row["lng"] == 123 and row["it"] == 123


class TestTemporalCompat:
    def test_date_roundtrip(self, spark):
        df = spark.createDataFrame([(dt.date(2024, 3, 1),)], "d date")
        out = df.select(
            cf.date_to_epoch_days(F.col("d")).alias("days"),
        ).withColumn("back", cf.epoch_days_to_date(F.col("days")))
        row = out.collect()[0]
        assert row["days"] == (dt.date(2024, 3, 1) - dt.date(1970, 1, 1)).days
        assert row["back"] == dt.date(2024, 3, 1)

    def test_time_micros_of_day(self, spark):
        ts = dt.datetime(2024, 3, 1, 13, 45, 30, 123456)
        df = spark.createDataFrame([(ts,)], "t timestamp")
        row = df.select(cf.time_to_micros_of_day(F.col("t")).alias("us")).collect()[0]
        expected = ((13 * 60 + 45) * 60 + 30) * 1_000_000 + 123456
        assert row["us"] == expected

    def test_timestamp_micros_roundtrip(self, spark):
        ts = dt.datetime(2024, 3, 1, 13, 45, 30, 123456)
        df = spark.createDataFrame([(ts,)], "t timestamp")
        out = df.select(cf.timestamp_to_epoch_micros(F.col("t")).alias("us")).withColumn(
            "back", cf.epoch_micros_to_timestamp(F.col("us"))
        )
        row = out.collect()[0]
        assert row["back"] == ts


class TestJdbcTypeMap:
    def test_mappings(self):
        assert isinstance(cf.jdbc_compat_type("TINYINT"), IntegerType)
        assert isinstance(cf.jdbc_compat_type("SMALLINT"), IntegerType)
        assert isinstance(cf.jdbc_compat_type("CLOB"), StringType)
        assert isinstance(cf.jdbc_compat_type("DATE"), IntegerType)
        assert isinstance(cf.jdbc_compat_type("TIME"), LongType)
        assert isinstance(cf.jdbc_compat_type("TIMESTAMP"), LongType)
        assert isinstance(cf.jdbc_compat_type("NUMERIC", 12, 4), DoubleType)

    def test_rejected_types(self):
        for t in ("ARRAY", "STRUCT", "SQLXML", "REF"):
            with pytest.raises(cf.UnsupportedTypeException):
                cf.jdbc_compat_type(t)
        with pytest.raises(cf.UnsupportedTypeException):
            cf.jdbc_compat_type("GEOMETRY")


def test_pseudonym_and_mask_email(spark):
    from change_data_capture_spark import functions as cf

    df = spark.createDataFrame(
        [("alice@mail.test",), ("no-at-sign",), ("bob@corp.example",)],
        "email string",
    )
    out = df.select(
        "email",
        cf.pseudonym("email", salt="k").alias("tok"),
        cf.mask_email("email", salt="k").alias("masked"),
    ).collect()
    rows = {r["email"]: r for r in out}
    import hashlib

    want = hashlib.sha256(b"k:alice@mail.test").hexdigest()[:16]
    assert rows["alice@mail.test"]["tok"] == want
    # email shape: token local part, domain preserved
    assert rows["alice@mail.test"]["masked"].endswith("@mail.test")
    assert not rows["alice@mail.test"]["masked"].startswith("alice")
    assert rows["bob@corp.example"]["masked"].endswith("@corp.example")
    # deterministic: same input -> same token
    (again,) = df.filter("email = 'alice@mail.test'").select(
        cf.pseudonym("email", salt="k").alias("t")
    ).collect()
    assert again["t"] == want
    # non-email: fully tokenized, no '@'
    assert "@" not in rows["no-at-sign"]["masked"]
