"""Schema-compatibility gate tests: Confluent BACKWARD/FORWARD/FULL
semantics over struct schemas, promotion lattice, transitive history,
and the announce_schema enforcement point."""

import pytest
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from change_data_capture_spark import compat as cp
from change_data_capture_spark.apply import TableCatalog


def _s(*fields):
    return StructType([StructField(n, t, nullable=nl) for n, t, nl in fields])


BASE = _s(("id", LongType(), False), ("amount", DoubleType(), True))


def test_add_nullable_column_backward_ok_required_not():
    ok = _s(*[(f.name, f.dataType, f.nullable) for f in BASE.fields],
            ("note", StringType(), True))
    assert cp.check_compat(BASE, ok, cp.BACKWARD) == []
    bad = _s(*[(f.name, f.dataType, f.nullable) for f in BASE.fields],
             ("note", StringType(), False))
    assert cp.check_compat(BASE, bad, cp.BACKWARD) == [
        "backward:added_required:note"
    ]
    # forward: additions always fine
    assert cp.check_compat(BASE, bad, cp.FORWARD) == []


def test_remove_column_forward_needs_nullable():
    dropped_amount = _s(("id", LongType(), False))
    assert cp.check_compat(BASE, dropped_amount, cp.BACKWARD) == []
    assert cp.check_compat(BASE, dropped_amount, cp.FORWARD) == []
    dropped_id = _s(("amount", DoubleType(), True))
    assert cp.check_compat(BASE, dropped_id, cp.FORWARD) == [
        "forward:removed_required:id"
    ]


def test_type_promotions_directional():
    widened = _s(("id", LongType(), False), ("amount", DoubleType(), True))
    narrow = _s(("id", IntegerType(), False), ("amount", DoubleType(), True))
    # int -> long promotes, so narrow-old -> widened-new is backward-ok
    assert cp.check_compat(narrow, widened, cp.BACKWARD) == []
    # but forward needs new -> old (long -> int does not promote)
    assert cp.check_compat(narrow, widened, cp.FORWARD) == [
        "forward:type:id:int<-bigint"
    ]
    assert cp.check_compat(narrow, widened, cp.FULL) == [
        "forward:type:id:int<-bigint"
    ]
    # decimals: widening both scale and integral part is ok
    d1 = _s(("amount", DecimalType(10, 2), True))
    d2 = _s(("amount", DecimalType(12, 3), True))
    d3 = _s(("amount", DecimalType(11, 4), True))  # integral part shrinks
    assert cp.check_compat(d1, d2, cp.BACKWARD) == []
    assert cp.check_compat(d1, d3, cp.BACKWARD) != []
    # long fits decimal(25,6) (19 integral digits) but not decimal(20,2)
    lng = _s(("amount", LongType(), True))
    assert cp.check_compat(lng, _s(("amount", DecimalType(25, 6), True)),
                           cp.BACKWARD) == []
    assert cp.check_compat(lng, _s(("amount", DecimalType(20, 2), True)),
                           cp.BACKWARD) != []


def test_pk_change_and_mode_validation():
    assert cp.check_compat(BASE, BASE, cp.FULL,
                           old_pks=["id"], new_pks=["id", "amount"]) == [
        "pk:['id']->['id', 'amount']"
    ]
    with pytest.raises(ValueError):
        cp.check_compat(BASE, BASE, "SIDEWAYS")


def test_transitive_history():
    v0 = _s(("id", LongType(), False), ("old_col", StringType(), True))
    v1 = _s(("id", LongType(), False))
    # new adds old_col back as REQUIRED: vs v0 it tightens a nullable
    # column (nullability violation), vs v1 it is an added-required
    # column — each tagged with the version index it arose against
    new = _s(("id", LongType(), False), ("old_col", StringType(), False))
    got = cp.check_history([v0, v1], new, cp.BACKWARD)
    assert got == ["v0:backward:nullability:old_col",
                   "v1:backward:added_required:old_col"]


def test_gate_announce_enforces(spark, tmp_path):
    cat = TableCatalog(str(tmp_path / "cat"))
    cp.gate_announce(cat, "shop.orders", BASE.json())  # first DDL passes
    widened = _s(("id", LongType(), False), ("amount", DoubleType(), True),
                 ("note", StringType(), True))
    cp.gate_announce(cat, "shop.orders", widened.json())
    bad = _s(("id", LongType(), False), ("amount", StringType(), True))
    with pytest.raises(cp.IncompatibleSchemaError) as ei:
        cp.gate_announce(cat, "shop.orders", bad.json())
    assert any(v.startswith("backward:type:amount") for v in ei.value.violations)


def test_nullability_tightening_is_breaking():
    nullable = _s(("id", LongType(), False), ("amount", DoubleType(), True))
    required = _s(("id", LongType(), False), ("amount", DoubleType(), False))
    # old rows may hold nulls the new required column can't represent
    assert cp.check_compat(nullable, required, cp.BACKWARD) == [
        "backward:nullability:amount"
    ]
    # new data may hold nulls the old required field rejects
    assert cp.check_compat(required, nullable, cp.FORWARD) == [
        "forward:nullability:amount"
    ]
    # loosening is fine backward; tightening is fine forward
    assert cp.check_compat(required, nullable, cp.BACKWARD) == []
    assert cp.check_compat(nullable, required, cp.FORWARD) == []
