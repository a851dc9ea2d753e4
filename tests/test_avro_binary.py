"""Golden-byte tests for the pure-Catalyst Avro binary decode
(sources/avro_binary.py) — the generic-wrapper frame of the
reference's GoldenGate path (Normalizer.java:124-140) and flat
simple-type payload records. The encoders here follow the public
Avro spec layout; known spec vectors are asserted byte-for-byte."""

from pyspark.sql import functions as F

from change_data_capture_spark.sources import avro_binary as ab


def test_zigzag_encoder_matches_avro_spec_vectors():
    # From the Avro specification's varint/zigzag examples.
    assert ab.encode_zigzag_varint(0) == bytes([0x00])
    assert ab.encode_zigzag_varint(-1) == bytes([0x01])
    assert ab.encode_zigzag_varint(1) == bytes([0x02])
    assert ab.encode_zigzag_varint(-2) == bytes([0x03])
    assert ab.encode_zigzag_varint(2) == bytes([0x04])
    assert ab.encode_zigzag_varint(-64) == bytes([0x7F])
    assert ab.encode_zigzag_varint(64) == bytes([0x80, 0x01])


INTERESTING = [
    0, 1, -1, 2, -2, 63, -63, 64, -64, 100, -100,
    8191, -8192, 2**20, -(2**20), 2**31 - 1, -(2**31),
    2**40 + 17, -(2**40) - 17, 2**62, -(2**62), 2**63 - 1, -(2**63),
]


def test_varint_roundtrip_on_spark(spark):
    # trailing junk proves the decoder reports the right width
    rows = [(i, v, ab.encode_zigzag_varint(v) + b"\xde\xad") for i, v in enumerate(INTERESTING)]
    df = spark.createDataFrame(rows, "i int, expect long, value binary")
    got = (
        df.withColumn("__h", F.hex("value"))
        .withColumn("dec", ab.varint_at(F.col("__h"), F.lit(0)))
        .select("i", "expect", F.col("dec.value").alias("got"), F.col("dec.width").alias("w"))
        .orderBy("i")
        .collect()
    )
    for r, (_, v, enc) in zip(got, rows):
        assert r["got"] == r["expect"] == v
        assert r["w"] == len(enc) - 2


def test_generic_wrapper_golden_bytes(spark):
    cases = [
        ("tpch.nation", -4503599627370, b"\x01\x02\x03"),
        ("s.t", 0, b""),
        ("unicode.éè", 2**62, bytes(range(200))),
        ("x" * 70, -1, b"\x80" * 130),  # name length needs a 2-byte varint
    ]
    df = spark.createDataFrame(
        [(i, ab.encode_generic_wrapper(t, fp, p)) for i, (t, fp, p) in enumerate(cases)],
        "i int, value binary",
    )
    got = ab.decode_generic_wrapper(df, "value").orderBy("i").collect()
    for r, (t, fp, p) in zip(got, cases):
        assert r["table_name"] == t
        assert r["schema_fingerprint"] == fp
        assert bytes(r["payload"]) == p


def test_flat_payload_simple_types(spark):
    fields = [("op", "string"), ("key", "long"), ("name", "string"), ("ver", "int")]
    cases = [
        ("I", 12345678901234, "alice", 7),
        ("D", -1, "", 0),
        ("U", 2**60, "café ☃", -(2**31)),
    ]
    payloads = [
        ab.encode_string(op)
        + ab.encode_zigzag_varint(key)
        + ab.encode_string(name)
        + ab.encode_zigzag_varint(ver)
        for op, key, name, ver in cases
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, payload binary"
    )
    got = ab.decode_flat_payload(df, fields).orderBy("i").collect()
    for r, (op, key, name, ver) in zip(got, cases):
        assert (r["op"], r["key"], r["name"], r["ver"]) == (op, key, name, ver)


def test_wrapper_then_payload_end_to_end(spark):
    """Full reference dataflow shape: wrapper frame -> payload decode
    (Normalizer.transform without the datum reader)."""
    fields = [("k", "long"), ("v", "string")]
    payload = ab.encode_zigzag_varint(42) + ab.encode_string("hello")
    msg = ab.encode_generic_wrapper("ns.table", 99, payload)
    df = spark.createDataFrame([(msg,)], "value binary")
    out = ab.decode_flat_payload(ab.decode_generic_wrapper(df, "value"), fields)
    r = out.collect()[0]
    assert (r["table_name"], r["schema_fingerprint"], r["k"], r["v"]) == (
        "ns.table", 99, 42, "hello",
    )

    # the decode is a pure projection: no shuffle, no Python eval
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


GG_ROW_SPEC = (
    "record",
    [
        ("table", "string"),
        ("op_type", "string"),
        ("op_ts", "string"),
        ("pos", "long"),
        ("primary_keys", ("array", "string")),
        (
            "before",
            (
                "nullable",
                (
                    "record",
                    [
                        ("s_suppkey", "long"),
                        ("s_suppkey_isMissing", "boolean"),
                        ("s_name", "string"),
                        ("s_name_isMissing", "boolean"),
                    ],
                ),
            ),
        ),
        (
            "after",
            (
                "nullable",
                (
                    "record",
                    [
                        ("s_suppkey", "long"),
                        ("s_suppkey_isMissing", "boolean"),
                        ("s_name", "string"),
                        ("s_name_isMissing", "boolean"),
                    ],
                ),
            ),
        ),
    ],
)


def _enc_inner(key, name, key_missing=False, name_missing=False):
    return (
        ab.encode_zigzag_varint(key)
        + ab.encode_boolean(key_missing)
        + ab.encode_string(name)
        + ab.encode_boolean(name_missing)
    )


def _enc_gg_row(table, op, ts, pos, pks, before, after):
    return (
        ab.encode_string(table)
        + ab.encode_string(op)
        + ab.encode_string(ts)
        + ab.encode_zigzag_varint(pos)
        + ab.encode_string_array(pks)
        + ab.encode_nullable(before)
        + ab.encode_nullable(after)
    )


def test_nested_gg_payload_decode(spark):
    """The reference's wrapped-DML payload shape (Normalizer.java:92-104,
    AvroConverter.java:51-245): nested records, null/non-null unions,
    string arrays, _isMissing booleans — decoded via decode_record."""
    cases = [
        # INSERT: before null, after present
        ("gg.supplier", "I", "2020-01-01 00:00:00", 7,
         ["s_suppkey"], None, _enc_inner(42, "alice")),
        # DELETE: before present, after null
        ("gg.supplier", "D", "2020-01-02 11:22:33", -9,
         ["s_suppkey", "s_name"], _enc_inner(43, "bob", name_missing=True), None),
        # UPDATE: both sides, empty pk array
        ("gg.supplier", "U", "", 2**40, [], _enc_inner(44, ""), _enc_inner(44, "carol")),
    ]
    rows = [
        (i, _enc_gg_row(*c)) for i, c in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "i int, payload binary")
    out = ab.decode_record(df, GG_ROW_SPEC).orderBy("i").select("i", "rec").collect()

    r0 = out[0]["rec"]
    assert r0["table"] == "gg.supplier" and r0["op_type"] == "I" and r0["pos"] == 7
    assert r0["primary_keys"] == ["s_suppkey"]
    assert r0["before"] is None
    assert r0["after"]["s_suppkey"] == 42 and r0["after"]["s_name"] == "alice"
    assert r0["after"]["s_name_isMissing"] is False

    r1 = out[1]["rec"]
    assert r1["op_type"] == "D" and r1["pos"] == -9
    assert r1["primary_keys"] == ["s_suppkey", "s_name"]
    assert r1["after"] is None
    assert r1["before"]["s_suppkey"] == 43 and r1["before"]["s_name_isMissing"] is True

    r2 = out[2]["rec"]
    assert r2["op_type"] == "U" and r2["pos"] == 2**40
    assert r2["primary_keys"] == []
    assert r2["before"]["s_name"] == "" and r2["after"]["s_name"] == "carol"

    plan = ab.decode_record(df, GG_ROW_SPEC)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decode_record_max_array_items_bound(spark):
    """``max_array_items=N`` decodes arity<=N arrays identically to the
    default bound — including every field AFTER the array, i.e. the
    offset chain stays exact — it just emits fewer unrolled slots
    (the r11 plan-width trim used by the fixed-arity GoldenGate feed)."""
    cases = [
        ("gg.supplier", "I", "2020-01-01 00:00:00", 7,
         ["s_suppkey"], None, _enc_inner(42, "alice")),
        ("gg.supplier", "U", "", 2**40, [], _enc_inner(44, ""), _enc_inner(44, "carol")),
    ]
    df = spark.createDataFrame(
        [(i, _enc_gg_row(*c)) for i, c in enumerate(cases)], "i int, payload binary"
    )
    full = ab.decode_record(df, GG_ROW_SPEC).select("i", "rec").orderBy("i").collect()
    tight = (
        ab.decode_record(df, GG_ROW_SPEC, max_array_items=1)
        .select("i", "rec").orderBy("i").collect()
    )
    assert full == tight
    # and the values themselves are right (not both paths equally wrong)
    assert tight[0]["rec"]["primary_keys"] == ["s_suppkey"]
    assert tight[0]["rec"]["after"]["s_name"] == "alice"
    assert tight[1]["rec"]["primary_keys"] == []
    assert tight[1]["rec"]["before"]["s_suppkey"] == 44
    assert tight[1]["rec"]["after"]["s_name"] == "carol"


DOUBLE_SPECIALS = [
    0.0, -0.0, 1.0, -1.5, 1e308, -1e308, 5e-324, -5e-324,
    2.2250738585072014e-308, 1.7976931348623157e308, 1e-310,
    float("inf"), float("-inf"), float("nan"), 123.456,
]


def _same_double(a, b):
    import math

    if math.isnan(b):
        return math.isnan(a)
    return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)


def test_ieee_double_float_decode_exact(spark):
    """double_from_bits/float_from_bits are bit-exact against
    struct.unpack for normals, denormals, ±0, ±inf, NaN, and random
    bit patterns — the integer-bit-math reconstruction documented in
    the module header."""
    import random
    import struct

    rng = random.Random(1234)
    doubles = list(DOUBLE_SPECIALS)
    doubles += [rng.uniform(-1e12, 1e12) for _ in range(40)]
    # random raw bit patterns cover exponent space incl. denormals
    doubles += [
        struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0] for _ in range(40)
    ]
    float_specials = [
        0.0, -0.0, 1.0, -1.5, 3.4028234663852886e38, -3.4028234663852886e38,
        1.401298464324817e-45, -1.401298464324817e-45, 1.1754943508222875e-38,
        float("inf"), float("-inf"), float("nan"), 123.456,
    ]
    floats = [struct.unpack("<f", struct.pack("<f", v))[0] for v in float_specials] + [
        struct.unpack("<f", struct.pack("<I", rng.getrandbits(32)))[0] for _ in range(40)
    ]
    n = max(len(doubles), len(floats))
    doubles += [0.0] * (n - len(doubles))
    floats += [0.0] * (n - len(floats))
    rows = [
        (i, ab.encode_double(d) + ab.encode_float(f), d, f)
        for i, (d, f) in enumerate(zip(doubles, floats))
    ]
    df = spark.createDataFrame(rows, "i int, payload binary, ed double, ef float")
    out = ab.decode_flat_payload(df, [("d", "double"), ("f", "float")]).orderBy("i").collect()
    for r in out:
        assert _same_double(r["d"], r["ed"]), (r["i"], r["d"], r["ed"])
        assert _same_double(r["f"], r["ef"]), (r["i"], r["f"], r["ef"])


def test_nested_decode_with_double_fields(spark):
    """The reference's AvroConverter maps Oracle NUMBER to Avro double
    (AvroConverter.java:51-245); a GG row with double columns decodes
    through decode_record including inside nullable branches."""
    spec = (
        "record",
        [
            ("table", "string"),
            ("price", "double"),
            ("ratio", "float"),
            ("after", ("nullable", ("record", [("v", "double")]))),
        ],
    )
    rows = [
        (0, ab.encode_string("t") + ab.encode_double(3.14159) + ab.encode_float(0.25)
         + ab.encode_nullable(ab.encode_double(-1e-300))),
        (1, ab.encode_string("t") + ab.encode_double(float("-inf")) + ab.encode_float(2.0)
         + ab.encode_nullable(None)),
    ]
    df = spark.createDataFrame(rows, "i int, payload binary")
    out = ab.decode_record(df, spec).orderBy("i").select("rec").collect()
    r0, r1 = out[0]["rec"], out[1]["rec"]
    assert _same_double(r0["price"], 3.14159) and _same_double(r0["ratio"], 0.25)
    assert _same_double(r0["after"]["v"], -1e-300)
    assert r1["price"] == float("-inf") and r1["after"] is None

    plan = ab.decode_record(df, spec)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sql_twins_match_column_primitives(spark):
    """r11: the decoders compose SQL text (zero Py4J round trips); the
    *_sql twins must stay expression-for-expression equal to the
    Column primitives. Decode the INTERESTING zigzag vectors and the
    IEEE bit patterns through BOTH paths and assert identical values
    (NaN compared by bit pattern via isnan)."""
    import struct

    rows = [(i, v, ab.encode_zigzag_varint(v)) for i, v in enumerate(INTERESTING)]
    df = spark.createDataFrame(rows, "i int, expect long, value binary")
    got = (
        df.withColumn("__h", F.hex("value"))
        .withColumn("col_dec", ab.varint_at(F.col("__h"), F.lit(0)))
        .withColumn("sql_dec", F.expr(ab.varint_at_sql("__h", "0")))
        .select("i", "expect", "col_dec", "sql_dec")
        .orderBy("i")
        .collect()
    )
    for r in got:
        assert r["col_dec"] == r["sql_dec"], r
        assert r["sql_dec"]["value"] == r["expect"], r

    doubles = [0.0, -0.0, 1.5, -1e308, 5e-324, float("inf"), float("-inf"), float("nan")]
    drows = [(i, d, ab.encode_double(d)) for i, (d) in enumerate(doubles)]
    ddf = spark.createDataFrame(drows, "i int, expect double, value binary")
    dgot = (
        ddf.withColumn("__h", F.hex("value"))
        .withColumn("col_d", ab.double_from_bits(ab._le_bits(F.col("__h"), F.lit(0).cast("long"), 8)))
        .withColumn("sql_d", F.expr(ab.double_from_bits_sql(ab._le_bits_sql("__h", "CAST(0 AS BIGINT)", 8))))
        .orderBy("i")
        .collect()
    )
    for r, d in zip(dgot, doubles):
        ec, es = struct.pack("<d", r["col_d"]), struct.pack("<d", r["sql_d"])
        assert ec == es == struct.pack("<d", d), (r["i"], r["col_d"], r["sql_d"], d)
