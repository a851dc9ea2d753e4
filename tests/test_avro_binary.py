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
