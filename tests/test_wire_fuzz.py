"""Randomized encode->decode roundtrip across the JSON wire
formats: adversarial string values (quotes, backslashes, unicode,
control chars, JSON-lookalikes) and numeric edge values must survive
the to_json/from_json trip byte-for-byte into the decoded row maps —
the JSON-escaping edge cases a hand-picked fixture misses."""

import random

from pyspark.sql import functions as F

from change_data_capture_spark.sources import canal, debezium
from change_data_capture_spark.sources import mongodb as mg
from change_data_capture_spark.sources import wal2json as wj
from change_data_capture_spark.sources import wire_formats as wf

T = "shop.orders"
KEYS = {T: ["id"]}

NASTY = [
    'plain',
    'with "double quotes"',
    "with 'single quotes'",
    "back\\slash and \\n literal",
    "real\nnewline\tand tab",
    "unicode: café 中文 \U0001f600",
    '{"looks":"like json"}',
    "trailing space ",
    "",
    "null",
    "comma,separated,stuff",
    "<xml&entities>",
]


def _base(spark, seed):
    rng = random.Random(seed)
    rows = [
        (i, rng.choice(NASTY), float(rng.choice([0.0, -1.5, 2**31, 1e-9, 123.456])))
        for i in range(1, 21)
    ]
    return spark.createDataFrame(rows, "id long, note string, amount double")


def test_fuzz_roundtrip_all_formats(spark):
    base = _base(spark, 1234)
    want = {
        str(r["id"]): (r["note"], r["amount"]) for r in base.collect()
    }
    full = F.struct(F.col("id"), F.col("note"), F.col("amount"))

    encoders = {
        "maxwell": (
            lambda: wf.encode_maxwell_json(base, table=T, typ="insert",
                                           data=full, ts=1, xid=F.col("id")),
            wf.maxwell_raw_ops,
        ),
        "dms": (
            lambda: wf.encode_dms_json(base, table=T, operation="insert",
                                       data=full),
            wf.dms_raw_ops,
        ),
        "canal": (
            lambda: canal.encode_canal_json(base, table=T, typ="INSERT",
                                            data=full, es=1,
                                            batch_id=F.col("id"),
                                            pk_names=["id"]),
            canal.canal_raw_ops,
        ),
        "debezium": (
            lambda: debezium.encode_debezium_json(base, table=T, op="c",
                                                  before=None, after=full,
                                                  ts_ms=1),
            debezium.debezium_raw_ops,
        ),
        "wal2json": (
            lambda: wj.encode_wal2json(
                base, table=T, action="I",
                columns={"id": ("bigint", F.col("id")),
                         "note": ("text", F.col("note")),
                         "amount": ("numeric", F.col("amount"))},
                lsn="0/1",
            ),
            wj.wal2json_raw_ops,
        ),
        "mongodb": (
            # double JSON encoding: the document rides the wire as a
            # JSON STRING inside the envelope — escaping stress x2
            lambda: mg.encode_mongodb_json(base, table=T, op="c",
                                           after=full, doc_id=F.col("id"),
                                           ts_ms=1),
            lambda msgs, _keys: mg.mongodb_raw_ops(msgs, {T: "id"}),
        ),
    }
    for name, (enc, dec) in encoders.items():
        out = dec(enc(), KEYS).collect()
        assert len(out) == 20, name
        for r in out:
            after = r["after"]
            wid = after["id"]
            note, amount = want[wid]
            assert after["note"] == note, (name, wid, after["note"], note)
            # numeric wire forms: compare as parsed floats (the wire
            # carries the engine's shortest-roundtrip rendering)
            assert float(after["amount"]) == amount, (name, wid)
