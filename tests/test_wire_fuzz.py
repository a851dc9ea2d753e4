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


def test_fuzz_decode_dlq_partition_under_version_expr(spark):
    """r8 invariant: with a CUSTOM version_expr passed to BOTH halves,
    raw_ops + dead_letters partition the message feed exactly — no
    message both applied and quarantined, none lost — across a fuzzed
    mix of valid, versionless, and malformed frames (the ADVICE r7
    finding was precisely this invariant breaking under overrides)."""
    import json
    import random

    rng = random.Random(99)
    msgs = []
    n_valid = n_noversion = 0
    for i in range(1, 41):
        note = rng.choice(NASTY)
        shape = rng.choice(["valid", "no_version", "garbage"])
        if shape == "valid":
            n_valid += 1
            msgs.append(json.dumps({
                "database": "shop", "table": "orders", "type": "insert",
                "xid": i, "data": {"id": str(i), "note": note},
            }))
        elif shape == "no_version":
            n_noversion += 1
            msgs.append(json.dumps({
                "database": "shop", "table": "orders", "type": "insert",
                "ts": i, "data": {"id": str(i), "note": note},  # ts, no xid
            }))
        else:
            msgs.append(rng.choice([
                "not json at all", '{"half": ', '{"database": null}',
            ]))
    frame = spark.createDataFrame([(m,) for m in msgs], "message string")
    vexpr = F.col("__m.xid")
    ops = wf.maxwell_raw_ops(frame, KEYS, version_expr=vexpr)
    dlq = wf.maxwell_dead_letters(frame, KEYS, version_expr=vexpr)
    assert ops.count() == n_valid
    assert dlq.count() == len(msgs) - n_valid
    assert (
        dlq.filter(F.col("reason") == "missing_version").count() == n_noversion
    )
    # versions are exactly the custom expression's values
    got = sorted(r.change_tracking_version for r in ops.collect())
    want = sorted(
        json.loads(m)["xid"] for m in msgs
        if '"xid"' in m
    )
    assert got == want
