"""Avro binary wire-format decode in pure Catalyst expressions.

The reference's GoldenGate path carries DML as a *generic-wrapper*
Avro binary record — ``{table_name: string, schema_fingerprint: long,
payload: bytes}`` (``source/oracle/Normalizer.java:124-140``) — whose
payload is the table-schema Avro record, decoded row-at-a-time with
``GenericDatumReader`` (``Normalizer.java:92-104``,
``BinaryMessages.java:33-40``). The container has no spark-avro jar,
so instead of a JSON stand-in this module decodes the actual Avro
BINARY ENCODING (the public Avro spec: zigzag-varint ints/longs,
varint-length-framed UTF-8 strings and bytes) with nothing but
JVM-side Catalyst expressions — ``hex``/``conv`` byte reads, bit ops,
dynamic-offset ``substring`` — so the whole decode stays in
whole-stage codegen, vectorized across rows, no Python and no
row-at-a-time datum reader.

Covered: the full generic-wrapper frame; flat payload records
(``decode_flat_payload``); and the reference's actual NESTED payload
shape via ``decode_record`` — nested records, union-with-null
(``["null", X]``), single-block ``array<string>``, booleans, and
IEEE double/float fields (``common/AvroConverter.java:51-245``).
Spark exposes no bits->double expression, so doubles are
reconstructed from integer bit math: ``sign * (frac + 2^52) *
2^(exp-1075)`` — every factor and the result are exactly
representable, and IEEE multiplication is correctly rounded, so the
decode is EXACT for all bit patterns (normals, denormals, ±0, ±inf,
NaN; property-tested against ``struct.unpack``). Not covered:
multi-block arrays/maps — the JSON wire in ``kafka.py`` remains the
stand-in there, with ``from_avro`` as the drop-in swap where the
spark-avro jar is deployed.

Layout note: every Avro long (including all length prefixes) is a
zigzag varint of at most 10 bytes; offsets are data-dependent, so
each decoded field carries its width and the running offset is a
column, not a constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LEN_MAX = 5  # Avro block/length varints fit in 5 bytes (int range)
_LONG_MAX = 10  # full zigzag long


def _byte_at(hex_col: Column, off: Column) -> Column:
    """Byte value (0-255) at 0-based byte offset ``off`` of the binary
    whose hex string is ``hex_col``. One byte is two hex chars; conv is
    a native codegen expression."""
    return F.conv(F.substring(hex_col, off * 2 + 1, F.lit(2)), 16, 10).cast("long")


def varint_at(hex_col: Column, off: Column, max_bytes: int = _LONG_MAX) -> Column:
    """Decode the zigzag varint starting at byte offset ``off``;
    returns ``struct(value long, width long)``.

    Unrolled over ``max_bytes``: byte i participates iff every earlier
    byte had its continuation bit set. Disjoint 7-bit groups combine
    with bitwise OR (carry-free — a shifted group at bit 63 may be a
    negative long, which addition would mishandle under ANSI mode)."""
    off = off.cast("long")
    raw = F.lit(0).cast("long")
    width = F.lit(0).cast("long")
    prefix = F.lit(True)
    for i in range(max_bytes):
        b = _byte_at(hex_col, off + i)
        group = F.shiftleft(b.bitwiseAND(F.lit(0x7F)), 7 * i)
        raw = raw.bitwiseOR(F.when(prefix, group).otherwise(F.lit(0).cast("long")))
        width = width + F.when(prefix, F.lit(1)).otherwise(F.lit(0)).cast("long")
        prefix = prefix & (b >= 128)
    value = F.shiftrightunsigned(raw, 1).bitwiseXOR(-raw.bitwiseAND(F.lit(1)))
    return F.struct(value.alias("value"), width.alias("width"))


def _le_bits(hex_col: Column, off: Column, nbytes: int) -> Column:
    """Little-endian unsigned read of ``nbytes`` bytes as a long.
    Avro stores float/double as little-endian IEEE bytes (public Avro
    spec); byte i contributes bits [8i, 8i+8). Disjoint groups combine
    with OR — byte 7 shifted to bit 56 can set the sign bit, which OR
    handles and ANSI addition would not."""
    bits = F.lit(0).cast("long")
    for i in range(nbytes):
        bits = bits.bitwiseOR(F.shiftleft(_byte_at(hex_col, off + i), 8 * i))
    return bits


def double_from_bits(bits: Column) -> Column:
    """IEEE-754 binary64 from its bit pattern, in pure Catalyst.

    value = sign * (frac + 2^52) * 2^(exp-1075) for normals,
    sign * frac * 2^-1074 for denormals. Each factor is exactly
    representable and the true product IS the encoded double, so the
    correctly-rounded IEEE multiply returns it exactly — verified
    against ``struct.unpack`` over normals/denormals/±0/±inf/NaN
    (tests/test_avro_binary.py)."""
    sign = F.when(bits < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    exp = F.shiftrightunsigned(bits, 52).bitwiseAND(F.lit(0x7FF))
    frac = bits.bitwiseAND(F.lit((1 << 52) - 1))
    mant = (frac + F.lit(1 << 52)).cast("double")
    val_norm = sign * mant * F.pow(F.lit(2.0), (exp - 1075).cast("double"))
    val_denorm = sign * frac.cast("double") * F.pow(F.lit(2.0), F.lit(-1074.0))
    val_special = F.when(frac == 0, sign * F.lit(float("inf"))).otherwise(F.lit(float("nan")))
    return (
        F.when(exp == 2047, val_special)
        .when(exp == 0, val_denorm)
        .otherwise(val_norm)
    )


def float_from_bits(bits: Column) -> Column:
    """IEEE-754 binary32 from its (unsigned, < 2^32) bit pattern.
    Same exactness argument as :func:`double_from_bits`; computed in
    double and cast to float at the end (every binary32 value is
    exactly representable in binary64, and the final cast is exact)."""
    sign = F.when(F.shiftrightunsigned(bits, 31) == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    exp = F.shiftrightunsigned(bits, 23).bitwiseAND(F.lit(0xFF))
    frac = bits.bitwiseAND(F.lit((1 << 23) - 1))
    mant = (frac + F.lit(1 << 23)).cast("double")
    val_norm = sign * mant * F.pow(F.lit(2.0), (exp - 150).cast("double"))
    val_denorm = sign * frac.cast("double") * F.pow(F.lit(2.0), F.lit(-149.0))
    val_special = F.when(frac == 0, sign * F.lit(float("inf"))).otherwise(F.lit(float("nan")))
    return (
        F.when(exp == 255, val_special)
        .when(exp == 0, val_denorm)
        .otherwise(val_norm)
        .cast("float")
    )


# ---------------------------------------------------------------------------
# SQL-TEXT twins of the Column primitives (r11 optimization round).
#
# Composing the decode as SQL text costs ZERO Py4J round trips: the
# Column builders above make one JVM call per operator node (~145
# calls for one 10-byte varint), which profiled as the single largest
# share of decode_record's driver wall on the GoldenGate shape —
# ~3 s of pure expression construction, re-paid on every build. The
# text twins mirror the Column builders op for op; Catalyst parses
# them into the same expression trees, so analysis, codegen and
# results are identical (golden-byte, IEEE-exactness and oracle-hash
# tests all run through this path). A textual reference is a copy
# where a Column reference shares the JVM object, but every
# multiply-referenced intermediate is materialized as a lateral alias
# by the decoders, so per-alias text stays bounded (~tens of KB for a
# full zigzag long) and parses in milliseconds. Double/float literals
# carry the D suffix — a bare ``1.0`` parses as DECIMAL in SQL text,
# unlike ``F.lit(1.0)``.
# ---------------------------------------------------------------------------


def _byte_at_sql(h: str, off: str) -> str:
    """SQL twin of :func:`_byte_at`; ``h``/``off`` are SQL fragments."""
    return f"CAST(conv(substring({h}, ({off}) * 2 + 1, 2), 16, 10) AS BIGINT)"


def varint_at_sql(h: str, off: str, max_bytes: int = _LONG_MAX) -> str:
    """SQL twin of :func:`varint_at`; returns
    ``named_struct('value', ..., 'width', ...)`` text."""
    off = f"CAST({off} AS BIGINT)"
    raw = "CAST(0 AS BIGINT)"
    width = "CAST(0 AS BIGINT)"
    prefix = "true"
    for i in range(max_bytes):
        b = _byte_at_sql(h, f"{off} + {i}")
        group = f"shiftleft(({b}) & 127, {7 * i})"
        raw = f"({raw} | (CASE WHEN {prefix} THEN {group} ELSE CAST(0 AS BIGINT) END))"
        width = f"({width} + CAST(CASE WHEN {prefix} THEN 1 ELSE 0 END AS BIGINT))"
        prefix = f"({prefix} AND (({b}) >= 128))"
    value = f"(shiftrightunsigned({raw}, 1) ^ -({raw} & 1))"
    return f"named_struct('value', {value}, 'width', {width})"


def _le_bits_sql(h: str, off: str, nbytes: int) -> str:
    """SQL twin of :func:`_le_bits`."""
    bits = "CAST(0 AS BIGINT)"
    for i in range(nbytes):
        bits = f"({bits} | shiftleft({_byte_at_sql(h, f'({off}) + {i}')}, {8 * i}))"
    return bits


def double_from_bits_sql(bits: str) -> str:
    """SQL twin of :func:`double_from_bits` (same exactness argument)."""
    sign = f"(CASE WHEN {bits} < 0 THEN -1.0D ELSE 1.0D END)"
    exp = f"(shiftrightunsigned({bits}, 52) & 2047)"
    frac = f"({bits} & {(1 << 52) - 1})"
    mant = f"CAST(({frac} + {1 << 52}) AS DOUBLE)"
    val_norm = f"(({sign} * {mant}) * power(2.0D, CAST(({exp} - 1075) AS DOUBLE)))"
    val_denorm = f"(({sign} * CAST({frac} AS DOUBLE)) * power(2.0D, -1074.0D))"
    val_special = (
        f"(CASE WHEN {frac} = 0 THEN {sign} * CAST('Infinity' AS DOUBLE)"
        f" ELSE CAST('NaN' AS DOUBLE) END)"
    )
    return (
        f"(CASE WHEN {exp} = 2047 THEN {val_special}"
        f" WHEN {exp} = 0 THEN {val_denorm} ELSE {val_norm} END)"
    )


def float_from_bits_sql(bits: str) -> str:
    """SQL twin of :func:`float_from_bits`."""
    sign = f"(CASE WHEN shiftrightunsigned({bits}, 31) = 1 THEN -1.0D ELSE 1.0D END)"
    exp = f"(shiftrightunsigned({bits}, 23) & 255)"
    frac = f"({bits} & {(1 << 23) - 1})"
    mant = f"CAST(({frac} + {1 << 23}) AS DOUBLE)"
    val_norm = f"(({sign} * {mant}) * power(2.0D, CAST(({exp} - 150) AS DOUBLE)))"
    val_denorm = f"(({sign} * CAST({frac} AS DOUBLE)) * power(2.0D, -149.0D))"
    val_special = (
        f"(CASE WHEN {frac} = 0 THEN {sign} * CAST('Infinity' AS DOUBLE)"
        f" ELSE CAST('NaN' AS DOUBLE) END)"
    )
    return (
        f"CAST((CASE WHEN {exp} = 255 THEN {val_special}"
        f" WHEN {exp} = 0 THEN {val_denorm} ELSE {val_norm} END) AS FLOAT)"
    )


def decode_generic_wrapper(df: DataFrame, bin_col: str = "value") -> DataFrame:
    """Decode the generic-wrapper frame (``Normalizer.java:124-140``):
    appends ``table_name`` (string), ``schema_fingerprint`` (long) and
    ``payload`` (binary) columns. Pure projection — no shuffle, no
    Python; scales as a map stage over the Kafka scan. Built as ONE
    lateral-alias ``selectExpr`` from the SQL-text twins (r11): one
    analyzer pass instead of seven ``withColumn`` re-analyses, zero
    Py4J expression-construction round trips."""
    b = f"`{bin_col}`"
    h = "__gw_hex"
    return df.selectExpr(
        "*",
        f"hex({b}) AS {h}",
        # table_name: varint byte length, then UTF-8 bytes
        f"{varint_at_sql(h, '0', _LEN_MAX)} AS __v0",
        f"CAST(substring({b}, CAST((__v0.width + 1) AS INT),"
        f" CAST(__v0.value AS INT)) AS STRING) AS table_name",
        # schema_fingerprint: full zigzag long
        f"{varint_at_sql(h, '__v0.width + __v0.value', _LONG_MAX)} AS __v1",
        "__v1.value AS schema_fingerprint",
        # payload: varint byte length, then raw bytes
        f"{varint_at_sql(h, '__v0.width + __v0.value + __v1.width', _LEN_MAX)} AS __v2",
        f"substring({b}, CAST((__v0.width + __v0.value + __v1.width + __v2.width + 1)"
        f" AS INT), CAST(__v2.value AS INT)) AS payload",
    ).drop(h, "__v0", "__v1", "__v2")


def decode_flat_payload(
    df: DataFrame, fields: list[tuple[str, str]], payload_col: str = "payload"
) -> DataFrame:
    """Decode a flat Avro record of simple-typed fields from
    ``payload_col``: ``fields`` is the record's (name, type) list in
    schema order, type in {'long', 'int', 'string', 'double',
    'float'}. Appends one typed column per field (ints/longs zigzag
    varints, strings varint-length-framed UTF-8, doubles/floats
    fixed-width little-endian IEEE) — the simple-type subset of the
    reference's datum-reader path (``AvroConverter.java:51-85``),
    vectorized as one Catalyst projection. Built from the SQL-text
    twins in lateral-alias ``selectExpr`` batches (r11): zero Py4J
    expression construction, one analyzer pass per ~``_FLUSH_AT``
    aliases instead of one per ``withColumn``."""
    b = f"`{payload_col}`"
    h = "__fp_hex"
    pending: list[str] = [f"hex({b}) AS {h}"]
    tmps = [h]
    state = {"df": df}

    def flush() -> None:
        if pending:
            state["df"] = state["df"].selectExpr("*", *pending)
            pending.clear()

    def emit(expr: str, name: str, tmp: bool = True) -> None:
        pending.append(f"{expr} AS `{name}`")
        if tmp:
            tmps.append(name)
        if len(pending) >= _FLUSH_AT:
            flush()

    off = "CAST(0 AS BIGINT)"
    for i, (name, ftype) in enumerate(fields):
        v = f"__f{i}"
        if ftype in ("long", "int"):
            emit(varint_at_sql(h, off, _LONG_MAX), v)
            col = f"{v}.value"
            emit(f"CAST({col} AS INT)" if ftype == "int" else col, name, tmp=False)
            off = f"({off} + {v}.width)"
        elif ftype == "string":
            emit(varint_at_sql(h, off, _LEN_MAX), v)
            start = f"({off} + {v}.width)"
            emit(
                f"CAST(substring({b}, CAST(({start} + 1) AS INT),"
                f" CAST({v}.value AS INT)) AS STRING)",
                name,
                tmp=False,
            )
            off = f"({start} + {v}.value)"
        elif ftype == "double":
            emit(double_from_bits_sql(_le_bits_sql(h, off, 8)), name, tmp=False)
            off = f"({off} + 8)"
        elif ftype == "float":
            emit(float_from_bits_sql(_le_bits_sql(h, off, 4)), name, tmp=False)
            off = f"({off} + 4)"
        else:  # pragma: no cover - guarded by callers
            raise ValueError(f"unsupported flat-payload type {ftype!r} for field {name!r}")
        # materialize the running offset per field to keep the
        # expression text linear instead of exponential
        emit(off, f"__off{i}")
        off = f"__off{i}"
    flush()
    return state["df"].drop(*tmps)


def encode_zigzag_varint(n: int) -> bytes:
    """Python-side Avro zigzag-varint encoder — test-vector/golden-byte
    construction only (the decode path above is the product surface).
    Follows the public Avro spec layout."""
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return encode_zigzag_varint(len(b)) + b


def encode_bytes(b: bytes) -> bytes:
    return encode_zigzag_varint(len(b)) + b


def encode_generic_wrapper(table_name: str, fingerprint: int, payload: bytes) -> bytes:
    """Golden-byte encoder for the wrapper frame (test construction)."""
    return encode_string(table_name) + encode_zigzag_varint(fingerprint) + encode_bytes(payload)


# ---------------------------------------------------------------------------
# Nested decode: the reference's actual GoldenGate payload shape.
#
# A schema SPEC is: "long" | "int" | "boolean" | "string" | "bytes"
# | "double" | "float"               -- fixed-width LE IEEE
# | ("nullable", spec)          -- Avro union ["null", X], null first
# | ("array", "string")         -- single-block string arrays
# | ("record", [(name, spec), ...])
#
# The wrapped DML payload the reference decodes row-at-a-time
# (Normalizer.java:92-104) is exactly this shape: a record of
# strings/longs plus primary_keys: array<string> and
# before/after: union(null, record{col..., col_isMissing boolean...})
# (AvroConverter.java:51-245). Doubles/floats are fixed-width
# little-endian IEEE bytes, rebuilt exactly via integer bit math
# (double_from_bits / float_from_bits above).
#
# Offset threading: at the TOP level each field's end offset is
# materialized with withColumn, keeping expression size linear in the
# column count. Inside a union branch or array the offsets stay pure
# (conditional) expressions — decoding speculative bytes is safe
# (varint/substr tolerate junk; the when() discards it), which is what
# lets the whole nested walk stay inside whole-stage codegen.
# ---------------------------------------------------------------------------

_ARRAY_UNROLL = 8  # max items decoded per (single-block) array
# Lateral-alias flush batch size for decode_record: one withColumn per
# intermediate re-runs the analyzer on the whole growing plan (O(n^2)),
# a single select with every alias chained trips an internal analyzer
# error at depth. Re-A/B'd at the r11 slimmed plan width: 10 still
# optimal (see decode_record docstring). Module-level so experiments
# can monkeypatch it.
_FLUSH_AT = 10


def decode_record(
    df: DataFrame, spec, payload_col: str = "payload", out_col: str = "rec",
    max_array_items: int | None = None,
) -> DataFrame:
    """Decode an Avro binary record of ``spec`` shape from
    ``payload_col`` into a struct column ``out_col`` — the
    set-oriented, codegen'd equivalent of the reference's
    ``GenericDatumReader`` loop.

    Every MULTIPLY-REFERENCED intermediate (varint struct, running
    offset) is materialized as its own projection column, including
    inside union branches and array items: a varint decode references
    its offset ~10 times, so a tree-shaped build is exponential in
    nesting depth (a first version heap-OOM'd the analyzer on the
    GoldenGate shape). Single-use DAG leaves (decoded field values,
    union inner values, array items) stay inline — they reference only
    already-materialized offsets, cannot duplicate anything, and each
    alias column they'd otherwise occupy is carried through every
    subsequent projection, which is exactly the O(width x batches)
    plan-analysis cost this operator pays per action (r11 measurement:
    halving the alias count cut build+exec wall ~2x on 120 rows).
    Speculative decode of a not-taken union branch reads junk bytes,
    which every primitive tolerates (conv/substring return null/empty,
    never error) — the ``when()`` on the branch index discards it.
    Catalyst's CollapseProject keeps multiply-referenced non-cheap
    aliases in place, so the linear shape survives optimization.

    ``max_array_items`` bounds the per-array decode unroll (default
    ``_ARRAY_UNROLL``). An array<string> costs ~4 alias columns per
    unrolled slot, so a caller that KNOWS its arrays' arity (e.g. a
    CDC feed whose primary_keys list is the table's fixed key arity)
    should pass it; items beyond the bound are not decoded (same
    contract as the default bound, just tighter)."""
    assert spec[0] == "record"
    n_items = _ARRAY_UNROLL if max_array_items is None else max_array_items
    assert n_items >= 1
    hexc = "__rec_hex"
    binc = f"`{payload_col}`"
    # Intermediates are emitted as LATERAL column aliases (each alias
    # may reference earlier aliases in the same projection, Spark
    # 3.4+), flushed in bounded batches: one withColumn per
    # intermediate re-runs the analyzer on the whole growing plan
    # (O(n^2) — ~20s of pure analysis for the ~60-step GoldenGate
    # chain), while a SINGLE select with 60 chained lateral aliases
    # trips an internal analyzer error at depth. Batches of 10 keep
    # per-select lateral depth shallow and cut analysis passes ~6x.
    # Expressions are SQL TEXT from the *_sql twins (r11): composing
    # them Column-by-Column cost one Py4J call per operator node —
    # ~3 s of driver wall for this shape, the largest single share.
    pending: list[str] = [f"hex({binc}) AS __rec_hex"]
    tmps = ["__rec_hex"]
    state = {"n": 0, "df": df}

    def flush() -> None:
        if pending:
            state["df"] = state["df"].selectExpr("*", *pending)
            pending.clear()

    def emit(expr: str) -> str:
        name = f"__av{state['n']}"
        state["n"] += 1
        pending.append(f"{expr} AS {name}")
        tmps.append(name)
        if len(pending) >= _FLUSH_AT:
            flush()
        return name

    def walk(off: str, sp):
        if sp in ("long", "int"):
            v = emit(varint_at_sql(hexc, off, _LONG_MAX))
            val = f"CAST({v}.value AS INT)" if sp == "int" else f"{v}.value"
            return val, emit(f"({off} + {v}.width)")
        if sp == "boolean":
            return f"({_byte_at_sql(hexc, off)} = 1)", emit(f"({off} + 1)")
        if sp == "double":
            return double_from_bits_sql(_le_bits_sql(hexc, off, 8)), emit(f"({off} + 8)")
        if sp == "float":
            return float_from_bits_sql(_le_bits_sql(hexc, off, 4)), emit(f"({off} + 4)")
        if sp in ("string", "bytes"):
            v = emit(varint_at_sql(hexc, off, _LEN_MAX))
            start = emit(f"({off} + {v}.width)")
            raw = f"substring({binc}, CAST(({start} + 1) AS INT), CAST({v}.value AS INT))"
            val = f"CAST({raw} AS STRING)" if sp == "string" else raw
            return val, emit(f"({start} + {v}.value)")
        kind = sp[0]
        if kind == "nullable":
            # union index of a 2-branch union is canonically ONE byte
            # (zigzag 0 -> 0x00, 1 -> 0x02); a 1-byte decode is exact
            # and 5x smaller than the _LEN_MAX expression tree (r11)
            b = emit(varint_at_sql(hexc, off, 1))  # union index: 0=null
            inner_off = emit(f"({off} + {b}.width)")
            ival, iend = walk(inner_off, sp[1])
            val = f"(CASE WHEN {b}.value = 1 THEN {ival} END)"  # single-use: stays inline
            end = emit(f"(CASE WHEN {b}.value = 1 THEN {iend} ELSE {inner_off} END)")
            return val, end
        if kind == "array":
            assert sp[1] == "string", "only array<string> is needed/supported"
            c = emit(varint_at_sql(hexc, off, _LEN_MAX))
            n = f"{c}.value"
            first = emit(f"({off} + {c}.width)")
            cur, items, ends = first, [], []
            for _ in range(n_items):
                iv, cur = walk(cur, "string")
                items.append(iv)  # single-use: stays inline
                ends.append(cur)
            end_items: str = first  # offset after 0 items
            for i in range(n_items):
                end_items = f"(CASE WHEN {n} = {i + 1} THEN {ends[i]} ELSE {end_items} END)"
            # terminator varint (0) follows any non-empty block
            term = f"CAST(CASE WHEN {n} > 0 THEN 1 ELSE 0 END AS BIGINT)"
            val = (
                f"slice(array({', '.join(items)}), 1,"
                f" CAST(greatest({n}, 0) AS INT))"
            )
            return val, emit(f"({end_items} + {term})")
        if kind == "record":
            parts, cur = [], off
            for name, fspec in sp[1]:
                fv, cur = walk(cur, fspec)
                parts.append(f"'{name}', {fv}")  # single-use: stays inline
            return f"named_struct({', '.join(parts)})", cur
        raise ValueError(f"unsupported avro spec: {sp!r}")

    val, _ = walk(emit("CAST(0 AS BIGINT)"), spec)
    flush()
    out = state["df"].withColumn(out_col, F.expr(val))
    return out.drop(*tmps)


# --- Python-side encoders for the nested shapes (golden-byte tests) ---


def encode_boolean(b: bool) -> bytes:
    return bytes([1 if b else 0])


def encode_double(v: float) -> bytes:
    import struct as _struct

    return _struct.pack("<d", v)


def encode_float(v: float) -> bytes:
    import struct as _struct

    return _struct.pack("<f", v)


def encode_nullable(value_bytes: bytes | None) -> bytes:
    """Union ["null", X]: branch index 0 (null) or 1 + payload."""
    if value_bytes is None:
        return encode_zigzag_varint(0)
    return encode_zigzag_varint(1) + value_bytes


def encode_string_array(items: list[str]) -> bytes:
    if not items:
        return encode_zigzag_varint(0)
    out = encode_zigzag_varint(len(items))
    for s in items:
        out += encode_string(s)
    return out + encode_zigzag_varint(0)  # block terminator
