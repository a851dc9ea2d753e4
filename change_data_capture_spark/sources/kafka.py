"""GoldenGate-style Kafka change-feed source surface.

Rebuilds the reference's GoldenGate source (``source/oracle/
GoldenGateKafka.java``) on Structured Streaming. The reference uses
the legacy DStream direct consumer with hand-rolled offset resolution
(-2 earliest / -1 latest / absolute, ``GoldenGateKafka.java:142-169``)
and a per-partition rate cap (``:109-113``); Structured Streaming's
kafka source provides both natively (``startingOffsets``,
``maxOffsetsPerTrigger``) — the helpers here just translate the
reference's config surface into those options.

Message decoding (T6/T7): the reference's topic interleaves three
message kinds — generic-wrapper notices, Avro schema announcements
keyed by 64-bit fingerprint, and wrapped DML payloads
(``GoldenGateKafka.java:196-237``). The wire encoding here is a JSON
wrapper with the same information content (the container has no
spark-avro jar; ``from_avro`` decode is a drop-in swap where the jar
is present — see ``decode_value_expr``). The generic-wrapper BINARY
frame and flat simple-type payloads need no jar at all: they are
decoded from genuine Avro binary with pure Catalyst expressions in
``sources/avro_binary.py``:

  schema msg: {"kind": "schema", "fingerprint": <long>,
               "table": "ns.t", "schema": <spark-schema-json>}
  dml msg:    {"kind": "dml", "table": "ns.t", "fingerprint": <long>,
               "op_type": "I|U|D", "primary_keys": [...],
               "before": {col: val|null}, "after": {col: val|null},
               "version": <long>, "ts_micros": <long>}
  notice:     {"kind": "notice", ...}            (dropped, T10)

The fingerprint registry (ST2, ``GoldenGateKafka.java:211-227``) is a
join, not driver state: schema messages become a registry DataFrame,
DML messages resolve their ``rows_schema`` by joining on fingerprint —
broadcastable (registries are tiny) and restart-safe because the
registry is rebuilt from the retained schema topic/compacted log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..normalize import normalize_raw_ops

EARLIEST = -2  # reference wire value for "earliest" (GoldenGateKafka.java:148-152)
LATEST = -1


def resolve_starting_offsets(topic: str, offset: int, partition: int = 0) -> str:
    """ST4 (``GoldenGateKafka.java:142-169``): translate the reference's
    initial-offset spec (-2 earliest / -1 latest / absolute) into the
    Structured Streaming ``startingOffsets`` option value."""
    if offset == EARLIEST:
        return "earliest"
    if offset == LATEST:
        return "latest"
    if offset < 0:
        raise ValueError(f"invalid offset {offset}: must be -2, -1 or >= 0")
    return f'{{"{topic}": {{"{partition}": {offset}}}}}'


def kafka_options(
    broker: str,
    topic: str,
    *,
    initial_offset: int = LATEST,
    max_rate_per_partition: int = 1000,
) -> dict[str, str]:
    """Option map for ``spark.readStream.format("kafka")``. The
    reference requires a single-partition topic for total order
    (``GoldenGateKafka.java:177-194``); we keep its default rate cap
    (``GoldenGateKafkaConfig.java:58-62``) via maxOffsetsPerTrigger,
    but order is restored downstream by explicit version sort +
    last-writer-wins, so multi-partition topics scale out."""
    opts = {
        "kafka.bootstrap.servers": broker,
        "subscribe": topic,
        "startingOffsets": resolve_starting_offsets(topic, initial_offset),
    }
    if max_rate_per_partition > 0:
        opts["maxOffsetsPerTrigger"] = str(max_rate_per_partition)
    return opts


def read_kafka_changelog(spark, broker: str, topic: str, **kw) -> DataFrame:
    """S5: the streaming source itself (needs a reachable broker)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(broker, topic, **kw).items():
        reader = reader.option(k, v)
    return reader.load().select(F.col("value").cast("string").alias("message"))


# ---------------------------------------------------------------------------
# T6: message classification + ST2 fingerprint registry + T7 normalize.
# All pure DataFrame ops over a `message: string` column — works the
# same on a Kafka stream or a replayed file/memory feed.
# ---------------------------------------------------------------------------

_WRAPPER_SCHEMA = (
    "kind string, fingerprint bigint, table string, schema string, "
    "op_type string, primary_keys array<string>, "
    "before map<string,string>, after map<string,string>, "
    "version bigint, ts_micros bigint"
)


def decode_value_expr(col: F.Column) -> F.Column:
    """Wrapper decode for the JSON wire encoding. Where spark-avro is
    deployed this is the one expression to swap for
    ``from_avro(col, wrapper_schema)`` (T12 — the reference's recursive
    AvroConverter, ``common/AvroConverter.java:51-245``, is subsumed by
    the built-in)."""
    return F.from_json(col, _WRAPPER_SCHEMA)


def classify_messages(raw: DataFrame) -> DataFrame:
    """T6 (``GoldenGateKafka.java:196-237``): parse and tag each
    message; generic-wrapper notices and unparseable junk are dropped
    (T10, ``Normalizer.java:65-69``)."""
    parsed = raw.select(decode_value_expr(F.col("message")).alias("m"))
    return parsed.select("m.*").filter(F.col("kind").isin("schema", "dml"))


def goldengate_dead_letters(
    raw: DataFrame, *, message_col: str = "message"
) -> DataFrame:
    """The messages the GoldenGate wrapper decode drops, with a reason
    (r8 — quarantine parity with the other decoders; previously T10's
    junk-drop was silent by design, which is right for the APPLY path
    but leaves an operator blind to a feed gone bad): 'unparseable'
    (no wrapper kind at all), 'wrapper_notice' (non-schema/dml wrapper
    kinds — expected protocol chatter, routed so it can be counted,
    the wal2json txn_marker convention), 'missing_version' (a dml
    whose version is null — dropped by ``goldengate_changelog``'s
    decoder-uniform rule). Same parse expression as the decode;
    message-grain output (message, reason, kind, table)."""
    m = raw.select(
        F.col(message_col).alias("message"),
        decode_value_expr(F.col(message_col)).alias("__m"),
    )
    kind = F.col("__m.kind")
    reason = (
        F.when(kind.isNull(), F.lit("unparseable"))
        .when(~kind.isin("schema", "dml"), F.lit("wrapper_notice"))
        .when(
            (kind == "dml") & F.col("__m.version").isNull(),
            F.lit("missing_version"),
        )
    )
    return m.select(
        "message",
        reason.alias("reason"),
        kind.alias("kind"),
        F.col("__m.table").alias("table"),
    ).filter(F.col("reason").isNotNull())


def schema_registry(classified: DataFrame) -> DataFrame:
    """ST2 (``GoldenGateKafka.java:211-227``): fingerprint -> schema
    registry. Last announcement per fingerprint wins (fingerprints are
    content-addressed, so duplicates are identical anyway)."""
    return (
        classified.filter(F.col("kind") == "schema")
        .groupBy("fingerprint")
        .agg(
            F.max_by("schema", "version").alias("schema"),
            F.max_by("table", "version").alias("table"),
        )
    )


def goldengate_changelog(raw: DataFrame) -> DataFrame:
    """Full S5 decode path: classify -> resolve schema by fingerprint
    (broadcast join against the registry — it is O(#schemas)) ->
    normalize before/after images into canonical change records,
    including the PK-update DELETE+INSERT split (T7,
    ``Normalizer.java:166-190``)."""
    classified = classify_messages(raw)
    registry = schema_registry(classified)
    dml = classified.filter(F.col("kind") == "dml")
    resolved = dml.alias("d").join(
        F.broadcast(registry.select("fingerprint", F.col("schema").alias("rs"))),
        "fingerprint",
        "left",
    )
    rawops = resolved.select(
        F.col("table"),
        F.col("op_type"),
        F.col("primary_keys"),
        F.col("before"),
        F.col("after"),
        F.coalesce(F.col("rs"), F.lit("{}")).alias("rows_schema"),
        F.col("version").alias("change_tracking_version"),
        F.col("ts_micros").alias("cdc_current_timestamp"),
    ).filter(
        # decoder-uniform rule (r7): a versionless DML would apply on
        # the create path but vanish behind any later watermark —
        # dropped like the other decoders' missing_version records
        # (this leg's junk-drop contract is T10, Normalizer.java:65-69)
        F.col("change_tracking_version").isNotNull()
    )
    return normalize_raw_ops(rawops)


def _string_image(cols: list[str]) -> F.Column:
    """Row columns -> the wire's ``map<string,string>`` image (values
    stringified; the inbound decoder casts back through the announced
    rows_schema, so typed values roundtrip)."""
    pairs: list[F.Column] = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    return F.create_map(*pairs)


def goldengate_schema_message(
    spark, *, table: str, fingerprint: int, schema_json: str, version: int = 0
) -> DataFrame:
    """The outbound schema announcement (ST2's producer half,
    ``GoldenGateKafka.java:211-227`` consumer side): one wrapper-wire
    message binding ``fingerprint`` to the Spark schema JSON that DML
    messages reference. Emit it once per (re)start or schema change —
    the registry rebuild is last-version-wins, so repeats are safe."""
    return spark.range(1).select(
        F.to_json(
            F.struct(
                F.lit("schema").alias("kind"),
                F.lit(fingerprint).cast("bigint").alias("fingerprint"),
                F.lit(table).alias("table"),
                F.lit(schema_json).alias("schema"),
                F.lit(version).cast("bigint").alias("version"),
            )
        ).alias("message")
    )


def table_changes_to_goldengate(
    changes: DataFrame,
    *,
    table: str,
    fingerprint: int,
    pk_names: list[str],
    version: Column | int = 1,
    ts_micros: Column | int = 0,
) -> DataFrame:
    """Outbound GoldenGate wrapper wire: render a change-data-feed
    frame (``TableCatalog.table_changes`` output — row columns plus
    ``_change_type``) as the wrapper-wire dml messages this module's
    own ``goldengate_changelog`` decodes, completing the renderer
    matrix (Maxwell/DMS/Canal/Debezium/GoldenGate — every inbound
    format also renders outbound). insert -> op I (after image),
    update_postimage -> U (after only; the normalizer accepts a
    missing preimage), delete -> D (before image);
    ``update_preimage`` rows (Delta-style CDF frames carry them) are
    dropped at render time — the wrapper wire has no preimage slot.
    Any OTHER ``_change_type`` raises IN THE RENDER (producer side),
    never silently publishing ``op_type: null`` junk the consumer's
    ``normalize_raw_ops`` would only reject after it is already on
    the wire. Pair with ``goldengate_schema_message`` for the
    fingerprint the consumer's registry resolves. Pure projection, no
    shuffle. PKs travel in-band per message, as on the real wire."""
    # keep NULL _change_type rows (they must reach the raise below,
    # not vanish in a null-comparison filter)
    changes = changes.filter(
        F.coalesce(F.col("_change_type") != "update_preimage", F.lit(True))
    )
    cols = [c for c in changes.columns if c != "_change_type"]
    img = _string_image(cols)
    op = (
        F.when(F.col("_change_type") == "insert", F.lit("I"))
        .when(F.col("_change_type") == "update_postimage", F.lit("U"))
        .when(F.col("_change_type") == "delete", F.lit("D"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("table_changes_to_goldengate: unknown _change_type: "),
                    F.coalesce(F.col("_change_type"), F.lit("NULL")),
                )
            )
        )
    )
    v = (F.lit(version) if isinstance(version, int) else version).cast("bigint")
    ts = (F.lit(ts_micros) if isinstance(ts_micros, int) else ts_micros).cast("bigint")
    body = F.struct(
        F.lit("dml").alias("kind"),
        F.lit(table).alias("table"),
        F.lit(fingerprint).cast("bigint").alias("fingerprint"),
        op.alias("op_type"),
        F.array(*[F.lit(p) for p in pk_names]).alias("primary_keys"),
        F.when(op == "D", img).alias("before"),
        F.when(op != "D", img).alias("after"),
        v.alias("version"),
        ts.alias("ts_micros"),
    )
    return changes.select(F.to_json(body).alias("message"))
