"""Normalization operators: raw source ops -> canonical change records.

Rebuilds the reference's GoldenGate Normalizer (``source/oracle/
Normalizer.java:59-237``) and DMLFlattener transform
(``transform/DMLFlattener.java:78-125``) as pure Catalyst column
expressions — every op here stays inside whole-stage codegen (no
Python UDFs), so normalization of a 100 TB change feed is a narrow,
shuffle-free map stage.

Semantics preserved:
- op short names I/U/D parse to INSERT/UPDATE/DELETE
  (``common/OperationType.java:22-36``);
- UPDATE merges before+after images per column, after-image wins when
  present (the reference's per-column ``_isMissing`` flags,
  ``Normalizer.java:176-186``; here: absence from the ``after`` map);
- DELETE takes the before image (``Normalizer.java:212-221``);
- an UPDATE that changes any primary-key value splits into
  DELETE(before) + INSERT(after) (``Normalizer.java:166-190``) — the
  subtlest reference semantic, exercised by its golden tests;
- DMLFlattener emits one flat row per DML with optional appended
  CDC_OP_TYPE / CHANGE_TRACKING_VERSION / CDC_CURRENT_TIMESTAMP
  columns (``DMLFlattener.java:78-125``, config ``:130-136``);
- schema announcements for a table are suppressed unless the schema
  string actually changed (``CTSQLServer.java:170-201``) — batch
  variant here via a lag window; streaming variant in streaming.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .envelope import wrap_dml

# Raw-op shape emitted by a GoldenGate-style source (FIXTURES.md §4:
# avro_op record `table, op_type, primary_keys, before, after`), with
# images as map<string,string> and absence meaning "column missing".
RAW_OP_DDL = (
    "table string, op_type string, primary_keys array<string>, "
    "before map<string,string>, after map<string,string>, "
    "rows_schema string, change_tracking_version bigint, "
    "cdc_current_timestamp bigint"
)


def _op_full() -> F.Column:
    return (
        F.when(F.upper("op_type").isin("I", "INSERT"), F.lit("INSERT"))
        .when(F.upper("op_type").isin("U", "UPDATE"), F.lit("UPDATE"))
        .when(F.upper("op_type").isin("D", "DELETE"), F.lit("DELETE"))
    )


def _pk_image(image: str) -> F.Column:
    """Row key of an image map using the record's own primary_keys
    array (name-sorted, ':'-joined — CDCTableUtil.java:98-105)."""
    return F.concat_ws(
        ":", F.expr(f"transform(sort_array(primary_keys), k -> {image}[k])")
    )


def normalize_raw_ops(raw: DataFrame) -> DataFrame:
    """Raw before/after ops -> canonical DML change records (envelope).

    One input row becomes 0..2 output records: the PK-update split
    emits DELETE(before) + INSERT(after) when any primary-key value
    differs between images.

    Unknown op codes fail the job (the reference's OperationType parse
    throws, ``common/OperationType.java:31-35``) — a silent null op
    would otherwise be applied as an upsert.
    """
    op = _op_full()
    op = F.when(op.isNotNull(), op).otherwise(
        F.raise_error(F.concat(F.lit("unknown op_type: "), F.col("op_type")))
    )
    # Present-in-after WINS even when its value is NULL (an explicit
    # SET NULL must reach the replica); only keys ABSENT from the
    # after map fall back to the before image. coalesce(a, b) cannot
    # distinguish present-null from absent (r6 review, confirmed by
    # execution: a SET-NULL kept the stale before value forever) —
    # map_contains_key can, the same test patch_updates uses for the
    # identical Mongo $unset case.
    merged = F.map_zip_with(
        "before",
        "after",
        lambda k, b, a: F.when(
            F.map_contains_key(F.col("after"), k), a
        ).otherwise(b),
    )
    # UPDATE with no before image degrades to the after image alone.
    update_values = (
        F.when(F.col("before").isNull(), F.col("after"))
        .when(F.col("after").isNull(), F.col("before"))
        .otherwise(merged)
    )

    def rec(op_col, values_col):
        return F.struct(
            op_col.alias("op_type"),
            values_col.alias("rows_values"),
        )

    # The split fires only when the after image actually CONTAINS the
    # key columns: a compressed update that omits the unchanged pk
    # (GoldenGate-style) renders an empty after-pk string and would
    # otherwise split into DELETE + a keyless INSERT (r6 review,
    # confirmed by execution) instead of the per-column merge.
    after_has_pks = F.forall(
        "primary_keys", lambda k: F.map_contains_key(F.col("after"), k)
    )
    pk_changed = (
        (op == "UPDATE")
        & F.col("before").isNotNull()
        & F.col("after").isNotNull()
        & after_has_pks
        & (_pk_image("before") != _pk_image("after"))
    )

    recs = (
        F.when(
            pk_changed,
            F.array(
                rec(F.lit("DELETE"), F.col("before")),
                rec(F.lit("INSERT"), F.col("after")),
            ),
        )
        .when(op == "INSERT", F.array(rec(op, F.col("after"))))
        .when(op == "DELETE", F.array(rec(op, F.col("before"))))
        .otherwise(F.array(rec(op, update_values)))
    )

    exploded = raw.select(
        F.col("table"),
        F.col("primary_keys"),
        F.col("rows_schema"),
        F.col("change_tracking_version"),
        F.col("cdc_current_timestamp"),
        F.explode(recs).alias("__r"),
    )
    dml = exploded.select(
        F.col("__r.op_type").alias("op_type"),
        "table",
        "primary_keys",
        "rows_schema",
        F.col("__r.rows_values").alias("rows_values"),
        "change_tracking_version",
        "cdc_current_timestamp",
    )
    return wrap_dml(dml)


def dml_flattener(
    changelog: DataFrame,
    schema: StructType,
    *,
    include_op_type: bool = True,
    include_version: bool = True,
    include_timestamp: bool = False,
) -> DataFrame:
    """Drop the envelope; emit one flat typed row per DML record
    (DMLFlattener.java:78-125). The per-rows_schema schema cache of the
    reference collapses into a single Catalyst projection here: the
    caller passes the resolved table schema."""
    dml = changelog.filter(F.col("dml").isNotNull()).select("dml.*")
    cols = [F.col("rows_values")[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
    if include_op_type:
        cols.append(F.col("op_type").alias("CDC_OP_TYPE"))
    if include_version:
        cols.append(F.col("change_tracking_version").alias("CHANGE_TRACKING_VERSION"))
    if include_timestamp:
        cols.append(F.col("cdc_current_timestamp").alias("CDC_CURRENT_TIMESTAMP"))
    return dml.select(*cols)


def dedupe_ddl_announcements(
    ddl: DataFrame, order_cols: Sequence[str] = ("seq",)
) -> DataFrame:
    """Batch schema-change dedup (ST1, CTSQLServer.java:170-201): per
    table, keep only announcements whose schema string differs from the
    previous announcement. Input: columns ``table``, ``schema`` plus
    ordering column(s)."""
    w = Window.partitionBy("table").orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag("schema").over(w)
    return (
        ddl.withColumn("__prev", prev)
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("schema")))
        .drop("__prev")
    )


def collapse_net_changes(dml: DataFrame, pks: Sequence[str]) -> DataFrame:
    """Within-window net-change collapse (SQL Server CT semantics: the
    golden test expects insert+update inside one polling window to
    surface as a single INSERT with final values,
    CTSQLServerPluginIntegrationTest.java:263-292).

    Input: flat DML columns (op_type, table, rows_values, version...).
    Output: one record per key — final values (highest version), with
    op_type = INSERT if the key was inserted in this window, DELETE if
    the last op deleted it, else UPDATE.
    """
    key = F.concat_ws(
        ":", *[F.col("rows_values")[k].cast("string") for k in sorted(pks)]
    )
    # One map-side-combinable aggregation instead of two window passes
    # (per-key max flag + ranking): max_by picks the final row, the
    # conditional max computes was-inserted, and only per-partition
    # winners cross the shuffle — same shape rationale as
    # apply.collapse_last_writer.
    row = F.struct(*[F.col(c) for c in dml.columns])
    # A DELETE stays a DELETE even if the key was inserted inside the
    # window — applying it to a consumer that never saw the insert is a
    # harmless idempotent no-op.
    # struct-wrap the ordering key: max_by skips rows whose ordering
    # key is NULL, which would turn an all-null-version key into a
    # phantom all-null winner; a struct is never null, and a null
    # version inside it sorts lowest (nulls-first struct order), so
    # some real row always wins.
    agged = dml.groupBy(F.col("table").alias("__t"), key.alias("__k")).agg(
        F.max_by(row, F.struct(F.col("change_tracking_version"))).alias("__w"),
        F.max(F.when(F.col("op_type") == "INSERT", 1).otherwise(0)).alias("__ins"),
    )
    return agged.select("__w.*", "__ins").withColumn(
        "op_type",
        F.when(F.col("op_type") == "DELETE", F.lit("DELETE"))
        .when(F.col("__ins") == 1, F.lit("INSERT"))
        .otherwise(F.lit("UPDATE")),
    ).drop("__ins")


def patch_updates(
    base: DataFrame,
    patches: DataFrame,
    pks: Sequence[str],
    *,
    version_col: str = "version",
    patch_col: str = "patch",
) -> DataFrame:
    """Apply PARTIAL after-images — a map of only the changed columns —
    to a typed base relation: GoldenGate "compressed update" semantics
    for the case no full before-image exists to merge against.
    ``normalize_raw_ops`` covers the image-vs-image merge the
    reference's Normalizer does (``Normalizer.java:176-186``); this is
    the stored-row merge its keyed SINK performs implicitly when a
    partial row lands on an existing HBase cell — re-expressed as a
    relational operator so a columnar store gets the same semantics
    instead of nulling out every unpatched column.

    Column-wise last-writer-wins: for each (key, column) the patch cell
    with the highest ``version_col`` wins (ties break on value —
    deterministic); a patch value of NULL SETS the column to NULL
    (explicit null, distinct from absence); columns never patched keep
    the stored value. Patches for keys absent from ``base`` cannot be
    completed into full rows and are dropped — the orphan
    compressed-update case: upserting a partial row would invent NULLs
    for columns the source never sent.

    Plan: patches explode to (key, column, version, value) cells ->
    per-(key, column) max-by-version -> ``map_from_entries`` per key
    (two map-side-combinable shuffles over CHANGED CELLS only, never
    the base) -> ONE pk equi-join against base (patch side is
    dim-sized in steady state, AQE broadcasts it) -> per-column
    conditional projection, all whole-stage codegen. O(changed cells)
    plus one base join at any base size; inside the managed catalog,
    compose with bucket-pruned reads (``apply.lookup_keys``) so the
    base side scans only touched buckets."""
    pks = list(pks)
    value_cols = [c for c in base.columns if c not in pks]
    types = {f.name: f.dataType for f in base.schema.fields}

    cells = patches.select(
        *pks,
        F.col(version_col).alias("__v"),
        F.explode(F.col(patch_col)).alias("__c", "__val"),
    )
    winners = (
        cells.groupBy(*pks, "__c")
        .agg(F.max(F.struct(F.col("__v"), F.col("__val"))).alias("__w"))
        .groupBy(*pks)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__c"), F.col("__w.__val")))
            ).alias("__patch")
        )
    )
    joined = base.join(winners, on=pks, how="left")

    def merged(c):
        # null __patch (unpatched key) makes map_contains_key null ->
        # falsy -> stored value; an explicit NULL patch value takes the
        # TRUE branch (key present) and lands as NULL; an UNDECODABLE
        # value (try_cast/from_json null on non-null input — 'N/A' in a
        # double column) keeps the STORED value instead of throwing
        # under ANSI mode or silently nulling — route
        # undecodable_patch_cells to a dead-letter sink so the skipped
        # intent stays visible.
        pv = F.element_at(F.col("__patch"), F.lit(c))
        decoded = _try_decode(pv, types[c])
        return (
            F.when(
                F.map_contains_key(F.col("__patch"), F.lit(c)),
                F.when(pv.isNull(), F.lit(None).cast(types[c]))
                .when(decoded.isNotNull(), decoded)
                .otherwise(F.col(c)),
            )
            .otherwise(F.col(c))
            .alias(c)
        )

    return joined.select(*[F.col(c) for c in pks], *[merged(c) for c in value_cols])


def _try_decode(raw: F.Column, dtype) -> F.Column:
    """Never-throwing typed decode of one patch/envelope value: scalars
    via ``try_cast``, complex types via ``from_json`` (they travel as
    JSON strings — the envelope convention). Malformed JSON in a
    STRUCT column decodes to a non-null all-null struct (PERMISSIVE
    semantics — same caveat as ``apply._undecodable_columns``)."""
    from pyspark.sql.types import ArrayType, MapType, StructType as _ST

    if isinstance(dtype, (ArrayType, MapType, _ST)):
        return F.from_json(raw, dtype)
    return raw.try_cast(dtype)


def undecodable_patch_cells(
    patches: DataFrame,
    schema: StructType,
    *,
    patch_col: str = "patch",
) -> DataFrame:
    """Dead-letter leg of ``patch_updates``: the individual patch CELLS
    it will skip — values that cannot decode to the registered column
    type ('N/A' in a double column; reason ``uncastable``) and patches
    naming columns the schema does not have (reason
    ``unknown_column`` — they would silently no-op). ``patch_updates``
    keeps the STORED value for skipped cells (at-least-once safe);
    routing this frame to a quarantine sink keeps the skipped intent
    visible, the same contract as ``apply.undecodable_rows``. One
    narrow explode, no shuffle."""
    types = {f.name: f.dataType for f in schema.fields}
    cells = patches.select(
        "*", F.explode(F.col(patch_col)).alias("__c", "__val")
    ).drop(patch_col)
    uncastable = F.coalesce(
        *[
            F.when(
                (F.col("__c") == c)
                & F.col("__val").isNotNull()
                & _try_decode(F.col("__val"), t).isNull(),
                F.lit("uncastable"),
            )
            for c, t in types.items()
        ],
        F.lit(None).cast("string"),
    )
    unknown = F.when(
        ~F.col("__c").isin(*types.keys()), F.lit("unknown_column")
    )
    reason = F.coalesce(unknown, uncastable)
    return (
        cells.filter(reason.isNotNull())
        .withColumn("reason", reason)
        .withColumnRenamed("__c", "column")
        .withColumnRenamed("__val", "value")
    )
