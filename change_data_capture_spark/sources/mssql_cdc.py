"""SQL Server Change Data Capture (cdc.fn_cdc_get_all_changes_*)
normalize: the sibling protocol to the reference's Change Tracking
path, decoded into the engine's canonical raw-op frame.

The reference polls CHANGETABLE(CHANGES ...) — SQL Server's Change
Tracking, which keeps only the NET latest version per row and a
bigint SYS_CHANGE_VERSION (sources/jdbc_ct.py mirrors it,
CTSQLServer.java:149-162 parity). SQL Server's OTHER capture
mechanism, Change Data Capture, is the one real estates use when they
need full change HISTORY with before images: an agent job copies every
transaction-log operation into a change table read back via
cdc.fn_cdc_get_all_changes_<capture_instance>. Its public row shape
(Microsoft docs, "cdc.fn_cdc_get_all_changes"):

  __$start_lsn  binary(10)   commit LSN of the enclosing transaction
  __$seqval     binary(10)   change order WITHIN the transaction
  __$operation  int          1=delete, 2=insert,
                             3=update before image (row_filter_option
                               'all update old' only),
                             4=update after image
  __$update_mask varbinary   changed-column bitmap
  <captured columns...>      the row image itself

A JDBC read of that function (or an export of the change table) is
therefore a DataFrame, and this module is the T1/T7 normalize step
over it — reference parity: ResultSetToDMLRecord
(CTSQLServer.java:271-320) turns CT rows into DMLRecords; here the
CDC row pairs (operations 3+4 share ONE __$seqval per the docs) fold
into single UPDATE raw-ops with both images, so the shared
``normalize_raw_ops`` PK-update split and apply engine run unchanged.

Plan shape (100 TB honest): ONE hash-shuffle keyed by
(start_lsn, seqval) does the 3/4 pairing — each change is its own
key, so the aggregation is per-change-record and skew-free. The
version domain is built from the batch's DISTINCT commit LSNs
(transaction-count sized, orders of magnitude below row count): a
dense index over that bounded frame joined back by LSN, micro-stepped
by the intra-transaction change order (2^20 changes per transaction
before wrap, same convention as the wal2json v1 decoder). LSNs are
binary(10) — 80 bits, too wide for the envelope's bigint version —
so the dense-index mapping is exact where a bit-packing would silently
overflow; ``base_version`` carries the caller's watermark so versions
stay monotone ACROSS polls.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: metadata columns of the cdc.fn_cdc_get_all_changes_* row shape
META_COLS = ("__$start_lsn", "__$end_lsn", "__$seqval", "__$operation",
             "__$update_mask", "__$command_id")


def _hex(df: DataFrame, name: str) -> Column:
    """binary(10) or hex-string LSN/seqval column -> canonical upper
    hex text (lexicographic order == LSN order for fixed-width hex).
    The branch is chosen from the STATIC column type, not per row."""
    col = F.col(f"`{name}`")
    dtype = dict(df.dtypes).get(name, "string")
    return F.hex(col) if dtype == "binary" else F.upper(col.cast("string"))


def mssql_cdc_raw_ops(
    changes: DataFrame,
    table: str,
    primary_keys: Sequence[str],
    *,
    rows_schema: str | None = None,
    base_version: int = 0,
    version_expr: Column | None = None,
) -> DataFrame:
    """cdc.fn_cdc_get_all_changes_* rows -> raw-op rows
    (normalize.RAW_OP_DDL contract).

    Operation codes 1/2 map straight to DELETE/INSERT with the row as
    the before/after image; 3 (update before) and 4 (update after)
    share one ``__$seqval`` and fold into a single UPDATE carrying
    both images — so a captured-instance configured WITHOUT
    'all update old' (no 3-rows) still yields correct UPDATEs, just
    with the after image standing in for the preimage (key columns are
    present either way, which is all the PK-update split needs).

    ``base_version`` is the caller's TRANSACTION-domain watermark: the
    number of distinct commit LSNs consumed by all previous polls —
    i.e. ``previous poll's max change_tracking_version >> 20``, NOT
    the max version itself. The emitted version is
    ``(base_version + txn_index) * 2^20 + intra_txn_order``, so
    passing a version-domain value would multiply an already-shifted
    number by 2^20 again and overflow bigint within a few polls
    (ANSI mode turns that into a hard error rather than silent
    wraparound; the guard below catches it before any Spark job).
    ``version_expr`` overrides the version entirely (evaluated against
    the paired frame's ``__lsn``/``__seq`` hex columns) for feeds that
    already carry a bigint order.
    """
    if base_version < 0 or base_version >= 1 << 42:
        raise ValueError(
            "base_version must be a transaction-count watermark "
            "(previous max change_tracking_version >> 20), got "
            f"{base_version} — a value this large is almost certainly "
            "a version-domain watermark and would overflow the "
            "(base + txn) * 2^20 version encoding"
        )
    data_cols = [c for c in changes.columns if c not in META_COLS]
    missing = [k for k in primary_keys if k not in data_cols]
    if missing:
        raise ValueError(f"primary keys {missing} not in captured columns")

    op = F.col("`__$operation`")
    kv: list[Column] = []
    for c in data_cols:
        kv.append(F.lit(c))
        kv.append(F.col(f"`{c}`").cast("string"))
    row_map = F.create_map(*kv)

    tagged = (
        changes.select(
            _hex(changes, "__$start_lsn").alias("__lsn"),
            _hex(changes, "__$seqval").alias("__seq"),
            op.alias("__op"),
            row_map.alias("__row"),
        )
        .filter(F.col("__op").isin(1, 2, 3, 4))
        # a null LSN or seqval breaks the pairing key: two DISTINCT
        # changes would fold into ONE record in the groupBy below
        # (silent merge of unrelated rows) — drop them here; the DLQ
        # names them missing_lsn (r8)
        .filter(F.col("__lsn").isNotNull() & F.col("__seq").isNotNull())
    )

    # ONE shuffle: (lsn, seqval) is one logical change; ops 3+4 meet
    # here. first(ignorenulls) is deterministic — at most one image of
    # each kind exists per change record.
    paired = tagged.groupBy("__lsn", "__seq").agg(
        F.max("__op").alias("__kind"),
        F.first(F.when(F.col("__op").isin(1, 3), F.col("__row")), ignorenulls=True)
        .alias("__before_img"),
        F.first(F.when(F.col("__op").isin(2, 4), F.col("__row")), ignorenulls=True)
        .alias("__after_img"),
    )

    op_type = (
        F.when(F.col("__kind") == 1, F.lit("D"))
        .when(F.col("__kind") == 2, F.lit("I"))
        .otherwise(F.lit("U"))
    )
    # UPDATE without the 'all update old' 3-row: after image stands in
    before = F.when(
        op_type == "U", F.coalesce(F.col("__before_img"), F.col("__after_img"))
    ).when(op_type == "D", F.col("__before_img"))
    after = F.when(op_type.isin("I", "U"), F.col("__after_img"))
    # a 3-row whose 4-row never arrived (torn export) must not become
    # an UPDATE with no post image — drop it rather than upsert nulls
    paired = paired.filter(
        ~((F.col("__kind") == 3) & F.col("__after_img").isNull())
    )

    if version_expr is not None:
        version = version_expr
    else:
        # dense transaction index over the batch's DISTINCT commit
        # LSNs: a transaction-count-sized frame (bounded metadata, the
        # same O(#txns) discipline as the batch-apply planner), joined
        # back by LSN; intra-txn order from seqval rides the low bits.
        lsn_index = (
            paired.select("__lsn")
            .distinct()
            .withColumn(
                "__txn",
                F.row_number().over(Window.orderBy("__lsn")).cast("bigint"),
            )
        )
        paired = paired.join(lsn_index, "__lsn")
        intra = F.row_number().over(
            Window.partitionBy("__lsn").orderBy("__seq")
        ).cast("bigint") - F.lit(1).cast("bigint")
        version = (
            (F.lit(base_version).cast("bigint") + F.col("__txn"))
            * F.lit(1048576).cast("bigint")
            + intra
        )

    return (
        paired.select(
            F.lit(table).alias("table"),
            op_type.alias("op_type"),
            F.array(*[F.lit(p) for p in primary_keys]).alias("primary_keys"),
            before.alias("before"),
            after.alias("after"),
            F.lit(rows_schema).alias("rows_schema"),
            version.cast("bigint").alias("change_tracking_version"),
            version.cast("bigint").alias("cdc_current_timestamp"),
        )
        # a NULL version (possible only through a caller version_expr;
        # the default dense transaction index is never null) is
        # unusable — it would apply on the create path but silently
        # vanish behind any later watermark (NULL > x is NULL). Same
        # drop + DLQ(missing_version) contract as the seven
        # message-shaped decoders (r8).
        .filter(F.col("change_tracking_version").isNotNull())
    )


def mssql_cdc_dead_letters(
    changes: DataFrame,
    *,
    version_expr: Column | None = None,
) -> DataFrame:
    """The change records ``mssql_cdc_raw_ops`` drops, with a reason —
    the quarantine twin the seven message-shaped decoders already have
    (r8 parity): 'unsupported_op' (a null or out-of-domain
    __$operation), 'missing_lsn' (null __$start_lsn or __$seqval — the
    (lsn, seqval) pairing key is broken, and keeping such rows would
    FOLD distinct changes into one record), 'missing_image' (a 3-row
    update-before image whose 4-row after image never arrived — a torn
    export must not upsert nulls), 'missing_version' (a caller
    ``version_expr`` that evaluates null — pass the SAME override given
    to ``mssql_cdc_raw_ops``; the default dense transaction index is
    never null). Change-grain output: (lsn, seqval, op, reason). The
    3/4 pairing runs here under the SAME internal column names as the
    decoder (``__lsn``/``__seq``/``__kind``), so an LSN-derived
    version_expr works verbatim in both and decode + DLQ partition the
    feed's change records exactly (image-derived version expressions
    are not classifiable here — the torn-pair reasons fire first for
    those shapes anyway)."""
    op = F.col("`__$operation`")
    tagged = changes.select(
        _hex(changes, "__$start_lsn").alias("__lsn"),
        _hex(changes, "__$seqval").alias("__seq"),
        op.alias("__op"),
    )
    top = F.col("__op")
    bad_shape = tagged.withColumn(
        "reason",
        F.when(
            ~top.isin(1, 2, 3, 4) | top.isNull(), F.lit("unsupported_op")
        ).when(
            F.col("__lsn").isNull() | F.col("__seq").isNull(),
            F.lit("missing_lsn"),
        ),
    ).filter(F.col("reason").isNotNull())

    # the pairing view over the VALID rows, for torn-pair / version
    # classification at change grain
    valid = tagged.filter(
        top.isin(1, 2, 3, 4)
        & F.col("__lsn").isNotNull()
        & F.col("__seq").isNotNull()
    )
    paired = valid.groupBy("__lsn", "__seq").agg(
        F.max("__op").alias("__kind"),
        F.max(
            F.when(F.col("__op").isin(2, 4), F.lit(1)).otherwise(F.lit(0))
        ).alias("__has_after"),
    )

    def shape(df: DataFrame, opcol: str, reason: str | None = None) -> DataFrame:
        r = F.col("reason") if reason is None else F.lit(reason)
        return df.select(
            F.col("__lsn").alias("lsn"),
            F.col("__seq").alias("seqval"),
            F.col(opcol).alias("op"),
            r.alias("reason"),
        )

    torn = paired.filter((F.col("__kind") == 3) & (F.col("__has_after") == 0))
    out = shape(bad_shape, "__op").unionByName(shape(torn, "__kind", "missing_image"))
    if version_expr is not None:
        versionless = (
            paired.filter(~((F.col("__kind") == 3) & (F.col("__has_after") == 0)))
            .withColumn("__v", version_expr.try_cast("bigint"))
            .filter(F.col("__v").isNull())
        )
        out = out.unionByName(shape(versionless, "__kind", "missing_version"))
    return out


def encode_mssql_cdc(
    rows: DataFrame,
    *,
    operation: int,
    lsn: Column | str,
    seqval: Column | str,
) -> DataFrame:
    """Render rows as the cdc.fn_cdc_get_all_changes_* shape
    (test/replay utility): the row's own columns plus the __$ metadata
    columns, LSN/seqval as fixed-width hex text exactly as ``_hex``
    canonicalizes real binary(10) values."""
    return rows.select(
        (F.lit(lsn) if isinstance(lsn, str) else lsn).alias("__$start_lsn"),
        F.lit(None).cast("string").alias("__$end_lsn"),
        (F.lit(seqval) if isinstance(seqval, str) else seqval).alias("__$seqval"),
        F.lit(operation).alias("__$operation"),
        F.lit(None).cast("string").alias("__$update_mask"),
        *[F.col(c) for c in rows.columns],
    )


def table_changes_to_mssql_cdc(
    changes: DataFrame,
    *,
    pk_names: Sequence[str],
) -> DataFrame:
    """Outbound SQL Server CDC: render a change-data-feed frame
    (``TableCatalog.table_changes`` output) as
    cdc.fn_cdc_get_all_changes_* rows — insert -> operation 2,
    delete -> 1 (old row image), update_postimage -> 4
    (update_preimage rows render to nothing: the inbound decoder's
    missing-3-row degradation reconstructs the preimage from the after
    image, keys included, which is all the PK-update split needs).
    Closes the inbound/outbound symmetry for the row-shaped protocol
    the way the seven message formats close theirs.

    Each rendered change takes its OWN synthetic ``__$start_lsn`` — the
    md5 of (row key, change type), fixed-width hex like ``_hex``'s
    canonical form — so the inbound pairing key (lsn, seqval) can
    never fold two different keys into one record, and the dense
    transaction index orders the batch deterministically. One narrow
    projection, no shuffle."""
    from ..envelope import rowkey_expr

    row_cols = [c for c in changes.columns if c != "_change_type"]
    ct = F.col("_change_type")
    op = (
        F.when(ct == "insert", F.lit(2))
        .when(ct == "update_postimage", F.lit(4))
        .when(ct == "delete", F.lit(1))
    )
    lsn = F.md5(F.concat_ws("#", rowkey_expr(pk_names), ct))
    return (
        changes.filter(ct.isin("insert", "update_postimage", "delete"))
        .select(
            lsn.alias("__$start_lsn"),
            F.lit(None).cast("string").alias("__$end_lsn"),
            F.lit("00000000000000000000").alias("__$seqval"),
            op.alias("__$operation"),
            F.lit(None).cast("string").alias("__$update_mask"),
            *[F.col(c) for c in row_cols],
        )
    )
