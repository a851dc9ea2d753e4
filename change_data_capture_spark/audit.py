"""Replica consistency audit + targeted repair — the
pt-table-checksum / pt-table-sync analog for this engine's managed
tables (Percona Toolkit's public design: checksum source and replica
in chunks, then re-sync only the chunks that differ).

A CDC replica drifts in practice: a skipped batch, an out-of-band
write, a bug during a migration window. Re-copying 100 TB to be safe
is not a plan; the audit computes an order-insensitive content
checksum PER BUCKET on each side (one scan each, map-side-combinable
``bit_xor`` — no sort, no collect of row data), diffs the two O(#
buckets) frames, and repairs ONLY the differing buckets through the
same versioned bucket-granular write path the apply engine uses
(reader-invisible, CAS-protected, time-travel preserved).

Engine-portable hashing (the ``scale._md5_hash32`` convention): each
row renders to a canonical string (doubles through DECIMAL(38,6),
null sentinel before concat — ``concat_ws`` SKIPS nulls in both
engines, which would alias (a,NULL,b) with (a,b)) and hashes
``md5 -> 60-bit bigint``; the per-bucket aggregate is ``bit_xor`` —
commutative (order/partitioning-insensitive) and overflow-free where
a SUM of 60-bit values would overflow BIGINT long before 100 TB row
counts. DuckDB computes the identical md5/bit_xor arithmetic, which
is what lets the table-level checksum sit under the oracle gate
(``cdc_table_checksum``).

Bucket ids reuse the writer's own ``bucket_expr`` over the
schema-normalized key values, so audit buckets are exactly the
storage buckets the repair rewrites.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window as PSWindow
from pyspark.sql import functions as F

from .apply import TableCatalog, bucket_expr, _DEFAULT_BUCKETS
from .schema import schema_from_json

_SEP = "\x01"
_NULL = "\x00<null>"


def _canon(col: Column, dtype: str) -> Column:
    if dtype in ("double", "float"):
        # NaN / Infinity / |x| >= 1e32 would TRAP the DECIMAL(38,6)
        # rendering under ANSI — and a checksum that dies on dirty
        # data can't audit the drift it exists to find. Sentinel
        # branches keep the hash total and engine-portable for all
        # finite |x| < 1e32 (the DuckDB twin uses the same literals).
        col = (
            F.when(F.isnan(col), F.lit("<nan>"))
            .when(col == float("inf"), F.lit("<inf>"))
            .when(col == float("-inf"), F.lit("<-inf>"))
            .when(F.abs(col) >= 1e32, F.concat(F.lit("<big>"), col.cast("string")))
            .otherwise(col.cast("decimal(38,6)").cast("string"))
        )
    return F.coalesce(col.cast("string"), F.lit(_NULL))


def row_hash_expr(dtypes: Sequence[tuple[str, str]]) -> Column:
    """60-bit engine-portable content hash of a row: md5 over the
    canonical column renderings, first 15 hex digits as bigint
    (DuckDB twin: ``('0x' || substr(md5(...), 1, 15))::BIGINT``)."""
    parts = [_canon(F.col(c), t) for c, t in dtypes]
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, 15), 16, 10
    ).cast("bigint")


def table_checksum(
    spark: SparkSession, catalog: TableCatalog, table_id: str
) -> DataFrame:
    """Per-bucket (bucket, n_rows, checksum) for a managed table —
    one pruned-nothing scan, one map-side-combinable aggregate."""
    meta = catalog.meta(table_id)
    if meta is None or meta["schema"] is None:
        raise KeyError(f"unknown table {table_id!r}")
    schema = schema_from_json(meta["schema"])
    pks = list(meta["pks"])
    nb = int(meta.get("buckets") or _DEFAULT_BUCKETS)
    df = catalog.read(spark, table_id)
    dtypes = [(f.name, dict(df.dtypes)[f.name]) for f in schema.fields]
    # Typed frame -> the default rowkey stringification, the same form
    # the apply engine's own merge path buckets typed rows with.
    rows = df.select(
        bucket_expr(pks, nb).alias("bucket"),
        row_hash_expr(dtypes).alias("__h"),
    )
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bit_xor(__h)").cast("long").alias("checksum"),
    )


def checksum_diff(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Buckets whose (n_rows, checksum) disagree — a full-outer join
    of two O(#buckets) frames; a bucket present on one side only is a
    mismatch too."""
    a = src.select(
        "bucket",
        F.col("n_rows").alias("src_rows"),
        F.col("checksum").alias("src_checksum"),
    )
    b = dst.select(
        "bucket",
        F.col("n_rows").alias("dst_rows"),
        F.col("checksum").alias("dst_checksum"),
    )
    j = a.join(b, "bucket", "full_outer")
    return j.filter(
        ~(
            F.col("src_rows").eqNullSafe(F.col("dst_rows"))
            & F.col("src_checksum").eqNullSafe(F.col("dst_checksum"))
        )
    )


def repair_buckets(
    spark: SparkSession,
    source: TableCatalog,
    target: TableCatalog,
    table_id: str,
    buckets: Sequence[int],
) -> None:
    """pt-table-sync: replace ONLY the named target buckets with the
    source's rows for those buckets, as a new version through the
    bucket-granular write path (untouched buckets file-reuse; readers
    never block; CAS raises on a concurrent publish). Requires both
    sides on the same bucket count — re-``compact`` the replica first
    otherwise."""
    sm, tm = source.meta(table_id), target.meta(table_id)
    if sm is None or tm is None:
        raise KeyError(f"unknown table {table_id!r}")
    snb = int(sm.get("buckets") or _DEFAULT_BUCKETS)
    tnb = int(tm.get("buckets") or _DEFAULT_BUCKETS)
    if snb != tnb:
        raise ValueError(
            f"bucket counts differ (source {snb}, target {tnb}); "
            "compact the target to the source's count first"
        )
    buckets = sorted(int(b) for b in buckets)
    pks = list(sm["pks"])
    schema = schema_from_json(tm["schema"])
    src_rows = (
        source.read(spark, table_id)
        .withColumn("__rb", bucket_expr(pks, snb))
        .filter(F.col("__rb").isin(*[F.lit(b) for b in buckets]))
        .drop("__rb")
        .select(*[f.name for f in schema.fields])
    )
    target.write_new_version(
        table_id,
        src_rows,
        int(tm.get("applied_version", 0)),
        changed_buckets=buckets,
        expected_current=tm["current"],
    )


def replication_lag_report(source: TableCatalog, target: TableCatalog) -> list[dict]:
    """Freshness/lag dashboard row per source table — all from the
    two catalogs' metadata, zero Spark jobs (the monitoring companion
    to ``apply.maintenance_report``): the replica's applied tracking
    watermark vs the source's, how far behind it is in the tracking
    domain, and whether the table is missing entirely. A replica that
    is BEHIND needs no action (the feed will catch it up); a replica
    that is AHEAD is mis-homed in the version domain (the
    bootstrap-watermark bug class ``apply._stamp_tracking_watermark``
    exists to prevent) and is flagged loudly."""
    out: list[dict] = []
    for t in source.tables():
        sm = source.meta(t) or {}
        tm = target.meta(t)
        src_v = int(sm.get("applied_version", 0))
        if tm is None:
            out.append(
                {"table": t, "source_version": src_v, "target_version": None,
                 "versions_behind": None, "status": "missing"}
            )
            continue
        dst_v = int(tm.get("applied_version", 0))
        status = "ok" if dst_v == src_v else ("behind" if dst_v < src_v else "AHEAD")
        out.append(
            {"table": t, "source_version": src_v, "target_version": dst_v,
             "versions_behind": src_v - dst_v, "status": status}
        )
    return out


def feed_gap_report(
    changes: DataFrame,
    *,
    table_col: str = "table",
    version_col: str = "version",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Change-feed integrity monitor: per table, find GAPS (tracking
    versions missing from the feed — the CT retention-cleanup hazard
    the reference's ``validateChangeTracking``/retry window exists to
    surface: a consumer whose watermark falls behind
    CHANGE_RETENTION loses versions silently) and DUPLICATE
    deliveries (a replayed producer batch that net-change semantics
    would mask but an at-most-once sink must not see twice).

    Input-grain contract — what counts as a duplicate:

    * ``key_cols=None`` (default): the feed must be ONE record per
      (table, version) — transaction/version grain, like the
      synthesized version streams the registry audits. A version seen
      with n records is reported as a dup with ``n`` = that count.
      Feeding a ROW-grain changelog here (many rows per transaction
      version — the engine's own ``dml_records`` output, or SQL
      Server CT where one SYS_CHANGE_VERSION spans all rows a
      transaction touched) would flag every multi-row transaction;
      pass ``key_cols`` for those feeds.
    * ``key_cols=[pk, ...]``: row grain. A version is a dup when some
      key tuple within it was delivered more than once (a replay re-
      delivers every row; one repeated key is already an anomaly);
      ``n`` = the max per-key delivery count for that version.

    Gap detection assumes a DENSE per-table version domain (SQL
    Server CT semantics). Timestamp- or LSN-versioned feeds are
    sparse by nature — remap through ``normalize.sparse_versions``
    first, or every adjacent pair reads as a gap.

    One report frame at the anomaly grain, ``kind`` in {'gap','dup'}:
    a gap row carries the missing closed range [v_from, v_to] between
    two observed versions; a dup row the replayed version and its
    count. Plan: single pass — a per-(table, version) pre-aggregation
    (map-side combinable before the (table, version) exchange; the
    row-grain form adds one keyed pre-agg level below it), then one
    lag() window whose (table)-keyed exchange moves only the
    PER-VERSION frame (≪ feed size at any scale), with both anomaly
    kinds emitted from the same row via a conditional explode — no
    union, no second scan of the feed, no persist, fully lazy."""
    t = F.col(table_col).alias("table")
    v = F.col(version_col).alias("version")
    if key_cols:
        per_v = (
            changes.groupBy(t, v, *[F.col(k) for k in key_cols])
            .agg(F.count("*").alias("__c"))
            .groupBy("table", "version")
            .agg(F.max("__c").cast("long").alias("n_records"))
        )
    else:
        per_v = changes.groupBy(t, v).agg(
            F.count("*").cast("long").alias("n_records")
        )

    w = PSWindow.partitionBy("table").orderBy("version")
    # conditional two-slot array; null slots are exploded then dropped
    # by a relational filter (stays in whole-stage codegen — an
    # array-HOF filter would be interpreted per row)
    anomaly = F.explode(
        F.array(
            F.when(
                F.col("n_records") > 1,
                F.struct(
                    F.lit("dup").alias("kind"),
                    F.col("version").alias("v_from"),
                    F.col("version").alias("v_to"),
                    F.col("n_records").alias("n"),
                ),
            ),
            F.when(
                F.col("version") > F.col("__prev") + 1,
                F.struct(
                    F.lit("gap").alias("kind"),
                    (F.col("__prev") + 1).alias("v_from"),
                    (F.col("version") - 1).alias("v_to"),
                    (F.col("version") - F.col("__prev") - 1)
                    .cast("long")
                    .alias("n"),
                ),
            ),
        )
    )
    return (
        per_v.withColumn("__prev", F.lag("version").over(w))
        .select("table", anomaly.alias("__a"))
        .filter(F.col("__a").isNotNull())
        .select("table", "__a.kind", "__a.v_from", "__a.v_to", "__a.n")
    )
