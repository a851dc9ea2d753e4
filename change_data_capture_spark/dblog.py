"""DBLog-style watermark-based chunked snapshot: bootstrap a LIVE
table into the catalog in PK-range chunks interleaved with the
ongoing change feed — no global lock, no full-table consistent read.

Public algorithm: Andreakis & Papapanagiotou, "DBLog: A Watermark
Based Change-Data-Capture Framework" (Netflix, arXiv:2010.12597); the
same design ships as Debezium's incremental snapshots
(read-only/watermark mode). The reference engine bootstraps with a
single initial load before polling (CTSQLServer.java snapshot-then-
poll; `apply.bootstrap_replica` covers that path from a PUBLISHED
version). DBLog solves the harder production case: the source table
is too big for one consistent read (hours of snapshot at 100 TB), so
it is selected in small keyset-paginated chunks WHILE change events
keep flowing, and the two are reconciled per chunk:

  1. note the feed position (LOW watermark), select one PK-range
     chunk from the live table, note the feed position again (HIGH
     watermark);
  2. drop from the chunk every row whose key had a change event
     inside the (low, high] window — the select raced those commits,
     so the row may be either image; the event is the truth and
     already flows through the feed;
  3. emit the surviving chunk rows BELOW the window's events so any
     event wins, then resume the feed.

Mapping onto this engine's versioned apply (`apply.apply_changes`):
the catalog's idempotence watermark is per TABLE (skip
`change_tracking_version <= applied`), so a chunk cannot be emitted
at a version under the already-applied feed — late low-version
batches are skipped as replays. ``ChunkedSnapshot.apply_chunk``
therefore stamps each chunk at ``applied_version + 1`` — strictly
above everything applied, and strictly below the next feed batch
PROVIDED the feed's version domain leaves room (the wire decoders
default to timestamp-micros versions, which do; raw dense domains
like SQL Server CT's ``SYS_CHANGE_VERSION`` integers do NOT, and
``apply_feed`` detects the resulting swallowed-batch collision and
raises ``VersionCollisionError`` instead of losing data) — and
performs step 2's key-drop as an anti-join against the window's
changed keys.
The drop is load-bearing exactly here: the raced events sit BELOW the
chunk's version, so without it a stale chunk image would clobber an
already-applied newer value. `tests/test_dblog.py` pins that failure
mode both ways (with the drop: converges; bypassing it: clobbers).

Scale: each chunk select is a pushed-down PK-range scan (keyset
pagination, O(chunk) per step, resumable); the window key-drop is an
anti-join against O(events-in-window) keys; the apply is the same
bucket-pruned MERGE as any batch. Nothing holds a table lock and no
step reads more than one chunk + one feed batch — the bootstrap of a
100 TB table is a sequence of bounded steps that can pause/resume
around the live feed indefinitely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .apply import TableCatalog, apply_changes
from .changelog import ddl_record, dml_records
from .schema import OP_INSERT


class VersionCollisionError(RuntimeError):
    """A NEW feed batch was swallowed by the engine's replay filter
    because a chunk stamp had already advanced the table watermark to
    (or past) the batch's version. This happens when the feed's
    version domain is DENSE (e.g. raw SQL Server CT
    ``SYS_CHANGE_VERSION`` integers): ``apply_chunk`` stamps at
    ``applied + 1``, which collides with the very next feed version
    and would silently lose those source events. Re-run the bootstrap
    with the feed's versions mapped into a sparse domain (e.g.
    ``version_expr = version * 1000`` on the decoder, or
    timestamp-micros versions as the wire decoders default to) so
    chunk stamps fit between feed versions."""


def select_chunk(source: DataFrame, pk: str, lo, hi) -> DataFrame:
    """One keyset-pagination chunk: ``lo <= pk < hi`` (hi=None for the
    tail). A plain range predicate so parquet/JDBC scans push it down
    — the chunk costs O(chunk), not O(table)."""
    cond = F.col(pk) >= F.lit(lo)
    if hi is not None:
        cond = cond & (F.col(pk) < F.lit(hi))
    return source.filter(cond)


def changed_keys_of(events: DataFrame, pks: Sequence[str]) -> DataFrame:
    """Distinct typed key frame from a CHANGE_SCHEMA envelope slice —
    the (low, high] watermark-window events a chunk select raced."""
    return events.filter(F.col("dml").isNotNull()).select(
        *[F.col("dml.rows_values").getItem(p).alias(p) for p in pks]
    ).distinct()


class ChunkedSnapshot:
    """Orchestrates one table's DBLog-style chunked bootstrap into a
    target catalog. Feed batches and chunks may interleave in any
    order; every step is one bounded ``apply_changes`` call.

    Usage::

        cs = ChunkedSnapshot(spark, target, "db.t", ["id"], schema_json)
        cs.begin()                       # announce DDL (create-on-DML)
        cs.apply_feed(batch1)            # live events, own versions
        cs.apply_chunk(chunk_df)         # clean chunk (no race)
        cs.apply_feed(batch2)
        cs.apply_chunk(raced_chunk, window_events=batch2)  # raced select
    """

    def __init__(
        self,
        spark: SparkSession,
        target: TableCatalog,
        table_id: str,
        pks: Sequence[str],
        schema_json: str,
    ):
        self.spark = spark
        self.target = target
        self.table_id = table_id
        self.pks = list(pks)
        self.schema_json = schema_json
        # feed-progress tracking for the dense-version collision guard
        # (VersionCollisionError): highest feed version seen so far.
        self._last_feed_version = 0

    def begin(self) -> None:
        """Announce the table's schema (DDL-before-DML, T3) so the
        first step — chunk or feed batch alike — creates the table."""
        apply_changes(
            self.spark, ddl_record(self.spark, self.table_id, self.schema_json), self.target
        )

    def applied_version(self) -> int:
        meta = self.target.meta(self.table_id)
        return int((meta or {}).get("applied_version", 0))

    def apply_feed(self, changelog_df: DataFrame) -> None:
        """Apply one live change-feed batch (envelope frame carrying
        its own monotone versions, e.g. from any of the five wire
        decoders through ``normalize_raw_ops``).

        Guards the chunk-stamping scheme against DENSE feed version
        domains: a batch that is NEW in feed order (max version above
        every feed version seen) but at-or-below the table's applied
        watermark was swallowed by a CHUNK stamp — that is silent data
        loss, so it raises ``VersionCollisionError``. Genuine
        at-least-once redeliveries (max version <= a feed version
        already seen) still skip silently as designed. Costs one
        O(metadata) max aggregate per batch."""
        applied_before = self.applied_version()
        v = F.col("dml.change_tracking_version")
        stats = changelog_df.agg(
            F.max(v).alias("mx"),
            # records NEW in feed order (above every feed version seen)
            # yet at-or-below the applied watermark: the replay filter
            # swallows exactly these — and only a chunk stamp can have
            # put the watermark above a never-seen feed version
            F.sum(
                ((v > self._last_feed_version) & (v <= applied_before)).cast("int")
            ).alias("swallowed"),
        ).first()
        if stats["swallowed"]:
            raise VersionCollisionError(
                f"{self.table_id}: {stats['swallowed']} new feed record(s) at "
                f"versions <= the applied watermark {applied_before}, which a "
                "chunk stamp advanced past them — the feed's version domain "
                "is too dense for chunk interleaving; map it into a sparse "
                "domain (see VersionCollisionError docstring)"
            )
        apply_changes(self.spark, changelog_df, self.target)
        if stats["mx"] is not None and int(stats["mx"]) > self._last_feed_version:
            self._last_feed_version = int(stats["mx"])

    def apply_chunk(
        self,
        chunk_df: DataFrame,
        *,
        window_events: DataFrame | None = None,
        changed_keys: DataFrame | None = None,
    ) -> int:
        """Emit one selected chunk as INSERT upserts at
        ``applied_version + 1`` — above every applied event (so the
        engine's replay filter admits it), below the next feed batch
        (so any later event wins).

        ``window_events`` (envelope frame) or ``changed_keys`` (typed
        key frame) names the keys whose commits the chunk's select
        raced — the (low, high] watermark window of the paper. Those
        rows are dropped from the chunk (anti-join): their events are
        the truth and were already applied BELOW this chunk's version,
        so keeping a raced image would clobber newer data.

        Returns the version the chunk was stamped with."""
        if window_events is not None:
            changed_keys = changed_keys_of(window_events, self.pks)
        if changed_keys is not None:
            # Align key types to the chunk's (envelope keys are
            # stringified): a typed anti-join, not an implicit coerce.
            dtypes = dict(chunk_df.dtypes)
            ck = changed_keys.select(
                *[F.col(p).cast(dtypes[p]).alias(p) for p in self.pks]
            )
            chunk_df = chunk_df.join(ck, on=self.pks, how="left_anti")
        v = self.applied_version() + 1
        apply_changes(
            self.spark,
            dml_records(chunk_df, self.table_id, self.pks, op=OP_INSERT, version=v),
            self.target,
        )
        return v

    def result(self) -> DataFrame:
        return self.target.read(self.spark, self.table_id)


def sparse_versions(raw_ops: DataFrame, *, factor: int = 1000) -> DataFrame:
    """Remap a DENSE version domain (e.g. raw SQL Server CT
    ``SYS_CHANGE_VERSION`` integers from the jdbc_ct source) into a
    sparse one by scaling: version * factor. Order is preserved and
    the map is injective, so replay semantics are unchanged — but now
    ``ChunkedSnapshot.apply_chunk``'s ``applied + 1`` stamps land in
    the gaps between feed versions instead of colliding with the next
    one (``VersionCollisionError``). Apply ONCE at the feed boundary,
    before the first batch ever reaches the target catalog (mixing
    scaled and unscaled versions on one table breaks the watermark).
    """
    if factor < 2:
        raise ValueError("factor must leave gaps (>= 2)")
    if "change_tracking_version" in raw_ops.columns:
        v = F.col("change_tracking_version")
        return raw_ops.withColumn(
            "change_tracking_version", (v.cast("bigint") * factor).cast("bigint")
        )
    if "dml" in raw_ops.columns:
        # CHANGE_SCHEMA envelope: rescale inside the dml struct (DDL
        # rows pass through untouched — their dml is null and
        # withField on null yields null)
        scaled = F.col("dml").withField(
            "change_tracking_version",
            (F.col("dml.change_tracking_version").cast("bigint") * factor).cast(
                "bigint"
            ),
        )
        return raw_ops.withColumn("dml", scaled)
    raise ValueError("expected a raw-ops or CHANGE_SCHEMA envelope frame")
