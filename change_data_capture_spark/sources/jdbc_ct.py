"""SQL Server Change-Tracking polling source.

Rebuilds the reference's CT source (``source/sqlserver/
CTInputDStream.java:73-135``) Spark-first: the pushdown SQL the
reference hand-assembles per microbatch (S2-S4, P1-P7) is generated
here as plain strings and executed through ``spark.read.jdbc`` —
which pushes the whole query into SQL Server exactly as the reference
does, but (unlike the reference's acknowledged single-partition
``JdbcRDD`` limitation, ``CTInputDStream.java:166-167``) can split the
version range into N partition-parallel reads.

Everything except the actual JDBC round-trip is testable offline:
SQL generation is string-exact, and ``ct_scan_to_change_records``
normalizes a CT scan result shaped like the pushdown query's output
into canonical envelope records with pure column expressions.

Semantics preserved:
- the scan is ``CHANGETABLE(CHANGES t, prev)`` RIGHT OUTER JOIN the
  base table on every PK column, so deletes (no base row) survive
  (P1, ``CTInputDStream.java:153-156``);
- incremental range ``> prev AND <= cur`` (P2) with the batch clamp
  ``cur = min(current, prev + max_batch)`` (P5,
  ``CTInputDStream.java:114-115``);
- total ``ORDER BY SYS_CHANGE_VERSION`` (P3) — in the parallel
  rebuild, per-key ordering is restored downstream by
  ``collapse_last_writer`` (apply.py) instead of a global sort;
- projection = PK columns from CT + value columns from the base (P4,
  ``CTInputDStream.java:159-160, 246-250``);
- op codes I/U/D (``SYS_CHANGE_OPERATION``) parse via the shared
  envelope rules (``common/OperationType.java:22-36``).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..envelope import wrap_ddl, wrap_dml


@dataclass(frozen=True)
class TableInformation:
    """Catalog entry for a CT-enabled table (reference
    ``source/sqlserver/TableInformation.java:28-74``)."""

    schema_name: str
    name: str
    columns: tuple[str, ...]
    primary_keys: tuple[str, ...]

    @property
    def value_columns(self) -> tuple[str, ...]:
        """All columns minus the PKs (TableInformation.java:40)."""
        return tuple(c for c in self.columns if c not in set(self.primary_keys))

    @property
    def table_id(self) -> str:
        return f"{self.schema_name}.{self.name}"


# ---------------------------------------------------------------------------
# Pushdown SQL generators (S2-S4, P1-P7). These strings run INSIDE
# SQL Server via spark.read.jdbc — the join/filter/sort/projection are
# executed by the source database, not Spark, mirroring the reference.
# ---------------------------------------------------------------------------


def ct_enabled_database_sql(db_name_param: str = "?") -> str:
    """P7: validation — is change tracking enabled for the database
    (``CTSQLServer.java:150-163``)."""
    return (
        "SELECT * FROM sys.change_tracking_databases "
        f"WHERE database_id = DB_ID({db_name_param})"
    )


def ct_enabled_tables_sql() -> str:
    """S2: discover CT-enabled tables with their schema names
    (``CTInputDStream.java:222-238``)."""
    return (
        "SELECT s.name AS schema_name, t.name AS table_name "
        "FROM sys.change_tracking_tables ct "
        "JOIN sys.tables t ON ct.object_id = t.object_id "
        "JOIN sys.schemas s ON t.schema_id = s.schema_id"
    )


def primary_keys_sql(ti_schema: str, ti_name: str) -> str:
    """S2: PK columns of one table (``CTInputDStream.java:205-220``)."""
    return (
        "SELECT kcu.COLUMN_NAME FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE kcu "
        "JOIN INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc "
        "ON kcu.CONSTRAINT_NAME = tc.CONSTRAINT_NAME "
        "WHERE tc.CONSTRAINT_TYPE = 'PRIMARY KEY' "
        f"AND kcu.TABLE_SCHEMA = '{ti_schema}' AND kcu.TABLE_NAME = '{ti_name}'"
    )


def ddl_probe_sql(ti: TableInformation) -> str:
    """S3: one-row probe whose ResultSetMetaData yields the current
    column schema (``CTInputDStream.java:181-186``)."""
    return f"SELECT TOP 1 * FROM [{ti.schema_name}].[{ti.name}] WITH (NOLOCK)"


def current_version_sql() -> str:
    """P6: the high-watermark scalar lookup
    (``CTInputDStream.java:171-179``)."""
    return "SELECT CHANGE_TRACKING_CURRENT_VERSION()"


def clamp_version(prev: int, current: int, max_batch: int = 100_000) -> int:
    """P5: bounded incremental scan — never pull more than
    ``max_batch`` versions per batch (``CTInputDStream.java:114-115``;
    default from ``CTSQLServerConfig.java:87-90``)."""
    return min(current, prev + max_batch)


def change_scan_sql(
    ti: TableInformation, prev: int, cur: int, *, ordered: bool = True
) -> str:
    """S4/P1-P4: the core incremental change scan
    (``CTInputDStream.java:148-169``).

    Projection order: PK columns (from CT, present even for deletes),
    value columns (from the base row, NULL for deletes), then the
    change-tracking metadata columns.

    ``ordered=False`` omits the trailing ``ORDER BY`` (P3): the
    partition-parallel read path must wrap this statement as a derived
    table (Spark's JDBC source forbids the ``query`` option together
    with ``partitionColumn`` — JDBCOptions.scala — so partitioning
    requires ``dbtable`` with a subquery alias), and SQL Server
    rejects ORDER BY inside a derived table without TOP/OFFSET. A
    global sort is meaningless under a partitioned read anyway; per-key
    ordering is restored downstream by ``collapse_last_writer``
    (apply.py), as the module docstring documents."""
    join_cond = " AND ".join(
        f"CT.[{pk}] = CI.[{pk}]" for pk in ti.primary_keys
    )
    pk_cols = ", ".join(f"CT.[{pk}]" for pk in ti.primary_keys)
    val_cols = "".join(f", CI.[{c}]" for c in ti.value_columns)
    return (
        f"SELECT {pk_cols}{val_cols}, "
        "CT.SYS_CHANGE_VERSION, CT.SYS_CHANGE_OPERATION, "
        "CURRENT_TIMESTAMP AS CDC_CURRENT_TIMESTAMP "
        f"FROM [{ti.schema_name}].[{ti.name}] WITH (NOLOCK) AS CI "
        f"RIGHT OUTER JOIN CHANGETABLE(CHANGES [{ti.schema_name}].[{ti.name}], {prev}) AS CT "
        f"ON {join_cond} "
        f"WHERE CT.SYS_CHANGE_VERSION > {prev} AND CT.SYS_CHANGE_VERSION <= {cur}"
        + (" ORDER BY CT.SYS_CHANGE_VERSION" if ordered else "")
    )


# ---------------------------------------------------------------------------
# Scan-result normalization: CT query output -> envelope records.
# Pure column expressions; the hot path stays in whole-stage codegen.
# ---------------------------------------------------------------------------

_CT_META = ("SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION", "CDC_CURRENT_TIMESTAMP")


def ct_scan_to_change_records(
    scan: DataFrame, ti: TableInformation, rows_schema_json: str
) -> DataFrame:
    """T1 analog (``ResultSetToDMLRecord.java:56-113``): map each CT
    scan row to a canonical DML change record. Drops the CT metadata
    columns from the values map, parses I/U/D, and carries the change
    version + timestamp into the envelope."""
    data_cols = [c for c in scan.columns if c not in _CT_META]
    op = (
        F.when(F.col("SYS_CHANGE_OPERATION") == "I", F.lit("INSERT"))
        .when(F.col("SYS_CHANGE_OPERATION") == "U", F.lit("UPDATE"))
        .when(F.col("SYS_CHANGE_OPERATION") == "D", F.lit("DELETE"))
        .otherwise(
            F.raise_error(
                F.concat(F.lit("unknown op: "), F.col("SYS_CHANGE_OPERATION"))
            )
        )
    )
    values_entries: list = []
    for c in data_cols:
        values_entries.append(F.lit(c))
        values_entries.append(F.col(c).cast("string"))
    dml = scan.select(
        op.alias("op_type"),
        F.lit(ti.table_id).alias("table"),
        F.array(*[F.lit(pk) for pk in ti.primary_keys]).alias("primary_keys"),
        F.lit(rows_schema_json).alias("rows_schema"),
        F.map_filter(
            F.create_map(*values_entries), lambda _, v: v.isNotNull()
        ).alias("rows_values"),
        F.col("SYS_CHANGE_VERSION").cast("bigint").alias("change_tracking_version"),
        F.unix_micros(F.col("CDC_CURRENT_TIMESTAMP").cast("timestamp")).alias(
            "cdc_current_timestamp"
        ),
    )
    return wrap_dml(dml)


def schema_announcement(
    spark: SparkSession, ti: TableInformation, schema_json: str
) -> DataFrame:
    """T2 analog (``ResultSetToDDLRecord.java:44-50``): one DDL record
    carrying the table's full current schema."""
    df = spark.createDataFrame(
        [(ti.table_id, schema_json)], "table string, schema string"
    )
    return wrap_ddl(df)


# ---------------------------------------------------------------------------
# The polling source driver loop (S1). Requires a reachable JDBC URL —
# not exercised in the offline test container, but the loop itself is
# just composition of the tested pieces above.
# ---------------------------------------------------------------------------


@dataclass
class CTPollingSource:
    """Driver-side polling loop: each call to ``poll_batch`` advances
    the tracking offset and returns one micro-batch of change records
    (DDL announcements first, then DML — the explicit ordering the
    reference gets implicitly from union order,
    ``CTInputDStream.java:128-133``).

    Unlike the reference's 1-partition JdbcRDD, ``num_partitions``
    splits the version range into parallel JDBC reads
    (``partitionColumn=SYS_CHANGE_VERSION``).
    """

    url: str
    properties: dict = field(default_factory=dict)
    max_batch: int = 100_000
    num_partitions: int = 8
    tracking_offset: int = 0
    # ST3 retry window (CTSQLServerConfig.java:42,148-150 — default -1):
    # 0 fails on the first error; a positive value keeps polling through
    # transient source failures, emitting empty batches, until the
    # failure streak outlasts this many seconds; negative tolerates
    # exactly one failing tick.
    max_retry_seconds: int = -1
    clock: Callable[[], float] = time.monotonic
    _failure_start: float | None = field(default=None, init=False, repr=False)

    def _jdbc_query(self, spark: SparkSession, sql: str, *, partitioned_on: str | None = None,
                    lower: int = 0, upper: int = 0) -> DataFrame:
        """Single-partition reads push ``sql`` via the ``query`` option
        (the reference's exact statement, ORDER BY included). The
        partitioned path CANNOT: Spark's JDBC source rejects ``query``
        + ``partitionColumn`` outright (JDBCOptions.scala: "Options
        'query' and 'partitionColumn' can not be specified together"),
        so the statement ships as a ``dbtable`` derived-table alias —
        the caller must pass ORDER-BY-free SQL there (SQL Server
        refuses ORDER BY in a derived table; see change_scan_sql)."""
        reader = spark.read.format("jdbc")
        for k, v in self.reader_options(
            sql, partitioned_on=partitioned_on, lower=lower, upper=upper
        ).items():
            reader = reader.option(k, v)
        return reader.load()

    def reader_options(
        self, sql: str, *, partitioned_on: str | None = None,
        lower: int = 0, upper: int = 0,
    ) -> dict:
        """The exact JDBC reader options a scan uses — separated from
        the load() so the query/dbtable routing is unit-testable
        without a live server."""
        opts = {"url": self.url, **self.properties}
        if partitioned_on and upper > lower and self.num_partitions > 1:
            opts.update(
                dbtable=f"({sql}) AS __ct_scan",
                partitionColumn=partitioned_on,
                lowerBound=lower,
                upperBound=upper,
                numPartitions=self.num_partitions,
            )
        else:
            opts["query"] = sql
        return opts

    def current_version(self, spark: SparkSession) -> int:
        row = self._jdbc_query(spark, current_version_sql()).collect()[0]
        return int(row[0])

    def poll_batch(
        self, spark: SparkSession, tables: Sequence[TableInformation]
    ) -> DataFrame | None:
        """One micro-batch: DDL probe + change scan per CT-enabled
        table, unioned DDL-first. Returns None when no new changes."""
        cur = clamp_version(
            self.tracking_offset, self.current_version(spark), self.max_batch
        )
        if cur <= self.tracking_offset:
            return None
        parts: list[DataFrame] = []
        for ti in tables:
            probe = self._jdbc_query(spark, ddl_probe_sql(ti))
            schema_json = probe.schema.json()
            parts.append(schema_announcement(spark, ti, schema_json))
        for ti in tables:
            # partitioned reads ship as a derived table, which cannot
            # carry ORDER BY (see change_scan_sql/_jdbc_query); the
            # single-partition fallback keeps the reference's ordered
            # statement verbatim
            parallel = self.num_partitions > 1 and cur > self.tracking_offset
            scan = self._jdbc_query(
                spark,
                change_scan_sql(
                    ti, self.tracking_offset, cur, ordered=not parallel
                ),
                partitioned_on="SYS_CHANGE_VERSION",
                lower=self.tracking_offset,
                upper=cur,
            )
            # rows_schema is the DATA schema — the CT metadata columns
            # (version/op/timestamp) ride the envelope's own fields,
            # never the row payload, exactly as the reference's
            # DMLRecord schema excludes them
            # (ResultSetToDMLRecord.java:56-113). Passing the raw scan
            # schema here would register tables with three phantom
            # always-NULL columns on the create path.
            from pyspark.sql.types import StructType as _ST

            data_schema = _ST(
                [f for f in scan.schema.fields if f.name not in _CT_META]
            )
            parts.append(
                ct_scan_to_change_records(scan, ti, data_schema.json())
            )
        self.tracking_offset = cur
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- ST3: transient-failure retry window ------------------------
    def _should_fail(self) -> bool:
        """Reference formula (CTInputDStream.java:91-94): retry
        disabled (0) fails immediately; otherwise fail only once the
        current failure streak has outlasted ``max_retry_seconds``."""
        if self.max_retry_seconds == 0:
            return True
        return (
            self._failure_start is not None
            and self.clock() - self._failure_start > self.max_retry_seconds
        )

    def compute(
        self, spark: SparkSession, tables: Sequence[TableInformation]
    ) -> DataFrame | None:
        """One DStream-style tick with the reference's failure policy
        (``CTInputDStream.java:73-98``): a transient source failure is
        swallowed into an EMPTY batch (None) and the poll loop keeps
        going — the offset does not advance, so the next tick re-reads
        the same version range — until failures have persisted past
        ``max_retry_seconds``, at which point the error propagates.

        One deliberate deviation: the reference never clears
        ``isFailing`` after a successful batch, so a recovered stream
        fails instantly on its NEXT transient error (the stale
        ``failureStartTime`` makes ``shouldFail`` true no matter how
        long ago the old streak was). Here a success closes the
        window: each new failure streak gets the full retry budget."""
        try:
            batch = self.poll_batch(spark, tables)
        except Exception:
            if self._should_fail():
                raise
            if self._failure_start is None:
                self._failure_start = self.clock()
            logging.getLogger(__name__).warning(
                "CT poll failed; retrying next interval (window %ss)",
                self.max_retry_seconds,
                exc_info=True,
            )
            return None
        self._failure_start = None
        return batch
