"""Sources: JDBC CT pushdown SQL generation (S2-S4, P1-P7), CT scan
normalization, Kafka offset resolution (ST4), and the GoldenGate
JSON-wrapper decode path (T6/T7/ST2)."""

import json

import pytest
from pyspark.sql import functions as F

from change_data_capture_spark.sources import jdbc_ct, kafka
from change_data_capture_spark.sources.jdbc_ct import TableInformation

TI = TableInformation(
    schema_name="dbo",
    name="accounts",
    columns=("id", "region", "name", "balance"),
    primary_keys=("id", "region"),
)


class TestCTSQL:
    def test_value_columns_exclude_pks(self):
        assert TI.value_columns == ("name", "balance")

    def test_change_scan_sql_shape(self):
        sql = jdbc_ct.change_scan_sql(TI, 10, 20)
        # P1: right outer join on every PK column, AND-ed
        assert "RIGHT OUTER JOIN CHANGETABLE(CHANGES [dbo].[accounts], 10)" in sql
        assert "CT.[id] = CI.[id] AND CT.[region] = CI.[region]" in sql
        # P2: incremental range
        assert "CT.SYS_CHANGE_VERSION > 10 AND CT.SYS_CHANGE_VERSION <= 20" in sql
        # P3: total order by version
        assert sql.endswith("ORDER BY CT.SYS_CHANGE_VERSION")
        # P4: PKs from CT, value columns from the base row
        assert "SELECT CT.[id], CT.[region], CI.[name], CI.[balance]," in sql

    def test_unordered_scan_sql_for_partitioned_reads(self):
        """The partitioned read wraps the scan as a derived table
        (Spark forbids query+partitionColumn), and SQL Server rejects
        ORDER BY inside a derived table — so the unordered variant
        must differ from the ordered one ONLY by the trailing clause."""
        ordered = jdbc_ct.change_scan_sql(TI, 10, 20)
        unordered = jdbc_ct.change_scan_sql(TI, 10, 20, ordered=False)
        assert "ORDER BY" not in unordered
        assert ordered == unordered + " ORDER BY CT.SYS_CHANGE_VERSION"

    def test_reader_options_route_partitioned_scans_through_dbtable(self):
        """Spark's JDBC source hard-rejects the `query` option together
        with `partitionColumn` (JDBCOptions.scala: "Options 'query' and
        'partitionColumn' can not be specified together") — the
        partition-parallel CT scan, this source's headline improvement
        over the reference's 1-partition JdbcRDD
        (CTInputDStream.java:166-167), must therefore ship as a
        dbtable derived-table alias. Caught by the r7 review pass: the
        old code passed query+partitionColumn and would have thrown on
        the first real poll."""
        src = jdbc_ct.CTPollingSource(url="jdbc:sqlserver://h;databaseName=d",
                                      num_partitions=8)
        sql = jdbc_ct.change_scan_sql(TI, 10, 20, ordered=False)
        opts = src.reader_options(sql, partitioned_on="SYS_CHANGE_VERSION",
                                  lower=10, upper=20)
        assert "query" not in opts
        assert opts["dbtable"] == f"({sql}) AS __ct_scan"
        assert opts["partitionColumn"] == "SYS_CHANGE_VERSION"
        assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == (10, 20, 8)

        # single-partition config keeps the reference's exact ordered
        # statement via `query` (no wrapping, ORDER BY allowed)
        src1 = jdbc_ct.CTPollingSource(url="jdbc:x", num_partitions=1)
        opts1 = src1.reader_options(jdbc_ct.change_scan_sql(TI, 10, 20),
                                    partitioned_on="SYS_CHANGE_VERSION",
                                    lower=10, upper=20)
        assert "dbtable" not in opts1 and "partitionColumn" not in opts1
        assert opts1["query"].endswith("ORDER BY CT.SYS_CHANGE_VERSION")

        # an empty/degenerate range never partitions
        opts0 = src.reader_options("SELECT CHANGE_TRACKING_CURRENT_VERSION()")
        assert "partitionColumn" not in opts0 and "query" in opts0

    def test_batch_clamp(self):
        assert jdbc_ct.clamp_version(100, 5000, max_batch=1000) == 1100
        assert jdbc_ct.clamp_version(100, 150, max_batch=1000) == 150

    def test_catalog_sqls(self):
        assert "sys.change_tracking_tables" in jdbc_ct.ct_enabled_tables_sql()
        assert "PRIMARY KEY" in jdbc_ct.primary_keys_sql("dbo", "accounts")
        assert jdbc_ct.current_version_sql() == "SELECT CHANGE_TRACKING_CURRENT_VERSION()"
        assert "DB_ID" in jdbc_ct.ct_enabled_database_sql()
        assert jdbc_ct.ddl_probe_sql(TI) == "SELECT TOP 1 * FROM [dbo].[accounts] WITH (NOLOCK)"


class TestCTScanNormalize:
    def test_scan_to_change_records(self, spark):
        scan = spark.createDataFrame(
            [
                (1, "eu", "alice", 10.0, 11, "I", "2024-01-01 00:00:01"),
                (2, "us", "bob", 20.0, 12, "U", "2024-01-01 00:00:02"),
                (3, "eu", None, None, 13, "D", "2024-01-01 00:00:03"),
            ],
            "id int, region string, name string, balance double, "
            "SYS_CHANGE_VERSION long, SYS_CHANGE_OPERATION string, "
            "CDC_CURRENT_TIMESTAMP string",
        )
        out = jdbc_ct.ct_scan_to_change_records(scan, TI, "{}")
        rows = {r["dml"]["rows_values"]["id"]: r["dml"] for r in out.collect()}
        assert rows["1"]["op_type"] == "INSERT"
        assert rows["2"]["op_type"] == "UPDATE"
        assert rows["3"]["op_type"] == "DELETE"
        # delete carries PKs only (null value columns filtered from the map)
        assert set(rows["3"]["rows_values"]) == {"id", "region"}
        assert rows["1"]["primary_keys"] == ["id", "region"]
        assert rows["2"]["change_tracking_version"] == 12
        assert rows["1"]["table"] == "dbo.accounts"

    def test_unknown_op_fails(self, spark):
        scan = spark.createDataFrame(
            [(1, "eu", "x", 1.0, 1, "X", "2024-01-01 00:00:00")],
            "id int, region string, name string, balance double, "
            "SYS_CHANGE_VERSION long, SYS_CHANGE_OPERATION string, "
            "CDC_CURRENT_TIMESTAMP string",
        )
        out = jdbc_ct.ct_scan_to_change_records(scan, TI, "{}")
        with pytest.raises(Exception, match="unknown op"):
            out.collect()


class TestKafkaSurface:
    def test_offset_resolution(self):
        assert kafka.resolve_starting_offsets("t", kafka.EARLIEST) == "earliest"
        assert kafka.resolve_starting_offsets("t", kafka.LATEST) == "latest"
        assert json.loads(kafka.resolve_starting_offsets("t", 42)) == {"t": {"0": 42}}
        with pytest.raises(ValueError):
            kafka.resolve_starting_offsets("t", -5)

    def test_option_map(self):
        opts = kafka.kafka_options("b:9092", "gg", initial_offset=7, max_rate_per_partition=500)
        assert opts["subscribe"] == "gg"
        assert opts["maxOffsetsPerTrigger"] == "500"
        assert json.loads(opts["startingOffsets"]) == {"gg": {"0": 7}}
        # 0 = unlimited (reference GoldenGateKafkaConfig.java:96)
        assert "maxOffsetsPerTrigger" not in kafka.kafka_options("b", "t", max_rate_per_partition=0)


def _msg(**kw):
    return (json.dumps(kw),)


class TestGoldenGateDecode:
    def test_end_to_end_decode(self, spark):
        schema_json = (
            '{"type":"struct","fields":['
            '{"name":"id","type":"integer","nullable":false,"metadata":{}},'
            '{"name":"v","type":"string","nullable":true,"metadata":{}}]}'
        )
        msgs = spark.createDataFrame(
            [
                _msg(kind="notice", table="x"),  # dropped (T10)
                _msg(kind="schema", fingerprint=99, table="ns.t", schema=schema_json, version=1),
                _msg(kind="dml", table="ns.t", fingerprint=99, op_type="I",
                     primary_keys=["id"], before=None, after={"id": "1", "v": "a"},
                     version=2, ts_micros=1000),
                # PK-update: splits into DELETE(before) + INSERT(after)
                _msg(kind="dml", table="ns.t", fingerprint=99, op_type="U",
                     primary_keys=["id"], before={"id": "1", "v": "a"},
                     after={"id": "2", "v": "a"}, version=3, ts_micros=2000),
                # value-only update: images merge, after wins
                _msg(kind="dml", table="ns.t", fingerprint=99, op_type="U",
                     primary_keys=["id"], before={"id": "2", "v": "a"},
                     after={"id": "2", "v": "b"}, version=4, ts_micros=3000),
            ],
            "message string",
        )
        out = kafka.goldengate_changelog(msgs)
        recs = sorted(
            (r["dml"]["change_tracking_version"], r["dml"]["op_type"],
             dict(r["dml"]["rows_values"]), r["dml"]["rows_schema"])
            for r in out.collect()
        )
        assert [(v, op, rv) for v, op, rv, _ in recs] == [
            (2, "INSERT", {"id": "1", "v": "a"}),
            (3, "DELETE", {"id": "1", "v": "a"}),
            (3, "INSERT", {"id": "2", "v": "a"}),
            (4, "UPDATE", {"id": "2", "v": "b"}),
        ]
        # every DML resolved its schema through the fingerprint registry
        assert all(rs == schema_json for _, _, _, rs in recs)

    def test_registry_last_wins(self, spark):
        msgs = spark.createDataFrame(
            [
                _msg(kind="schema", fingerprint=1, table="ns.t", schema="s_old", version=1),
                _msg(kind="schema", fingerprint=1, table="ns.t", schema="s_new", version=5),
            ],
            "message string",
        )
        reg = kafka.schema_registry(kafka.classify_messages(msgs)).collect()
        assert len(reg) == 1 and reg[0]["schema"] == "s_new"


class _FakeCTSource(jdbc_ct.CTPollingSource):
    """CTPollingSource with the JDBC round-trip replaced by canned
    DataFrames: a scripted source version plus a connection that can be
    told to fail for the next N calls. Everything else — clamping,
    offset advancement, DDL-before-DML union, retry window — is the
    real code under test."""

    def __init__(self, spark, *, version=5, **kw):
        super().__init__(url="jdbc:fake", **kw)
        self._spark = spark
        self.source_version = version
        self.fail_next = 0
        self.jdbc_calls = 0

    def _jdbc_query(self, spark, sql, *, partitioned_on=None, lower=0, upper=0):
        self.jdbc_calls += 1
        if self.fail_next > 0:
            self.fail_next -= 1
            raise ConnectionError("transient: source unreachable")
        if sql == jdbc_ct.current_version_sql():
            return spark.createDataFrame([(self.source_version,)], "v long")
        if sql.startswith("SELECT TOP 1"):
            return spark.createDataFrame(
                [], "id int, region string, name string, balance double"
            )
        assert "CHANGETABLE" in sql
        return spark.createDataFrame(
            [(1, "eu", "alice", 10.0, upper, "I", "2024-01-01 00:00:01")],
            "id int, region string, name string, balance double, "
            "SYS_CHANGE_VERSION long, SYS_CHANGE_OPERATION string, "
            "CDC_CURRENT_TIMESTAMP string",
        )


class TestRetryWindow:
    """ST3 parity: the poll loop survives transient source failures with
    empty batches, keeps offsets unchanged across the gap, and fails
    only once the failure streak outlasts max_retry_seconds
    (CTInputDStream.java:58-60, 73-98)."""

    def test_transient_failure_emits_empty_batch_and_holds_offset(self, spark):
        src = _FakeCTSource(spark, max_retry_seconds=3600)
        src.fail_next = 2
        assert src.compute(spark, [TI]) is None
        assert src.compute(spark, [TI]) is None
        assert src.tracking_offset == 0  # offset untouched across the gap

        batch = src.compute(spark, [TI])  # recovered
        assert batch is not None
        assert src.tracking_offset == 5  # resumes from the held offset
        ops = batch.filter(F.col("dml").isNotNull()).select("dml.op_type").collect()
        assert [r["op_type"] for r in ops] == ["INSERT"]

    def test_fails_after_window_elapses(self, spark):
        t = [0.0]
        src = _FakeCTSource(spark, max_retry_seconds=10, clock=lambda: t[0])
        src.fail_next = 100
        assert src.compute(spark, [TI]) is None  # opens the window at t=0
        t[0] = 5.0
        assert src.compute(spark, [TI]) is None  # still inside
        t[0] = 11.0
        with pytest.raises(ConnectionError):
            src.compute(spark, [TI])  # streak outlasted the window

    def test_zero_window_fails_immediately(self, spark):
        src = _FakeCTSource(spark, max_retry_seconds=0)
        src.fail_next = 1
        with pytest.raises(ConnectionError):
            src.compute(spark, [TI])

    def test_success_reopens_the_window(self, spark):
        """Deviation from the reference (which never clears isFailing):
        a successful batch must give the NEXT failure streak the full
        retry budget, not the stale failureStartTime."""
        t = [0.0]
        src = _FakeCTSource(spark, max_retry_seconds=10, clock=lambda: t[0])
        src.fail_next = 1
        assert src.compute(spark, [TI]) is None
        assert src.compute(spark, [TI]) is not None  # recovery at t=0
        t[0] = 100.0  # far past the old window
        src.source_version = 50
        src.fail_next = 1
        assert src.compute(spark, [TI]) is None  # fresh streak: swallowed
        assert src.tracking_offset == 5

    def test_no_new_changes_is_not_a_failure(self, spark):
        src = _FakeCTSource(spark, version=0, max_retry_seconds=0)
        assert src.compute(spark, [TI]) is None
        assert src.tracking_offset == 0


class TestKafkaOptionParity:
    """Checklist parity with the reference's full config surface
    (GoldenGateKafkaConfig.java:40-97) — every reference option has a
    translated Structured Streaming option, with the reference's
    defaults. The README 'live broker' section documents the mapping;
    this test keeps code and doc from drifting."""

    def test_every_reference_option_is_mapped(self):
        opts = kafka.kafka_options("b1:9092,b2:9092", "ogg")
        # broker (Config:40-43) -> bootstrap.servers
        assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
        # topic (Config:45-48) -> subscribe
        assert opts["subscribe"] == "ogg"
        # defaultInitialOffset (Config:50-56): reference default -1 = latest
        assert opts["startingOffsets"] == "latest"
        # maxRatePerPartition (Config:58-62): reference default 1000
        assert opts["maxOffsetsPerTrigger"] == "1000"

    def test_rate_zero_means_unlimited(self):
        # Config:59 '0 means there is no limit' -> option omitted entirely
        opts = kafka.kafka_options("b:9092", "t", max_rate_per_partition=0)
        assert "maxOffsetsPerTrigger" not in opts

    def test_offset_wire_values(self):
        # GoldenGateKafka.loadOffsets:142-169 wire values
        assert kafka.resolve_starting_offsets("t", kafka.EARLIEST) == "earliest"
        assert kafka.resolve_starting_offsets("t", kafka.LATEST) == "latest"
        assert kafka.resolve_starting_offsets("t", 5) == '{"t": {"0": 5}}'
        with pytest.raises(ValueError):
            kafka.resolve_starting_offsets("t", -3)


def test_goldengate_dead_letters_classify_dropped_messages(spark):
    """r8 quarantine parity for the GoldenGate wrapper wire: the
    messages classify_messages/goldengate_changelog drop land in a
    reasoned DLQ — wrapper notices (expected chatter, countable),
    unparseable junk, and versionless DMLs — and decode + DLQ
    partition the feed exactly."""
    import json

    from change_data_capture_spark.sources.kafka import (
        classify_messages,
        goldengate_dead_letters,
    )

    msgs = [
        json.dumps({"kind": "schema", "fingerprint": 1, "table": "t",
                    "schema": "{}", "version": 1}),
        json.dumps({"kind": "dml", "fingerprint": 1, "table": "t",
                    "op_type": "I", "primary_keys": ["id"],
                    "after": {"id": "1"}, "version": 5, "ts_micros": 0}),
        json.dumps({"kind": "notice", "table": "t"}),
        "complete garbage {",
        json.dumps({"kind": "dml", "fingerprint": 1, "table": "t",
                    "op_type": "I", "primary_keys": ["id"],
                    "after": {"id": "2"}, "ts_micros": 0}),  # no version
    ]
    raw = spark.createDataFrame([(m,) for m in msgs], "message string")
    kept = classify_messages(raw).count()
    dlq = goldengate_dead_letters(raw).collect()
    reasons = sorted(r.reason for r in dlq)
    assert reasons == ["missing_version", "unparseable", "wrapper_notice"]
    # the versionless dml passes classify (kind=dml) but is dropped by
    # the changelog's version rule — DLQ'd here; the other two DLQ rows
    # plus the classified keep-set partition the feed
    assert kept == 3 and len(dlq) == 3
    assert kept + len(dlq) - 1 == len(msgs)  # the versionless dml counted once each side
