"""Negative-path config validation — mirrors the reference's invalid-
deployment tests (CTSQLServerPluginIntegrationTest.java:116-154) and
the validate() rules of CTSQLServerConfig.java:173-197 /
GoldenGateKafkaConfig.java:103-129. No Spark session needed."""

import pytest

from change_data_capture_spark.sources.config import (
    CTSQLServerConfig,
    GoldenGateKafkaConfig,
    InvalidConfigError,
    require_single_partition,
)


class TestCTSQLServerConfig:
    def valid(self, **kw):
        base = dict(db_name="cdc", hostname="db.example.com", port=1433)
        base.update(kw)
        return CTSQLServerConfig(**base)

    def test_valid_passes(self):
        self.valid().validate()

    def test_custom_driver_requires_connection_string(self):
        with pytest.raises(InvalidConfigError) as e:
            self.valid(jdbc_plugin_name="custom").validate()
        assert e.value.property == "connectionString"

    def test_custom_driver_with_connection_string_ok(self):
        self.valid(
            jdbc_plugin_name="custom", connection_string="jdbc:foo://x"
        ).validate()

    def test_db_name_required(self):
        with pytest.raises(InvalidConfigError) as e:
            CTSQLServerConfig(hostname="h", port=1).validate()
        assert e.value.property == "dbName"

    def test_hostname_required_without_connection_string(self):
        with pytest.raises(InvalidConfigError) as e:
            CTSQLServerConfig(db_name="cdc", port=1433).validate()
        assert e.value.property == "hostname"

    def test_port_required_without_connection_string(self):
        with pytest.raises(InvalidConfigError) as e:
            CTSQLServerConfig(db_name="cdc", hostname="h").validate()
        assert e.value.property == "port"

    def test_connection_string_alone_suffices(self):
        CTSQLServerConfig(db_name="cdc", connection_string="jdbc:x").validate()

    @pytest.mark.parametrize("port", [-1, 65536, 99999])
    def test_port_range(self, port):
        with pytest.raises(InvalidConfigError) as e:
            self.valid(port=port).validate()
        assert e.value.property == "port"

    def test_effective_connection_string_default_format(self):
        c = self.valid()
        assert (
            c.effective_connection_string
            == "jdbc:sqlserver://db.example.com:1433;DatabaseName=cdc"
        )

    def test_defaults_and_whitelist(self):
        c = self.valid()
        assert c.effective_max_batch_size == 100_000
        assert c.whitelist == frozenset()
        assert self.valid(table_whitelist=" a , b,c ").whitelist == frozenset(
            {"a", "b", "c"}
        )


class TestGoldenGateKafkaConfig:
    def valid(self, **kw):
        base = dict(broker="kafka.example.com:9092", topic="ogg")
        base.update(kw)
        return GoldenGateKafkaConfig(**base)

    def test_valid_passes(self):
        c = self.valid()
        c.validate()
        assert c.host == "kafka.example.com" and c.port == 9092
        assert c.effective_initial_offset == -1
        assert c.effective_max_rate == 1000

    @pytest.mark.parametrize("broker", [None, ""])
    def test_broker_required(self, broker):
        with pytest.raises(InvalidConfigError) as e:
            self.valid(broker=broker).validate()
        assert e.value.property == "broker"

    @pytest.mark.parametrize("broker", ["nohost", "host:", ":9092", "host:notaport"])
    def test_broker_must_be_host_port(self, broker):
        with pytest.raises(InvalidConfigError) as e:
            self.valid(broker=broker).validate()
        assert e.value.property == "broker"

    @pytest.mark.parametrize("topic", [None, ""])
    def test_topic_required(self, topic):
        with pytest.raises(InvalidConfigError) as e:
            self.valid(topic=topic).validate()
        assert e.value.property == "topic"

    def test_offset_below_minus_two_rejected(self):
        with pytest.raises(InvalidConfigError) as e:
            self.valid(default_initial_offset=-3).validate()
        assert e.value.property == "defaultInitialOffset"

    @pytest.mark.parametrize("off", [-2, -1, 0, 12345])
    def test_offset_legal_values(self, off):
        self.valid(default_initial_offset=off).validate()

    def test_negative_rate_rejected(self):
        with pytest.raises(InvalidConfigError) as e:
            self.valid(max_rate_per_partition=-1).validate()
        assert e.value.property == "maxRatePerPartition"


def test_single_partition_compat_check():
    assert require_single_partition("t", [0]) == 0
    with pytest.raises(InvalidConfigError):
        require_single_partition("t", [0, 1])
    with pytest.raises(InvalidConfigError):
        require_single_partition("t", [])
