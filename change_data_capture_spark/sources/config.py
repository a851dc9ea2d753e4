"""Deploy-time config validation for the CT and GoldenGate sources.

Mirrors the reference's fail-fast config surface — every rule below is
enforced before any connection is attempted, exactly like the
reference's ``validate()`` overrides that its negative deployment
tests exercise (``CTSQLServerPluginIntegrationTest.java:116-154``):

- SQL Server CT source (``source/sqlserver/CTSQLServerConfig.java:173-197``):
  custom JDBC driver requires an explicit connection string; database
  name required; hostname+port required unless a connection string is
  given; port in [0, 65535]. Defaults: max batch 100000
  (``:152-154``), comma-split trimmed table whitelist (``:156-159``),
  ``jdbc:sqlserver://host:port;DatabaseName=db`` connection string
  (``:166-171``).
- GoldenGate Kafka source (``source/oracle/GoldenGateKafkaConfig.java:103-129``):
  broker required and of the form host:port; topic required; initial
  offset in {-2, -1} or >= 0; max rate per partition >= 0. Defaults:
  initial offset -1 (latest), rate 1000 (``:90-97``).
- Single-partition topic check (``GoldenGateKafka.java:177-194``): the
  reference hard-requires one partition for total order. Here it is a
  compat-mode assertion only — this engine restores order downstream
  (explicit version sort + last-writer-wins collapse), so
  multi-partition topics are the scale path, not an error.
"""

from __future__ import annotations

from collections.abc import Iterable
from dataclasses import dataclass


class InvalidConfigError(ValueError):
    """Fail-fast config rejection (the reference's
    ``InvalidConfigPropertyException``); ``property`` names the
    offending field."""

    def __init__(self, message: str, property: str):
        super().__init__(message)
        self.property = property


@dataclass(frozen=True)
class CTSQLServerConfig:
    """SQL Server CT source config (``CTSQLServerConfig.java``)."""

    db_name: str | None = None
    hostname: str | None = None
    port: int | None = None
    username: str | None = None
    password: str | None = None
    connection_string: str | None = None
    jdbc_plugin_name: str | None = None
    max_batch_size: int | None = None
    table_whitelist: str | None = None

    def validate(self) -> None:
        if self.jdbc_plugin_name is not None and self.connection_string is None:
            raise InvalidConfigError(
                "A connection string must be specified when a custom jdbc driver is used.",
                "connectionString",
            )
        if self.db_name is None:
            raise InvalidConfigError("A database name must be specified", "dbName")
        if self.connection_string is None:
            if self.hostname is None:
                raise InvalidConfigError("A hostname must be specified", "hostname")
            if self.port is None:
                raise InvalidConfigError("A port must be specified", "port")
        if self.port is not None and not (0 <= self.port <= 65535):
            raise InvalidConfigError("Port number should be in range 0-65535", "port")

    @property
    def effective_connection_string(self) -> str:
        """``CTSQLServerConfig.java:166-171``."""
        if self.connection_string is not None:
            return self.connection_string
        return f"jdbc:sqlserver://{self.hostname}:{self.port};DatabaseName={self.db_name}"

    @property
    def effective_max_batch_size(self) -> int:
        """``CTSQLServerConfig.java:152-154``."""
        return 100_000 if self.max_batch_size is None else self.max_batch_size

    @property
    def whitelist(self) -> frozenset[str]:
        """``CTSQLServerConfig.java:156-159``: comma-split, trimmed."""
        if self.table_whitelist is None:
            return frozenset()
        return frozenset(t.strip() for t in self.table_whitelist.split(","))


@dataclass(frozen=True)
class GoldenGateKafkaConfig:
    """GoldenGate Kafka source config (``GoldenGateKafkaConfig.java``)."""

    broker: str | None = None
    topic: str | None = None
    default_initial_offset: int | None = None
    max_rate_per_partition: int | None = None

    def validate(self) -> None:
        if not self.broker:
            raise InvalidConfigError("Broker address cannot be null or empty", "broker")
        host, sep, port = self.broker.rpartition(":")
        if not sep or not host or not port.isdigit():
            raise InvalidConfigError(
                f"Broker address '{self.broker}' should be in the form of 'host:port'.",
                "broker",
            )
        if not self.topic:
            raise InvalidConfigError("Topic cannot be null or empty", "topic")
        if self.default_initial_offset is not None and self.default_initial_offset < -2:
            raise InvalidConfigError(
                "'defaultInitialOffset' should be equal to -2, -1, 0 or positive number",
                "defaultInitialOffset",
            )
        if self.max_rate_per_partition is not None and self.max_rate_per_partition < 0:
            raise InvalidConfigError(
                "'maxRatePerPartition' should be equal to 0 or positive number",
                "maxRatePerPartition",
            )

    @property
    def host(self) -> str:
        return (self.broker or "").rpartition(":")[0]

    @property
    def port(self) -> int:
        return int((self.broker or "").rpartition(":")[2])

    @property
    def effective_initial_offset(self) -> int:
        """``GoldenGateKafkaConfig.java:90-92``: default -1 (latest)."""
        return -1 if self.default_initial_offset is None else self.default_initial_offset

    @property
    def effective_max_rate(self) -> int:
        """``GoldenGateKafkaConfig.java:94-97``: default 1000."""
        return 1000 if self.max_rate_per_partition is None else self.max_rate_per_partition


def require_single_partition(topic: str, partitions: Iterable[int]) -> int:
    """Reference-compat assertion (``GoldenGateKafka.java:177-194``):
    the topic must have exactly one partition. OPTIONAL here — this
    engine re-establishes order downstream (version sort +
    last-writer-wins), so only enable this check when byte-for-byte
    reference behavior is required."""
    parts = set(partitions)
    if len(parts) != 1:
        raise InvalidConfigError(
            f"Topic '{topic}' should only have one partition. "
            f"Found '{len(parts)}' partitions.",
            "topic",
        )
    return next(iter(parts))
