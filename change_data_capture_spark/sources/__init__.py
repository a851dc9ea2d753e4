"""Change-feed sources.

- ``jdbc_ct``: SQL Server Change Tracking polling source — the pushdown
  SQL generators (SURVEY.md §2.1 S1-S4, §2.2 P1-P7) plus the
  scan-result → change-record normalization, testable without a live
  database.
- ``kafka``: GoldenGate-style Kafka source surface (S5) — offset
  resolution (ST4), rate caps (ST5), and the message classifier /
  fingerprint registry (T6/ST2) over a JSON wrapper encoding.
- ``avro_binary``: pure-Catalyst decoder for the GoldenGate
  generic-wrapper BINARY Avro frames (T12) — no spark-avro jar.
- ``debezium``: Debezium envelope decode/encode + dead letters +
  observed-column schema drift.
- ``wire_formats``: Maxwell and AWS DMS decode/encode + dead letters.
- ``canal``: Alibaba Canal flatMessage decode/encode + dead letters
  (multi-row ``data`` arrays with index-aligned ``old``).
- ``ddl``: binlog DDL control plane — Maxwell structured defs and
  a bounded Canal ALTER parser feeding schema evolution (gated).
- ``config``: deploy-time config validation (reference parity).
- ``changelog`` (package root): file/memory changelog streams used by
  tests and the bench harness (S6).
"""

from . import canal, jdbc_ct, kafka  # noqa: F401
