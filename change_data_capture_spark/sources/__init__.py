"""Change-feed sources.

- ``jdbc_ct``: SQL Server Change Tracking polling source — the pushdown
  SQL generators (SURVEY.md §2.1 S1-S4, §2.2 P1-P7) plus the
  scan-result → change-record normalization, testable without a live
  database.
- ``kafka``: GoldenGate-style Kafka source surface (S5) — offset
  resolution (ST4), rate caps (ST5), and the message classifier /
  fingerprint registry (T6/ST2) over a JSON wrapper encoding.
- ``changelog`` (package root): file/memory changelog streams used by
  tests and the bench harness (S6).
"""

from . import canal, jdbc_ct, kafka  # noqa: F401
