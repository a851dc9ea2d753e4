"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (TPC-H-style pricing summary) at
sf0.001; ``queries``/``oracle_sql`` expose the full operator registry
(see ``change_data_capture_spark/registry.py``) for the sf0.01
DuckDB-oracle correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from change_data_capture_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry. As of
    round 7, EVERY registry entry is hash-checked (231/231 in round
    9) — the approximate operators (SimHash, LSH/IVF/IVF-PQ ANN,
    sketches) carry exact oracles built on deterministic seeds/
    portable hashes so both engines reproduce even their misses, and
    text_compression_ratio (the last rows-only holdout) was promoted
    via zlib-format-guarantee bounds booleans."""
    return registry.oracles()
