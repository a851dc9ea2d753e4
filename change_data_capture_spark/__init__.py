"""change_data_capture_spark — a PySpark-native change-data-capture engine.

A from-scratch rebuild of the capabilities of the reference CDC plugin
suite (`data-integrations/change-data-capture`): change-record
envelopes, changelog sources, normalization (net-change collapse,
PK-update split, DML flattening, schema-announcement dedup), and a
streaming apply/MERGE engine that materializes keyed tables with
schema evolution — expressed Spark-first on DataFrames / Structured
Streaming, not as a port of the reference's DStream/Java design.

Layer (b) adds the analytic query surface over materialized tables
(`registry.py`) and large-scale training-data-pipeline extensions
(`extensions/`): deduplication, similarity search, text analysis and
multimodal-column plumbing.

Operational/governance layer: `dblog` (watermark-based chunked
snapshots of live tables), `audit` (replica consistency checksums +
bucket-targeted repair), `compat` (Confluent-semantics schema
compatibility gating), `derive` (incrementally-maintained
aggregates/joins/SCD2), and per-column profiling + drift monitors
(`extensions/profile`).
"""

__version__ = "0.1.0"
