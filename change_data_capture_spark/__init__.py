"""change_data_capture_spark — a PySpark-native change-data-capture engine.

A from-scratch rebuild of the capabilities of the reference CDC plugin
suite (`data-integrations/change-data-capture`): change-record
envelopes, changelog sources, normalization (net-change collapse,
PK-update split, DML flattening, schema-announcement dedup), and a
streaming apply/MERGE engine that materializes keyed tables with
schema evolution — expressed Spark-first on DataFrames / Structured
Streaming, not as a port of the reference's DStream/Java design.

Layer (b) adds the analytic query surface over materialized tables
(`queries.py`) and large-scale training-data-pipeline extensions
(`extensions/`): deduplication, similarity search, text analysis and
multimodal-column plumbing.
"""

__version__ = "0.1.0"
