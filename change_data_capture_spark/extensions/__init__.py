"""Large-scale training-data-pipeline extensions.

These go beyond the reference's own operator surface (SURVEY.md §2.6
notes the reference has no analytics/dedup/similarity operators): the
operations a 100 TB LLM-data pipeline needs over document and
embedding tables — deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), approximate nearest neighbours,
text analysis (language id, quality scores, token stats,
fingerprints), and multimodal-column plumbing.

Design rule: everything is built from JVM-side `pyspark.sql.functions`
expressions (hashing, array ops, windows) so it whole-stage-codegens;
pandas UDFs appear only where Python is genuinely required (the
multimodal decode stubs).
"""
