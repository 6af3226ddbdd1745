"""lambda_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference lakehouse (data-minh/lambda-lakehouse):
batch star-schema pipelines (staging contract, SCD2 dims, fact
assembly with a point-in-time join), the full scalar-function census,
partitioned writes with dynamic partition overwrite, plus the
large-scale training-data operators the reference reserves but never
built: dedup (exact/MinHash-LSH/SimHash/Jaccard), similarity search,
text analysis, and Structured Streaming.

Design notes (100 TB posture):
- Everything is declarative DataFrame/SQL — Catalyst plans the
  physical strategy; no RDDs, no driver-side loops.
- Small dimension sides are broadcast explicitly; big joins shuffle on
  their keys; AQE is on for runtime re-planning and skew handling.
- Python UDFs are avoided entirely in the hot path; the few
  non-relational operators (multimodal decode stubs) use Arrow-batched
  ``mapInPandas``.
"""

__version__ = "0.1.0"
