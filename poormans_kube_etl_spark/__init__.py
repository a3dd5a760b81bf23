"""poormans_kube_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of the reference
``UKHomeOffice/poormans-kube-etl`` (a Node.js S3→K8s ingest orchestrator,
see SURVEY.md) as an idiomatic Spark engine:

- ``sources``    — parquet/CSV.gz/binary/file-listing readers
- ``operators``  — reference-surface ops (path parsing, marker filters,
  min-by selection, duration aggregation) plus LLM-data-pipeline ops
  (dedup, similarity search, text analysis, multimodal columns)
- ``functions``  — scalar helpers (duration formatting, path segments,
  fingerprints) built on pyspark.sql.functions
- ``plans``      — explain/plan-audit helpers
- ``streaming``  — the ingest orchestrator (manifest gating, bulk/delta
  routing, cleanup, metrics) and structured-streaming variants
- ``queries``    — the registry of named queries with DuckDB oracle SQL,
  surfaced through ``__spark_entry__.py``
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
