"""summit_23_snowpark_data_lake_workloads_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities demonstrated by the reference repo
``sfc-gh-pneedleman/SUMMIT_23_snowpark_data_lake_workloads`` (a Snowpark
medallion ELT pipeline: Ingest -> Raw -> Processed -> Curated -> Consume).

Architecture: thin, well-tested PySpark library. All relational work is
declared through the DataFrame / Spark SQL API so Catalyst owns pushdown,
pruning, join strategy and AQE; Python only orchestrates. Pandas UDFs
(Arrow-batched) are reserved for genuinely non-relational steps (PDF text
extraction, multimodal decode).

Layout:
- ``session``   — SparkSession factory (AQE on, Arrow on, UTC).
- ``sources``   — batch loaders (parquet/JSON/binaryFile), catalog bootstrap.
- ``functions`` — scalar/text/vector column helpers (all built on
  ``pyspark.sql.functions``; JVM-side, codegen-friendly).
- ``operators`` — composite relational operators: window dedup, top-k,
  near-duplicate detection (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  similarity search, multimodal plumbing.
- ``plans``     — the declared query workload (``plans.queries``), matching
  DuckDB oracle SQL (``plans.oracles``), reference-pipeline curation steps
  (``plans.curate``) and the task-DAG runner (``plans.dag``).
- ``streaming`` — Structured Streaming ingestion + incremental maintenance.
"""

__version__ = "0.1.0"
