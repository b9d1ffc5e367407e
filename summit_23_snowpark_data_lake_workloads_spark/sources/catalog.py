"""Catalog bootstrap (SURVEY §1.1): the reference's four databases
(RAW / PROCESSED / CURATED / COMMON, ``1_env_setup.sql:7-14``,
``01_setup.sql:5-16``) as Spark catalog namespaces over managed parquet
tables.

Scale notes: managed tables live under ``spark.sql.warehouse.dir`` —
one directory tree per database; partitioned writes (``partition_by``)
give partition pruning on the read side (the analog of Snowflake
micro-partition pruning, R5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: medallion namespaces (COMMON holds shared helpers; no tables here)
MEDALLION_DATABASES = ["raw", "processed", "curated"]


def bootstrap_catalog(spark: SparkSession) -> None:
    """CREATE DATABASE IF NOT EXISTS for each medallion layer."""
    for db in MEDALLION_DATABASES:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")


def save_table(
    df: DataFrame,
    qualified_name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> None:
    """S9 sink: ``df.write.mode(...).saveAsTable`` with optional
    partitioning/bucketing.

    - ``partition_by``: low-cardinality query filters (e.g. a date) so
      scans prune directories (R5).
    - ``bucket_by=(n, cols)``: hash-bucket on the recurring join key —
      two tables bucketed the same way join WITHOUT a shuffle (the
      write-once-shuffle-never pattern for the 500M-row fact ⋈ 50M-row
      dim joins the reference runs hourly).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(qualified_name)


def create_view(spark: SparkSession, name: str, sql: str) -> None:
    """S10 sink: named view over a query (``3BC_create_raw_pdf_text_view``)."""
    spark.sql(f"CREATE OR REPLACE VIEW {name} AS {sql}")
