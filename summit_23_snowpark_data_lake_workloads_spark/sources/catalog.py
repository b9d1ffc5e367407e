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

#: medallion namespaces; COMMON holds cross-cutting tables (the X3
#: log-events sink), mirroring the reference's 4th database
MEDALLION_DATABASES = ["raw", "processed", "curated", "common"]


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


def _staged_rewrite(spark: SparkSession, df: DataFrame, qualified_name: str) -> None:
    """Rewrite ``qualified_name`` with ``df``'s contents via a STAGING
    table + rename swap. A direct ``overwrite`` of a table the plan also
    READS destroys the table if anything fails between truncation and
    rewrite (localCheckpoint blocks live on executor-local storage — not
    reliable). Staging writes never touch the original until the new data
    is fully durable; the only non-atomic window is drop->rename, which
    leaves the finished staging table on disk to recover from.
    """
    staging = f"{qualified_name}__staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    df.write.mode("overwrite").saveAsTable(staging)
    spark.sql(f"DROP TABLE {qualified_name}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {qualified_name}")


def compact_table(
    spark: SparkSession, qualified_name: str, target_files: int
) -> tuple[int, int]:
    """Small-file compaction — the maintenance job every parquet lake
    needs (streaming appends and per-partition upserts accrete files;
    scan planning cost and task overhead scale with file count, and
    footer/stat pruning degrades). Rewrites the table into
    ``target_files`` files; returns (files_before, files_after).

    At 100 TB run this per partition (combine with the
    ``partition_col`` path of :func:`merge_upsert`), sized so files land
    near ``spark.sql.files.maxPartitionBytes`` (128 MB here) — the
    sweet spot where one scan task reads one file.
    """
    df = spark.table(qualified_name)
    before = len(df.inputFiles())
    _staged_rewrite(spark, df.repartition(target_files), qualified_name)
    return before, len(spark.table(qualified_name).inputFiles())


def cluster_table(
    spark: SparkSession, qualified_name: str, by_cols: list[str], n_files: int
) -> None:
    """Range-cluster a table on ``by_cols`` (Z-order's 1-D little
    sibling): repartitionByRange + sortWithinPartitions gives each
    output file a disjoint key range, so parquet min/max row-group
    stats prune file scans for range predicates on those columns —
    the Snowflake micro-partition clustering-key analog.
    """
    df = spark.table(qualified_name)
    _staged_rewrite(
        spark,
        df.repartitionByRange(n_files, *by_cols).sortWithinPartitions(*by_cols),
        qualified_name,
    )


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    target_table: str,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """Parquet-native MERGE (upsert-by-key) — the transactional-format
    gap (Delta/Iceberg ``MERGE INTO``) closed with plain parquet tables:
    matched keys are replaced by their update row, unmatched target rows
    survive, new keys insert.

    Scale strategy: plain parquet has no row-level deletes, so an upsert
    is a rewrite — the job is to BOUND the rewrite.

    - With ``partition_col`` (the table must be partitioned by it): only
      partitions present in ``updates`` are rewritten, via
      ``partitionOverwriteMode=dynamic`` — at 100 TB with daily
      partitions an incremental load rewrites days, not the table.
      Requirement: a key never changes partition (true for
      date-keyed facts); a key updated INTO a different partition would
      leave the old row in the untouched partition.
    - Without ``partition_col``: full-table rewrite (correct but O(table);
      use the partitioned form at scale).

    The non-partitioned path writes through a staging table + rename
    (:func:`_staged_rewrite`) — the original is never truncated before
    the new data is durable. The dynamic-partition path must
    ``insertInto`` the live table, so it materializes via localCheckpoint
    first; on a real cluster point ``spark.sql.checkpoint.dir`` at
    reliable storage (executor-local checkpoint blocks die with the
    executor).
    """
    target = spark.table(target_table)
    if partition_col is not None:
        touched = updates.select(partition_col).distinct()
        from pyspark.sql import functions as F

        keep = (
            target.join(F.broadcast(touched), partition_col, "left_semi")
            .join(updates.select(*key_cols), key_cols, "left_anti")
        )
        # insertInto resolves by POSITION: project to the target's order
        merged = (
            keep.unionByName(updates).select(*target.columns).localCheckpoint(eager=True)
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").insertInto(target_table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        keep = target.join(updates.select(*key_cols), key_cols, "left_anti")
        _staged_rewrite(spark, keep.unionByName(updates), target_table)
