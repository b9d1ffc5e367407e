"""Streaming ingestion (SURVEY §2.9 T1/S12/S13).

Reference path: Kafka topic ``sales_txn`` -> Snowflake sink connector ->
``RAW_DB.SALES.TXN_STREAM`` (at-least-once, buffered 10 s / 10 k rows /
5 MB — ``snowflake_sink_connector.json:15-20``).

Spark-native: ``readStream`` (Kafka in production, file/json in tests —
same DataFrame transform either way) -> ``from_json`` with the datagen
schema (``streaming_kafka_datagen.py:93-102``) -> typed, upper-cased
append via ``writeStream`` with checkpointing. Checkpointed micro-batches
give exactly-once into the table — deliberately stronger than the
connector's at-least-once (documented divergence, SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalar import parse_ts

#: Kafka message schema (lower-case keys, streaming_kafka_datagen.py:93-102)
TXN_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("txn_id", T.StringType()),
        T.StructField("txn_date", T.StringType()),
        T.StructField("txn_quantity", T.IntegerType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("product_unit_price", T.DoubleType()),
        T.StructField("product_desc", T.StringType()),
        T.StructField("payment_method", T.StringType()),
    ]
)


def parse_txn_stream(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON message payload -> typed, upper-cased TXN rows.

    The ``txn_date`` string uses the stream's 12-hour-with-microseconds
    format (``MM/dd/yyyy hh:mm:ss.SSSSSS a``); output column names are
    upper-cased to align with the history feed for downstream union
    (the dynamic-table input, T3).
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), TXN_STREAM_SCHEMA).alias("j")
    ).select("j.*")
    return parsed.select(
        F.col("txn_id").alias("TXN_ID"),
        parse_ts("txn_date", "stream").alias("TXN_DATE"),
        F.col("txn_quantity").alias("TXN_QUANTITY"),
        F.col("customer_id").alias("CUSTOMER_ID"),
        F.col("product_id").alias("PRODUCT_ID"),
        F.col("product_unit_price").alias("PRODUCT_UNIT_PRICE"),
        F.col("product_desc").alias("PRODUCT_DESC"),
        F.col("payment_method").alias("PAYMENT_METHOD"),
    )


def kafka_source_options(
    brokers: str,
    topic: str = "sales_txn",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> dict[str, str]:
    """The Kafka reader option contract (S12), as data so it is testable
    without a broker: the option-contract unit test pins this surface
    (no container broker exists, so the prod path would otherwise rot
    silently).

    ``maxOffsetsPerTrigger`` bounds each micro-batch — without it the
    first batch after downtime reads the ENTIRE backlog into one batch
    (the classic streaming-restart OOM at scale).
    """
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "sales_txn",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """Production source: Kafka (S12). Requires the spark-sql-kafka
    package on the cluster; tests use :func:`read_json_file_stream`
    (identical downstream plan)."""
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_source_options(
                brokers, topic, starting_offsets, max_offsets_per_trigger
            )
        )
        .load()
    )


def read_json_file_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """Test/replay source: a directory of JSON-lines message dumps, one
    message per line in a ``value`` string column (the Kafka-equivalent
    shape)."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "16")
        .load(src_dir)
        .withColumnRenamed("value", "value")
    )


def ingest_txn_stream(
    raw_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    processing_time: str | None = None,
):
    """Parsed stream -> parquet table sink.

    ``processing_time="10 seconds"`` mirrors the connector's flush cadence
    (S13); ``None`` uses ``availableNow`` — drain everything pending, then
    stop (the task-DAG cadence pattern, T4)."""
    writer = (
        parse_txn_stream(raw_stream)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_pdf_binary_stream(
    spark: SparkSession,
    src_dir: str,
    glob: str = "*.pdf",
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Streaming twin of ``sources.batch.read_binary_dir`` (S4): a
    ``binaryFile`` readStream over a landing directory — the
    directory-stage auto-refresh analog (reference
    ``1_env_setup.sql:25-27``: a stage whose directory table refreshes
    as PDFs arrive). Spark's file-source checkpoint is the refresh
    ledger: each drain picks up exactly the files not yet delivered.

    ``max_files_per_trigger`` bounds micro-batch width so one drain of
    a large backlog becomes several bounded batches (at 100 TB: the
    extract UDF's memory is per-batch, and a crash loses one bounded
    batch of work, not the backlog)."""
    # streaming sources refuse schema inference; binaryFile's schema
    # is fixed by the format, so state it
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(src_dir)
    )


def stream_pdf_ingest(
    spark: SparkSession,
    src_dir: str,
    table,
    checkpoint: str,
    app_id: str = "pdf_ingest",
    strict: bool = False,
    max_files_per_trigger: int = 64,
    processing_time: str | None = None,
):
    """Always-on PDF ingest: binaryFile stream -> Arrow PDF->text UDF
    (U1) -> the INVOICE_DETAILS parse cascade (``3BC`` semantics) ->
    exactly-once lakehouse appends. The full reference ingest path
    (``3B1_pdf_to_text_udf.sql`` + ``3BC_create_raw_pdf_text_view``)
    as ONE streaming pipeline instead of stage-refresh + view.

    The extract+parse chain runs INSIDE each micro-batch (the sink's
    ``transform`` seam): pandas-UDF extraction and the per-batch
    EXTRACT_OK join need batch semantics, and a checkpoint-replayed
    batch skips the UDF entirely. ``strict=False`` default: one
    corrupt landing PDF yields NULL amounts, never a dead stream.

    Returns the StreamingQuery (``processing_time=None`` ->
    availableNow: drain pending PDFs, then stop — call per tick)."""
    from ..operators.unstructured import extract_pdf_text
    from ..plans.curate import parse_invoice_text
    from .lakehouse_sink import write_stream_to_snapshot_table

    def _extract_parse(batch_df: DataFrame) -> DataFrame:
        txt = extract_pdf_text(batch_df).localCheckpoint(eager=True)
        return parse_invoice_text(
            txt.select("RELATIVE_PATH", "PDF_TEXT"), strict=strict
        ).join(txt.select("RELATIVE_PATH", "EXTRACT_OK"), "RELATIVE_PATH")

    return write_stream_to_snapshot_table(
        read_pdf_binary_stream(
            spark, src_dir, max_files_per_trigger=max_files_per_trigger
        ),
        table,
        app_id,
        checkpoint,
        processing_time=processing_time,
        transform=_extract_parse,
    )
