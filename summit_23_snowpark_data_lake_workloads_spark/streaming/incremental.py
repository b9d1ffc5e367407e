"""Incremental materialization (SURVEY §2.9 T3 — the architecture
diagram's Dynamic Table, the one inferred component).

``PROCESSED_DB.SALES.TRANSACTION`` = typed stream union typed history,
maintained continuously; consumed by the sales-enrich step on the DAG
cadence (``04_sales_enrich_sp.sql:22``). Spark-native: a Structured
Streaming query appending to the processed table, plus a watermarked
windowed rollup as the standing aggregate example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize event-time columns to plain ``TimestampType``.

    A schema-inferred source (parquet/json file stream built outside
    :func:`..sources.batch.read_table`) can deliver ``TIMESTAMP_NTZ``,
    which ``withWatermark`` rejects with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.
    The session timezone is pinned UTC, so the cast is value-preserving.
    No-op (and no plan node) when the column is already TimestampType.
    """
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if isinstance(dtypes.get(c), T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def hourly_rollup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window rollup of the event stream — the
    incremental twin of the batch ``events_hourly_rollup`` query (the
    driver's oracle checks the batch twin; the streaming test checks
    stream==batch).

    Late data beyond ``watermark`` is dropped — the late-data policy the
    reference never states (its connector just appends); making it
    explicit is the Spark-native upgrade.
    """
    return (
        ensure_event_time(events, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hourly_rollup_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`hourly_rollup_stream` (identical output
    schema) for stream-batch equivalence testing."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


TRANSACTION_COLUMNS = [
    "TXN_ID",
    "TXN_DATE",
    "TXN_QUANTITY",
    "CUSTOMER_ID",
    "PRODUCT_ID",
    "PRODUCT_DESC",
    "PRODUCT_UNIT_PRICE",
    "PAYMENT_METHOD",
]


def unified_transactions(history: DataFrame, stream_typed: DataFrame) -> DataFrame:
    """The T3 target: ``PROCESSED_DB.SALES.TRANSACTION`` = typed history
    UNION typed stream (consumed by ``04_sales_enrich_sp.sql:22``).

    History carries ``TXN_DT`` strings in the batch format; the stream is
    already typed by ``ingest.parse_txn_stream``. Both are projected onto
    one fixed column order so the union is by position AND by name.
    """
    from ..functions.scalar import parse_ts

    hist = history.withColumn("TXN_DATE", parse_ts("TXN_DATE", "history")).select(
        *TRANSACTION_COLUMNS
    )
    return hist.unionByName(stream_typed.select(*TRANSACTION_COLUMNS))


def enrich_txn_stream(stream_typed: DataFrame, customer_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: the continuous version of the sales
    enrichment's customer join (``04_sales_enrich_sp.sql:36``) — each
    micro-batch joins against the (slowly-changing) customer dimension.

    Scale: Spark re-plans the static side per micro-batch, so a
    broadcast-sized dim never shuffles the stream; derived SALES_AMT
    stays in codegen.
    """
    enriched = stream_typed.withColumn(
        "SALES_AMT", F.col("TXN_QUANTITY") * F.col("PRODUCT_UNIT_PRICE")
    )
    return enriched.join(F.broadcast(customer_dim), "CUSTOMER_ID")


def attribution_join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``horizon`` (click-to-buy attribution
    — the canonical two-stream use case).

    Both sides are watermarked and the join condition bounds event time
    in BOTH directions (purchase in [click_ts, click_ts + horizon]), so
    Spark can size the join state and evict rows as the watermark
    advances — without the time bound the state store grows forever.
    State is partitioned by the equi-key (user_id): skew-free here since
    user activity is roughly uniform; a hot key would need salting on
    the click side.

    Inputs must carry (user_id, ts, event_id); output one row per
    qualifying (click, purchase) pair.
    """
    c = ensure_event_time(
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        ),
        "click_ts",
    ).withWatermark("click_ts", watermark)
    p = ensure_event_time(
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        ),
        "purchase_ts",
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within
    the watermark horizon — the ingest-side dedup a training-data
    pipeline needs when the upstream bus is at-least-once (the
    reference's connector explicitly is, ``snowflake_sink_connector.json:15``).

    ``dropDuplicatesWithinWatermark`` keys the state store on
    ``key_cols`` and — unlike plain ``dropDuplicates`` on a streaming
    DataFrame — EVICTS each key once the watermark passes it, so state
    is bounded by (arrival rate x watermark) instead of growing with the
    whole history. Duplicates separated by more than the watermark are
    NOT caught here; the batch `dedup_exact` tier sweeps those in the
    lake.
    """
    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )


def run_available_now(stream_df: DataFrame, out_path: str, checkpoint: str):
    """Drain all pending input into a parquet table and stop — the
    ``trigger(availableNow=True)`` pattern that gives streaming pipelines
    the task-DAG cadence (T4) with exactly-once checkpoints."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
