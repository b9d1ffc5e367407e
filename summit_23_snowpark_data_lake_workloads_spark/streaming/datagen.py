"""Synthetic streaming transaction generator (SURVEY §2.9 T2).

The reference uses a Kafka producer emitting ~100 msg/s
(``streaming_kafka_datagen.py:39-108``). Spark-native: the ``rate``
source + deterministic column expressions — no external broker, same
message shape, rate controlled by ``rowsPerSecond``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import portable_hash64

PAYMENT_METHODS = ["VISA", "MASTERCARD", "AMEX", "DISCOVER", "GIFT_CARD"]


def txn_rate_stream(
    spark: SparkSession, rows_per_second: int = 100, n_customers: int = 1000
) -> DataFrame:
    """Rate-source stream shaped like the Kafka feed (typed, upper-case
    columns — the post-parse shape of ``ingest.parse_txn_stream``).

    Values derive deterministically from the rate source's ``value``
    counter via the portable hash, so any two runs at the same offsets
    produce identical rows (replayable load tests).
    """
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    h = portable_hash64(F.col("value").cast("string"))
    method_arr = F.array(*[F.lit(m) for m in PAYMENT_METHODS])
    return raw.select(
        F.concat(F.lit("W"), F.lpad((h % 100_000_000_000).cast("string"), 11, "0")).alias(
            "TXN_ID"
        ),
        F.col("timestamp").alias("TXN_DATE"),
        (h % 30 + 1).cast("int").alias("TXN_QUANTITY"),
        F.lpad(((h % n_customers) + 1).cast("string"), 10, "0").alias("CUSTOMER_ID"),
        F.concat(
            F.lit("R"),
            (h % 10).cast("string"),
            F.lit("-"),
            F.lpad((h % 10_000_000).cast("string"), 7, "0"),
            F.lit("G"),
        ).alias("PRODUCT_ID"),
        F.round((h % 90_000) / 100.0 + 1.0, 2).alias("PRODUCT_UNIT_PRICE"),
        F.lit("Widget").alias("PRODUCT_DESC"),
        F.element_at(method_arr, (h % 5 + 1).cast("int")).alias("PAYMENT_METHOD"),
    )
