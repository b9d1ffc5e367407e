"""Stateful sessionization (applyInPandasWithState) vs the batch twin,
plus the rate-source datagen."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table
from summit_23_snowpark_data_lake_workloads_spark.streaming.datagen import txn_rate_stream
from summit_23_snowpark_data_lake_workloads_spark.streaming.incremental import (
    run_available_now,
)
from summit_23_snowpark_data_lake_workloads_spark.streaming.stateful import (
    sessionize_stream,
)


def batch_sessions(spark, ev):
    """Batch-computed sessions (same semantics as plans.queries
    events_sessionize, reshaped to the streaming output schema)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = gaps.select(
        "user_id", "ts", "value", F.sum("new_session").over(w).alias("seq")
    )
    return sess.groupBy("user_id", "seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    src = tmp_path / "events_src"
    ev.write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))

    q = run_available_now(
        sessionize_stream(stream, watermark="30 minutes"),
        str(tmp_path / "sessions"),
        str(tmp_path / "ckpt_sessions"),
    )
    q.awaitTermination(180)

    got = spark.read.parquet(str(tmp_path / "sessions"))
    want = batch_sessions(spark, ev).drop("seq")

    # sessions closed well before the stream's end must match exactly;
    # trailing sessions may be withheld until a later watermark advance
    max_ts = ev.agg(F.max("ts")).first()[0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    got_closed = got.filter(F.col("session_end") < cutoff)
    want_closed = want.filter(F.col("session_end") < cutoff)
    assert got_closed.count() > 0
    missing = want_closed.exceptAll(got_closed).count()
    extra = got_closed.exceptAll(want_closed).count()
    assert missing == 0 and extra == 0, (
        f"stateful sessions diverge from batch: missing={missing} extra={extra}"
    )


def test_transform_with_state_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """Spark-4 transformWithStateInPandas sessionizer == batch twin on
    all clearly-closed sessions (and therefore == the legacy
    applyInPandasWithState variant, which the sibling test pins)."""
    from summit_23_snowpark_data_lake_workloads_spark.streaming.stateful import (
        sessionize_stream_tws,
    )

    import pytest

    if sessionize_stream_tws is None:
        pytest.skip("transformWithState requires Spark >= 4.0")
    # the TWS Python driver worker speaks protobuf to the JVM; without the
    # pip package the worker crashes at init (gated, not installable here)
    pytest.importorskip("google.protobuf")

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    src = tmp_path / "events_src"
    ev.write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = run_available_now(
            sessionize_stream_tws(stream, watermark="30 minutes"),
            str(tmp_path / "sessions_tws"),
            str(tmp_path / "ckpt_tws"),
        )
        q.awaitTermination(180)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = spark.read.parquet(str(tmp_path / "sessions_tws"))
    want = batch_sessions(spark, ev).drop("seq")
    max_ts = ev.agg(F.max("ts")).first()[0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    got_closed = got.filter(F.col("session_end") < cutoff)
    want_closed = want.filter(F.col("session_end") < cutoff)
    assert got_closed.count() > 0
    missing = want_closed.exceptAll(got_closed).count()
    extra = got_closed.exceptAll(want_closed).count()
    assert missing == 0 and extra == 0, (
        f"transformWithState sessions diverge: missing={missing} extra={extra}"
    )


@pytest.mark.slow  # r16: model/quality tier — SPARK_GRAFT_SLOW=1 (verify-window budget)
def test_txn_rate_datagen_shape(spark, tmp_path):
    stream = txn_rate_stream(spark, rows_per_second=500)
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "txns"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    df = spark.read.parquet(str(tmp_path / "txns"))
    # availableNow on a fresh rate stream may drain zero rows; run a timed
    # micro-batch if empty
    if df.count() == 0:
        q2 = (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "txns"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="2 seconds")
            .start()
        )
        import time

        time.sleep(8)
        q2.stop()
        df = spark.read.parquet(str(tmp_path / "txns"))
    assert df.count() > 0
    row = df.first()
    assert row.TXN_ID.startswith("W") and len(row.TXN_ID) == 12
    assert len(row.CUSTOMER_ID) == 10
    assert 1 <= row.TXN_QUANTITY <= 30
    assert row.PAYMENT_METHOD in {"VISA", "MASTERCARD", "AMEX", "DISCOVER", "GIFT_CARD"}
