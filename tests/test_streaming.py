"""Structured Streaming tests (SURVEY §5.4): file-source streams with
``availableNow``, asserting stream-batch equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.streaming.incremental import (
    hourly_rollup_batch,
    hourly_rollup_stream,
    run_available_now,
)
from summit_23_snowpark_data_lake_workloads_spark.streaming.ingest import (
    ingest_txn_stream,
    parse_txn_stream,
    read_json_file_stream,
)

from . import fixtures as FX


def test_txn_stream_ingest_equals_batch(spark, tmp_path):
    """Kafka-shaped JSON messages through the streaming ingest == the same
    transform applied in batch (exactly-once, typed, upper-cased)."""
    customers = FX.gen_customers(20)
    msgs = FX.gen_txn_stream_messages(customers, ["R1-6725013G", "b2-1111111A"], n=300)
    src = tmp_path / "src"
    src.mkdir()
    # three "topic dumps" arriving as separate files
    for i in range(3):
        (src / f"batch_{i}.jsonl").write_text("\n".join(msgs[i::3]))

    out = tmp_path / "raw_txn_stream"
    q = ingest_txn_stream(
        read_json_file_stream(spark, str(src)),
        str(out),
        str(tmp_path / "ckpt_ingest"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(out))
    want = parse_txn_stream(spark.read.text(str(src)))
    assert got.count() == 300
    assert dict(got.dtypes)["TXN_DATE"] == "timestamp"
    assert got.filter(F.col("TXN_DATE").isNull()).count() == 0, (
        "every 12h-format timestamp must parse"
    )
    sym_diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert sym_diff == 0, "stream result must equal batch transform"

    # idempotent restart: re-running over the same checkpoint adds nothing
    q2 = ingest_txn_stream(
        read_json_file_stream(spark, str(src)), str(out), str(tmp_path / "ckpt_ingest")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == 300, "exactly-once on restart"


def test_unified_transactions_union(spark, tmp_path):
    """T3: history (string timestamps) + typed stream -> one processed
    transaction table, schema-aligned."""
    from summit_23_snowpark_data_lake_workloads_spark.streaming.incremental import (
        TRANSACTION_COLUMNS,
        unified_transactions,
    )

    customers = FX.gen_customers(10)
    hist = spark.createDataFrame(FX.gen_txn_history(customers, ["R1-6725013G"], n=50))
    hist = hist.withColumnRenamed("TXN_DATE", "TXN_DATE")
    msgs = FX.gen_txn_stream_messages(customers, ["R1-6725013G"], n=30)
    src = tmp_path / "stream_msgs"
    src.mkdir()
    (src / "m.jsonl").write_text("\n".join(msgs))
    stream_typed = parse_txn_stream(spark.read.text(str(src)))

    uni = unified_transactions(hist, stream_typed)
    assert uni.columns == TRANSACTION_COLUMNS
    assert uni.count() == 80
    assert dict(uni.dtypes)["TXN_DATE"] == "timestamp"
    assert uni.filter(F.col("TXN_DATE").isNull()).count() == 0


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: streaming txns enriched with the customer dim
    == the same join in batch."""
    from summit_23_snowpark_data_lake_workloads_spark.plans.curate import (
        standardize_customer,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.incremental import (
        enrich_txn_stream,
        run_available_now,
    )

    customers = FX.gen_customers(25)
    msgs = FX.gen_txn_stream_messages(customers, ["R1-6725013G"], n=200)
    src = tmp_path / "msgs"
    src.mkdir()
    (src / "m.jsonl").write_text("\n".join(msgs))

    cust_dim = standardize_customer(spark.createDataFrame(customers)).select(
        "CUSTOMER_ID", "FIRST_NAME", "LAST_NAME", "STATE"
    )
    stream = (
        spark.readStream.format("text").load(str(src)).withColumnRenamed("value", "value")
    )
    q = run_available_now(
        enrich_txn_stream(parse_txn_stream(stream), cust_dim),
        str(tmp_path / "enriched"),
        str(tmp_path / "ckpt_enrich"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "enriched"))
    want = enrich_txn_stream(parse_txn_stream(spark.read.text(str(src))), cust_dim)
    assert got.count() == want.count() == 200
    assert got.exceptAll(want).count() == 0
    row = got.first()
    assert abs(row.SALES_AMT - row.TXN_QUANTITY * row.PRODUCT_UNIT_PRICE) < 1e-9


def test_checkpoint_recovery_incremental_drain(spark, tmp_path):
    """Recovery semantics: drain half the input, 'crash' (query ends),
    more data arrives, restart from the SAME checkpoint — every message
    lands exactly once, new files only are processed on resume."""
    customers = FX.gen_customers(15)
    msgs = FX.gen_txn_stream_messages(customers, ["R1-6725013G"], n=200)
    src = tmp_path / "src"
    src.mkdir()
    (src / "first.jsonl").write_text("\n".join(msgs[:120]))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q1 = ingest_txn_stream(read_json_file_stream(spark, str(src)), out, ckpt)
    q1.awaitTermination(120)
    assert spark.read.parquet(out).count() == 120

    # late arrivals while "down"
    (src / "second.jsonl").write_text("\n".join(msgs[120:]))
    q2 = ingest_txn_stream(read_json_file_stream(spark, str(src)), out, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 200, "resume must add exactly the new messages"
    assert got.select("TXN_ID").distinct().count() == 200, "no duplicates"


def test_stream_stream_attribution_join(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join == the batch interval
    join, for pairs whose event times the watermark has fully closed."""
    from summit_23_snowpark_data_lake_workloads_spark.plans.queries import QUERIES
    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table
    from summit_23_snowpark_data_lake_workloads_spark.streaming.incremental import (
        attribution_join_streams,
    )

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "ev_src"
    ev.write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")

    q = run_available_now(
        attribution_join_streams(clicks, purchases),
        str(tmp_path / "attr"),
        str(tmp_path / "ckpt_attr"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "attr")).drop("purchase_value")
    want = QUERIES["events_attribution_join"](spark, sf_dir).drop("purchase_value")
    # inner stream-stream join may withhold pairs still inside the final
    # watermark at stream end; every pair must be correct, and all pairs
    # clearly older than the tail watermark must be present
    wrong = got.exceptAll(want).count()
    assert wrong == 0, "no emitted pair may differ from the batch twin"
    max_ts = ev.agg(F.max("ts")).first()[0]
    closed = want.filter(
        F.col("purchase_ts") < (F.lit(max_ts) - F.expr("INTERVAL 3 HOURS"))
    )
    assert closed.exceptAll(got).count() == 0, "all closed pairs must be emitted"


def test_windowed_rollup_stream_batch_equivalence(spark, sf_dir, tmp_path):
    """Watermarked hourly rollup over the events table fed as a file
    stream == batch twin, for every window the watermark closed."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # materialize with a plain timestamp column for the file stream
    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events")
    src = tmp_path / "events_src"
    ev.write.parquet(str(src))

    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    q = run_available_now(
        hourly_rollup_stream(stream, watermark="1 hour"),
        str(tmp_path / "rollup"),
        str(tmp_path / "ckpt_rollup"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "rollup"))
    want = hourly_rollup_batch(ev)
    # append mode emits only watermark-closed windows; the tail window(s)
    # may be withheld — compare on the emitted buckets and require all
    # clearly-closed windows to be present
    max_ts = ev.agg(F.max("ts")).first()[0]
    closed = want.filter(
        F.col("bucket") < (F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
    )
    missing = closed.exceptAll(got).count()
    assert missing == 0, "every closed window must be emitted exactly"
    wrong = got.exceptAll(want).count()
    assert wrong == 0, "no emitted row may differ from the batch twin"


def test_kafka_option_contract():
    """No broker exists in this container, so the Kafka reader can never
    run here — pin its option surface instead so the prod path can't rot:
    bounded batches (maxOffsetsPerTrigger), explicit offsets, topic
    subscription."""
    from summit_23_snowpark_data_lake_workloads_spark.streaming.ingest import (
        kafka_source_options,
    )

    opts = kafka_source_options("broker1:9092,broker2:9092")
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "sales_txn"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "100000", (
        "micro-batches must be bounded or a restart reads the whole backlog"
    )
    latest = kafka_source_options(
        "b:9092", topic="other", starting_offsets="latest", max_offsets_per_trigger=None
    )
    assert latest["subscribe"] == "other"
    assert latest["startingOffsets"] == "latest"
    assert "maxOffsetsPerTrigger" not in latest


def test_stream_dedup_within_watermark(spark, tmp_path):
    """At-least-once re-deliveries of the same event_id across
    micro-batches must collapse to one row; distinct events all survive."""
    from summit_23_snowpark_data_lake_workloads_spark.streaming.incremental import (
        dedup_stream,
    )

    src = tmp_path / "dedup_src"
    src.mkdir()
    # batch 0: events 0..99; batch 1: re-delivers 50..99 plus new 100..149
    def lines(ids):
        return "\n".join(
            f'{{"event_id": {i}, "ts": "2024-03-01 10:{i % 60:02d}:00", "v": {i}}}'
            for i in ids
        )

    (src / "b0.jsonl").write_text(lines(range(100)))
    (src / "b1.jsonl").write_text(lines(range(50, 150)))

    schema = "event_id long, ts timestamp, v long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = run_available_now(
        dedup_stream(stream, ["event_id"], watermark="2 hours"),
        str(tmp_path / "dedup_out"),
        str(tmp_path / "ckpt_dedup"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "dedup_out"))
    assert got.count() == 150, "150 distinct events, re-deliveries dropped"
    assert got.select("event_id").distinct().count() == 150


def test_rollup_streams_real_testdata_encoding(spark, sf_dir, tmp_path):
    """Stream DIRECTLY from the driver-generated events.parquet — not a
    fixture rewrite — so the streaming tier exercises the testdata's
    real physical ``ts`` encoding every round. The encoding has shifted
    across driver regenerations (TIMESTAMP(NANOS) -> timezone-less
    TIMESTAMP(MICROS)); a future shift that the normalization seams
    don't cover must fail HERE, in-round, not in the driver gate.
    """
    import pyspark.sql.types as T

    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), (
        "read_table must normalize the current physical encoding to "
        f"TimestampType, got {ev.schema['ts'].dataType}"
    )

    stream = spark.readStream.schema(ev.schema).option(
        "pathGlobFilter", "events.parquet"
    ).parquet(sf_dir)
    q = run_available_now(
        hourly_rollup_stream(stream, watermark="1 hour"),
        str(tmp_path / "real_rollup"),
        str(tmp_path / "ckpt_real_rollup"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "real_rollup"))
    want = hourly_rollup_batch(ev)
    max_ts = ev.agg(F.max("ts")).first()[0]
    closed = want.filter(F.col("bucket") < (F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")))
    assert closed.exceptAll(got).count() == 0, "every closed window must be emitted"
    assert got.exceptAll(want).count() == 0, "no emitted row may differ from batch"


def test_rollup_stream_accepts_ntz_event_time(spark, sf_dir, tmp_path):
    """A schema-inferred source can deliver TIMESTAMP_NTZ event time
    (PySpark 4 default for timezone-less parquet); the watermark seams
    must normalize it instead of throwing
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE."""
    import pyspark.sql.types as T

    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events")
    ntz = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    src = tmp_path / "ntz_src"
    ntz.write.parquet(str(src))

    ntz_schema = T.StructType(
        [
            T.StructField(f.name, T.TimestampNTZType() if f.name == "ts" else f.dataType)
            for f in ev.schema.fields
        ]
    )
    stream = spark.readStream.schema(ntz_schema).parquet(str(src))
    q = run_available_now(
        hourly_rollup_stream(stream, watermark="1 hour"),
        str(tmp_path / "ntz_rollup"),
        str(tmp_path / "ckpt_ntz_rollup"),
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "ntz_rollup"))
    want = hourly_rollup_batch(ev)
    assert got.exceptAll(want).count() == 0, (
        "NTZ input must normalize to the same UTC buckets as the batch twin"
    )


def test_kafka_roundtrip_when_broker_available(spark, tmp_path):
    """Marker-gated LIVE Kafka path (S12): only runs where a broker and
    the spark-sql-kafka connector exist — ``KAFKA_BOOTSTRAP`` names the
    broker (e.g. ``localhost:9092``). This container has neither, so the
    test skips here; on any broker-equipped host it round-trips the real
    connector: Spark batch-writes datagen messages to the topic, then
    ``read_kafka_stream`` + ``parse_txn_stream`` must land the same rows
    the file-twin lands. Keeps the prod path executable-somewhere
    instead of permanently untested.
    """
    import os

    import pytest

    brokers = os.environ.get("KAFKA_BOOTSTRAP")
    if not brokers:
        pytest.skip("no KAFKA_BOOTSTRAP broker configured in this environment")
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", brokers
        ).option("subscribe", "__probe__").option("endingOffsets", "latest").load()
    except Exception as exc:  # connector jar missing or broker unreachable
        pytest.skip(f"kafka connector/broker unavailable: {exc}")

    from summit_23_snowpark_data_lake_workloads_spark.streaming.ingest import (
        read_kafka_stream,
    )

    topic = "sales_txn_test"
    customers = FX.gen_customers(10)
    msgs = FX.gen_txn_stream_messages(customers, ["R1-6725013G"], n=50)
    spark.createDataFrame([(m,) for m in msgs], "value string").write.format(
        "kafka"
    ).option("kafka.bootstrap.servers", brokers).option("topic", topic).save()

    out = tmp_path / "kafka_txn"
    q = ingest_txn_stream(
        read_kafka_stream(spark, brokers, topic=topic),
        str(out),
        str(tmp_path / "ckpt_kafka"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out))
    assert got.count() == 50
    assert got.filter(F.col("TXN_DATE").isNull()).count() == 0


def test_dedup_ingest_stream_corpus_is_the_state(spark, tmp_path):
    """Streaming corpus ingestion dedups each micro-batch against the
    lakehouse corpus itself — duplicates arriving ANY number of batches
    later are dropped (no watermark bound), within-batch re-deliveries
    collapse to the min-id survivor, and fresh docs land append-only."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        dedup_ingest_stream,
    )

    src = tmp_path / "doc_stream"
    src.mkdir()

    def jl(rows):
        return "\n".join(
            f'{{"doc_id": {i}, "text": "{t}"}}' for i, t in rows
        )

    # batch 0: two copies of A (within-batch dup) + B
    (src / "b0.jsonl").write_text(jl([(1, "doc A"), (2, "doc A"), (3, "doc B")]))
    # batch 1: A again (corpus dup, one batch later) + fresh C
    (src / "b1.jsonl").write_text(jl([(4, "doc A"), (5, "doc C")]))
    # batch 2: B and C again (corpus dups) only -> lands nothing
    (src / "b2.jsonl").write_text(jl([(6, "doc B"), (7, "doc C")]))

    table = SnapshotTable(spark, str(tmp_path / "corpus_tbl"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = dedup_ingest_stream(
        stream, table, "ingest-test", str(tmp_path / "ckpt_dedup_ingest")
    )
    q.awaitTermination(120)

    got = {r.text: r.doc_id for r in table.read().collect()}
    assert got == {"doc A": 1, "doc B": 3, "doc C": 5}, (
        "min-id survivor per content; later re-deliveries dropped"
    )
    # batch 2 landed nothing: no version was committed for it
    ops = [s.operation for s in table.history()]
    assert ops == ["create", "append"], f"no empty commits: {ops}"


def test_dedup_ingest_stream_restart_and_late_arrivals(spark, tmp_path):
    """Restart semantics for the dedup-ingest sink: re-running from the
    same checkpoint adds nothing (exactly-once), and NEW files after the
    restart still dedup against everything previously landed."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        dedup_ingest_stream,
    )

    src = tmp_path / "doc_stream2"
    src.mkdir()
    (src / "b0.jsonl").write_text('{"doc_id": 1, "text": "alpha"}\n{"doc_id": 2, "text": "beta"}')

    table = SnapshotTable(spark, str(tmp_path / "corpus2"))
    ckpt = str(tmp_path / "ckpt2")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = dedup_ingest_stream(stream, table, "ingest-rt", ckpt)
        q.awaitTermination(120)

    run()
    assert table.read().count() == 2
    v1 = table.snapshot().version

    run()  # restart, no new input: nothing may land
    assert table.snapshot().version == v1, "restart with no input must not commit"

    # late arrival after restart: dup of 'alpha' + one fresh doc
    (src / "b1.jsonl").write_text('{"doc_id": 9, "text": "alpha"}\n{"doc_id": 10, "text": "gamma"}')
    run()
    got = {r.text: r.doc_id for r in table.read().collect()}
    assert got == {"alpha": 1, "beta": 2, "gamma": 10}


def test_dedup_ingest_batch_single_plan_execution(spark, tmp_path, monkeypatch):
    """The dedup-ingest micro-batch must execute its dedup plan exactly
    ONCE: the survivors are written, then the commit decision reads the
    written files' parquet footers. Pinned three ways: the corpus
    projection is built once per batch, the batch is written once, and
    no ``isEmpty`` pre-probe (a second full plan execution) ever runs."""
    from pyspark.sql import DataFrame

    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        _dedup_ingest_batch,
    )

    table = SnapshotTable(spark, str(tmp_path / "corpus_single"))
    calls = {"read": 0, "write_batch": 0}
    real_read, real_wb = SnapshotTable.read, SnapshotTable._write_batch

    def spy_read(self, *a, **k):
        calls["read"] += 1
        return real_read(self, *a, **k)

    def spy_wb(self, df):
        calls["write_batch"] += 1
        return real_wb(self, df)

    def no_isempty(self):
        raise AssertionError("isEmpty pre-probe executes the plan twice")

    monkeypatch.setattr(SnapshotTable, "read", spy_read)
    monkeypatch.setattr(SnapshotTable, "_write_batch", spy_wb)
    monkeypatch.setattr(DataFrame, "isEmpty", no_isempty)

    b0 = spark.createDataFrame([(1, "doc A"), (2, "doc B")], "doc_id long, text string")
    _dedup_ingest_batch(b0, 0, table, "single-exec")
    assert calls == {"read": 0, "write_batch": 1}  # create: no corpus yet

    b1 = spark.createDataFrame([(3, "doc A"), (4, "doc C")], "doc_id long, text string")
    _dedup_ingest_batch(b1, 1, table, "single-exec")
    assert calls == {"read": 1, "write_batch": 2}, (
        "append batch: one corpus projection, one write"
    )

    # all-duplicate batch: still exactly one projection + one write,
    # and NO commit (version unchanged, no empty files referenced)
    monkeypatch.setattr(SnapshotTable, "read", real_read)  # for the assert read
    v = table.snapshot().version
    monkeypatch.setattr(SnapshotTable, "read", spy_read)
    b2 = spark.createDataFrame([(5, "doc A"), (6, "doc C")], "doc_id long, text string")
    _dedup_ingest_batch(b2, 2, table, "single-exec")
    assert calls == {"read": 2, "write_batch": 3}
    assert table.snapshot().version == v, "all-dup batch must not commit"
    monkeypatch.setattr(SnapshotTable, "read", real_read)
    got = {r.text: r.doc_id for r in table.read().collect()}
    assert got == {"doc A": 1, "doc B": 2, "doc C": 4}


def test_near_dedup_ingest_stream(spark, tmp_path):
    """Near-dup streaming ingest: micro-batches probe the persisted
    MinHash index (not corpus text) — a later batch's near-copy of an
    already-landed doc is dropped, exact corpus dups drop too (estimate
    1.0), fresh docs land AND become probe-visible to the next batch."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        near_dedup_ingest_stream,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lambda mu nu xi omicron pi rho sigma tau upsilon"
    other = "one two three four five six seven eight nine ten " \
            "eleven twelve thirteen fourteen fifteen sixteen"
    src = tmp_path / "near_stream"
    src.mkdir()

    def jl(rows):
        return "\n".join(f'{{"doc_id": {i}, "text": "{t}"}}' for i, t in rows)

    (src / "b0.jsonl").write_text(jl([(1, base), (2, other)]))
    # near-copy of base (one appended token) + exact copy of other + fresh
    (src / "b1.jsonl").write_text(
        jl([(10, base + " chi"), (11, other), (12, "cold wind north mountain river stone forest valley snow peak blue")])
    )

    table = SnapshotTable(spark, str(tmp_path / "near_corpus"))
    index = SnapshotTable(spark, str(tmp_path / "near_index"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = near_dedup_ingest_stream(
        stream, table, index, "near-test", str(tmp_path / "ckpt_near")
    )
    q.awaitTermination(120)

    got = sorted(r.doc_id for r in table.read().collect())
    assert got == [1, 2, 12], f"near/exact dups must drop: {got}"
    # the index covers exactly the landed docs
    idx_ids = {r.id for r in index.read().select("id").distinct().collect()}
    assert idx_ids == {1, 2, 12}
    # both tables recorded the same last batch
    assert table.last_committed_batch("near-test") == 1
    assert index.last_committed_batch("near-test") == 1


def test_near_dedup_ingest_index_heals_after_split_commit(spark, tmp_path):
    """Crash-between-commits repair: if the docs table committed a batch
    but the index did not (simulated with a fresh empty index), the
    replay rebuilds the index FROM THE COMMITTED FILES of that batch —
    never by re-running dedup against the already-ingested corpus."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        _near_dedup_ingest_batch,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    table = SnapshotTable(spark, str(tmp_path / "heal_corpus"))
    index = SnapshotTable(spark, str(tmp_path / "heal_index"))
    _near_dedup_ingest_batch(docs, 0, table, index, "heal")
    assert table.read().count() == 1 and index.read().count() == 12

    # simulate the crash: docs table has batch 1, index never saw it
    more = spark.createDataFrame(
        [(2, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    _near_dedup_ingest_batch(more, 1, table, index, "heal")
    lagging = SnapshotTable(spark, str(tmp_path / "heal_index2"))
    _near_dedup_ingest_batch(more, 1, table, lagging, "heal")  # replay
    assert table.last_committed_batch("heal") == 1, "docs side idempotent"
    ids = {r.id for r in lagging.read().select("id").distinct().collect()}
    assert ids == {2}, "index heals with exactly the batch's committed rows"
    # replaying again is a no-op on both tables
    v_t, v_i = table.snapshot().version, lagging.snapshot().version
    _near_dedup_ingest_batch(more, 1, table, lagging, "heal")
    assert (table.snapshot().version, lagging.snapshot().version) == (v_t, v_i)


def test_near_dedup_ingest_quality_gate_and_metrics(spark, tmp_path):
    """Curation-on-ingest: rows failing the quality gate never land and
    never enter the index; the metrics table records per-batch
    arrival/rejection/landing counts idempotently across replays."""
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        near_dedup_ingest_stream,
    )

    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    src = tmp_path / "qm_stream"
    src.mkdir()

    def jl(rows):
        return "\n".join(f'{{"doc_id": {i}, "text": "{t}"}}' for i, t in rows)

    # batch 0: one good doc, one too-short doc (fails gate), one exact dup
    (src / "b0.jsonl").write_text(
        jl([(1, good), (2, "tiny"), (3, good)])
    )
    # batch 1: near-copy of the good doc + a fresh good one
    (src / "b1.jsonl").write_text(
        jl([(10, good + " chi"),
            (11, "one two three four five six seven eight nine ten")])
    )

    table = SnapshotTable(spark, str(tmp_path / "qm_corpus"))
    index = SnapshotTable(spark, str(tmp_path / "qm_index"))
    metrics = SnapshotTable(spark, str(tmp_path / "qm_metrics"))
    ckpt = str(tmp_path / "qm_ckpt")
    gate = F.array_size(F.split("text", r"\s+")) >= 5

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = near_dedup_ingest_stream(
            stream, table, index, "qm", ckpt,
            quality_pred=gate, metrics=metrics,
        )
        q.awaitTermination(120)

    run()
    assert sorted(r.doc_id for r in table.read().collect()) == [1, 11]
    assert {r.id for r in index.read().select("id").distinct().collect()} == {1, 11}
    got = {
        r.batch_id: (r.n_arrived, r.n_quality_rejected, r.n_dedup_dropped, r.n_landed)
        for r in metrics.read().collect()
    }
    assert got == {0: (3, 1, 1, 1), 1: (2, 0, 1, 1)}, got

    run()  # replay from the same checkpoint: nothing doubles
    assert metrics.read().count() == 2
    assert table.read().count() == 2


def test_semantic_dedup_ingest_stream(spark, tmp_path):
    """Semantic dedup at ingest: micro-batches probe the persisted IVF
    index — an arrival whose top-1 indexed neighbor has cosine >= 0.9
    drops, fresh directions land AND become probe-visible to later
    batches; centroids bootstrap from the first batch and stay frozen."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        semantic_dedup_ingest_stream,
    )

    src = tmp_path / "sem_stream"
    src.mkdir()

    def jl(rows):
        return "\n".join(
            f'{{"vec_id": {i}, "embedding": {list(v)}}}' for i, v in rows
        )

    (src / "b0.jsonl").write_text(
        jl([(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])])
    )
    (src / "b1.jsonl").write_text(
        jl([
            (10, [0.99, 0.1, 0.0, 0.0]),   # ~= vec 1 -> drop
            (11, [0.0, 0.0, 1.0, 0.0]),    # fresh direction -> lands
            (12, [0.1, 0.9, 0.0, 0.1]),    # ~= vec 2 -> drop
        ])
    )

    table = SnapshotTable(spark, str(tmp_path / "sem_corpus"))
    centroids = SnapshotTable(spark, str(tmp_path / "sem_centroids"))
    cells = SnapshotTable(spark, str(tmp_path / "sem_cells"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = semantic_dedup_ingest_stream(
        stream, table, centroids, cells, "sem-test", str(tmp_path / "ckpt_sem")
    )
    q.awaitTermination(120)

    got = sorted(r.vec_id for r in table.read().collect())
    assert got == [1, 2, 11], f"semantic dups must drop: {got}"
    # the inverted file covers exactly the landed vectors
    idx_ids = {r.vec_id for r in cells.read().select("vec_id").distinct().collect()}
    assert idx_ids == {1, 2, 11}
    # frozen bootstrap centroids: first batch's ids only
    assert {r.cent_id for r in centroids.read().collect()} == {1, 2}
    assert table.last_committed_batch("sem-test") == 1
    assert cells.last_committed_batch("sem-test") == 1


def test_semantic_dedup_ingest_heals_after_split_commit(spark, tmp_path):
    """Crash-between-commits repair, semantic edition: docs committed
    but cells not (simulated with fresh centroid/cells tables) -> the
    replay rebuilds the index from the committed batch's OWN files,
    never by re-probing the already-ingested corpus."""
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        _semantic_dedup_ingest_batch,
    )

    table = SnapshotTable(spark, str(tmp_path / "corpus"))
    batch = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    # docs side committed (as the original run would have)...
    table._commit(
        "create", 0, table._write_batch(batch), replace_all=True,
        txn={"app_id": "heal", "batch_id": 0},
    )
    # ...but the index side never did: fresh tables
    centroids = SnapshotTable(spark, str(tmp_path / "cents"))
    cells = SnapshotTable(spark, str(tmp_path / "cells"))
    _semantic_dedup_ingest_batch(
        batch.limit(0), 0, table, centroids, cells, "heal"
    )
    assert {r.vec_id for r in cells.read().collect()} == {1, 2}
    assert {r.cent_id for r in centroids.read().collect()} == {1, 2}
    # both rows stayed landed exactly once
    assert table.read().count() == 2


def test_semantic_dedup_intra_batch(spark, tmp_path):
    """intra_batch=True: two near-identical vectors arriving in ONE
    micro-batch land exactly one (the min-id keeper) — including on the
    cold-start batch, where the blocking cells come from the batch's
    own lowest-id rows (the set the bootstrap then freezes); without
    the flag both land (the documented default granularity)."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        _semantic_dedup_ingest_batch,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (7, [0.999, 0.01, 0.0, 0.0]),   # ~= vec 1, same batch -> drop
    ]
    for flag, expect in ((False, [1, 2, 7]), (True, [1, 2])):
        batch = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        table = SnapshotTable(spark, str(tmp_path / f"t_{flag}"))
        centroids = SnapshotTable(spark, str(tmp_path / f"c_{flag}"))
        cells = SnapshotTable(spark, str(tmp_path / f"x_{flag}"))
        _semantic_dedup_ingest_batch(
            batch, 0, table, centroids, cells, "intra", min_cos=0.9,
            intra_batch=flag,
        )
        got = sorted(r.vec_id for r in table.read().collect())
        assert got == expect, (flag, got)
        idx_ids = {r.vec_id for r in cells.read().select("vec_id").collect()}
        assert idx_ids == set(expect), (flag, idx_ids)

    # second micro-batch: intra-batch near-dups still collapse AGAINST
    # the standing frozen centroids, and the survivor must also clear
    # the cross-batch index probe
    table = SnapshotTable(spark, str(tmp_path / "t2"))
    centroids = SnapshotTable(spark, str(tmp_path / "c2"))
    cells = SnapshotTable(spark, str(tmp_path / "x2"))
    b0 = spark.createDataFrame(
        rows[:2], "vec_id long, embedding array<double>"
    )
    _semantic_dedup_ingest_batch(
        b0, 0, table, centroids, cells, "intra", min_cos=0.9, intra_batch=True
    )
    b1 = spark.createDataFrame(
        [
            (10, [0.0, 0.0, 1.0, 0.0]),   # fresh -> lands
            (11, [0.0, 0.01, 0.999, 0.0]),  # ~= 10, same batch -> drop
            (12, [0.0, 0.998, 0.0, 0.02]),  # ~= indexed vec 2 -> drop
        ],
        "vec_id long, embedding array<double>",
    )
    _semantic_dedup_ingest_batch(
        b1, 1, table, centroids, cells, "intra", min_cos=0.9, intra_batch=True
    )
    got = sorted(r.vec_id for r in table.read().collect())
    assert got == [1, 2, 10], got
    assert {r.cent_id for r in centroids.read().collect()} == {1, 2}


def test_dedup_ingest_auto_compaction(spark, tmp_path):
    """compact_every: the sink periodically rewrites the fragmented
    table after the batch commit — content and txn bookkeeping are
    unchanged, file count is bounded, and 'compact' operations appear
    in the history at the configured cadence."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable,
    )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        dedup_ingest_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    for b in range(4):
        (src / f"b{b}.jsonl").write_text(
            "\n".join(
                f'{{"doc_id": {b * 10 + i}, "text": "doc {b} {i} text"}}'
                for i in range(3)
            )
        )
    table = SnapshotTable(spark, str(tmp_path / "corpus"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = dedup_ingest_stream(
        stream, table, "ac", str(tmp_path / "ckpt"), compact_every=2,
        # target_files defaults to 8; 4 batches won't exceed it unless
        # each batch writes several part files — force visible
        # fragmentation by checking operations instead of file count
    )
    q.awaitTermination(120)

    assert table.read().count() == 12  # all distinct texts landed
    assert table.last_committed_batch("ac") == 3
    ops = [s.operation for s in table.history()]
    # maintenance ran only at the cadence AND only when fragmented:
    # with <= 8 files nothing compacts — verify by re-running a
    # fragmented table directly
    frag = SnapshotTable(spark, str(tmp_path / "frag"))
    one = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    frag.create(one.repartition(3))
    for b in range(1, 4):
        frag.append(
            spark.createDataFrame(
                [(b * 10, f"t{b}")], "doc_id long, text string"
            ).repartition(3),
            txn={"app_id": "ac", "batch_id": b},
        )
    from summit_23_snowpark_data_lake_workloads_spark.streaming.lakehouse_sink import (
        _maybe_compact,
    )

    n_before = len(frag.snapshot().files)
    assert n_before > 2
    # off-cadence batch id: no-op
    _maybe_compact([frag], batch_id=2, compact_every=2, target_files=2)
    assert len(frag.snapshot().files) == n_before
    _maybe_compact(
        [frag], batch_id=1, compact_every=2, target_files=2,
        vacuum_retain_last=1,
    )
    assert len(frag.snapshot().files) <= 2
    assert frag.read().count() == 4
    assert frag.last_committed_batch("ac") == 3
    # vacuum opt-in reclaimed the pre-compaction fragments while the
    # retained version still reads
    import os as _os

    live = {_os.path.join(frag.path, f) for f in frag.snapshot().files}
    data_dir = _os.path.join(frag.path, "data")
    on_disk = {
        _os.path.join(dp, f)
        for dp, _dn, fn in _os.walk(data_dir)
        for f in fn
        if f.endswith(".parquet")  # _SUCCESS/.crc sidecars stay with
        # their batch dir until it is fully vacuumed
    }
    assert on_disk == live, "vacuum must leave only the live data files" 
    assert ops.count("create") == 1
