"""Driver-gated audits for the STREAMING INGEST tier — the exact and
semantic dedup sinks of :mod:`..streaming.lakehouse_sink`.

The sinks were the last pytest-only surfaces: their behavior spans a
running Structured Streaming query (file source -> ``foreachBatch`` ->
txn-stamped lakehouse commits), which the ``queries_index`` audit
pattern extends to cover: each query here materializes a DETERMINISTIC
arrival sequence as one parquet file per micro-batch (mtimes staggered
so the file source delivers them in order, ``maxFilesPerTrigger=1``),
runs the REAL sink with ``availableNow`` into a throwaway temp dir —
real checkpoint, real foreachBatch, real create/append commits — then
emits per-version relational facts from time-travel reads. The DuckDB
oracle recomputes every drop decision straight from the raw parquet
(first-occurrence text rule for the exact sink; centroid bootstrap +
cell probe + rounded-cosine threshold for the semantic sink), so a bug
in batch ordering, txn idempotency, the dedup anti-joins, the probe, or
the index extension hash-mismatches.

The arrival sequences are built to exercise every drop path:
- WITHIN-batch duplicates (re-id'd copies whose original is in the same
  batch) must collapse to the min-id survivor;
- REDELIVERED rows (same id, same content — the at-least-once upstream)
  must not re-land;
- corpus duplicates under a NEW id (exact: same text re-id'd; semantic:
  an identical vector re-id'd, cosine 1.0) must drop against the
  standing table;
- genuinely fresh rows (all sf0.01 texts are distinct; max natural
  embedding cosine is ~0.51, well under the 0.8 gate threshold) must
  land, and BLEND vectors (v[p] + v[p+1], cosine vs parents straddling
  the threshold) must fall exactly where the rounded-cosine rule puts
  them — whichever side that is, engine and oracle agree or the hash
  breaks.

Results are ``localCheckpoint(eager=True)``-ed so the temp dirs can be
deleted before returning. Reference analog: the T1/T3 continuous ingest
path (``code/ingest/snowpipe_streaming/snowflake_sink_connector.json:15-20``,
``docker-compose.yml``), upgraded with dedup-on-ingest semantics.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import _t, query

#: semantic-dedup gate threshold: natural sf0.01 embedding pairs top out
#: near cosine 0.51, constructed copies sit at 1.0, and parent blends
#: span 0.61-0.74 — at 0.70 the blends split ~half drop / ~half land,
#: so the rounded-cosine threshold rule is exercised on BOTH sides of
#: the line (not just the trivial 1.0 and 0.5 extremes).
_SEM_TAU = 0.7


def _write_batch_files(batches: list[DataFrame], src_dir: str) -> None:
    """Materialize each batch as ONE parquet file with strictly
    ascending mtimes, so the file stream source (which orders unseen
    files by modification time) delivers exactly one arrival batch per
    micro-batch, in sequence."""
    base = int(time.time()) - 3600
    for i, df in enumerate(batches):
        stage = os.path.join(src_dir, f"_stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"b{i}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(stage, ignore_errors=True)
        os.utime(dest, (base + i * 10, base + i * 10))


def _drain(query_handle) -> None:
    query_handle.awaitTermination(600)


def _exact_audit_oracle() -> str:
    """Landed set = first (batch, doc_id) occurrence per text across
    the arrival sequence — exactly the sink's rule (within-batch min-id
    survivor per content hash, then anti-join against all earlier
    landings). Per-version aggregates are the cumulative landings."""
    arr = """
arr AS (
    SELECT doc_id, text, n_chars, b
    FROM documents, (VALUES (0), (1), (2)) v(b)
    WHERE (b = 0 AND doc_id % 4 IN (0, 1))
       OR (b = 1 AND doc_id % 4 IN (1, 2))
       OR (b = 2 AND doc_id % 4 IN (2, 3))
    UNION ALL  -- within-batch ghosts: re-id'd copies of in-batch rows
    SELECT doc_id + 100000, text, n_chars, 0 FROM documents
    WHERE doc_id % 4 IN (0, 1) AND doc_id % 11 = 0
    UNION ALL
    SELECT doc_id + 100000, text, n_chars, 1 FROM documents
    WHERE doc_id % 4 = 2 AND doc_id % 11 = 0
    UNION ALL  -- corpus ghosts: new id, text landed two batches ago
    SELECT doc_id + 100000, text, n_chars, 2 FROM documents
    WHERE doc_id % 4 = 0 AND doc_id % 11 = 0
),
landed AS (
    SELECT doc_id, n_chars, b,
           row_number() OVER (PARTITION BY text ORDER BY b, doc_id) AS rk
    FROM arr
)"""
    parts = [
        f"""
    SELECT {v} AS version, {v - 1} AS batch_id,
           count(*)::BIGINT AS n_rows,
           sum(doc_id)::BIGINT AS sum_doc_id,
           sum(n_chars)::BIGINT AS sum_n_chars
    FROM landed WHERE rk = 1 AND b < {v}"""
        for v in (1, 2, 3)
    ]
    return "WITH " + arr + " UNION ALL ".join(parts)


@query("streaming_ingest_exact_audit", oracle=_exact_audit_oracle())
def streaming_ingest_exact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-dedup streaming ingest sink under the driver gate: a
    real ``availableNow`` run of :func:`..streaming.lakehouse_sink.
    dedup_ingest_stream` over three file-source micro-batches with
    overlapping arrivals (redeliveries), within-batch re-id'd copies,
    and corpus-duplicate texts under fresh ids. One row per committed
    table version, aggregated from a time-travel read, with the batch
    id from the version's txn stamp — so micro-batch ordering, the
    md5 anti-join geometry, within-batch survivor choice, commit
    atomicity, and txn bookkeeping all gate on exact integers.

    Scale: per-batch work is batch-sized (the corpus side of the dedup
    anti-join is one scan pruned by a broadcast semi-join — never
    shuffled); the audit's corpus is documents-sized and the result is
    three rows.
    """
    from ..sources.lakehouse import SnapshotTable
    from ..streaming.lakehouse_sink import dedup_ingest_stream

    docs = _t(spark, sf_dir, "documents")
    res = F.col("doc_id") % 4
    ghost = lambda df: df.filter(F.col("doc_id") % 11 == 0).withColumn(  # noqa: E731
        "doc_id", F.col("doc_id") + 100000
    )
    b0 = docs.filter(res.isin(0, 1))
    batches = [
        b0.unionByName(ghost(b0)),
        docs.filter(res.isin(1, 2)).unionByName(ghost(docs.filter(res == 2))),
        docs.filter(res.isin(2, 3)).unionByName(ghost(docs.filter(res == 0))),
    ]
    tmp = tempfile.mkdtemp(prefix="stream_exact_audit_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        _write_batch_files(batches, src)
        table = SnapshotTable(spark, os.path.join(tmp, "corpus"))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        _drain(
            dedup_ingest_stream(
                stream, table, "gate_audit", os.path.join(tmp, "ckpt")
            )
        )
        out = None
        for snap in table.history():
            r = table.read(version=snap.version).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("doc_id").alias("sum_doc_id"),
                F.sum("n_chars").alias("sum_n_chars"),
            ).select(
                F.lit(snap.version).alias("version"),
                F.lit(snap.txn["batch_id"]).alias("batch_id"),
                "n_rows",
                "sum_doc_id",
                "sum_n_chars",
            )
            out = r if out is None else out.unionByName(r)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _semantic_audit_oracle() -> str:
    """Full replay of the semantic ingest lifecycle from raw parquet:
    arrival construction (originals by ``vec_id % 3``, re-id'd copies,
    same-id redeliveries, parent blends), centroid bootstrap from the
    first batch's 16 lowest ids, top-2 cell assignment at the probe's
    rounded-cosine granularity, per-batch drop decisions (id guard,
    then max candidate cosine >= tau), and the cumulative landed /
    inverted-file / centroid facts per version."""
    head = f"""
WITH e AS (
    SELECT vec_id, i AS pos, embedding[i]::DOUBLE AS val
    FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
),
arr AS (
    SELECT vec_id AS aid, vec_id % 3 AS b, pos, val FROM e
    UNION ALL  -- re-id'd copies of batch-0 vectors (cosine 1.0 -> drop)
    SELECT vec_id + 1000, 1, pos, val FROM e
    WHERE vec_id % 3 = 0 AND vec_id < 30
    UNION ALL  -- same-id redeliveries of landed rows (id guard -> drop)
    SELECT vec_id, 1, pos, val FROM e WHERE vec_id % 3 = 0 AND vec_id < 15
    UNION ALL  -- parent blends near the threshold
    SELECT a.vec_id + 2000, 2, a.pos, a.val + bb.val
    FROM e a JOIN e bb ON bb.pos = a.pos AND bb.vec_id = a.vec_id + 1
    WHERE a.vec_id % 3 = 0 AND a.vec_id < 30
),
nrm AS (SELECT aid, b, sqrt(sum(val * val)) AS nrm FROM arr GROUP BY aid, b),
cents AS (SELECT aid AS cid FROM nrm WHERE b = 0 ORDER BY aid LIMIT 16),
cvec AS (
    SELECT a.aid AS cid, a.pos, a.val FROM arr a
    JOIN cents c ON c.cid = a.aid WHERE a.b = 0
),
cnrm AS (SELECT cid, sqrt(sum(val * val)) AS nrm FROM cvec GROUP BY cid),
cdot AS (
    SELECT q.aid, q.b, c.cid, sum(q.val * c.val) AS dot
    FROM arr q JOIN cvec c ON c.pos = q.pos
    GROUP BY q.aid, q.b, c.cid
),
assign AS (
    SELECT d.aid, d.b, d.cid, row_number() OVER (
        PARTITION BY d.aid, d.b
        ORDER BY round(d.dot / (n1.nrm * n2.nrm), 4) DESC, d.cid
    ) AS rnk
    FROM cdot d
    JOIN nrm n1 ON n1.aid = d.aid AND n1.b = d.b
    JOIN cnrm n2 ON n2.cid = d.cid
),
land0 AS (SELECT DISTINCT aid, 0 AS b FROM arr WHERE b = 0),
q1 AS (
    SELECT DISTINCT aid, 1 AS b FROM arr WHERE b = 1
    AND aid NOT IN (SELECT aid FROM land0)
),
cos1 AS (
    SELECT ca.qid, max(round(d.dot / (nq.nrm * nh.nrm), 4)) AS mx
    FROM (
        SELECT DISTINCT q.aid AS qid, h.aid AS hid, h.b AS hb
        FROM q1 JOIN assign q ON q.aid = q1.aid AND q.b = 1 AND q.rnk <= 2
        JOIN assign h ON h.cid = q.cid AND h.rnk <= 2
        JOIN land0 ON land0.aid = h.aid AND land0.b = h.b
        WHERE h.aid <> q.aid
    ) ca
    JOIN (
        SELECT qa.aid AS qid, ha.aid AS hid, ha.b AS hb,
               sum(qa.val * ha.val) AS dot
        FROM arr qa JOIN arr ha ON ha.pos = qa.pos
        WHERE qa.b = 1 GROUP BY qid, hid, hb
    ) d ON d.qid = ca.qid AND d.hid = ca.hid AND d.hb = ca.hb
    JOIN nrm nq ON nq.aid = ca.qid AND nq.b = 1
    JOIN nrm nh ON nh.aid = ca.hid AND nh.b = ca.hb
    GROUP BY ca.qid
),
land1 AS (
    SELECT aid, 1 AS b FROM q1
    WHERE aid NOT IN (SELECT qid FROM cos1 WHERE mx >= {_SEM_TAU})
),
lset1 AS (SELECT * FROM land0 UNION ALL SELECT * FROM land1),
q2 AS (
    SELECT DISTINCT aid, 2 AS b FROM arr WHERE b = 2
    AND aid NOT IN (SELECT aid FROM lset1)
),
cos2 AS (
    SELECT ca.qid, max(round(d.dot / (nq.nrm * nh.nrm), 4)) AS mx
    FROM (
        SELECT DISTINCT q.aid AS qid, h.aid AS hid, h.b AS hb
        FROM q2 JOIN assign q ON q.aid = q2.aid AND q.b = 2 AND q.rnk <= 2
        JOIN assign h ON h.cid = q.cid AND h.rnk <= 2
        JOIN lset1 ON lset1.aid = h.aid AND lset1.b = h.b
        WHERE h.aid <> q.aid
    ) ca
    JOIN (
        SELECT qa.aid AS qid, ha.aid AS hid, ha.b AS hb,
               sum(qa.val * ha.val) AS dot
        FROM arr qa JOIN arr ha ON ha.pos = qa.pos
        WHERE qa.b = 2 GROUP BY qid, hid, hb
    ) d ON d.qid = ca.qid AND d.hid = ca.hid AND d.hb = ca.hb
    JOIN nrm nq ON nq.aid = ca.qid AND nq.b = 2
    JOIN nrm nh ON nh.aid = ca.hid AND nh.b = ca.hb
    GROUP BY ca.qid
),
land2 AS (
    SELECT aid, 2 AS b FROM q2
    WHERE aid NOT IN (SELECT qid FROM cos2 WHERE mx >= {_SEM_TAU})
),
landed AS (
    SELECT aid, b, b AS lb FROM land0
    UNION ALL SELECT aid, b, 1 FROM land1
    UNION ALL SELECT aid, b, 2 FROM land2
)"""
    parts = []
    for v in (1, 2, 3):
        parts.append(f"""
    SELECT 'docs' AS side, {v} AS version, {v - 1} AS batch_id,
           count(*)::BIGINT AS n_rows, sum(aid)::BIGINT AS sum_id,
           0::BIGINT AS sum_extra
    FROM landed WHERE lb < {v}""")
        parts.append(f"""
    SELECT 'cells' AS side, {v} AS version, {v - 1} AS batch_id,
           count(*)::BIGINT AS n_rows, sum(l.aid)::BIGINT AS sum_id,
           sum(a.cid)::BIGINT AS sum_extra
    FROM landed l JOIN assign a ON a.aid = l.aid AND a.b = l.b AND a.rnk <= 2
    WHERE l.lb < {v}""")
    parts.append("""
    SELECT 'centroids' AS side, 1 AS version, 0 AS batch_id,
           count(*)::BIGINT AS n_rows, sum(cid)::BIGINT AS sum_id,
           0::BIGINT AS sum_extra
    FROM cents""")
    return head + " UNION ALL ".join(parts)


@query("streaming_ingest_semantic_audit", oracle=_semantic_audit_oracle())
def streaming_ingest_semantic_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SEMANTIC dedup streaming ingest sink under the driver gate:
    a real ``availableNow`` run of :func:`..streaming.lakehouse_sink.
    semantic_dedup_ingest_stream` over three file-source micro-batches —
    originals split by ``vec_id % 3``, plus re-id'd copies (cosine 1.0
    against the index -> must drop), same-id redeliveries (the id guard
    -> must drop without relying on self-match), and parent-blend
    vectors whose cosine against landed parents straddles the 0.8
    threshold (the rounded-cosine rule decides; oracle and engine must
    agree row for row). Emits per-version facts for all three persisted
    tables: the vector table (cumulative landings), the inverted file
    (two cell rows per landed vector — ``sum_extra`` pins the actual
    cell ids, so a frozen-centroid violation or assignment drift
    hash-mismatches), and the bootstrap centroid table (the 16
    LOWEST-ID first-batch survivors — the cold-start contract).

    Scale: each micro-batch probes batch-vs-index (query-side
    assignment against the KB centroid broadcast + 3-int inverted-file
    scan), never batch-vs-corpus; the audit adds only the arrival-file
    materialization.
    """
    from ..sources.lakehouse import SnapshotTable
    from ..streaming.lakehouse_sink import semantic_dedup_ingest_stream

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    m3 = F.col("vec_id") % 3
    b0 = emb.filter(m3 == 0)
    copies = b0.filter(F.col("vec_id") < 30).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    redeliver = b0.filter(F.col("vec_id") < 15)
    a, bb = emb.alias("a"), emb.alias("bb")
    blends = (
        a.filter((F.col("a.vec_id") % 3 == 0) & (F.col("a.vec_id") < 30))
        .join(bb, F.col("bb.vec_id") == F.col("a.vec_id") + 1)
        .select(
            (F.col("a.vec_id") + 2000).alias("vec_id"),
            F.zip_with(
                "a.embedding", "bb.embedding", lambda x, y: x + y
            ).alias("embedding"),
        )
    )
    batches = [
        b0,
        emb.filter(m3 == 1).unionByName(copies).unionByName(redeliver),
        emb.filter(m3 == 2).unionByName(blends),
    ]
    tmp = tempfile.mkdtemp(prefix="stream_sem_audit_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        _write_batch_files(batches, src)
        table = SnapshotTable(spark, os.path.join(tmp, "vectors"))
        centroids = SnapshotTable(spark, os.path.join(tmp, "centroids"))
        cells = SnapshotTable(spark, os.path.join(tmp, "cells"))
        stream = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        _drain(
            semantic_dedup_ingest_stream(
                stream, table, centroids, cells, "gate_audit",
                os.path.join(tmp, "ckpt"), min_cos=_SEM_TAU,
            )
        )
        out = None
        for snap in table.history():
            r = table.read(version=snap.version).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("vec_id").alias("sum_id"),
            ).select(
                F.lit("docs").alias("side"),
                F.lit(snap.version).alias("version"),
                F.lit(snap.txn["batch_id"]).alias("batch_id"),
                "n_rows",
                "sum_id",
                F.lit(0).cast("long").alias("sum_extra"),
            )
            out = r if out is None else out.unionByName(r)
        for snap in cells.history():
            r = cells.read(version=snap.version).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("vec_id").alias("sum_id"),
                F.sum("cell").alias("sum_extra"),
            ).select(
                F.lit("cells").alias("side"),
                F.lit(snap.version).alias("version"),
                F.lit(snap.txn["batch_id"]).alias("batch_id"),
                "n_rows",
                "sum_id",
                "sum_extra",
            )
            out = out.unionByName(r)
        cent = centroids.read().agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cent_id").alias("sum_id"),
        ).select(
            F.lit("centroids").alias("side"),
            F.lit(1).alias("version"),
            F.lit(0).alias("batch_id"),
            "n_rows",
            "sum_id",
            F.lit(0).cast("long").alias("sum_extra"),
        )
        out = out.unionByName(cent)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
