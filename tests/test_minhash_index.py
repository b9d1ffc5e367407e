"""Persisted MinHash index (operators/minhash_index.py): build once,
probe batches without corpus text access, maintain incrementally."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.minhash_index import (
    build_minhash_index,
    extend_minhash_index,
    probe_minhash_index,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
CORPUS = [
    (0, BASE),
    (1, BASE + " lambda"),  # near-dup of 0
    (2, "one two three four five six seven eight nine ten"),
    (3, "cold wind north mountain river stone forest valley snow peak"),
    (4, "red orange yellow green blue indigo violet pink brown black"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_finds_near_dup_without_corpus_text(spark, tmp_path):
    idx = build_minhash_index(
        spark, _docs(spark, CORPUS), str(tmp_path / "mhidx")
    )
    batch = _docs(spark, [(100, BASE + " mu")])  # near-copy of docs 0/1
    got = probe_minhash_index(idx, batch, min_est_jaccard=0.3)
    rows = {(r.batch_id, r.corpus_id): r.est_jaccard for r in got.collect()}
    assert (100, 0) in rows and (100, 1) in rows
    assert all(0.3 <= v <= 1.0 for v in rows.values())
    # estimate sanity: the true 3-gram jaccard of batch-vs-doc0 is high
    assert rows[(100, 0)] >= 0.5

    # the probe plan must scan the INDEX parquet, never re-shingle corpus
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain()
    plan = buf.getvalue()
    assert "ReadSchema: struct<id:bigint,seed:int,minhash:bigint>" in plan, (
        "probe must read the persisted signature index"
    )
    # every file scan reads signature ints only — corpus TEXT is never
    # scanned from storage (the only text in the plan is the in-memory
    # batch's LocalTableScan)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "text" not in line, f"probe scans text from storage: {line}"


def test_unrelated_batch_yields_nothing(spark, tmp_path):
    idx = build_minhash_index(
        spark, _docs(spark, CORPUS), str(tmp_path / "mhidx")
    )
    batch = _docs(spark, [(200, "totally different words about spark plans here ok")])
    assert probe_minhash_index(idx, batch, min_est_jaccard=0.3).count() == 0


def test_incremental_extend_and_time_travel(spark, tmp_path):
    idx = build_minhash_index(
        spark, _docs(spark, CORPUS), str(tmp_path / "mhidx")
    )
    v0 = idx.snapshot().version
    extend_minhash_index(
        idx,
        _docs(spark, [(5, "cold wind north mountain river stone forest valley snow hill")]),
        txn={"app_id": "nightly", "batch_id": 1},
    )
    batch = _docs(spark, [(300, "cold wind north mountain river stone forest valley snow peak")])
    now = probe_minhash_index(idx, batch, min_est_jaccard=0.3)
    got_now = {r.corpus_id for r in now.collect()}
    assert 3 in got_now and 5 in got_now, "new doc must be probe-visible"
    # time travel: yesterday's index does not know doc 5
    before = probe_minhash_index(idx, batch, min_est_jaccard=0.3, version=v0)
    got_before = {r.corpus_id for r in before.collect()}
    assert 3 in got_before and 5 not in got_before
    # exactly-once bookkeeping carried by the lakehouse commit
    assert idx.last_committed_batch("nightly") == 1


def test_estimate_tracks_exact_jaccard(spark, tmp_path):
    """Signature-agreement estimate must land within the standard
    MinHash error envelope of the exact 3-gram Jaccard for a known
    pair (12 hashes -> sd ~ sqrt(j(1-j)/12) ~ 0.14)."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, CORPUS)
    idx = build_minhash_index(spark, docs, str(tmp_path / "mhidx"))
    probe = probe_minhash_index(
        idx, docs.filter(F.col("doc_id") == 1), min_est_jaccard=0.0
    )
    est = {r.corpus_id: r.est_jaccard for r in probe.collect()}
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.0).collect()
    }
    true01 = exact[(0, 1)]
    assert abs(est[0] - true01) <= 0.45, (est[0], true01)
