"""Product quantization (operators/pq.py): training improves the
codebook, encoding/search behave, determinism holds."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.pq import (
    knn_pq_adc,
    pq_audit,
    pq_train_codebooks,
)
from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table


def _mean_rel_err(emb, codebook=None) -> float:
    row = (
        pq_audit(emb, codebook=codebook)
        .agg(F.avg("rel_err").alias("m"))
        .collect()[0]
    )
    return float(row.m)


@pytest.mark.slow  # r16: model/quality tier — SPARK_GRAFT_SLOW=1 (verify-window budget)
def test_trained_codebooks_reduce_reconstruction_error(spark, sf_dir):
    """Per-subspace Lloyd strictly improves on the seed codebook (the
    whole point of training), and more iterations never hurt —
    k-means' monotone objective, observable through the audit."""
    emb = read_table(spark, sf_dir, "embeddings")
    seed_err = _mean_rel_err(emb)
    cb1 = pq_train_codebooks(emb, iters=1)
    err1 = _mean_rel_err(emb, codebook=cb1)
    cb3 = pq_train_codebooks(emb, iters=3)
    err3 = _mean_rel_err(emb, codebook=cb3)
    assert err1 < seed_err, (err1, seed_err)
    assert err3 <= err1 + 1e-9, (err3, err1)


@pytest.mark.slow  # r16: model/quality tier — SPARK_GRAFT_SLOW=1 (verify-window budget)
def test_trained_adc_output_shape_and_determinism(spark, sf_dir):
    """ADC over a trained codebook keeps the output contract (k rows
    per query, ranks 1..k, distances non-decreasing in rank) and the
    training itself is deterministic (two runs, identical codebooks)."""
    emb = read_table(spark, sf_dir, "embeddings")
    cb = pq_train_codebooks(emb, iters=2)
    out = knn_pq_adc(
        emb, query_pred=F.col("query_id") < 5, codebook=cb
    ).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        d = [r.adc_d2 for r in rows]
        assert d == sorted(d), f"ranks must follow distance for query {q}"
    cb2 = pq_train_codebooks(emb, iters=2)
    a = sorted((r.code_id, r.pos, r.cval) for r in cb.collect())
    b = sorted((r.code_id, r.pos, r.cval) for r in cb2.collect())
    assert a == b, "training must be deterministic run-to-run"
