"""Persisted PQ index (operators/pq_index.py): build once, probe from
stored codes, extend against the frozen codebook."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.pq import knn_pq_adc
from summit_23_snowpark_data_lake_workloads_spark.operators.pq_index import (
    build_pq_index,
    extend_pq_index,
    probe_pq_index,
)
from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table


def test_probe_equals_inline_adc_and_scans_codes_only(spark, sf_dir, tmp_path):
    """Probing the persisted index (seed codebook) must equal the
    inline ADC query exactly, and the corpus side of the probe plan
    must scan only the 3-int codes table, never embedding arrays."""
    from summit_23_snowpark_data_lake_workloads_spark import cache

    emb = read_table(spark, sf_dir, "embeddings")
    idx = build_pq_index(
        spark, emb, str(tmp_path / "pqidx"), train_iters=0
    )
    queries = emb.filter(F.col("vec_id") < 20)
    try:
        got = {
            (r.query_id, r.neighbor_id): (r.adc_d2, r.rk)
            for r in probe_pq_index(idx, queries).collect()
        }
        want = {
            (r.query_id, r.neighbor_id): (r.adc_d2, r.rk)
            for r in knn_pq_adc(
                emb, query_pred=F.col("query_id") < 20
            ).collect()
        }
    finally:
        cache.release_caches()
    assert got == want

    plan_df = probe_pq_index(idx, queries)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain()
    scans = [l for l in buf.getvalue().splitlines() if "ReadSchema" in l]
    assert any(
        "vec_id:bigint,sub:int,code_id:bigint" in l for l in scans
    ), f"probe must scan the stored codes: {scans}"
    embedding_scans = [l for l in scans if "embedding" in l]
    assert len(embedding_scans) <= 1, (
        "only the QUERY side may read embedding arrays"
    )


def test_extend_with_frozen_codebook_and_time_travel(spark, sf_dir, tmp_path):
    """Appended vectors are encoded against the stored codebook and
    become probe-visible; a historical probe does not see them; the
    exactly-once txn stamp is recorded."""
    emb = read_table(spark, sf_dir, "embeddings")
    idx = build_pq_index(
        spark,
        emb.filter(F.col("vec_id") < 400),
        str(tmp_path / "pqidx2"),
        train_iters=1,
    )
    v0 = idx.codes.snapshot().version
    extend_pq_index(
        idx,
        emb.filter(F.col("vec_id") >= 400),
        txn={"app_id": "pq-nightly", "batch_id": 1},
    )
    q = emb.filter(F.col("vec_id") == 400)
    now = {r.neighbor_id for r in probe_pq_index(idx, q, topk=50).collect()}
    assert any(n >= 400 for n in now), "appended vectors must be searchable"
    before = {
        r.neighbor_id
        for r in probe_pq_index(idx, q, topk=50, version=v0).collect()
    }
    assert all(n < 400 for n in before), "time travel excludes the append"
    assert idx.codes.last_committed_batch("pq-nightly") == 1
