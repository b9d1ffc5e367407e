"""Persisted IVF index: probe == inline cell-probed search, frozen
centroids across appends, time travel. Mirrors test_pq_index's
contract style; the gated `ivf_index_probe_audit` differentials the
same lifecycle against DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.ivf_index import (
    build_ivf_index,
    extend_ivf_index,
    probe_ivf_index,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_ivf_index_probe_matches_inline_and_time_travels(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 3 == 0)
    batch = emb.filter(F.col("vec_id") % 3 == 1)
    queries = emb.filter(F.col("vec_id") % 3 == 2).filter(F.col("vec_id") < 60)

    idx = build_ivf_index(spark, base, str(tmp_path / "ivf"), n_cells=16, n_assign=2)
    cents_before = _rows(idx.centroids.read().select("cent_id"))

    v1 = _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2))
    assert v1, "probe found no candidates"
    # every neighbor at v1 must be a base-corpus vector
    assert all(n % 3 == 0 for (_q, n, _c, _r) in v1)

    extend_ivf_index(idx, batch, txn={"app_id": "t", "batch_id": 1})
    # frozen centroids: the append must not touch the centroid table
    assert _rows(idx.centroids.read().select("cent_id")) == cents_before

    v2 = _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2))
    assert any(n % 3 == 1 for (_q, n, _c, _r) in v2), "appended vectors never surfaced"

    # time travel: probing version 1 after the append reproduces v1 exactly
    assert _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2, version=1)) == v1

    # replay detector: the txn stamp is recorded
    assert idx.cells.last_committed_batch("t") == 1
