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


def test_ivfpq_probe_ranks_by_adc_and_time_travels(spark, sf_dir, tmp_path):
    """IVF-PQ composition: candidates must be exactly the IVF cell
    candidates, ranked by the SAME ADC distances the plain PQ probe
    assigns them; both tables append in lockstep under one txn and
    version-1 probes reproduce the pre-append state."""
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.operators.ivf_index import (
        build_ivfpq_index,
        extend_ivfpq_index,
        probe_ivfpq,
    )
    from summit_23_snowpark_data_lake_workloads_spark.operators.pq_index import (
        probe_pq_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 3 == 0)
    batch = emb.filter(F.col("vec_id") % 3 == 1)
    queries = emb.filter((F.col("vec_id") % 3 == 2) & (F.col("vec_id") < 60))

    ivf, pq = build_ivfpq_index(spark, base, str(tmp_path / "idx"))
    v1 = {tuple(r) for r in probe_ivfpq(ivf, pq, queries, topk=3).collect()}
    assert v1 and all(n % 3 == 0 for (_q, n, _d, _r) in v1)

    # ADC agreement: for every (query, neighbor) the hybrid keeps, the
    # plain PQ probe (no cell pruning, huge topk) assigns the same adc_d2
    full = {
        (r["query_id"], r["neighbor_id"]): r["adc_d2"]
        for r in probe_pq_index(pq, queries, topk=10_000).collect()
    }
    for (q, n, d, _rk) in v1:
        assert full[(q, n)] == d

    extend_ivfpq_index(ivf, pq, batch, txn={"app_id": "t2", "batch_id": 5})
    v2 = {tuple(r) for r in probe_ivfpq(ivf, pq, queries, topk=3).collect()}
    assert any(n % 3 == 1 for (_q, n, _d, _r) in v2)
    assert {tuple(r) for r in probe_ivfpq(ivf, pq, queries, topk=3, version=1).collect()} == v1
    assert ivf.cells.last_committed_batch("t2") == 5
    assert pq.codes.last_committed_batch("t2") == 5


def test_compaction_preserves_probe_results(spark, sf_dir, tmp_path):
    """Index maintenance: after N appends the inverted file is N-file
    fragmented; compact_ivf_index rewrites it into few files as a pure
    metadata swap — probe results (current AND time-travel) must be
    bit-identical before and after, and the txn bookkeeping survives."""
    import os

    from summit_23_snowpark_data_lake_workloads_spark.operators.ivf_index import (
        compact_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 == 0)
    queries = emb.filter(F.col("vec_id") % 4 == 3).filter(F.col("vec_id") < 40)

    idx = build_ivf_index(spark, base, str(tmp_path / "ivf"), n_cells=16, n_assign=2)
    for b in (1, 2, 3):
        extend_ivf_index(
            idx, emb.filter(F.col("vec_id") % 4 == b % 3 + 1),
            txn={"app_id": "t", "batch_id": b},
        )
    before = _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2))
    before_v2 = _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2, version=2))
    n_files_before = len(idx.cells.snapshot().files)
    assert n_files_before > 2, "appends should fragment the cells table"

    compact_ivf_index(idx, target_files=1)

    assert len(idx.cells.snapshot().files) <= 1
    # same rows, same probes — current and historical
    assert _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2)) == before
    assert (
        _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2, version=2))
        == before_v2
    )
    # txn bookkeeping folds across the compact commit
    assert idx.cells.last_committed_batch("t") == 3
    # vacuum after compaction actually reclaims the fragment files
    removed = idx.cells.vacuum(retain_last=1)
    assert removed, "vacuum found nothing to collect after compaction"
    assert _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2)) == before
    assert all(os.path.exists(os.path.join(idx.cells.path, f))
               for f in idx.cells.snapshot().files)


def test_ivfpq_compaction_lockstep(spark, sf_dir, tmp_path):
    """compact_ivfpq_index compacts cells AND codes; ADC probe results
    are invariant and the two tables stay at the same version count so
    lockstep time travel keeps working."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.ivf_index import (
        build_ivfpq_index,
        compact_ivfpq_index,
        extend_ivfpq_index,
        probe_ivfpq,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 < 2)
    queries = emb.filter(F.col("vec_id") % 4 == 3).filter(F.col("vec_id") < 40)

    ivf, pq = build_ivfpq_index(spark, base, str(tmp_path / "ivfpq"), n_cells=16)
    extend_ivfpq_index(ivf, pq, emb.filter(F.col("vec_id") % 4 == 2),
                       txn={"app_id": "t", "batch_id": 1})
    before = _rows(probe_ivfpq(ivf, pq, queries, topk=3, n_probe=2))
    before_v1 = _rows(probe_ivfpq(ivf, pq, queries, topk=3, n_probe=2, version=1))

    compact_ivfpq_index(ivf, pq, target_files=1)

    assert _rows(probe_ivfpq(ivf, pq, queries, topk=3, n_probe=2)) == before
    assert (
        _rows(probe_ivfpq(ivf, pq, queries, topk=3, n_probe=2, version=1))
        == before_v1
    )
    assert len(ivf.cells._versions()) == len(pq.codes._versions())


def test_rebuild_after_drift(spark, sf_dir, tmp_path):
    """rebuild_ivf_index: retrain-as-rebuild over the current corpus —
    the rebuilt index must probe exactly like a FRESH build over the
    same corpus, and pre-rebuild snapshots must still probe correctly
    when paired with their own centroid generation."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.ivf_index import (
        rebuild_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 3 == 0)
    batch = emb.filter(F.col("vec_id") % 3 == 1)
    corpus = emb.filter(F.col("vec_id") % 3 < 2)
    queries = emb.filter(F.col("vec_id") % 3 == 2).filter(F.col("vec_id") < 60)

    idx = build_ivf_index(spark, base, str(tmp_path / "ivf"), n_cells=16, n_assign=2)
    extend_ivf_index(idx, batch, txn={"app_id": "t", "batch_id": 1})
    pre = _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2))

    rebuild_ivf_index(idx, corpus, n_cells=16, n_assign=2)

    # rebuilt == fresh build over the same corpus (seed centroids are
    # now the corpus' lowest ids, not the base's — a real retrain)
    fresh = build_ivf_index(
        spark, corpus, str(tmp_path / "fresh"), n_cells=16, n_assign=2
    )
    got = _rows(probe_ivf_index(idx, emb, queries, k=3, n_probe=2))
    assert got == _rows(probe_ivf_index(fresh, emb, queries, k=3, n_probe=2))
    assert got != pre, "rebuild with a different centroid set must re-rank"

    # pre-rebuild snapshot + matching centroid generation reproduces
    # the pre-rebuild probe exactly
    assert (
        _rows(
            probe_ivf_index(
                idx, emb, queries, k=3, n_probe=2, version=2, centroid_version=1
            )
        )
        == pre
    )
