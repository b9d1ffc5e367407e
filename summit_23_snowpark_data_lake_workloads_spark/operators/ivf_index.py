"""Persisted IVF index: cell-probed ANN without re-assigning the corpus.

``knn_ivf`` (similarity.py) derives the cell assignment of every corpus
vector on every call — right for one-shot audits, wasteful for a
serving/search loop over a stable corpus. This module materializes the
trained centroid table and the per-vector cell assignments into two
lakehouse :class:`~..sources.lakehouse.SnapshotTable`\\ s (completing
the persisted-index family: MinHash for text near-dup, PQ for
compressed exact-ish distance, IVF for cell-probed search) and answers
probes from them:

- the **centroid table** is KBs (n_cells x dim doubles), broadcast;
- the **cells table** is the inverted file — ``n_assign`` small rows
  per vector (id, cell, cell_rank), the only corpus-sized input a
  probe scans; candidate vectors are fetched from the vector storage
  by id AFTER cell pruning, so full vectors move only for candidates;
- a probe assigns ONLY the query vectors (query-sized broadcast
  compare), joins probed cells to the inverted file, and re-ranks the
  candidates by exact cosine;
- **maintenance** assigns an arriving batch against the FROZEN stored
  centroids (batch-sized work) and appends its rows under exactly-once
  txn stamps — retrain = rebuild, the standard IVF lifecycle, so
  appended assignments stay comparable across versions and historical
  probes time-travel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vector import cosine
from ..sources.lakehouse import Snapshot, SnapshotTable
from .similarity import ivf_assign, kmeans_centroids


class IvfIndex:
    """Handle over the two tables of a persisted IVF index."""

    def __init__(self, centroids: SnapshotTable, cells: SnapshotTable):
        self.centroids = centroids
        self.cells = cells


def _seed_centroids(
    emb: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> DataFrame:
    return emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("centv")
    )


def build_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    n_assign: int = 2,
    train_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Train (or seed) centroids, assign the corpus once (each vector
    into its ``n_assign`` top cells — the multi-assignment recall
    default of :func:`..operators.similarity.knn_ivf`), and commit both
    tables under ``path``."""
    cents = (
        kmeans_centroids(emb, n_cells, train_iters, id_col, vec_col)
        if train_iters > 0
        else _seed_centroids(emb, n_cells, id_col, vec_col)
    )
    cent_table = SnapshotTable(spark, path.rstrip("/") + "/centroids")
    cent_table.create(cents)
    rows = (
        ivf_assign(emb, n_cells, id_col, vec_col, centroids=cents)
        .filter(F.col("cell_rank") <= n_assign)
        .select(
            F.col("id").alias("vec_id"),
            F.col("cent_id").alias("cell"),
            "cell_rank",
        )
    )
    cells_table = SnapshotTable(spark, path.rstrip("/") + "/cells")
    cells_table.create(rows)
    return IvfIndex(cent_table, cells_table)


def extend_ivf_index(
    index: IvfIndex,
    new_emb: DataFrame,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: dict | None = None,
) -> Snapshot:
    """Assign an arriving batch against the FROZEN stored centroids
    (batch-sized work) and append its inverted-file rows — one
    commuting commit."""
    cents = index.centroids.read()
    rows = (
        ivf_assign(new_emb, 0, id_col, vec_col, centroids=cents)
        .filter(F.col("cell_rank") <= n_assign)
        .select(
            F.col("id").alias("vec_id"),
            F.col("cent_id").alias("cell"),
            "cell_rank",
        )
    )
    return index.cells.append(rows, txn=txn)


def rebuild_ivf_index(
    index: IvfIndex,
    vectors: DataFrame,
    n_cells: int = 16,
    n_assign: int = 2,
    train_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[Snapshot, Snapshot]:
    """Retrain = rebuild, in place: when :func:`..plans.queries_index.
    ivf_cell_drift_profile`'s signal fires (high ``appended_frac`` with
    skewing ``load_ratio``), re-derive centroids from the CURRENT
    corpus and overwrite both tables as new versions — one corpus pass
    for training + one for assignment, the same cost the original
    build paid. Old versions stay readable: a probe that time-travels
    ``cells`` across the rebuild boundary must pass the matching
    ``centroid_version`` (pre-rebuild assignments rank against
    pre-rebuild centroids; mixing generations silently mis-probes,
    which is why the probe takes the two versions separately).
    """
    cents = (
        kmeans_centroids(vectors, n_cells, train_iters, id_col, vec_col)
        if train_iters > 0
        else _seed_centroids(vectors, n_cells, id_col, vec_col)
    )
    s1 = index.centroids.overwrite(cents)
    rows = (
        ivf_assign(vectors, 0, id_col, vec_col, centroids=cents)
        .filter(F.col("cell_rank") <= n_assign)
        .select(
            F.col("id").alias("vec_id"),
            F.col("cent_id").alias("cell"),
            "cell_rank",
        )
    )
    s2 = index.cells.overwrite(rows)
    return s1, s2


def compact_ivf_index(
    index: IvfIndex,
    target_files: int = 8,
    small_file_bytes: int | None = None,
) -> Snapshot:
    """Index maintenance: every :func:`extend_ivf_index` append adds a
    small file to the cells table, so after N micro-batches the
    inverted file is N-file fragmented and every probe pays N footer
    reads + N tiny scans. Rewrite it into ``target_files`` files — a
    pure metadata swap (same rows, new layout; probe results are
    invariant, pinned in tests/test_ivf_index.py), time travel to
    pre-compaction versions still works, and the txn bookkeeping is
    untouched (``last_committed_batch`` folds the whole history).
    Run it on the same cadence Delta OPTIMIZE runs: every ~N appends,
    not per batch. ``small_file_bytes`` switches to threshold
    compaction (only sub-threshold fragments rewritten — the form a
    corpus-scale cells table needs; ``None`` = full rewrite, fine for
    bounded tables)."""
    return index.cells.compact(target_files, small_file_bytes=small_file_bytes)


def compact_ivfpq_index(
    ivf: IvfIndex,
    pq,
    target_files: int = 8,
    small_file_bytes: int | None = None,
):
    """Compact BOTH fragment-accumulating sides of an IVF-PQ index —
    the cells table and the codes table (centroids and codebook are
    single-commit KB tables; nothing to compact). Returns the two new
    snapshots."""
    s1 = ivf.cells.compact(target_files, small_file_bytes=small_file_bytes)
    s2 = pq.codes.compact(target_files, small_file_bytes=small_file_bytes)
    return s1, s2


def build_ivfpq_index(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    n_assign: int = 2,
    train_iters: int = 0,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """FAISS-style IVF-PQ: the inverted file prunes candidates by cell,
    the PQ codes rank them by asymmetric distance — full vectors are
    touched at BUILD time only. One corpus pass each for assignment and
    encoding; four lakehouse tables under ``path``. Returns
    ``(IvfIndex, PqIndex)``."""
    from .pq_index import build_pq_index

    ivf = build_ivf_index(
        spark, emb, path.rstrip("/") + "/ivf", n_cells, n_assign,
        train_iters, id_col, vec_col,
    )
    pq = build_pq_index(
        spark, emb, path.rstrip("/") + "/pq", m, k, dim,
        train_iters, id_col, vec_col,
    )
    return ivf, pq


def extend_ivfpq_index(
    ivf: IvfIndex,
    pq,
    new_emb: DataFrame,
    n_assign: int = 2,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: dict | None = None,
) -> tuple[Snapshot, Snapshot]:
    """Append an arriving batch to BOTH sides — cells against the
    frozen centroids, codes against the frozen codebook — under the
    SAME txn stamp, so a replay after a crash between the two commits
    is detectable per table (the streaming sinks' two-table pattern)."""
    from .pq_index import extend_pq_index

    s1 = extend_ivf_index(ivf, new_emb, n_assign, id_col, vec_col, txn=txn)
    s2 = extend_pq_index(pq, new_emb, m, k, dim, id_col, vec_col, txn=txn)
    return s1, s2


def probe_ivfpq(
    ivf: IvfIndex,
    pq,
    queries: DataFrame,
    topk: int = 5,
    n_probe: int = 2,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
) -> DataFrame:
    """IVF-PQ search: (query_id, neighbor_id, adc_d2, rk) — candidates
    from the probed cells, ranked by PQ asymmetric distance. The
    production memory model at 100 TB: the probe reads the 3-int
    inverted file and the 3-int codes table; raw vectors appear ONLY on
    the query side (assignment + subspace distance table, both
    query-sized broadcasts). ``version`` time-travels BOTH tables to
    the matching snapshot (builds and appends commit them in lockstep).
    """
    from .pq import pq_subspace_distances

    cents = ivf.centroids.read()
    probes = (
        ivf_assign(queries, 0, id_col, vec_col, centroids=cents)
        .filter(F.col("cell_rank") <= n_probe)
        .select(F.col("id").alias("query_id"), F.col("cent_id").alias("cell"))
    )
    cells = ivf.cells.read(version=version).select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    cand = (
        probes.join(cells, "cell")
        .select("query_id", "neighbor_id")
        .distinct()
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    cb = pq.codebook.read().select("code_id", "pos", "cval")
    qd = pq_subspace_distances(
        queries, m, k, dim, id_col, vec_col, codebook=cb
    ).withColumnsRenamed({"vec_id": "query_id"})
    codes = pq.codes.read(version=version).withColumnsRenamed(
        {"vec_id": "neighbor_id"}
    )
    adc = (
        cand.join(codes, "neighbor_id")
        .join(F.broadcast(qd), ["query_id", "sub", "code_id"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.round(
                F.sum(F.col("d2").cast("decimal(28,9)")).cast("double"), 4
            ).alias("adc_d2")
        )
    )
    w = W.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return adc.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= topk
    )


def probe_ivf_index(
    index: IvfIndex,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
    centroid_version: int | None = None,
) -> DataFrame:
    """Cell-probed top-k of every query vector against the INDEXED
    corpus: (query_id, neighbor_id, cos_sim, rk). Only the queries are
    assigned (broadcast compare against the KB centroid table); the
    corpus side is the 3-int-column inverted-file scan, and full
    candidate vectors are fetched from ``vectors`` (the vector storage
    table) by id only AFTER cell pruning. ``version`` probes a
    historical inverted-file snapshot (time travel); when that snapshot
    predates a :func:`rebuild_ivf_index`, pass the matching
    ``centroid_version`` — cell ids are only meaningful against the
    centroid generation that assigned them."""
    cents = index.centroids.read(version=centroid_version)
    probes = (
        ivf_assign(queries, 0, id_col, vec_col, centroids=cents)
        .filter(F.col("cell_rank") <= n_probe)
        .select(F.col("id").alias("query_id"), F.col("cent_id").alias("cell"))
    )
    cells = index.cells.read(version=version).select(
        F.col("vec_id").alias("neighbor_id"), "cell"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    cand = (
        probes.join(cells, "cell")
        .select("query_id", "neighbor_id")
        .distinct()
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = (
        cand.join(q, "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("qv", "cv"), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
