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


def probe_ivf_index(
    index: IvfIndex,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
) -> DataFrame:
    """Cell-probed top-k of every query vector against the INDEXED
    corpus: (query_id, neighbor_id, cos_sim, rk). Only the queries are
    assigned (broadcast compare against the KB centroid table); the
    corpus side is the 3-int-column inverted-file scan, and full
    candidate vectors are fetched from ``vectors`` (the vector storage
    table) by id only AFTER cell pruning. ``version`` probes a
    historical index snapshot (time travel)."""
    cents = index.centroids.read()
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
