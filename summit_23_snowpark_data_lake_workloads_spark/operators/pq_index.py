"""Persisted PQ index: ADC search without re-encoding the corpus.

:mod:`.pq` derives codes from raw vectors every run — right for the
audit queries, wasteful for a serving/search loop over a stable corpus.
This module materializes the trained codebook and the per-vector codes
into two lakehouse :class:`~..sources.lakehouse.SnapshotTable`\\ s and
answers ADC probes from them:

- the **codes table** is the compressed corpus — ``m`` small ints per
  vector (~1% of the float payload), the only corpus-sized scan a probe
  reads;
- the **codebook table** is KBs, broadcast;
- a probe encodes ONLY the query vectors (query-sized work), builds the
  per-query codeword distance table against the broadcast codebook, and
  joins it to the codes scan on the 2-int (sub, code) key;
- **maintenance** appends new vectors' codes under exactly-once txn
  stamps — the codebook is frozen at build time (retrain = rebuild, the
  standard PQ index lifecycle), so appended codes stay comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.lakehouse import Snapshot, SnapshotTable
from .pq import pq_codes, pq_subspace_distances, pq_train_codebooks


class PqIndex:
    """Handle over the two tables of a persisted PQ index."""

    def __init__(self, codes: SnapshotTable, codebook: SnapshotTable):
        self.codes = codes
        self.codebook = codebook


def build_pq_index(
    spark: SparkSession,
    emb: DataFrame,
    path: str,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    train_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PqIndex:
    """Train codebooks (per-subspace Lloyd; ``train_iters=0`` keeps the
    deterministic seeds), encode the corpus once, and commit both
    tables under ``path``."""
    cb = (
        pq_train_codebooks(emb, m, k, dim, train_iters, id_col, vec_col)
        if train_iters > 0
        else None
    )
    codes = pq_codes(
        pq_subspace_distances(emb, m, k, dim, id_col, vec_col, codebook=cb)
    ).select("vec_id", "sub", "code_id")
    cb_table = SnapshotTable(spark, path.rstrip("/") + "/codebook")
    from .pq import seed_codebook

    cb_table.create(cb if cb is not None else seed_codebook(emb, k, id_col, vec_col))
    codes_table = SnapshotTable(spark, path.rstrip("/") + "/codes")
    codes_table.create(codes)
    return PqIndex(codes_table, cb_table)


def extend_pq_index(
    index: PqIndex,
    new_emb: DataFrame,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    txn: dict | None = None,
) -> Snapshot:
    """Encode an arriving batch against the FROZEN stored codebook
    (batch-sized work) and append its codes — one commuting commit."""
    cb = index.codebook.read().select("code_id", "pos", "cval")
    codes = pq_codes(
        pq_subspace_distances(new_emb, m, k, dim, id_col, vec_col, codebook=cb)
    ).select("vec_id", "sub", "code_id")
    return index.codes.append(codes, txn=txn)


def probe_pq_index(
    index: PqIndex,
    queries: DataFrame,
    topk: int = 5,
    m: int = 4,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    version: int | None = None,
) -> DataFrame:
    """ADC top-k of every query vector against the INDEXED corpus:
    (query_id, neighbor_id, adc_d2, rk). Only the query side touches
    raw vectors; the corpus side is the 3-int-column codes scan.
    ``version`` probes a historical index snapshot (time travel)."""
    cb = index.codebook.read().select("code_id", "pos", "cval")
    qd = pq_subspace_distances(
        queries, m, k, dim, id_col, vec_col, codebook=cb
    ).withColumnsRenamed({"vec_id": "query_id"})
    codes = index.codes.read(version=version).withColumnsRenamed(
        {"vec_id": "neighbor_id"}
    )
    adc = (
        codes.join(F.broadcast(qd), ["sub", "code_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
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
