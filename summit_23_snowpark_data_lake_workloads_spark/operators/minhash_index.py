"""Persisted MinHash signature index: near-dup lookup without touching
corpus text.

``minhash_lsh_pairs`` (dedup.py) re-derives signatures from text every
run — right for one-shot dedup, wasteful for the nightly-ingest shape
where the same 100 TB corpus is probed by a small batch every day. This
module materializes the signature table ONCE into a lakehouse
:class:`~..sources.lakehouse.SnapshotTable` and answers probes from it:

- **index rows** are long-form signatures ``(id, seed, minhash)`` —
  ``num_hashes`` small integers per document, ~10⁻³ of the text volume;
- **probing** shingles only the incoming batch, joins banded signatures
  against the index (batch side broadcast), and estimates Jaccard from
  full-signature agreement — zero corpus text access, zero corpus-side
  recompute;
- **maintenance** is an ``append`` of the new batch's signatures (a
  lakehouse commit with optional exactly-once ``txn`` stamps), so the
  index version history mirrors corpus growth and supports time travel
  ("what would yesterday's index have matched?").

The estimate-only probe is deliberately signature-space: E[matches] =
jaccard * num_hashes. Callers needing exact Jaccard feed the candidate
pairs to ``_jaccard_for_pairs`` with batch+matched-docs shingles — still
proportional to candidates, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lakehouse import Snapshot, SnapshotTable
from .dedup import minhash_signatures

# Single shared construction (operators/dedup.py): an index probe must
# generate exactly the same candidates as the one-shot operator, so the
# band-key expression is defined once and imported here. The historical
# private name is kept for existing callers/tests.
from .dedup import band_signatures as _band_signatures  # noqa: E402


def build_minhash_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    n: int = 3,
) -> SnapshotTable:
    """One corpus pass -> committed signature table at ``path``."""
    table = SnapshotTable(spark, path)
    table.create(minhash_signatures(docs, id_col, text_col, num_hashes, n))
    return table


def extend_minhash_index(
    table: SnapshotTable,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    n: int = 3,
    txn: dict | None = None,
) -> Snapshot:
    """Index maintenance for an arriving batch: signature the batch
    (batch-sized work) and append — one commuting lakehouse commit."""
    return table.append(
        minhash_signatures(new_docs, id_col, text_col, num_hashes, n), txn=txn
    )


def probe_minhash_index(
    table: SnapshotTable,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    min_est_jaccard: float = 0.5,
    version: int | None = None,
) -> DataFrame:
    """Near-dup candidates for ``batch`` against the indexed corpus:
    (batch_id, corpus_id, n_match, est_jaccard).

    Scale shape: the index scan is the ONLY corpus-sized input (narrow
    ints, parquet-pruned to 3 columns); the batch's banded signatures
    broadcast into the band equi-join, so the corpus side never
    shuffles; the signature-agreement estimate joins only candidate
    ids. ``version`` probes a historical index snapshot.
    """
    idx = table.read(version=version)
    bsig = minhash_signatures(batch, id_col, text_col, num_hashes, n)
    idx_bands = _band_signatures(idx, num_hashes, bands)
    batch_bands = _band_signatures(bsig, num_hashes, bands)
    candidates = (
        idx_bands.alias("c")
        .join(
            F.broadcast(batch_bands.alias("b")),
            (F.col("c.band") == F.col("b.band"))
            & (F.col("c.sig") == F.col("b.sig"))
            & (F.col("c.id") != F.col("b.id")),
        )
        .select(
            F.col("b.id").alias("batch_id"), F.col("c.id").alias("corpus_id")
        )
        .distinct()
    )
    bs = bsig.withColumnsRenamed({"id": "batch_id", "minhash": "mh_b"})
    cs = idx.withColumnsRenamed({"id": "corpus_id", "minhash": "mh_c"})
    return (
        candidates.join(F.broadcast(bs), "batch_id")
        .join(cs, ["corpus_id", "seed"])
        .groupBy("batch_id", "corpus_id")
        .agg(
            F.sum(F.when(F.col("mh_b") == F.col("mh_c"), 1).otherwise(0)).alias(
                "n_match"
            )
        )
        .withColumn(
            "est_jaccard", F.round(F.col("n_match") / F.lit(num_hashes), 6)
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )
