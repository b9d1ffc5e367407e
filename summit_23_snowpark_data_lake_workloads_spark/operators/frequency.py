"""Frequent-items (heavy hitters) at scale: two-pass
candidate-prune + exact recount.

The naive plan — ``groupBy(key).count().filter(freq > theta*N)`` —
shuffles EVERY distinct key. At 100 TB with billions of distinct keys
that shuffle dominates the job even though the answer is a handful of
rows. The two-pass plan bounds the shuffle to candidates only:

pass 1 (no shuffle): each partition counts locally (mapInPandas,
  vectorized ``value_counts``) and emits only keys with local count
  > theta * partition_rows. Pigeonhole guarantee: a key with GLOBAL
  count > theta*N must exceed theta*N_p in at least one partition (if
  it were <= theta*N_p in every one, summing gives <= theta*N) — the
  candidate union is a strict superset of the true heavy hitters.
pass 2: broadcast-semi-join the candidates into the fact stream and
  exact-count just them — so the ONLY shuffle carries candidate keys.

The result is EXACT (not a sketch): pass-1 can only over-admit, and
pass-2 recounts precisely — which is why a plain SQL oracle can check
it. Per-partition memory is the partition's distinct-key count
(value_counts dict); cap partition size via maxPartitionBytes before
that becomes a concern.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cache import registered_persist


def heavy_hitters(df: DataFrame, key, theta: float = 0.01) -> DataFrame:
    """Keys whose frequency exceeds ``theta`` of ``df``'s rows, with
    exact counts: (key, freq). ``key`` is a column name or Column
    expression; it must be long-typed (hash or bucket wider types to
    int64 first — a 100 TB heavy-hitter key should be a fixed-width
    token anyway)."""
    if not 0 < theta < 1:
        raise ValueError(f"theta must be in (0,1), got {theta}")
    keyed = df.select(F.col(key).alias("k") if isinstance(key, str) else key.alias("k"))
    if not isinstance(keyed.schema["k"].dataType, T.LongType):
        raise TypeError("heavy_hitters requires a bigint key column")

    def local_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            n += len(pdf)
            counts.update(pdf["k"].value_counts().to_dict())
        cut = theta * n
        cand = [k for k, c in counts.items() if c > cut]
        # one sentinel row (k NULL) carries this partition's row count,
        # so the global N falls out of pass 1 — no separate count() scan
        yield pd.DataFrame(
            {
                "k": pd.array(cand + [None], dtype="Int64"),
                "rows": pd.array([None] * len(cand) + [n], dtype="Int64"),
            }
        )

    # pass-1 output is tiny (candidates + one sentinel per partition);
    # persist it so reading the total and the candidate join don't each
    # re-scan the fact table through mapInPandas
    pass1 = registered_persist(
        keyed.mapInPandas(local_candidates, "k long, rows long")
    )
    total = pass1.agg(F.sum("rows")).first()[0] or 0
    candidates = pass1.filter(F.col("k").isNotNull()).select("k").distinct()
    return (
        keyed.join(F.broadcast(candidates), "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > theta * total)
    )
