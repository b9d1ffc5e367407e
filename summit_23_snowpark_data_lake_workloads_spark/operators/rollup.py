"""Incrementally-maintained rollup tables over the lakehouse — the
BATCH twin of the reference's Processed-layer dynamic table (the
architecture diagram's declarative incremental materialization;
``streaming/incremental.py`` is the Structured-Streaming form, this is
the manifest-driven form a scheduled task DAG runs).

The 100 TB shape: a refresh reads ONLY the fact files appended since
the last refresh (recovered from the commit manifests — metadata, not
a table diff), aggregates that delta, and rewrites only the rollup
partitions the delta touches (``overwrite_partitions`` carries every
other group by reference). Refresh cost is O(new data + touched
groups), never O(fact table) — a nightly 1 TB append against a 100 TB
fact refreshes from the 1 TB.

Soundness boundary, stated not hidden: the incremental path is valid
for APPEND-ONLY ranges and ADDITIVE aggregates (count, sum). Any
commit in the range that removed files (delete / merge / compact /
overwrite / drop_partitions — COW moves rows between files, so
add-lists alone would double-count) triggers a FULL recompute instead;
Delta/Databricks materialized views draw the identical line. Averages
come out of (sum, count) pairs downstream; non-additive aggregates
(distinct, quantiles) belong to the mergeable sketches
(operators/sketches.py), which compose with exactly this refresh loop.

The refresh high-water mark is the fact VERSION, stored in the rollup
table's own txn stamps (``app_id``/``batch_id`` — the same
exactly-once machinery the streaming sinks use), so refreshes are
idempotent: a re-run of an already-applied refresh is a metadata no-op
even across a crash between computing and committing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.lakehouse import SnapshotTable

#: rollup column holding COUNT(*) per group
N_ROWS = "n_rows"


def files_added_between(
    fact: SnapshotTable, v_lo: int, v_hi: int
) -> tuple[list[str], bool]:
    """Data files first referenced in versions ``(v_lo, v_hi]`` and
    whether ANY commit in the range removed files. Pure manifest work:
    delta manifests carry their ``add``/``remove`` lists directly;
    checkpoint FULL manifests diff against the prior version's resolved
    file set (bounded by the checkpoint interval)."""
    added: list[str] = []
    removed_any = False
    prev_files: set | None = None
    for v in range(v_lo + 1, v_hi + 1):
        raw = fact._raw(v)
        if "files" in raw or "shard_index" in raw:
            cur = set(fact._load(v).files)
            if prev_files is None:
                prev_files = set(fact._load(v - 1).files) if v > 1 else set()
            added += sorted(cur - prev_files)
            if prev_files - cur:
                removed_any = True
            prev_files = cur
        else:
            added += raw.get("add", [])
            if raw.get("remove"):
                removed_any = True
            prev_files = None  # only needed ahead of a checkpoint diff
    return added, removed_any


def refresh_rollup(
    fact: SnapshotTable,
    rollup: SnapshotTable,
    prepare,
    group_cols: list[str],
    sum_cols: list[str],
    app_id: str = "rollup",
) -> str:
    """Bring ``rollup`` up to date with ``fact``. Returns how:
    ``"noop"`` (already current), ``"incremental"`` (append-only range:
    aggregated the added files, rewrote touched groups), or ``"full"``
    (first refresh, or the range contained removals).

    ``prepare`` maps raw fact rows to grouped form — it must emit
    ``group_cols`` + ``sum_cols`` (e.g. derive ``day`` from ``ts``).
    The rollup schema is ``group_cols + [n_rows] + sum_<c>`` for each
    sum column. Partition ``rollup`` by its group column(s) to get
    touched-groups-only rewrites; unpartitioned rollups fall back to a
    whole-table overwrite (they are aggregate-sized — still cheap, just
    not partition-local)."""
    v_hi = fact.snapshot().version
    seen = (
        rollup.last_committed_batch(app_id) if rollup._versions() else None
    )
    if seen is not None and v_hi <= seen:
        return "noop"
    txn = {"app_id": app_id, "batch_id": v_hi}

    def aggregate(df: DataFrame) -> DataFrame:
        return (
            prepare(df)
            .groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).cast("long").alias(N_ROWS),
                *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
            )
        )

    if seen is None:
        full = aggregate(fact.read())
        if rollup._versions():
            rollup.overwrite(full, txn=txn)
        else:
            rollup.create(full, txn=txn)
        return "full"

    try:
        added, removed_any = files_added_between(fact, seen, v_hi)
    except (FileNotFoundError, LookupError):
        # the range's manifests expired under vacuum: the add-lists are
        # gone, so incremental is unprovable — recompute
        removed_any, added = True, []
    if removed_any:
        rollup.overwrite(aggregate(fact.read()), txn=txn)
        return "full"
    if not added:
        # metadata-only fact commits (e.g. spec evolution): advance the
        # high-water mark without touching data
        rollup._commit("refresh_noop", rollup.snapshot().version, [], txn=txn)
        return "incremental"

    spark = rollup.spark
    delta = aggregate(
        spark.read.parquet(*[os.path.join(fact.path, f) for f in added])
    )
    sums = [N_ROWS] + [f"sum_{c}" for c in sum_cols]
    existing = rollup.read().join(
        F.broadcast(delta.select(*group_cols).distinct()), group_cols
    )
    combined = (
        existing.unionByName(delta)
        .groupBy(*group_cols)
        .agg(*[F.sum(c).alias(c) for c in sums])
        .select(*group_cols, F.col(N_ROWS).cast("long").alias(N_ROWS),
                *[F.col(f"sum_{c}") for c in sum_cols])
    )
    if rollup.partition_by:
        rollup.overwrite_partitions(combined, txn=txn)
    else:
        untouched = rollup.read().join(
            F.broadcast(delta.select(*group_cols).distinct()),
            group_cols,
            "left_anti",
        )
        rollup.overwrite(untouched.unionByName(combined), txn=txn)
    return "incremental"
