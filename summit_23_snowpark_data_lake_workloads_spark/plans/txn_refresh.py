"""TRANSACTION-SCOPED medallion refresh — silver and gold move in ONE
catalog commit, so a dashboard can never read a new silver against a
stale gold (or vice versa).

The reference's task DAG refreshes CUSTOMER_PROCESSED and then its
children (``05_task_DAG.sql:9-25``); each Snowflake step is its own
transaction, and Snowflake's catalog keeps cross-statement readers
consistent. Self-managed tables get that only if the refresh commits
through a :class:`..sources.txn_catalog.PinnedCatalog`: the rollup
steps stage normal table versions (durable, unpinned), and one CAS
exposes the silver+gold pair atomically.

Correctness subtleties this module owns (stated, not hidden):

- **Stamps live in the catalog, not the table logs.** A staged rollup
  commit carries ``refresh_rollup``'s usual txn stamp, but a stamp in
  an UNPINNED version is not committed truth — an abandoned
  transaction would leave a stamp that makes the next refresh think
  the work is done (a permanent ``noop`` wedge). The refresh therefore
  feeds ``refresh_rollup`` the CATALOG's ``txn_seen`` high-water mark
  (``since=``) and folds the new marks into the SAME CAS that swaps
  the pins — stamp and effect commit atomically, the exactly-once
  contract.
- **Wedged logs are repaired, not worked around.** An abandoned or
  conflicted transaction leaves orphan staged versions; the
  foreign-staged-lineage check then refuses every later transaction on
  that table. ``auto_repair`` rolls the log back to the pin's content
  and re-pins (:meth:`PinnedCatalog.repair`) before staging — content
  identical to readers throughout.
- **Gold reads the transaction's OWN staged silver** (read-your-writes
  inside the transaction): its refresher consumes the silver handle's
  log head, which includes the silver commit staged a moment earlier,
  so one transaction carries the fact delta through BOTH layers.

Scale: identical to the non-transactional refresh — each layer's cost
is the incremental-rollup cost model (O(files the range touched)) —
plus one O(#tables) catalog CAS. Cross-layer consistency at 100 TB is
a metadata price.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from ..operators.rollup import refresh_rollup
from ..sources.lakehouse import SnapshotTable
from ..sources.txn_catalog import PinnedCatalog


@dataclass
class RollupSpec:
    """One rollup layer: ``prepare`` maps input rows to grouped form
    (the ``refresh_rollup`` contract), ``group_cols``/``sum_cols`` name
    the additive aggregate."""

    prepare: Callable[[DataFrame], DataFrame]
    group_cols: list[str] = field(default_factory=list)
    sum_cols: list[str] = field(default_factory=list)


def refresh_medallion_txn(
    catalog: PinnedCatalog,
    bronze: SnapshotTable,
    silver_name: str,
    gold_name: str,
    silver_spec: RollupSpec,
    gold_spec: RollupSpec,
    app_id: str = "medallion_txn",
    auto_repair: bool = True,
) -> dict:
    """One transactional tick of the medallion: fold bronze's new
    commits into ``silver_name``, fold the staged silver into
    ``gold_name``, swap both pins + both idempotency stamps in one
    catalog CAS. Returns ``{"silver": mode, "gold": mode,
    "catalog_version": v | None}`` where modes are ``refresh_rollup``'s
    (``noop`` / ``incremental`` / ``incremental_cdf`` / ``full``) and
    ``catalog_version`` is None when both layers were already current
    (nothing staged, no CAS spent).

    Crash/conflict story: a crash or :class:`TransactionConflict`
    before the CAS leaves both tables' pins and stamps untouched —
    the staged versions are orphans (``auto_repair`` clears them on
    the next tick) and the whole tick re-runs from the committed
    high-water marks. At most one catalog commit per tick ever lands,
    so replays are exact, not just idempotent-ish."""
    silver_app = f"{app_id}:silver"
    gold_app = f"{app_id}:gold"
    if auto_repair:
        catalog.repair(silver_name)
        catalog.repair(gold_name)
    txn = catalog.transaction()
    silver = txn.table(silver_name)
    gold = txn.table(gold_name)
    # pin each layer's high-water BEFORE refreshing, and stamp exactly
    # that: a bronze commit racing in after this read belongs to the
    # NEXT tick (fold/stamp disagreement would skip or double-count it)
    b_hi = bronze.snapshot().version
    m_s = refresh_rollup(
        bronze,
        silver,
        silver_spec.prepare,
        silver_spec.group_cols,
        silver_spec.sum_cols,
        app_id=silver_app,
        since=catalog.last_committed_batch(silver_app),
        through=b_hi,
    )
    # gold consumes the staged silver (read-your-writes): its fact
    # head is the version the silver refresh just staged
    s_hi = silver.snapshot().version if silver._versions() else 0
    m_g = refresh_rollup(
        silver,
        gold,
        gold_spec.prepare,
        gold_spec.group_cols,
        gold_spec.sum_cols,
        app_id=gold_app,
        since=catalog.last_committed_batch(gold_app),
        through=s_hi,
    )
    stamps = {silver_app: b_hi, gold_app: s_hi}
    if m_s == "noop" and m_g == "noop":
        txn.abandon()  # nothing staged: don't spend a catalog version
        return {"silver": m_s, "gold": m_g, "catalog_version": None}
    v = txn.commit(stamps=stamps)
    return {"silver": m_s, "gold": m_g, "catalog_version": v}
