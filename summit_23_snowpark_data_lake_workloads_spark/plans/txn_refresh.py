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


def refresh_chain_txn(
    catalog: PinnedCatalog,
    source: SnapshotTable,
    layers: list[tuple[str, RollupSpec]],
    app_id: str = "chain_txn",
    auto_repair: bool = True,
    through: int | None = None,
) -> dict:
    """One transactional tick of an N-layer rollup chain: fold
    ``source``'s new commits into the first layer, each staged layer
    into the next (read-your-writes inside the transaction), and swap
    EVERY layer's pin + idempotency stamp in one catalog CAS — a
    reader can never pair layer k's new state with layer k+1's stale
    one, at any depth. Returns ``{"modes": {name: mode},
    "catalog_version": v | None}``; modes are ``refresh_rollup``'s,
    ``catalog_version`` None when every layer was already current
    (nothing staged, no CAS spent).

    Per layer, the high-water is pinned BEFORE refreshing and stamped
    exactly (``through=``): an upstream commit racing the tick belongs
    to the next tick. Stamps live in the catalog (``txn_seen``) —
    staged-but-unpinned table stamps are not committed truth.

    Crash/conflict story: a crash or :class:`TransactionConflict`
    before the CAS leaves every pin and stamp untouched — the staged
    versions are orphans (``auto_repair`` clears them on the next
    tick) and the whole tick re-runs from the committed high-water
    marks. At most one catalog commit per tick ever lands, so replays
    are exact, not just idempotent-ish.

    ``through`` pins the FIRST layer's fact range upper bound instead
    of the source head read at call time — the streaming form
    (:func:`maintain_chain_stream`) feeds each drained range's upper
    version here so a tick folds exactly its micro-batch; later
    layers still consume the transaction's own staged heads."""
    if not layers:
        raise ValueError("layers must name at least one rollup table")
    if auto_repair:
        for name, _ in layers:
            catalog.repair(name)
    txn = catalog.transaction()
    modes: dict[str, str] = {}
    stamps: dict[str, int] = {}
    fact: SnapshotTable = source
    for i, (name, spec) in enumerate(layers):
        handle = txn.table(name)
        if i == 0 and through is not None:
            hi = through
        else:
            hi = fact.snapshot().version if fact._versions() else 0
        app = f"{app_id}:{name}"
        modes[name] = refresh_rollup(
            fact,
            handle,
            spec.prepare,
            spec.group_cols,
            spec.sum_cols,
            app_id=app,
            since=catalog.last_committed_batch(app),
            through=hi,
        )
        stamps[app] = hi
        fact = handle  # next layer consumes THIS txn's staged state
    if all(m == "noop" for m in modes.values()):
        txn.abandon()  # nothing staged: don't spend a catalog version
        return {"modes": modes, "catalog_version": None}
    v = txn.commit(stamps=stamps)
    return {"modes": modes, "catalog_version": v}


def maintain_chain_stream(
    catalog: PinnedCatalog,
    source: SnapshotTable,
    layers: list[tuple[str, RollupSpec]],
    checkpoint_dir: str,
    app_id: str = "chain_stream",
    max_commits_per_batch: int = 1,
    auto_repair: bool = True,
) -> list[dict]:
    """Continuously-maintained TRANSACTIONAL chain — the stream twin of
    :func:`refresh_chain_txn`, composing
    :class:`..streaming.cdf_source.ChangeFeedStream` (per-commit
    micro-batches over ``source``'s log) with the pinned catalog (all
    layers swap in ONE CAS): each drained range runs one chain tick
    pinned ``through`` the range's upper version, so an always-on
    medallion commits silver+gold (and deeper) atomically per
    micro-batch — a reader can never pair layer k's new state with
    layer k+1's stale one, and no tick folds more than its range.
    Returns one ``refresh_chain_txn`` result dict per drained range.

    Exactly-once across BOTH failure domains, each layer owning its
    own replay story:

    - **checkpoint loss** (the stream's offset dir deleted): the next
      drain replays the whole history as ranges, but every tick's
      high-water comes from the CATALOG's ``txn_seen`` stamps — an
      already-folded range makes every layer ``noop``, the tick
      abandons, and NO catalog version is spent (pins and stamps
      provably unmoved);
    - **crash/conflict mid-tick** (before the CAS): pins and stamps
      untouched, the staged versions are orphans ``auto_repair``
      clears, and the range re-runs on the next drain because the
      stream offset only advances after the tick returns.

    Scale: per drained range, the incremental-rollup cost model per
    layer (O(files the range's commits touched)) + one O(#tables)
    catalog CAS. ``max_commits_per_batch`` amortizes the CAS across
    tiny source commits. Reference anchor: the always-on dynamic-table
    form of the task DAG (``05_task_DAG.sql:9-25``) with Snowflake's
    cross-statement catalog consistency, self-managed."""
    from ..streaming.cdf_source import ChangeFeedStream

    stream = ChangeFeedStream(
        source, checkpoint_dir, max_commits_per_batch=max_commits_per_batch
    )
    results: list[dict] = []

    def tick(_v_lo: int, v_hi: int) -> None:
        results.append(
            refresh_chain_txn(
                catalog,
                source,
                layers,
                app_id=app_id,
                auto_repair=auto_repair,
                through=v_hi,
            )
        )

    stream.drain_ranges(tick)
    return results


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
    """One transactional tick of the two-layer medallion — the
    :func:`refresh_chain_txn` special case the reference's DAG shape
    needs (bronze -> silver -> gold). Returns ``{"silver": mode,
    "gold": mode, "catalog_version": v | None}``; stamp keys are
    ``{app_id}:{table_name}``, shared with the chain form."""
    r = refresh_chain_txn(
        catalog,
        bronze,
        [(silver_name, silver_spec), (gold_name, gold_spec)],
        app_id=app_id,
        auto_repair=auto_repair,
    )
    return {
        "silver": r["modes"][silver_name],
        "gold": r["modes"][gold_name],
        "catalog_version": r["catalog_version"],
    }
