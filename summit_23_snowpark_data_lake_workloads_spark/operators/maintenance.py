"""Threshold-driven table maintenance (auto-OPTIMIZE / auto-VACUUM).

The streaming sinks already run maintenance on a CADENCE (every N-th
micro-batch — ``streaming/lakehouse_sink.py``), which is the right
shape when one writer owns the table. A shared 100 TB lakehouse needs
the other shape: a policy engine that inspects a table's CURRENT state
(``SnapshotTable.describe_detail`` — manifest + footer metadata, no
data read) and triggers exactly the maintenance the state calls for —
Delta's auto-optimize / auto-compact behavior, re-expressed over our
snapshot tables:

- **fragmentation**: more than ``min_small_files`` live files under
  ``small_file_bytes`` → bin-pack the small ones (rewrite cost is
  proportional to the FRAGMENTATION, never the table);
- **deletion-vector burden**: any file whose soft-deleted row fraction
  reaches ``dv_fraction`` → rewrite it to re-materialize survivors and
  drop its vectors (merge-on-read deletes/updates stay cheap to WRITE
  only while the read-side burden is bounded);
- **manifest history**: more than ``max_history`` committed versions →
  vacuum down to ``vacuum_retain_last`` (bounds manifest-fold cost and
  reclaims orphaned data files).

``plan_maintenance`` is the pure decision function (metadata-only,
returns what WOULD run and why); ``auto_maintain`` executes the plan.
Keeping the decision pure makes the policy testable without paying for
rewrites, and lets an orchestrator (``plans/dag.py``) run the decision
on every DAG tick but the rewrites only when thresholds trip.

Reference anchor: the reference leaves maintenance to the platform
(Snowflake micro-partition auto-clustering happens behind
``04_sales_enrich_sp.sql``'s overwrite); self-managed parquet tables
need it explicit — this module is that explicit tier.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from ..sources.lakehouse import SnapshotTable, _ranges_count


@dataclass(frozen=True)
class MaintenancePolicy:
    """Thresholds that trip maintenance, and the shape it runs with.

    ``small_file_bytes`` / ``min_small_files`` — fragmentation trigger:
    compact only when at least ``min_small_files`` live files are
    smaller than ``small_file_bytes`` (one or two stragglers are not
    worth a rewrite commit).

    ``dv_fraction`` — deletion-vector purge trigger: any file whose
    soft-deleted fraction is at or above this is rewritten (``None``
    disables the trigger). A single qualifying file trips it —
    mostly-dead files pay full scan cost for few live rows.

    ``target_file_bytes`` — desired output file size; the compaction's
    ``target_files`` is derived from the candidates' total live bytes,
    so output sizing tracks the data rather than a fixed count.

    ``max_history`` / ``vacuum_retain_last`` / ``orphan_grace_ms`` —
    history trigger: when more than ``max_history`` versions are
    committed, vacuum down to ``vacuum_retain_last`` (``None`` never
    vacuums — the time-travel-preserving default).
    """

    small_file_bytes: int = 32 << 20
    min_small_files: int = 8
    dv_fraction: float | None = 0.3
    target_file_bytes: int = 128 << 20
    max_history: int | None = None
    vacuum_retain_last: int = 2
    orphan_grace_ms: int = 3_600_000


def plan_maintenance(table: SnapshotTable, policy: MaintenancePolicy) -> dict:
    """Decide what maintenance ``table``'s current state calls for.

    Pure metadata work: live file sizes (one ``stat`` each), DV row
    counts and per-file row counts from the manifest, version count
    from the manifest directory listing. No Spark job, no data read.

    Returns ``{"compact": {...} | None, "vacuum": {...} | None,
    "reasons": [str, ...]}`` — ``compact`` holds the exact kwargs
    :meth:`SnapshotTable.compact` should run with.
    """
    snap = table.snapshot()
    reasons: list[str] = []

    sizes: dict[str, int] = {}
    for f in snap.files:
        try:
            sizes[f] = os.path.getsize(os.path.join(table.path, f))
        except OSError:
            pass  # concurrently vacuumed clone reference
    small = [f for f, s in sizes.items() if s < policy.small_file_bytes]

    dvs = snap.dvs or {}
    stats = snap.stats or {}
    dv_heavy: list[str] = []
    if policy.dv_fraction is not None:
        for f, runs in dvs.items():
            nrows = stats.get(f, {}).get("_nrows")
            frac = (
                _ranges_count(runs) / nrows[0]
                if nrows and nrows[0]
                else 1.0  # no row stats: treat as rewrite-worthy
            )
            if frac >= policy.dv_fraction:
                dv_heavy.append(f)

    compact_kwargs: dict | None = None
    if len(small) >= policy.min_small_files or dv_heavy:
        candidate_bytes = sum(
            sizes.get(f, 0) for f in set(small) | set(dv_heavy)
        )
        target = max(1, math.ceil(candidate_bytes / policy.target_file_bytes))
        compact_kwargs = {
            "target_files": target,
            "small_file_bytes": policy.small_file_bytes
            if len(small) >= policy.min_small_files
            else 1,  # dv-only trip: size packing stays out of scope
            "dv_fraction": policy.dv_fraction if dv_heavy else None,
        }
        if len(small) >= policy.min_small_files:
            reasons.append(
                f"fragmentation: {len(small)} files under "
                f"{policy.small_file_bytes} bytes"
            )
        if dv_heavy:
            reasons.append(
                f"dv burden: {len(dv_heavy)} file(s) at or above "
                f"{policy.dv_fraction:.0%} soft-deleted"
            )

    vacuum_kwargs: dict | None = None
    if policy.max_history is not None:
        n_versions = len(table._versions())
        if n_versions > policy.max_history:
            vacuum_kwargs = {
                "retain_last": policy.vacuum_retain_last,
                "orphan_grace_ms": policy.orphan_grace_ms,
            }
            reasons.append(
                f"history: {n_versions} versions > {policy.max_history}"
            )

    return {"compact": compact_kwargs, "vacuum": vacuum_kwargs,
            "reasons": reasons}


def auto_maintain(
    table: SnapshotTable,
    policy: MaintenancePolicy,
    keep_versions: list[int] | None = None,
) -> dict:
    """Run whatever :func:`plan_maintenance` decided; return the plan
    extended with what actually happened (``compacted_to_version``,
    ``vacuumed_files``). Compaction runs before vacuum so the files it
    orphans are sweep candidates in the same pass (subject to the
    orphan grace — an in-flight writer's staged files are spared).

    Ordering under contention: compaction commits via the standard
    conflict check (it aborts against an overlapping concurrent
    rewrite rather than losing rows), so ``auto_maintain`` is safe to
    run from a sidecar maintenance job while writers stream — the
    exact deployment shape at 100 TB (maintenance OWNS no table; it
    reacts to state).

    ``keep_versions`` — extra versions the history vacuum must retain
    (passed through to ``vacuum``): REQUIRED for catalog-registered
    tables, whose pin may sit behind the head — prefer
    :func:`auto_maintain_catalog`, which feeds it automatically.
    Table tags are honored by ``vacuum`` itself either way."""
    plan = plan_maintenance(table, policy)
    if plan["compact"] is not None:
        snap = table.compact(**plan["compact"])
        plan["compacted_to_version"] = snap.version
    if plan["vacuum"] is not None:
        removed = table.vacuum(
            **plan["vacuum"], keep_versions=keep_versions
        )
        plan["vacuumed_files"] = len(removed)
    return plan


def auto_maintain_catalog(catalog, policy: MaintenancePolicy) -> dict:
    """Policy-driven maintenance across every table a
    :class:`..sources.txn_catalog.PinnedCatalog` registers — the
    nightly loop a transactional warehouse runs. Per table:
    plan/compact/vacuum exactly like :func:`auto_maintain`, but the
    history vacuum always keeps the CATALOG PIN (a long-staging
    transaction's pin may trail the log head; sweeping it would break
    the catalog's serving version — the same hazard
    ``PinnedCatalog.vacuum`` closes for manual runs). Compaction lands
    in the table log UNPINNED like any other commit; the pin moves
    when a transaction next commits, and catalog readers keep serving
    the retained pinned version meanwhile. Returns ``{table_name:
    plan}``.

    Deliberately NOT done here: ``repair()`` — maintenance reacting to
    state must not roll back what might be a LIVE stager's lineage;
    un-wedging is the refresh orchestrator's call
    (``plans/txn_refresh.py``), which owns the cadence and knows no
    rival is mid-stage. For the same reason, schedule this BETWEEN
    transactions: a compaction commit landing while a transaction
    stages puts the log head past the next transaction's pin, and the
    lineage check will refuse until the orchestrator repairs — always
    content-safe (repair restores the pin's bytes), but the staged
    work is lost."""
    out: dict[str, dict] = {}
    st = catalog.state()
    for name, entry in st["tables"].items():
        t = catalog.table(name)
        keeps = [entry["pin"]] if entry["pin"] else None
        out[name] = auto_maintain(t, policy, keep_versions=keeps)
    return out
