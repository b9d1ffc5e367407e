"""Task-DAG runner (SURVEY §2.10 X1-X3; ``05_task_DAG.sql:3-25``).

The reference schedules a root task every 60 minutes with two children
running AFTER it. Spark-native equivalent: a topologically-ordered runner
of plain Python step functions ``step(spark) -> str`` (the SP tier, U2),
with structured logging (X3) and a pluggable notifier (U4 —
``system$send_email`` becomes a log/webhook stub). Scheduling cadence is
the caller's concern (cron / Airflow / ``trigger(availableNow=True)``
for streaming steps).
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

logger = logging.getLogger("summit23.dag")


@dataclass
class Step:
    """One task: name, handler, and AFTER-edges (names of prerequisite steps)."""

    name: str
    fn: Callable[[SparkSession], str]
    after: list[str] = field(default_factory=list)


class Notifier:
    """U4 stand-in for ``system$send_email`` (``common_utils.py:9-16``,
    integration ``01_setup.sql:35-40``): default implementation logs;
    subclass for SMTP/webhook."""

    def send(self, subject: str, body: str) -> None:
        logger.info("NOTIFY: %s | %s", subject, body)


def topo_order(steps: list[Step]) -> list[Step]:
    """Kahn topological sort over AFTER edges; raises on cycles/unknown deps."""
    by_name = {s.name: s for s in steps}
    for s in steps:
        unknown = [d for d in s.after if d not in by_name]
        if unknown:
            raise ValueError(f"step {s.name} depends on unknown steps {unknown}")
    done: set[str] = set()
    ordered: list[Step] = []
    remaining = list(steps)
    while remaining:
        ready = [s for s in remaining if all(d in done for d in s.after)]
        if not ready:
            raise ValueError(f"dependency cycle among {[s.name for s in remaining]}")
        for s in ready:
            ordered.append(s)
            done.add(s.name)
            remaining.remove(s)
    return ordered


def run_dag(
    spark: SparkSession,
    steps: list[Step],
    notifier: Notifier | None = None,
    event_table: str | None = None,
) -> dict[str, str]:
    """Run all steps respecting AFTER edges; returns {name: status string}.

    Mirrors the reference DAG wiring (X2): CUSTOMER_PROCESSED ->
    {INVOICE_PROCESSED, SALES_ENRICH_CURATED}. Steps return status strings
    ("TABLE LOADED") exactly like the reference SPs (``02:40`` etc.);
    failures propagate after notification.

    ``event_table``: X3's event-table sink (``01_setup.sql:23-31`` routes
    SP ``logging`` calls into ``COMMON.EVENTS.SUMMIT_EVENTS``) — when set,
    one row per step outcome (ts, step, status, duration, error) appends
    to that catalog table; one tiny batched write per run, after the
    steps, so observability never interleaves with pipeline writes.
    """
    notifier = notifier or Notifier()
    results: dict[str, str] = {}
    events: list[tuple] = []
    try:
        for step in topo_order(steps):
            t0 = time.perf_counter()
            logger.info("step %s: started", step.name)
            try:
                results[step.name] = step.fn(spark)
            except Exception as exc:
                events.append(
                    (time.time(), step.name, "FAILED", time.perf_counter() - t0, str(exc))
                )
                notifier.send(f"DAG step {step.name} FAILED", "see logs")
                raise
            dt = time.perf_counter() - t0
            events.append((time.time(), step.name, results[step.name], dt, None))
            logger.info("step %s: finished in %.2fs -> %s", step.name, dt, results[step.name])
        notifier.send("DAG completed", f"steps={list(results)}")
    finally:
        if event_table is not None and events:
            spark.createDataFrame(
                events,
                "ts double, step string, status string, duration_s double, error string",
            ).write.mode("append").saveAsTable(event_table)
    return results
