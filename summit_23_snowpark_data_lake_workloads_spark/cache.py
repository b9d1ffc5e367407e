"""Session-scoped cache registry: persist with a release contract.

Query functions return LAZY DataFrames, so an intermediate persisted
inside one (a distinct-shingle table, a TF-IDF weight table) cannot be
unpersisted before the function returns — the caller has not executed
the plan yet. Bare ``.persist()`` therefore leaks executor storage
across a long-lived session: Spark's CacheManager pins the blocks until
someone calls ``unpersist``, and nobody holding the reference ever does.

The contract here:

- engine code persists shared intermediates through
  :func:`registered_persist` (never bare ``DataFrame.persist``);
- a caller that has materialized the result calls
  :func:`release_caches` to drop every registered block
  (``bench.py`` does so between queries; long-lived services do so per
  request batch). Releasing is idempotent and safe while other plans
  are running — Spark recomputes lazily if a released block is needed
  again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: DataFrames persisted by engine code and not yet released.
_REGISTRY: list[DataFrame] = []


def registered_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` + enrollment in the session registry so
    :func:`release_caches` can unpersist it once the caller is done."""
    df = df.persist() if storage_level is None else df.persist(storage_level)
    _REGISTRY.append(df)
    return df


def release_caches() -> int:
    """Unpersist every registered DataFrame; returns how many were
    released. Blocking=False: block cleanup proceeds asynchronously."""
    n = 0
    while _REGISTRY:
        df = _REGISTRY.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped: nothing to release
    return n


def registered_count() -> int:
    """Number of currently-registered (unreleased) cached DataFrames."""
    return len(_REGISTRY)
