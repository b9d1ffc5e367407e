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

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: Default storage level for engine persists: SERIALIZED memory+disk.
#: ``DataFrame.persist()``'s default (MEMORY_AND_DISK_DESER) builds the
#: deserialized columnar cache, which on this Spark 4.1 runtime measures
#: ~5-10x slower to materialize and ~6x slower to re-read than the
#: serialized form (1M-row distinct: 10.7s build / 0.9s read deser vs
#: 1.1-3.3s / 0.15s serialized — see OPTIMIZATION_r15.md). Serialized
#: batches are also the smaller footprint at 100 TB executor counts:
#: less storage-memory pressure, less eviction of concurrent queries.
CACHE_LEVEL = StorageLevel.MEMORY_AND_DISK

#: DataFrames persisted by engine code and not yet released.
_REGISTRY: list[DataFrame] = []

#: Keyed persisted intermediates shared ACROSS query functions in one
#: session (e.g. the per-document bigram count table read by both the
#: char-LM scorer and the DSIR weigher). Entries live until
#: :func:`release_caches`.
_KEYED: dict[object, DataFrame] = {}

#: Keyed driver-side values (e.g. a trained BPE merge list) memoized for
#: the session — same lifecycle as :data:`_KEYED`.
_KEYED_VALUES: dict[object, object] = {}

#: Guards the get-then-set on both keyed registries: in a concurrent
#: long-lived service two callers could otherwise race, double-build a
#: corpus-sized intermediate, and pin two copies in executor storage.
#: The build itself runs under the lock — double-building costs far
#: more than briefly serializing cache misses.
_LOCK = threading.Lock()


def registered_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist(CACHE_LEVEL)`` + enrollment in the session registry so
    :func:`release_caches` can unpersist it once the caller is done."""
    df = df.persist(CACHE_LEVEL if storage_level is None else storage_level)
    _REGISTRY.append(df)
    return df


def keyed_persist(key: object, builder) -> DataFrame:
    """Memoized :func:`registered_persist`: the first call under ``key``
    builds and persists; later calls (until :func:`release_caches`)
    return the SAME cached DataFrame, so query functions that compose —
    ``charlm_doc_quality`` + ``dsir_importance_weights`` inside
    ``training_corpus_pipeline_v2`` — share one materialization of a
    corpus-sized intermediate instead of exploding the text twice.

    ``key`` must capture everything the built plan depends on (session
    application id, table directory, parameters)."""
    with _LOCK:
        df = _KEYED.get(key)
        if df is None:
            df = registered_persist(builder())
            _KEYED[key] = df
        return df


def keyed_value(key: object, builder):
    """Driver-side analog of :func:`keyed_persist` for plain Python
    values — e.g. the trained BPE merge list, which several consuming
    queries would otherwise re-learn with a full corpus pass each.
    Cleared by :func:`release_caches` alongside the DataFrame caches."""
    with _LOCK:
        if key not in _KEYED_VALUES:
            _KEYED_VALUES[key] = builder()
        return _KEYED_VALUES[key]


def release_caches() -> int:
    """Unpersist every registered DataFrame; returns how many were
    released. Blocking=False: block cleanup proceeds asynchronously."""
    with _LOCK:
        _KEYED.clear()
        _KEYED_VALUES.clear()
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
