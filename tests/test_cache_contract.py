"""The cache-lifecycle contract (cache.py): engine code persists shared
intermediates only through ``registered_persist``, and a caller that has
materialized its result can drop every block with ``release_caches`` —
no executor storage leaks across a long-lived session.

Pinned here by materializing every HEADLINE query at sf0.001 and
asserting the persistent-RDD set returns to its baseline after release.
Queries that go through ``connected_components`` additionally leave
``localCheckpoint`` blocks, which are freed by the ContextCleaner on GC
(asynchronously) rather than by ``release_caches`` — those are excused
from the strict empty-delta check but still must drain the registry.
"""

from __future__ import annotations

import pytest

from summit_23_snowpark_data_lake_workloads_spark import cache
from summit_23_snowpark_data_lake_workloads_spark.plans.queries import (
    HEADLINE,
    QUERIES,
)

#: HEADLINE queries whose plan calls localCheckpoint (connected
#: components): their blocks are ContextCleaner-owned, not registry-owned
_CHECKPOINTERS = {
    "training_corpus_pipeline",
    "training_corpus_pipeline_v2",
    # r13: the charlm score pass checkpoints its ~729-row trained model
    "charlm_doc_quality",
    # r14: dsir checkpoints its joint cr/ct model (non-headline, but
    # the parametrized release test below shares this excuse list)
    "dsir_importance_weights",
}


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@pytest.mark.parametrize("name", sorted(HEADLINE))
def test_headline_query_releases_all_caches(spark, sf_dir, name):
    baseline = _persistent_ids(spark)
    assert cache.registered_count() == 0, "registry dirty before query"
    try:
        QUERIES[name](spark, sf_dir).count()
    finally:
        released = cache.release_caches()
    assert cache.registered_count() == 0
    if name in _CHECKPOINTERS:
        return  # localCheckpoint blocks drain via ContextCleaner/GC
    leaked = _persistent_ids(spark) - baseline
    assert not leaked, (
        f"{name} left {len(leaked)} persisted RDDs after release "
        f"(released {released} registered frames)"
    )


def test_release_is_idempotent_and_recompute_safe(spark, sf_dir):
    """Releasing twice is a no-op, and a released plan still computes
    correctly (Spark recomputes the dropped blocks lazily)."""
    df = QUERIES["containment_near_subset"](spark, sf_dir)
    n1 = df.count()
    assert cache.release_caches() >= 1
    assert cache.release_caches() == 0
    assert df.count() == n1


def test_keyed_persist_shares_one_materialization(spark, sf_dir):
    """charlm + DSIR (and their composition, pipeline v2) must read the
    SAME persisted bigram count table in one session: the second builder
    never runs, and release clears the memo so a fresh build follows."""
    from summit_23_snowpark_data_lake_workloads_spark.plans.queries_ml import (
        _doc_bigram_counts,
    )

    try:
        a = _doc_bigram_counts(spark, sf_dir)
        b = _doc_bigram_counts(spark, sf_dir)
        assert a is b, "keyed_persist rebuilt a shared intermediate"
        assert cache.registered_count() == 1
        calls = []
        cache.keyed_persist(("k", 1), lambda: calls.append(1) or a)
        cache.keyed_persist(("k", 1), lambda: calls.append(1) or a)
        assert calls == [1], "memoized builder ran twice"
    finally:
        cache.release_caches()
    c = _doc_bigram_counts(spark, sf_dir)
    assert c is not a, "release_caches did not clear the keyed memo"
    cache.release_caches()


@pytest.mark.parametrize(
    "name", ["dsir_importance_weights", "knn_pq_adc", "semdedup_embeddings"]
)
def test_non_headline_persisting_queries_release(spark, sf_dir, name):
    """Non-headline queries that persist intermediates (DSIR's count
    table, ADC's distance table) must honor the same release contract
    as the headline set."""
    baseline = _persistent_ids(spark)
    assert cache.registered_count() == 0
    try:
        QUERIES[name](spark, sf_dir).count()
    finally:
        cache.release_caches()
    assert cache.registered_count() == 0
    if name in _CHECKPOINTERS:
        return  # localCheckpoint blocks drain via ContextCleaner/GC
    leaked = _persistent_ids(spark) - baseline
    assert not leaked, f"{name} left {len(leaked)} persisted RDDs"
