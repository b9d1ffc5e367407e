"""Incrementally-maintained rollups (operators/rollup.py): incremental
== full recompute after every append, removal commits force a full
fallback, refreshes are idempotent, and the incremental path reads
only the appended files."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.rollup import (
    files_added_between,
    refresh_rollup,
)
from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
    SnapshotTable,
)


def _events(spark, lo, hi):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1 + i % 4, 8), float(i))
            for i in range(lo, hi)
        ],
        "id int, ts timestamp, v double",
    )


def _prepare(df):
    return df.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("v")
    )


def _state(rollup):
    return sorted(
        (r.day, r.n_rows, r.sum_v) for r in rollup.read().collect()
    )


def _full(spark, fact):
    return sorted(
        (r.day, r.n_rows, r.sum_v)
        for r in _prepare(fact.read())
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.sum("v").alias("sum_v"))
        .collect()
    )


@pytest.fixture()
def tables(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "fact"))
    rollup = SnapshotTable(spark, str(tmp_path / "roll"), partition_by=["day"])
    fact.create(_events(spark, 0, 20))
    return fact, rollup


def test_first_refresh_is_full_then_incremental(spark, tables):
    fact, rollup = tables
    assert refresh_rollup(fact, rollup, _prepare, ["day"], ["v"]) == "full"
    assert _state(rollup) == _full(spark, fact)
    fact.append(_events(spark, 20, 30))
    assert (
        refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
        == "incremental"
    )
    assert _state(rollup) == _full(spark, fact)


def test_refresh_is_idempotent_noop(spark, tables):
    fact, rollup = tables
    refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
    assert refresh_rollup(fact, rollup, _prepare, ["day"], ["v"]) == "noop"
    v = rollup.snapshot().version
    refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
    assert rollup.snapshot().version == v


def test_incremental_touches_only_changed_partitions(spark, tables):
    fact, rollup = tables
    refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
    before = {
        f: p for f, p in (rollup.snapshot().parts or {}).items()
    }
    # append rows for ONE day only
    fact.append(
        spark.createDataFrame(
            [(99, dt.datetime(2024, 1, 2, 9), 5.0)],
            "id int, ts timestamp, v double",
        )
    )
    refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
    after = rollup.snapshot()
    carried = [f for f in after.files if f in before]
    # untouched days' files carried by reference; only 2024-01-02 rewritten
    assert carried and all(
        before[f]["day"] != "2024-01-02" for f in carried
    )
    assert _state(rollup) == _full(spark, fact)


def test_removal_commit_forces_full(spark, tables):
    fact, rollup = tables
    refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
    fact.append(_events(spark, 20, 24))
    fact.delete(F.col("id") % 5 == 0)
    assert refresh_rollup(fact, rollup, _prepare, ["day"], ["v"]) == "full"
    assert _state(rollup) == _full(spark, fact)


def test_files_added_between_spans_checkpoints(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "ck"))
    fact.create(_events(spark, 0, 4))
    for i in range(10):  # crosses the every-8 full-manifest checkpoint
        fact.append(_events(spark, 4 + i, 5 + i))
    added, removed = files_added_between(fact, 1, fact.snapshot().version)
    assert not removed
    got = set(added)
    want = set(fact.snapshot().files) - set(fact._load(1).files)
    assert got == want


def test_unpartitioned_rollup_overwrite_path(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "f2"))
    rollup = SnapshotTable(spark, str(tmp_path / "r2"))  # unpartitioned
    fact.create(_events(spark, 0, 12))
    refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
    fact.append(_events(spark, 12, 16))
    assert (
        refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
        == "incremental"
    )
    assert _state(rollup) == _full(spark, fact)


def test_vacuum_expired_range_forces_full(spark, tmp_path):
    """When the refresh range's manifests expired under vacuum, the
    add-lists are gone — incremental is unprovable and the refresh
    must fall back to a FULL recompute (and still be correct)."""
    fact = SnapshotTable(spark, str(tmp_path / "fv"))
    rollup = SnapshotTable(spark, str(tmp_path / "rv"), partition_by=["day"])
    fact.create(_events(spark, 0, 8))
    refresh_rollup(fact, rollup, _prepare, ["day"], ["v"])
    for i in range(3):
        fact.append(_events(spark, 8 + 4 * i, 12 + 4 * i))
    fact.vacuum(retain_last=1)  # expires the manifests the range needs
    assert (
        refresh_rollup(fact, rollup, _prepare, ["day"], ["v"]) == "full"
    )
    assert _state(rollup) == _full(spark, fact)
