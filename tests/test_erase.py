"""Right-to-be-forgotten erasure (sources/lakehouse.py:erase_rows):
every PHYSICAL trace of the subject's rows must leave the table
directory — live files, DV-hidden pre-images, historical versions, and
persisted change-data-feed sidecars. The strongest assertion here reads
every parquet file under the table root RAW (no manifest, no DV filter)
and requires zero subject rows anywhere on disk."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
    SnapshotTable,
)


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .coalesce(1)
        .select(F.col("id").cast("int").alias("id"))
    )


def _all_parquet_ids(spark, root):
    files = glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    if not files:
        return set()
    return {
        r.id
        for r in spark.read.option("mergeSchema", "true")
        .parquet(*files)
        .select("id")
        .collect()
    }


def test_erase_purges_every_surface(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), cdf=True)
    t.create(_df(spark, 0, 5))     # v1: file A (0-4)
    t.append(_df(spark, 5, 10))    # v2: file B (5-9)
    t.delete_mor(F.col("id") == 3)  # v3: subject row 3 DV-hidden, bytes
    #                                 remain in A AND in a CDF sidecar
    rpt = t.erase_rows(F.col("id").isin(3, 7))
    # head view clean
    ids = sorted(r.id for r in t.read().collect())
    assert ids == [0, 1, 2, 4, 5, 6, 8, 9]
    # history gone: only the erase version remains, old pins refuse
    assert len(t._versions()) == 1
    with pytest.raises((LookupError, FileNotFoundError)):
        t.read(version=1)
    # THE claim: no parquet byte under the table root holds 3 or 7 —
    # data files, DV'd pre-images, and change sidecars included
    assert _all_parquet_ids(spark, t.path) & {3, 7} == set()
    # the feed still serves the retained commit, minus the subject
    head = t.snapshot().version
    ch_ids = {
        r.id for r in t.changes(head - 1, head).select("id").collect()
    }
    assert ch_ids & {3, 7} == set()
    assert rpt["files_rewritten"] == 2  # both files held subject rows
    assert rpt["sidecars_redacted"] >= 1  # the erase commit's own CDF


def test_erase_refused_under_refs(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 4))
    t.create_tag("hold")
    with pytest.raises(ValueError, match="refs still pin"):
        t.erase_rows(F.col("id") == 1)
    t.drop_tag("hold")
    t.create_branch("exp")
    with pytest.raises(ValueError, match="refs still pin"):
        t.erase_rows(F.col("id") == 1)
    t.drop_branch("exp")
    t.erase_rows(F.col("id") == 1)
    assert sorted(r.id for r in t.read().collect()) == [0, 2, 3]


def test_erase_no_match_still_purges_history(spark, tmp_path):
    """A subject deleted long ago lives only in OLD versions: erase
    with a predicate matching nothing LIVE must still expire history
    (and its files)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, 0, 5))
    t.delete(F.col("id") == 2)  # COW: v2 has no 2, v1's file still does
    assert 2 in _all_parquet_ids(spark, t.path)  # bytes still on disk
    rpt = t.erase_rows(F.col("id") == 2)
    assert rpt["files_rewritten"] == 0  # nothing live matched
    assert 2 not in _all_parquet_ids(spark, t.path)  # history purge got it
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 3, 4]


def test_erase_composes_with_column_mapping(spark, tmp_path):
    """Predicates are LOGICAL; sidecars and files store physical names
    — erasure must translate, not miss."""
    t = SnapshotTable(spark, str(tmp_path / "t"), cdf=True)
    t.create(_df(spark, 0, 6))
    t.rename_column("id", "ident")
    t.delete_mor(F.col("ident") == 4)
    t.erase_rows(F.col("ident").isin(1, 4))
    assert sorted(r.ident for r in t.read().collect()) == [0, 2, 3, 5]
    assert _all_parquet_ids(spark, t.path) & {1, 4} == set()
