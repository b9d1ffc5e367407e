"""Write-side CHECK constraints (sources/lakehouse.py): table state
persisted in manifests, enforced in one aggregate pass on every write
path before any file lands; ADD CONSTRAINT validates existing data;
NULL passes (the SQL CHECK rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
    ConstraintViolationError,
    SnapshotTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, amount double, state string")


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(
        spark,
        str(tmp_path / "t"),
        check_constraints={
            "amount_nonneg": "amount >= 0",
            "id_not_null": "id IS NOT NULL",
        },
    )
    t.create(_df(spark, [(1, 10.0, "CA"), (2, 0.0, None)]))
    return t


def test_violating_append_rejected_before_landing(spark, table):
    v = table.snapshot().version
    with pytest.raises(ConstraintViolationError, match="amount_nonneg"):
        table.append(_df(spark, [(3, -5.0, "NY")]))
    assert table.snapshot().version == v  # nothing landed
    assert table.read().count() == 2


def test_null_passes_check(spark, table):
    # amount NULL: the CHECK expression is NULL -> passes (SQL rule);
    # id NULL: 'id IS NOT NULL' is FALSE -> rejects
    table.append(_df(spark, [(4, None, "WA")]))
    with pytest.raises(ConstraintViolationError, match="id_not_null"):
        table.append(_df(spark, [(None, 1.0, "WA")]))
    assert table.read().count() == 3


def test_constraints_are_table_state(spark, table):
    reopened = SnapshotTable(spark, table.path)  # no constraints passed
    with pytest.raises(ConstraintViolationError):
        reopened.append(_df(spark, [(9, -1.0, "TX")]))
    with pytest.raises(ValueError, match="CHECK constraints"):
        SnapshotTable(
            spark, table.path, check_constraints={"other": "id > 0"}
        )


def test_merge_and_rewrites_enforce(spark, table):
    with pytest.raises(ConstraintViolationError):
        table.merge(_df(spark, [(1, -99.0, "CA")]), ["id"])
    table.merge(_df(spark, [(1, 99.0, "CA")]), ["id"])
    got = {r.id: r.amount for r in table.read().collect()}
    assert got[1] == 99.0


def test_add_constraint_validates_existing_rows(spark, table):
    with pytest.raises(ConstraintViolationError):
        table.add_constraint("state_known", "state IS NOT NULL")
    # the failed add left the table's constraint set unchanged
    assert "state_known" not in table.check_constraints
    table.add_constraint("amount_cap", "amount <= 1000")
    with pytest.raises(ConstraintViolationError, match="amount_cap"):
        table.append(_df(spark, [(7, 5000.0, "CA")]))
    # new handles see the evolved set (persisted in the manifest)
    assert "amount_cap" in SnapshotTable(spark, table.path).check_constraints


def test_drop_constraint(spark, table):
    table.drop_constraint("amount_nonneg")
    table.append(_df(spark, [(8, -1.0, "OR")]))  # now allowed
    assert SnapshotTable(spark, table.path).check_constraints == {
        "id_not_null": "id IS NOT NULL"
    }


def test_constraints_survive_vacuum_and_clone(spark, table, tmp_path):
    table.append(_df(spark, [(5, 1.0, "CA")]))
    table.vacuum(retain_last=1)
    assert SnapshotTable(spark, table.path).check_constraints
    clone = table.clone_to(str(tmp_path / "branch"))
    with pytest.raises(ConstraintViolationError):
        clone.append(_df(spark, [(6, -2.0, "NV")]))