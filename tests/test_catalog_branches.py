"""Warehouse-level BRANCHES (sources/txn_catalog.py: create_branch /
merge_branch / drop_branch on PinnedCatalog — Nessie's catalog branch
model, composed from r12's table-level branches + the multi-table
transaction): fork every registered table at its PIN, experiment with
full transactional semantics on the branch, then publish every table's
net merge in ONE main-catalog CAS — or discard without a trace."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
    BranchMergeConflict,
    SnapshotTable,
)
from summit_23_snowpark_data_lake_workloads_spark.sources.txn_catalog import (
    PinnedCatalog,
)


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k string, v long").coalesce(1)


def _kv(cat, name):
    return {r.k: r.v for r in cat.read(name).collect()}


@pytest.fixture()
def wh(spark, tmp_path):
    """A two-table warehouse with committed pins."""
    cat = PinnedCatalog(spark, str(tmp_path / "cat"))
    cat.register("dim", str(tmp_path / "dim"))
    cat.register("fact", str(tmp_path / "fact"))
    txn = cat.transaction()
    txn.table("dim").create(_rows(spark, [("a", 1), ("b", 2)]))
    txn.table("fact").create(_rows(spark, [("x", 10), ("y", 20)]))
    txn.commit()
    return cat


def test_branch_isolation_and_atomic_merge(spark, wh):
    cat = wh
    bcat = cat.create_branch("exp")
    assert "exp" in cat.branches()
    # transactional write ON the branch: both tables in one branch CAS
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("c", 3)]))
    btxn.table("fact").append(_rows(spark, [("z", 30)]))
    btxn.commit()
    # main sees nothing
    assert _kv(cat, "dim") == {"a": 1, "b": 2}
    assert _kv(cat, "fact") == {"x": 10, "y": 20}
    # branch reads its own committed state
    assert _kv(bcat, "dim") == {"a": 1, "b": 2, "c": 3}

    v_before = cat.state()["version"]
    v = cat.merge_branch("exp")
    assert v == v_before + 1  # ONE CAS moved both tables
    assert _kv(cat, "dim") == {"a": 1, "b": 2, "c": 3}
    assert _kv(cat, "fact") == {"x": 10, "y": 20, "z": 30}
    assert "exp" not in cat.branches()
    # per-table branch refs released too
    assert "cat-exp" not in cat.table("dim").branches()
    # main is clean: heads at pins (no orphan staged commits)
    for name in ("dim", "fact"):
        assert cat.repair(name) is None


def test_merge_rebases_over_commuting_main_appends(spark, wh):
    cat = wh
    bcat = cat.create_branch("exp")
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("c", 3)]))
    btxn.commit()
    # main moves meanwhile — append-only, commutes at file level
    mtxn = cat.transaction()
    mtxn.table("dim").append(_rows(spark, [("d", 4)]))
    mtxn.commit()
    cat.merge_branch("exp")
    assert _kv(cat, "dim") == {"a": 1, "b": 2, "c": 3, "d": 4}


def test_merge_conflict_rolls_back_all_staged_merges(spark, wh):
    """dim merges cleanly but fact conflicts (both sides rewrote the
    same file) -> the WHOLE merge aborts: no pins move, dim's staged
    merge commit is repaired away, the branch stays intact."""
    cat = wh
    bcat = cat.create_branch("exp")
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("c", 3)]))  # clean
    bf = btxn.table("fact")
    bf.delete(F.col("k") == "x")  # branch rewrites fact's file
    btxn.commit()
    mtxn = cat.transaction()
    mtxn.table("fact").delete(F.col("k") == "y")  # main rewrites SAME file
    mtxn.commit()

    fact_before = _kv(cat, "fact")
    with pytest.raises(BranchMergeConflict):
        cat.merge_branch("exp")
    # content exactly as before the refused merge (repair moves pins to
    # content-identical rollback versions — the documented contract)
    assert _kv(cat, "dim") == {"a": 1, "b": 2}  # dim merge rolled back
    assert _kv(cat, "fact") == fact_before
    assert cat.repair("dim") is None  # no orphans left behind
    assert "exp" in cat.branches()  # branch intact for a manual rebase
    assert _kv(bcat, "dim") == {"a": 1, "b": 2, "c": 3}


def test_drop_branch_discards_everything(spark, wh):
    cat = wh
    bcat = cat.create_branch("scratch")
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("zzz", 99)]))
    btxn.commit()
    root = cat._branch_root("scratch")
    cat.drop_branch("scratch")
    assert not os.path.exists(root)
    assert "scratch" not in cat.branches()
    assert "cat-scratch" not in cat.table("dim").branches()
    assert _kv(cat, "dim") == {"a": 1, "b": 2}
    with pytest.raises(KeyError):
        cat.drop_branch("scratch")


def test_branch_only_registration_refused_at_merge(spark, wh, tmp_path):
    cat = wh
    bcat = cat.create_branch("exp")
    bcat.register("newtbl", str(tmp_path / "newtbl"))
    with pytest.raises(ValueError, match="only on branch"):
        cat.merge_branch("exp")
    assert "exp" in cat.branches()  # refusal leaves the branch alone


def test_unforked_pin0_table_tolerated(spark, wh, tmp_path):
    """A table registered on main with NO committed transaction has
    nothing to fork; branching skips it and merge ignores it."""
    cat = wh
    cat.register("empty", str(tmp_path / "empty"))
    bcat = cat.create_branch("exp")
    assert "empty" not in bcat.state()["tables"]
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("c", 3)]))
    btxn.commit()
    cat.merge_branch("exp")
    assert _kv(cat, "dim") == {"a": 1, "b": 2, "c": 3}


def test_noop_merge_spends_no_cas_and_releases(spark, wh):
    cat = wh
    cat.create_branch("idle")
    v_before = cat.state()["version"]
    assert cat.merge_branch("idle") is None
    assert cat.state()["version"] == v_before
    assert "idle" not in cat.branches()


def test_abandoned_branch_txn_does_not_pollute_merge(spark, wh):
    """An abandoned transaction ON THE BRANCH leaves orphan staged
    commits in the branch table's log; merge must read the branch's
    committed PIN (bcat.repair), not the orphan head."""
    cat = wh
    bcat = cat.create_branch("exp")
    ghost = bcat.transaction()
    ghost.table("dim").append(_rows(spark, [("GHOST", 666)]))
    ghost.abandon()
    btxn = bcat.transaction()
    # wedged until repaired — merge does that internally; commit real work
    bcat.repair("dim")
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("c", 3)]))
    btxn.commit()
    cat.merge_branch("exp")
    got = _kv(cat, "dim")
    assert got == {"a": 1, "b": 2, "c": 3}
    assert "GHOST" not in got


def test_streaming_chain_runs_on_a_branch_then_merges(spark, wh, tmp_path):
    """COMPOSITION: the always-on transactional chain
    (maintain_chain_stream) runs against a BRANCH catalog exactly as it
    does against main — its own pins, stamps, and checkpoint — and the
    whole experiment (new bronze rows + the silver layer it maintained)
    merges back in one main CAS. The 'try the new pipeline on a branch
    of the warehouse' workflow, end to end."""
    from summit_23_snowpark_data_lake_workloads_spark.plans.txn_refresh import (
        RollupSpec,
        maintain_chain_stream,
    )

    cat = wh
    # register a silver rollup table on main and give it a first commit
    # so the branch forks it
    cat.register("dimsum", str(tmp_path / "dimsum"))
    txn = cat.transaction()
    txn.table("dimsum").create(
        cat.read("dim")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("v").alias("sum_v"),
        )
    )
    txn.commit()

    bcat = cat.create_branch("exp")
    # branch bronze gains rows; the chain maintains branch silver
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("c", 3), ("c", 4)]))
    btxn.commit()
    layers = [
        (
            "dimsum",
            RollupSpec(
                prepare=lambda df: df, group_cols=["k"], sum_cols=["v"]
            ),
        )
    ]
    r = maintain_chain_stream(
        bcat,
        bcat.table("dim"),
        layers,
        str(tmp_path / "ckpt"),
        app_id="exp_chain",
    )
    assert any(x["catalog_version"] for x in r)
    # branch silver reflects the branch bronze; main silver untouched
    bsil = {
        row.k: (row.n_rows, row.sum_v)
        for row in bcat.read("dimsum").collect()
    }
    assert bsil["c"] == (2, 7)
    msil = {
        row.k: (row.n_rows, row.sum_v)
        for row in cat.read("dimsum").collect()
    }
    assert "c" not in msil

    cat.merge_branch("exp")
    msil = {
        row.k: (row.n_rows, row.sum_v)
        for row in cat.read("dimsum").collect()
    }
    assert msil["c"] == (2, 7)
    assert {r_.k for r_ in cat.read("dim").collect()} == {"a", "b", "c"}
    # the branch chain's stamps folded into main's txn_seen: a replayed
    # tick against MAIN is a noop for the already-folded range
    assert cat.last_committed_batch("exp_chain:dimsum") is not None


def test_unexpected_failure_mid_staging_rolls_back(spark, wh, monkeypatch):
    """r12 advice: the staging loop used to catch ONLY the two conflict
    types — an OSError (sick disk, dead handle) mid-staging left the
    transaction open and orphan staged manifests unrepaired until the
    next auto_repair. ANY failure must abandon + roll back, main
    exactly as before, branch intact for a retry."""
    cat = wh
    bcat = cat.create_branch("exp")
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("c", 3)]))
    btxn.table("fact").append(_rows(spark, [("z", 30)]))
    btxn.commit()

    orig = SnapshotTable.merge_branch
    calls = []

    def flaky(self, name, drop_ref=True):
        calls.append(name)
        if len(calls) == 2:  # dim stages cleanly, fact's IO dies
            raise OSError("simulated IO failure mid-staging")
        return orig(self, name, drop_ref=drop_ref)

    monkeypatch.setattr(SnapshotTable, "merge_branch", flaky)
    with pytest.raises(OSError, match="mid-staging"):
        cat.merge_branch("exp")
    monkeypatch.undo()

    # main exactly as before: no pins moved, dim's staged merge rolled
    # back, no orphan staged manifests wedging later transactions
    assert _kv(cat, "dim") == {"a": 1, "b": 2}
    assert _kv(cat, "fact") == {"x": 10, "y": 20}
    for name in ("dim", "fact"):
        assert cat.repair(name) is None
    assert "exp" in cat.branches()

    # the same merge succeeds once the failure cause is gone
    cat.merge_branch("exp")
    assert _kv(cat, "dim") == {"a": 1, "b": 2, "c": 3}
    assert _kv(cat, "fact") == {"x": 10, "y": 20, "z": 30}


def test_catalog_branch_half_fork_unwinds(spark, wh, monkeypatch):
    """Catalog-level twin of the table ref-leak fix: if forking dies
    mid-warehouse (here: the SECOND table's fork fails), the catalog
    ref, the branch catalog, and every already-reserved table branch
    unwind — branches() never lists a half-forked warehouse."""
    cat = wh
    orig = SnapshotTable.create_branch
    calls = []

    def flaky(self, name, version=None, tag=None):
        calls.append(name)
        if len(calls) == 2:
            raise OSError("simulated fork failure")
        return orig(self, name, version=version, tag=tag)

    monkeypatch.setattr(SnapshotTable, "create_branch", flaky)
    with pytest.raises(OSError, match="fork failure"):
        cat.create_branch("exp")
    monkeypatch.undo()

    assert cat.branches() == {}
    for name in ("dim", "fact"):
        assert cat.table(name).branches() == {}, "table fork leaked"
    assert not os.path.exists(cat._branch_root("exp"))

    # the name is reusable once the cause is gone
    bcat = cat.create_branch("exp")
    assert _kv(bcat, "dim") == {"a": 1, "b": 2}
    cat.drop_branch("exp")


def test_catalog_branch_name_reuse_after_merge(spark, wh):
    """Reusing a catalog branch name after merge_branch: the per-table
    branch DIRECTORIES persist post-merge (main references merged
    files in place), so the table-level stale-directory refusal fires
    mid-fork — the catalog must unwind cleanly and refuse loudly, not
    leak a ref over a half-forked warehouse serving stale state."""
    cat = wh
    bcat = cat.create_branch("exp")
    btxn = bcat.transaction()
    btxn.table("dim").append(_rows(spark, [("c", 3)]))
    btxn.commit()
    cat.merge_branch("exp")
    assert _kv(cat, "dim") == {"a": 1, "b": 2, "c": 3}

    with pytest.raises(FileExistsError, match="merged table"):
        cat.create_branch("exp")
    assert cat.branches() == {}
    for name in ("dim", "fact"):
        assert cat.table(name).branches() == {}
    # main unaffected by the refused re-fork
    assert _kv(cat, "dim") == {"a": 1, "b": 2, "c": 3}
    assert cat.repair("dim") is None
