"""Multi-table transactions via the pinned catalog
(sources/txn_catalog.py): staged table versions are invisible through
catalog reads until ONE catalog CAS exposes every touched pin at once;
first-committer-wins on conflicting pins; disjoint transactions and
registrations never conflict."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
    SnapshotTable,
)
from summit_23_snowpark_data_lake_workloads_spark.sources.txn_catalog import (
    MultiTableTransaction,
    PinnedCatalog,
    TransactionConflict,
)


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .coalesce(1)
        .select(F.col("id").cast("int").alias("id"))
    )


@pytest.fixture()
def cat(spark, tmp_path):
    c = PinnedCatalog(spark, str(tmp_path / "cat"))
    for name in ("orders", "totals"):
        t = SnapshotTable(spark, str(tmp_path / name))
        t.create(_df(spark, 0, 10))
        c.register(name, t.path)
    return c


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_staged_writes_invisible_until_one_cas(spark, cat):
    txn = cat.transaction()
    txn.table("orders").append(_df(spark, 10, 12))
    txn.table("totals").delete(F.col("id") >= 5)
    # staged in the table logs, invisible through the catalog
    assert _ids(cat.read("orders")) == list(range(10))
    assert _ids(cat.read("totals")) == list(range(10))
    txn.commit()
    # both changes appear atomically
    assert _ids(cat.read("orders")) == list(range(12))
    assert _ids(cat.read("totals")) == list(range(5))


def test_conflict_moves_nothing(spark, cat):
    a = cat.transaction()
    b = cat.transaction()
    a.table("orders").append(_df(spark, 100, 101))
    b.table("orders").append(_df(spark, 200, 201))
    b.table("totals").append(_df(spark, 300, 301))
    a.commit()
    with pytest.raises(TransactionConflict):
        b.commit()
    # b staged real table versions, but NEITHER pin moved for it
    assert _ids(cat.read("orders")) == list(range(10)) + [100]
    assert _ids(cat.read("totals")) == list(range(10))


def test_disjoint_transactions_both_commit(spark, cat):
    a = cat.transaction()
    b = cat.transaction()
    a.table("orders").append(_df(spark, 100, 101))
    b.table("totals").append(_df(spark, 200, 201))
    a.commit()
    b.commit()  # retries over a's catalog commit, no shared pins
    assert 100 in _ids(cat.read("orders"))
    assert 200 in _ids(cat.read("totals"))


def test_registration_between_stage_and_commit(spark, cat, tmp_path):
    txn = cat.transaction()
    txn.table("orders").append(_df(spark, 100, 101))
    t3 = SnapshotTable(spark, str(tmp_path / "third"))
    t3.create(_df(spark, 0, 3))
    cat.register("third", t3.path)
    txn.commit()  # CAS retried over the registration; both survive
    assert 100 in _ids(cat.read("orders"))
    assert _ids(cat.read("third")) == [0, 1, 2]


def test_create_through_transaction(spark, cat, tmp_path):
    cat.register("fresh", str(tmp_path / "fresh"))
    with pytest.raises(ValueError, match="no committed transaction"):
        cat.read("fresh")
    txn = cat.transaction()
    txn.table("fresh").create(_df(spark, 0, 4))
    txn.commit()
    assert _ids(cat.read("fresh")) == [0, 1, 2, 3]


def test_untouched_handle_keeps_pin(spark, cat):
    txn = cat.transaction()
    txn.table("orders")  # opened, never written
    txn.table("totals").append(_df(spark, 50, 51))
    pin_before = cat.pin("orders")
    txn.commit()
    assert cat.pin("orders") == pin_before


def test_abandon_and_reuse_guard(spark, cat):
    txn = cat.transaction()
    txn.table("orders").append(_df(spark, 100, 101))
    txn.abandon()
    assert _ids(cat.read("orders")) == list(range(10))
    with pytest.raises(RuntimeError):
        txn.commit()
    with pytest.raises(RuntimeError):
        txn.table("orders")


def test_duplicate_registration_refused(spark, cat, tmp_path):
    with pytest.raises(ValueError, match="already registered"):
        cat.register("orders", str(tmp_path / "elsewhere"))


def test_threaded_disjoint_commits_race_the_cas(spark, cat):
    """Two transactions on disjoint tables publish concurrently: the
    CAS loser retries over the winner's catalog version and both land."""
    a = cat.transaction()
    b = cat.transaction()
    a.table("orders").append(_df(spark, 100, 101))
    b.table("totals").append(_df(spark, 200, 201))
    errs = []

    def run(t):
        try:
            t.commit()
        except Exception as e:  # noqa: BLE001 - collected for assertion
            errs.append(e)

    th = [threading.Thread(target=run, args=(t,)) for t in (a, b)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    assert 100 in _ids(cat.read("orders"))
    assert 200 in _ids(cat.read("totals"))


def test_snapshot_isolation_against_direct_reads(spark, cat):
    """The catalog read is the transactional view; a direct table read
    legitimately sees staged versions (documented) — this pins the
    difference so it stays deliberate."""
    txn = cat.transaction()
    h = txn.table("orders")
    h.append(_df(spark, 100, 101))
    assert 100 in _ids(h.read())  # direct: staged data visible
    assert 100 not in _ids(cat.read("orders"))  # catalog: invisible
    txn.commit()
    assert 100 in _ids(cat.read("orders"))


def test_publish_is_content_atomic_under_contention(tmp_path):
    """A reader polling the catalog directory during a publish storm
    must never parse a torn file: PosixCommit links the finished body
    into place (all-or-nothing), it never writes in place."""
    import json
    import threading

    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        PosixCommit,
    )

    proto = PosixCommit()
    d = tmp_path / "log"
    d.mkdir()
    body = json.dumps({"payload": "x" * 65536})
    stop = threading.Event()
    torn = []

    def reader():
        while not stop.is_set():
            for f in d.iterdir():
                if f.suffix != ".json":
                    continue
                try:
                    assert json.loads(f.read_text())["payload"]
                except Exception as e:  # noqa: BLE001 - the torn read
                    torn.append((f.name, repr(e)))

    rt = threading.Thread(target=reader)
    rt.start()
    try:
        for i in range(50):
            path = str(d / f"v{i:012d}.json")
            wins = []
            ws = [
                threading.Thread(
                    target=lambda: wins.append(proto.publish(path, body))
                )
                for _ in range(4)
            ]
            for w in ws:
                w.start()
            for w in ws:
                w.join()
            assert sum(wins) == 1  # exactly one winner per version
    finally:
        stop.set()
        rt.join()
    assert torn == []
    assert not [f for f in d.iterdir() if f.name.endswith(".tmp")]


def test_lock_file_protocol_contention_harness(tmp_path):
    """The CommitProtocol seam's pluggability claim, proven with a
    NON-Posix protocol: LockedCommit over the deliberately-unsafe
    overwriting store, serialized by a lock FILE (FileLockMutex — the
    cross-process model of the external lock service S3-without-
    conditional-PUT needs). Same torn-reader + 4-writer harness that
    pins PosixCommit: exactly one winner per version, a polling reader
    never parses a torn body, no temp litter."""
    import json as _json

    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        FileLockMutex,
        LockedCommit,
        OverwritingCommit,
    )

    d = tmp_path / "log"
    d.mkdir()
    proto = LockedCommit(
        FileLockMutex(str(tmp_path / "commit.lock")), OverwritingCommit()
    )
    body = _json.dumps({"payload": "x" * 65536})
    stop = threading.Event()
    torn = []

    def reader():
        while not stop.is_set():
            for f in d.iterdir():
                if f.suffix != ".json":
                    continue
                try:
                    assert _json.loads(f.read_text())["payload"]
                except Exception as e:  # noqa: BLE001 - the torn read
                    torn.append((f.name, repr(e)))

    rt = threading.Thread(target=reader)
    rt.start()
    try:
        for i in range(25):
            path = str(d / f"v{i:012d}.json")
            wins = []
            ws = [
                threading.Thread(
                    target=lambda: wins.append(proto.publish(path, body))
                )
                for _ in range(4)
            ]
            for w in ws:
                w.start()
            for w in ws:
                w.join()
            assert sum(wins) == 1, f"version {i}: {sum(wins)} winners"
    finally:
        stop.set()
        rt.join()
    assert torn == []
    assert not [f for f in d.iterdir() if f.name.endswith(".tmp")]
    # the lock itself never leaks past a release
    assert not (tmp_path / "commit.lock").exists()


def test_catalog_end_to_end_on_lock_file_protocol(spark, tmp_path):
    """End-to-end multi-cluster arbitration model: a PinnedCatalog and
    both its tables run ENTIRELY on the lock-file protocol (no O_EXCL
    manifest publish anywhere) — racing disjoint transactions both
    land through CAS retry, a true pin conflict still refuses, and the
    transactional read surface is unchanged."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        FileLockMutex,
        LockedCommit,
        OverwritingCommit,
    )

    proto = LockedCommit(
        FileLockMutex(str(tmp_path / "commit.lock")), OverwritingCommit()
    )
    cat = PinnedCatalog(spark, str(tmp_path / "cat"), commit_protocol=proto)
    for name in ("orders", "totals"):
        t = SnapshotTable(
            spark, str(tmp_path / name), commit_protocol=proto
        )
        t.create(_df(spark, 0, 10))
        cat.register(name, t.path)

    # threaded disjoint race: the CAS loser retries over the winner
    a = cat.transaction()
    b = cat.transaction()
    a.table("orders").append(_df(spark, 100, 101))
    b.table("totals").append(_df(spark, 200, 201))
    errs = []

    def run(t):
        try:
            t.commit()
        except Exception as e:  # noqa: BLE001 - collected for assertion
            errs.append(e)

    th = [threading.Thread(target=run, args=(t,)) for t in (a, b)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    assert 100 in _ids(cat.read("orders"))
    assert 200 in _ids(cat.read("totals"))

    # first-committer-wins still holds on a shared pin
    c = cat.transaction()
    d2 = cat.transaction()
    c.table("orders").append(_df(spark, 300, 301))
    d2.table("orders").append(_df(spark, 400, 401))
    c.commit()
    with pytest.raises(TransactionConflict):
        d2.commit()
    ids = _ids(cat.read("orders"))
    assert 300 in ids and 400 not in ids


def _mp_publish(args):
    """Module-level worker for the cross-process lock test (spawn/fork
    pickling): one publish attempt through the lock-file protocol."""
    lock_path, target, body = args
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        FileLockMutex,
        LockedCommit,
        OverwritingCommit,
    )

    proto = LockedCommit(FileLockMutex(lock_path), OverwritingCommit())
    return proto.publish(target, body)


def test_lock_file_mutex_excludes_across_processes(tmp_path):
    """FileLockMutex's claim over threading.Lock is CROSS-PROCESS
    exclusion (separate drivers arbitrating one commit log). Prove it
    with real processes: 4 workers x 20 versions race the same
    publish through the lock-file protocol — exactly one winner per
    version, every loser told so."""
    import multiprocessing as mp

    lock_path = str(tmp_path / "commit.lock")
    d = tmp_path / "log"
    d.mkdir()
    with mp.get_context("spawn").Pool(4) as pool:
        for i in range(20):
            target = str(d / f"v{i:012d}.json")
            wins = pool.map(
                _mp_publish,
                [(lock_path, target, f'{{"writer": {w}}}') for w in range(4)],
            )
            assert sum(wins) == 1, f"version {i}: {sum(wins)} winners"
    assert not os.path.exists(lock_path)  # no leaked lock


def test_pin0_orphan_remedy_is_executable(spark, cat, tmp_path):
    """The repair() pin-0 refusal's old remedy ('commit a first
    transaction') could never run: the first transaction stages ON TOP
    of the orphans and its commit hits the foreign-staged-lineage
    refusal; rollback has no version-0 target. unregister() is the
    executable lifecycle — proven here verbatim, including the dead
    end it replaces."""
    import shutil as _sh

    path = str(tmp_path / "wedged")
    cat.register("wedged", path)
    ghost = cat.transaction()
    ghost.table("wedged").create(_df(spark, 0, 3))
    ghost.abandon()  # pin 0, log head 1: the wedge

    # the OLD remedy is a dead end: create() refuses outright on the
    # orphan's manifest, and an append's commit hits the lineage check
    dead = cat.transaction()
    with pytest.raises(FileExistsError):
        dead.table("wedged").create(_df(spark, 10, 13))
    dead.abandon()
    first = cat.transaction()
    first.table("wedged").append(_df(spark, 10, 13))
    with pytest.raises(TransactionConflict, match="unpinned version"):
        first.commit()
    with pytest.raises(ValueError, match="unregister"):
        cat.repair("wedged")

    # THE PRESCRIBED REMEDY, verbatim
    cat.unregister("wedged")
    _sh.rmtree(path, ignore_errors=True)
    cat.register("wedged", path)
    txn = cat.transaction()
    txn.table("wedged").create(_df(spark, 10, 13))
    txn.commit()
    assert _ids(cat.read("wedged")) == [10, 11, 12]


def test_unregister_lifecycle(spark, cat, tmp_path):
    """unregister removes only the REGISTRATION: the table directory
    survives and re-registering serves it again at its head; unknown
    names KeyError; a live catalog branch refuses (the branch forked
    the registrations as a set)."""
    assert _ids(cat.read("orders")) == list(range(10))
    cat.unregister("orders")
    with pytest.raises(KeyError):
        cat.read("orders")
    with pytest.raises(KeyError):
        cat.unregister("orders")
    # the table itself is untouched: re-register serves the same rows
    cat.register("orders", str(tmp_path / "orders"))
    assert _ids(cat.read("orders")) == list(range(10))

    cat.create_branch("exp")
    with pytest.raises(ValueError, match="merge_branch or drop_branch"):
        cat.unregister("totals")
    cat.drop_branch("exp")
    cat.unregister("totals")
    assert "totals" not in cat.state()["tables"]


def test_unregister_mid_transaction_is_a_clean_conflict(spark, cat):
    """unregister() can now remove entries mid-flight: a transaction
    whose touched table vanishes must raise TransactionConflict (the
    first-committer-wins outcome), never a raw KeyError."""
    txn = cat.transaction()
    txn.table("orders").append(_df(spark, 100, 102))
    cat.unregister("orders")
    with pytest.raises(TransactionConflict, match="unregistered"):
        txn.commit()


def test_commit_refuses_rebound_name_at_different_path(
    spark, cat, tmp_path
):
    """Name-only identity is not enough: unregister + re-register the
    SAME name at a DIFFERENT path (with a coinciding pin) must
    conflict a transaction staged against the old table — committing
    would push the old table's staged version onto a foreign
    registration and serve a version it does not have."""
    txn = cat.transaction()
    txn.table("orders").append(_df(spark, 100, 102))
    cat.unregister("orders")
    other = SnapshotTable(spark, str(tmp_path / "impostor"))
    other.create(_df(spark, 500, 505))  # head v1 == old pin? no: pin 1
    cat.register("orders", other.path)
    with pytest.raises(TransactionConflict, match="different path"):
        txn.commit()
    # the impostor registration is untouched and serves its own truth
    assert _ids(cat.read("orders")) == [500, 501, 502, 503, 504]


def test_erase_conflict_never_repins_a_rebound_name(
    spark, tmp_path, monkeypatch
):
    """The erase's best-effort re-pin must not write the erased
    table's head onto a re-registered entry pointing at a DIFFERENT
    table — the name no longer means the erased table."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.lakehouse import (
        SnapshotTable as ST,
    )

    cat = PinnedCatalog(spark, str(tmp_path / "cat"))
    cat.register("t", str(tmp_path / "t"))
    txn = cat.transaction()
    txn.table("t").create(_df(spark, 0, 8))
    txn.commit()
    impostor = ST(spark, str(tmp_path / "impostor"))
    impostor.create(_df(spark, 900, 905))

    orig = ST.erase_rows

    def race(self, predicate):
        stats = orig(self, predicate)
        cat.unregister("t")
        cat.register("t", impostor.path)
        return stats

    monkeypatch.setattr(ST, "erase_rows", race)
    with pytest.raises(TransactionConflict, match="different path"):
        cat.erase_rows("t", F.col("id") == 3)
    monkeypatch.undo()
    # the impostor's registration and pin are untouched
    assert cat.pin("t") == impostor.snapshot().version
    assert _ids(cat.read("t")) == [900, 901, 902, 903, 904]
