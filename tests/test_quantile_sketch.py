"""Bottom-k (KMV) quantile sketch algebra (operators/sketches.py):
exactness at full retention, merge == direct, idempotent merge, and
the tau pre-filter's loss-free behavior at gate scale."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
    bottomk_merge,
    bottomk_quantiles,
    bottomk_sketch,
)


def _h(key: str) -> int:
    return int(hashlib.md5(f"q:{key}".encode()).hexdigest()[:15], 16)


def _rows(n, seed=0):
    # deterministic values, unique keys
    return [(f"k{seed}_{i}", float((i * 37 + seed * 11) % 500) / 10) for i in range(n)]


@pytest.fixture(scope="module")
def small(spark):
    df = spark.createDataFrame(
        [("g", k, v) for k, v in _rows(40)], "g string, key string, v double"
    )
    return df


def _collect_sketch(sk):
    return sorted((r["_h"], r["_v"]) for r in sk.collect())


def test_full_retention_equals_exact_bottomk(spark, small):
    """k >= n: the sketch must be ALL rows, and the quantile is the
    exact type-1 quantile of the full data."""
    sk = bottomk_sketch(small, ["g"], "key", "v", k=64)
    got = _collect_sketch(sk)
    want = sorted((_h(k), v) for k, v in _rows(40))
    assert got == want
    q = {r["q"]: r["est_value"] for r in bottomk_quantiles(sk, ["g"]).collect()}
    vals = sorted(v for _, v in _rows(40))
    assert q["p50"] == vals[19]  # ceil(0.5*40)=20 -> index 19
    assert q["p90"] == vals[35]  # ceil(0.9*40)=36 -> index 35


def test_truncation_is_exact_bottomk_by_hash(spark, small):
    sk = bottomk_sketch(small, ["g"], "key", "v", k=8)
    got = _collect_sketch(sk)
    want = sorted((_h(k), v) for k, v in _rows(40))[:8]
    assert got == want


def test_merge_equals_direct_sketch(spark):
    """sketch(A) merge sketch(B) == sketch(A union B) — exact equality
    whenever tau keeps the true bottom-k (here: cnt <= 4k, tau inert)."""
    a_rows, b_rows = _rows(30, seed=1), _rows(30, seed=2)
    mk = lambda rows: spark.createDataFrame(
        [("g", k, v) for k, v in rows], "g string, key string, v double"
    )
    k = 16
    sa = bottomk_sketch(mk(a_rows), ["g"], "key", "v", k=k)
    sb = bottomk_sketch(mk(b_rows), ["g"], "key", "v", k=k)
    merged = bottomk_merge(sa, sb, ["g"], k=k)
    direct = bottomk_sketch(mk(a_rows + b_rows), ["g"], "key", "v", k=k)
    assert _collect_sketch(merged) == _collect_sketch(direct)


def test_merge_idempotent(spark, small):
    sk = bottomk_sketch(small, ["g"], "key", "v", k=8)
    again = bottomk_merge(sk, sk, ["g"], k=8)
    assert _collect_sketch(again) == _collect_sketch(sk)


def test_tau_prefilter_lossless_here(spark):
    """A group big enough for tau to fire (cnt > 4k) still yields the
    exact bottom-k by hash: the filter only trims rows that can't be
    in the bottom k (expectation 4k survivors >> k)."""
    rows = _rows(600, seed=3)
    df = spark.createDataFrame(
        [("g", k, v) for k, v in rows], "g string, key string, v double"
    )
    k = 16  # cap = 64 < 600 -> tau fires
    sk = bottomk_sketch(df, ["g"], "key", "v", k=k)
    got = _collect_sketch(sk)
    want = sorted((_h(kk), v) for kk, v in rows)[:k]
    assert got == want


def test_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("g", "a", 1.0), ("g", "b", None), ("g", "c", 3.0)],
        "g string, key string, v double",
    )
    sk = bottomk_sketch(df, ["g"], "key", "v", k=8)
    assert sorted(r["_v"] for r in sk.collect()) == [1.0, 3.0]


def test_null_keys_excluded_both_engines(spark):
    """A NULL key must hash to NULL (F.concat, not concat_ws) and fail
    the tau comparison on BOTH engines — otherwise Spark samples the
    row as md5('q') while the oracle's 'q:'||NULL drops it."""
    import duckdb

    from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
        bottomk_oracle_sql,
    )
    from tests.oracle_utils import assert_matches_oracle

    df = spark.createDataFrame(
        [("g", "a", 1.0), ("g", None, 2.0), ("g", "c", 3.0)],
        "g string, key string, v double",
    )
    sk = bottomk_sketch(df, ["g"], "key", "v", k=8)
    # the NULL-keyed row is not sampled
    assert sorted(r["_v"] for r in sk.collect()) == [1.0, 3.0]
    q = bottomk_quantiles(sk, ["g"])
    con = duckdb.connect()
    con.register("t_nullkey", df.toPandas())
    sql = bottomk_oracle_sql(
        "SELECT g, key, v FROM t_nullkey", ["g"], "key", "v", k=8
    )
    assert_matches_oracle(q, con, sql)
