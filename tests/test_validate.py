"""Data-quality constraint suite semantics (operators/validate.py):
NULL handling, vacuous compliance, exact-counter pass/fail, FK orphans,
and the single-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators import validate as V


def _report(df, constraints, **kw):
    rows = V.check(df, constraints, **kw).collect()
    return {r["check_name"]: r for r in rows}


def test_null_semantics(spark):
    # NULLs hit completeness but are NEITHER compliant nor violating
    # for range/set/regex (non-null denominator).
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "zz")], "id int, s string"
    )
    rep = _report(
        df,
        [V.not_null("s"), V.in_set("s", ["a", "zz"]), V.matches("s", "^[az]")],
    )
    assert rep["not_null:s"]["metric"] == pytest.approx(2 / 3, abs=1e-6)
    assert not rep["not_null:s"]["passed"]
    assert rep["in_set:s"]["metric"] == 1.0 and rep["in_set:s"]["passed"]
    assert rep["matches:s"]["metric"] == 1.0 and rep["matches:s"]["passed"]


def test_unique_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,)], "k int"
    )
    rep = _report(df, [V.unique("k")])
    # 2 distinct / 3 non-null
    assert rep["unique:k"]["metric"] == pytest.approx(2 / 3, abs=1e-6)
    assert not rep["unique:k"]["passed"]


def test_empty_table_vacuously_compliant(spark):
    df = spark.createDataFrame([], "k int, s string")
    rep = _report(
        df,
        [V.not_null("k"), V.unique("k"), V.in_range("k", 0, 1),
         V.in_set("s", ["x"]), V.matches("s", "x")],
    )
    for r in rep.values():
        assert r["metric"] == 1.0 and r["passed"], r


def test_exact_pass_not_rounded(spark):
    # one violation in 2,000,001 rows: rounded metric is 1.0 but the
    # exact-counter comparison must still FAIL threshold 1.0
    n = 2_000_001
    df = spark.range(n).select(
        F.when(F.col("id") == 0, -1).otherwise(F.col("id")).alias("v")
    )
    rep = _report(df, [V.in_range("v", 0, n)])
    r = rep["in_range:v"]
    assert r["metric"] == 1.0  # rounds to 1.0 at 6dp
    assert not r["passed"]  # exact counters see the violation


def test_foreign_key_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rep = _report(
        fact,
        [V.foreign_key("fk", "dim", "pk")],
        refs={"dim": dim},
    )
    r = rep["foreign_key:fk->dim.pk"]
    # 2 matched / 3 non-null (NULL FK is completeness's job)
    assert r["metric"] == pytest.approx(2 / 3, abs=1e-6)
    assert not r["passed"]


def test_foreign_key_requires_ref(spark):
    df = spark.createDataFrame([(1,)], "fk int")
    with pytest.raises(KeyError):
        V.check(df, [V.foreign_key("fk", "dim", "pk")])


def test_single_scan_for_local_constraints(spark):
    """All row-local constraints compile into ONE aggregate over the
    table: exactly one scan of the source in the optimized plan."""
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    rep = V.check(
        df, [V.not_null("k"), V.in_range("v", 0, 5), V.matches("k", "1")]
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    # explode(array(struct..)) over the one counter row: the source
    # appears exactly once, and there is no join
    assert plan.count("Range (0, 100") == 1, plan
    assert "Join" not in plan


def test_oracle_sql_escapes_embedded_quotes(spark):
    """in_set values and regex patterns containing a single quote must
    render as valid (escaped) SQL literals in the DuckDB oracle — not a
    broken/injectable query — and the differential must still match."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "o'brien"), (2, "smith"), (3, "it's")], "id int, s string"
    )
    cs = [V.in_set("s", ["o'brien", "it's"]), V.matches("s", "^[a-z']+$")]
    got = V.check(df, cs)
    con = duckdb.connect()
    con.register("t_quotes", df.toPandas())
    sql = V.constraint_oracle_sql("t_quotes", cs)
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle(got, con, sql)
