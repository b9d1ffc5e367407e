"""Mergeable k-mins cardinality sketch (operators/sketches.py): the
merge algebra (associative, commutative, IDEMPOTENT — the property
that makes at-least-once reprocessing safe), NULL semantics matching
COUNT(DISTINCT), estimator accuracy bounds, and the one-wide-aggregate
plan shape (shuffle carries k longs per group, never values)."""

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
    mincount_estimate,
    mincount_merge,
    mincount_sketch,
)

K = 16


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v string")


def _est(spark, sketch):
    return {
        r.g: r.est_distinct
        for r in mincount_estimate(sketch, ["g"], K).collect()
    }


def test_estimate_within_sketch_error(spark):
    n = 2000
    df = spark.range(n).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("v")
    )
    est = _est(spark, mincount_sketch(df, ["g"], "v", K))["a"]
    # RSE ~ 1/sqrt(16) = 25%; 3 sigma bound, deterministic (fixed hash)
    assert abs(est - n) / n < 0.75


def test_duplicates_do_not_inflate(spark):
    base = [("a", str(i)) for i in range(100)]
    once = mincount_sketch(_df(spark, base), ["g"], "v", K)
    thrice = mincount_sketch(_df(spark, base * 3), ["g"], "v", K)
    assert _est(spark, once) == _est(spark, thrice)


def test_merge_equals_whole(spark):
    rows = [("a", str(i)) for i in range(300)] + [
        ("b", str(i)) for i in range(40)
    ]
    whole = mincount_sketch(_df(spark, rows), ["g"], "v", K)
    s1 = mincount_sketch(_df(spark, rows[:170]), ["g"], "v", K)
    s2 = mincount_sketch(_df(spark, rows[170:]), ["g"], "v", K)
    assert _est(spark, mincount_merge(s1, s2, ["g"], K)) == _est(spark, whole)
    # commutative
    assert _est(spark, mincount_merge(s2, s1, ["g"], K)) == _est(spark, whole)


def test_merge_is_idempotent(spark):
    rows = [("a", str(i)) for i in range(200)]
    s = mincount_sketch(_df(spark, rows), ["g"], "v", K)
    # re-merging the same shard (at-least-once delivery) changes nothing
    assert _est(spark, mincount_merge(s, s, ["g"], K)) == _est(spark, s)


def test_merge_disjoint_groups_survive(spark):
    s1 = mincount_sketch(_df(spark, [("a", "1"), ("a", "2")]), ["g"], "v", K)
    s2 = mincount_sketch(_df(spark, [("b", "9")]), ["g"], "v", K)
    est = _est(spark, mincount_merge(s1, s2, ["g"], K))
    assert set(est) == {"a", "b"} and est["b"] >= 0


def test_null_values_match_count_distinct(spark):
    df = spark.createDataFrame(
        [("a", "1"), ("a", None), ("a", "2"), ("n", None)],
        "g string, v string",
    )
    est = _est(spark, mincount_sketch(df, ["g"], "v", K))
    # NULLs drop out (like COUNT(DISTINCT)); all-NULL group estimates 0
    assert est["n"] == 0 and est["a"] > 0


def test_null_rows_leave_estimate_unchanged(spark):
    """A NULL value must hash to NULL and drop out of min — NOT hash as
    md5('i') (the concat_ws pitfall), which inflates the Spark-side
    estimate relative to the DuckDB oracle's NULL-propagating ||."""
    clean = [("a", str(i)) for i in range(50)]
    withnull = clean + [("a", None), ("a", None)]
    e1 = _est(spark, mincount_sketch(_df(spark, clean), ["g"], "v", K))
    e2 = _est(spark, mincount_sketch(_df(spark, withnull), ["g"], "v", K))
    assert e1 == e2


def test_nulls_differential_vs_duckdb(spark):
    """Spark-vs-DuckDB with NULLs PRESENT: both engines must drop NULL
    values from the sketch identically (the oracle's md5('i:'||NULL)
    is NULL; Spark's F.concat propagates NULL the same way)."""
    import duckdb

    from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
        mincount_oracle_sql,
    )
    from tests.oracle_utils import assert_matches_oracle

    rows = [("a", str(i)) for i in range(5)] + [("a", None), ("b", None)]
    df = _df(spark, rows)
    est = mincount_estimate(mincount_sketch(df, ["g"], "v", K), ["g"], K)
    con = duckdb.connect()
    con.register("t_nulls", df.toPandas())
    sql = mincount_oracle_sql("SELECT g, v FROM t_nulls", ["g"], "v", K)
    assert_matches_oracle(est, con, sql)


def test_plan_is_single_wide_aggregate(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("v"),
    )
    plan = (
        mincount_sketch(df, ["g"], "v", K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial + final hash aggregate, ONE exchange, no expand/explode
    assert plan.count("Exchange") == 1
    assert "Expand" not in plan and "Generate" not in plan


# --------------------------------------------------------------- Count-Min


def test_cm_never_undercounts_and_exact_when_sparse(spark):
    from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    rows = [("g", f"k{i % 5}") for i in range(50)]  # 5 keys x 10 each
    df = spark.createDataFrame(rows, "g string, k string")
    sk = cm_sketch(df, ["g"], "k", d=4, w=64)
    probes = df.select("g", "k").distinct()
    est = {
        r.k: r.est_count
        for r in cm_estimate(sk, probes, ["g"], "k", d=4, w=64).collect()
    }
    # 5 keys in a 64-cell row: collisions possible but estimate >= true
    assert all(v >= 10 for v in est.values())
    # with d=4 independent rows and 5 keys, min over rows is exact here
    assert all(v == 10 for v in est.values())


def test_cm_merge_equals_whole_exactly(spark):
    from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
        cm_merge,
        cm_sketch,
    )

    rows = [("g", f"k{i % 17}") for i in range(100)]
    df = spark.createDataFrame(
        [(i, g, k) for i, (g, k) in enumerate(rows)], "i int, g string, k string"
    )
    whole = cm_sketch(df, ["g"], "k")
    merged = cm_merge(
        cm_sketch(df.filter("i % 2 = 0"), ["g"], "k"),
        cm_sketch(df.filter("i % 2 = 1"), ["g"], "k"),
        ["g"],
    )
    canon = lambda sk: sorted(
        (r.g, r.row, r.cell, r.cnt) for r in sk.collect()
    )
    assert canon(merged) == canon(whole)


def test_cm_null_keys_excluded(spark):
    from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "a")], "g string, k string"
    )
    sk = cm_sketch(df, ["g"], "k")
    probes = spark.createDataFrame([("g", "a")], "g string, k string")
    est = cm_estimate(sk, probes, ["g"], "k").collect()
    assert est[0].est_count == 2


def test_cm_probe_of_absent_key_can_be_zero(spark):
    from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.createDataFrame([("g", "a")], "g string, k string")
    sk = cm_sketch(df, ["g"], "k")
    probes = spark.createDataFrame(
        [("g", "zzz-never-seen")], "g string, k string"
    )
    est = cm_estimate(sk, probes, ["g"], "k").collect()
    assert est[0].est_count in (0, 1)  # 0 unless all 4 cells collide


def test_cm_build_is_single_exchange(spark):
    """The CM grid build must be ONE shuffle (map-side partial agg on
    (group,row,cell)); the explode stays in the scan stage."""
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.operators.sketches import (
        cm_sketch,
    )

    df = spark.range(200).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("string").alias("k"),
    )
    plan = (
        cm_sketch(df, ["g"], "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
