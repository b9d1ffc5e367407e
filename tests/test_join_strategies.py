"""Scale join strategies: salted join equivalence + bucketed co-located
join (no shuffle on the read side)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.joins import salted_join
from summit_23_snowpark_data_lake_workloads_spark.sources.catalog import (
    bootstrap_catalog,
    save_table,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    few = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(10).select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(few, "o_custkey", "left").select("o_orderkey", "c_name")
    salted = salted_join(orders, few, "o_custkey", n_salts=4, how="left").select(
        "o_orderkey", "c_name"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """The whole point of salting: rows of ONE pathological hot key must
    land on multiple (key, salt) sub-keys, not a single reducer. A salt
    derived only from the join key would be a silent no-op here."""
    hot = spark.range(10_000).select(
        F.lit(42).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(42, "x")], ["k", "v"])
    n_salts = 8
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(n_salts))
    distinct_salts = hot.withColumn("_salt", salt).select("_salt").distinct().count()
    assert distinct_salts > 1, "hot-key rows must spread across salts"
    assert distinct_salts <= n_salts
    # and the join still returns exactly the unsalted result
    out = salted_join(hot, dim, "k", n_salts=n_salts)
    assert out.count() == 10_000


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key must sort-merge join with zero
    Exchange operators — the write-time shuffle pays for every future
    join."""
    bootstrap_catalog(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    save_table(orders, "raw.orders_bucketed", bucket_by=(8, ["o_custkey"]))
    save_table(
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_name", "c_acctbal"),
        "raw.customer_bucketed",
        bucket_by=(8, ["o_custkey"]),
    )
    a = spark.table("raw.orders_bucketed")
    b = spark.table("raw.customer_bucketed")
    # disable broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_custkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_asof_join_semantics(spark):
    """Inclusive at equal ts, latest-prior otherwise, null when no prior
    right row; inner mode drops the unmatched."""
    from datetime import datetime

    from summit_23_snowpark_data_lake_workloads_spark.operators.joins import asof_join

    t = lambda s: datetime.fromisoformat(s)
    left = spark.createDataFrame(
        [
            (1, t("2024-01-01 10:00:00"), "early"),   # before any right row
            (1, t("2024-01-01 12:00:00"), "exact"),   # ties a right row
            (1, t("2024-01-01 13:30:00"), "between"),
            (2, t("2024-01-01 09:00:00"), "other"),   # user with no right rows
        ],
        ["user_id", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, t("2024-01-01 11:00:00"), 100),
            (1, t("2024-01-01 12:00:00"), 200),
            (1, t("2024-01-01 14:00:00"), 300),
        ],
        ["user_id", "ts", "val"],
    )
    got = {
        r.tag: (r.ts_r, r.val_r)
        for r in asof_join(left, right, "user_id", "ts", "ts").collect()
    }
    assert got["early"] == (None, None)
    assert got["exact"] == (t("2024-01-01 12:00:00"), 200), "equal ts matches"
    assert got["between"] == (t("2024-01-01 12:00:00"), 200), "latest prior, not next"
    assert got["other"] == (None, None)

    inner = asof_join(left, right, "user_id", "ts", "ts", how="inner")
    assert {r.tag for r in inner.collect()} == {"exact", "between"}


def test_range_join_matches_naive_and_avoids_nested_loop(spark, sf_dir):
    """Chunked range join must return exactly the naive BETWEEN join's
    rows — including intervals spanning chunk boundaries — with an
    equi-join plan (no BroadcastNestedLoopJoin / CartesianProduct)."""
    from summit_23_snowpark_data_lake_workloads_spark.operators.joins import (
        range_join_point_in_interval,
    )
    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events")
    iv = (
        ev.filter(F.col("user_id") % 7 == 0)
        .groupBy(F.col("user_id").alias("owner_id"))
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr("INTERVAL 100 MINUTES"))
    )
    pts = ev.select("event_id", "ts")
    chunked = range_join_point_in_interval(pts, iv, "ts", "w_start", "w_end", 3600)
    naive = pts.join(iv, F.col("ts").between(F.col("w_start"), F.col("w_end")))
    keys = ["event_id", "owner_id"]
    assert chunked.select(keys).exceptAll(naive.select(keys)).count() == 0
    assert naive.select(keys).exceptAll(chunked.select(keys)).count() == 0

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunked.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_skew_aware_join_routes_on_profile(spark):
    """The closed pre-flight loop (r5 advice #9): key_skew_profile's
    salt_recommended flag gets a consumer. A profiled hot key routes
    through the salted join (plan shows the n_salts dim replication and
    the composite (key, _salt) shuffle); a balanced key plans as a
    plain equi-join; both routes return exactly the plain join's rows."""
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.operators.joins import (
        key_skew_profile,
        skew_aware_join,
    )

    # hot: key 7 holds ~50% of the fact side
    hot = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    balanced = spark.range(20_000).select(
        (F.col("id") % 100).alias("k"), (F.col("id") * 3).alias("payload")
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("seg"), F.col("id") % 5).alias("seg")
    )

    hot_prof = key_skew_profile(hot, "k").collect()[0]
    bal_prof = key_skew_profile(balanced, "k").collect()[0]
    assert hot_prof["salt_recommended"] == 1
    assert bal_prof["salt_recommended"] == 0

    routed_hot = skew_aware_join(hot, dim, "k", n_salts=8, profile=hot_prof)
    routed_bal = skew_aware_join(balanced, dim, "k", profile=bal_prof)
    hot_plan = routed_hot._jdf.queryExecution().executedPlan().toString()
    bal_plan = routed_bal._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in hot_plan, "hot key must route through the salted join"
    assert "_salt" not in bal_plan, "balanced key must stay a plain join"

    plain = {tuple(r) for r in hot.join(dim, "k").collect()}
    assert {tuple(r) for r in routed_hot.collect()} == plain
    plain_bal = {tuple(r) for r in balanced.join(dim, "k").collect()}
    assert {tuple(r) for r in routed_bal.collect()} == plain_bal

    # no pre-collected profile: the router profiles internally
    assert skew_aware_join(hot, dim, "k").count() == len(plain)
