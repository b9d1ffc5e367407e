"""Recommendation workflow semantics (Q2 full composition) + the S10 view
sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.plans.recommend import recommend
from summit_23_snowpark_data_lake_workloads_spark.sources.catalog import create_view

from . import fixtures as FX


def test_recommend_excludes_bought_and_ranks(spark):
    feed = FX.gen_product_feed(600, 150)
    customers = FX.gen_customers(40)
    products = sorted({r["PRODUCT"] for r in feed})
    txns = FX.gen_txn_history(customers, products[:80], n=600)
    purchases = spark.createDataFrame(txns).select("CUSTOMER_ID", "PRODUCT_ID")

    recs = recommend(purchases, spark.createDataFrame(feed), top_n=3).collect()
    assert recs, "recommendations must be non-empty"

    bought = {(t["CUSTOMER_ID"], t["PRODUCT_ID"]) for t in txns}
    by_group: dict[tuple, list] = {}
    for r in recs:
        # never recommend what the customer already bought
        assert (r.CUSTOMER_ID, r.PRODUCT) not in bought
        by_group.setdefault((r.CUSTOMER_ID, r.MAIN_CATEGORY), []).append(r)
    for (cust, cat), rows in by_group.items():
        rows.sort(key=lambda r: r.rn)
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)
    # N/A-titled products are excluded from the catalog (app's filter)
    na_products = {r["PRODUCT"] for r in feed if r["TITLE"] == "N/A"}
    # products whose MASTER row (deterministic dedup) is N/A can't appear
    from summit_23_snowpark_data_lake_workloads_spark.plans.curate import (
        build_product_master,
    )

    master_na = {
        r.PRODUCT
        for r in build_product_master(spark.createDataFrame(feed))
        .filter(F.col("TITLE") == "N/A")
        .collect()
    }
    assert all(r.PRODUCT not in master_na for r in recs)


def test_create_view_sink(spark, sf_dir):
    # permanent views may not reference temp views; point at storage
    # directly (the 3BC view-over-raw-table shape)
    create_view(
        spark,
        "region_upper",
        f"SELECT upper(r_name) AS rn FROM parquet.`{sf_dir}/region.parquet`",
    )
    out = {r.rn for r in spark.table("region_upper").collect()}
    assert len(out) == 5 and all(s == s.upper() for s in out)
