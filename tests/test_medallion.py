"""End-to-end medallion pipeline over catalog tables: raw -> processed ->
curated via the reference DAG wiring (golden end-to-end test, SURVEY §5.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.plans.dag import run_dag
from summit_23_snowpark_data_lake_workloads_spark.plans.medallion import reference_dag
from summit_23_snowpark_data_lake_workloads_spark.sources.batch import validation_counts
from summit_23_snowpark_data_lake_workloads_spark.sources.catalog import (
    bootstrap_catalog,
    save_table,
)

from . import fixtures as FX


@pytest.fixture(scope="module")
def loaded_raw(spark):
    bootstrap_catalog(spark)
    customers = FX.gen_customers(150)
    feed = FX.gen_product_feed(400, 120)
    products = sorted({r["PRODUCT"] for r in feed})
    txns = FX.gen_txn_history(customers, products[:60] + ["XX-0000000Z"], n=800)
    texts = FX.gen_invoice_texts(customers, n=60)
    save_table(spark.createDataFrame(customers), "raw.customer")
    save_table(spark.createDataFrame(feed), "raw.product_views_and_purchases")
    save_table(
        spark.createDataFrame(txns).withColumnRenamed("TXN_DATE", "TXN_DATE"),
        "raw.txn_history",
    )
    save_table(spark.createDataFrame(texts), "raw.pdf_raw_text")
    return customers, feed, txns, texts


def test_full_medallion_dag(spark, loaded_raw):
    customers, feed, txns, texts = loaded_raw
    results = run_dag(spark, reference_dag())
    assert results["CUSTOMER_PROCESSED"] == "TABLE LOADED"
    assert results["SALES_ENRICH_CURATED"].endswith("table loaded")

    processed = spark.table("processed.customer")
    assert processed.count() == len({c["CUSTOMER_ID"] for c in customers})
    assert "ZIP" in processed.columns and "POSTCODE" not in processed.columns

    details = spark.table("processed.invoice_details")
    assert details.count() == len(texts)
    assert details.filter(F.length("CUSTOMER_ID") != 10).count() == 0

    curated = spark.table("curated.product_sales")
    # inner customer join drops ~1% orphans; left product join keeps all rows
    matched = [t for t in txns if t["CUSTOMER_ID"] != "9999999998"]
    assert curated.count() == len({t["TXN_ID"] for t in matched})
    assert curated.filter(F.col("SALES_AMT").isNull()).count() == 0

    counts = {
        r.table_name: r.row_count
        for r in validation_counts(
            spark,
            ["processed.customer", "processed.invoice_details", "curated.product_sales"],
        ).collect()
    }
    assert counts["processed.invoice_details"] == len(texts)
