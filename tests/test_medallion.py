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


def test_dag_event_table_sink(spark, loaded_raw):
    """X3: with event_table set, one row per step lands in the catalog
    log table with status + duration."""
    bootstrap_catalog(spark)
    spark.sql("DROP TABLE IF EXISTS common.log_events")
    run_dag(spark, reference_dag(), event_table="common.log_events")
    ev = spark.table("common.log_events").toPandas()
    assert set(ev["step"]) == {
        "CUSTOMER_PROCESSED",
        "INVOICE_PROCESSED",
        "SALES_ENRICH_CURATED",
    }
    assert (ev["duration_s"] > 0).all()
    assert ev["error"].isnull().all()
    # append mode: a second run doubles the rows (an audit log, not state)
    run_dag(spark, reference_dag(), event_table="common.log_events")
    assert spark.table("common.log_events").count() == 6


def test_merge_upsert_full_table(spark):
    from summit_23_snowpark_data_lake_workloads_spark.sources.catalog import merge_upsert

    bootstrap_catalog(spark)
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, tag string, v double"
    )
    save_table(base, "processed.upsert_target")
    updates = spark.createDataFrame(
        [(2, "B2", 21.0), (4, "d", 40.0)], "id int, tag string, v double"
    )
    merge_upsert(spark, updates, "processed.upsert_target", ["id"])
    got = {r.id: (r.tag, r.v) for r in spark.table("processed.upsert_target").collect()}
    assert got == {1: ("a", 10.0), 2: ("B2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_compact_table_reduces_files_preserves_data(spark, sf_dir):
    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table
    from summit_23_snowpark_data_lake_workloads_spark.sources.catalog import compact_table

    bootstrap_catalog(spark)
    ev = read_table(spark, sf_dir, "events")
    # simulate streaming-append fragmentation: 64 tiny files
    ev.repartition(64).write.mode("overwrite").saveAsTable("processed.events_frag")
    want = spark.table("processed.events_frag").toPandas()

    before, after = compact_table(spark, "processed.events_frag", target_files=4)
    assert before >= 64 and after <= 4
    got = spark.table("processed.events_frag")
    assert got.count() == len(want)
    assert got.exceptAll(read_table(spark, sf_dir, "events")).count() == 0


def test_cluster_table_gives_disjoint_file_ranges(spark, sf_dir):
    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table
    from summit_23_snowpark_data_lake_workloads_spark.sources.catalog import cluster_table

    bootstrap_catalog(spark)
    ev = read_table(spark, sf_dir, "events")
    ev.repartition(8).write.mode("overwrite").saveAsTable("processed.events_clust")
    cluster_table(spark, "processed.events_clust", ["user_id"], n_files=4)

    tbl = spark.table("processed.events_clust")
    assert tbl.count() == ev.count()
    # each file must own a disjoint user_id range (this is what lets
    # parquet min/max stats prune whole files on range predicates)
    ranges = []
    for f in tbl.inputFiles():
        pdf = spark.read.parquet(f.replace("file:", "")).agg(
            F.min("user_id"), F.max("user_id")
        ).first()
        ranges.append((pdf[0], pdf[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_merge_upsert_partitioned_rewrites_only_touched(spark, tmp_path):
    import os

    from summit_23_snowpark_data_lake_workloads_spark.sources.catalog import merge_upsert

    bootstrap_catalog(spark)
    base = spark.createDataFrame(
        [(1, 100.0, "2024-01-01"), (2, 200.0, "2024-01-01"), (3, 300.0, "2024-01-02")],
        "id int, v double, day string",
    )
    save_table(base, "processed.upsert_part", partition_by=["day"])
    tbl_path = (
        spark.sql("DESCRIBE TABLE EXTENDED processed.upsert_part")
        .filter(F.col("col_name") == "Location")
        .first()
        .data_type.replace("file:", "")
    )
    untouched = os.path.join(tbl_path, "day=2024-01-02")
    before = sorted(os.listdir(untouched))

    updates = spark.createDataFrame(
        [(2, 222.0, "2024-01-01"), (9, 900.0, "2024-01-03")],
        "id int, v double, day string",
    )
    merge_upsert(spark, updates, "processed.upsert_part", ["id"], partition_col="day")

    got = {r.id: (r.v, r.day) for r in spark.table("processed.upsert_part").collect()}
    assert got == {
        1: (100.0, "2024-01-01"),
        2: (222.0, "2024-01-01"),
        3: (300.0, "2024-01-02"),
        9: (900.0, "2024-01-03"),
    }
    # dynamic overwrite must not rewrite the untouched partition's files
    assert sorted(os.listdir(untouched)) == before


def test_create_view_round_trip(spark, loaded_raw):
    """S10 sink pin (sources/catalog.py:create_view; reference
    ``3BC_create_raw_pdf_text_view.sql:1``): a named catalog view over
    the raw PDF text with the reference's split_part field offsets,
    served through ``spark.table``, late-bound to the base table, and
    replaceable in place (CREATE OR REPLACE)."""
    from summit_23_snowpark_data_lake_workloads_spark.sources.catalog import (
        create_view,
    )

    from .fixtures import oracle_parse_invoice

    _, _, _, texts = loaded_raw
    create_view(
        spark,
        "raw.vw_pdf_raw_text",
        """
        SELECT RELATIVE_PATH, PDF_TEXT,
               lpad(split_part(split_part(PDF_TEXT, 'Customer:', 2),
                               ' ', 2), 10, '0') AS CUSTOMER_ID,
               split_part(split_part(PDF_TEXT, 'Invoice #:', 2),
                          ' ', 2) AS INVOICE_NUM
        FROM raw.pdf_raw_text
        """,
    )
    got = {
        r.RELATIVE_PATH: (r.CUSTOMER_ID, r.INVOICE_NUM)
        for r in spark.table("raw.vw_pdf_raw_text").collect()
    }
    assert len(got) == len(texts)
    for row in texts:
        want = oracle_parse_invoice(row)
        assert got[row["RELATIVE_PATH"]] == (
            want["CUSTOMER_ID"],
            want["INVOICE_NUM"],
        )
    # CREATE OR REPLACE: same name, new query shape, no drop needed
    create_view(
        spark,
        "raw.vw_pdf_raw_text",
        "SELECT count(*) AS n FROM raw.pdf_raw_text",
    )
    assert spark.table("raw.vw_pdf_raw_text").columns == ["n"]
    assert spark.table("raw.vw_pdf_raw_text").first().n == len(texts)
    spark.sql("DROP VIEW raw.vw_pdf_raw_text")
