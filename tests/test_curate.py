"""Reference-semantics parity tests (SURVEY §5.1/§5.2): curate steps vs
pure-Python oracles over FIXTURES.md synthetic data."""

from __future__ import annotations

from decimal import Decimal

import pytest

from summit_23_snowpark_data_lake_workloads_spark.plans.curate import (
    build_product_master,
    enrich_sales,
    parse_invoice_text,
    standardize_customer,
)

from . import fixtures as FX


@pytest.fixture(scope="module")
def customers():
    return FX.gen_customers(200)


def test_standardize_customer_matches_oracle(spark, customers):
    got = {
        r["CUSTOMER_ID"]: r.asDict()
        for r in standardize_customer(spark.createDataFrame(customers)).collect()
    }
    assert len(got) == len({c["CUSTOMER_ID"] for c in customers})
    for c in customers:
        want = FX.oracle_standardize(c)
        assert got[c["CUSTOMER_ID"]] == want, f"mismatch for {c}"


def test_phone_edge_cases(spark):
    """The branches of 02_customer_sp.sql:24-26 individually."""
    rows = [
        {"P": "(882)065-9526", "want": "8820659526"},
        {"P": "850.399.7741x251", "want": "8503997741"},
        {"P": "+1-301-555-0424", "want": "3015550424"},
        {"P": "13015550424", "want": "3015550424"},  # leading 1 stripped
        {"P": "301_555", "want": "301_555"},  # underscore survives the class
    ]
    from pyspark.sql import functions as F

    from summit_23_snowpark_data_lake_workloads_spark.functions.scalar import (
        normalize_phone,
    )

    df = spark.createDataFrame(rows).select(
        "want", normalize_phone("P").alias("got")
    )
    for r in df.collect():
        assert r.got == r.want


def test_parse_invoice_text_matches_oracle(spark, customers):
    texts = FX.gen_invoice_texts(customers, n=120)
    out = {
        r["RELATIVE_PATH"]: r.asDict()
        for r in parse_invoice_text(spark.createDataFrame(texts)).collect()
    }
    for t in texts:
        want = FX.oracle_parse_invoice(t)
        got = dict(out[t["RELATIVE_PATH"]])
        for k in ("ITEM_1", "ITEM_2", "ITEM_3", "TOTAL"):
            got[k] = Decimal(got[k]).quantize(Decimal("0.01"))
        assert got == want, f"mismatch for {t['PDF_TEXT']}"


def test_split_part_out_of_range_is_empty(spark):
    """Fidelity item §4.1: SPLIT_PART out-of-range returns ''."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(F.split_part(F.lit("a b"), F.lit(" "), F.lit(9)).alias("x"))
        .first()
    )
    assert row.x == ""


def test_product_master_dedup(spark):
    feed = FX.gen_product_feed()
    master = build_product_master(spark.createDataFrame(feed)).collect()
    products = [r.PRODUCT for r in master]
    assert len(products) == len(set(products)), "one row per PRODUCT"
    assert set(products) == {r["PRODUCT"] for r in feed}


def test_enrich_sales_semantics(spark, customers):
    feed = FX.gen_product_feed()
    feed_products = sorted({r["PRODUCT"] for r in feed})
    # half the txn products exist in the feed, half don't (left-join nulls)
    txns = FX.gen_txn_history(
        customers, feed_products[:100] + ["ZZ-0000000X"], n=1000
    )
    processed = standardize_customer(spark.createDataFrame(FX.gen_customers(200)))
    sales = spark.createDataFrame(txns)
    out = enrich_sales(sales, processed, spark.createDataFrame(feed))
    rows = out.collect()

    # SALES_AMT arithmetic (F11)
    for r in rows[:50]:
        assert r.SALES_AMT == pytest.approx(r.TXN_QUANTITY * r.PRODUCT_UNIT_PRICE)
    # inner join dropped orphan customers
    matched_ids = {c["CUSTOMER_ID"] for c in customers}
    assert all(r.CUSTOMER_ID in matched_ids for r in rows)
    # left join: unknown product -> null product metadata
    unknown = [r for r in rows if r.PRODUCT_ID == "ZZ-0000000X"]
    assert unknown and all(r.TITLE is None and r.PRODUCT is None for r in unknown)
    # known products got exactly one master row (no fan-out from dup feed rows)
    known_txns = [t for t in txns if t["PRODUCT_ID"] != "ZZ-0000000X"
                  and t["CUSTOMER_ID"] in matched_ids]
    assert len({(r.TXN_ID, r.PRODUCT_ID) for r in rows}) == len(
        {(t["TXN_ID"], t["PRODUCT_ID"]) for t in txns if t["CUSTOMER_ID"] in matched_ids}
    )


def test_dag_runner(spark):
    from summit_23_snowpark_data_lake_workloads_spark.plans.dag import (
        Step,
        run_dag,
        topo_order,
    )

    order: list[str] = []

    def mk(name):
        def fn(s):
            order.append(name)
            return "TABLE LOADED"

        return fn

    # reference wiring X2: customer -> {invoice, sales}
    steps = [
        Step("SALES_ENRICH_CURATED", mk("sales"), after=["CUSTOMER_PROCESSED"]),
        Step("INVOICE_PROCESSED", mk("invoice"), after=["CUSTOMER_PROCESSED"]),
        Step("CUSTOMER_PROCESSED", mk("customer")),
    ]
    results = run_dag(spark, steps)
    assert order[0] == "customer" and set(order) == {"customer", "invoice", "sales"}
    assert all(v == "TABLE LOADED" for v in results.values())

    with pytest.raises(ValueError, match="cycle"):
        topo_order([Step("a", mk("a"), after=["b"]), Step("b", mk("b"), after=["a"])])
