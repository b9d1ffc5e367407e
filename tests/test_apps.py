"""Consume-layer app semantics (SURVEY §2.11) without streamlit: the
engine-side frames the two pages render."""

from __future__ import annotations

import pandas as pd
import pytest

from summit_23_snowpark_data_lake_workloads_spark.apps.recommendation import (
    cohort_sales,
    recommendations_frame,
    sample_customers,
)
from summit_23_snowpark_data_lake_workloads_spark.apps.unpaid_invoices import (
    filter_states,
    overdue_invoices,
    state_options,
    top_rank_frame,
)

from . import fixtures as FX


@pytest.fixture(autouse=True, scope="module")
def _release_engine_caches(spark):
    """App flows register engine caches (TF-IDF weights); make sure this
    module never leaks them into later tests' cache-contract checks."""
    from summit_23_snowpark_data_lake_workloads_spark.cache import release_caches

    yield
    release_caches()


@pytest.fixture(scope="module")
def invoice_frames(spark):
    custs = FX.gen_customers(30)
    cust_rows = [
        {
            "CUSTOMER_ID": c["CUSTOMER_ID"],
            "FIRST_NAME": c["NAME"].split(" ")[0],
            "LAST_NAME": c["NAME"].split(" ")[-1],
            "HOME_PHONE": c["HOME_PHONE"],
            "WORK_PHONE": c["WORK_PHONE"],
            "CELL_PHONE": c["CELL_PHONE"],
            "STREET": c["STREET"],
            "CITY": c["CITY"],
            "STATE": c["STATE"],
        }
        for c in custs
    ]
    inv_rows = [
        {
            "CUSTOMER_ID": c["CUSTOMER_ID"],
            "INV_STATUS": "Overdue" if i % 3 else "Paid",
            "TOTAL": float(100 + 7 * i),
        }
        for i, c in enumerate(custs)
    ]
    return (
        spark.createDataFrame(inv_rows),
        spark.createDataFrame(cust_rows),
        cust_rows,
        inv_rows,
    )


def test_overdue_report_frame(invoice_frames):
    inv, cust, cust_rows, inv_rows = invoice_frames
    pdf = overdue_invoices(inv, cust).toPandas()
    want_overdue = {r["CUSTOMER_ID"] for r in inv_rows if r["INV_STATUS"] == "Overdue"}
    assert set(pdf["CUSTOMER_ID"]) == want_overdue
    # label format "LAST, FIRST (id)" and global desc order by total
    by_id = {c["CUSTOMER_ID"]: c for c in cust_rows}
    for _, row in pdf.iterrows():
        c = by_id[row["CUSTOMER_ID"]]
        assert row["customer"] == f"{c['LAST_NAME']}, {c['FIRST_NAME']} ({c['CUSTOMER_ID']})"
    totals = pdf["invoice_total"].tolist()
    assert totals == sorted(totals, reverse=True)


def test_state_filter_and_rank_slice(invoice_frames):
    inv, cust, *_ = invoice_frames
    pdf = overdue_invoices(inv, cust).toPandas()
    opts = state_options(pdf)
    assert opts == sorted(set(pdf["STATE"].dropna()))
    chosen = opts[: max(1, len(opts) // 2)]
    filtered = filter_states(pdf, chosen)
    assert set(filtered["STATE"]) <= set(chosen)
    top = top_rank_frame(pdf, k=5)
    # strict rank < 5: at most 4 rows unless boundary ties (method=min
    # keeps whole tied groups strictly under the threshold)
    assert (top["rank"] < 5).all()
    assert top["invoice_total"].min() >= pdf["invoice_total"].quantile(0.5)


@pytest.fixture(scope="module")
def sales_frames(spark):
    feed = FX.gen_product_feed(400, 120)
    custs = FX.gen_customers(25)
    products = sorted({r["PRODUCT"] for r in feed})
    txns = FX.gen_txn_history(custs, products, n=900)
    by_id = {c["CUSTOMER_ID"]: c for c in custs}
    titles = {}
    for r in feed:
        titles.setdefault(r["PRODUCT"], r)
    sales_rows = [
        {
            "CUSTOMER_ID": t["CUSTOMER_ID"],
            "FIRST_NAME": by_id[t["CUSTOMER_ID"]]["NAME"].split(" ")[0],
            "LAST_NAME": by_id[t["CUSTOMER_ID"]]["NAME"].split(" ")[-1],
            "MAIN_CATEGORY": titles[t["PRODUCT_ID"]]["MAIN_CATEGORY"],
            "SUB_CATEGORY": titles[t["PRODUCT_ID"]]["SUB_CATEGORY"],
            "TITLE": titles[t["PRODUCT_ID"]]["TITLE"],
            "PRODUCT_ID": t["PRODUCT_ID"],
        }
        # the txn generator injects dirty rows (unknown ids) on purpose;
        # the curated PRODUCT_SALES table this models is post-join clean
        for t in txns
        if t["CUSTOMER_ID"] in by_id and t["PRODUCT_ID"] in titles
    ]
    return spark.createDataFrame(sales_rows), spark.createDataFrame(feed), sales_rows


def test_cohort_sales_semantics(sales_frames):
    sales, _, rows = sales_frames
    got = cohort_sales(sales, min_purchases=3).toPandas()
    counts: dict[str, int] = {}
    for r in rows:
        if r["PRODUCT_ID"].startswith("b"):
            counts[r["CUSTOMER_ID"]] = counts.get(r["CUSTOMER_ID"], 0) + 1
    want_cohort = {c for c, n in counts.items() if n >= 3}
    assert set(got["CUSTOMER_ID"]) == want_cohort
    assert (got["CUST_NAME"].str.contains(", ")).all()


def test_sample_customers_deterministic(sales_frames):
    sales, *_ = sales_frames
    cohort = cohort_sales(sales, min_purchases=1)
    a = sample_customers(cohort, 10).toPandas()["CUSTOMER_ID"].tolist()
    b = sample_customers(cohort, 10).toPandas()["CUSTOMER_ID"].tolist()
    assert a == b and len(a) == 10 == len(set(a))


def test_recommendations_frame_end_to_end(sales_frames):
    sales, feed, rows = sales_frames
    pdf = recommendations_frame(sales, feed, n_customers=15, top_n=2, min_purchases=1)
    assert isinstance(pdf, pd.DataFrame) and not pdf.empty
    bought = {(r["CUSTOMER_ID"], r["PRODUCT_ID"]) for r in rows}
    assert all(
        (row["CUSTOMER_ID"], row["PRODUCT"]) not in bought
        for _, row in pdf.iterrows()
    )
    assert (pdf.groupby(["CUSTOMER_ID", "MAIN_CATEGORY"]).size() <= 2).all()


def test_render_pages_require_streamlit(spark, sales_frames):
    """Without streamlit installed, render_page fails with a clear
    pointer at the engine-side API (and nothing else breaks)."""
    try:
        import streamlit  # noqa: F401

        pytest.skip("streamlit installed; shell path exercised manually")
    except ImportError:
        pass
    from summit_23_snowpark_data_lake_workloads_spark.apps import (
        recommendation,
        unpaid_invoices,
    )

    sales, feed, _ = sales_frames
    with pytest.raises(ImportError, match="streamlit"):
        unpaid_invoices.render_page(spark, sales, feed)
    with pytest.raises(ImportError, match="streamlit"):
        recommendation.render_page(spark, sales, feed)
