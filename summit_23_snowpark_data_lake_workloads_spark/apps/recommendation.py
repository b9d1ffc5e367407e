"""Recommendation app (reference
``streamlit/pages/1_recommendation_app.py``).

The reference computes an O(n²) sklearn cosine matrix over a 1,000-
customer pandas sample on the client. Here the cohort query (Q1), the
customer sample (Q4), and the TF-IDF similarity + per-category top-n
(Q2) all run server-side through the distributed
:mod:`..plans.recommend` path; only the final chart-ready frame is
fetched. One deliberate, documented divergence: the sample is
DETERMINISTIC (portable-hash order) instead of ``np.random.choice``,
so the app is reproducible run-to-run.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import portable_hash64
from ..plans.recommend import recommend


def cohort_sales(product_sales: DataFrame, min_purchases: int = 20) -> DataFrame:
    """Q1 cohort extraction (``1_recommendation_app.py:20-32``): sales of
    customers with >= 20 purchases of products LIKE 'b%', capped at 1M
    rows. Catalyst rewrites the IN-subquery to a left semi join."""
    cohort = (
        product_sales.filter(F.col("PRODUCT_ID").like("b%"))
        .groupBy("CUSTOMER_ID")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_purchases)
        .select("CUSTOMER_ID")
    )
    return (
        product_sales.join(cohort, "CUSTOMER_ID", "left_semi")
        .select(
            "CUSTOMER_ID",
            F.concat_ws(", ", "LAST_NAME", "FIRST_NAME").alias("CUST_NAME"),
            "MAIN_CATEGORY", "SUB_CATEGORY", "TITLE", "PRODUCT_ID",
        )
        .limit(1_000_000)
    )


def sample_customers(cohort: DataFrame, n: int = 1000) -> DataFrame:
    """Q4's 1,000-customer sample, deterministic: distinct customers
    ordered by content hash, first n — stable across runs and engines
    (the reference's ``np.random.choice`` reseeds every rerun)."""
    return (
        cohort.select("CUSTOMER_ID")
        .distinct()
        .orderBy(portable_hash64(F.col("CUSTOMER_ID").cast("string")), "CUSTOMER_ID")
        .limit(n)
    )


def recommendations_frame(
    product_sales: DataFrame,
    prod_feed: DataFrame,
    n_customers: int = 1000,
    top_n: int = 3,
    min_purchases: int = 20,
) -> pd.DataFrame:
    """Chart-ready per-customer top-n recommendations for the sampled
    cohort — the app's end-to-end path, distributed until the final
    fetch."""
    from ..cache import release_caches

    cohort = cohort_sales(product_sales, min_purchases)
    sampled = sample_customers(cohort, n_customers)
    purchases = cohort.join(F.broadcast(sampled), "CUSTOMER_ID").select(
        "CUSTOMER_ID", "PRODUCT_ID"
    )
    try:
        return recommend(purchases, prod_feed, top_n=top_n).toPandas()
    finally:
        # terminal consumer: the pandas frame is fully materialized, so
        # engine intermediates (the TF-IDF weight table) are released
        # here per the cache.py contract
        release_caches()


def render_page(spark, product_sales: DataFrame, prod_feed: DataFrame):
    """Streamlit shell (optional dependency)."""
    try:
        import streamlit as st
    except ImportError as e:  # pragma: no cover - env without streamlit
        raise ImportError(
            "streamlit is not installed; use recommendations_frame directly"
        ) from e
    st.set_page_config(page_title="Simple Recommendation App", layout="wide")
    st.header("Simple Recommendation App")
    with st.spinner(text="Computing product similarity ..."):
        pdf = recommendations_frame(product_sales, prod_feed)
    st.success("Computed recommendations...")
    customer = st.selectbox("Customer", sorted(pdf["CUSTOMER_ID"].unique()))
    st.dataframe(pdf.loc[pdf["CUSTOMER_ID"] == customer])
