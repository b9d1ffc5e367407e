"""Unpaid-invoice analysis app (reference
``streamlit/pages/2_unpaid_invoice_analysis.py``).

Server side: invoice ⋈ customer on CUSTOMER_ID, ``INV_STATUS =
'Overdue'``, labeled ``"LAST, FIRST (id)"``, global ORDER BY total desc
(J3/P5/F10/O1). Client side: state multiselect filter and the top-20
rank slice the reference computes inside the altair spec
(``transform_window(rank) + rank < 20``) — reproduced here as plain
pandas so it is testable and chart-library-agnostic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overdue_invoices(invoice_details: DataFrame, customer: DataFrame) -> DataFrame:
    """The app's backing query (``2_unpaid:11-15``), lazy and
    server-side: Catalyst rewrites the implicit cross join + WHERE into
    an equi-join and pushes the Overdue filter to the invoice scan."""
    inv = invoice_details.select("CUSTOMER_ID", "INV_STATUS", "TOTAL")
    cust = customer.select(
        "CUSTOMER_ID", "FIRST_NAME", "LAST_NAME",
        "HOME_PHONE", "WORK_PHONE", "CELL_PHONE", "STREET", "CITY", "STATE",
    )
    return (
        inv.join(cust, "CUSTOMER_ID")
        .filter(F.col("INV_STATUS") == "Overdue")
        .select(
            F.concat(
                F.col("LAST_NAME"), F.lit(", "), F.col("FIRST_NAME"),
                F.lit(" ("), F.col("CUSTOMER_ID"), F.lit(")"),
            ).alias("customer"),
            "CUSTOMER_ID", "INV_STATUS",
            F.col("TOTAL").alias("invoice_total"),
            "HOME_PHONE", "WORK_PHONE", "CELL_PHONE", "STREET", "CITY", "STATE",
        )
        .orderBy(F.desc("invoice_total"))
    )


def state_options(pdf: pd.DataFrame) -> list[str]:
    """Sorted distinct states for the multiselect (``2_unpaid:21-23``)."""
    return sorted(pdf["STATE"].dropna().unique().tolist())


def filter_states(pdf: pd.DataFrame, states: list[str]) -> pd.DataFrame:
    """The post-fetch state filter (``2_unpaid:37``)."""
    return pdf.loc[pdf["STATE"].isin(states)].reset_index(drop=True)


def top_rank_frame(pdf: pd.DataFrame, k: int = 20) -> pd.DataFrame:
    """The chart's rank slice (``2_unpaid:44-48``): competition-rank by
    invoice_total desc, keep rank < k — altair's ``rank < 20`` is
    strict, so ties AT the boundary drop exactly as in the reference."""
    ranked = pdf.copy()
    ranked["rank"] = ranked["invoice_total"].rank(method="min", ascending=False)
    return ranked.loc[ranked["rank"] < k].reset_index(drop=True)


def render_page(spark, invoice_details: DataFrame, customer: DataFrame):
    """Streamlit shell (optional dependency)."""
    try:
        import streamlit as st
    except ImportError as e:  # pragma: no cover - env without streamlit
        raise ImportError(
            "streamlit is not installed; use overdue_invoices/"
            "filter_states/top_rank_frame directly"
        ) from e
    st.set_page_config(page_title="Unpaid Invoice Analysis", layout="wide")
    st.title("Unpaid Invoice Analysis")
    pdf = overdue_invoices(invoice_details, customer).toPandas()
    opts = state_options(pdf)
    select_all = st.checkbox("Select all", value=True)
    chosen = st.multiselect(
        "Select one or more options:", opts, opts if select_all else []
    )
    pdf = filter_states(pdf, chosen)
    st.header("Unpaid Invoices by Customer")
    st.bar_chart(top_rank_frame(pdf).set_index("customer")["invoice_total"])
    st.dataframe(pdf)
