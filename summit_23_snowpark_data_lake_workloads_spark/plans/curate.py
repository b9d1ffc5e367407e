"""Medallion curate steps — the reference's three stored procedures as
pure DataFrame->DataFrame transforms (SURVEY §2.8 U2; IO belongs to the
DAG runner, not the transform).

Scale notes: every step is a declarative plan — Catalyst handles pushdown
and join strategy. ``enrich_sales`` broadcasts the deduped product master
(a dimension) so the 500M-row fact table never shuffles for that join;
the customer join shuffles on the join key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.scalar import (
    between_labels,
    cast_decimal_38_2,
    first_name,
    last_name,
    normalize_phone,
    parse_currency,
    try_cast_decimal_38_2,
    try_parse_currency,
)

PROCESSED_CUSTOMER_COLUMNS = [
    "CUSTOMER_ID",
    "FIRST_NAME",
    "LAST_NAME",
    "DOB",
    "JOB_TITLE",
    "COMPANY",
    "STREET",
    "CITY",
    "STATE",
    "ZIP",
    "COUNTRY",
    "HOME_PHONE",
    "CELL_PHONE",
    "WORK_PHONE",
]


def standardize_customer(cust_df: DataFrame) -> DataFrame:
    """Customer standardization (``02_customer_sp.sql:24-31``):
    normalize the three phone columns to 10 digits, split NAME at the
    first space into FIRST_NAME/LAST_NAME, rename POSTCODE->ZIP, project
    the fixed 14-column processed schema.
    """
    df = (
        cust_df.withColumn("WORK_PHONE", normalize_phone("WORK_PHONE"))
        .withColumn("CELL_PHONE", normalize_phone("CELL_PHONE"))
        .withColumn("HOME_PHONE", normalize_phone("HOME_PHONE"))
        .withColumn("FIRST_NAME", first_name("NAME"))
        .withColumn("LAST_NAME", last_name("NAME"))
        .withColumnRenamed("POSTCODE", "ZIP")
    )
    return df.select(*PROCESSED_CUSTOMER_COLUMNS)


def parse_invoice_text(pdf_text_df: DataFrame, strict: bool = True) -> DataFrame:
    """Invoice field extraction (``3BC_create_raw_pdf_text_view.sql:1-12`` /
    ``03_invoice_sp.sql:27``): the 10-column SPLIT_PART cascade over the
    extracted PDF text. Input columns: RELATIVE_PATH, PDF_TEXT.

    Whole projection compiles to one codegen stage — Snowflake's nested
    SPLIT_PART chain maps 1:1 onto ``F.split_part`` (same 1-based index,
    same ''-out-of-range semantics).

    ``strict=True`` reproduces reference semantics (malformed numerics
    error, like Snowflake TO_NUMBER). ``strict=False`` yields NULLs for
    unparseable amounts so one corrupt document can't fail the batch.
    """
    money = parse_currency if strict else try_parse_currency
    total_cast = cast_decimal_38_2 if strict else try_cast_decimal_38_2
    t = F.col("PDF_TEXT")
    status = F.trim(
        F.split_part(F.split_part(t, F.lit("Status:"), F.lit(2)), F.lit("Payment"), F.lit(1))
    )
    return pdf_text_df.select(
        "RELATIVE_PATH",
        F.lpad(between_labels(t, "Customer:"), 10, "0").alias("CUSTOMER_ID"),
        between_labels(t, "Invoice #:").alias("INVOICE_NUM"),
        between_labels(t, "Generated On:").alias("INV_GEN_DT"),
        status.alias("INV_STATUS"),
        between_labels(t, "Payment Date:").alias("PAYMENT_DT"),
        money(between_labels(t, "Item 1")).alias("ITEM_1"),
        money(between_labels(t, "Item 2")).alias("ITEM_2"),
        money(between_labels(t, "Item 3")).alias("ITEM_3"),
        total_cast(between_labels(t, "Total")).alias("TOTAL"),
    )


def build_product_master(prod_df: DataFrame, deterministic: bool = True) -> DataFrame:
    """Product-master dedup (``04_sales_enrich_sp.sql:43-47``, W1/R8):
    ``row_number() OVER (PARTITION BY PRODUCT ORDER BY ...) = 1``.

    The reference orders by the partition key itself — an explicitly
    arbitrary pick. ``deterministic=True`` (default) adds TITLE/BRAND as
    tie-breaks so tests and the oracle agree on which row survives;
    ``False`` reproduces the reference's arbitrary-row semantics.
    """
    order_cols = (
        [F.col("PRODUCT"), F.col("TITLE"), F.col("BRAND")]
        if deterministic
        else [F.col("PRODUCT")]
    )
    w = W.partitionBy("PRODUCT").orderBy(*order_cols)
    return (
        prod_df.select(
            "PRODUCT",
            "TITLE",
            "BRAND",
            "MAIN_CATEGORY",
            "SUB_CATEGORY",
            F.row_number().over(w).alias("ROW_NUM"),
        )
        .filter(F.col("ROW_NUM") == 1)
    )


def enrich_sales(
    sales_df: DataFrame, cust_df: DataFrame, prod_df: DataFrame
) -> DataFrame:
    """Sales enrichment (``04_sales_enrich_sp.sql:28-56``):
    derive SALES_AMT (F11), USING-join to processed customer (J1),
    left-join to the deduped product master (J2), full-row distinct (A4).

    Scale: product master is a dimension — broadcast explicitly so the
    fact table avoids a shuffle; the customer join is the only shuffle.
    """
    sales_df = sales_df.withColumn(
        "SALES_AMT", F.col("TXN_QUANTITY") * F.col("PRODUCT_UNIT_PRICE")
    )
    sales_cust_df = sales_df.join(cust_df, "CUSTOMER_ID").select(
        sales_df.TXN_ID,
        sales_df.TXN_DATE,
        sales_df.TXN_QUANTITY,
        sales_df.PRODUCT_ID,
        sales_df.PRODUCT_DESC,
        sales_df.PRODUCT_UNIT_PRICE,
        sales_df.SALES_AMT,
        sales_df.PAYMENT_METHOD,
        sales_df.CUSTOMER_ID,
        cust_df.ZIP,
        cust_df.FIRST_NAME,
        cust_df.LAST_NAME,
        cust_df.CITY,
        cust_df.STATE,
        cust_df.COUNTRY,
    )
    prod_master_df = build_product_master(prod_df)
    sales_txn = sales_cust_df.join(
        F.broadcast(prod_master_df),
        sales_cust_df.PRODUCT_ID == prod_master_df.PRODUCT,
        "left",
    )
    return sales_txn.distinct()
