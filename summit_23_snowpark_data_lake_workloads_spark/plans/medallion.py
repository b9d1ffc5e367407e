"""The reference's end-to-end medallion pipeline wired as DAG steps over
catalog tables — the SP tier (U2) with the generic in/out-table signature
of ``PROCESSED_SP`` (``02_customer_sp.sql:1``), orchestrated per
``05_task_DAG.sql`` (X1/X2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

from ..sources.catalog import save_table
from .curate import enrich_sales, parse_invoice_text, standardize_customer
from .dag import Step


def customer_step(in_table: str, out_table: str) -> Callable[[SparkSession], str]:
    """CUSTOMER_PROCESSED task: raw customer -> standardized processed
    customer (``02_customer_sp.sql``)."""

    def run(spark: SparkSession) -> str:
        save_table(standardize_customer(spark.table(in_table)), out_table)
        return "TABLE LOADED"

    return run


def invoice_step(
    in_table: str, out_table: str, strict: bool = True
) -> Callable[[SparkSession], str]:
    """INVOICE_PROCESSED task: raw pdf text -> parsed invoice details
    (``03_invoice_sp.sql`` / ``3BC`` view)."""

    def run(spark: SparkSession) -> str:
        save_table(parse_invoice_text(spark.table(in_table), strict=strict), out_table)
        return "TABLE LOADED"

    return run


def sales_enrich_step(
    sales_table: str, customer_table: str, product_table: str, out_table: str
) -> Callable[[SparkSession], str]:
    """SALES_ENRICH_CURATED task (``04_sales_enrich_sp.sql``)."""

    def run(spark: SparkSession) -> str:
        save_table(
            enrich_sales(
                spark.table(sales_table),
                spark.table(customer_table),
                spark.table(product_table),
            ),
            out_table,
        )
        return f"{out_table} table loaded"

    return run


def reference_dag() -> list[Step]:
    """The reference task wiring (X2, ``05_task_DAG.sql:9-19``):
    CUSTOMER_PROCESSED -> {INVOICE_PROCESSED, SALES_ENRICH_CURATED}."""
    return [
        Step(
            "CUSTOMER_PROCESSED",
            customer_step("raw.customer", "processed.customer"),
        ),
        Step(
            "INVOICE_PROCESSED",
            invoice_step("raw.pdf_raw_text", "processed.invoice_details"),
            after=["CUSTOMER_PROCESSED"],
        ),
        Step(
            "SALES_ENRICH_CURATED",
            sales_enrich_step(
                "raw.txn_history",
                "processed.customer",
                "raw.product_views_and_purchases",
                "curated.product_sales",
            ),
            after=["CUSTOMER_PROCESSED"],
        ),
    ]
