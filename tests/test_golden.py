"""Golden-file regression tests (SURVEY §5.2): the curate-layer outputs
on the deterministic fixtures are pinned to checked-in CSVs — value AND
schema drift both fail. Regenerate intentionally with:

    SPARK_GRAFT_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py

The DuckDB oracle gate covers value correctness of the declared queries;
goldens additionally pin the PIPELINE functions (column names, dtypes,
row-level values) against accidental semantic drift during refactors.
"""

from __future__ import annotations

import os
import pathlib

import pandas as pd
import pytest

from summit_23_snowpark_data_lake_workloads_spark.plans.curate import (
    enrich_sales,
    parse_invoice_text,
    standardize_customer,
)

from . import fixtures as FX

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
REGEN = os.environ.get("SPARK_GRAFT_REGEN_GOLDEN") == "1"


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def _check(df, name: str) -> None:
    got = _canon(df.toPandas())
    path = GOLDEN_DIR / f"{name}.csv"
    if REGEN:
        GOLDEN_DIR.mkdir(exist_ok=True)
        got.to_csv(path, index=False)
        return
    if not path.exists():
        pytest.fail(f"golden file missing: {path} (regen with SPARK_GRAFT_REGEN_GOLDEN=1)")
    want = pd.read_csv(path, dtype=str, keep_default_na=False)
    got = got.astype(str)
    assert list(got.columns) == list(want.columns), (
        f"{name} schema drift: {list(got.columns)} != {list(want.columns)}"
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.fixture(scope="module")
def fixture_tables(spark):
    customers = FX.gen_customers(120)
    feed = FX.gen_product_feed(500, 100)
    products = sorted({r["PRODUCT"] for r in feed})
    txns = FX.gen_txn_history(customers, products[:40] + ["XX-0000000Z"], n=400)
    texts = FX.gen_invoice_texts(customers, n=50)
    return {
        "customers": spark.createDataFrame(customers),
        "feed": spark.createDataFrame(feed),
        "txns": spark.createDataFrame(txns),
        "texts": spark.createDataFrame(texts),
    }


def test_golden_processed_customer(spark, fixture_tables):
    _check(standardize_customer(fixture_tables["customers"]), "processed_customer")


def test_golden_invoice_details(spark, fixture_tables):
    _check(parse_invoice_text(fixture_tables["texts"]), "invoice_details")


def test_golden_product_sales(spark, fixture_tables):
    _check(
        enrich_sales(
            fixture_tables["txns"],
            standardize_customer(fixture_tables["customers"]),
            fixture_tables["feed"],
        ),
        "product_sales",
    )
