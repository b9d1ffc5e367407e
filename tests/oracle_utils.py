"""Differential-compare harness: Spark result vs DuckDB oracle.

Canonicalization mirrors the driver's gate: sort columns by name,
order-insensitive row compare, small float tolerance (the declared queries
additionally round on both sides so the driver's exact hash also matches).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from summit_23_snowpark_data_lake_workloads_spark.sources.batch import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(9)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = canonical(spark_df.toPandas())
    want = canonical(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} duckdb={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duckdb={len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )
