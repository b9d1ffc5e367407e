"""Grouped-map (applyInPandas) and grouped-agg (pandas UDF) operators vs
pandas-computed oracles."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from summit_23_snowpark_data_lake_workloads_spark.operators.grouped import (
    user_value_outliers,
    weighted_mean_udaf,
)
from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table


def test_user_value_outliers_matches_pandas(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    got = {
        (r.user_id, r.event_id): r.robust_z
        for r in user_value_outliers(ev, z_threshold=3.0).collect()
    }
    pdf = ev.toPandas()
    want = {}
    for uid, g in pdf.groupby("user_id"):
        med = g["value"].median()
        mad = (g["value"] - med).abs().median()
        scale = 1.4826 * mad if mad > 0 else 1.0
        z = ((g["value"] - med) / scale).round(6)
        for eid, zv in zip(g["event_id"], z):
            if abs(zv) >= 3.0:
                want[(uid, eid)] = zv
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == want[k]


def test_weighted_mean_udaf(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 2.0), ("b", 20.0, 0.0)],
        ["k", "v", "w"],
    )
    out = {
        r.k: r.wm
        for r in df.groupBy("k")
        .agg(weighted_mean_udaf("v", "w").alias("wm"))
        .collect()
    }
    assert out["a"] == (1 * 1 + 3 * 3) / 4.0
    assert out["b"] == 10.0
