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


def test_events_type_trend_closed_form(spark, tmp_path):
    """Pin events_type_trend's OLS semantics against hand-computed
    values on exact lines, so a future ts-typing/encoding change cannot
    silently flip the regression family's input scaling (the x axis is
    fractional epoch seconds centered on 2024-01-01T00:00:00Z).
    """
    from datetime import datetime, timezone

    from summit_23_snowpark_data_lake_workloads_spark.plans.queries import QUERIES

    t0 = 1704067200  # the query's centering epoch
    rows = []
    # type 'lin': v = 1.0 + 0.1 * x  -> slope .1, intercept 1, r2 1
    for i, (dt, v) in enumerate([(0, 1.0), (10, 2.0), (20, 3.0)]):
        rows.append((i, datetime.fromtimestamp(t0 + dt, tz=timezone.utc), 1, "lin", v, "{}"))
    # type 'flat': symmetric tent -> slope 0, intercept mean 10/3, r2 0
    for i, (dt, v) in enumerate([(0, 0.0), (10, 10.0), (20, 0.0)]):
        rows.append((10 + i, datetime.fromtimestamp(t0 + dt, tz=timezone.utc), 1, "flat", v, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r.event_type: r
        for r in QUERIES["events_type_trend"](spark, str(tmp_path)).collect()
    }
    lin = got["lin"]
    assert (lin.slope_per_sec, lin.intercept, lin.r2, lin.n) == (0.1, 1.0, 1.0, 3)
    flat = got["flat"]
    assert (flat.slope_per_sec, flat.intercept, flat.r2, flat.n) == (
        0.0,
        round(10.0 / 3.0, 6),
        0.0,
        3,
    )
