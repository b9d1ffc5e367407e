"""Grouped-map / grouped-agg pandas operators (SURVEY §2.8 extension
tier): the slots where per-group Python logic runs Arrow-batched when
relational expressions genuinely can't express it.

Demonstrated with per-user anomaly scoring: robust z-scores need a
per-group median and MAD — exact medians per group are awkward in pure
SQL at scale, and downstream libraries usually want the whole group in
one frame anyway.

Scale: ``applyInPandas`` shuffles once on the group key and streams one
group per call; memory is bounded by the largest single group (use
salting upstream if a group outgrows an executor).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTLIER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("robust_z", T.DoubleType()),
    ]
)


def _score_group(pdf: pd.DataFrame) -> pd.DataFrame:
    med = pdf["value"].median()
    mad = (pdf["value"] - med).abs().median()
    scale = 1.4826 * mad if mad > 0 else 1.0
    z = (pdf["value"] - med) / scale
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "robust_z": z.round(6),
        }
    )


def user_value_outliers(events: DataFrame, z_threshold: float = 3.0) -> DataFrame:
    """Per-user robust z-score outliers via grouped-map ``applyInPandas``:
    (user_id, event_id, value, robust_z) for |z| >= threshold."""
    scored = events.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        _score_group, OUTLIER_SCHEMA
    )
    return scored.filter(F.abs(F.col("robust_z")) >= z_threshold)


# DataType object, not "double": string return types need an active
# session at decoration time, which a module import must not require
@F.pandas_udf(T.DoubleType())
def weighted_mean_udaf(values: pd.Series, weights: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (the custom-aggregate tier): weighted mean.
    Usable directly in ``groupBy().agg(weighted_mean_udaf(...))``."""
    total = float((values * weights).sum())
    w = float(weights.sum())
    return total / w if w else float("nan")
