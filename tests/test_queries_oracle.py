"""Differential tests: every declared query vs its DuckDB oracle at sf0.001.

This is a local fast mirror of the driver's sf0.01 correctness gate.
"""

from __future__ import annotations

import pytest

from summit_23_snowpark_data_lake_workloads_spark.plans.queries import ORACLES, QUERIES

from .conftest import SF_DIR
from .oracle_utils import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_every_query_has_nonzero_result(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at sf0.001"


def test_approx_stats_tolerance(spark, sf_dir):
    """The sketch tier has no cross-engine oracle; pin accuracy against
    exact aggregates instead (HLL++ rsd=1%; GK percentile accuracy=10k
    is effectively exact at test scale)."""
    from pyspark.sql import functions as F

    approx = {r.event_type: r for r in QUERIES["events_approx_stats"](spark, sf_dir).collect()}
    from summit_23_snowpark_data_lake_workloads_spark.sources.batch import read_table

    ev = read_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(3, 0.05 * e.users)
        assert abs(a.p50_value - e.p50) <= max(0.5, 0.05 * abs(e.p50))
        assert abs(a.p95_value - e.p95) <= max(0.5, 0.05 * abs(e.p95))
