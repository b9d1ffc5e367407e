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
