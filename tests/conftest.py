from __future__ import annotations

import pytest

from summit_23_snowpark_data_lake_workloads_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        "summit23_tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": str(wh),
            # managed-table metadata must not land in the repo
            "javax.jdo.option.ConnectionURL": f"jdbc:derby:;databaseName={wh}/metastore_db;create=true",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
