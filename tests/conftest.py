from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from solana_snapshot_etl_tools_spark.session import get_spark

    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def raw_accounts(spark):
    from solana_snapshot_etl_tools_spark.fixtures import raw_accounts_df

    return raw_accounts_df(spark).cache()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"
