from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from storm_data_etl_service_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
