from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from nemscraper_spark.session import get_spark

    s = get_spark(app_name="nemscraper_spark_tests", extra_conf={
        # keep test runs snappy on small data
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": "8g",
        # reference parity: cast failures → null (chunk.rs:211-227)
        "spark.sql.ansi.enabled": "false",
    })
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir_oracle():
    # the driver's correctness gate runs at sf0.01
    return "/root/testdata/sf0.01"
