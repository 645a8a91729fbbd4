from __future__ import annotations

import os

import pytest

os.environ.setdefault("YAMS_DRIVER_MEMORY", "4g")


@pytest.fixture(scope="session")
def spark():
    from yams_spark.session import get_spark

    s = get_spark(app_name="yams_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
