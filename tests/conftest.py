from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from phoebe_spark.session import get_spark

    s = get_spark("phoebe-tests", shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = os.environ.get("PHOEBE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
