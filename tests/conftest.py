import os

import pytest

SF_SMOKE = os.environ.get("MYSENSE_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("MYSENSE_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mysense_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")
    spark = get_spark("mysense-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
