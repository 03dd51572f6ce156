import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dataweb_spark.session import get_spark
    s = get_spark("dataweb_spark_tests", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def demo_web(sf_dir):
    from dataweb_spark.demo import build_demo_web
    return build_demo_web(sf_dir)
