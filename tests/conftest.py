import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running stress/scale tests (minutes); deselected by "
        "default via pytest.ini addopts so the driver's bounded gate "
        "completes — run everything with -m '' (builders: do this before "
        "shipping structural changes)",
    )


@pytest.fixture(scope="session")
def spark():
    from deltacat_spark.session import build_session

    s = build_session("deltacat-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def catalog(spark, tmp_path):
    from deltacat_spark.catalog import Catalog

    return Catalog(spark, str(tmp_path / "catalog"))
