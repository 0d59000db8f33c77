import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kinesis2elastic_spark.session import get_spark

    s = get_spark("k2e-tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "e2e: full-dataflow test against real local endpoints"
    )
