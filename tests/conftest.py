from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default to the smallest SF for fast iteration; CI/driver-parity runs can set
# TEST_SF_DIR=/root/testdata/sf0.01 to match the driver's correctness gate.
SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    from corintick_spark.session import get_spark

    s = get_spark(app_name="corintick-spark-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle import duck_connection

    con = duck_connection(sf_dir)
    yield con
    con.close()
