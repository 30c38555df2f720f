from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yet_another_map_reduce_spark.session import build_session

SF_DIR = os.environ.get("YAMR_TEST_SF_DIR", "/root/testdata/sf0.001")
REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="yamr-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
