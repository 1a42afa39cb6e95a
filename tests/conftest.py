from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imdb_metacritic_data_warehouse_spark.session import get_spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("imdb_dw_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
