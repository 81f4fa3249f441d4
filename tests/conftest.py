from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipeline_kinesis_spark import get_spark  # noqa: E402
from pipeline_kinesis_spark.testing import oracle_connection  # noqa: E402

SF_DIR = os.environ.get("PKS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pks-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle():
    con = oracle_connection(SF_DIR)
    yield con
    con.close()
