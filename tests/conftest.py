from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpe.session import get_spark  # noqa: E402
from tools.parity import TABLES, duck_connect  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gpe-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck_smoke() -> duckdb.DuckDBPyConnection:
    return duck_connect(SF_SMOKE)


@pytest.fixture(scope="session")
def duck_t2() -> duckdb.DuckDBPyConnection:
    return duck_connect(SF_T2)


__all__ = ["TABLES", "SF_SMOKE", "SF_T2"]
