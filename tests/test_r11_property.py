"""Property-based cross-engine tests for the round-11 operators
(hypothesis): on ARBITRARY generated data — not just the driver fixtures —
the packing folds, the mutual-information fixed points, the k-anonymity
census (NEGATIVE balances included: the DIV-vs-floor-division trap), and
the Morton-code layout audit must match the real DuckDB oracle
cell-for-cell. Few examples, real parquet round trips, bit-exact
comparison (the parity.py contract)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as spec

_Q = spec.queries()
_O = spec.oracle_sql()


@pytest.fixture(scope="module")
def scratch(tmp_path_factory):
    return tmp_path_factory.mktemp("r11prop")


def _cmp(spark, d, key, table):
    got = sorted(
        tuple(None if (isinstance(v, float) and math.isnan(v)) else v for v in r)
        for r in _Q[key](spark, str(d)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{d}/{table}.parquet')"
    )
    pdf = con.execute(_O[key]).fetch_df()
    con.close()
    want = sorted(
        tuple(None if pd.isna(v) else v for v in t)
        for t in pdf.itertuples(index=False, name=None)
    )
    assert got == want, (key, got[:3], want[:3])
    return got


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(
        st.integers(min_value=1, max_value=700), min_size=1, max_size=120
    )
)
def test_pack_bestfit_matches_oracle_on_random_lengths(spark, scratch, lens):
    """Arbitrary doc lengths, including oversize (> 512-token) docs that
    must open their own zero-residual pack — the BFD and next-fit folds
    must agree with list_reduce bit-exactly."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(lens)),
            "text": [" ".join(["t"] * n) for n in lens],
        }
    )
    d = scratch / f"p{abs(hash(tuple(lens))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "documents.parquet"))
    _cmp(spark, d, "q_pack_bestfit", "documents")


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["O", "F", "P"]),
            st.sampled_from(["1-URGENT", "2-HIGH", "3-LOW", "4-NONE"]),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_mutual_info_matches_oracle_on_random_cells(spark, scratch, rows):
    """Arbitrary status × priority contingency tables, including
    single-cell and perfectly-dependent ones — every e9-floored ln term
    and the NMI tail must agree bit-exactly."""
    pdf = pd.DataFrame(rows, columns=["o_orderstatus", "o_orderpriority"])
    d = scratch / f"m{abs(hash(tuple(rows))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "orders.parquet"))
    _cmp(spark, d, "q_agg_mutual_info", "orders")


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.sampled_from(["AUTO", "BUILDING", "MACHINERY"]),
            # cents in [-99999, 999999]: NEGATIVE balances are the point
            # (Spark DIV truncates, DuckDB // floors; the shift must hide it)
            st.integers(min_value=-99_999, max_value=999_999).map(
                lambda c: c / 100.0
            ),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_k_anon_matches_oracle_with_negative_balances(spark, scratch, rows):
    pdf = pd.DataFrame(
        rows, columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )
    pdf["c_custkey"] = range(len(pdf))
    d = scratch / f"k{abs(hash(tuple(rows))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "customer.parquet"))
    _cmp(spark, d, "q_privacy_k_anon", "customer")


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),
            st.integers(min_value=1, max_value=50_000_000).map(
                lambda c: c / 100.0
            ),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_zorder_matches_oracle_on_random_points(spark, scratch, rows):
    """Arbitrary (key, price) point sets, including degenerate ranges
    (all-equal columns hit the greatest(range, 1) guard) — both layout
    censuses must agree bit-exactly."""
    pdf = pd.DataFrame(rows, columns=["o_custkey", "o_totalprice"])
    d = scratch / f"z{abs(hash(tuple(rows))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "orders.parquet"))
    _cmp(spark, d, "q_lake_zorder", "orders")
