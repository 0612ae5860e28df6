"""Property-based cross-engine tests for the round-10 operators
(hypothesis): on ARBITRARY generated data — not just the driver fixtures —
the winsorized/trimmed means, the BPE table+encode, and the phash
banding must match the real DuckDB oracle cell-for-cell. Few examples,
real parquet round trips, bit-exact comparison (the parity.py contract)."""

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
    return tmp_path_factory.mktemp("r10prop")


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
    rows=st.lists(
        st.tuples(
            st.sampled_from(["1-URGENT", "2-HIGH", "3-LOW"]),
            st.integers(min_value=1, max_value=10_000_000).map(
                lambda c: c / 100.0
            ),
        ),
        min_size=1,
        max_size=400,
    )
)
def test_winsorized_matches_oracle_on_random_prices(spark, scratch, rows):
    """Arbitrary positive 2-decimal prices, heavy ties included — the
    percentile_disc cut, clamps, and integer-DIV means must agree
    bit-exactly."""
    pdf = pd.DataFrame(rows, columns=["o_orderpriority", "o_totalprice"])
    pdf["o_orderkey"] = range(len(pdf))
    d = scratch / f"w{abs(hash(tuple(map(tuple, rows)))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "orders.parquet"))
    _cmp(spark, d, "q_agg_winsorized", "orders")


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(list("abcdef")), min_size=1, max_size=30
        ).map(lambda toks: " ".join(toks)),
        min_size=1,
        max_size=40,
    )
)
def test_bpe_encode_matches_oracle_on_random_token_streams(
    spark, scratch, docs
):
    """A 6-token vocabulary maximizes rule conflicts, a==b runs, and
    run-split edge cases — table selection and greedy merge counts must
    agree with the gaps-and-islands oracle on every doc."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["xx"] * len(docs),
            "source": ["prop"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    d = scratch / f"b{abs(hash(tuple(docs))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "documents.parquet"))
    _cmp(spark, d, "q_text_bpe_encode", "documents")


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.data(),
    n_docs=st.integers(min_value=2, max_value=12),
)
def test_phash_matches_oracle_on_random_payloads(
    spark, scratch, data, n_docs
):
    """Random printable-ASCII payloads around the 64-byte segment floor,
    with forced duplicates — signatures, banding, and Hamming verify
    must agree (incl. the <64-byte skip on both engines)."""
    alphabet = st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz0123456789 .,;")
    )
    texts = [
        "".join(
            data.draw(
                st.lists(alphabet, min_size=40, max_size=200),
                label=f"doc{i}",
            )
        )
        for i in range(n_docs)
    ]
    texts.append(texts[0])  # guarantee at least one exact-dup pair
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["xx"] * len(texts),
            "source": ["prop"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = scratch / f"p{abs(hash(tuple(texts))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "documents.parquet"))
    got = _cmp(spark, d, "q_multimodal_phash", "documents")
    if len(texts[0]) >= 64:
        assert any(h == 0 for _, _, h in got)  # the forced dup surfaced


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                ["word", "Agent#007", "Ledger#123456789", "12.50",
                 "9876543", "x1", "#", "a#b", "7.1", "007#x", "55555.99"]
            ),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=30,
    )
)
def test_pii_screen_matches_oracle_on_adversarial_text(spark, scratch, docs):
    """Java regex vs RE2 on texts packed with boundary cases for all
    three classes (handles, 6+-digit runs, money decimals, near-misses
    like 'a#b' and '007#x') — counts AND the chained redaction must
    agree. Only the documents leg varies; customer/events come from the
    smoke fixture so the union shape stays the declared one."""
    import shutil

    from tests.conftest import SF_SMOKE

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["xx"] * len(docs),
            "source": ["prop"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    d = scratch / f"s{abs(hash(tuple(docs))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "documents.parquet"))
    for t in ("customer", "events"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", str(d / f"{t}.parquet"))
    got = sorted(
        tuple(r) for r in _Q["q_text_pii_screen"](spark, str(d)).collect()
    )
    con = duckdb.connect()
    for t in ("documents", "customer", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    pdf_o = con.execute(_O["q_text_pii_screen"]).fetch_df()
    con.close()
    want = sorted(
        tuple(None if pd.isna(v) else v for v in t)
        for t in pdf_o.itertuples(index=False, name=None)
    )
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(list("abcdefghij")), min_size=1, max_size=40
        ).map(" ".join),
        min_size=1,
        max_size=50,
    )
)
def test_zipf_fit_matches_oracle_on_random_counts(spark, scratch, docs):
    """Arbitrary token-count distributions — the e6-floored ln fixed
    points and the HUGEINT OLS moments must agree bit-exactly (this is
    the probe for ln() boundary divergence between the JVM and libm)."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["xx"] * len(docs),
            "source": ["prop"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    d = scratch / f"z{abs(hash(tuple(docs))) % 10**9}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "documents.parquet"))
    _cmp(spark, d, "q_text_zipf_fit", "documents")
