"""Property-based cross-engine determinism tests for gpe/common.py
(hypothesis): on arbitrary 2-decimal measure data — not just the driver
fixtures — the decimal-sum / deterministic-average / floor-ratio idioms must
hash-match DuckDB exactly, and the raw-double idioms they replace must NOT
be relied on. Few examples, real end-to-end parquet round trips."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from gpe.common import davg, dsum, sql_davg, sql_dsum

two_dec = st.integers(min_value=-10_000_000, max_value=10_000_000).map(
    lambda c: c / 100.0
)

rows_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), two_dec),
    min_size=1,
    max_size=500,
)


@pytest.fixture(scope="module")
def scratch(tmp_path_factory):
    return tmp_path_factory.mktemp("prop")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_dsum_davg_match_duckdb_on_random_data(spark, scratch, rows):
    pdf = pd.DataFrame(rows, columns=["k", "x"])
    path = str(scratch / f"d{abs(hash(tuple(map(tuple, rows)))) % 10**9}.parquet")
    pdf.to_parquet(path)

    sdf = (
        spark.read.parquet(path)
        .groupBy("k")
        .agg(dsum("x", "s"), davg("x", "a"))
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    ddf = (
        con.execute(
            f"""SELECT k, {sql_dsum('x', 's')}, {sql_davg('x', 'a')}
                FROM read_parquet('{path}') GROUP BY k ORDER BY k"""
        )
        .fetch_df()
        .reset_index(drop=True)
    )
    con.close()
    assert list(sdf["k"]) == list(ddf["k"])
    # bit-exact equality is the whole point — no tolerance
    assert list(sdf["s"]) == list(ddf["s"]), (list(sdf["s"]), list(ddf["s"]))
    assert list(sdf["a"]) == list(ddf["a"]), (list(sdf["a"]), list(ddf["a"]))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    nums=st.lists(
        st.integers(min_value=0, max_value=10**6), min_size=1, max_size=50
    ),
    den=st.integers(min_value=1, max_value=997),
)
def test_floor_scaling_matches_duckdb(spark, nums, den):
    """FLOOR(n*1e6/d)/1e6 must agree for arbitrary int ratios (this is the
    idiom protecting every small-group average)."""
    pdf = pd.DataFrame({"n": nums})
    sdf = spark.createDataFrame(pdf).select(
        (F.floor(F.col("n") * F.lit(1000000) / F.lit(den)) / F.lit(1000000.0)).alias(
            "r"
        )
    )
    got = [r.r for r in sdf.collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT FLOOR({n} * 1000000.0 / {den}) / 1000000.0"
        ).fetchone()[0]
        for n in nums
    ]
    con.close()
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=300
    ),
    parts=st.sampled_from([2, 5, 32]),
)
def test_two_pass_running_sum_is_pandas_cumsum(spark, vals, parts, monkeypatch):
    """The distributed prefix sum equals pandas cumsum over the same total
    order, for ANY partition count and arbitrary integer sequences."""
    import gpe.common as C

    monkeypatch.setattr(C, "two_pass_parts", lambda s, _p=parts: _p)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    out = C.two_pass_running_sum(spark, df, ["k"], "v", "run")
    got = {r.k: r.run for r in out.collect()}
    want = pd.Series(vals).cumsum()
    assert got == {i: int(want[i]) for i in range(len(vals))}
    C.release_persists()


# ---- prefix-filter containment: exact recall on ARBITRARY corpora ----
# The fixture is adversarial for pruning but benign for recall; this
# property test drives q_dedup_containment_prefix over random corpora
# (including forced subset/quotation pairs) and asserts pair-for-pair
# equality with a pure-Python brute force — the exact-recall theorem
# (≥1 of the short side's ⌊sz/10⌋+1 rarest tokens must be shared when
# C > 0.9) checked on data the fixture can never produce.

_tok = st.sampled_from([f"w{i}" for i in range(12)])
_doc = st.lists(_tok, min_size=1, max_size=10)
_corpus = st.lists(_doc, min_size=2, max_size=14)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_corpus, subset_seed=st.integers(min_value=0, max_value=10**6))
def test_containment_prefix_exact_recall_on_random_corpora(
    spark, scratch, docs, subset_seed
):
    from gpe.dedup import q_dedup_containment_prefix

    # force at least one true containment pair: append a random doc's
    # token-subset as an extra doc
    base = docs[subset_seed % len(docs)]
    toks = sorted(set(base))
    extra = toks[: max(1, len(toks) - 1)]
    texts = [" ".join(d) for d in docs] + [" ".join(extra)]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "prop",
            "n_chars": [len(t) for t in texts],
        }
    )
    key = abs(hash((tuple(texts), subset_seed))) % 10**9
    d = scratch / f"containment_{key}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "documents.parquet"))

    got = {
        (r.id_a, r.id_b, r.inter, r.min_size)
        for r in q_dedup_containment_prefix(spark, str(d)).collect()
    }
    sets = [set(t.split(" ")) for t in texts]
    want = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            mn = min(len(sets[i]), len(sets[j]))
            if 10 * inter > 9 * mn:
                want.add((i, j, inter, mn))
    assert got == want


# ---- asof-nearest: exact tie semantics on ARBITRARY event sets ----
# Timestamps draw from a tiny integer range so equal-ts and equal-gap
# collisions are COMMON — the documented resolution (backward carry keeps
# the highest at-or-before event_id, forward the lowest at-or-after,
# equal µs gaps go backward) is hammered far beyond what the fixture's
# microsecond-unique timestamps can exercise.

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # user_id
        st.integers(min_value=0, max_value=12),  # second offset (tiny!)
        st.booleans(),                           # is_purchase
    ),
    min_size=2,
    max_size=24,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events)
def test_asof_nearest_tie_semantics_on_random_events(spark, scratch, events):
    from gpe.relational import q_join_asof_nearest

    pdf = pd.DataFrame(
        {
            "event_id": range(len(events)),
            "ts": pd.to_datetime(
                [1_700_000_000 + sec for _, sec, _ in events], unit="s"
            ).astype("datetime64[us]"),
            "user_id": [u for u, _, _ in events],
            "event_type": [
                "purchase" if p else "view" for _, _, p in events
            ],
            "value": 1.0,
            "props": '{"k": 1}',
        }
    )
    key = abs(hash(tuple(events))) % 10**9
    d = scratch / f"asof_{key}"
    d.mkdir(exist_ok=True)
    pdf.to_parquet(str(d / "events.parquet"))

    got = {
        r.event_id: (r.nearest_purchase_id, r.direction, r.gap_seconds)
        for r in q_join_asof_nearest(spark, str(d)).collect()
    }
    purch = pdf[pdf.event_type == "purchase"]
    n_expected = 0
    for e in pdf[pdf.event_type != "purchase"].itertuples():
        p = purch[purch.user_id == e.user_id]
        if not len(p):
            continue
        n_expected += 1
        back = p[p.ts <= e.ts].sort_values(["ts", "event_id"])
        fwd = p[p.ts >= e.ts].sort_values(["ts", "event_id"])
        b = back.iloc[-1] if len(back) else None
        f = fwd.iloc[0] if len(fwd) else None
        if b is None:
            want = (f.event_id, "forward", int((f.ts - e.ts).total_seconds()))
        elif f is None:
            want = (b.event_id, "backward", int((e.ts - b.ts).total_seconds()))
        else:
            gb, gf = e.ts - b.ts, f.ts - e.ts
            if gf < gb:
                want = (f.event_id, "forward", int(gf.total_seconds()))
            else:
                want = (b.event_id, "backward", int(gb.total_seconds()))
        assert got[e.event_id] == want, (e.event_id, got[e.event_id], want)
    assert len(got) == n_expected


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # user_id
            st.integers(min_value=0, max_value=2_000),      # seconds offset
        ),
        min_size=2,
        max_size=60,
    )
)
def test_theta_bucket_decomposition_exact_recall(spark, scratch, events):
    """q_join_theta_bucketed's {b, b+1} expansion must reproduce the
    naive theta join on ARBITRARY timestamps — including pairs exactly
    at the 300 s band edge, zero gaps, and duplicate timestamps (the
    fixture's microsecond-unique clock never exercises those)."""
    import pandas as pd

    import __spark_entry__ as spec

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "event_id": range(len(events)),
            "ts": pd.to_datetime(
                [base + pd.Timedelta(seconds=s) for _, s in events]
            ).astype("datetime64[us]"),
            "user_id": [u for u, _ in events],
            "event_type": "view",
            "value": 1.0,
            "props": '{"k": 1}',
        }
    )
    d = scratch / f"theta{abs(hash(tuple(events))) % 10**9}"
    d.mkdir()
    pdf.to_parquet(str(d / "events.parquet"))
    qs = spec.queries()
    naive = sorted(
        map(tuple, qs["q_join_theta_range"](spark, str(d)).collect())
    )
    bucketed = sorted(
        map(tuple, qs["q_join_theta_bucketed"](spark, str(d)).collect())
    )
    assert naive == bucketed
