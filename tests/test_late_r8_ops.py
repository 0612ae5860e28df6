"""Late-round-8 crafted-data tests: the 7 keys added after the mid-round
bench (triangles, heavy hitters, Kaplan-Meier, Gram moments, decile lift,
Benford, calendar profile) pinned on crafted parquet against the REAL
DuckDB oracles — exercising the branches the fixture cannot reach
(Misra-Gries eviction, a fully-consumed risk set, sub-one order totals,
fewer customers than deciles, the FLOOR(x·s+0.5) boundary)."""

from __future__ import annotations

import duckdb
import pandas as pd

import __spark_entry__ as spec

_Q = spec.queries()
_O = spec.oracle_sql()


def _oracle(d, key, table):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{d}/{table}.parquet')"
    )
    out = con.execute(_O[key]).fetch_df()
    con.close()
    return out


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _pdf_rows(pdf):
    return sorted(
        tuple(None if pd.isna(v) else v for v in t)
        for t in pdf.itertuples(index=False, name=None)
    )


def _docs(d, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))


def _orders(d, rows):
    """rows = [(o_orderkey, o_custkey, o_totalprice, o_orderdate)]"""
    pdf = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"]).astype(
        "datetime64[us]"
    )
    pdf["o_orderstatus"] = "O"
    pdf["o_orderpriority"] = "1-URGENT"
    d.mkdir()
    pdf[
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ]
    ].to_parquet(str(d / "orders.parquet"))


def test_heavy_hitters_mg_eviction_preserves_recall(spark, tmp_path):
    """The fixture's 916 distinct bigrams never overflow the 1023-entry
    Misra-Gries capacity, so eviction never fires there. Here ~2,500
    unique bigrams force repeated evictions around one planted heavy
    bigram — the sketch must still surface it (recall guarantee) and the
    exact recount must match the oracle to the row."""
    texts = ["hh " * 300 + "hh"]  # 300 occurrences of bigram "hh hh"
    # 25 docs × ~100 unique tokens → ~2,475 once-only bigrams
    for i in range(25):
        texts.append(" ".join(f"t{i}_{j}" for j in range(100)))
    d = tmp_path / "hh"
    _docs(d, texts)
    got = _Q["q_text_heavy_hitters"](spark, str(d))
    rows = _rows(got)
    assert _pdf_rows(_oracle(d, "q_text_heavy_hitters", "documents")) == rows
    assert len(rows) == 1 and rows[0][0] == "hh hh"
    n_total = 300 + 25 * 99
    assert rows[0][1] == 300 and rows[0][2] == 300 * 1_000_000 // n_total


def test_survival_km_fully_consumed_risk_set(spark, tmp_path):
    """No censored subjects: the last event time has n_events == n_risk,
    so its ln((n−d)/n) factor is NULL and survival is exactly 0.0 (the
    guarded branch). Also pins a same-day reorder (duration 0)."""
    day = pd.Timestamp("2024-03-01")
    rows = [
        # cust 1: same-day reorder → duration 0, event
        (1, 1, 100.0, day), (2, 1, 100.0, day),
        # cust 2: reorder after 5 days
        (3, 2, 100.0, day), (4, 2, 100.0, day + pd.Timedelta(days=5)),
        # cust 3: reorder after 9 days — ALSO the global max date, so
        # nobody is censored past it
        (5, 3, 100.0, day), (6, 3, 100.0, day + pd.Timedelta(days=9)),
    ]
    d = tmp_path / "km"
    _orders(d, rows)
    got = _Q["q_ts_survival_km"](spark, str(d))
    rows_got = _rows(got)
    assert _pdf_rows(_oracle(d, "q_ts_survival_km", "orders")) == rows_got
    by_t = {r[0]: r for r in rows_got}
    assert set(by_t) == {0, 5, 9}
    # t=0: 3 at risk, 1 event, surv = 2/3 (ln floored then exp'd)
    assert by_t[0][1] == 3 and by_t[0][2] == 1
    assert abs(by_t[0][5] - 2 / 3) < 1e-5
    # t=9: last subject events → factor NULL, surv exactly 0.0
    assert by_t[9][1] == 1 and by_t[9][2] == 1
    assert by_t[9][3] is None and by_t[9][5] == 0.0


def test_triangles_clique_and_open_chain(spark, tmp_path):
    """A 4-clique of identical docs (every pair Jaccard 1) must give each
    member 3 triangles and coefficient exactly 1e6; an A–B–C similarity
    chain whose ends fall below the 0.9 threshold contributes no
    triangle (clustering 0 at the middle node)."""
    # total crafted vocabulary must stay ≤ the mask path's 31-token
    # fence: 8 clique + 19 base + xa/xb/xc = 30
    clique = " ".join(f"c{i}" for i in range(8))
    base = [f"s{i}" for i in range(19)]
    a = " ".join(base + ["xa"])  # |A∩B| = 19, |A∪B| = 21 → 0.905 > 0.9
    b = " ".join(base + ["xb"])
    c = " ".join(base + ["xc"])  # A∩C also 19 via base — need A–C BELOW
    # make C share 19 with B but only 18 with A:
    c = " ".join(base[1:] + ["xb", "xc"])  # B∩C=19/21 ✓, A∩C=18/22 ✗
    d = tmp_path / "tri"
    _docs(d, [clique, clique, clique, clique, a, b, c])
    got = _Q["q_graph_triangles"](spark, str(d))
    rows = _rows(got)
    assert _pdf_rows(_oracle(d, "q_graph_triangles", "documents")) == rows
    by_id = {r[0]: r for r in rows}
    for doc in (0, 1, 2, 3):  # the clique
        assert by_id[doc][1:] == (3, 3, 1_000_000)
    assert by_id[5][1:] == (2, 0, 0)  # chain middle: deg 2, no triangle
    assert by_id[4][1:] == (1, 0, 0)
    assert by_id[6][1:] == (1, 0, 0)


def test_decile_lift_fewer_customers_than_deciles(spark, tmp_path):
    """4 customers through NTILE(10): the SQL-standard bucket formula
    assigns deciles 1..4 with one customer each — engine (two-pass
    ntile) and oracle must agree bucket for bucket."""
    day = pd.Timestamp("2024-01-01")
    rows = [
        (1, 1, 400.0, day), (2, 2, 300.0, day),
        (3, 3, 200.0, day), (4, 4, 100.0, day),
    ]
    d = tmp_path / "lift"
    _orders(d, rows)
    got = _Q["q_agg_decile_lift"](spark, str(d))
    rows_got = _rows(got)
    assert _pdf_rows(_oracle(d, "q_agg_decile_lift", "orders")) == rows_got
    assert [r[0] for r in rows_got] == [1, 2, 3, 4]
    assert all(r[1] == 1 for r in rows_got)
    # decile 1 = top spender: share 40%, lift = share × n_total = 1.6×
    assert rows_got[0][3] == 400_000 and rows_got[0][5] == 1_600_000
    assert rows_got[3][4] == 1_000_000  # cumulative share closes at 100%


def test_benford_excludes_sub_one_totals_cross_engine(spark, tmp_path):
    """Totals below 1 have no leading integral digit — both engines must
    drop them from the denominator; digits come from the string head."""
    day = pd.Timestamp("2024-01-01")
    rows = [
        (1, 1, 0.5, day),      # excluded
        (2, 1, 1.0, day),      # digit 1
        (3, 1, 19.99, day),    # digit 1
        (4, 1, 987.65, day),   # digit 9
        (5, 1, 30000.0, day),  # digit 3
    ]
    d = tmp_path / "benford"
    _orders(d, rows)
    got = _Q["q_agg_benford"](spark, str(d))
    rows_got = _rows(got)
    assert _pdf_rows(_oracle(d, "q_agg_benford", "orders")) == rows_got
    by_digit = {r[0]: r for r in rows_got}
    assert set(by_digit) == {1, 3, 9}
    assert by_digit[1][1] == 2 and by_digit[1][2] == 500_000
    assert by_digit[1][3] == 301_030  # Benford literal for digit 1


def test_gram_moments_floor_half_scaling_cross_engine(spark, tmp_path):
    """FLOOR(x·s + 0.5) must land on the same integers in both engines
    for representative-sticky doubles (0.06·100 ≈ 6.000000000000001) —
    and the moments must equal an exact integer recompute."""
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A", "A", "B"],
            "l_quantity": [2.0, 3.0, 5.0],
            "l_discount": [0.06, 0.01, 0.10],
            "l_extendedprice": [100.01, 250.50, 999.99],
        }
    )
    d = tmp_path / "gram"
    d.mkdir()
    pdf.to_parquet(str(d / "lineitem.parquet"))
    got = _Q["q_ml_gram_moments"](spark, str(d))
    rows_got = _rows(got)
    assert _pdf_rows(_oracle(d, "q_ml_gram_moments", "lineitem")) == rows_got
    a = {r[0]: r for r in rows_got}["A"]
    # q=(2,3), d2=(6,1), pc=(10001,25050) — exact integer recompute
    assert a[1:] == (
        2, 5, 7, 35051, 13, 15, 37, 2 * 10001 + 3 * 25050,
        6 * 10001 + 1 * 25050,
    )


def test_calendar_profile_iso_weekday_mapping(spark, tmp_path):
    """2024-03-03 is a Sunday (ISO 7), 2024-03-04 a Monday (ISO 1) —
    pins the Spark dayofweek→isodow arithmetic against DuckDB isodow."""
    rows = [
        (0, pd.Timestamp("2024-03-03 09:00"), 1, "view", 1.0),
        (1, pd.Timestamp("2024-03-04 23:00"), 1, "view", 2.0),
        (2, pd.Timestamp("2024-03-04 23:30"), 2, "click", 3.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf["props"] = "{}"
    d = tmp_path / "cal"
    d.mkdir()
    pdf.to_parquet(str(d / "events.parquet"))
    got = _Q["q_ts_calendar_profile"](spark, str(d))
    rows_got = _rows(got)
    assert _pdf_rows(_oracle(d, "q_ts_calendar_profile", "events")) == rows_got
    cells = {(r[0], r[1]): r for r in rows_got}
    assert set(cells) == {(7, 9), (1, 23)}
    assert cells[(1, 23)][2] == 2 and cells[(1, 23)][4] == 666_666
