"""Round-8 crafted-data tests (VERDICT r7 #7 + ADVICE r7): the fixture
never produces a zero-variance window, a singleton group, or a missing
baseline, so the degenerate-case guards added this round are pinned
against the REAL DuckDB oracle on crafted parquet — the same pattern as
the r7 zero-vector / SCD2-shadowing tests."""

from __future__ import annotations

import duckdb
import pandas as pd

import __spark_entry__ as spec

_Q = spec.queries()
_O = spec.oracle_sql()


def _events_frame(rows):
    """rows = [(event_id, ts, user_id, event_type, value)] → full-schema
    events DataFrame (µs timestamps, like the driver fixture)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf["props"] = '{"k": 1}'
    return pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]


def _oracle(d, key, table="events"):
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


def test_ttest_welch_degenerate_groups_cross_engine(spark, tmp_path):
    """A singleton group (n=1) makes the sample variance divide by zero —
    both sides now require n ≥ 2 (ADVICE r7). A zero-variance treatment
    group stays well-defined (the baseline variance carries se2)."""
    base = pd.Timestamp("2024-01-01")
    rows = [
        # baseline 'view': n=3, varying
        (0, base, 1, "view", 1.0),
        (1, base + pd.Timedelta(hours=1), 1, "view", 2.0),
        (2, base + pd.Timedelta(hours=2), 1, "view", 4.0),
        # 'click': n=2 but CONSTANT (zero variance) — kept, finite t
        (3, base + pd.Timedelta(hours=3), 2, "click", 2.0),
        (4, base + pd.Timedelta(hours=4), 2, "click", 2.0),
        # 'error': n=1 singleton — must be dropped on BOTH engines
        (5, base + pd.Timedelta(hours=5), 3, "error", 9.0),
        # 'purchase': ordinary group
        (6, base + pd.Timedelta(hours=6), 4, "purchase", 3.0),
        (7, base + pd.Timedelta(hours=7), 4, "purchase", 5.0),
    ]
    d = tmp_path / "welch_degenerate"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))

    got = _Q["q_agg_ttest_welch"](spark, str(d)).collect()
    types = {r.event_type for r in got}
    assert "error" not in types, "singleton group must be filtered"
    assert types == {"click", "purchase"}
    by_type = {r.event_type: r for r in got}
    # zero-variance treatment group: t finite (baseline variance > 0)
    assert by_type["click"].t_stat is not None
    assert _rows(_Q["q_agg_ttest_welch"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_agg_ttest_welch")
    )


def test_ttest_welch_missing_baseline_emits_null_stats(spark, tmp_path):
    """No 'view' baseline: the old inner cross join returned a silently
    EMPTY frame; the LEFT join now keeps every group with NULL t/df —
    visibly undefined — and DuckDB's LEFT JOIN ON TRUE agrees."""
    base = pd.Timestamp("2024-01-01")
    rows = [
        (0, base, 1, "click", 1.0),
        (1, base + pd.Timedelta(hours=1), 1, "click", 2.0),
        (2, base + pd.Timedelta(hours=2), 2, "purchase", 3.0),
        (3, base + pd.Timedelta(hours=3), 2, "purchase", 4.0),
    ]
    d = tmp_path / "welch_nobaseline"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))

    got = _Q["q_agg_ttest_welch"](spark, str(d)).collect()
    assert {r.event_type for r in got} == {"click", "purchase"}
    assert all(r.t_stat is None and r.welch_df is None for r in got)
    assert all(r.mean_value is not None for r in got)
    assert _rows(_Q["q_agg_ttest_welch"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_agg_ttest_welch")
    )


def test_skew_kurtosis_constant_column_cross_engine(spark, tmp_path):
    """A constant group has m2 = 0: the moment ratios are 0/0 (Spark NULL
    vs DuckDB NaN/inf before the guard). Both engines must now emit NULL
    skewness/kurtosis for the constant group and agree on the rest."""
    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 4 + ["N"] * 4,
            "l_quantity": [5.0, 5.0, 5.0, 5.0, 1.0, 2.0, 3.0, 10.0],
        }
    )
    d = tmp_path / "skew_constant"
    d.mkdir()
    pdf.to_parquet(str(d / "lineitem.parquet"))

    got = _Q["q_agg_skew_kurtosis"](spark, str(d)).collect()
    by_flag = {r.l_returnflag: r for r in got}
    assert by_flag["A"].skewness is None
    assert by_flag["A"].excess_kurtosis is None
    assert by_flag["A"].mean_qty == 5.0
    assert by_flag["N"].skewness is not None
    assert _rows(_Q["q_agg_skew_kurtosis"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_agg_skew_kurtosis", table="lineitem")
    )


def test_rolling_corr_zero_variance_window_cross_engine(spark, tmp_path):
    """A 7-day window where one series is constant has zero variance: the
    correlation is undefined and both engines must emit NULL (Spark x/0 →
    NULL vs DuckDB IEEE inf/NaN before the guard). The next window, where
    the series varies, must still produce a real correlation."""
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    # 8 days; click constant 5.0 on days 0-6, jumps on day 7; view varies
    for day in range(8):
        t = base + pd.Timedelta(days=day)
        click = 5.0 if day < 7 else 9.0
        rows.append((eid, t, 1, "click", click))
        eid += 1
        rows.append((eid, t + pd.Timedelta(hours=1), 2, "view", 1.0 + day))
        eid += 1
    d = tmp_path / "rollcorr_const"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))

    got = _Q["q_win_rolling_corr"](spark, str(d)).collect()
    by_day = {r.day: r for r in got}
    day6 = (base + pd.Timedelta(days=6)).to_pydatetime()
    day7 = (base + pd.Timedelta(days=7)).to_pydatetime()
    assert by_day[day6].rolling_corr is None, "constant window → NULL"
    assert by_day[day7].rolling_corr is not None
    assert _rows(_Q["q_win_rolling_corr"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_win_rolling_corr")
    )


def test_acf_constant_series_is_null_cross_engine(spark, tmp_path):
    """A constant daily series: every lag's variance term is 0, so every
    ACF value must be NULL on both engines."""
    base = pd.Timestamp("2024-01-01")
    rows = [
        (i, base + pd.Timedelta(days=i), 1, "click", 4.0) for i in range(10)
    ]
    d = tmp_path / "acf_const"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))

    got = _Q["q_ts_acf"](spark, str(d)).collect()
    assert len(got) == 7  # lags 1..7 over 10 days all have pairs
    assert all(r.acf is None for r in got)
    assert _rows(_Q["q_ts_acf"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_acf")
    )
