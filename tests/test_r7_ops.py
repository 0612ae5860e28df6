"""Semantic invariants of the round-7 operators beyond oracle parity
(shared-formula bugs are invisible to the oracle gate, so each new key
gets an INDEPENDENT recompute): ACF vs pandas autocorr, Welch t vs a
numpy reimplementation, skewness/kurtosis vs numpy moments, MAD/IQR vs
numpy quantiles, the PCA power step vs a numpy matvec, max-gap vs a
pandas brute force, cohort LTV vs a pandas pivot, PMI vs a Counter
recompute, vocab coverage monotonicity, graph degree mass conservation,
top-k neighbor ordering, bounce-rate bounds, the audio-window energy vs
a pure-Python recompute, and the write-path round trips vs the source."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

import __spark_entry__ as spec
from gpe.io import load_table

SF = "/root/testdata/sf0.001"
_Q = spec.queries()


def _daily_totals(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    return ev.groupby(["event_type", "day"])["value"].sum()


def test_acf_matches_pandas_autocorr(spark):
    rows = _Q["q_ts_acf"](spark, SF).collect()
    daily = _daily_totals(spark)
    for r in rows:
        series = daily[r.event_type].sort_index().astype(float)
        want = series.autocorr(lag=r.lag)
        assert abs(r.acf - want) < 1e-4, (r.event_type, r.lag, r.acf, want)
        assert r.n_pairs == len(series) - r.lag


def test_ttest_welch_matches_numpy(spark):
    ev = load_table(spark, SF, "events").toPandas()
    base = ev[ev.event_type == "view"]["value"].to_numpy()
    for r in _Q["q_agg_ttest_welch"](spark, SF).collect():
        x = ev[ev.event_type == r.event_type]["value"].to_numpy()
        se2 = x.var(ddof=1) / len(x) + base.var(ddof=1) / len(base)
        t = (x.mean() - base.mean()) / math.sqrt(se2)
        df = se2 * se2 / (
            (x.var(ddof=1) / len(x)) ** 2 / (len(x) - 1)
            + (base.var(ddof=1) / len(base)) ** 2 / (len(base) - 1)
        )
        assert r.n == len(x)
        assert abs(r.t_stat - t) < 1e-4
        assert abs(r.welch_df - df) < 0.05


def test_skew_kurtosis_matches_numpy_moments(spark):
    li = load_table(spark, SF, "lineitem").toPandas()
    for r in _Q["q_agg_skew_kurtosis"](spark, SF).collect():
        x = li[li.l_returnflag == r.l_returnflag]["l_quantity"].to_numpy()
        m2, m3, m4 = [((x - x.mean()) ** k).mean() for k in (2, 3, 4)]
        assert r.n_rows == len(x)
        assert abs(r.skewness - m3 / m2**1.5) < 1e-4
        assert abs(r.excess_kurtosis - (m4 / m2**2 - 3)) < 1e-4


def test_mad_and_iqr_match_numpy_quantiles(spark):
    o = load_table(spark, SF, "orders").toPandas()
    mad = {r.o_orderstatus: r for r in _Q["q_agg_mad"](spark, SF).collect()}
    iqr = {
        r.o_orderstatus: r for r in _Q["q_agg_iqr_fences"](spark, SF).collect()
    }
    for status, g in o.groupby("o_orderstatus"):
        x = g["o_totalprice"].to_numpy()
        med = np.quantile(x, 0.5)
        assert abs(mad[status].median_price - med) < 0.02
        assert abs(mad[status].mad - np.quantile(np.abs(x - med), 0.5)) < 0.02
        q1, q3 = np.quantile(x, 0.25), np.quantile(x, 0.75)
        assert abs(iqr[status].q1 - q1) < 0.02
        assert abs(iqr[status].iqr - (q3 - q1)) < 0.03
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert iqr[status].n_low_outliers == int((x < lo).sum())
        assert iqr[status].n_high_outliers == int((x > hi).sum())


def test_pca_power_step_matches_numpy_matvec(spark):
    emb = load_table(spark, SF, "embeddings").toPandas()
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    v0 = np.full(X.shape[1], 0.125)
    y = (X.T @ (X @ v0)) / len(X)
    got = sorted(
        _Q["q_vec_pca_power"](spark, SF).collect(), key=lambda r: r.pos
    )
    assert len(got) == X.shape[1]
    m = np.array([r.m_e8 for r in got], dtype=np.float64) / 1e8
    assert np.abs(m - y).max() < 1e-4
    v1 = np.array([r.v1 for r in got])
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-6
    # the step must strictly improve the Rayleigh quotient over the seed
    # (the power-iteration invariant; full convergence takes many steps —
    # these near-isotropic embeddings have a tiny eigengap, so a
    # top-eigenvector alignment check would be wrong after ONE step)
    C = X.T @ X
    r0 = float(v0 @ C @ v0) / float(v0 @ v0)
    r1 = float(v1 @ C @ v1) / float(v1 @ v1)
    assert r1 >= r0 - 1e-9


def test_max_gap_matches_pandas_bruteforce(spark):
    ev = load_table(spark, SF, "events").toPandas()
    got = {r.user_id: r for r in _Q["q_ts_max_gap"](spark, SF).collect()}
    n_expected = 0
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        if len(g) < 2:
            assert uid not in got
            continue
        n_expected += 1
        ts = g["ts"].to_numpy()
        gaps = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(np.int64)
        best = gaps.max()
        r = got[uid]
        assert r.n_events == len(g)
        assert r.max_gap_seconds == best // 1_000_000
        # the reported endpoints must realize the max gap
        span = (r.gap_end - r.gap_start).total_seconds()
        assert int(span) == r.max_gap_seconds or abs(
            span - best / 1e6
        ) < 1.0
    assert len(got) == n_expected


def test_cohort_ltv_matches_pandas(spark):
    ev = load_table(spark, SF, "events").toPandas()
    signup = (
        ev[ev.event_type == "signup"]
        .groupby("user_id")["ts"]
        .min()
        .dt.floor("D")
    )
    p = ev[ev.event_type == "purchase"].copy()
    p["cohort"] = p["user_id"].map(signup)
    p = p.dropna(subset=["cohort"])
    p["age"] = (p["ts"].dt.floor("D") - p["cohort"]).dt.days
    p = p[p["age"] >= 0]
    want = p.groupby(["cohort", "age"])["value"].agg(["count", "sum"])
    got = _Q["q_ts_cohort_ltv"](spark, SF).collect()
    assert len(got) == len(want)
    for r in sorted(got, key=lambda r: (r.cohort_day, r.age_days)):
        w = want.loc[(r.cohort_day, r.age_days)]
        assert r.n_purchases == w["count"]
        assert abs(r.revenue - round(w["sum"], 2)) < 0.02
    # cumulative is monotone per cohort
    by_cohort: dict = {}
    for r in sorted(got, key=lambda r: (r.cohort_day, r.age_days)):
        prev = by_cohort.get(r.cohort_day, 0.0)
        assert r.cum_revenue >= prev - 1e-9
        by_cohort[r.cohort_day] = r.cum_revenue


def test_pmi_matches_counter_recompute(spark):
    d = load_table(spark, SF, "documents").toPandas()
    sets = [set(t.split(" ")) for t in d["text"]]
    dfc: Counter = Counter()
    both: Counter = Counter()
    for s in sets:
        toks = sorted(s)
        dfc.update(toks)
        for i, a in enumerate(toks):
            for b in toks[i + 1 :]:
                both[(a, b)] += 1
    n = len(sets)
    rows = _Q["q_text_cooccurrence_pmi"](spark, SF).collect()
    want_pairs = {k for k, v in both.items() if v >= 20}
    assert {(r.token_a, r.token_b) for r in rows} == want_pairs
    for r in rows:
        c = both[(r.token_a, r.token_b)]
        pmi = math.log(c * n / (dfc[r.token_a] * dfc[r.token_b]))
        assert r.n_docs_both == c
        assert abs(r.pmi - pmi) < 2e-6


def test_vocab_coverage_is_a_coverage_curve(spark):
    rows = sorted(
        _Q["q_text_vocab_coverage"](spark, SF).collect(),
        key=lambda r: r.rank,
    )
    total = sum(r.freq for r in rows)
    cum = 0
    for i, r in enumerate(rows, start=1):
        cum += r.freq
        assert r.rank == i
        assert r.cum_freq == cum
        assert abs(r.cum_share - math.floor(cum * 1e6 / total) / 1e6) < 1e-12
    # ranked by freq desc
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert abs(rows[-1].cum_share - 1.0) < 1e-6


def test_graph_degree_conserves_masses(spark):
    rows = _Q["q_dedup_graph_degree"](spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    n_pairs = _Q["q_dedup_near_pairs"](spark, SF).count()
    assert sum(r.n_docs for r in rows) == n_docs
    # handshake lemma: sum of degrees = 2 * |edges|
    assert sum(r.degree * r.n_docs for r in rows) == 2 * n_pairs


def test_jaccard_topk_is_ordered_and_bounded(spark):
    rows = _Q["q_text_jaccard_topk"](spark, SF).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        for a, b in zip(rs, rs[1:]):
            assert (a.jaccard, -a.neighbor_id) >= (b.jaccard, -b.neighbor_id)
        assert all(r.jaccard > 0.9 for r in rs)


def test_bounce_rate_bounds_and_mass(spark):
    rows = _Q["q_ts_bounce_rate"](spark, SF).collect()
    sess = _Q["q_ts_sessionize"](spark, SF).collect()
    assert sum(r.n_sessions for r in rows) == len(sess)
    assert sum(r.n_bounces for r in rows) == sum(
        1 for s in sess if s.n_events == 1
    )
    for r in rows:
        assert 0 <= r.n_bounces <= r.n_sessions
        assert abs(
            r.bounce_rate
            - math.floor(r.n_bounces * 1e6 / r.n_sessions) / 1e6
        ) < 1e-12


def test_audio_windows_match_python_recompute(spark):
    d = load_table(spark, SF, "documents").toPandas()
    got: dict = {}
    for r in _Q["q_multimodal_audio_windows"](spark, SF).collect():
        got[(r.media_id, r.window_idx)] = (r.energy, r.peak)
    n_expected = 0
    for doc_id, text in zip(d["doc_id"], d["text"]):
        b = text.encode()
        if len(b) < 32:
            continue
        for w in range((len(b) - 32) // 16 + 1):
            seg = [x - 128 for x in b[w * 16 : w * 16 + 32]]
            n_expected += 1
            assert got[(doc_id, w)] == (
                sum(v * v for v in seg),
                max(abs(v) for v in seg),
            )
    assert len(got) == n_expected


def test_write_path_roundtrips_match_source(spark):
    """partition-profile / bucketed-join / json-roundtrip totals must
    equal direct source aggregations (the oracle proves this vs DuckDB;
    here vs the SAME engine's direct path, closing the loop)."""
    o = load_table(spark, SF, "orders")
    want = {
        r.o_orderpriority: (r.n, r.s)
        for r in o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    got = _Q["q_catalog_partition_profile"](spark, SF).collect()
    assert {r.o_orderpriority for r in got} == set(want)
    for r in got:
        n, s = want[r.o_orderpriority]
        assert r.n_rows == n
        assert abs(r.total_price - round(s, 2)) < 0.02
    part = load_table(spark, SF, "part")
    back = _Q["q_source_json_roundtrip"](spark, SF)
    assert back.agg(F.sum("n_parts")).collect()[0][0] == part.count()


def test_cdc_deletes_subset_of_compact(spark):
    alive = {
        (r.user_id, r.event_type): r
        for r in _Q["q_cdc_compact_deletes"](spark, SF).collect()
    }
    full = {
        (r.user_id, r.event_type): r
        for r in _Q["q_cdc_compact"](spark, SF).collect()
    }
    assert set(alive) <= set(full)
    for k, r in alive.items():
        f = full[k]
        assert (r.ts, r.event_id, r.value) == (f.ts, f.event_id, f.value)
        assert r.value >= 5.0  # tombstoned keys are gone
    dropped = set(full) - set(alive)
    assert dropped and all(full[k].value < 5.0 for k in dropped)


def test_rolling_corr_matches_pandas(spark):
    ev = load_table(spark, SF, "events").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    piv = (
        ev.pivot_table(
            index="day", columns="event_type", values="value", aggfunc="sum"
        )
        .reindex(columns=["click", "view"])
        .fillna(0.0)
        .sort_index()
    )
    roll = piv["click"].rolling(7).corr(piv["view"])
    got = {r.day: r for r in _Q["q_win_rolling_corr"](spark, SF).collect()}
    days = list(piv.index)
    assert set(got) == set(days[6:])
    for day, r in got.items():
        assert r.n_days == 7
        assert abs(r.rolling_corr - roll.loc[day]) < 1e-4


def test_session_attach_consistent_with_sessionize(spark):
    """Attachment must partition events exactly like the session rollup:
    per (user, session) the attached event count equals n_events, and
    in-session positions are 1..n."""
    att = _Q["q_ts_session_attach"](spark, SF).collect()
    sess = {
        (r.user_id, r.session_id): r.n_events
        for r in _Q["q_ts_sessionize"](spark, SF).collect()
    }
    per: dict = {}
    for r in att:
        per.setdefault((r.user_id, r.session_id), []).append(
            r.event_in_session
        )
    assert set(per) == set(sess)
    for k, positions in per.items():
        assert sorted(positions) == list(range(1, sess[k] + 1))


def test_holt_keeps_rows_beyond_weight_horizon(spark, tmp_path):
    """ADVICE r6: the init-table inner join silently DROPPED days beyond
    _HOLT_MAX_DAYS; the fixture spans 30 days so parity never exercised
    the fix. A crafted 50-day series must (a) keep every day and
    (b) still match the iterative recurrence — beyond the horizon the
    init weight has decayed below ~ρ^41 ≈ 6e-7 (ρ = √det(A) ≈ 0.707), so
    the truncation tolerance loosens only slightly."""
    n_days = 50
    ts = pd.to_datetime(
        [pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, hours=1)
         for d in range(n_days)]
    ).astype("datetime64[us]")
    pdf = pd.DataFrame(
        {
            "event_id": range(n_days),
            "ts": ts,
            "user_id": 1,
            "event_type": "view",
            "value": [round(50 + 10 * math.sin(d / 3), 2)
                      for d in range(n_days)],
            "props": '{"k": 1}',
        }
    )
    d = tmp_path / "holt50"
    d.mkdir()
    pdf.to_parquet(str(d / "events.parquet"))
    rows = sorted(
        _Q["q_ts_holt"](spark, str(d)).collect(), key=lambda r: r.day
    )
    assert len(rows) == n_days  # the inner join dropped days 42-50
    s = b = None
    for r in rows:
        if s is None:
            s, b = r.x, 0.0
        else:
            s_new = 0.5 * r.x + 0.5 * (s + b)
            b = 0.3 * (s_new - s) + 0.7 * b
            s = s_new
        assert abs(r.level - s) < 5e-4, (r.day, r.level, s)
        assert abs(r.trend - b) < 5e-4


def test_quantize_int8_zero_vector_guard_cross_engine(spark, tmp_path):
    """ADVICE r6: an all-zero embedding used to make scale = 0 and the
    quantize expression 0/0 — where the engines' NaN semantics diverge.
    The fixture is unit-norm so parity never sees it; craft a corpus WITH
    a zero vector and run the REAL oracle comparison on it."""
    import duckdb

    import __spark_entry__ as spec2

    vecs = [
        [0.0] * 8,                       # the degenerate vector
        [0.5, -0.25, 0.0, 0.125, 0.0, 0.0, 0.0, 0.0],
        [0.1] * 8,
    ]
    pdf = pd.DataFrame(
        {
            "vec_id": range(3),
            "embedding": [np.array(v, dtype=np.float32) for v in vecs],
            "label": [0, 1, 1],
        }
    )
    d = tmp_path / "zerovec"
    d.mkdir()
    pdf.to_parquet(str(d / "embeddings.parquet"))

    got = sorted(
        (
            (r.label, r.n_vecs, r.avg_scale, r.avg_mse)
            for r in _Q["q_vec_quantize_int8"](spark, str(d)).collect()
        )
    )
    # no NaN anywhere, zero vector quantizes losslessly
    assert all(not math.isnan(s) and not math.isnan(m) for *_, s, m in got)
    by_label = {g[0]: g for g in got}
    # zero vector: mse is 0 up to the epsilon-nudge every rounded float
    # output carries (round(x + 1e-9, 12) — see gpe/common.py)
    assert by_label[0][3] < 1e-8
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(
        spec2.oracle_sql()["q_vec_quantize_int8"]
    ).fetchall())
    assert got == want


def test_max_gap_equal_gaps_resolve_to_latest_start(spark, tmp_path):
    """Two identical maximal gaps for one user: the documented winner is
    the LATEST start (max-of-struct on (gap, start_µs, end event_id)).
    The fixture's microsecond-unique gaps never tie, so craft the tie."""
    base = pd.Timestamp("2024-01-01")
    ts = [base, base + pd.Timedelta(hours=2),          # gap A: 2h
          base + pd.Timedelta(hours=3),
          base + pd.Timedelta(hours=5)]                # gap B: 2h (later)
    pdf = pd.DataFrame(
        {
            "event_id": range(4),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": 7,
            "event_type": "view",
            "value": 1.0,
            "props": '{"k": 1}',
        }
    )
    d = tmp_path / "maxgap_tie"
    d.mkdir()
    pdf.to_parquet(str(d / "events.parquet"))
    rows = _Q["q_ts_max_gap"](spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.max_gap_seconds == 7200
    assert r.gap_start == ts[2]  # the LATER of the two equal gaps
    assert r.gap_end == ts[3]
    assert r.n_events == 4
