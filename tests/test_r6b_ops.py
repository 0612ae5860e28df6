"""Semantic invariants of the round-6 second-batch operators beyond
oracle parity: EWMA closed form ≡ the recurrence, moving median ≡ pandas
rolling median, transition probabilities normalize and conserve pair
counts, weighted-median crossing semantics vs a single-node recompute,
PII mask irreversibility/shape, int8 quantization error bounds vs numpy,
and entropy bounds."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

import __spark_entry__ as spec
from gpe.io import load_table

SF = "/root/testdata/sf0.001"
_Q = spec.queries()


def test_ewma_closed_form_matches_iterative_recurrence(spark):
    """The prefix-scan closed form must reproduce the textbook recurrence
    s_d = α·x_d + (1−α)·s_{d−1} (s_0 = x_0) to rounding precision."""
    rows = _Q["q_ts_ewma"](spark, SF).collect()
    by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    for series in by_type.values():
        s = None
        for r in series:
            s = r.daily_avg if s is None else 0.3 * r.daily_avg + 0.7 * s
            assert abs(r.ewma - s) < 2e-6, (r.event_type, r.day, r.ewma, s)


def test_moving_median_matches_pandas_rolling(spark):
    pdf = (
        _Q["q_win_moving_median"](spark, SF)
        .toPandas()
        .sort_values(["o_orderpriority", "day"])
    )
    for _, g in pdf.groupby("o_orderpriority"):
        expect = g["day_rev"].rolling(7, min_periods=1).median()
        assert np.allclose(g["moving_median"], expect, atol=1e-4)
        assert (g["n_window"] == np.minimum(np.arange(len(g)) + 1, 7)).all()


def test_transitions_normalize_and_conserve_pairs(spark):
    out = _Q["q_ts_transitions"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in out) == n_events - n_users
    by_from: dict = {}
    for r in out:
        by_from.setdefault(r.from_type, 0.0)
        by_from[r.from_type] += r.p_transition
    for f, p in by_from.items():
        assert abs(p - 1.0) < 1e-5, (f, p)


def test_weighted_median_matches_single_node_recompute(spark):
    out = {
        r.l_returnflag: r for r in _Q["q_agg_weighted_median"](spark, SF).collect()
    }
    li = (
        load_table(spark, SF, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values("l_extendedprice")
        cum = g["l_quantity"].cumsum()
        tot = g["l_quantity"].sum()
        expect = g["l_extendedprice"][2 * cum >= tot].iloc[0]
        assert out[flag].weighted_median_price == expect
        assert abs(out[flag].total_qty - round(tot, 2)) < 1e-6


def test_pii_mask_shape_and_determinism(spark):
    rows = _Q["q_pii_mask"](spark, SF).collect()
    names = {
        r.c_custkey: r.c_name
        for r in load_table(spark, SF, "customer")
        .select("c_custkey", "c_name")
        .collect()
    }
    assert len(rows) == len(names)
    for r in rows[:25]:
        name = names[r.c_custkey]
        assert r.name_sha256 == hashlib.sha256(name.encode()).hexdigest()
        assert r.pseudonym == r.name_sha256[:12]
        assert r.name_masked == "*" * (len(name) - 3) + name[-3:]
        assert name not in r.name_masked  # nothing leaks
        assert r.bal_band % 1000 == 0


def test_quantize_int8_matches_numpy(spark):
    out = {r.label: r for r in _Q["q_vec_quantize_int8"](spark, SF).collect()}
    emb = load_table(spark, SF, "embeddings").toPandas()
    assert sum(r.n_vecs for r in out.values()) == len(emb)
    for label, g in emb.groupby("label"):
        scales, mses = [], []
        for v in g["embedding"]:
            x = np.asarray(v, dtype=np.float64)
            s = np.abs(x).max() / 127.0
            q = np.floor(x / s + 0.5)
            mses.append(((x - q * s) ** 2).mean())
            scales.append(s)
        # the builder epsilon-nudges (+1e-9) before each rounding by
        # design, so allow a few EPS of headroom
        assert abs(float(out[label].avg_scale) - np.mean(scales)) < 5e-9
        assert abs(float(out[label].avg_mse) - np.mean(mses)) < 5e-9
        # quantization error bound: |err| <= scale/2 per component
        assert out[label].avg_mse <= (max(scales) / 2) ** 2


def test_token_entropy_bounds_and_spot_check(spark):
    rows = _Q["q_text_token_entropy"](spark, SF).collect()
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        assert 0.0 <= r.entropy_nats <= math.log(r.n_distinct) + 1e-6
        assert r.is_low_entropy == (r.entropy_nats < 2.0 - 1e-12)
    # exact recompute for a sample (mirrors the e6 fixed-point contract)
    for r in rows[:10]:
        toks = docs[r.doc_id].split(" ")
        n = len(toks)
        cnt = pd.Series(toks).value_counts()
        h_e6 = sum(
            math.floor((c / n) * math.log(n / c) * 1_000_000 + 1e-9)
            for c in cnt
        )
        assert r.n_tokens == n and r.n_distinct == len(cnt)
        assert r.entropy_nats == h_e6 / 1_000_000.0


def test_rollup_multigrain_grains_telescope(spark):
    """Each grain partitions the same events: hour/day/month/total event
    counts and (rounded) sums must all agree; hour buckets roll up to
    their containing day."""
    pdf = _Q["q_ts_rollup_multigrain"](spark, SF).toPandas()
    by = {g: d for g, d in pdf.groupby("grain")}
    n = by["total"]["n_events"].iloc[0]
    assert len(by["total"]) == 1 and by["total"]["bucket"].isna().all()
    for g in ("hour", "day", "month"):
        assert by[g]["n_events"].sum() == n
    hours = by["hour"].copy()
    hours["day"] = hours["bucket"].dt.floor("D")
    per_day = hours.groupby("day")["n_events"].sum()
    want = by["day"].set_index("bucket")["n_events"]
    assert per_day.sort_index().equals(want.sort_index())


def test_mom_growth_matches_pandas_shift(spark):
    pdf = _Q["q_ts_mom_growth"](spark, SF).toPandas().sort_values("month")
    rev = pdf["revenue"]
    mom = (rev - rev.shift(1)) / rev.shift(1) * 100
    yoy = (rev - rev.shift(12)) / rev.shift(12) * 100
    assert pdf["mom_pct"].isna().sum() == 1
    assert pdf["yoy_pct"].isna().sum() == 12
    assert np.allclose(pdf["mom_pct"].dropna(), mom.dropna(), atol=1e-3)
    assert np.allclose(pdf["yoy_pct"].dropna(), yoy.dropna(), atol=1e-3)


def test_kmeans_step_matches_numpy_lloyd(spark):
    """The confusion matrix must equal a numpy recompute of one Lloyd
    step with the same e8-floored seeds (argmin L2, ties to the smaller
    label), and its row sums conserve vectors per original label."""
    out = _Q["q_vec_kmeans_step"](spark, SF).collect()
    emb = load_table(spark, SF, "embeddings").toPandas()
    X = np.stack(emb["embedding"].map(lambda v: np.asarray(v, np.float64)))
    labels = emb["label"].to_numpy()
    ks = np.unique(labels)
    cents = np.stack(
        [
            np.floor(X[labels == k].sum(0) * 1e8 / (labels == k).sum()) / 1e8
            for k in ks
        ]
    )
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    new = ks[d2.argmin(1)]  # argmin breaks ties toward the smaller label
    want: dict = {}
    for o, nl in zip(labels, new):
        want[(int(o), int(nl))] = want.get((int(o), int(nl)), 0) + 1
    got = {(r.old_label, r.new_label): r.n_vecs for r in out}
    assert got == want
    assert sum(got.values()) == len(emb)


def test_scd2_pointintime_matches_pandas_asof(spark):
    """Each joined fact must carry the LATEST purchase version at or
    before its timestamp; facts before the user's first purchase drop."""
    out = _Q["q_join_scd2_pointintime"](spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    purch = ev[ev.event_type == "purchase"].sort_values(["ts", "event_id"])
    facts = ev[ev.event_type != "purchase"]
    want = {}
    for r in facts.itertuples():
        p = purch[(purch.user_id == r.user_id) & (purch.ts <= r.ts)]
        if len(p):
            want[r.event_id] = int(p.iloc[-1].event_id)
    got = dict(zip(out.event_id, out.version_event_id))
    assert got == want


def test_cusum_matches_clamped_recurrence(spark):
    """The prefix form cum − min(0, runmin) must equal the textbook
    clamped recurrence S_d = max(0, S_{d−1} + (x_d − k)), and the burst
    flag must compare S > k."""
    pdf = (
        _Q["q_ts_cusum"](spark, SF)
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    for _, g in pdf.groupby("event_type"):
        s = 0.0
        for r in g.itertuples():
            s = max(0.0, s + (r.day_sum - r.drift_k))
            assert abs(r.cusum - s) < 1e-6
            assert r.is_burst == (r.cusum > r.drift_k)


def test_forecast_snaive_matches_pandas(spark):
    out = {r.event_type: r for r in _Q["q_ts_forecast_snaive"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    daily = ev.groupby(["event_type", "day"])["value"].sum().reset_index()
    for ty, g in daily.groupby("event_type"):
        g = g.sort_values("day")
        f = g["value"].shift(7)
        sc = g[f.notna()].assign(f=f.dropna().values)
        err = (sc["value"] - sc["f"]).abs()
        assert out[ty].n_days_scored == len(sc)
        assert abs(out[ty].mae - err.mean()) < 0.02
        assert abs(out[ty].mape - (err / sc["value"]).mean()) < 1e-4


def test_hhi_bounds_and_recompute(spark):
    rows = _Q["q_agg_hhi"](spark, SF).collect()
    o = load_table(spark, SF, "orders").toPandas()
    c = load_table(spark, SF, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    sp = j.groupby(["c_mktsegment", "c_nationkey"])["o_totalprice"].sum()
    for r in rows:
        g = sp[r.c_mktsegment]
        assert r.n_nations == len(g)
        # 1/n <= HHI <= 1 always
        assert 1.0 / len(g) - 1e-6 <= r.hhi <= 1.0 + 1e-6
        shares = g / g.sum()
        assert abs(r.hhi - (shares**2).sum()) < 1e-6
        assert abs(r.total_spend - round(g.sum(), 2)) < 0.5


def test_concurrency_sweep_invariants_and_pandas_peak(spark):
    """The sweep conserves sessions (Σ n_changes = 2·#sessions), ends at
    zero concurrency, and the per-hour peak matches a pandas recompute
    of the same half-open sweep."""
    out = _Q["q_ts_concurrency"](spark, SF).toPandas()
    sess = _Q["q_ts_sessionize"](spark, SF).toPandas()
    assert out["n_changes"].sum() == 2 * len(sess)
    pts = pd.concat(
        [
            pd.DataFrame(
                {"t": sess.session_start, "delta": 1, "u": sess.user_id}
            ),
            pd.DataFrame(
                {"t": sess.session_end, "delta": -1, "u": sess.user_id}
            ),
        ]
    ).sort_values(["t", "delta", "u"])
    pts["conc"] = pts["delta"].cumsum()
    assert pts["conc"].iloc[-1] == 0
    pts["hour"] = pts["t"].dt.floor("h")
    want = pts.groupby("hour")["conc"].max()
    got = out.set_index("hour")["max_concurrent"].sort_index()
    assert (got == want.sort_index()).all()


def test_drawdown_matches_pandas_peak_gap(spark):
    out = {r.year: r for r in _Q["q_win_drawdown"](spark, SF).collect()}
    o = load_table(spark, SF, "orders").toPandas()
    o["month"] = o["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    m = o.groupby("month")["o_totalprice"].sum().sort_index()
    dd = m.cummax() - m
    years = dd.groupby(dd.index.year).max()
    months = m.groupby(m.index.year).size()
    for y, r in out.items():
        assert r.n_months == months[y]
        assert abs(r.max_drawdown - round(dd.groupby(dd.index.year).max()[y], 2)) < 0.02
        assert r.max_drawdown >= 0.0


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    pdf = _Q["q_text_ngram_novelty"](spark, SF).toPandas()
    first = pdf[pdf.doc_id == pdf.doc_id.min()].iloc[0]
    # the earliest doc's grams have no earlier occurrences by definition
    assert first.n_novel == first.n_grams and first.novelty_ratio == 1.0
    assert ((pdf.novelty_ratio >= 0) & (pdf.novelty_ratio <= 1)).all()
    assert (pdf.n_novel <= pdf.n_grams).all()
    # global conservation: every distinct gram is novel in exactly one doc
    from gpe.io import load_table as _lt

    docs = _lt(spark, SF, "documents").toPandas()
    grams = set()
    for t in docs.text:
        toks = t.split(" ")
        grams.update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    assert pdf.n_novel.sum() == len(grams)


def test_seasonality_shares_sum_to_one(spark):
    pdf = _Q["q_ts_seasonality"](spark, SF).toPandas()
    assert set(pdf.dow.unique()) <= set(range(7))
    for ty, g in pdf.groupby("event_type"):
        # floor-quantized shares sum to 1 within 7 quanta
        assert abs(g.dow_share.sum() - 1.0) < 7e-6
        assert g.n_days.sum() == 30  # January 2024, every day present


def test_vec_outliers_matches_numpy(spark):
    out = {r.label: r for r in _Q["q_vec_outliers"](spark, SF).collect()}
    emb = load_table(spark, SF, "embeddings").toPandas()
    X = np.stack(emb["embedding"].map(lambda v: np.asarray(v, np.float64)))
    labels = emb["label"].to_numpy()
    for k in np.unique(labels):
        Xi = X[labels == k]
        c = np.floor(Xi.sum(0) * 1e8 / len(Xi)) / 1e8
        d2e6 = np.floor(((Xi - c) ** 2).sum(1) * 1e6 + 1e-9)
        mean, sd = d2e6.mean(), d2e6.std(ddof=1)
        want = int((d2e6 > mean + 2 * sd).sum())
        r = out[int(k)]
        assert r.n_vecs == len(Xi)
        assert r.n_outliers == want
        assert abs(r.max_d2 - d2e6.max() / 1e6) < 1e-9


def test_gini_bounds_and_recompute(spark):
    rows = _Q["q_agg_gini"](spark, SF).collect()
    o = load_table(spark, SF, "orders").toPandas()
    c = load_table(spark, SF, "customer").toPandas()
    sp = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .groupby(["c_mktsegment", "c_custkey"])["o_totalprice"]
        .sum()
    )
    for r in rows:
        g = sp[r.c_mktsegment].sort_values().to_numpy()
        n = len(g)
        i = np.arange(1, n + 1)
        want = ((2 * i - n - 1) * g).sum() / (n * g.sum())
        assert r.n_customers == n
        assert 0.0 <= r.gini < 1.0
        assert abs(r.gini - want) < 1e-5


def test_asof_nearest_matches_pandas_bidirectional(spark):
    """Every matched event's purchase must be the EXACT documented
    winner (ADVICE r6 — no set-membership escape hatch): backward
    candidate = max-ts purchase at-or-before, ties to HIGHEST event_id
    (the carry order's last()); forward candidate = min-ts purchase
    at-or-after, ties to LOWEST event_id; forward wins only on a
    strictly smaller µs gap — equal gaps go backward."""
    out = _Q["q_join_asof_nearest"](spark, SF).collect()
    ev = load_table(spark, SF, "events").toPandas()
    purch = ev[ev.event_type == "purchase"]
    by_user = {u: g for u, g in purch.groupby("user_id")}
    n_expected = 0
    got = {r.event_id: r for r in out}
    for e in ev[ev.event_type != "purchase"].itertuples():
        p = by_user.get(e.user_id)
        if p is None or not len(p):
            continue
        n_expected += 1
        back = p[p.ts <= e.ts]
        fwd = p[p.ts >= e.ts]
        b_row = (
            back.sort_values(["ts", "event_id"]).iloc[-1]
            if len(back)
            else None
        )
        f_row = (
            fwd.sort_values(["ts", "event_id"]).iloc[0]
            if len(fwd)
            else None
        )
        if b_row is None:
            want_id, want_dir, want_gap = f_row.event_id, "forward", f_row.ts - e.ts
        elif f_row is None:
            want_id, want_dir, want_gap = b_row.event_id, "backward", e.ts - b_row.ts
        else:
            gb, gf = e.ts - b_row.ts, f_row.ts - e.ts
            if gf < gb:
                want_id, want_dir, want_gap = f_row.event_id, "forward", gf
            else:
                want_id, want_dir, want_gap = b_row.event_id, "backward", gb
        r = got[e.event_id]
        assert r.nearest_purchase_id == int(want_id), (e.event_id, r)
        assert r.direction == want_dir, (e.event_id, r)
        assert r.gap_seconds == int(want_gap.total_seconds())
    assert len(got) == n_expected


def test_downsample_triangle_picks_max_area_per_bucket(spark):
    """Each bucket's pick must maximize the triangle area against the
    neighbor buckets' mean points (pandas recompute), one interior
    bucket per 10 hours, first/last buckets excluded (no neighbor)."""
    out = {r.bucket: r for r in _Q["q_ts_downsample_triangle"](spark, SF).collect()}
    ev = load_table(spark, SF, "events").toPandas()
    ev["h"] = ev["ts"].dt.floor("h")
    hourly = ev.groupby("h")["value"].sum().sort_index()
    x = ((hourly.index - hourly.index.min()).total_seconds() / 3600).astype(int)
    df = pd.DataFrame({"x": x, "y": hourly.values, "h": hourly.index})
    df["b"] = df["x"] // 10
    bm = df.groupby("b").agg(mx=("x", "mean"), my=("y", "mean"))
    n_interior = 0
    for b, g in df.groupby("b"):
        if b - 1 not in bm.index or b + 1 not in bm.index:
            assert b not in out
            continue
        n_interior += 1
        p, nx = bm.loc[b - 1], bm.loc[b + 1]
        area = ((p.mx - nx.mx) * (g.y - p.my) - (p.mx - g.x) * (nx.my - p.my)).abs()
        best = g[area == area.max()].sort_values("x").iloc[0]
        assert out[b].sel_hour == best.h
        assert abs(out[b].tri_area - area.max()) < 2e-3
    assert len(out) == n_interior


def test_holt_convolution_matches_iterative_recurrence(spark):
    """The matrix-power convolution must reproduce the textbook Holt
    recurrence s_t = αx_t + (1−α)(s+b), b_t = β(s_t−s_prev) + (1−β)b
    (s_0 = x_0, b_0 = 0) to fixed-point precision (≤1e-6 floor error
    per convolution term)."""
    rows = _Q["q_ts_holt"](spark, SF).collect()
    by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        s = b = None
        for r in series:
            if s is None:
                s, b = r.x, 0.0
            else:
                s_new = 0.5 * r.x + 0.5 * (s + b)
                b = 0.3 * (s_new - s) + 0.7 * b
                s = s_new
            assert abs(r.level - s) < 5e-5, (r.event_type, r.day, r.level, s)
            assert abs(r.trend - b) < 5e-5
            assert abs(r.forecast_next - (r.level + r.trend)) < 2e-6
