"""Round-9 operator tests: semantic invariants on the fixture plus
crafted-data cases the fixture cannot produce (perfectly-separable
classes, identical distributions, disjoint supports) — each degenerate
case asserted against the REAL DuckDB oracle on crafted parquet, the
same pattern as tests/test_r8_ops.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as spec

from tests.conftest import SF_SMOKE

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


def _emb_frame(rows):
    """rows = [(vec_id, [floats], label)] → embeddings-schema frame."""
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["vec_id"] = pdf["vec_id"].astype("int64")
    pdf["embedding"] = pdf["embedding"].apply(
        lambda v: np.asarray(v, dtype="float32")
    )
    pdf["label"] = pdf["label"].astype("int32")
    return pdf


def _events_frame(rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf["props"] = '{"k": 1}'
    return pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]


# ---------------------------------------------------------------- q_ml_auc


def test_auc_fixture_invariants(spark):
    got = _Q["q_ml_auc"](spark, SF_SMOKE).collect()
    n = sum(r.n_pos for r in got) // len(got) + sum(r.n_neg for r in got) // len(
        got
    )
    for r in got:
        assert 0.0 <= r.auc <= 1.0
        assert r.n_pos + r.n_neg == n  # every class ranks ALL vectors
        # u2x is the tie-aware 2U: bounded by 2·n_pos·n_neg
        assert 0 <= r.u2x <= 2 * r.n_pos * r.n_neg


def test_auc_perfectly_separable_class_cross_engine(spark, tmp_path):
    """Class 1 sits on an axis orthogonal to class 0 → the class-1
    prototype score ranks every class-1 vector above every class-0
    vector → AUC exactly 1.0 (and 2U = 2·n_pos·n_neg)."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.0], 0),
        (2, [0.8, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.0, 0.9], 1),
        (5, [0.1, 0.8], 1),
    ]
    d = tmp_path / "auc_sep"
    d.mkdir()
    _emb_frame(rows).to_parquet(str(d / "embeddings.parquet"))
    got = {r.label: r for r in _Q["q_ml_auc"](spark, str(d)).collect()}
    assert got[1].auc == 1.0
    assert got[1].u2x == 2 * got[1].n_pos * got[1].n_neg
    assert got[0].auc == 1.0  # symmetric construction
    assert _rows(_Q["q_ml_auc"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ml_auc", "embeddings")
    )


def test_auc_all_tied_scores_is_half(spark, tmp_path):
    """Every vector identical → one distinct score per class → the
    tie-aware form must land exactly on AUC 0.5 (2U = n_pos·n_neg),
    where a naive strict-rank AUC would emit 0."""
    rows = [(i, [0.5, 0.5], i % 2) for i in range(8)]
    d = tmp_path / "auc_ties"
    d.mkdir()
    _emb_frame(rows).to_parquet(str(d / "embeddings.parquet"))
    got = _Q["q_ml_auc"](spark, str(d)).collect()
    for r in got:
        assert r.u2x == r.n_pos * r.n_neg
        assert r.auc == 0.5
    assert _rows(_Q["q_ml_auc"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ml_auc", "embeddings")
    )


# ------------------------------------------------------- q_ml_calibration


def test_calibration_fixture_invariants(spark):
    got = _Q["q_ml_calibration"](spark, SF_SMOKE).collect()
    assert sorted(r.bin for r in got) == list(range(1, 11))
    total = sum(r.n for r in got)
    assert max(r.n for r in got) - min(r.n for r in got) <= 1  # NTILE
    assert sum(r.n_pos for r in got) <= total
    for r in got:
        assert 0.0 <= r.pos_rate <= 1.0


def test_calibration_monotone_on_separable_data(spark, tmp_path):
    """Class-0 mass on dim 0: the class-0 score orders class-0 vectors
    last → the top NTILE bins hold all the positives."""
    rows = [(i, [0.0, 1.0 - i * 0.01], 1) for i in range(10)] + [
        (10 + i, [1.0 - i * 0.01, 0.0], 0) for i in range(10)
    ]
    d = tmp_path / "calib_sep"
    d.mkdir()
    _emb_frame(rows).to_parquet(str(d / "embeddings.parquet"))
    got = sorted(
        _Q["q_ml_calibration"](spark, str(d)).collect(), key=lambda r: r.bin
    )
    # 20 vectors → 10 bins of 2; positives (label 0) all in the top 5 bins
    assert [r.n_pos for r in got] == [0] * 5 + [2] * 5
    assert _rows(_Q["q_ml_calibration"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ml_calibration", "embeddings")
    )


# --------------------------------------------------------------- q_ml_psi


def test_psi_fixture_invariants(spark):
    got = _Q["q_ml_psi"](spark, SF_SMOKE).collect()
    assert sorted(r.bin for r in got) == list(range(10))
    # every PSI term is ≥ 0 up to the e6 floor (sign-agreeing product)
    assert all(r.psi_term_e6 >= -1 for r in got)


def test_psi_identical_eras_is_zero(spark, tmp_path):
    """The same value multiset in both eras → p = q in every bin → every
    term floors to exactly 0 (the e6 floor of a true 0 with +EPS)."""
    prices = [1000.0, 60000.0, 120000.0, 480000.0] * 5
    rows = []
    for i, p in enumerate(prices):
        rows.append((i, 1, "O", p, pd.Timestamp("1996-06-01"), "1-URGENT"))
    for i, p in enumerate(prices):
        rows.append(
            (100 + i, 1, "O", p, pd.Timestamp("1999-06-01"), "1-URGENT")
        )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    d = tmp_path / "psi_same"
    d.mkdir()
    pdf.to_parquet(str(d / "orders.parquet"))
    got = _Q["q_ml_psi"](spark, str(d)).collect()
    assert all(r.psi_term_e6 == 0 for r in got)
    assert {r.bin for r in got} == {0, 1, 2, 9}
    assert _rows(_Q["q_ml_psi"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ml_psi", "orders")
    )


# ---------------------------------------------------------------- q_ml_ks


def test_ks_fixture_single_row(spark):
    got = _Q["q_ml_ks"](spark, SF_SMOKE).collect()
    assert len(got) == 1
    r = got[0]
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.d_num <= r.na * r.nb


def test_ks_identical_and_disjoint_distributions(spark, tmp_path):
    """Identical samples → D = 0 exactly; disjoint supports → D = 1."""
    base = pd.Timestamp("2024-01-01")

    def mk(rows, name):
        d = tmp_path / name
        d.mkdir()
        _events_frame(rows).to_parquet(str(d / "events.parquet"))
        return str(d)

    same = mk(
        [
            (i, base + pd.Timedelta(minutes=i), 1, t, v)
            for i, (t, v) in enumerate(
                [(t, v) for v in (1.0, 2.0, 3.0) for t in ("click", "purchase")]
            )
        ],
        "ks_same",
    )
    got = _Q["q_ml_ks"](spark, same).collect()[0]
    assert got.d_num == 0 and got.ks_stat == 0.0
    # argmax tiebreak: earliest value in the merged support
    assert got.at_value == 1.0
    assert _rows(_Q["q_ml_ks"](spark, same)) == _pdf_rows(
        _oracle(same, "q_ml_ks", "events")
    )

    disj = mk(
        [
            (0, base, 1, "click", 1.0),
            (1, base, 1, "click", 2.0),
            (2, base, 1, "purchase", 10.0),
            (3, base, 1, "purchase", 11.0),
        ],
        "ks_disj",
    )
    got = _Q["q_ml_ks"](spark, disj).collect()[0]
    assert got.ks_stat == 1.0 and got.at_value == 2.0
    assert _rows(_Q["q_ml_ks"](spark, disj)) == _pdf_rows(
        _oracle(disj, "q_ml_ks", "events")
    )


# ------------------------------------------------------------- plan shape


def test_ml_prototype_join_is_broadcast(spark):
    """The class-prototype table must reach the scoring join as a
    broadcast — a shuffled (pos) join would reshuffle the exploded corpus
    by dimension index."""
    plan = _Q["q_ml_auc"](spark, SF_SMOKE)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


# -------------------------------------------------------- q_ts_interarrival


def test_interarrival_metronomic_and_degenerate_users(spark, tmp_path):
    """Constant gaps → cv exactly 0 and burstiness exactly −1; a
    single-event user has no gap (dropped by n ≥ 2); an all-zero-gap
    user (duplicate timestamps) emits NULL cv/burstiness, not ÷0."""
    base = pd.Timestamp("2024-01-01")
    rows = (
        # user 1: metronomic, 4 events at exact 10-minute gaps
        [(i, base + pd.Timedelta(minutes=10 * i), 1, "click", 1.0) for i in range(4)]
        # user 2: two events → ONE gap → n_gaps=1 → filtered
        + [(10, base, 2, "click", 1.0), (11, base + pd.Timedelta(hours=1), 2, "click", 1.0)]
        # user 3: three identical timestamps → gaps all 0 → Σg = 0
        + [(20 + i, base, 3, "view", 1.0) for i in range(3)]
        # user 4: bursty (two tight, one huge gap)
        + [(30, base, 4, "click", 1.0), (31, base + pd.Timedelta(seconds=1), 4, "click", 1.0),
           (32, base + pd.Timedelta(seconds=2), 4, "click", 1.0), (33, base + pd.Timedelta(days=1), 4, "click", 1.0)]
    )
    d = tmp_path / "inter"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))
    got = {r.user_id: r for r in _Q["q_ts_interarrival"](spark, str(d)).collect()}
    assert set(got) == {1, 3, 4}  # user 2 filtered (1 gap)
    assert got[1].cv_gap == 0.0 and got[1].burstiness == -1.0
    assert got[1].mean_gap_s == 600.0
    assert got[3].cv_gap is None and got[3].burstiness is None
    # bursty user: with n gaps the CV is bounded by √(n−1), so 3 gaps cap
    # B at (√2−1)/(√2+1) ≈ 0.1716 — this user sits AT the cap
    assert got[4].burstiness == 0.171556
    assert _rows(_Q["q_ts_interarrival"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_interarrival", "events")
    )


# --------------------------------------------------------------- q_ts_peaks


def test_peaks_strict_neighbors_and_edges(spark, tmp_path):
    """Plateaus are NOT peaks (strict >), series edges are NOT peaks,
    and the argmax tiebreak picks the earliest day."""
    base = pd.Timestamp("2024-01-01")
    # click daily: 9(edge) 5 7(peak) 4 7 7(plateau-not-peak) 3 8(peak) 2(edge)
    revs = [9.0, 5.0, 7.0, 4.0, 7.0, 7.0, 3.0, 8.0, 2.0]
    rows = [
        (i, base + pd.Timedelta(days=i, hours=1), 1, "click", v)
        for i, v in enumerate(revs)
    ]
    # view: strictly increasing → zero peaks → NULL top columns
    rows += [
        (100 + i, base + pd.Timedelta(days=i, hours=2), 2, "view", float(i + 1))
        for i in range(4)
    ]
    d = tmp_path / "peaks"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))
    got = {r.event_type: r for r in _Q["q_ts_peaks"](spark, str(d)).collect()}
    assert got["click"].n_peaks == 2
    assert got["click"].top_peak_rev == 8.0
    assert got["click"].top_peak_day == pd.Timestamp(base + pd.Timedelta(days=7))
    assert got["view"].n_peaks == 0 and got["view"].top_peak_rev is None
    assert _rows(_Q["q_ts_peaks"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_peaks", "events")
    )


def test_peaks_value_tie_breaks_earliest(spark, tmp_path):
    base = pd.Timestamp("2024-01-01")
    revs = [1.0, 5.0, 2.0, 5.0, 1.0]  # two peaks of equal height
    rows = [
        (i, base + pd.Timedelta(days=i), 1, "click", v)
        for i, v in enumerate(revs)
    ]
    d = tmp_path / "peaks_tie"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))
    got = _Q["q_ts_peaks"](spark, str(d)).collect()[0]
    assert got.n_peaks == 2
    assert got.top_peak_day == pd.Timestamp(base + pd.Timedelta(days=1))
    assert _rows(_Q["q_ts_peaks"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_peaks", "events")
    )


# --------------------------------------------------------- q_ts_mix_entropy


def test_mix_entropy_degenerate_and_uniform_days(spark, tmp_path):
    """Single-type day → entropy 0 AND evenness 0 (the 0/ln(1) guard);
    uniform 2-type day → entropy = ln 2 (e6-floored), evenness = 1."""
    d0 = pd.Timestamp("2024-01-01 06:00")
    d1 = pd.Timestamp("2024-01-02 06:00")
    rows = [(i, d0 + pd.Timedelta(minutes=i), 1, "click", 1.0) for i in range(4)]
    rows += [
        (10, d1, 1, "click", 1.0),
        (11, d1 + pd.Timedelta(minutes=1), 1, "view", 1.0),
        (12, d1 + pd.Timedelta(minutes=2), 1, "click", 1.0),
        (13, d1 + pd.Timedelta(minutes=3), 1, "view", 1.0),
    ]
    d = tmp_path / "mixent"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))
    got = {r.day: r for r in _Q["q_ts_mix_entropy"](spark, str(d)).collect()}
    day0 = got[pd.Timestamp("2024-01-01")]
    assert day0.n_types == 1 and day0.entropy_nats == 0.0 and day0.evenness == 0.0
    day1 = got[pd.Timestamp("2024-01-02")]
    import math

    assert abs(day1.entropy_nats - math.log(2)) < 2e-6
    # evenness lands just UNDER 1: each (1/2)·ln 2 term is e6-FLOORED
    # before the ÷ln 2, so the uniform day reads 0.999998, never > 1
    assert 0.999996 <= day1.evenness <= 1.0
    assert _rows(_Q["q_ts_mix_entropy"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_mix_entropy", "events")
    )


# ----------------------------------------------------- q_sample_weighted


def test_sample_weighted_expected_size_and_bias(spark):
    """Expected size k=500 on the ~1.5k-order smoke fixture means most
    weight-heavy orders are certainty items; the inclusion rate must rise
    with order value (the PPS property) and the sample must be a subset."""
    from gpe.io import load_table

    got = _Q["q_sample_weighted"](spark, SF_SMOKE)
    rows = got.collect()
    o = load_table(spark, SF_SMOKE, "orders")
    n_orders = o.count()
    keys = {r.o_orderkey for r in rows}
    assert len(keys) == len(rows)  # sampling without duplication
    assert 0 < len(rows) < n_orders
    # PPS property: the mean sampled weight exceeds the population mean
    import pyspark.sql.functions as F

    pop_mean = o.agg(F.avg("o_totalprice")).collect()[0][0]
    samp_mean = sum(r.o_totalprice for r in rows) / len(rows)
    assert samp_mean > pop_mean


def test_sample_weighted_certainty_item(spark, tmp_path):
    """An order holding >1/k of the total weight has inclusion
    probability 1 — it MUST be in the sample regardless of its hash."""
    prices = [10.0] * 50 + [100000.0]  # the big order is ~99.5% of W
    rows = [
        (i, 1, "O", p, pd.Timestamp("1996-06-01"), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    d = tmp_path / "pps"
    d.mkdir()
    pdf.to_parquet(str(d / "orders.parquet"))
    got = _Q["q_sample_weighted"](spark, str(d)).collect()
    assert 50 in {r.o_orderkey for r in got}  # the certainty item
    assert _rows(_Q["q_sample_weighted"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_sample_weighted", "orders")
    )


# --------------------------------------------------------- q_text_hapax


def test_hapax_crafted_extremes(spark, tmp_path):
    """A boilerplate source (one token repeated) → vocab 1, hapax 0,
    TTR → 0; an all-unique source → hapax = vocab = n_tokens, TTR 1."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["spam spam spam spam", "alpha beta gamma delta"],
            "lang": ["en", "en"],
            "source": ["boiler", "unique"],
            "n_chars": [19, 22],
        }
    )
    d = tmp_path / "hapax"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = {r.source: r for r in _Q["q_text_hapax"](spark, str(d)).collect()}
    b = got["boiler"]
    assert (b.vocab, b.hapax, b.hapax_share) == (1, 0, 0.0)
    assert b.ttr == 0.25
    u = got["unique"]
    assert u.hapax == u.vocab == u.n_tokens == 4
    assert u.hapax_share == 1.0 and u.ttr == 1.0
    assert _rows(_Q["q_text_hapax"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_text_hapax", "documents")
    )


# ----------------------------------------------------- q_graph_bfs_layers


def test_bfs_layers_partition_and_semantics(spark, tmp_path):
    """Crafted graph: two identical docs (A=seed's clique), one chained
    neighbor, one far island. Layers must be: seed 0, its clique-mate 1,
    unreached island −1; counts partition the corpus."""
    # doc 0 (seed) and doc 1 share a token set (clique); doc 2 overlaps
    # doc 1 at J>0.9 only if near-identical sets — build via mask math:
    # tokens are from the corpus vocab ('key agg row ...'); doc 2 shares
    # 10 of 11 tokens with docs 0/1 (J = 10/11 ≈ 0.909 > 0.9);
    # doc 3 is disjoint.
    t = "key agg row scan slow fast table value part hash"
    docs = [
        (0, t + " merge", "en", "s0"),          # seed (id % 50 == 0)
        (1, t + " merge", "en", "s0"),          # same set → layer 1
        (2, t + " batch merge", "en", "s0"),    # J = 11/12 < wait
        (3, "alpha beta gamma", "en", "s1"),    # island → -1
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "bfs"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = {r.layer: r.n_docs for r in _Q["q_graph_bfs_layers"](spark, str(d)).collect()}
    assert got[0] == 1           # the seed
    assert got[1] == 2           # clique-mate AND the J=11/12 neighbor
    assert got[-1] == 1          # the island
    assert sum(got.values()) == 4
    assert _rows(_Q["q_graph_bfs_layers"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_graph_bfs_layers", "documents")
    )


def test_bfs_layers_fixture_partitions_corpus(spark):
    got = _Q["q_graph_bfs_layers"](spark, SF_SMOKE).collect()
    layers = {r.layer for r in got}
    assert layers <= {-1, 0, 1, 2, 3}
    assert sum(r.n_docs for r in got) == 500  # every doc in exactly one layer
    assert dict((r.layer, r.n_docs) for r in got)[0] == 10  # the seeds


# -------------------------------------------------------- q_ts_decompose


def test_decompose_constant_series_has_zero_seasonal(spark, tmp_path):
    """A constant daily series: every detrended value is exactly 0 →
    seasonal index 0 and residual 0 for every weekday; edge days (±3)
    are excluded by the full-window guard."""
    base = pd.Timestamp("2024-01-01 12:00")  # Monday
    rows = [
        (i, base + pd.Timedelta(days=i), 1, "click", 10.0) for i in range(21)
    ]
    d = tmp_path / "decomp_const"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))
    got = _Q["q_ts_decompose"](spark, str(d)).collect()
    assert len(got) == 7  # every weekday present (15 interior days)
    for r in got:
        assert r.seasonal_value == 0.0 and r.mean_abs_resid == 0.0
    # 15 interior days over 7 weekdays: 2 or 3 observations each
    assert sorted(r.n_weeks for r in got) == [2, 2, 2, 2, 2, 2, 3]
    assert _rows(_Q["q_ts_decompose"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_decompose", "events")
    )


def test_decompose_pure_weekly_pattern_recovered(spark, tmp_path):
    """value = 10 + 7·(dow == Monday): the centered 7-day MA absorbs the
    weekly bump into a constant trend, so the Monday seasonal index must
    be exactly 6 (= 7·(1 − 1/7)) and other days −1, residuals 0."""
    base = pd.Timestamp("2024-01-01 12:00")  # Monday
    rows = [
        (
            i,
            base + pd.Timedelta(days=i),
            1,
            "click",
            17.0 if (base + pd.Timedelta(days=i)).dayofweek == 0 else 10.0,
        )
        for i in range(28)
    ]
    d = tmp_path / "decomp_weekly"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))
    got = {r.dow: r for r in _Q["q_ts_decompose"](spark, str(d)).collect()}
    assert got[1].seasonal_value == 6.0  # Monday (Sunday-based dow 1)
    for dow, r in got.items():
        if dow != 1:
            assert r.seasonal_value == -1.0
        assert r.mean_abs_resid == 0.0
    assert _rows(_Q["q_ts_decompose"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_decompose", "events")
    )


# ------------------------------------------------------- q_agg_cramers_v


def test_cramers_v_fixture_bounds_and_consistency(spark):
    got = _Q["q_agg_cramers_v"](spark, SF_SMOKE).collect()
    assert len(got) == 1
    r = got[0]
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.dof >= 1 and r.chi2 >= 0.0
    # chi2 total must equal the sum of q_agg_chi2's per-cell terms
    # up to the e6 floor vs display-round difference (≤1e-6 per cell)
    cells = _Q["q_agg_chi2"](spark, SF_SMOKE).collect()
    assert abs(r.chi2 - sum(c.chi2_term for c in cells)) < 1e-4


def test_cramers_v_perfect_association(spark, tmp_path):
    """status determines priority exactly → V = 1.0 (2×2, every row on
    the diagonal)."""
    rows = [
        (i, 1, "O", 100.0, pd.Timestamp("1996-06-01"), "1-URGENT")
        for i in range(10)
    ] + [
        (100 + i, 1, "F", 100.0, pd.Timestamp("1996-06-01"), "5-LOW")
        for i in range(10)
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    d = tmp_path / "cramers_perfect"
    d.mkdir()
    pdf.to_parquet(str(d / "orders.parquet"))
    got = _Q["q_agg_cramers_v"](spark, str(d)).collect()[0]
    assert got.cramers_v == 1.0 and got.dof == 1
    assert _rows(_Q["q_agg_cramers_v"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_agg_cramers_v", "orders")
    )


# ------------------------------------------- q_ml_confusion / q_ml_margin


def test_confusion_and_margin_consistency(spark):
    """Diagonal confusion mass == n_separated per class (argmax-correct ⇔
    positive margin, ties impossible on this fixture), and row shares
    sum to ~1 per label."""
    cm = _Q["q_ml_confusion"](spark, SF_SMOKE).collect()
    mg = {r.label: r for r in _Q["q_ml_margin"](spark, SF_SMOKE).collect()}
    diag = {r.label: r.n for r in cm if r.label == r.pred}
    for lbl, m in mg.items():
        assert diag.get(lbl, 0) == m.n_separated
        assert m.min_margin <= m.mean_margin
    from collections import defaultdict

    shares = defaultdict(float)
    totals = defaultdict(int)
    for r in cm:
        shares[r.label] += r.row_share
        totals[r.label] += r.n
    for lbl in shares:
        assert 0.99 <= shares[lbl] <= 1.0  # e6 floors sum just under 1
    assert sum(totals.values()) == sum(m.n for m in mg.values())


def test_confusion_separable_data_is_diagonal(spark, tmp_path):
    """Orthogonal class clusters → every vector predicted correctly:
    the confusion matrix is exactly diagonal and every margin positive."""
    rows = [(i, [1.0 - i * 0.01, 0.0], 0) for i in range(5)] + [
        (10 + i, [0.0, 1.0 - i * 0.01], 1) for i in range(5)
    ]
    d = tmp_path / "conf_sep"
    d.mkdir()
    _emb_frame(rows).to_parquet(str(d / "embeddings.parquet"))
    cm = _Q["q_ml_confusion"](spark, str(d)).collect()
    assert all(r.label == r.pred for r in cm)
    assert all(r.row_share == 1.0 for r in cm)
    mg = _Q["q_ml_margin"](spark, str(d)).collect()
    assert all(m.n_separated == m.n and m.min_margin > 0 for m in mg)
    assert _rows(_Q["q_ml_confusion"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ml_confusion", "embeddings")
    )
    assert _rows(_Q["q_ml_margin"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ml_margin", "embeddings")
    )


# -------------------------------------------------------- q_text_bigram_lm


def test_bigram_lm_repetition_scores_high(spark, tmp_path):
    """A doc that repeats one bigram gets near-max probability (low
    perplexity); a doc of all-unique transitions scores lower. A 1-token
    doc has no bigrams and must be absent."""
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b a b a b a b a b",      # one dominant transition
                "c d e f g h i j k l",      # all transitions unique
                "solo",                     # no bigram → excluded
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "biglm"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in _Q["q_text_bigram_lm"](spark, str(d)).collect()}
    assert set(got) == {0, 1}
    assert got[0].mean_logp > got[1].mean_logp
    assert got[0].perplexity < got[1].perplexity
    assert got[0].n_bigrams == 9 and got[1].n_bigrams == 9
    assert _rows(_Q["q_text_bigram_lm"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_text_bigram_lm", "documents")
    )


# ------------------------------------------------------- q_ml_knn_eval


def test_knn_eval_fixture_invariants(spark):
    got = _Q["q_ml_knn_eval"](spark, SF_SMOKE).collect()
    assert sum(r.n_queries for r in got) == 100  # every eval vec predicted
    for r in got:
        assert 0 <= r.n_correct <= r.n_queries
        assert 0.0 <= r.accuracy <= 1.0


def test_knn_eval_separable_clusters_are_perfect(spark, tmp_path):
    """Two tight orthogonal clusters: every eval vector's 5 neighbors are
    its own cluster → accuracy exactly 1.0 for both labels."""
    rows = [(i, [1.0 - i * 0.001, 0.0], 0) for i in range(8)] + [
        (8 + i, [0.0, 1.0 - i * 0.001], 1) for i in range(8)
    ]
    d = tmp_path / "knn_sep"
    d.mkdir()
    _emb_frame(rows).to_parquet(str(d / "embeddings.parquet"))
    got = _Q["q_ml_knn_eval"](spark, str(d)).collect()
    assert {r.label for r in got} == {0, 1}
    assert all(r.accuracy == 1.0 for r in got)
    assert _rows(_Q["q_ml_knn_eval"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ml_knn_eval", "embeddings")
    )


# ------------------------------------------------ q_text_dup_paragraphs


def test_dup_paragraphs_cross_doc_only(spark, tmp_path):
    """A chunk repeated WITHIN one doc does not qualify (n_docs ≥ 2);
    the same paragraph across two docs does, with the exact keeper."""
    para = " ".join(f"w{i}" for i in range(32))  # one full window
    other = " ".join(f"x{i}" for i in range(32))
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            # doc 0: para at chunk 0 (and again at token 32 → chunk 2)
            "text": [para + " " + para, other + " " + para, other],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "duppara"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = _Q["q_text_dup_paragraphs"](spark, str(d)).collect()
    # Three cross-doc groups: 'para' (docs 0+1), 'other' (docs 1+2), and
    # the 16-token w-tail stub the stride-16 chunker emits in docs 0+1.
    # Within-doc repeats alone don't qualify (doc 0 holds para twice but
    # counts once toward n_docs).
    assert len(got) == 3
    para_g = next(r for r in got if r.n_occurrences >= 3)
    assert para_g.n_docs == 2 and para_g.first_doc_id == 0
    assert para_g.first_chunk_idx == 0 and para_g.n_tokens == 32
    other_g = next(r for r in got if r.first_doc_id == 1)
    assert other_g.n_docs == 2 and other_g.n_tokens == 32
    assert _rows(_Q["q_text_dup_paragraphs"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_text_dup_paragraphs", "documents")
    )


# ----------------------------------------------------- q_multimodal_dedup


def test_multimodal_dedup_block_semantics(spark, tmp_path):
    """Two media sharing a 256-byte prefix block dedup at block level
    even though their full payloads differ; a unique payload contributes
    nothing. Reclaimable = (copies−1)·blocksize."""
    prefix = "a" * 256
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [prefix + "tail-one", prefix + "tail-two", "b" * 300],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
        }
    )
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path / "blockdedup"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = _Q["q_multimodal_dedup"](spark, str(d)).collect()
    assert len(got) == 1  # only the shared prefix block
    g = got[0]
    assert (g.n_copies, g.n_media, g.keeper_media_id) == (2, 2, 0)
    assert g.bytes_each == 256 and g.bytes_reclaimable == 256
    assert _rows(_Q["q_multimodal_dedup"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_multimodal_dedup", "documents")
    )


def test_multimodal_dedup_fixture_nonempty(spark):
    got = _Q["q_multimodal_dedup"](spark, SF_SMOKE).collect()
    assert len(got) > 0  # the fixture's shared 256-byte prefixes
    for r in got:
        assert r.n_copies >= 2
        assert r.bytes_reclaimable == (r.n_copies - 1) * r.bytes_each


# ------------------------------------------------------ q_join_ship_lag


def test_ship_lag_fixture_invariants(spark):
    got = _Q["q_join_ship_lag"](spark, SF_SMOKE).collect()
    assert len(got) == 5  # one row per priority
    for r in got:
        assert r.p50_lag <= r.p90_lag
        assert r.n_lines > 0 and r.mean_lag_days >= 0


# --------------------------------------------- q_catalog_column_entropy


def test_column_entropy_profiles_every_declared_column(spark):
    got = {(r.table_name, r.column_name): r
           for r in _Q["q_catalog_column_entropy"](spark, SF_SMOKE).collect()}
    from gpe.catalog import _ENTROPY_COLS

    assert set(got) == set(_ENTROPY_COLS)
    for r in got.values():
        assert r.n_distinct >= 1 and 0.0 < r.top_share <= 1.0
        assert r.entropy_nats >= 0.0
        # entropy ≤ ln(cardinality) (uniform upper bound; e6 floor slack)
        import math

        assert r.entropy_nats <= math.log(max(r.n_distinct, 2)) + 1e-5


# ---------------------------------------- PPS predicate cross-validation


def test_sample_weighted_matches_python_reimplementation(spark, tmp_path):
    """Third-implementation check: recompute the PPS inclusion predicate
    in pure Python (hashlib md5 + int arithmetic) and require EXACT
    membership agreement with the Spark operator — pins the md5 recipe,
    the hex slice, and the int128 comparison across three independent
    implementations (Spark/DuckDB parity covers the other two)."""
    import hashlib

    prices = [10.0, 999.99, 250000.0, 1013.7, 499978.59, 42.42] * 20
    rows = [
        (i, 1, "O", p, pd.Timestamp("1997-01-01"), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    d = tmp_path / "pps_xcheck"
    d.mkdir()
    pdf.to_parquet(str(d / "orders.parquet"))

    from decimal import Decimal

    cents = {
        i: int(Decimal(repr(p)).quantize(Decimal("0.01")) * 100)
        for i, p in enumerate(prices)
    }
    w_tot = sum(cents.values())
    expect = set()
    for i, w in cents.items():
        h = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:8], 16)
        if h * w_tot < 500 * w * 4294967296:
            expect.add(i)

    got = {r.o_orderkey for r in _Q["q_sample_weighted"](spark, str(d)).collect()}
    assert got == expect and len(expect) > 0


def test_auc_matches_numpy_reimplementation(spark, tmp_path):
    """Third-implementation check for the rank-form AUC: numpy
    tie-aware AUC (mean over pos of [#neg below + ½·#neg tied]) on
    random float32 embeddings must match the operator's `auc` to the
    display round exactly."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, dim = 60, 4
    embs = rng.randn(n, dim).astype("float32")
    labels = rng.randint(0, 3, n)
    rows = [(i, embs[i].tolist(), int(labels[i])) for i in range(n)]
    d = tmp_path / "auc_np"
    d.mkdir()
    _emb_frame(rows).to_parquet(str(d / "embeddings.parquet"))

    got = {r.label: r.auc for r in _Q["q_ml_auc"](spark, str(d)).collect()}

    # numpy reference: score = <emb, Σ members of cls> in float64 —
    # ranks agree with the exact-decimal scores because the decimal cast
    # only rounds the inputs at 1e-10 and the random scores are far
    # apart relative to that
    for cls in sorted(set(labels.tolist())):
        proto = embs[labels == cls].astype("float64").sum(axis=0)
        scores = embs.astype("float64") @ proto
        pos = scores[labels == cls]
        neg = scores[labels != cls]
        u = sum((neg < p).sum() + 0.5 * (neg == p).sum() for p in pos)
        auc = u / (len(pos) * len(neg))
        assert abs(got[cls] - auc) < 2e-6, cls


# -------------------------------------------------- q_ts_anomaly_seasonal


def test_anomaly_seasonal_spike_fires_weekday_pattern_does_not(spark, tmp_path):
    """A strong weekly pattern alone produces NO anomalies (the seasonal
    pass absorbs it); a one-day spike on top of the same pattern fires
    on exactly that day."""
    base = pd.Timestamp("2024-01-01 12:00")  # Monday

    def series(spike_day=None):
        rows = []
        for i in range(28):
            day = base + pd.Timedelta(days=i)
            v = 17.0 if day.dayofweek == 0 else 10.0
            if spike_day is not None and i == spike_day:
                v += 50.0
            rows.append((i, day, 1, "click", v))
        return rows

    d1 = tmp_path / "anom_clean"
    d1.mkdir()
    _events_frame(series()).to_parquet(str(d1 / "events.parquet"))
    assert _Q["q_ts_anomaly_seasonal"](spark, str(d1)).count() == 0

    d2 = tmp_path / "anom_spike"
    d2.mkdir()
    _events_frame(series(spike_day=10)).to_parquet(str(d2 / "events.parquet"))
    got = _Q["q_ts_anomaly_seasonal"](spark, str(d2)).collect()
    days = {r.day for r in got}
    assert pd.Timestamp(base + pd.Timedelta(days=10)).normalize() in {
        pd.Timestamp(d).normalize() for d in days
    }
    assert _rows(_Q["q_ts_anomaly_seasonal"](spark, str(d2))) == _pdf_rows(
        _oracle(d2, "q_ts_anomaly_seasonal", "events")
    )


# ---------------------------------------------------------- q_agg_skyline


def test_skyline_dominance_invariant(spark):
    """No skyline member may dominate another; every non-member must be
    dominated by some member (checked against the full supplier agg)."""
    rows = _Q["q_agg_skyline"](spark, SF_SMOKE).collect()
    pts = [(r.revenue, r.mean_lag_days) for r in rows]
    assert len(pts) >= 1
    for a in pts:
        for b in pts:
            if a is b:
                continue
            dominated = (
                b[0] >= a[0] and b[1] <= a[1] and (b[0] > a[0] or b[1] < a[1])
            )
            assert not dominated, (a, b)
    # frontier is monotone: as revenue decreases, every surviving member
    # must have strictly SMALLER lag (else the higher-revenue one
    # dominates) — lags strictly decrease along the revenue-desc order
    srt = sorted(pts, key=lambda p: (-p[0], p[1]))
    lags = [p[1] for p in srt]
    assert lags == sorted(lags, reverse=True)
    assert len(set(lags)) == len(lags)


def test_ks_matches_numpy_reimplementation(spark, tmp_path):
    """Third-implementation check for the two-sample KS: numpy empirical
    CDF max-gap on random 2-decimal data must match ks_stat to the
    display round."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-01-01")
    a = np.round(rng.exponential(50, 120), 2)
    b = np.round(rng.exponential(70, 90), 2)
    rows = [
        (i, base + pd.Timedelta(seconds=i), 1, "click", float(v))
        for i, v in enumerate(a)
    ] + [
        (1000 + i, base + pd.Timedelta(seconds=1000 + i), 2, "purchase", float(v))
        for i, v in enumerate(b)
    ]
    d = tmp_path / "ks_np"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))
    got = _Q["q_ml_ks"](spark, str(d)).collect()[0]

    support = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), support, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), support, side="right") / len(b)
    d_ref = np.abs(fa - fb).max()
    assert abs(got.ks_stat - d_ref) < 2e-6
    assert got.na == 120 and got.nb == 90


def test_ship_lag_crafted_exact_percentiles(spark, tmp_path):
    """Known lags → exact mean and interpolated percentiles, asserted
    against the DuckDB oracle (both tables crafted)."""
    od = pd.Timestamp("1996-01-01")
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [1, 1],
            "o_orderstatus": ["O", "O"],
            "o_totalprice": [100.0, 200.0],
            "o_orderdate": [od, od],
            "o_orderpriority": ["1-URGENT", "2-HIGH"],
        }
    )
    orders["o_orderdate"] = orders["o_orderdate"].astype("datetime64[us]")
    # order 1: lags 1,2,3,10 days; order 2: lag 7
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 1, 2],
            "l_partkey": [1] * 5,
            "l_suppkey": [1] * 5,
            "l_linenumber": [1, 2, 3, 4, 1],
            "l_quantity": [1.0] * 5,
            "l_extendedprice": [10.0] * 5,
            "l_discount": [0.0] * 5,
            "l_tax": [0.0] * 5,
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": [
                od + pd.Timedelta(days=k) for k in (1, 2, 3, 10, 7)
            ],
        }
    )
    li["l_shipdate"] = li["l_shipdate"].astype("datetime64[us]")
    d = tmp_path / "shiplag"
    d.mkdir()
    orders.to_parquet(str(d / "orders.parquet"))
    li.to_parquet(str(d / "lineitem.parquet"))
    got = {r.o_orderpriority: r for r in _Q["q_join_ship_lag"](spark, str(d)).collect()}
    u = got["1-URGENT"]
    assert u.n_lines == 4 and u.mean_lag_days == 4.0
    assert u.p50_lag == 2.5  # interpolated between 2 and 3
    # 3 + 0.7·(10−3): the interpolation's IEEE double (7.900000000000001)
    # — asserted bit-exactly, the oracle computes the identical value
    assert u.p90_lag == 7.900000000000001
    h = got["2-HIGH"]
    assert (h.n_lines, h.mean_lag_days, h.p50_lag, h.p90_lag) == (1, 7.0, 7.0, 7.0)

    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    want = _pdf_rows(con.execute(_O["q_join_ship_lag"]).fetch_df())
    con.close()
    assert _rows(_Q["q_join_ship_lag"](spark, str(d))) == want
