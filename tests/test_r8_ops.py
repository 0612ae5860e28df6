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


SF = "/root/testdata/sf0.001"


def test_theta_bucketed_equals_theta_range(spark):
    """The time-bucket decomposition must reproduce the naive theta join
    exactly (exact recall: bucket width == band width)."""
    a = sorted(map(tuple, _Q["q_join_theta_range"](spark, SF).collect()))
    b = sorted(map(tuple, _Q["q_join_theta_bucketed"](spark, SF).collect()))
    assert a == b and len(a) > 0


def test_bloom_prefilter_is_false_positive_only(spark):
    """The bloom pass may pass extra rows but must NEVER drop a
    qualifying one: survivors ⊇ exact qualifying orders."""
    from pyspark.sql import functions as F

    from gpe.io import load_table

    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    dim = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    exact = set(
        r.o_orderkey
        for r in o.join(
            dim, o.o_custkey == dim.c_custkey, "semi"
        ).collect()
    )
    # reproduce the builder's bloom stage only (no exact verify)
    from gpe.relational import _BLOOM_BITS, _BLOOM_K

    def pos_exprs(col):
        return [
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.lit(i), col)), 1, 8),
                    16,
                    10,
                ).cast("long"),
                F.lit(_BLOOM_BITS),
            )
            for i in range(_BLOOM_K)
        ]

    bits = dim.select(F.explode(F.array(*pos_exprs(F.col("c_custkey")))).alias("pos"))
    member = set(r.pos for r in bits.collect())
    orders = o.select("o_orderkey", "o_custkey").collect()
    import hashlib

    def positions_py(key):
        out = []
        for i in range(_BLOOM_K):
            h = hashlib.md5(f"{i}|{key}".encode()).hexdigest()[:8]
            out.append(int(h, 16) % _BLOOM_BITS)
        return out

    survivors = {
        r.o_orderkey
        for r in orders
        if all(p in member for p in positions_py(r.o_custkey))
    }
    assert exact <= survivors, "bloom dropped a qualifying order"


def test_active_users_wau_is_union_of_trailing_week(spark):
    """WAU(day) must equal |union of the 7 trailing days' user sets| —
    pandas recompute."""
    from gpe.io import load_table

    ev = load_table(spark, SF, "events").toPandas()
    ev["day"] = ev["ts"].dt.floor("D")
    by_day = ev.groupby("day")["user_id"].apply(set).to_dict()
    got = {r.day: (r.dau, r.wau) for r in _Q["q_ts_active_users"](spark, SF).collect()}
    assert set(got) == set(pd.Timestamp(d).to_pydatetime() for d in by_day)
    for day, (dau, wau) in got.items():
        d = pd.Timestamp(day)
        want_dau = len(by_day[d])
        want_wau = len(
            set().union(
                *(by_day.get(d - pd.Timedelta(days=k), set()) for k in range(7))
            )
        )
        assert (dau, wau) == (want_dau, want_wau), day
        assert dau <= wau


def test_dup_stats_on_crafted_duplicates_cross_engine(spark, tmp_path):
    """The fixture has ZERO exact duplicates (dup_ratio 0 everywhere), so
    the ratio math is pinned on crafted data with real dups, against the
    real oracle."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "a b c", "a b c", "A B C  ",  # 2 exact dups after norm? no:
                # lower(trim('A B C  ')) = 'a b c' -> 3 copies of one text
                "x y", "y x", "x y",
            ],
            "lang": ["en"] * 6,
            "source": ["s1"] * 3 + ["s2"] * 3,
            "n_chars": [5, 5, 7, 3, 3, 3],
        }
    )
    d = tmp_path / "dups"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = {r.source: r for r in _Q["q_dedup_dup_stats"](spark, str(d)).collect()}
    # s1: 3 docs, 1 distinct NORMALIZED text (lower+trim), 2 exact dups,
    # but 2 RAW token sets — the mask key deliberately matches the
    # super-node contraction's raw split ('A B C  ' ≠ 'a b c' as sets)
    assert (got["s1"].n_docs, got["s1"].n_distinct_texts,
            got["s1"].n_exact_dups, got["s1"].n_token_sets) == (3, 1, 2, 2)
    # s2: 'x y' and 'y x' differ as text but share a token SET
    assert (got["s2"].n_docs, got["s2"].n_distinct_texts,
            got["s2"].n_exact_dups, got["s2"].n_token_sets) == (3, 2, 1, 1)
    assert _rows(_Q["q_dedup_dup_stats"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_dedup_dup_stats", table="documents")
    )


def test_winnowing_guarantee_on_crafted_overlap(spark, tmp_path):
    """Winnowing's core guarantee (SIGMOD'03): two docs sharing a
    substring of >= k+w-1 = 6 tokens share at least one selected
    fingerprint; density stays within (0, 1]."""
    shared = "q w e r t y u"  # 7 shared tokens > k+w-1
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                f"a b c {shared} d e",
                f"m n {shared} o p z",
                "completely different tokens here with no overlap at all",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [1, 1, 1],
        }
    )
    d = tmp_path / "winnow"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    rows = _Q["q_text_winnowing"](spark, str(d)).collect()
    assert {r.doc_id for r in rows} == {0, 1, 2}
    for r in rows:
        assert 0 < r.density <= 1
        assert r.n_fps <= r.n_grams
    # recompute fingerprint SETS per doc to check the overlap guarantee
    import hashlib

    def fps(text, k=3, w=4):
        toks = text.split(" ")
        grams = [
            hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
            for i in range(len(toks) - k + 1)
        ]
        return {min(grams[i - w + 1:i + 1]) for i in range(w - 1, len(grams))}

    f0, f1, f2 = (fps(t) for t in pdf["text"])
    assert f0 & f1, "docs sharing a 7-token substring must share a fp"
    assert not (f0 & f2)
    # and the Spark-side counts agree with the recompute
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].n_fps == len(f0)
    assert by_id[1].n_fps == len(f1)


def test_resize_pool_matches_python_recompute(spark):
    """The pooled features must equal a pure-Python recompute of the
    factor-2 average pooling over the raw text bytes."""
    from gpe.io import load_table

    docs = {r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()}
    rows = {r.media_id: r for r in _Q["q_multimodal_resize"](spark, SF).collect()}
    checked = 0
    for doc_id, text in docs.items():
        b = text.encode()
        n_pools = len(b) // 2
        if n_pools == 0:
            assert doc_id not in rows
            continue
        pooled = [(b[2 * i] + b[2 * i + 1]) // 2 for i in range(n_pools)]
        r = rows[doc_id]
        assert (r.n_in, r.n_out, r.checksum, r.p_min, r.p_max, r.p_first) == (
            len(b), n_pools, sum(pooled), min(pooled), max(pooled), pooled[0]
        )
        checked += 1
    assert checked > 0


def test_readability_punctuated_cross_engine(spark, tmp_path):
    """The fixture corpus has zero sentence punctuation, so readability's
    sentence split degenerates to 1 there — pin the REAL multi-sentence
    path (trailing/repeated punctuation, empty segments, complex words)
    against the real oracle on crafted docs."""
    texts = [
        "the cat sat. the dog ran! did it run? yes.",   # 4 sentences
        "one sentence only",                             # no punctuation
        "evaluation automobile university... extraordinary!",  # complex
        "a! b! c! d!",                                   # trailing empties
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / "read"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    rows = {r.doc_id: r for r in _Q["q_text_readability"](spark, str(d)).collect()}
    assert rows[0].n_sentences == 4
    assert rows[1].n_sentences == 1  # greatest(0-punct split, 1)
    assert rows[2].n_sentences == 2  # '...' collapses to ONE boundary
    assert rows[3].n_sentences == 4  # trailing '!' yields no empty 5th
    # complex words: >= 3 vowel groups
    assert rows[2].n_complex >= 3 and rows[0].n_complex == 0
    assert _rows(_Q["q_text_readability"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_text_readability", table="documents")
    )


def test_quality_gate_first_rule_attribution(spark, tmp_path):
    """A doc failing several gates must be attributed to the FIRST rule
    (too_short beats repetitive beats stopword_heavy) — the CaseWhen
    short-circuit the funnel's drop accounting depends on."""
    texts = [
        "a a a a a",  # short AND repetitive AND stopword-heavy
        " ".join(["x x"] * 20),  # 40 tokens, ttr=1/40 -> repetitive
        ("the a " * 10 + "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 "
         "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10").strip(),  # stopword-heavy
        " ".join(f"u{i}" for i in range(30)),  # kept
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / "gate"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    from gpe.pipeline import gate_frame
    from gpe.io import load_table

    got = {
        r.doc_id: r.drop_reason
        for r in gate_frame(load_table(spark, str(d), "documents")).collect()
    }
    assert got == {
        0: "too_short",
        1: "repetitive",
        2: "stopword_heavy",
        3: "kept",
    }
    assert _rows(_Q["q_pipeline_quality_gate"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_pipeline_quality_gate", table="documents")
    )


def test_changepoint_finds_crafted_step(spark, tmp_path):
    """A clean level shift must be split exactly at the step, with exact
    integer segment means — pinned against the real oracle."""
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for day in range(10):
        # mean 10.00 for days 0-4, mean 50.00 for days 5-9
        v = 10.0 if day < 5 else 50.0
        rows.append((eid, base + pd.Timedelta(days=day), 1, "step", v))
        eid += 1
    d = tmp_path / "cpt"
    d.mkdir()
    _events_frame(rows).to_parquet(str(d / "events.parquet"))
    r = _Q["q_ts_changepoint"](spark, str(d)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_left, row.n_right) == (5, 5)
    assert row.split_day == (base + pd.Timedelta(days=4)).to_pydatetime()
    assert (row.mean_left_c, row.mean_right_c, row.shift_c) == (1000, 5000, 4000)
    assert _rows(_Q["q_ts_changepoint"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_changepoint")
    )


def _orders_frame(rows):
    """rows = [(orderkey, custkey, status, totalprice, orderdate,
    priority)] → full-schema orders DataFrame (µs timestamps)."""
    pdf = pd.DataFrame(
        rows,
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    pdf["o_orderdate"] = pd.to_datetime(pdf["o_orderdate"]).astype(
        "datetime64[us]"
    )
    return pdf


def test_mann_kendall_constant_series_null_z(spark, tmp_path):
    """An all-tied series has Var(S) = 0 after the tie correction — the
    z statistic must be NULL on BOTH engines (the divide-by-zero guard
    ADVICE r7 demands of every variance denominator), and a clean
    monotone series must hit the no-tie fast path exactly."""
    base = pd.Timestamp("2024-01-15")
    rows = []
    for k in range(6):
        d = base + pd.DateOffset(months=k)
        # 'FLAT': one order per month, constant 10.00 -> all tied
        rows.append((2 * k, 1, "F", 10.0, d, "FLAT"))
        # 'UP': strictly increasing -> S = C(6,2) = 15, no ties
        rows.append((2 * k + 1, 1, "F", 10.0 + k, d, "UP"))
    d = tmp_path / "mk"
    d.mkdir()
    _orders_frame(rows).to_parquet(str(d / "orders.parquet"))
    got = {r.o_orderpriority: r
           for r in _Q["q_ts_mann_kendall"](spark, str(d)).collect()}
    assert got["FLAT"].z_stat is None
    assert (got["FLAT"].n_tied_groups, got["FLAT"].s_stat) == (1, 0)
    assert got["UP"].s_stat == 15 and got["UP"].n_tied_groups == 0
    assert got["UP"].z_stat is not None and got["UP"].z_stat > 1.96
    assert _rows(_Q["q_ts_mann_kendall"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_mann_kendall", table="orders")
    )


def test_theilsen_singleton_group_dropped_both_sides(spark, tmp_path):
    """A priority with ONE month has zero pairs — no median exists, so
    the group is absent from the output on BOTH engines (consistent
    drop, not a crash), while an outlier month cannot move the median
    slope of a clean linear series."""
    base = pd.Timestamp("2024-01-15")
    rows = [(0, 1, "F", 42.0, base, "LONE")]
    for k in range(9):
        d = base + pd.DateOffset(months=k)
        # slope exactly +200 cents/month, with one wild outlier month
        v = 10.0 + 2.0 * k if k != 4 else 999.0
        rows.append((1 + k, 1, "F", v, d, "LIN"))
    d = tmp_path / "ts"
    d.mkdir()
    _orders_frame(rows).to_parquet(str(d / "orders.parquet"))
    out = {r.o_orderpriority: r
           for r in _Q["q_ts_theilsen"](spark, str(d)).collect()}
    assert "LONE" not in out
    r = out["LIN"]
    assert (r.n_months, r.n_pairs) == (9, 36)
    # the outlier perturbs 8 of 36 pairwise slopes; the median holds 200
    assert r.med_rise_c / r.med_run_m == 200
    assert _rows(_Q["q_ts_theilsen"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_ts_theilsen", table="orders")
    )


def test_fk_infer_semantics_on_fixture(spark):
    """The declared join graph must show full containment; the partial
    link and the negative control must NOT."""
    rows = {r.child_col: r for r in _Q["q_catalog_fk_infer"](spark, SF).collect()}
    for fk in (
        "orders.o_custkey", "lineitem.l_partkey", "lineitem.l_suppkey",
        "lineitem.l_orderkey", "customer.c_nationkey",
        "supplier.s_nationkey", "nation.n_regionkey",
    ):
        assert rows[fk].is_contained and rows[fk].containment_e6 == 1000000, fk
    # events.user_id covers only a subset of customers -> contained,
    # but the reverse coverage is partial (n_matched < n_parent_keys)
    ev = rows["events.user_id"]
    assert ev.n_matched <= ev.n_child_keys
    # negative control: p_size overlaps nationkey's RANGE but not its SET
    neg = rows["part.p_size"]
    assert not neg.is_contained
