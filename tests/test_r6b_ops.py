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
