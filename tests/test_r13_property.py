"""Property tests for the r13 operators against independent pure-Python
references on synthetic lakes: cross-corpus decontamination (planted
corpus↔benchmark spans, with corpus↔corpus and benchmark↔benchmark
plants that must NOT count), the unrolled BPE trainer (reference greedy
trainer), the forget audit (hand-computed purge propagation with
no-order customers / no-line orders edges), and semantic dedup (exact
Decimal replica of the quantized assignment + pair dots on
exactly-representable synthetic embeddings).
"""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pandas as pd
import pytest

from gpe.text import _SUB_MIN_LEN, q_text_bpe_train, q_text_decontaminate_external
from tests.test_r12_ops import _span_reference
from tests.test_r12_property import _random_docs, _write_lake

# ------------------------------------------ external decontamination


def _external_report_reference(sf_dir: str):
    """Reference report: cross (corpus, benchmark) maximal spans from
    _span_reference, cut from the CORPUS side, exact interval union,
    per-source rollup."""
    import duckdb

    spans = _span_reference(sf_dir, _SUB_MIN_LEN, 10**9)
    cut = defaultdict(list)  # corpus doc -> [s, e) intervals
    for a, b, sa, sb, ln in spans:
        if a % 10 != 3 and b % 10 == 3:
            cut[a].append((sa, sa + ln))
        elif a % 10 == 3 and b % 10 != 3:
            cut[b].append((sb, sb + ln))
    removable = {}
    for d, ivs in cut.items():
        ivs = sorted(set(ivs))
        tot, cs, ce = 0, ivs[0][0], ivs[0][1]
        for s, e in ivs[1:]:
            if s > ce:
                tot += ce - cs
                cs, ce = s, e
            else:
                ce = max(ce, e)
        removable[d] = tot + (ce - cs)
    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id % 10 <> 3"
    ).fetchall()
    out = {}
    for src in sorted({s for _, s, _ in docs}):
        rows = [(i, t) for i, s, t in docs if s == src]
        n = sum(len(t.split(" ")) for _, t in rows)
        rem = sum(removable.get(i, 0) for i, _ in rows)
        out[src] = (
            len(rows),
            n,
            sum(1 for i, _ in rows if i in removable),
            rem,
            (rem * 1_000_000 // n) / 1_000_000.0,
        )
    return out


@pytest.mark.parametrize("seed", [3, 11])
def test_external_decontamination_matches_reference(spark, tmp_path, seed):
    rng = random.Random(seed * 77)
    docs = _random_docs(seed, 16)
    span = docs[0][2 : 2 + _SUB_MIN_LEN + 4]
    # corpus 1 <- benchmark 13 share (counts, cut from doc 1)
    docs[13] = docs[13][:5] + span + docs[13][5:]
    docs[1] = docs[1][:8] + span + docs[1][8:]
    # corpus 2 <-> corpus 4 share (must NOT appear in the report)
    intra = docs[6][0 : _SUB_MIN_LEN]
    docs[2] = docs[2][:4] + intra + docs[2][4:]
    docs[4] = intra + docs[4][: rng.randint(5, 10)]
    # benchmark 3 <-> benchmark 13 share (must NOT appear either)
    bb = docs[9][0 : _SUB_MIN_LEN]
    docs[3] = docs[3][:2] + bb + docs[3][2:]
    docs[13] = docs[13] + bb
    # a second corpus doc overlapping TWO benchmark spans (union check)
    s2 = docs[13][5 : 5 + _SUB_MIN_LEN + 4]  # == span
    docs[11] = docs[11][:3] + s2[: _SUB_MIN_LEN + 2] + docs[11][3:]
    sf = _write_lake(tmp_path, docs)
    got = {
        r.source: (
            r.n_docs,
            r.total_tokens,
            r.n_affected_docs,
            r.removable_tokens,
            r.removable_share,
        )
        for r in q_text_decontaminate_external(spark, sf).collect()
    }
    want = _external_report_reference(sf)
    assert got == want
    assert sum(v[3] for v in want.values()) > 0  # plants were found


# ------------------------------------------------ BPE trainer


def _bpe_train_reference(docs: dict[int, list[str]], steps: int):
    toks = {i: list(t) for i, t in docs.items()}
    rows = []
    for step in range(1, steps + 1):
        cnt = Counter()
        for t in toks.values():
            for a, b in zip(t, t[1:]):
                cnt[(a, b)] += 1
        (pa, pb), c = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        before = sum(len(t) for t in toks.values())
        for i, t in toks.items():
            out = []
            for tok in t:
                if out and out[-1] == pa and tok == pb:
                    out[-1] = f"{pa}_{pb}"
                else:
                    out.append(tok)
            toks[i] = out
        after = sum(len(t) for t in toks.values())
        rows.append((step, pa, pb, c, before, after, before - after))
    return rows


@pytest.mark.parametrize("seed", [2, 9])
def test_bpe_train_matches_reference_trainer(spark, tmp_path, seed):
    """Synthetic corpora (small vocab → heavy pair mass, including
    equal-token runs that exercise the greedy overlap rule) vs a
    reference trainer; also a corpus engineered so a step-2 pair
    CONTAINS a step-1 merged symbol (the vocabulary must evolve)."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> repeated pairs
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(30, 60))]
        for i in range(8)
    }
    docs[0] += ["w1"] * 7  # an equal-token run (ceil(k/2) greedy merges)
    sf = _write_lake(tmp_path, docs)
    got = sorted(
        (
            r.step,
            r.pair_a,
            r.pair_b,
            r.pair_count,
            r.tokens_before,
            r.tokens_after,
            r.n_merges,
        )
        for r in q_text_bpe_train(spark, sf).collect()
    )
    assert got == _bpe_train_reference(docs, 3)


def test_bpe_train_vocabulary_evolves(spark, tmp_path):
    """A corpus where step 2's argmax pair includes step 1's merged
    symbol — three independent single steps would get this wrong."""
    docs = {i: ["a", "b", "c"] * 12 for i in range(4)}
    sf = _write_lake(tmp_path, docs)
    rows = sorted(
        q_text_bpe_train(spark, sf).collect(), key=lambda r: r.step
    )
    ref = _bpe_train_reference(docs, 3)
    got = [
        (
            r.step,
            r.pair_a,
            r.pair_b,
            r.pair_count,
            r.tokens_before,
            r.tokens_after,
            r.n_merges,
        )
        for r in rows
    ]
    assert got == ref
    # step 1 merges (a,b); step 2's pair must involve the merged symbol
    assert "_" in rows[1].pair_a or "_" in rows[1].pair_b


# ------------------------------------------------ forget audit


def test_forget_audit_matches_reference(spark, tmp_path):
    """Synthetic 4-table lake with the edge shapes: an erased customer
    with NO orders, an order with NO lineitems, events whose user_id
    only partially overlaps the custkey domain."""
    from gpe.cdc import q_gov_forget_audit

    d = str(tmp_path)
    custkeys = [1, 2, 97, 194, 200, 291]  # 97/194/291 erased (97|x)
    pd.DataFrame({"c_custkey": custkeys, "c_name": ["c"] * 6}).to_parquet(
        f"{d}/customer.parquet"
    )
    # 194 has NO orders; order 40 belongs to an unerased customer
    orders = [(10, 97), (11, 97), (20, 291), (40, 2)]
    pd.DataFrame(
        orders, columns=["o_orderkey", "o_custkey"]
    ).to_parquet(f"{d}/orders.parquet")
    # order 11 has NO lineitems
    lines = [(10, 1), (10, 2), (20, 1), (40, 1)]
    pd.DataFrame(
        lines, columns=["l_orderkey", "l_linenumber"]
    ).to_parquet(f"{d}/lineitem.parquet")
    # user 97 erased; 2 and 5 are not (5 is not even a customer)
    ev = [(1, 97), (2, 97), (3, 2), (4, 5)]
    evdf = pd.DataFrame(ev, columns=["event_id", "user_id"])
    # load_table("events") normalizes the ts column; give it a us one
    evdf["ts"] = pd.to_datetime("2024-01-01").as_unit("us")
    evdf.to_parquet(f"{d}/events.parquet")
    got = {
        r.table_name: (r.n_before, r.n_purged, r.n_after, r.n_residual_refs)
        for r in q_gov_forget_audit(spark, d).collect()
    }
    assert got == {
        "customer": (6, 3, 3, 0),
        "orders": (4, 3, 1, 0),
        "lineitem": (4, 3, 1, 0),
        "events": (4, 2, 2, 0),
    }


# ------------------------------------------------ semantic dedup


def test_semantic_dedup_matches_decimal_reference(spark, tmp_path):
    """Exact Decimal replica of the whole chain — quantized centroid
    dims, argmax-margin assignment with the smaller-label tie-break,
    within-cell pair dots, τ threshold, keep-min rollup — on synthetic
    embeddings built from multiples of 1/1024 (exactly representable in
    float32, so the decimal(12,10) casts are exact on every engine and
    the reference cannot drift on rounding mode)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from decimal import Decimal
    from fractions import Fraction

    from gpe.dedup import _SEM_TAU, q_dedup_semantic

    rng = random.Random(13)
    dim, n = 8, 40
    vecs = {}
    for i in range(n):
        base = [rng.randint(-512, 512) / 1024 for _ in range(dim)]
        vecs[i] = base
    # plant exact duplicates (norm^2 = 8 * 0.3125^2 = 0.781 >= tau, so the
    # pair qualifies regardless of the random draws) — copies share an
    # embedding, hence a cell, hence the pair is in-contract
    vecs[0] = [320 / 1024] * dim
    vecs[1] = list(vecs[0])
    vecs[10] = [-320 / 1024] * dim
    vecs[11] = list(vecs[10])
    labels = {i: i % 4 for i in range(n)}
    tbl = pa.table(
        {
            "vec_id": pa.array(sorted(vecs), type=pa.int64()),
            "embedding": pa.array(
                [vecs[i] for i in sorted(vecs)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(
                [labels[i] for i in sorted(vecs)], type=pa.int32()
            ),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/embeddings.parquet")

    # ---- reference: exact rational arithmetic end to end
    fx = {i: [Fraction(x).limit_denominator(1 << 30) for x in v] for i, v in vecs.items()}
    by_label = defaultdict(list)
    for i in sorted(vecs):
        by_label[labels[i]].append(i)
    cent = {}
    for lb, members in by_label.items():
        dims = []
        for p in range(dim):
            s = sum(fx[i][p] for i in members)
            # floor(sum * 1e8 / n) / 1e8 — the e8 quantized centroid
            q = Fraction(int(s * 100_000_000 // len(members)), 100_000_000)
            dims.append(q)
        cent[lb] = dims
    c2 = {lb: sum(d * d for d in dims) for lb, dims in cent.items()}
    assign = {}
    for i in sorted(vecs):
        best = None
        for lb in sorted(cent):
            dot = sum(x * c for x, c in zip(fx[i], cent[lb]))
            margin = 2 * dot - c2[lb]
            key = (margin, -lb)
            if best is None or key > best[0]:
                best = (key, lb)
        assign[i] = best[1]
    tau = Fraction(Decimal(str(_SEM_TAU)))
    nbrs = defaultdict(list)
    for a in sorted(vecs):
        for b in sorted(vecs):
            if a < b and assign[a] == assign[b]:
                dot = sum(x * y for x, y in zip(fx[a], fx[b]))
                if dot >= tau:
                    nbrs[a].append((b, dot))
                    nbrs[b].append((a, dot))
    want = {}
    for v, ns in nbrs.items():
        keep = min(min(b for b, _ in ns), v)
        mx = max(d for _, d in ns)
        # round-6 HALF_UP of the exact dot
        mx6 = float(
            Decimal(mx.numerator) / Decimal(mx.denominator)
        )  # dot is exact at <= 20 dp; round like the engines
        mx6 = float(round(Decimal(mx.numerator) / Decimal(mx.denominator), 6))
        want[v] = (assign[v], keep, len(ns), mx6)
    got = {
        r.vec_id: (r.cluster, r.keep_id, r.n_near_dups, r.max_sim)
        for r in q_dedup_semantic(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert 1 in got and got[1][1] == 0  # the planted duplicate pair
