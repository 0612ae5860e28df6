"""Round-10 operator tests: semantic invariants the oracle-parity hash
cannot articulate — BPE-table disjointness and count conservation, the
PII screen's per-source flag structure and redaction grammar, and a
direct single-window recompute of the cluster-balanced sampler's
two-stage quota cut."""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as spec

from tests.conftest import SF_SMOKE

_Q = spec.queries()
_O = spec.oracle_sql()


# ---------------------------------------------------------------- BPE encode


def test_bpe_encode_counts_conserve_and_table_is_bounded(spark):
    rows = _Q["q_text_bpe_encode"](spark, SF_SMOKE).collect()
    assert len(rows) == 500  # one row per document, clean docs included
    n_rules = {r.n_merge_rules for r in rows}
    assert len(n_rules) == 1  # corpus-level table: same for every doc
    assert 1 <= n_rules.pop() <= 20
    for r in rows:
        assert r.n_tokens_bpe + r.n_merges == r.n_tokens_ws
        assert 0 <= r.n_merges < r.n_tokens_ws
        assert 0.0 < r.compression <= 1.0
    # the table bites: a corpus of repeated word soup must merge somewhere
    assert sum(r.n_merges for r in rows) > 0


def test_bpe_encode_table_is_token_disjoint(spark):
    """Recompute the kept merge table the way the builder does and assert
    the property the whole design rests on: no token appears in two
    rules (which is what makes application order-free)."""
    from gpe.io import load_table
    from gpe.text import _BPE_CAND, _BPE_TABLE

    d = load_table(spark, SF_SMOKE, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    prs = d.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks)-2),"
                " i -> struct(toks[i] AS a, toks[i+1] AS b))"
            )
        ).alias("p")
    )
    cnt = (
        prs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cand = sorted(cnt, key=lambda r: (-r.c, r.a, r.b))[:_BPE_CAND]
    seen_tokens: set[str] = set()
    kept = []
    for r in cand:
        # builder rule: conflict vs ALL higher-ranked CANDIDATES
        if {r.a, r.b} & seen_tokens:
            seen_tokens |= {r.a, r.b}
            continue
        kept.append((r.a, r.b))
        seen_tokens |= {r.a, r.b}
        if len(kept) == _BPE_TABLE:
            break
    # a == b within one rule is the only allowed repeat
    flat = [t for a, b in kept for t in ({a} if a == b else {a, b})]
    assert len(flat) == len(set(flat))
    # and the declared rule count matches the builder's output
    got = _Q["q_text_bpe_encode"](spark, SF_SMOKE).limit(1).collect()[0]
    assert got.n_merge_rules == len(kept)


def test_bpe_encode_fold_matches_python_reference(spark):
    """Greedy L2R fold on a handful of real docs, re-run in plain Python
    against the same merge table — the fold semantics pinned outside
    both engines."""
    from gpe.io import load_table

    out = {
        r.doc_id: r
        for r in _Q["q_text_bpe_encode"](spark, SF_SMOKE)
        .filter(F.col("doc_id") < 25)
        .collect()
    }
    # rebuild the table from the builder's own n_merge_rules path: apply
    # the encoder to one doc and invert is circular, so instead derive
    # the table exactly as the previous test does
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id") < 25)
        .select("doc_id", "text")
        .collect()
    )
    from gpe.text import _BPE_CAND, _BPE_TABLE

    d = load_table(spark, SF_SMOKE, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    prs = d.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks)-2),"
                " i -> struct(toks[i] AS a, toks[i+1] AS b))"
            )
        ).alias("p")
    )
    cnt = (
        prs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cand = sorted(cnt, key=lambda r: (-r.c, r.a, r.b))[:_BPE_CAND]
    seen: set[str] = set()
    table: set[tuple[str, str]] = set()
    for r in cand:
        if not ({r.a, r.b} & seen) and len(table) < _BPE_TABLE:
            table.add((r.a, r.b))
        seen |= {r.a, r.b}
    for doc in docs:
        toks = doc.text.split(" ")
        acc: list[str] = []
        for t in toks:
            if acc and (acc[-1], t) in table:
                acc[-1] = acc[-1] + "_" + t
            else:
                acc.append(t)
        r = out[doc.doc_id]
        assert r.n_tokens_ws == len(toks)
        assert r.n_tokens_bpe == len(acc), doc.doc_id
        assert r.n_merges == len(toks) - len(acc)


# ---------------------------------------------------------------- PII screen


def test_pii_screen_per_source_structure(spark):
    rows = {r.source: r for r in _Q["q_text_pii_screen"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"documents", "customer", "events"}
    # documents are digit-free word soup; events props are {"k": 0..99}
    # (too short for any class) — both sources must come back clean
    for clean in ("documents", "events"):
        r = rows[clean]
        assert r.n_flagged == 0
        assert r.hits_handle == r.hits_id == r.hits_money == 0
        assert r.sample_redacted is None
    # every customer row carries a Customer#<9 digits> handle (which is
    # also a long-id hit) and a 2-decimal balance
    c = rows["customer"]
    assert c.n_flagged == c.n_rows > 0
    assert c.hits_handle == c.n_rows
    assert c.hits_id == c.n_rows
    assert c.hits_money == c.n_rows
    # redaction grammar: handle consumed first, then money
    assert c.sample_redacted.startswith("<HANDLE> ")
    assert "<NUM>" in c.sample_redacted
    assert not any(ch.isdigit() for ch in c.sample_redacted)


def test_pii_screen_sample_is_lowest_key(spark):
    c = [
        r
        for r in _Q["q_text_pii_screen"](spark, SF_SMOKE).collect()
        if r.source == "customer"
    ][0]
    from gpe.io import load_table

    first = (
        load_table(spark, SF_SMOKE, "customer")
        .orderBy("c_custkey")
        .limit(1)
        .collect()[0]
    )
    assert c.sample_redacted == (
        f"<HANDLE> {first.c_mktsegment} <NUM>"
    )


# ------------------------------------------------- cluster-balanced sampling


def test_cluster_balanced_quota_and_two_stage_cut(spark):
    from gpe.io import load_table
    from gpe.vectors import _CB_QUOTA, _kmeans_assignments

    out = _Q["q_sample_cluster_balanced"](spark, SF_SMOKE).collect()
    per_cluster: dict[int, list] = {}
    for r in out:
        per_cluster.setdefault(r.cluster, []).append(r)
    a = _kmeans_assignments(load_table(spark, SF_SMOKE, "embeddings"))
    sizes = {r.cluster: r.n for r in a.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per_cluster) == set(sizes)  # every cluster represented
    for cl, rows in per_cluster.items():
        assert len(rows) == min(_CB_QUOTA, sizes[cl])
        assert sorted(r.draw_rank for r in rows) == list(
            range(1, len(rows) + 1)
        )
        assert all(r.cluster_n == sizes[cl] for r in rows)
    # the salted two-stage cut must equal the direct single-window cut
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("cb:"), F.col("vec_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("cluster").orderBy("h32", "vec_id")
    direct = (
        a.withColumn("h32", h32)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CB_QUOTA)
        .collect()
    )
    assert sorted((r.cluster, r.rk, r.vec_id) for r in direct) == sorted(
        (r.cluster, r.draw_rank, r.vec_id) for r in out
    )


def test_cluster_balanced_draw_key_is_the_md5_recipe(spark):
    out = _Q["q_sample_cluster_balanced"](spark, SF_SMOKE).collect()
    for r in out[:20]:
        expect = int(
            hashlib.md5(f"cb:{r.vec_id}".encode()).hexdigest()[:8], 16
        )
        assert r.h32 == expect


# ----------------------------------------------------- matryoshka recall


def test_matryoshka_recall_matches_numpy_reference(spark):
    """Recompute both prefix recalls in numpy float64 from the raw
    embeddings (fixture dots are well-separated, so float64 ranking ==
    exact-decimal ranking) — pins the semantics outside both engines."""
    import numpy as np

    from gpe.io import load_table

    emb = sorted(
        load_table(spark, SF_SMOKE, "embeddings").collect(),
        key=lambda r: r.vec_id,
    )
    ids = np.array([r.vec_id for r in emb])
    mat = np.array([list(r.embedding) for r in emb], dtype=np.float64)

    def topk(qrow, dims):
        dots = mat[:, :dims] @ mat[qrow, :dims]
        order = sorted(
            (i for i in range(len(ids)) if i != qrow),
            key=lambda i: (-dots[i], ids[i]),
        )
        return {int(ids[i]) for i in order[:5]}

    got = {
        (r.prefix_dim, r.query_id): (r.n_hits, r.recall)
        for r in _Q["q_vec_matryoshka_recall"](spark, SF_SMOKE).collect()
    }
    assert len(got) == 20
    for qrow in range(10):
        full = topk(qrow, 64)
        for d in (16, 32):
            hits = len(topk(qrow, d) & full)
            n_hits, recall = got[(d, int(ids[qrow]))]
            assert n_hits == hits, (d, qrow)
            assert recall == hits / 5.0


# ------------------------------------------------------------- zipf fit


def test_zipf_fit_matches_python_ols(spark):
    import math
    from collections import Counter

    from gpe.io import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        cnt.update(r.text.split(" "))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    xs = [
        math.floor(math.log(rk + 1) * 1_000_000 + 1e-9)
        for rk in range(len(top))
    ]
    ys = [math.floor(math.log(c) * 1_000_000 + 1e-9) for _, c in top]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    dx, dy, dxy = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy
    slope = dxy / dx
    intercept = (sy - slope * sx) / n / 1_000_000.0
    r2 = (dxy * dxy) / (dx * dy)
    row = _Q["q_text_zipf_fit"](spark, SF_SMOKE).collect()[0]
    assert row.n_terms == n
    assert abs(row.zipf_slope - slope) < 2e-6
    assert abs(row.ln_intercept - intercept) < 2e-6
    assert abs(row.r2 - r2) < 2e-6
    # natural-language-soup fixture: decreasing head, negative slope
    assert row.zipf_slope < 0 and 0 < row.r2 <= 1


# ---------------------------------------------------------- winsorized


def test_winsorized_matches_python_reference(spark):
    from gpe.io import load_table

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    by_grp: dict[str, list[int]] = {}
    for r in orders:
        cents = int(round(r.o_totalprice * 100))
        by_grp.setdefault(r.o_orderpriority, []).append(cents)
    got = {
        r.priority: r
        for r in _Q["q_agg_winsorized"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(by_grp)
    for grp, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        klo, khi = -(-n * 1 // 20), -(-n * 19 // 20)  # ceil(q*n)
        p05, p95 = vals[klo - 1], vals[khi - 1]
        r = got[grp]
        assert r.n_orders == n
        assert r.p05 == p05 / 100.0 and r.p95 == p95 / 100.0
        wins = [min(max(v, p05), p95) for v in vals]
        trim = [v for v in vals if p05 <= v <= p95]
        assert r.mean_winsor == (sum(wins) * 10000 // n) / 1_000_000.0
        assert r.mean_trimmed == (
            sum(trim) * 10000 // len(trim)
        ) / 1_000_000.0
        assert r.n_kept == len(trim)


# ------------------------------------------------------------ phash


def test_phash_matches_python_reference(spark):
    """Recompute signatures, banded candidates, and Hamming verify in
    plain Python over the raw texts — the full operator pinned outside
    both engines."""
    from gpe.io import load_table
    from gpe.multimodal import (
        _PHASH_MAX_HAMMING,
        _PHASH_MIN_BYTES,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text"
    ).collect()
    sigs = {}
    for r in docs:
        b = r.text.encode()
        n = len(b)
        if n < _PHASH_MIN_BYTES:
            continue
        tot = sum(b)
        ss, sl = [0] * 64, [0] * 64
        for p, bv in enumerate(b):
            i = p * 64 // n
            ss[i] += bv
            sl[i] += 1
        bits = [1 if ss[i] * n > tot * sl[i] else 0 for i in range(64)]
        bands = []
        for j in range(4):
            v = 0
            for k in range(16):
                v = v * 2 + bits[j * 16 + k]
            bands.append(v)
        sigs[r.doc_id] = bands
    ids = sorted(sigs)
    want = []
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if not any(sigs[a][j] == sigs[b][j] for j in range(4)):
                continue
            h = sum(
                bin(sigs[a][j] ^ sigs[b][j]).count("1") for j in range(4)
            )
            if h <= _PHASH_MAX_HAMMING:
                want.append((a, b, h))
    got = sorted(
        (r.media_a, r.media_b, r.hamming)
        for r in _Q["q_multimodal_phash"](spark, SF_SMOKE).collect()
    )
    assert got == sorted(want) and len(got) > 0


# ------------------------------------------------------- catalog r10


def test_pk_infer_verdicts(spark):
    rows = {r.key_cols: r for r in _Q["q_catalog_pk_infer"](spark, SF_SMOKE).collect()}
    assert len(rows) == 11
    # real keys are unique; BOTH lineitem candidates are non-unique on
    # this lake (the compound fails too — the generator emits true
    # duplicate lines), which is the discovery the audit surfaces
    assert rows["orders(o_orderkey)"].is_unique
    assert not rows["lineitem(l_orderkey)"].is_unique
    assert rows["lineitem(l_orderkey)"].dup_rows > 0
    assert not rows["lineitem(l_orderkey, l_linenumber)"].is_unique
    # the compound still resolves most of the duplication
    assert (
        rows["lineitem(l_orderkey, l_linenumber)"].n_distinct
        > rows["lineitem(l_orderkey)"].n_distinct
    )
    for k, r in rows.items():
        assert r.n_rows - r.n_distinct == r.dup_rows
        assert r.is_unique == (r.dup_rows == 0)


def test_freshness_spans_are_consistent(spark):
    for r in _Q["q_catalog_freshness"](spark, SF_SMOKE).collect():
        assert r.n_rows > 0 and r.min_ts <= r.max_ts
        assert r.span_days >= 1
        assert r.rows_per_day_e6 == r.n_rows * 1_000_000 // r.span_days


def test_bpe_encode_equal_token_runs_cross_engine(spark, tmp_path):
    """The a==b rule path (greedy floor(run/2) merges vs the oracle's
    per-island (k+1) DIV 2) is never exercised by the fixture corpus
    (its kept table has no repeated-token rule) — pin it on crafted
    data against the REAL DuckDB oracle, plus the python greedy fold."""
    import duckdb
    import pandas as pd

    texts = [
        "a a a a a",          # 4 matches, one island -> 2 merges
        "x a a a y a a a a",  # islands of 2 and 3 matches -> 1 + 2
        "a b a a b a",        # run split by b's -> single-match islands
        "q w e r t",          # no matches at all
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["crafted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path / "bpe_runs"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    rows = {
        r.doc_id: r for r in _Q["q_text_bpe_encode"](spark, str(d)).collect()
    }
    # ('a','a') dominates the pair counts, so it must be rule #1 and the
    # greedy fold must take floor(run_len/2) merges per run of a's
    assert rows[0].n_merges == 2 and rows[0].n_tokens_bpe == 3
    assert rows[1].n_merges == 1 + 2
    # doc 3's once-seen disjoint pairs ((q,w), (e,r)) are legitimately
    # kept as rules too — its exact count comes from the replica below
    # python greedy-fold replica over whatever table was kept
    from gpe.text import _BPE_CAND, _BPE_TABLE

    from collections import Counter

    cnt = Counter()
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - 1):
            cnt[(toks[i], toks[i + 1])] += 1
    cand = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_CAND]
    seen: set[str] = set()
    table: set[tuple[str, str]] = set()
    for (a, b), _ in cand:
        if not ({a, b} & seen) and len(table) < _BPE_TABLE:
            table.add((a, b))
        seen |= {a, b}
    assert ("a", "a") in table
    for doc_id, t in enumerate(texts):
        acc: list[str] = []
        for tok in t.split(" "):
            if acc and (acc[-1], tok) in table:
                acc[-1] = acc[-1] + "_" + tok
            else:
                acc.append(tok)
        assert rows[doc_id].n_tokens_bpe == len(acc), doc_id
    # and the REAL oracle agrees cell-for-cell
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    oracle = con.execute(_O["q_text_bpe_encode"]).fetch_df()
    con.close()
    got = sorted(
        tuple(r)
        for r in _Q["q_text_bpe_encode"](spark, str(d)).collect()
    )
    import pandas as _pd

    want = sorted(
        tuple(None if _pd.isna(v) else v for v in t)
        for t in oracle.itertuples(index=False, name=None)
    )
    assert got == want


def test_phash_identical_payloads_are_hamming_zero(spark, tmp_path):
    """Two byte-identical payloads must surface as a candidate pair with
    Hamming 0 — the exact-dup floor of the near-dup detector — and the
    real oracle must agree."""
    import duckdb
    import pandas as pd

    base = ("the quick brown fox jumps over the lazy dog " * 3).strip()
    other = ("zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr " * 3).strip()
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [base, base, other],
            "lang": ["en"] * 3,
            "source": ["crafted"] * 3,
            "n_chars": [len(base), len(base), len(other)],
        }
    )
    d = tmp_path / "phash_dup"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = sorted(
        (r.media_a, r.media_b, r.hamming)
        for r in _Q["q_multimodal_phash"](spark, str(d)).collect()
    )
    assert (0, 1, 0) in got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    want = sorted(
        tuple(t)
        for t in con.execute(_O["q_multimodal_phash"])
        .fetch_df()
        .itertuples(index=False, name=None)
    )
    con.close()
    assert got == want
