"""Late-round-8 operator tests: crafted degenerate cases against the
REAL DuckDB oracles (the test_r8_ops pattern) plus the plan-shape claims
each new operator's docstring makes (the test_explain pattern)."""

from __future__ import annotations

import duckdb
import pandas as pd

import __spark_entry__ as spec

SF = "/root/testdata/sf0.01"
_Q = spec.queries()
_O = spec.oracle_sql()


def _oracle(d, key, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
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


# --------------------------------------------------------------- repetition


def test_repetition_is_shuffle_free(spark):
    """q_text_repetition claims an ENTIRELY map-side plan — no Exchange
    of any kind (the filter must scale with the parquet scan alone)."""
    df = _Q["q_text_repetition"](spark, SF)
    df.collect()
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys


def test_repetition_degenerate_docs_cross_engine(spark, tmp_path):
    """The fixture's docs are 10-99 tokens, so the n<2 / n<3 gram guards
    (Spark sequence(0,-1) DESCENDS rather than returning empty) and the
    fully-repetitive extreme are pinned on crafted docs vs the oracle."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "solo",  # 1 token: no grams -> NULL ratios, ttr=1
                "a a",  # 1 bigram, 0 trigrams -> dup2=0, dup3 NULL
                "a a a a a a",  # fully repetitive: dup2=4/5, dup3=3/4
                "w x y z",  # all distinct: every ratio 0, ttr=1
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [4, 3, 11, 7],
        }
    )
    d = tmp_path / "rep"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in _Q["q_text_repetition"](spark, str(d)).collect()}
    assert (got[0].dup2_ratio, got[0].dup3_ratio, got[0].ttr) == (None, None, 1.0)
    assert got[1].dup2_ratio == 0.0 and got[1].dup3_ratio is None
    assert got[2].dup2_ratio == 0.8 and got[2].dup3_ratio == 0.75
    assert got[2].is_repetitive and not got[3].is_repetitive
    assert _rows(_Q["q_text_repetition"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_text_repetition", ["documents"])
    )


# ------------------------------------------------------------ market basket


def test_market_basket_dim_broadcasts_and_lift_math(spark, tmp_path):
    """part must broadcast (it's the dimension side), and the support /
    lift arithmetic is pinned on a 3-order crafted basket where the
    independence expectation is computable by hand."""
    df = _Q["q_agg_market_basket"](spark, SF)
    df.collect()
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys

    # orders 1..3; brands: A in all 3, B in {1,2}, C in {1} only
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 3, 1],
            "l_partkey": [10, 20, 30, 10, 20, 10, 10],
        }
    )
    part = pd.DataFrame(
        {"p_partkey": [10, 20, 30], "p_brand": ["A", "B", "C"]}
    )
    d = tmp_path / "mb"
    d.mkdir()
    li.to_parquet(str(d / "lineitem.parquet"))
    part.to_parquet(str(d / "part.parquet"))
    got = {
        (r.brand_a, r.brand_b): r
        for r in _Q["q_agg_market_basket"](spark, str(d)).collect()
    }
    # (A,B): co=2, n_A=3, n_B=2, total=3 -> support 2/3, lift 2*3/(3*2)=1
    ab = got[("A", "B")]
    assert (ab.n_co_orders, ab.n_a, ab.n_b) == (2, 3, 2)
    assert ab.support == 0.666666 and ab.lift == 1.0
    # (B,C): co=1, n_B=2, n_C=1 -> lift 3/2 (perfectly dependent pair)
    assert got[("B", "C")].lift == 1.5
    assert _rows(_Q["q_agg_market_basket"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_agg_market_basket", ["lineitem", "part"])
    )


# ------------------------------------------------------------ snapshot diff


def test_snapshot_diff_classification_edges_cross_engine(spark, tmp_path):
    """Crafted keys hit every diff class INCLUDING the double-filter
    overlap the fixture can't reach: 6502 is the CRT solution of
    (k%97==3, k%89==5) — dropped from BOTH snapshots, so it must appear
    in NEITHER era nor the diff. 110 is %10==0 (and coprime to both
    filters) -> changed (+1.00); 97*2+3=197 -> added; 89+5=94 ->
    removed; 7 -> unchanged. (100 would NOT work: 100%97==3 makes it
    added, not changed — the filters interact.)"""
    orders = pd.DataFrame(
        {
            "o_orderkey": [6502, 110, 197, 94, 7],
            "o_custkey": [1] * 5,
            "o_orderstatus": ["O"] * 5,
            "o_totalprice": [10.0, 20.5, 30.25, 40.0, 50.75],
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 5).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    )
    d = tmp_path / "snap"
    d.mkdir()
    orders.to_parquet(str(d / "orders.parquet"))
    out = _Q["q_lake_snapshot_diff"](spark, str(d)).collect()
    got = {(r.change_type, r.status): r for r in out}
    assert got[("changed", "O")].n_rows == 1
    assert float(got[("changed", "O")].price_delta) == 1.0
    assert got[("added", "O")].min_key == 197
    assert got[("removed", "O")].max_key == 94
    assert got[("unchanged", "O")].n_rows == 1
    # 6502 is in neither snapshot: total classified rows == 4
    assert sum(r.n_rows for r in out) == 4
    assert _rows(_Q["q_lake_snapshot_diff"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_lake_snapshot_diff", ["orders"])
    )


# ----------------------------------------------------------------- pagerank


def test_pagerank_triangle_and_isolated_doc_cross_engine(spark, tmp_path):
    """Crafted corpus: docs 1/2 share a token SET (Jaccard 1), doc 3
    overlaps both at 19/21 = 0.904 > 0.9 -> a triangle; doc 4 is
    disjoint -> not in the graph at all. On a symmetric triangle every
    node has deg 2 and the uniform distribution is the fixpoint, so all
    ranks equal floor-of-1/3 at every iteration."""
    shared = " ".join(f"t{i}" for i in range(19))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                shared + " t19",
                shared + " t19",
                shared + " t20",
                "zz yy xx",
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [1] * 4,
        }
    )
    d = tmp_path / "pr"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in _Q["q_graph_pagerank"](spark, str(d)).collect()}
    assert set(got) == {1, 2, 3}  # doc 4 has no edges
    assert all(r.deg == 2 for r in got.values())
    ranks = {r.rank_e12 for r in got.values()}
    assert len(ranks) == 1  # uniform fixpoint
    assert abs(ranks.pop() - 333333333333) <= 3  # 1/3 modulo DIV floors
    assert _rows(_Q["q_graph_pagerank"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_graph_pagerank", ["documents"])
    )


def test_pagerank_mass_conserved_on_fixture(spark):
    """Total rank mass stays ~1: every arithmetic step only FLOORS, so
    the scaled sum must sit just under 1e12 and never exceed it."""
    rows = _Q["q_graph_pagerank"](spark, SF).collect()
    total = sum(r.rank_e12 for r in rows)
    assert total <= 1_000_000_000_000
    assert total >= 990_000_000_000


# ---------------------------------------------------------------- bpe merge


def test_bpe_merge_runs_and_ties_cross_engine(spark, tmp_path):
    """The overlap case the fixture never forces: the winning pair is
    (a,a) and docs carry odd/even runs of 'a', so left-to-right
    non-overlapping application must merge ceil(k/2) per run — pinning
    the fold (engine) against the gaps-and-islands formula (oracle).
    Pair counts: 'a a' appears 3+2 = 5 times (overlaps included),
    beating 'b c' (2) and the tie is never reached; doc 3 checks that
    a doc without the winning pair merges zero times."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a a a a x b c",  # run of 3 matches -> 2 merges
                "a a a b c",  # run of 2 matches -> 1 merge
                "b c d",  # no winning pair -> 0 merges
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [1] * 3,
        }
    )
    d = tmp_path / "bpe"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    got = {
        r.doc_id: r
        for r in _Q["q_text_bpe_merge_step"](spark, str(d)).collect()
    }
    assert (got[1].pair_a, got[1].pair_b, got[1].pair_count) == ("a", "a", 5)
    assert (got[1].n_merges, got[1].n_tokens_after) == (2, 5)
    assert (got[2].n_merges, got[2].n_tokens_after) == (1, 4)
    assert (got[3].n_merges, got[3].n_tokens_after) == (0, 3)
    assert _rows(_Q["q_text_bpe_merge_step"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_text_bpe_merge_step", ["documents"])
    )


def test_bpe_merge_argmax_tiebreak_is_lexicographic(spark, tmp_path):
    """Equal counts -> the lexicographically smallest pair must win in
    BOTH engines (the total order that makes the key deterministic)."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["z y x w z y x w"],  # zy/yx/xw twice each, wz once
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [1],
        }
    )
    d = tmp_path / "bpetie"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    row = _Q["q_text_bpe_merge_step"](spark, str(d)).collect()[0]
    assert (row.pair_a, row.pair_b) == ("x", "w")
    assert _rows(_Q["q_text_bpe_merge_step"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_text_bpe_merge_step", ["documents"])
    )


# -------------------------------------------------------------- bm25 search


def test_bm25_plan_is_scan_shaped_topk(spark):
    """The search endpoint claims the cheapest distributed plan: top-k
    compiles to TakeOrderedAndProject (per-partition heaps, never a
    global sort) and the tf computation never explodes tokens."""
    df = _Q["q_text_bm25_search"](spark, SF)
    df.collect()
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys
    assert "Generate explode" not in phys


def test_bm25_zero_df_and_saturation_cross_engine(spark, tmp_path):
    """Crafted corpus: 'spark' never occurs (df=0 exercises the idf
    guard — ln((2N+2)/1) stays finite), 'table' occurs everywhere
    (minimal idf), 'query' is rare and repeated (tf saturation). The
    rare-term doc must outrank the common-term docs."""
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "query query query table pad",
                "table pad pad pad pad",
                "table table pad pad pad",
                "pad pad pad pad pad",
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [1] * 4,
        }
    )
    d = tmp_path / "bm25"
    d.mkdir()
    pdf.to_parquet(str(d / "documents.parquet"))
    rows = _Q["q_text_bm25_search"](spark, str(d)).collect()
    assert rows[0].doc_id == 1 and rows[0].tf_query == 3
    assert all(r.tf_spark == 0 for r in rows)  # absent term scores 0
    assert rows[-1].score_e6 == 0  # the pad-only doc matches nothing
    assert _rows(_Q["q_text_bm25_search"](spark, str(d))) == _pdf_rows(
        _oracle(d, "q_text_bm25_search", ["documents"])
    )
