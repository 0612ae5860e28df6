"""Round-13 operators + fixes: semantic/plan checks beyond the driver hash.

q_dedup_semantic, q_text_bpe_train, q_text_decontaminate_external,
q_gov_forget_audit, the span-family broadcast fixes (VERDICT r12 #2),
the availableNow sink-name/parallelism fixes (ADVICE r12), and the
zorder strict-interior overlap fix (ADVICE r12).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE, SF_T2

import __spark_entry__ as spec

_Q = spec.queries()


# -------------------------------------------- q_dedup_semantic


def test_semantic_dedup_pairs_stay_in_cell(spark):
    """Every keep decision is cell-local: the vector and its keeper sit
    in the SAME kmeans cell (the whole point of the cluster-bounded
    plan), and the decision columns satisfy the keep-min contract."""
    from gpe.vectors import _kmeans_assignments

    rows = _Q["q_dedup_semantic"](spark, SF_SMOKE).collect()
    assert rows, "fixture must produce in-cell near-dups"
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cell = {
        r["vec_id"]: r["cluster"]
        for r in _kmeans_assignments(emb).collect()
    }
    for r in rows:
        assert cell[r.vec_id] == r.cluster
        assert cell[r.keep_id] == r.cluster  # keeper never crosses a cell
        assert r.keep_id <= r.vec_id or r.keep_id in cell
        assert r.n_near_dups >= 1
        assert r.max_sim >= 0.35 - 1e-9


def test_semantic_dedup_is_global_pairs_restricted_to_cells(spark):
    """Cross-check vs an independent global pair scan at the same τ:
    the semantic key's pair set == {global pairs whose two sides share
    a cell} — SemDeDup's documented recall trade, nothing more lost."""
    import duckdb

    from gpe.dedup import _SEM_TAU
    from gpe.vectors import _SQL_KMEANS_BEST

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    )
    want = con.execute(
        f"""
        WITH {_SQL_KMEANS_BEST},
        asg AS (SELECT vec_id, clabel AS cluster FROM best WHERE rn = 1),
        ex2 AS (SELECT e.vec_id, a.cluster, e.pos, e.x
                FROM ex e JOIN asg a ON e.vec_id = a.vec_id),
        pairs AS (
          SELECT p.vec_id AS id_a, q.vec_id AS id_b
          FROM ex2 p JOIN ex2 q
            ON p.cluster = q.cluster AND p.pos = q.pos
               AND p.vec_id < q.vec_id
          GROUP BY 1, 2
          HAVING SUM(CAST(p.x AS DECIMAL(12,10))
                     * CAST(q.x AS DECIMAL(12,10))) >= {_SEM_TAU})
        SELECT DISTINCT vec_id FROM (
          SELECT id_a AS vec_id FROM pairs
          UNION ALL SELECT id_b FROM pairs)
        """
    ).fetchall()
    got = sorted(
        r.vec_id for r in _Q["q_dedup_semantic"](spark, SF_SMOKE).collect()
    )
    assert got == sorted(v for (v,) in want)


def test_semantic_dedup_plan_is_cell_cogrouped(spark):
    """The candidate generator must be the cell-keyed cogroup (never a
    corpus-wide cartesian/self-join), with the cluster column in the
    cogroup partitioning."""
    df = _Q["q_dedup_semantic"](spark, SF_SMOKE)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in p
    assert "Cartesian" not in p
    assert "hashpartitioning(cluster" in p


# -------------------------------------------- q_text_bpe_train


def test_bpe_train_trajectory_chains(spark):
    rows = sorted(
        _Q["q_text_bpe_train"](spark, SF_SMOKE).collect(),
        key=lambda r: r.step,
    )
    assert [r.step for r in rows] == [1, 2, 3]
    for r in rows:
        assert r.n_merges == r.tokens_before - r.tokens_after
        assert r.n_merges > 0  # the fixture corpus always has a top pair
        assert r.pair_count >= r.n_merges  # overlaps can only reduce merges
    # the corpus EVOLVES: step i+1 starts from step i's output
    assert rows[1].tokens_before == rows[0].tokens_after
    assert rows[2].tokens_before == rows[1].tokens_after


def test_bpe_train_step1_equals_merge_step(spark):
    """Step 1 of the trainer is definitionally q_text_bpe_merge_step's
    corpus-wide rollup — same argmax pair, same merge count."""
    t = sorted(
        _Q["q_text_bpe_train"](spark, SF_SMOKE).collect(),
        key=lambda r: r.step,
    )[0]
    ms = _Q["q_text_bpe_merge_step"](spark, SF_SMOKE).collect()
    assert {(r.pair_a, r.pair_b, r.pair_count) for r in ms} == {
        (t.pair_a, t.pair_b, t.pair_count)
    }
    assert sum(r.n_merges for r in ms) == t.n_merges
    assert sum(r.n_tokens_before for r in ms) == t.tokens_before


# -------------------------------- q_text_decontaminate_external


def test_decontaminate_external_reports_corpus_only(spark):
    rows = _Q["q_text_decontaminate_external"](spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_corpus = docs.filter("doc_id % 10 <> 3").count()
    assert sum(r.n_docs for r in rows) == n_corpus
    for r in rows:
        assert 0 <= r.removable_tokens <= r.total_tokens
        assert r.n_affected_docs <= r.n_docs
        assert 0.0 <= r.removable_share <= 1.0


def test_decontaminate_external_cuts_corpus_side_of_cross_spans(spark):
    """The affected-doc population is exactly the corpus docs that share
    a >= 50-token span with a benchmark doc (keep-benchmark: the cut
    lands on the corpus side). Runs at sf0.01 — the driver's correctness
    SF — because the 150-doc smoke fixture has no cross-slice span mass
    (measured: 0 affected docs at sf0.001, 5 at sf0.01)."""
    from gpe.text import (
        _DECON_BENCH_MOD,
        _DECON_BENCH_SLOT,
        _extend_spans,
        _winnow_selected,
        _SUB_MIN_ANCHORS,
    )

    grams, sel = _winnow_selected(spark, SF_T2)
    is_bench = (
        F.pmod(F.col("doc_id"), F.lit(_DECON_BENCH_MOD))
        == _DECON_BENCH_SLOT
    )
    sa = sel.filter(~is_bench).select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "fp"
    )
    sb = sel.filter(is_bench).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "fp"
    )
    cand = (
        sa.join(sb, "fp")
        .groupBy("doc_a", "doc_b", (F.col("pa") - F.col("pb")).alias("diag"))
        .agg(F.countDistinct("pa").alias("n_anchors"))
        .filter(F.col("n_anchors") >= _SUB_MIN_ANCHORS)
        .select("doc_a", "doc_b", "diag")
    )
    spans = _extend_spans(
        grams.filter(~is_bench), grams.filter(is_bench), cand
    ).collect()
    assert spans, "fixture must produce cross-corpus spans"
    for s in spans:
        assert s.doc_a % 10 != 3  # corpus side
        assert s.doc_b % 10 == 3  # benchmark side
    n_affected = sum(
        r.n_affected_docs
        for r in _Q["q_text_decontaminate_external"](spark, SF_T2).collect()
    )
    assert n_affected == len({s.doc_a for s in spans})


# -------------------------------------------- q_gov_forget_audit


def test_forget_audit_counts_and_residuals(spark):
    rows = {r.table_name: r for r in _Q["q_gov_forget_audit"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    for r in rows.values():
        assert r.n_after == r.n_before - r.n_purged
        assert r.n_residual_refs == 0  # the invariant the audit certifies
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    batch = c.filter("c_custkey % 97 = 0").select("c_custkey")
    assert rows["customer"].n_purged == batch.count()
    del_orders = o.join(
        batch, o.o_custkey == batch.c_custkey, "semi"
    ).select("o_orderkey")
    assert rows["orders"].n_purged == del_orders.count()
    assert rows["lineitem"].n_purged == li.join(
        del_orders, li.l_orderkey == del_orders.o_orderkey, "semi"
    ).count()


# ------------------------------ span-family broadcast fixes (r12 #2)


def test_span_frame_broadcasts_blocklist_not_whitelist(spark):
    """The frequent-anchor cap must broadcast the BLOCKLIST (df > cap —
    bounded) via left_anti, never the open rare-fp whitelist, and the
    candidate-diagonal set must carry NO broadcast hint (AQE decides).
    Source-level: the span family's ONLY F.broadcast call site is the
    blocklist anti-join (the tree duplicates that subtree per anchor
    leg, so a textual plan-node count is not stable — the call-site
    count is). Plan-level: the anti-join executes as a broadcast."""
    import inspect

    from gpe import text as t

    sel_src = inspect.getsource(t._winnow_selected)
    assert sel_src.count("F.broadcast(") == 1
    assert '"left_anti"' in sel_src  # ... and it is the anti-join
    # neither the candidate builder nor the extension carries a hint
    assert "F.broadcast(" not in inspect.getsource(t._extend_spans)
    assert "F.broadcast(" not in inspect.getsource(t.q_text_substring_dedup)
    assert "F.broadcast(" not in inspect.getsource(
        t.q_text_decontaminate_external
    )
    df = _Q["q_text_substring_dedup"](spark, SF_SMOKE)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in p


# --------------------------------- availableNow fixes (ADVICE r12)


def test_sink_name_distinct_across_same_basename():
    from gpe.streaming import _sink_name

    a = _sink_name("gpe_stream_tumbling", "/root/testdata/sf0.001")
    b = _sink_name("gpe_stream_tumbling", "/tmp/other/sf0.001")
    assert a != b  # same basename, different dirs must not collide
    assert a == _sink_name("gpe_stream_tumbling", "/root/testdata/sf0.001/")


def test_available_now_state_tasks_follow_parallelism(spark):
    """The bounded-run override derives from the session's parallelism
    (VERDICT r12 #6), so a cluster session is never pinned to 32."""
    import inspect

    from gpe import streaming

    src = inspect.getsource(streaming._run_available_now)
    assert "defaultParallelism" in src
    assert '"32"' not in src


# ---------------------------------- zorder overlap fix (ADVICE r12)


def test_zorder_write_disjoint_under_writer_splits(spark):
    """With maxRecordsPerFile forcing each range partition to emit
    multiple files, files of one partition TOUCH at equal-zval
    boundaries; strict interior overlap must still report 0 (the layout
    still prunes whole files for interior range predicates)."""
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", None)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "40")
    try:
        rows = {
            r.strategy: r
            for r in _Q["q_lake_zorder_write"](spark, SF_SMOKE).collect()
        }
        assert rows["file_disjointness"].n_groups == 0
    finally:
        if old is None:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")
        else:
            spark.conf.set("spark.sql.files.maxRecordsPerFile", old)


# ----------------------- q_dedup_semantic_cells / sliding twin


def test_semantic_cells_consistent_with_keep_frame(spark):
    keep = _Q["q_dedup_semantic"](spark, SF_SMOKE).collect()
    cells = {r.cluster: r for r in _Q["q_dedup_semantic_cells"](spark, SF_SMOKE).collect()}
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assert sum(r.n_vecs for r in cells.values()) == emb.count()
    by_cell = {}
    for r in keep:
        by_cell.setdefault(r.cluster, []).append(r)
    for c, row in cells.items():
        mine = by_cell.get(c, [])
        assert row.n_dup_vecs == len(mine)
        assert row.n_removed == sum(1 for r in mine if r.keep_id != r.vec_id)
        assert row.n_pairs == sum(r.n_near_dups for r in mine) // 2
        assert 0.0 <= row.dup_share <= 1.0
    # zero-dup cells still emit (left join, never dropped)
    assert len(cells) >= len(by_cell)


def test_sliding_stream_twin_equals_batch(spark):
    got = sorted(
        map(tuple, _Q["q_stream_sliding_availablenow"](spark, SF_SMOKE).collect())
    )
    want = sorted(map(tuple, _Q["q_ts_sliding"](spark, SF_SMOKE).collect()))
    assert got == want and len(got) > 0
