"""Round-11 operators: attribute-filtered vector search and the
incremental dedup-delta batch job — semantic invariants and independent
Python references beyond the oracle hash (the house rule: every operator
gets a non-SQL reference), plus the plan-shape contracts VERDICT r10
#5/#6 named (predicate below the scoring join; broadcast MERGE legs)."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as spec

from tests.conftest import SF_SMOKE, SF_T2

_Q = spec.queries()


# ------------------------------------------------- q_vec_knn_filtered


def test_knn_filtered_respects_predicate_and_rank_contract(spark):
    emb = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF_T2}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    rows = _Q["q_vec_knn_filtered"](spark, SF_T2).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        assert emb[r.neighbor_id] % 2 == 0, "predicate violated"
        assert r.neighbor_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r)
    for qid, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1)), qid
        sims = [r.sim for r in rs]
        assert sims == sorted(sims, reverse=True), qid
        # the allowed corpus is large, so a pushed filter fills all of k;
        # a post-filtered unfiltered top-k would underfill
        assert len(rs) == 5, qid
    assert len(per_q) == 10  # every query answered


def test_knn_filtered_recall_vs_filtered_numpy_brute(spark):
    """Independent reference: exact filtered top-5 in numpy. With 2 of
    the 5 allowed cells probed, recall must clear the 0.4 probe floor
    (same argument as test_ann_ivf_recall_vs_brute's 0.2 over 10)."""
    import numpy as np

    pdf = (
        spark.read.parquet(f"{SF_T2}/embeddings.parquet")
        .select("vec_id", "label", "embedding")
        .toPandas()
    )
    mat = np.array(pdf["embedding"].tolist())
    ids = pdf["vec_id"].to_numpy()
    labs = pdf["label"].to_numpy()
    allowed = labs % 2 == 0
    brute = set()
    for qi in range(len(ids)):
        if ids[qi] >= 10:
            continue
        sims = mat[allowed] @ mat[qi]
        aid = ids[allowed]
        mask = aid != ids[qi]
        order = sorted(
            zip(-sims[mask], aid[mask]), key=lambda t: (t[0], t[1])
        )[:5]
        brute |= {(ids[qi], int(nid)) for _, nid in order}
    ann = {
        (r.query_id, r.neighbor_id)
        for r in _Q["q_vec_knn_filtered"](spark, SF_T2).collect()
    }
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.4, f"filtered recall@5 below probe floor: {recall}"


def _iter_logical(node):
    yield node
    for i in range(node.children().size()):
        yield from _iter_logical(node.children().apply(i))


def test_knn_filtered_predicate_sits_below_every_join(spark):
    """VERDICT r10 #5's Done criterion: the metadata predicate reaches
    the plan BELOW the scoring join (filtering the cell list and the
    corpus scan), never above one (post-filtering the top-k)."""
    plan = (
        _Q["q_vec_knn_filtered"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
    )
    pred_filters = [
        n
        for n in _iter_logical(plan)
        if n.getClass().getSimpleName() == "Filter"
        and "% 2" in n.condition().toString()
    ]
    assert pred_filters, "metadata predicate vanished from the plan"
    for f in pred_filters:
        joins_below = [
            c
            for c in _iter_logical(f)
            if c.getClass().getSimpleName() == "Join"
        ]
        assert not joins_below, (
            "predicate applied ABOVE a join — post-filtering: "
            + f.condition().toString()
        )
    phys = (
        _Q["q_vec_knn_filtered"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in phys
    assert "BroadcastExchange" in phys


# ----------------------------------------------------- q_dedup_delta


def _py_trigrams(text: str) -> set:
    toks = text.split(" ")
    return {
        f"{toks[i]}|{toks[i + 1]}|{toks[i + 2]}"
        for i in range(len(toks) - 2)
    }


def test_dedup_delta_matches_python_reference(spark):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    grams = {i: _py_trigrams(t) for i, t in docs.items()}
    new_ids = sorted(i for i in docs if i % 10 == 7)
    corp_ids = [i for i in docs if i % 10 != 7]
    want = {}
    for n in new_ids:
        matches = []
        for c in corp_ids:
            inter = len(grams[n] & grams[c])
            union = len(grams[n] | grams[c])
            if union and 2 * inter > union:
                matches.append((c, round(inter / union, 6)))
        if matches:
            want[n] = (
                "duplicate",
                min(c for c, _ in matches),
                max(j for _, j in matches),
                len(matches),
                0,
            )
        else:
            want[n] = ("accepted", None, None, 0, 32)
    got = {
        r.doc_id: (
            r.status,
            r.dup_of,
            r.best_jaccard,
            r.n_matches,
            r.idx_upserts,
        )
        for r in _Q["q_dedup_delta"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for n in new_ids:
        g, w = got[n], want[n]
        assert g[0] == w[0] and g[1] == w[1] and g[3] == w[3], (n, g, w)
        assert g[4] == w[4], (n, g, w)
        if w[2] is None:
            assert g[2] is None
        else:
            assert abs(g[2] - w[2]) < 2e-6, (n, g, w)
    # the fixture must exercise BOTH decision branches or the test is void
    statuses = {v[0] for v in got.values()}
    assert statuses == {"accepted", "duplicate"}


def test_dedup_delta_consistent_with_full_pair_set(spark):
    """Cross-operator consistency: a batch doc is a duplicate exactly
    when the FULL pair recompute (q_dedup_ngram_jaccard) links it to a
    standing-corpus doc — the incremental path loses nothing."""
    pairs = _Q["q_dedup_ngram_jaccard"](spark, SF_T2).collect()
    dup_new = set()
    for r in pairs:
        a_new, b_new = r.id_a % 10 == 7, r.id_b % 10 == 7
        if a_new and not b_new:
            dup_new.add(r.id_a)
        if b_new and not a_new:
            dup_new.add(r.id_b)
    got_dup = {
        r.doc_id
        for r in _Q["q_dedup_delta"](spark, SF_T2).collect()
        if r.status == "duplicate"
    }
    assert got_dup == dup_new


def test_dedup_delta_plan_shapes(spark):
    """Band probe join + broadcast MERGE legs: no cartesian product, the
    match table reaches the decision join as a broadcast, and the shared
    gram-set frame is persisted (one scan feeds banding and verify)."""
    spark.catalog.clearCache()
    phys = (
        _Q["q_dedup_delta"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in phys
    assert "BroadcastExchange" in phys
    assert "InMemoryTableScan" in phys


# ------------------------------------------------- q_pack_bestfit


def _py_pack(ns, best_fit: bool, cap: int = 512):
    """Independent Python reference for the no-spill folds: returns the
    final residual list for one shard."""
    resids: list[int] = []
    for n in ns:
        if best_fit:
            fits = [r for r in resids if r >= n]
            if fits:
                resids[resids.index(min(fits))] -= n
            else:
                resids.append(max(cap - n, 0))
        else:
            if resids and resids[-1] >= n:
                resids[-1] -= n
            else:
                resids.append(max(cap - n, 0))
    return resids


def test_pack_bestfit_matches_python_reference(spark):
    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    )
    shards: dict[int, list] = {}
    for r in docs:
        shards.setdefault(r.doc_id % 8, []).append((r.n, r.doc_id))
    p_bfd = w_bfd = p_nf = w_nf = toks = 0
    for items in shards.values():
        toks += sum(n for n, _ in items)
        desc = [n for n, d in sorted(items, key=lambda t: (-t[0], t[1]))]
        arr = [n for n, d in sorted(items, key=lambda t: t[1])]
        rb = _py_pack(desc, best_fit=True)
        rn = _py_pack(arr, best_fit=False)
        p_bfd += len(rb)
        w_bfd += sum(rb)
        p_nf += len(rn)
        w_nf += sum(rn)
    rows = {r.strategy: r for r in _Q["q_pack_bestfit"](spark, SF_SMOKE).collect()}
    b, n = rows["bestfit_decreasing"], rows["nextfit_arrival"]
    assert (b.n_packs, b.total_waste, b.total_tokens) == (p_bfd, w_bfd, toks)
    assert (n.n_packs, n.total_waste, n.total_tokens) == (p_nf, w_nf, toks)
    # waste bookkeeping closes: packs * capacity = tokens + waste (no
    # oversize docs at this SF), and BFD never loses to the stream pass
    assert b.n_packs * 512 == toks + b.total_waste
    assert n.n_packs * 512 == toks + n.total_waste
    assert b.total_waste <= n.total_waste
    assert b.utilization >= n.utilization


def test_pack_bestfit_plan_is_window_free_and_python_free(spark):
    """The folds are JVM higher-order functions: the physical plan must
    show no window operator, no Python/Arrow eval, and exactly one
    shuffle (the groupBy(shard) partial agg)."""
    phys = (
        _Q["q_pack_bestfit"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in phys
    assert "Python" not in phys and "ArrowEval" not in phys
    assert phys.count("Exchange hashpartitioning") <= 2  # shard agg (+final 1-row)
