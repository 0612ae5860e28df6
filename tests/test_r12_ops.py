"""Round-12 operators: semantic + plan checks beyond the driver hash.

q_vec_index_delta, q_text_substring_dedup, q_lake_zorder_write,
q_stream_tumbling_availablenow, q_ml_quality_fit.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE

import __spark_entry__ as spec

_Q = spec.queries()


# -------------------------------------------- q_vec_index_delta


def test_index_delta_cell_stats_partition_the_corpus(spark):
    rows = _Q["q_vec_index_delta"](spark, SF_SMOKE).collect()
    cells = [r for r in rows if r.section == "cell_delta"]
    serves = [r for r in rows if r.section == "serve"]
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n_batch = emb.filter("vec_id % 10 = 7").count()
    n_standing = emb.filter("vec_id % 10 <> 7").count()
    assert len(cells) == 10  # one row per standing IVF cell
    assert sum(r.n_new for r in cells) == n_batch
    assert sum(r.n_standing for r in cells) == n_standing
    # serve: the 10 probe queries (batch vec_ids 7..97), exactly top-5 each
    qids = sorted({r.query_id for r in serves})
    assert qids == [7, 17, 27, 37, 47, 57, 67, 77, 87, 97]
    for qid in qids:
        mine = sorted(
            (r for r in serves if r.query_id == qid), key=lambda r: r.rank
        )
        assert [r.rank for r in mine] == [1, 2, 3, 4, 5]
        # neighbors are served FROM the standing index, never the batch
        assert all(r.neighbor_id % 10 != 7 for r in mine)
        sims = [r.sim for r in mine]
        assert sims == sorted(sims, reverse=True)


def test_index_delta_plan_probes_not_rescans(spark):
    """The index side must never be re-scanned beyond the probe: batch
    assignment folds against the BROADCAST codebook (no window over the
    batch, no sort-merge join against embeddings), and every window is
    query_id-partitioned with the group-limit pushdown."""
    df = _Q["q_vec_index_delta"](spark, SF_SMOKE)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in p
    assert p.count("BroadcastHashJoin") >= 3  # codebook x2 + probe shortlist
    # the single SMJ is the 10x10 cell-stats join, never an embeddings scan
    assert p.count("SortMergeJoin") <= 1
    if "SortMergeJoin" in p:
        smj_line = next(l for l in p.splitlines() if "SortMergeJoin" in l)
        assert "cell" in smj_line
    # every window partitions by query_id (probe pick / rerank, bounded)
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "query_id" in line
    assert "WindowGroupLimit" in p  # top-k pushed below the full sort


# -------------------------------------------- q_text_substring_dedup


def _span_reference(sf_dir: str, min_len: int, skip_occ: int):
    """Independent pure-Python reference: maximal aligned token runs from
    RAW tokens (no hashing, no winnowing) — grams whose corpus occurrence
    exceeds skip_occ are skipped as SEEDS only, mirroring the operator's
    anchor cap (extension there walks all grams, so precision is exact
    either way; the cap is the shared recall knob)."""
    import itertools
    from collections import defaultdict

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    toks = {i: t.split(" ") for i, t in docs}
    occ = defaultdict(list)
    for i, tk in toks.items():
        for p in range(len(tk) - 2):
            occ[tuple(tk[p : p + 3])].append((i, p))
    diag_hits = defaultdict(set)
    for gram, hits in occ.items():
        if len(hits) > skip_occ:
            continue
        for (a, pa), (b, pb) in itertools.combinations(hits, 2):
            if a == b:
                continue
            if a > b:
                a, b, pa, pb = b, a, pb, pa
            diag_hits[(a, b, pa - pb)].add(pa)
    out = set()
    for (a, b, dg), ps in diag_hits.items():
        ps = sorted(ps)
        s = e = ps[0]
        for x in ps[1:] + [None]:
            if x == e + 1:
                e = x
                continue
            # verify the run token-for-token and extend maximally (seeds
            # can under-cover: walk outward over raw tokens)
            ta, tb = toks[a], toks[b]
            lo, hi = s, e + 2
            while lo > 0 and lo - dg > 0 and ta[lo - 1] == tb[lo - dg - 1]:
                lo -= 1
            while (
                hi + 1 < len(ta)
                and hi - dg + 1 < len(tb)
                and ta[hi + 1] == tb[hi - dg + 1]
            ):
                hi += 1
            if hi - lo + 1 >= min_len:
                out.add((a, b, lo, lo - dg, hi - lo + 1))
            if x is None:
                break
            s = e = x
    return out


def test_substring_spans_match_pure_python_reference(spark):
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.len)
        for r in _Q["q_text_substring_dedup"](spark, SF_SMOKE).collect()
    }
    want = _span_reference(SF_SMOKE, 50, 200)
    assert got == want
    assert len(got) >= 10  # the fixture carries real >=50-token overlaps


def test_substring_spans_are_exact_and_maximal(spark):
    """Every emitted span matches token-for-token and cannot be extended
    on either side — the precision/maximality guarantee the docstring
    claims independent of any seeding."""
    import duckdb

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
        ).fetchall()
    )
    rows = _Q["q_text_substring_dedup"](spark, SF_SMOKE).collect()
    for r in rows:
        ta = docs[r.doc_a].split(" ")
        tb = docs[r.doc_b].split(" ")
        sa, sb, ln = int(r.start_a), int(r.start_b), int(r.len)
        assert ta[sa : sa + ln] == tb[sb : sb + ln]
        left_ext = sa > 0 and sb > 0 and ta[sa - 1] == tb[sb - 1]
        right_ext = (
            sa + ln < len(ta)
            and sb + ln < len(tb)
            and ta[sa + ln] == tb[sb + ln]
        )
        assert not left_ext and not right_ext


# -------------------------------------------- q_lake_zorder_write


def test_zorder_write_achieves_predicted_layout(spark):
    got = {
        r.strategy: r for r in _Q["q_lake_zorder_write"](spark, SF_SMOKE).collect()
    }
    pred = {
        r.strategy: r for r in _Q["q_lake_zorder"](spark, SF_SMOKE).collect()
    }
    zw, zp = got["zorder_written"], pred["zorder"]
    assert (zw.n_groups, zw.n_rows) == (zp.n_buckets, zp.n_rows)
    assert (zw.avg_span_a, zw.avg_span_b, zw.avg_area_e6) == (
        zp.avg_span_a,
        zp.avg_span_b,
        zp.avg_area_e6,
    )
    fd = got["file_disjointness"]
    assert fd.n_groups == 0  # range-partitioned files never overlap in zval
    assert fd.n_rows == zw.n_rows


# -------------------------------------------- q_stream_tumbling_availablenow


def test_stream_availablenow_equals_batch_twin(spark):
    from gpe import timeseries

    cols = ["bucket_start", "n_events", "sum_value"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in _Q["q_stream_tumbling_availablenow"](spark, SF_SMOKE).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in timeseries.q_ts_tumbling(spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0


# -------------------------------------------- q_ml_quality_fit


def test_quality_fit_solves_the_normal_equations(spark):
    import numpy as np

    from gpe.text import quality_exprs
    from gpe.io import load_table

    d = load_table(spark, SF_SMOKE, "documents").select(*quality_exprs())
    rows = d.select("n_tokens", "n_stopwords", "quality_score").collect()
    X = np.array(
        [[1.0, r.n_tokens, r.n_stopwords] for r in rows], dtype=float
    )
    y = np.array(
        [float(int(r.quality_score * 1_000_000 + 0.5)) for r in rows]
    )
    w_ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    got = _Q["q_ml_quality_fit"](spark, SF_SMOKE).collect()
    bands = {r.band: r for r in got}
    assert set(bands) <= {"keep", "drop"}
    assert sum(r.n_docs for r in got) == len(rows)
    assert min(r.n_docs for r in got) > 0  # the threshold is a real split
    for r in got:
        for w_got_e6, w_np in zip((r.w0_e6, r.w1_e6, r.w2_e6), w_ref):
            # e6-floored in-plan Cramer weight vs numpy least squares
            assert abs(w_got_e6 - int(np.floor(w_np * 1e6))) <= 1
    # band split consistent with the least-squares predictions (exact
    # in-plan weights vs numpy differ only in last-ulp division noise, so
    # allow a few boundary docs to flip)
    pred = X @ w_ref
    n_keep_ref = int((np.floor(pred) >= 900_000).sum())
    n_keep_got = bands["keep"].n_docs if "keep" in bands else 0
    assert abs(n_keep_got - n_keep_ref) <= 3


def test_stream_sessionize_availablenow_equals_batch_twin(spark):
    from gpe import timeseries

    cols = ["user_id", "session_start", "n_events", "sum_value"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in _Q["q_stream_sessionize_availablenow"](
            spark, SF_SMOKE
        ).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in timeseries.q_ts_sessionize(spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0


# -------------------------------------------- q_text_decontaminate


def test_decontaminate_interval_union_matches_python(spark):
    """Per-source removable mass equals a pure-Python interval union over
    the operator's own span frame + the keep-first (cut doc_b) rule."""
    from collections import defaultdict

    import duckdb

    spans = _Q["q_text_substring_dedup"](spark, SF_SMOKE).collect()
    per_doc = defaultdict(list)
    for r in spans:
        per_doc[r.doc_b].append((int(r.start_b), int(r.start_b + r.len)))
    removable = {}
    for doc, ivs in per_doc.items():
        ivs = sorted(set(ivs))
        tot, cur_s, cur_e = 0, None, None
        for s, e in ivs:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    tot += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            tot += cur_e - cur_s
        removable[doc] = tot
    docs = duckdb.sql(
        f"SELECT doc_id, source, len(string_split(text, ' ')) FROM "
        f"'{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    want = defaultdict(lambda: [0, 0, 0, 0])  # docs, tokens, affected, rm
    for doc_id, src, n in docs:
        row = want[src]
        row[0] += 1
        row[1] += n
        if doc_id in removable:
            row[2] += 1
            row[3] += removable[doc_id]
    got = _Q["q_text_decontaminate"](spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        nd, nt, na, rm = want[r.source]
        assert (r.n_docs, r.total_tokens, r.n_affected_docs,
                r.removable_tokens) == (nd, nt, na, rm), r.source
    # the fixture carries real removable mass
    assert sum(r.removable_tokens for r in got) > 0
