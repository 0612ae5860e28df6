"""Round-14 operators + fixes: semantic/plan checks beyond the driver hash.

q_dedup_semantic_recall (the SemDeDup cross-cell recall audit),
q_stream_dedup_availablenow (streaming ingest dedup twin),
q_gov_forget_corpus (corpus/vector-modality erasure), the BPE trainer's
would_continue flag + degenerate-corpus guard (VERDICT r13 #5 + ADVICE
r13), and the zorder point-file overlap predicate (ADVICE r13).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE, SF_T2

import __spark_entry__ as spec

_Q = spec.queries()


# ------------------------------------- q_dedup_semantic_recall


def test_semantic_recall_rollup_is_consistent(spark):
    rows = _Q["q_dedup_semantic_recall"](spark, SF_SMOKE).collect()
    bins = [r for r in rows if r.sim_bin is not None]
    total = [r for r in rows if r.sim_bin is None]
    assert len(total) == 1
    t = total[0]
    assert bins, "fixture must produce tau-qualifying pairs"
    assert t.n_pairs == sum(r.n_pairs for r in bins)
    assert t.n_recalled == sum(r.n_recalled for r in bins)
    for r in rows:
        assert r.n_pairs == r.n_recalled + r.n_missed
        assert r.recall_e6 == r.n_recalled * 1_000_000 // r.n_pairs
    # bins start at floor(tau * 20)
    from gpe.dedup import _SEM_TAU

    assert min(r.sim_bin for r in bins) >= int(_SEM_TAU * 20)


def test_semantic_recall_recalled_equals_cell_pair_mass(spark):
    """Audit ↔ cells-rollup consistency: the overall recalled-pair count
    must equal the per-cell qualifying-pair total from
    q_dedup_semantic_cells — both count exactly the within-cell global
    pairs, via entirely different pipelines (global pair scan + cell tag
    vs cell-bounded cogroup + symmetric-neighbor rollup)."""
    rows = _Q["q_dedup_semantic_recall"](spark, SF_SMOKE).collect()
    t = next(r for r in rows if r.sim_bin is None)
    cells = _Q["q_dedup_semantic_cells"](spark, SF_SMOKE).collect()
    assert t.n_recalled == sum(r.n_pairs for r in cells)


def test_semantic_recall_planted_cross_cell_pair(spark, tmp_path):
    """Synthetic lake with KNOWN geometry: two far-apart label groups
    (→ two far centroids), one near-dup pair planted straddling the
    Voronoi midplane (one side each — MUST be missed) and one near-dup
    pair planted inside a single cell (MUST be recalled). /1024 floats
    are exactly representable, so assignments and dots are exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gpe.dedup import _SEM_TAU

    # two clusters on axes e0 / e1, 8 background members each
    vecs = {}
    for i in range(8):
        vecs[i] = [1000 / 1024, (i - 4) / 1024]  # label-0 mass near e0
        vecs[10 + i] = [(i - 4) / 1024, 1000 / 1024]  # label-1 near e1
    # straddling pair: dot = 2·(922·614)/1024² ≈ 1.08 >= tau, A leans
    # clearly to centroid 0 and B to centroid 1 (margins ~0.87 vs ~0.34
    # by hand), so the quantizer splits the pair
    vecs[20] = [922 / 1024, 614 / 1024]
    vecs[21] = [614 / 1024, 922 / 1024]
    # in-cell pair: both hug e0 (cell 0), dot ≈ 0.95 >= tau
    vecs[22] = [1000 / 1024, 8 / 1024]
    vecs[23] = [1000 / 1024, -8 / 1024]
    labels = {i: (0 if i < 10 or i >= 20 else 1) for i in vecs}
    labels[21] = 1  # label rides with the lean; assignment is argmax anyway
    pq.write_table(
        pa.table(
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
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    from gpe.vectors import _kmeans_assignments

    emb = spark.read.parquet(f"{tmp_path}/embeddings.parquet")
    cell = {
        r.vec_id: r.cluster for r in _kmeans_assignments(emb).collect()
    }
    assert cell[20] != cell[21], "plant must straddle the midplane"
    assert cell[22] == cell[23], "plant must share a cell"
    rows = _Q["q_dedup_semantic_recall"](spark, str(tmp_path)).collect()
    t = next(r for r in rows if r.sim_bin is None)
    assert t.n_missed >= 1  # the straddling plant
    assert t.n_recalled >= 1  # the in-cell plant
    # exact reference: all pairs with float dot >= tau (exact /1024^2
    # rationals — no rounding at this precision), tagged by cell
    ids = sorted(vecs)
    n_pairs = n_rec = 0

    def dot(a, b):
        return sum(x * y for x, y in zip(vecs[a], vecs[b]))

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if dot(a, b) >= _SEM_TAU:
                n_pairs += 1
                n_rec += int(cell[a] == cell[b])
    assert t.n_pairs == n_pairs
    assert t.n_recalled == n_rec


# ------------------------------------ q_stream_dedup_availablenow


def test_stream_dedup_equals_batch_exact(spark):
    got = sorted(
        (r.content_hash, r.keeper_doc_id, r.n_copies)
        for r in _Q["q_stream_dedup_availablenow"](spark, SF_SMOKE).collect()
    )
    want = sorted(
        (r.content_hash, r.keeper_doc_id, r.n_copies)
        for r in _Q["q_dedup_exact"](spark, SF_SMOKE).collect()
    )
    assert got == want


def test_stream_dedup_uses_keyed_dedup_state():
    """The sieve must be dropDuplicatesWithinWatermark (keyed dedup
    state + watermark eviction) through the APPEND runner — and the
    complete-mode runner the three r13-hashed twins flow through must
    stay untouched this cycle (the currency-freeze reason documented on
    _run_available_now_append)."""
    import inspect

    from gpe import streaming

    src = inspect.getsource(streaming.q_stream_dedup_availablenow)
    assert "dropDuplicatesWithinWatermark" in src
    assert "_run_available_now_append" in src
    # the shared complete-mode runner takes no mode parameter
    sig = inspect.signature(streaming._run_available_now)
    assert list(sig.parameters) == ["spark", "agg", "name"]


def test_stream_dedup_includes_epoch_adjacent_doc(spark):
    """Regression: doc_id 0's synthetic event time must ride ABOVE the
    initial watermark — without the base offset the row is dropped as
    late and the first document silently vanishes from the sieve."""
    d0 = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") == 0
    )
    h0 = d0.select(
        F.sha2(F.lower(F.trim(F.col("text"))).cast("binary"), 256).alias("h")
    ).collect()[0].h
    hashes = {
        r.content_hash
        for r in _Q["q_stream_dedup_availablenow"](spark, SF_SMOKE).collect()
    }
    assert h0 in hashes


# ----------------------------------------- q_gov_forget_corpus


def test_forget_corpus_legs_and_index_invariants(spark):
    from gpe.dedup import _NGRAM_N_BANDS

    rows = {
        r.table_name: r
        for r in _Q["q_gov_forget_corpus"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"documents", "embeddings", "dedup_index", "ann_index"}
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    erased = {
        r.c_custkey for r in c.filter(F.expr("c_custkey % 97 = 0")).collect()
    }
    doc_ids = {r.doc_id for r in d.select("doc_id").collect()}
    assert rows["documents"].n_purged == len(erased & doc_ids)
    assert rows["documents"].n_purged >= 1, "fixture overlap must be real"
    for r in rows.values():
        assert r.n_residual_refs == 0
        assert r.n_after == r.n_before - r.n_purged
    # index-consistency invariants: one posting entry per vector, exactly
    # _NGRAM_N_BANDS signature rows per doc
    for col in ("n_before", "n_purged", "n_after"):
        assert rows["ann_index"][col] == rows["embeddings"][col]
        assert rows["dedup_index"][col] == _NGRAM_N_BANDS * rows["documents"][col]


# ------------------------------- zorder point-file overlaps (ADVICE r13)


def test_zorder_overlap_predicate_point_files(spark):
    """Unit-test _file_overlap_count's contract on constructed layouts:
    touching non-point files are NOT overlaps; interior intersections,
    coincident point files, and point files at/inside another file's
    closed range ARE."""
    from gpe.catalog import _file_overlap_count

    def count(intervals):
        files = spark.createDataFrame(
            [(f"f{i}", lo, hi) for i, (lo, hi) in enumerate(intervals)],
            "f string, lo long, hi long",
        )
        return _file_overlap_count(files).collect()[0].n_groups

    assert count([(0, 5), (5, 9)]) == 0  # sorted-split adjacency: excused
    assert count([(0, 5), (3, 9)]) == 1  # strict interior
    assert count([(4, 4), (4, 4)]) == 1  # coincident points (ADVICE r13)
    assert count([(4, 4), (0, 9)]) == 1  # point inside
    assert count([(4, 4), (4, 9)]) == 1  # point at other's lo
    assert count([(4, 4), (0, 4)]) == 1  # point at other's hi
    assert count([(4, 4), (5, 9)]) == 0  # disjoint
    assert count([(0, 5), (6, 9)]) == 0  # disjoint ranges


def test_zorder_write_still_disjoint_with_point_rule(spark):
    rows = {
        r.strategy: r
        for r in _Q["q_lake_zorder_write"](spark, SF_SMOKE).collect()
    }
    assert rows["file_disjointness"].n_groups == 0
