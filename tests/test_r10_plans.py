"""Round-10 plan-shape assertions (the SCALE.md contract, mechanically):
the knn-eval rewrite keeps embedding payloads out of every exchange, the
new keys carry no undeclared cartesian product, broadcast sides broadcast,
and the encoders/screens stay single-scan map-side."""

from __future__ import annotations

import __spark_entry__ as spec

from tests.conftest import SF_SMOKE

_Q = spec.queries()

R10_KEYS = [
    "q_text_bpe_encode",
    "q_text_pii_screen",
    "q_sample_cluster_balanced",
    "q_vec_matryoshka_recall",
    "q_text_zipf_fit",
    "q_agg_winsorized",
    "q_multimodal_phash",
    "q_ml_knn_eval",
]


def _physical(spark, key: str) -> str:
    return (
        _Q[key](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )


def test_no_cartesian_product_in_r10_keys(spark):
    for key in R10_KEYS:
        assert "CartesianProduct" not in _physical(spark, key), key


def test_knn_eval_never_explodes_or_shuffles_embeddings(spark):
    """The r9 anti-pattern is structurally gone: no posexplode (Generate)
    of the corpus, the query side reaches the scan as a broadcast, and
    the only wide exchange carries (query, neighbor, double) triples."""
    plan = _physical(spark, "q_ml_knn_eval")
    assert "Generate posexplode" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # broadcast query arrays
    # two corpus passes: double-prefilter scan + shortlist re-join scan,
    # plus the broadcast query-side scans
    assert plan.count("FileScan parquet") <= 4


def test_broadcast_sides_broadcast(spark):
    """Codebooks / merge tables / fences / shortlists must reach their
    joins as broadcasts — shuffling the big side on a tiny key is the
    classic scale bug these operators were designed around."""
    for key in [
        "q_text_bpe_encode",
        "q_sample_cluster_balanced",
        "q_agg_winsorized",
        "q_vec_matryoshka_recall",
    ]:
        plan = _physical(spark, key)
        assert (
            "BroadcastExchange" in plan
            or "BroadcastNestedLoopJoin" in plan
        ), key


def test_map_side_screens_are_single_scan_per_source(spark):
    """The PII screen reads each source exactly once (three scans, one
    per union leg) — a second scan of any source would mean the regex
    work left the map side."""
    plan = _physical(spark, "q_text_pii_screen")
    assert plan.count("FileScan parquet") == 3


def test_bpe_encode_documents_scans_are_bounded(spark):
    """Table derivation + encode: the documents file feeds the pair
    counter once (candidate table persisted before its three consumers)
    and the encoder once — the merge table must NOT trigger re-scans."""
    # plan text around InMemoryRelation changes once a prior test has
    # MATERIALIZED a matching cache (Spark's CacheManager substitutes the
    # old entry and prints its finalized child plans), so pin the state:
    # a fresh, unmaterialized build
    spark.catalog.clearCache()
    plan = _physical(spark, "q_text_bpe_encode")
    assert "InMemoryTableScan" in plan  # candidate cache active
    # every FileScan line except the encoder's own sits under an
    # InMemoryTableScan reference (the cached subtree is PRINTED once
    # per reference but scans once) — without the persist this
    # difference is 4, with it exactly 1
    assert (
        plan.count("FileScan parquet") - plan.count("InMemoryTableScan")
        == 1
    )


def test_phash_signature_frame_is_persisted(spark):
    """The mapInPandas signature pass materializes once (tracked
    persist); banding and the verify re-read the cached 4-int frame —
    payload bytes never feed a join directly."""
    plan = _physical(spark, "q_multimodal_phash")
    assert "InMemoryTableScan" in plan


def _iter_logical(node):
    yield node
    for i in range(node.children().size()):
        yield from _iter_logical(node.children().apply(i))


def test_head_cuts_are_two_stage_salted(spark):
    """VERDICT r10 #2/#3: the zipf and bpe head cuts rank within hash-salt
    buckets first — stage 1 must be a PARTITIONED window keyed on pmod —
    so no task ever sorts the whole open token/pair aggregate; stage 2
    re-ranks only the contracted survivors (test_window_audit verifies
    that side of the contract)."""
    for key in ("q_text_zipf_fit", "q_text_bpe_encode"):
        plan = _Q[key](spark, SF_SMOKE)._jdf.queryExecution().analyzed()
        salted = [
            n
            for n in _iter_logical(plan)
            if n.getClass().getSimpleName() == "Window"
            and n.partitionSpec().size() > 0
        ]
        assert salted, f"{key}: stage-1 partitioned window missing"
        # the salt key itself (materialized as a _w alias below the
        # window) must be the crc32-pmod bucket, not a data column
        assert "pmod(crc32(" in plan.toString(), key
