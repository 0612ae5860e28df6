"""Round-9 plan-shape assertions (the SCALE.md contract, mechanically):
model/prototype tables reach their joins as broadcasts, the sampling
filter is map-side with no shuffle before it, and no r9 key contains an
undeclared cartesian product."""

from __future__ import annotations

import __spark_entry__ as spec

from tests.conftest import SF_SMOKE

_Q = spec.queries()

R9_KEYS = [
    "q_ml_auc",
    "q_ml_calibration",
    "q_ml_psi",
    "q_ml_ks",
    "q_ml_confusion",
    "q_ml_margin",
    "q_ts_interarrival",
    "q_ts_peaks",
    "q_ts_mix_entropy",
    "q_ts_decompose",
    "q_sample_weighted",
    "q_text_hapax",
    "q_text_bigram_lm",
    "q_graph_bfs_layers",
    "q_agg_cramers_v",
]


def _physical(spark, key: str) -> str:
    return _Q[key](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_in_r9_keys(spark):
    """The only all-pairs surface allowed is the mask-level BNLJ of the
    graph family (the documented closed-vocab bound); a CartesianProduct
    node anywhere is a scale bug.

    clearCache() first (the test_dedup_delta_plan_shapes precedent):
    a mask frame left cached by an EARLIER test file changes the
    planner's stats and flips the mask-pair BNLJ into a conditioned
    CartesianProduct — same rows, different node name, spurious fail
    (first seen r11 when the sketch-calibration tests began caching a
    supernode frame upstream of this file's alphabetical slot)."""
    spark.catalog.clearCache()
    for key in R9_KEYS:
        plan = _physical(spark, key)
        assert "CartesianProduct" not in plan, key


def test_model_tables_broadcast(spark):
    """Prototype/model/total tables must reach their joins as broadcasts
    — a shuffled join on the model key would reshuffle the corpus side."""
    for key in ["q_ml_auc", "q_ml_confusion", "q_ml_margin", "q_text_bigram_lm"]:
        plan = _physical(spark, key)
        assert "BroadcastHashJoin" in plan, key


def test_sample_weighted_is_single_scan_filter(spark):
    """PPS sampling is a map-side filter: exactly one orders scan feeds
    the filter (plus the 1-row total aggregate's scan), and no exchange
    sits between the probe scan and the filter."""
    plan = _physical(spark, "q_sample_weighted")
    assert plan.count("FileScan parquet") == 2  # probe scan + total scan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bfs_layers_reuses_persisted_mask_frames(spark):
    """The BFS relaxation iterates over the PERSISTED mask-group and
    adjacency frames: the physical plan must read them through
    InMemoryTableScan (one materialization feeding all three relaxation
    rounds), never re-deriving the mask build per round. (Plan-text node
    COUNTS are meaningless here — each iteration's lineage reprints the
    cached subtree — so assert presence, not multiplicity.)

    clearCache() first — same cross-file cache-state rationale as
    test_no_cartesian_product_in_r9_keys."""
    spark.catalog.clearCache()
    plan = _physical(spark, "q_graph_bfs_layers")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
