"""Semantic invariants of the round-6 operators beyond oracle parity:
containment ⊇ Jaccard, IVM delta locality, VWAP telescoping, attribution
window bounds, range-search/top-k consistency."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as spec
from gpe.io import load_table

SF = "/root/testdata/sf0.01"
_Q = spec.queries()


def test_containment_is_superset_of_jaccard_pairs(spark):
    """J > 0.9 ⇒ C > 0.9 (containment denominator is never larger than the
    union), so every near-dup pair must reappear in the containment set —
    and the containment value never drops below the Jaccard value."""
    jac = _Q["q_dedup_near_pairs"](spark, SF).select("id_a", "id_b", "jaccard")
    con = _Q["q_dedup_containment"](spark, SF).select(
        "id_a", "id_b", "containment"
    )
    joined = jac.join(con, ["id_a", "id_b"], "left")
    assert joined.filter(F.col("containment").isNull()).count() == 0
    assert (
        joined.filter(F.col("containment") < F.col("jaccard") - 1e-9).count()
        == 0
    )


def test_containment_catches_subset_pairs_jaccard_misses(spark):
    """The operator's reason to exist: the fixture has containment pairs
    (short ⊂ long) whose Jaccard is below the 0.9 bar."""
    jac = _Q["q_dedup_near_pairs"](spark, SF).select("id_a", "id_b")
    con = _Q["q_dedup_containment"](spark, SF).select("id_a", "id_b")
    assert con.join(jac, ["id_a", "id_b"], "left_anti").count() > 0


def test_mv_incremental_only_delta_customers_change(spark):
    """IVM locality: customers untouched by the change batch keep their
    base-view row bit-for-bit; touched customers all change."""
    from gpe.cdc import _change_batch

    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    base_view = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_spent"),
    )
    out = _Q["q_mv_incremental"](spark, SF)
    delta_custs = _change_batch(o).select("o_custkey").distinct()
    untouched_diff = (
        out.join(delta_custs, "o_custkey", "left_anti")
        .alias("n")
        .join(base_view.alias("b"), "o_custkey")
        .filter(
            (F.col("n.n_orders") != F.col("b.n_orders"))
            | (F.col("n.total_spent") != F.col("b.total_spent"))
        )
    )
    assert untouched_diff.count() == 0
    # every customer in the change batch gains spend (updates +100, inserts
    # add a full order) — total_spent strictly increases
    touched_same = (
        out.join(delta_custs, "o_custkey")
        .alias("n")
        .join(base_view.alias("b"), "o_custkey")
        .filter(F.col("n.total_spent") <= F.col("b.total_spent"))
    )
    assert touched_same.count() == 0


def test_vwap_cumulative_telescopes_to_global_ratio(spark):
    """The last month's cum_vwap must equal the single global ratio of
    sums (telescoping check on the running-sum window)."""
    out = _Q["q_ts_vwap"](spark, SF)
    last = out.orderBy(F.desc("ship_month")).limit(1).collect()[0]
    li = load_table(spark, SF, "lineitem")
    g = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("sp"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sq"),
    ).collect()[0]
    expect = round(float(g.sp) / float(g.sq) + 1e-9, 6)
    assert abs(last.cum_vwap - expect) < 1e-9


def test_attribution_bounds_and_touch_typing(spark):
    """Every attributed touch is a non-purchase prior event within the
    7-day window; gaps are non-negative and purchases are unique."""
    out = _Q["q_ts_attribution"](spark, SF)
    assert out.filter(F.col("touch_type") == "purchase").count() == 0
    assert (
        out.filter(
            (F.col("gap_seconds") < 0) | (F.col("gap_seconds") > 604800)
        ).count()
        == 0
    )
    assert out.filter(F.col("touch_ts") > F.col("purchase_ts")).count() == 0
    assert (
        out.count()
        == out.select("purchase_event_id").distinct().count()
    )


def test_range_search_consistent_with_topk(spark):
    """Any brute-force top-5 neighbor with sim ≥ τ must appear in the
    range result (range search is recall-complete above the threshold)."""
    knn = (
        _Q["q_vec_knn_brute"](spark, SF)
        .filter(F.col("sim") >= 0.25)
        .select("query_id", "neighbor_id", "sim")
    )
    rng = _Q["q_vec_range_search"](spark, SF).select(
        "query_id", "neighbor_id", F.col("sim").alias("r_sim")
    )
    j = knn.join(rng, ["query_id", "neighbor_id"], "left")
    assert j.filter(F.col("r_sim").isNull()).count() == 0
    assert j.filter(F.col("r_sim") != F.col("sim")).count() == 0
