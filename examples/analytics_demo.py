"""Worked example: the relational/time-series analytics surface.

Run: python examples/analytics_demo.py [sf_dir]

Shows what a user of the reference data-lake API does with this engine:
load tables, run star-join revenue analytics, sessionize an event stream,
and page through results — all lazy DataFrames until the final action.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gpe import relational, timeseries, windows
from gpe.io import load_tables, register_views
from gpe.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print("== pricing summary (TPC-H Q1 shape) ==")
    relational.q_agg_groupby(spark, sf_dir).show()

    print("== revenue per nation, ASIA (TPC-H Q5 shape, broadcast dims) ==")
    relational.q_join_multiway_star(spark, sf_dir).show()

    print("== top-3 orders per customer (first 10 rows) ==")
    windows.q_win_topk_per_group(spark, sf_dir).show(10)

    print("== user sessions (30-min gap), first 10 ==")
    timeseries.q_ts_sessionize(spark, sf_dir).orderBy(
        "user_id", "session_id"
    ).show(10)

    print("== purchases matched to the preceding view (as-of join) ==")
    relational.q_join_asof(spark, sf_dir).orderBy("p_event_id").show(5)

    print("== MERGE upsert (CDC change batch applied to orders) ==")
    from gpe import cdc

    cdc.q_merge_upsert(spark, sf_dir).groupBy("merge_action").count().show()

    print("== longest consecutive-day purchase streak per user (top 5) ==")
    windows.q_win_streaks(spark, sf_dir).orderBy(
        "user_id"
    ).show(5)

    print("== monthly + cumulative VWAP (commodity-price slice, last 5) ==")
    timeseries.q_ts_vwap(spark, sf_dir).orderBy(F.desc("ship_month")).show(5)

    print("== last-touch attribution (first 5 purchases) ==")
    timeseries.q_ts_attribution(spark, sf_dir).orderBy(
        "purchase_event_id"
    ).show(5)

    print("== RFM segmentation (distributed NTILE(5) x3, first 5) ==")
    windows.q_customer_rfm(spark, sf_dir).orderBy("o_custkey").show(5)

    print("== incremental materialized-view refresh (IVM), 5 rows ==")
    cdc.q_mv_incremental(spark, sf_dir).orderBy("o_custkey").show(5)

    print("== robust trend panel (final r8): Theil-Sen slope + Mann-Kendall z ==")
    from gpe.api import LakeAPI

    LakeAPI(spark, sf_dir).series_trend().orderBy("o_orderpriority").show()

    print("== changepoint report per event type (final r8) ==")
    timeseries.q_ts_changepoint(spark, sf_dir).orderBy("event_type").show()

    print("== status x priority independence screen (final r8, chi-squared) ==")
    chi = relational.q_agg_chi2(spark, sf_dir)
    chi.agg(
        F.round(F.sum("chi2_term"), 3).alias("chi2_statistic"),
        F.count(F.lit(1)).alias("n_cells"),
    ).show()

    print("== SQL surface over registered views ==")
    register_views(spark, sf_dir)
    spark.sql(
        """SELECT o_orderpriority, COUNT(*) AS n
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).show()

    tables = load_tables(spark, sf_dir)
    print(f"loaded {len(tables)} tables from {sf_dir}")


if __name__ == "__main__":
    main()
