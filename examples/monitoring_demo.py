"""Worked example: the metric-monitoring / forecasting surface (round 6).

Run: python examples/monitoring_demo.py [sf_dir]

The observability flow an analytics API serves over its event stream:
materialize the multi-grain rollup ladder, smooth it (EWMA), watch it for
bursts (CUSUM) and level shifts (z-score), backtest the forecasting
baseline, map user paths (transition matrix), and enrich facts against
dimension history as-of event time (SCD2 point-in-time join). Every stage
is a lazy DataFrame; nothing below is driver-side except the final show().
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gpe import cdc, timeseries
from gpe.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("monitoring-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print("== rollup ladder (one scan -> hour/day/month/total) ==")
    (
        timeseries.q_ts_rollup_multigrain(spark, sf_dir)
        .groupBy("grain")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("grain")
        .show()
    )

    print("== EWMA smoothing (closed-form prefix scan), first 5 days ==")
    timeseries.q_ts_ewma(spark, sf_dir).orderBy("event_type", "day").show(5)

    print("== CUSUM burst watch: flagged days ==")
    timeseries.q_ts_cusum(spark, sf_dir).filter("is_burst").orderBy(
        "event_type", "day"
    ).show(5)

    print("== seasonal-naive forecast backtest (the baseline to beat) ==")
    timeseries.q_ts_forecast_snaive(spark, sf_dir).orderBy("event_type").show()

    print("== user-path transition matrix, top 5 by probability ==")
    timeseries.q_ts_transitions(spark, sf_dir).orderBy(
        F.desc("p_transition")
    ).show(5)

    print("== point-in-time enrichment vs SCD2 history, first 5 ==")
    cdc.q_join_scd2_pointintime(spark, sf_dir).orderBy("event_id").show(5)

    print("monitoring surface demo complete")


if __name__ == "__main__":
    main()
