"""Worked example: the model-QA / drift-monitoring surface (round 9).

Run: python examples/model_qa_demo.py [sf_dir]

The evaluation loop an ML platform runs where the data lives: score the
embedding table against class prototypes and read AUC + calibration,
check the input distributions for drift (PSI bands, two-sample KS),
profile user activity regularity, decompose the traffic series, and pull
a value-weighted audit sample — every stage a lazy DataFrame, the same
code at 100 TB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gpe import dedup, ml, pipeline, timeseries
from gpe.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("model-qa-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print("== one-vs-rest AUC per class (prototype scorer) ==")
    ml.q_ml_auc(spark, sf_dir).orderBy("label").show()

    print("== calibration deciles (class 0) ==")
    ml.q_ml_calibration(spark, sf_dir).orderBy("bin").show()

    print("== PSI drift bands (order values, era A vs B) ==")
    psi = ml.q_ml_psi(spark, sf_dir)
    psi.orderBy("bin").show()
    psi.agg(
        (F.sum("psi_term_e6") / 1e6).alias("psi_total")
    ).show()

    print("== two-sample KS: click vs purchase values ==")
    ml.q_ml_ks(spark, sf_dir).show()

    print("== user activity regularity (burstiest 5) ==")
    timeseries.q_ts_interarrival(spark, sf_dir).orderBy(
        F.desc_nulls_last("burstiness")
    ).show(5)

    print("== traffic mix entropy, first 5 days ==")
    timeseries.q_ts_mix_entropy(spark, sf_dir).orderBy("day").show(5)

    print("== seasonal decomposition (click weekday profile) ==")
    timeseries.q_ts_decompose(spark, sf_dir).filter(
        F.col("event_type") == "click"
    ).orderBy("dow").show()

    print("== contamination blast radius (dup-hops from flagged docs) ==")
    dedup.q_graph_bfs_layers(spark, sf_dir).orderBy("layer").show()

    print("== k-NN neighborhood purity per label ==")
    ml.q_ml_knn_eval(spark, sf_dir).orderBy("label").show()

    print("== cross-document boilerplate paragraphs (top 5 by copies) ==")
    from gpe import multimodal, text

    text.q_text_dup_paragraphs(spark, sf_dir).orderBy(
        F.desc("n_occurrences")
    ).show(5, truncate=16)

    print("== block-level storage dedup (reclaimable bytes) ==")
    multimodal.q_multimodal_dedup(spark, sf_dir).orderBy(
        F.desc("bytes_reclaimable")
    ).show(5, truncate=16)

    print("== value-weighted audit sample (top 5 by value) ==")
    pipeline.q_sample_weighted(spark, sf_dir).orderBy(
        F.desc("o_totalprice")
    ).show(5)

    print("model QA demo complete")


if __name__ == "__main__":
    main()
