"""Merged query/oracle registry consumed by __spark_entry__.py.

Each gpe module exposes module-level ``QUERIES`` (key → builder) and
``ORACLES`` (key → DuckDB SQL, omitted for rows-only checks). This module
merges them and enforces key discipline: duplicate keys are a bug, and every
oracle key must have a query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gpe import io as _io
from gpe import relational as _relational

_MODULES = [_io, _relational]

# Strict imports: a broken module must fail LOUDLY here. (An earlier
# tolerant `except ImportError` could silently drop a whole module's
# queries from the registry — the driver would then run fewer keys with no
# error, which is the worst possible failure mode for the coverage gate.)
for _name in (
    "windows",
    "timeseries",
    "scalars",
    "text",
    "dedup",
    "vectors",
    "multimodal",
    "pipeline",
    "packing",
    "catalog",
    "udf",
    "cdc",
    "ml",
):
    _MODULES.append(__import__(f"gpe.{_name}", fromlist=[_name]))


# The driver hash-verifies exactly the FIRST 50 keys of queries() each round
# (verified r1–r7: CORRECTNESS_r0N covers precisely registry indices 0-49),
# so registry order decides which keys get hard correctness signal.
# Round-8 window (VERDICT r7 next-round #1): (a) the 7 late-r8 +
# 23 mid-r8 operators NEW this round (zero driver evidence) at the very
# front; (b) 20 of the 31 keys whose latest driver row is round 4 (four
# rounds of module churn since — the staged r7 _SECOND_WAVE). The
# displaced r4-stale keys (q_text_unigram_logprob, q_text_keyphrases,
# q_pack_sequences, q_text_chunk_windows, q_mix_temperature,
# q_ts_anomaly_zscore, q_multimodal_frames, plus the r7 leftovers
# q_scalar_date / q_scalar_math and the frozen trivial set-ops
# q_distinct_dropdup / q_except) head _SECOND_WAVE for r9; new keys
# outrank stale re-checks because they have ZERO driver evidence.
# Keys after position 50 keep local parity (tools/parity.py) as their
# regression net; tests/test_registry_order.py pins this window.
HARD_SIGNAL_FIRST_50 = [
    # --- round-9 operators (zero driver evidence, newest first) ---
    "q_ts_anomaly_seasonal",
    "q_agg_skyline",
    "q_catalog_column_entropy",
    "q_join_ship_lag",
    "q_multimodal_dedup",
    "q_ml_knn_eval",
    "q_text_dup_paragraphs",
    "q_text_bigram_lm",
    "q_ml_confusion",
    "q_ml_margin",
    "q_ts_decompose",
    "q_agg_cramers_v",
    "q_graph_bfs_layers",
    "q_sample_weighted",
    "q_text_hapax",
    "q_ts_interarrival",
    "q_ts_peaks",
    "q_ts_mix_entropy",
    "q_ml_auc",
    "q_ml_calibration",
    "q_ml_psi",
    "q_ml_ks",
    # --- final-round-8 operators (zero driver evidence, newest first) ---
    "q_ml_class_metrics",
    "q_ts_mann_kendall",
    "q_pipeline_quality_gate",
    "q_text_readability",
    "q_ts_changepoint",
    "q_ts_theilsen",
    "q_catalog_fk_infer",
    "q_agg_log_histogram",
    "q_agg_chi2",
    "q_source_orc_roundtrip",
    # --- late-round-8 operators (zero driver evidence, newest first) ---
    "q_graph_triangles",
    "q_text_heavy_hitters",
    "q_ts_survival_km",
    "q_ml_gram_moments",
    "q_agg_decile_lift",
    "q_agg_benford",
    "q_ts_calendar_profile",
    # --- new round-8 operators (zero driver evidence) ---
    "q_graph_pagerank",
    "q_text_bpe_merge_step",
    "q_text_bm25_search",
    "q_text_repetition",
    "q_agg_market_basket",
    "q_lake_snapshot_diff",
    "q_source_csv_roundtrip",
    "q_source_schema_evolution",
    "q_join_theta_bucketed",
    "q_join_bloom_prefilter",
    "q_ts_active_users",
]

# Next in line for round 9: first the r4-stale keys displaced by the
# mid/late/final-r8 additions (VERDICT r7 #1 remainder — new keys outrank
# stale re-checks because they have ZERO driver evidence), then
# q_scalar_date / q_scalar_math, the ANN-rerank fills whose rewrite
# q_vec_ann_pq's r7 row and local parity already cover, the frozen
# trivial set-ops q_distinct_dropdup / q_except, and the remaining
# r5-green keys (oldest driver evidence after this window lands).
# r6/r7/r8-green keys fall to the tail automatically.
_SECOND_WAVE = [
    # displaced from the r9 window by the 22 new r9 keys — first in
    # line for r10 (the q_* names through q_catalog_quality_checks were
    # r8-new with zero driver evidence; the rest are r4-stale)
    "q_dedup_dup_stats",
    "q_text_winnowing",
    "q_pack_bin_stats",
    "q_vec_dim_stats",
    "q_ts_daily_percentiles",
    "q_multimodal_resize",
    "q_join_partition_pruned",
    "q_udtf_tokens",
    "q_text_length_histogram",
    "q_agg_topn_share",
    "q_cdc_scd2_current",
    "q_catalog_quality_checks",
    "q_join_left_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_theta_range",
    "q_join_fuzzy_name",
    "q_join_skew_salted",
    "q_join_lateral",
    "q_agg_groupby",
    "q_scalar_string",
    "q_explode_tokens",
    # displaced from the r8 window by the 10 final-r8 keys — still
    # r4-stale, first in line for r9
    "q_scalar_json",
    "q_scalar_string2",
    "q_agg_listagg",
    "q_agg_percentiles",
    "q_agg_histogram",
    "q_agg_corr_regr",
    "q_agg_conditional",
    "q_subquery_correlated",
    "q_pivot_status_by_year",
    "q_catalog_schema",
    # displaced from the r8 window by the 7 late-r8 keys — still
    # r4-stale, next in line for r9
    "q_text_unigram_logprob",
    "q_text_keyphrases",
    "q_pack_sequences",
    "q_text_chunk_windows",
    "q_mix_temperature",
    "q_ts_anomaly_zscore",
    "q_multimodal_frames",
    "q_scalar_date",
    "q_scalar_math",
    "q_vec_ann_lsh",
    "q_vec_ann_recall",
    "q_distinct_dropdup",
    "q_except",
    "q_vec_ann_ivf",
    "q_vec_knn_brute",
    "q_dedup_embed_cosine",
    "q_vec_pairs_threshold",
    "q_vec_centroids",
    "q_dedup_exact",
    "q_cdc_compact",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_ngram_lsh",
    "q_scd2_intervals",
    "q_scan_parquet",
    "q_scan_projected",
    "q_scan_all_tables_counts",
    "q_split_train_val",
    "q_project_compute",
    "q_filter_conj",
    "q_filter_disj_in",
    "q_filter_like",
    "q_filter_between_dates",
    "q_case_when",
    "q_join_full_outer",
    "q_join_cross_limited",
    "q_agg_global",
    "q_agg_count_distinct",
    "q_agg_approx_quantile",
    "q_agg_approx_distinct",
    "q_agg_multi_distinct",
    "q_agg_having",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_subquery_scalar",
    "q_page_orders",
    "q_unpivot_order_counts",
    "q_text_stats",
    "q_text_tfidf_topterms",
    "q_text_ngrams",
    "q_text_quality",
    "q_text_langid",
    "q_text_tokencount",
    "q_text_fingerprint",
    "q_dedup_keep_best",
    "q_text_contamination",
    "q_udf_pandas_scalar",
    "q_udaf_applyinpandas",
    "q_udf_cogroup",
    "q_sort_multi",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for key, fn in getattr(mod, "QUERIES", {}).items():
            if key in merged:
                raise ValueError(f"duplicate query key {key!r} in {mod.__name__}")
            merged[key] = fn
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for key in HARD_SIGNAL_FIRST_50 + _SECOND_WAVE:
        out[key] = merged[key]  # KeyError here = priority list out of sync
    for key, fn in merged.items():
        if key not in out:
            out[key] = fn
    return out


def oracle_sql() -> dict[str, str]:
    qkeys = set(queries().keys())
    out: dict[str, str] = {}
    for mod in _MODULES:
        for key, sql in getattr(mod, "ORACLES", {}).items():
            if key in out:
                raise ValueError(f"duplicate oracle key {key!r} in {mod.__name__}")
            if key not in qkeys:
                raise ValueError(f"oracle {key!r} has no matching query")
            out[key] = sql
    return out
