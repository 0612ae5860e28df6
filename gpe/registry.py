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
    "streaming",
):
    _MODULES.append(__import__(f"gpe.{_name}", fromlist=[_name]))


# The driver hash-verifies exactly the FIRST 50 keys of queries() each round
# (verified r1-r13: CORRECTNESS_r0N covers precisely registry indices 0-49),
# so registry order decides which keys get hard correctness signal.
# Round-14 window (VERDICT r13 next-round #1 + the currency policy),
# composition 3+3+44:
# (a) the 3 operators NEW in r14 (zero driver evidence): the SemDeDup
# cross-cell recall audit, the availableNow streaming ingest-dedup twin,
# and the corpus/vector-modality erasure propagation;
# (b) the 3 keys whose CODE CHANGED in r14 after their r13 driver hash
# (BPE trainer: would_continue convergence flag + ADVICE r13
# degenerate-corpus guard; zorder write: ADVICE r13 point-file overlap
# predicate; forget audit: leg helper factored to module level for the
# corpus key) -- changed keys outrank stale re-checks, the currency
# policy;
# (c) ALL 44 remaining r7-stale keys, in their r7-window order -- after
# this lands the registry evidence floor rises from r7 to r9
# (VERDICT r13 #1: the whole r7 block in one window).
# Keys after position 50 keep local parity (tools/parity.py) as their
# regression net; tests/test_registry_order.py pins this window.
HARD_SIGNAL_FIRST_50 = [
    # --- (a) round-14 operators (zero driver evidence) ---
    "q_dedup_semantic_recall",
    "q_stream_dedup_availablenow",
    "q_gov_forget_corpus",
    # --- (b) code changed r14, driver evidence (r13) predates it ---
    "q_text_bpe_train",
    "q_lake_zorder_write",
    "q_gov_forget_audit",
    # --- (c) the 44 remaining r7-stale keys, in their r7-window order ---
    "q_dedup_graph_degree",
    "q_text_jaccard_topk",
    "q_text_vocab_coverage",
    "q_join_bucketed_colocated",
    "q_cdc_compact_deletes",
    "q_agg_iqr_fences",
    "q_agg_ttest_welch",
    "q_text_cooccurrence_pmi",
    "q_ts_user_paths",
    "q_agg_mad",
    "q_vec_pca_power",
    "q_ts_cohort_ltv",
    "q_agg_skew_kurtosis",
    "q_source_json_roundtrip",
    "q_ts_bounce_rate",
    "q_scalar_date2",
    "q_multimodal_audio_windows",
    "q_win_rolling_corr",
    "q_ts_session_attach",
    "q_win_distinct_count",
    "q_scalar_array",
    "q_scalar_map",
    "q_scalar_arrayops",
    "q_agg_collect",
    "q_catalog_column_stats",
    "q_multimodal_features",
    "q_dedup_minhash_lsh",
    "q_dedup_components",
    "q_dedup_components_star",
    "q_vec_ann_pq",
    "q_win_rank",
    "q_win_lag_lead",
    "q_win_running_sum",
    "q_join_asof",
    "q_join_asof_tolerance",
    "q_join_interval",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_win_ntile_pctrank",
    "q_agg_mode",
    "q_join_inner_bcast",
    "q_join_inner_shuffle",
    "q_join_multiway_star",
]

# Next in line for round 15: the 42 r9-stale keys in their r9-window
# order -- once THEY land, the registry's evidence floor reaches r10.
_SECOND_WAVE = [
    "q_ts_anomaly_seasonal",
    "q_catalog_column_entropy",
    "q_join_ship_lag",
    "q_multimodal_dedup",
    "q_text_bigram_lm",
    "q_ml_confusion",
    "q_ml_margin",
    "q_ts_decompose",
    "q_graph_bfs_layers",
    "q_sample_weighted",
    "q_text_hapax",
    "q_ts_interarrival",
    "q_ts_peaks",
    "q_ts_mix_entropy",
    "q_ml_auc",
    "q_ml_psi",
    "q_ml_class_metrics",
    "q_ts_mann_kendall",
    "q_pipeline_quality_gate",
    "q_text_readability",
    "q_ts_changepoint",
    "q_ts_theilsen",
    "q_catalog_fk_infer",
    "q_agg_chi2",
    "q_source_orc_roundtrip",
    "q_graph_triangles",
    "q_text_heavy_hitters",
    "q_ts_survival_km",
    "q_ml_gram_moments",
    "q_agg_decile_lift",
    "q_agg_benford",
    "q_ts_calendar_profile",
    "q_graph_pagerank",
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
