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
# (verified r1-r12: CORRECTNESS_r0N covers precisely registry indices 0-49),
# so registry order decides which keys get hard correctness signal.
# Round-13 window (VERDICT r12 next-round #1 + the currency policy),
# composition 6+5+35+4:
# (a) the 6 operators NEW in r13 (zero driver evidence): semantic dedup
# + its per-cell stats rollup, the unrolled BPE trainer, cross-corpus
# decontamination, the right-to-be-forgotten propagation audit, and the
# sliding-window availableNow streaming twin;
# (b) the 5 keys whose CODE CHANGED in r13 after their r12 driver hash
# (span-family broadcast fixes; availableNow state-store parallelism +
# sink-name hashing; zorder strict-interior overlap) -- changed keys
# outrank stale re-checks, the currency policy;
# (c) ALL 35 remaining r6-stale keys (VERDICT r12 #1 -- after this lands
# the registry evidence floor is r7 everywhere);
# (d) the 4 oldest r7-stale keys, in their r7-window order (the next
# two, q_dedup_graph_degree and q_text_jaccard_topk, were displaced by
# the two late-landing r13 keys and lead _SECOND_WAVE for r14).
# Keys after position 50 keep local parity (tools/parity.py) as their
# regression net; tests/test_registry_order.py pins this window.
HARD_SIGNAL_FIRST_50 = [
    # --- (a) round-13 operators (zero driver evidence) ---
    "q_dedup_semantic",
    "q_dedup_semantic_cells",
    "q_text_bpe_train",
    "q_text_decontaminate_external",
    "q_gov_forget_audit",
    "q_stream_sliding_availablenow",
    # --- (b) code changed r13, driver evidence (r12) predates it ---
    "q_text_substring_dedup",
    "q_text_decontaminate",
    "q_stream_tumbling_availablenow",
    "q_stream_sessionize_availablenow",
    "q_lake_zorder_write",
    # --- (c) the 35 remaining r6-stale keys, in their r6-window order ---
    "q_ts_interpolate",
    "q_sample_systematic",
    "q_sample_stratified",
    "q_mix_sources",
    "q_merge_upsert",
    "q_ts_holt",
    "q_ts_downsample_triangle",
    "q_join_asof_nearest",
    "q_agg_gini",
    "q_ts_seasonality",
    "q_vec_outliers",
    "q_win_drawdown",
    "q_text_ngram_novelty",
    "q_ts_concurrency",
    "q_ts_forecast_snaive",
    "q_agg_hhi",
    "q_join_scd2_pointintime",
    "q_ts_cusum",
    "q_ts_rollup_multigrain",
    "q_ts_mom_growth",
    "q_vec_kmeans_step",
    "q_ts_transitions",
    "q_ts_ewma",
    "q_win_moving_median",
    "q_pii_mask",
    "q_vec_quantize_int8",
    "q_text_token_entropy",
    "q_agg_weighted_median",
    "q_dedup_containment",
    "q_vec_range_search",
    "q_ts_vwap",
    "q_ts_attribution",
    "q_mv_incremental",
    "q_customer_rfm",
    "q_win_streaks",
    # --- (d) oldest r7-stale, in r7-window order ---
    "q_dedup_containment_prefix",
    "q_catalog_partition_profile",
    "q_ts_acf",
    "q_ts_max_gap",
]

# Next in line for round 14: the 42 remaining r7-stale keys in their
# r7-window order -- once THEY land (and the wave after), the registry's
# evidence floor reaches r9.
_SECOND_WAVE = [
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
