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
# (verified r1–r6: CORRECTNESS_r0N covers precisely registry indices 0-49),
# so registry order decides which keys get hard correctness signal.
# Round-7 window (VERDICT r6 next-round #1): (a) operators NEW this round
# (zero driver evidence) at the very front; (b) the 23 keys displaced from
# the r6 window by its second batch — the 8 r2-stale keys FIRST
# (q_win_distinct_count, q_scalar_array/_map/_arrayops, q_agg_collect,
# q_catalog_column_stats, q_multimodal_join/_features — their only driver
# row predates four rounds of module churn), then the r4-green cohort
# (dedup pair/components family, ann_pq, window basics, asof/interval
# joins, rollup/cube/grouping_sets, ntile); (c) fill to 50 with the oldest
# remaining r4-green keys (mode, equi-join family) whose modules changed
# during r5/r6. After this round every key's latest driver row is
# round 4 or newer and the r2-staleness debt is zero.
# Keys after position 50 keep local parity (tools/parity.py) as their
# regression net; tests/test_registry_order.py pins this window.
HARD_SIGNAL_FIRST_50 = [
    # --- new round-7 operators (zero driver evidence) ---
    "q_dedup_containment_prefix",
    "q_catalog_partition_profile",
    "q_ts_acf",
    "q_ts_max_gap",
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
    # --- displaced r6 cohort: the 8 r2-stale keys first ---
    "q_win_distinct_count",
    "q_scalar_array",
    "q_scalar_map",
    "q_scalar_arrayops",
    "q_agg_collect",
    "q_catalog_column_stats",
    "q_multimodal_join",
    "q_multimodal_features",
    # --- displaced r6 cohort: r4-green, modules churned r5/r6 ---
    "q_dedup_near_pairs",
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
    # --- fill: oldest remaining r4-green keys ---
    "q_agg_mode",
    "q_join_inner_bcast",
    "q_join_inner_shuffle",
    "q_join_multiway_star",
]

# Next in line for round 8: the rest of the r4-green cohort, then r5-green
# keys in churned modules. r6-green keys fall to the tail automatically.
_SECOND_WAVE = [
    "q_join_left_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_theta_range",
    "q_join_fuzzy_name",
    "q_join_skew_salted",
    "q_join_lateral",
    "q_agg_groupby",
    "q_scalar_string",
    "q_scalar_date",
    "q_scalar_math",
    "q_explode_tokens",
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
    "q_text_unigram_logprob",
    "q_text_keyphrases",
    "q_pack_sequences",
    "q_text_chunk_windows",
    "q_mix_temperature",
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
