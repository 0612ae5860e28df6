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
):
    _MODULES.append(__import__(f"gpe.{_name}", fromlist=[_name]))


# The driver hash-verifies exactly the FIRST 50 keys of queries() each round
# (CORRECTNESS_r01 stopped at registry index 49), so registry order decides
# which keys get hard correctness signal. Round 1 verified 50 keys in module
# order (io/relational); this explicit priority list front-loads the 61 keys
# the driver never reached — windows, time-series, scalar-array, text, dedup,
# vectors, multimodal, pipeline, catalog, UDF — plus q_agg_collect (whose
# round-1 row was a canonicalizer crash, now fixed via string serialization).
# Keys after position 50 keep local parity (tools/parity.py) as their
# regression net; tests/test_registry_order.py pins this window.
HARD_SIGNAL_FIRST_50 = [
    "q_agg_collect",
    "q_win_cume_nth",
    "q_win_distinct_count",
    "q_win_range_frame",
    "q_win_topk_per_group",
    "q_win_moving_avg_time",
    "q_win_ntile_pctrank",
    "q_win_first_last",
    "q_ts_tumbling",
    "q_ts_ohlc",
    "q_ts_sliding",
    "q_ts_sessionize",
    "q_ts_funnel",
    "q_ts_retention",
    "q_ts_gap_fill",
    "q_ts_interpolate",
    "q_scalar_array",
    "q_scalar_arrayops",
    "q_scalar_map",
    "q_text_stats",
    "q_text_tfidf_topterms",
    "q_text_ngrams",
    "q_text_quality",
    "q_text_langid",
    "q_text_tokencount",
    "q_text_fingerprint",
    "q_text_contamination",
    "q_dedup_exact",
    "q_dedup_near_pairs",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_components",
    "q_dedup_embed_cosine",
    "q_dedup_keep_best",
    "q_vec_knn_brute",
    "q_vec_pairs_threshold",
    "q_vec_centroids",
    "q_vec_ann_ivf",
    "q_vec_ann_lsh",
    "q_multimodal_join",
    "q_multimodal_features",
    "q_sample_systematic",
    "q_sample_stratified",
    "q_mix_sources",
    "q_split_train_val",
    "q_catalog_column_stats",
    "q_udf_pandas_scalar",
    "q_udaf_applyinpandas",
    "q_udf_cogroup",
]

# Next in line once the driver has burned down the list above (round 3+):
# new round-2 operators first, then simple families whose equivalent
# patterns are already driver-green.
_SECOND_WAVE = [
    "q_pack_sequences",
    "q_text_chunk_windows",
    "q_mix_temperature",
    "q_catalog_schema",
    "q_dedup_components_star",
    "q_join_asof_tolerance",
    "q_text_unigram_logprob",
    "q_ts_anomaly_zscore",
    "q_text_keyphrases",
    "q_win_rank",
    "q_win_lag_lead",
    "q_win_running_sum",
    "q_scalar_string",
    "q_scalar_string2",
    "q_scalar_date",
    "q_scalar_math",
    "q_explode_tokens",
    "q_scalar_json",
    "q_agg_conditional",
    "q_except",
    "q_distinct_dropdup",
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
