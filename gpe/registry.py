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
# (verified r1-r10: CORRECTNESS_r0N covers precisely registry indices 0-49),
# so registry order decides which keys get hard correctness signal.
# Round-11 window (VERDICT r10 next-round #1), composition 1+11+5+2+31:
# (a) q_ml_knn_eval FIRST -- rewritten r10 AFTER its last driver hash (r9)
# and extended r11 with the in-plan prefilter-bound guard: the registry's
# only stale-evidence-vs-HEAD key two rounds running until this lands;
# (b) the 11 operators NEW this round (zero driver evidence);
# (c) the 5 keys whose CODE CHANGED in r11 (two-stage head cuts for
# zipf/bpe, two-pass rewrites for calibration/ks/skyline -- changed keys
# outrank stale re-checks, the currency policy);
# (d) the 2 r4-stale set-ops deferred from the r10 window;
# (e) the 31 oldest r5-stale keys in prior _SECOND_WAVE order.
# After this window lands, every key's latest driver evidence is r5+ with
# only 18 r5-stale keys left (staged below for r12). Keys after position 50
# keep local parity (tools/parity.py) as their regression net;
# tests/test_registry_order.py pins this window.
HARD_SIGNAL_FIRST_50 = [
    # --- (a) rewritten r10+r11, driver evidence predates both changes ---
    "q_ml_knn_eval",
    # --- (b) round-11 operators (zero driver evidence) ---
    "q_vec_knn_filtered",
    "q_dedup_delta",
    "q_pack_bestfit",
    "q_ml_ndcg",
    "q_agg_mutual_info",
    "q_text_dup_ngram_coverage",
    "q_rag_rank_fusion",
    "q_privacy_k_anon",
    "q_dedup_sketch_calibration",
    "q_ml_hard_negatives",
    "q_lake_zorder",
    # --- (c) code changed r11 (latest evidence r9/r10, now stale) ---
    "q_text_zipf_fit",
    "q_text_bpe_encode",
    "q_ml_calibration",
    "q_ml_ks",
    "q_agg_skyline",
    # --- (d) r4-stale set-ops (oldest evidence in the registry) ---
    "q_distinct_dropdup",
    "q_except",
    # --- (e) r5-stale (latest driver evidence round 5) ---
    "q_vec_ann_lsh",
    "q_vec_ann_recall",
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
]

# Next in line for round 12: the 18 remaining r5-stale keys -- once THEY
# land, the whole registry's evidence is r6+. r6+-green keys fall to the
# tail automatically. (The first six were displaced from the r11 window
# by the nine late-landing r11 operators, so they lead the wave in their
# original window order.)
_SECOND_WAVE = [
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
