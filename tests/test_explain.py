"""Plan-shape assertions (SURVEY.md §4.1, §5.4) — cheap optimizer
regression checks: pushdown, pruning, broadcast, top-k, partial aggregation.
These guard the 100 TB properties that correctness tests can't see."""

from __future__ import annotations

import pytest

import __spark_entry__ as spec

SF = "/root/testdata/sf0.01"
_Q = spec.queries()


def _executed_plan(spark, key: str) -> str:
    df = _Q[key](spark, SF)
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_plan(spark, key: str) -> str:
    return _Q[key](spark, SF)._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    df = _Q["q_filter_conj"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    # at least the shipdate range must be pushed
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_column_pruning_in_read_schema(spark):
    df = _Q["q_scan_projected"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs and "l_shipdate" in rs
    assert "l_extendedprice" not in rs  # untouched columns stay unread


def test_dim_join_broadcasts(spark):
    plan = _executed_plan(spark, "q_join_inner_bcast")
    assert "BroadcastHashJoin" in plan


def test_star_join_broadcasts_all_dims(spark):
    plan = _executed_plan(spark, "q_join_multiway_star")
    # customer, nation, region hints → 3 broadcast joins
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_avoids_global_sort(spark):
    plan = _executed_plan(spark, "q_sort_multi")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_agg_is_partial_plus_final(spark):
    plan = _executed_plan(spark, "q_agg_groupby")
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_no_accidental_cartesian(spark):
    """Only the explicitly-cartesian queries may plan a cartesian/BNLJ over
    non-broadcast inputs."""
    allowed = {
        "q_join_cross_limited",  # declared cartesian (5×25)
        "q_join_interval",       # broadcast interval table BNLJ by design
        "q_join_theta_range",    # equi on user_id + range residual
    }
    for key in ("q_join_multiway_star", "q_join_inner_shuffle", "q_agg_groupby"):
        plan = _optimized_plan(spark, key)
        assert "CartesianProduct" not in plan, key


def test_semi_anti_compile_to_semi_joins(spark):
    assert "LeftSemi" in _optimized_plan(spark, "q_join_semi")
    assert "LeftAnti" in _optimized_plan(spark, "q_join_anti")


def test_scan_counts_are_metadata_only(spark):
    """Table row counts compile to parquet-metadata aggregates (no column
    data materialized)."""
    phys = _executed_plan(spark, "q_scan_all_tables_counts")
    assert "ReadSchema: struct<>" in phys


def test_chunk_windows_is_shuffle_free(spark):
    """q_text_chunk_windows claims a pure map-side plan — no Exchange of
    any kind may appear (the chunker must scale with the scan alone)."""
    phys = _executed_plan(spark, "q_text_chunk_windows")
    assert "Exchange" not in phys


def test_components_candidate_edges_have_no_allpairs_join(spark):
    """Both connected-components variants consume the MinHash band-join
    candidate seam (gpe.dedup._band_candidate_pairs) — the candidate-edge
    plan must contain no all-pairs mask×mask join (CartesianProduct /
    BroadcastNestedLoopJoin), the r2-flagged open-vocabulary scale killer."""
    from gpe.dedup import _band_candidate_pairs, _mask_sig_supernodes
    from gpe.io import load_table

    d = load_table(spark, SF, "documents")
    cand = _band_candidate_pairs(_mask_sig_supernodes(d))
    cand.collect()  # let AQE finalize
    phys = cand._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_merge_upsert_never_shuffles_the_base(spark):
    """q_merge_upsert's copy-on-write decomposition: the base table may
    only ever be the streamed side of broadcast hash joins — no sort-merge
    / shuffled-hash join and no hash-partitioning exchange anywhere (a
    FULL OUTER formulation silently falls back to SortMergeJoin: full
    shuffle of the billion-row base)."""
    phys = _executed_plan(spark, "q_merge_upsert")
    assert "SortMergeJoin" not in phys
    assert "ShuffledHashJoin" not in phys
    assert "Exchange hashpartitioning" not in phys
    assert "BroadcastHashJoin" in phys


def test_approx_quantile_audit_has_no_per_flag_window_sort(spark):
    """q_agg_approx_quantile's exact-rank audit must use the two-pass
    range-partition pattern (VERDICT r4 #5): a range repartition on
    (flag, price) exists, and no window sorts on the bare 3-value flag
    (which would funnel ~n/3 rows through single tasks at scale)."""
    phys = _executed_plan(spark, "q_agg_approx_quantile")
    assert "rangepartitioning(l_returnflag" in phys
    # local ranking windows must be keyed by (pid, flag), never flag alone
    import re

    for m in re.finditer(r"Window \[row_number\(\)[^\]]*partitionBy=\[([^\]]*)\]", phys):
        assert "pid" in m.group(1), m.group(0)


def test_partition_profile_write_enables_partition_pruning(spark):
    """q_catalog_partition_profile writes a Hive-partitioned layout; a
    filtered readback must prune to ONE partition directory
    (PartitionFilters reach the scan) — the §4.1 partition-pruning
    feature the single-file test inputs can't otherwise exercise."""
    import os

    from pyspark.sql import functions as F

    from gpe.common import scratch_path

    _Q["q_catalog_partition_profile"](spark, SF)  # performs the write
    path = scratch_path(f"partition_profile_{os.path.basename(SF)}")
    back = spark.read.parquet(path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1][:200]
    assert "o_orderpriority" in pf, pf
    # the filter must NOT degrade to a post-scan data filter only
    assert back.count() > 0


def test_bucketed_colocated_join_has_no_join_exchange(spark):
    """q_join_bucketed_colocated: with broadcast disabled, the ONLY
    Exchange in the plan may be the post-join aggregation shuffle — the
    join itself must read the co-located buckets (zero join-side
    exchange, the layout's whole point)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _Q["q_join_bucketed_colocated"](spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        # everything BELOW the join (its inputs) must be exchange-free
        assert "SortMergeJoin" in plan, plan[:500]
        assert "Exchange" not in join_part, join_part[:800]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_acf_stacks_lags_without_self_join(spark):
    """q_ts_acf: the 7 lags must stack via one explode over the lag
    window — a 7-way self-join of the daily frame (or any join at all)
    is the shape this key exists to avoid."""
    phys = _executed_plan(spark, "q_ts_acf")
    assert "Join" not in phys, phys[:400]
    # AQE's toString prints the final AND initial plan of the same tree,
    # so the single events scan appears at most twice
    assert phys.count("FileScan parquet") <= 2


def test_max_gap_is_single_shuffle_argmax(spark):
    """q_ts_max_gap: lag window and final aggregate share the user_id
    partitioning; no join, no rank re-sort window after the argmax."""
    phys = _executed_plan(spark, "q_ts_max_gap")
    assert "Join" not in phys
    assert phys.count("Exchange hashpartitioning") <= 2


def test_vocab_coverage_uses_range_partitioned_prefix_sum(spark):
    """q_text_vocab_coverage: both prefix columns must come from the
    two-pass range partitioning, never a global ORDER BY window over the
    type table."""
    phys = _executed_plan(spark, "q_text_vocab_coverage")
    assert "rangepartitioning" in phys


def test_cohort_ltv_broadcasts_the_cohort_spine(spark):
    """q_ts_cohort_ltv: the signup cohort spine joins as a broadcast —
    a shuffle join on user_id would re-shuffle the purchase fact side."""
    phys = _executed_plan(spark, "q_ts_cohort_ltv")
    assert "BroadcastHashJoin" in phys
    assert "SortMergeJoin" not in phys


def test_pmi_has_no_allpairs_join(spark):
    """q_text_cooccurrence_pmi: pairs come from the doc_id equi-self-join
    only; df/N attach via broadcasts."""
    phys = _executed_plan(spark, "q_text_cooccurrence_pmi")
    assert "CartesianProduct" not in phys


def test_audio_windows_is_shuffle_free(spark):
    """q_multimodal_audio_windows: scan → mapInPandas, partition-
    preserving — zero exchanges anywhere (the decode cost parallelizes
    with the scan)."""
    phys = _executed_plan(spark, "q_multimodal_audio_windows")
    assert "Exchange" not in phys


def test_pca_power_has_no_fact_side_shuffle_join(spark):
    """q_vec_pca_power: the only joins are 1-row broadcasts (corpus count
    and norm); the accumulation is one (pos)-keyed aggregate."""
    phys = _executed_plan(spark, "q_vec_pca_power")
    assert "SortMergeJoin" not in phys
    assert "CartesianProduct" not in phys


def test_containment_prefix_has_no_allpairs_join(spark):
    """q_dedup_containment_prefix is the open-vocabulary containment path:
    candidates must come from the prefix-token equi-join over supernodes —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere (the closed-
    vocab sibling q_dedup_containment does an all-pairs mask scan behind a
    runtime guard; this key must never)."""
    phys = _executed_plan(spark, "q_dedup_containment_prefix")
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_ngram_lsh_has_no_allpairs_join(spark):
    """q_dedup_ngram_lsh is the open-vocabulary banded path: candidates
    must come from the band-key equi-join only — no CartesianProduct /
    BroadcastNestedLoopJoin anywhere in the plan (otherwise it degenerates
    to the all-pairs scale killer it exists to avoid)."""
    phys = _executed_plan(spark, "q_dedup_ngram_lsh")
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_global_rank_has_no_unpartitioned_window(spark):
    """The two-pass global ntile/percent_rank may only sort WITHIN range
    partitions or over the 32-row offset table — never a global
    single-partition sort of the data (round-1 regression)."""
    phys = _executed_plan(spark, "q_win_ntile_pctrank")
    # the two-pass signature: a range repartition exists, and every
    # SinglePartition exchange sits above an aggregate (the 32-row count
    # tables), never directly above the customer scan — i.e. no global
    # single-task sort of the data
    assert "rangepartitioning(c_acctbal" in phys
    import re

    for m in re.finditer(r"Exchange SinglePartition", phys):
        tail = phys[m.end():m.end() + 600]
        assert "HashAggregate" in tail or "InMemoryTableScan" in tail, (
            phys[m.start():m.start() + 800]
        )


def _final_plan(phys: str) -> str:
    """AQE plan strings print '== Final Plan ==' followed by
    '== Initial Plan ==' — counting on the whole string double-counts
    every operator. Count on the final section only."""
    return phys.split("== Initial Plan ==")[0]


def test_mv_incremental_view_never_reshuffles(spark):
    """q_mv_incremental's IVM plan: exactly the two groupBy shuffles (old
    view + change-batch delta aggregate) and NO sort-merge join — the
    delta merges onto the view via broadcast, and the merged table is
    never scanned or shuffled (the whole point of IVM at 100 TB)."""
    phys = _executed_plan(spark, "q_mv_incremental")
    assert "SortMergeJoin" not in phys
    assert "ShuffledHashJoin" not in phys
    assert "BroadcastHashJoin" in phys
    assert _final_plan(phys).count("Exchange hashpartitioning") <= 2


def test_range_search_is_shuffle_free(spark):
    """q_vec_range_search: broadcast query side + linear corpus scan — no
    shuffle of any kind (the top-k rank exchange must be absent; that's
    the operator's advantage over kNN). The BroadcastNestedLoopJoin is
    the declared 10-row-broadcast × corpus scan, not an accident."""
    phys = _executed_plan(spark, "q_vec_range_search")
    assert "Exchange hashpartitioning" not in phys
    assert "Exchange rangepartitioning" not in phys
    assert "SortMergeJoin" not in phys


def test_attribution_single_user_shuffle(spark):
    """q_ts_attribution: ONE hash exchange on user_id feeds the window;
    the purchase filter and gap arithmetic run map-side above it."""
    phys = _executed_plan(spark, "q_ts_attribution")
    assert _final_plan(phys).count("Exchange hashpartitioning") == 1


def test_vwap_window_runs_post_agg(spark):
    """q_ts_vwap: one shuffle for the month groupBy (with a map-side
    partial HashAggregate); the running-ratio window's single-partition
    exchange sits above the months-cardinality aggregate, never above the
    lineitem scan."""
    phys = _executed_plan(spark, "q_ts_vwap")
    assert _final_plan(phys).count("Exchange hashpartitioning") == 1
    assert _final_plan(phys).count("HashAggregate") >= 2
    import re

    for m in re.finditer(r"Exchange SinglePartition", phys):
        tail = phys[m.end():m.end() + 600]
        assert "HashAggregate" in tail or "AQEShuffleRead" in tail, (
            phys[m.start():m.start() + 800]
        )


def test_ann_rerank_shortlists_broadcast(spark):
    """All three ANN rerank plans (IVF / LSH / PQ) pin the shortlist side
    with an explicit broadcast hint (VERDICT r3 #5): the join against the
    full embeddings table must be a BroadcastHashJoin with NO shuffle-based
    join anywhere — stats-independent, so a billion-vector table with stale
    stats can't degrade the rerank to a full shuffle."""
    for key in ("q_vec_ann_ivf", "q_vec_ann_lsh", "q_vec_ann_pq"):
        phys = _executed_plan(spark, key)
        assert "SortMergeJoin" not in phys, key
        assert "ShuffledHashJoin" not in phys, key
        assert phys.count("BroadcastHashJoin") >= 2, key


def test_pii_mask_is_pure_map(spark):
    """q_pii_mask: zero exchanges of any kind, no Python boundary — a
    per-row privacy pass must stream through whole-stage codegen."""
    phys = _executed_plan(spark, "q_pii_mask")
    assert "Exchange" not in phys
    assert "EvalPython" not in phys


def test_weighted_median_has_no_per_group_window(spark):
    """q_agg_weighted_median: the cumulative sum runs under a RANGE
    repartition with (_pid, flag)-partitioned local windows — never a
    Window partitioned by the 3-value flag alone over the fact rows
    (that would funnel each group through one task). The only hash
    exchanges are the offset/total aggregates over the partition-count-
    bounded counts frame."""
    phys = _final_plan(_executed_plan(spark, "q_agg_weighted_median"))
    assert phys.count("Exchange rangepartitioning") == 1
    assert "windowspecdefinition(_pid" in phys
    assert phys.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in phys


def test_moving_median_window_runs_post_agg(spark):
    """q_win_moving_median: daily groupBy (map-side partial) + the
    priority-partitioned frame window — two exchanges total, both over
    the collapsed daily frame, none over raw orders."""
    phys = _final_plan(_executed_plan(spark, "q_win_moving_median"))
    assert phys.count("Exchange hashpartitioning") == 2
    assert phys.count("HashAggregate") >= 2


def test_transitions_three_bounded_exchanges(spark):
    """q_ts_transitions: user_id lag shuffle → (from,to) matrix aggregate
    (map-side partial) → per-from probability window over the ≤|types|²
    frame. Three hash exchanges, the last two over collapsed frames."""
    phys = _final_plan(_executed_plan(spark, "q_ts_transitions"))
    assert phys.count("Exchange hashpartitioning") == 3
    assert phys.count("HashAggregate") >= 2


def test_ewma_scan_runs_post_agg(spark):
    """q_ts_ewma: one daily-aggregate shuffle (partial agg) + the
    event_type-partitioned prefix scan over the post-agg frame."""
    phys = _final_plan(_executed_plan(spark, "q_ts_ewma"))
    assert phys.count("Exchange hashpartitioning") == 2
    assert phys.count("HashAggregate") >= 2


def test_quantize_int8_single_shuffle_no_python(spark):
    """q_vec_quantize_int8: per-vector math in JVM higher-order array
    functions (no Python boundary), one label-groupBy shuffle with a
    map-side partial aggregate."""
    phys = _final_plan(_executed_plan(spark, "q_vec_quantize_int8"))
    assert phys.count("Exchange hashpartitioning") == 1
    assert phys.count("HashAggregate") >= 2
    assert "EvalPython" not in phys


def test_token_entropy_reuses_doc_partitioning(spark):
    """q_text_token_entropy: (doc_id, token) count shuffle + doc_id window
    shuffle; the final per-doc aggregate reuses the window's doc_id
    partitioning — two exchanges total, not three."""
    phys = _final_plan(_executed_plan(spark, "q_text_token_entropy"))
    assert phys.count("Exchange hashpartitioning") == 2


def test_rollup_multigrain_single_scan_single_shuffle(spark):
    """q_ts_rollup_multigrain: ONE fact scan expanded to the grain tuples
    BEFORE a map-side partial aggregate — one exchange total (a grain
    union would scan and shuffle three times)."""
    phys = _final_plan(_executed_plan(spark, "q_ts_rollup_multigrain"))
    assert phys.count("Exchange hashpartitioning") == 1
    assert phys.count("Expand") == 1
    assert phys.count("HashAggregate") >= 2


def test_mom_growth_window_runs_post_agg(spark):
    """q_ts_mom_growth: one month-aggregate shuffle (partial agg); the
    lag window's single-partition exchange sits above the dozens-of-
    months frame, never above raw orders."""
    phys = _final_plan(_executed_plan(spark, "q_ts_mom_growth"))
    assert phys.count("Exchange hashpartitioning") == 1
    assert phys.count("HashAggregate") >= 2


def test_kmeans_step_assignment_is_broadcast_fold(spark):
    """q_vec_kmeans_step: the codebook broadcasts (BroadcastNestedLoopJoin
    over k rows) and the per-(vector, cell) margin is a map-side array
    fold — no positional explode ever crosses a shuffle, no sort-based
    join anywhere."""
    phys = _final_plan(_executed_plan(spark, "q_vec_kmeans_step"))
    assert phys.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in phys
    assert phys.count("Exchange hashpartitioning") <= 4


def test_scd2_pointintime_is_one_scan_one_shuffle(spark):
    """q_join_scd2_pointintime: the interval predicate collapses to an
    as-of carry — ONE events scan, ONE user_id exchange, zero joins."""
    phys = _final_plan(_executed_plan(spark, "q_join_scd2_pointintime"))
    assert phys.count("Scan parquet") == 1
    assert phys.count("Exchange hashpartitioning") == 1
    assert "Join" not in phys


def test_cusum_windows_run_post_agg(spark):
    """q_ts_cusum: the stacked cum/min windows run over the post-agg
    daily frame; the drift table joins by broadcast (no sort-based
    join)."""
    phys = _final_plan(_executed_plan(spark, "q_ts_cusum"))
    assert "SortMergeJoin" not in phys
    assert phys.count("BroadcastHashJoin") == 1
    assert phys.count("Exchange hashpartitioning") <= 4


def test_forecast_snaive_runs_post_agg(spark):
    """q_ts_forecast_snaive: daily-aggregate shuffle + the type-partition
    lag/score over the post-agg frame — two exchanges, partial aggs."""
    phys = _final_plan(_executed_plan(spark, "q_ts_forecast_snaive"))
    assert phys.count("Exchange hashpartitioning") == 2
    assert phys.count("HashAggregate") >= 2


def test_hhi_broadcasts_the_dimension(spark):
    """q_agg_hhi: orders joins customer by BROADCAST (no shuffle of the
    fact for the join); one (segment, nation) partial-agg shuffle plus
    the segment-frame share window."""
    phys = _final_plan(_executed_plan(spark, "q_agg_hhi"))
    assert phys.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in phys
    assert phys.count("Exchange hashpartitioning") == 2


def test_concurrency_sweep_is_two_pass(spark):
    """q_ts_concurrency: the global sweep runs through the distributed
    prefix sum — range repartition + _pid-local windows, never one
    unpartitioned window over the endpoint stream."""
    phys = _final_plan(_executed_plan(spark, "q_ts_concurrency"))
    assert phys.count("Exchange rangepartitioning") == 1
    assert "windowspecdefinition(_pid" in phys


def test_drawdown_window_runs_post_agg(spark):
    """q_win_drawdown: month aggregate (partial) + the running-max window
    over the months frame; one hash exchange total."""
    phys = _final_plan(_executed_plan(spark, "q_win_drawdown"))
    assert phys.count("Exchange hashpartitioning") == 1
    assert phys.count("HashAggregate") >= 2


def test_ngram_novelty_single_gram_shuffle(spark):
    """q_text_ngram_novelty: map-side gram build (no window), one gram
    shuffle for first-occurrence, one doc aggregate — two exchanges, no
    sort-merge join."""
    phys = _final_plan(_executed_plan(spark, "q_text_ngram_novelty"))
    assert phys.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" not in phys
    assert "Window" not in phys


def test_seasonality_profile_is_post_agg(spark):
    """q_ts_seasonality: daily agg → dow profile agg → share window, all
    with map-side partials; three bounded exchanges, no joins."""
    phys = _final_plan(_executed_plan(spark, "q_ts_seasonality"))
    assert phys.count("Exchange hashpartitioning") == 3
    assert "Join" not in phys


def test_vec_outliers_broadcast_codebook_no_python(spark):
    """q_vec_outliers: the codebook and the threshold table broadcast;
    distance math stays in JVM array folds."""
    phys = _final_plan(_executed_plan(spark, "q_vec_outliers"))
    assert phys.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in phys
    assert "EvalPython" not in phys


def test_gini_ranks_are_two_pass(spark):
    """q_agg_gini: grouped global ranks via range repartition +
    (_pid, segment)-local row_numbers — never a segment-only window over
    the customer frame."""
    phys = _final_plan(_executed_plan(spark, "q_agg_gini"))
    assert phys.count("Exchange rangepartitioning") == 1
    assert "windowspecdefinition(_pid" in phys
    assert "SortMergeJoin" not in phys


def test_asof_nearest_one_shuffle_no_joins(spark):
    """q_join_asof_nearest: both direction carries run over ONE user_id
    shuffle (the second window re-sorts, never re-shuffles); no joins."""
    phys = _final_plan(_executed_plan(spark, "q_join_asof_nearest"))
    assert phys.count("Exchange hashpartitioning") == 1
    assert "Join" not in phys
    assert phys.count("Scan parquet") == 1


def test_partition_pruned_join_uses_dynamic_pruning(spark):
    """q_join_partition_pruned: the fact scan's PartitionFilters must
    carry a dynamicpruningexpression (the runtime dim filter reaches the
    partitioned scan as directory pruning — §4.1's DPP feature, only
    exercisable on a partitioned layout)."""
    from gpe.catalog import q_join_partition_pruned

    df = q_join_partition_pruned(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan
    pf = plan.split("PartitionFilters:")[1][:400]
    assert "dynamicpruningexpression" in pf, pf


def test_bloom_prefilter_verify_stays_broadcast(spark):
    """q_join_bloom_prefilter: the exact verify must be a broadcast semi
    join (never a SortMergeJoin shuffling the fact), and the bloom test
    itself is a map-side Filter over the scanned fact."""
    phys = _executed_plan(spark, "q_join_bloom_prefilter")
    assert "SortMergeJoin" not in phys
    assert "LeftSemi" in phys
    assert "BroadcastHashJoin" in phys or "BroadcastExchange" in phys


def test_theta_bucketed_is_an_equi_join(spark):
    """q_join_theta_bucketed exists to turn the band predicate into an
    equi-join — no cartesian/BNLJ may appear anywhere in its plan."""
    phys = _executed_plan(spark, "q_join_theta_bucketed")
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_multimodal_resize_is_shuffle_free(spark):
    """q_multimodal_resize claims partition-preserving mapInPandas — no
    Exchange of any kind (the resize must scale with the scan alone)."""
    phys = _executed_plan(spark, "q_multimodal_resize")
    assert "Exchange" not in phys


def test_scd2_current_is_one_aggregate(spark):
    """q_cdc_scd2_current: the argmax-as-aggregate shape — no Window, no
    Join anywhere (the whole point vs filtering the interval table)."""
    opt = _optimized_plan(spark, "q_cdc_scd2_current")
    assert "Window" not in opt
    assert "Join" not in opt


def test_active_users_has_no_self_join_rescan(spark):
    """q_ts_active_users: WAU comes from the map-side target-day explode
    + spine broadcast — the only join may be broadcast (days spine and
    the dau⋈wau merge of two tiny aggregates), never a sort-merge
    re-scan of the events table."""
    phys = _executed_plan(spark, "q_ts_active_users")
    assert "CartesianProduct" not in phys
    assert "Generate explode" in phys or "Expand" in phys or "explode" in phys


def test_readability_is_shuffle_free(spark):
    """q_text_readability claims a pure map-side plan (the same shape as
    the chunker/repetition filter) — no Exchange may appear."""
    phys = _executed_plan(spark, "q_text_readability")
    assert "Exchange" not in phys


def test_pairwise_trend_keys_join_on_the_group_key(spark):
    """The Theil-Sen / Mann-Kendall pair generators are self-joins of the
    monthly frame with an EQUALITY on the group key (the range residual
    rides inside the join) — a CartesianProduct would mean the equi key
    fell out of the join condition and the pair step went corpus-
    quadratic across groups."""
    for key in ("q_ts_theilsen", "q_ts_mann_kendall"):
        plan = _optimized_plan(spark, key)
        assert "CartesianProduct" not in plan, key


def test_fk_infer_joins_distinct_key_sets_only(spark):
    """Every fk-infer join must be an equi-join of the two DISTINCT key
    sets (aggregates on both sides) — no cartesian anywhere, and every
    child scan projected to its key column (plus the 1-row count
    broadcasts)."""
    plan = _optimized_plan(spark, "q_catalog_fk_infer")
    assert "CartesianProduct" not in plan
    # the child side scans must be single-column (key-only) reads
    phys = _executed_plan(spark, "q_catalog_fk_infer")
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", phys)
    assert schemas, "expected parquet scans in the fk-infer plan"
    assert all(s.count(",") == 0 for s in schemas), schemas
