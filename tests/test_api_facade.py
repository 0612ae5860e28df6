"""gpe.api.LakeAPI — the reference-shaped endpoint façade (SURVEY §0.2).

The façade must stay a pure composition layer: every endpoint returns a
lazy DataFrame whose semantics equal the underlying declared operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpe.api import LakeAPI
from tests.conftest import SF_T2


@pytest.fixture()
def api(spark):
    return LakeAPI(spark, SF_T2)


def test_list_datasets_covers_the_lake(api):
    rows = {r.table_name: r for r in api.list_datasets().collect()}
    assert len(rows) == 10
    assert rows["lineitem"].n_rows > 0
    assert rows["embeddings"].format == "parquet"


def test_dataset_schema_filters_and_rejects_unknown(api):
    cols = api.dataset_schema("events").collect()
    assert {r.column_name for r in cols} >= {"event_id", "ts", "user_id"}
    assert all(r.table_name == "events" for r in cols)
    with pytest.raises(KeyError):
        api.dataset_schema("nope")
    with pytest.raises(KeyError):
        api.table("nope")


def test_query_endpoint_filters_projects_and_pages(api):
    page = api.query(
        "orders",
        columns=["o_orderkey", "o_totalprice"],
        where="o_totalprice > 100000",
        order_by=["o_orderkey"],
        limit=10,
        offset=5,
    ).collect()
    assert len(page) == 10
    assert all(r.o_totalprice > 100000 for r in page)
    keys = [r.o_orderkey for r in page]
    assert keys == sorted(keys)
    # pagination is keyset-stable: page 0 ends before this page starts
    first = api.query(
        "orders",
        columns=["o_orderkey"],
        where="o_totalprice > 100000",
        order_by=["o_orderkey"],
        limit=5,
    ).collect()
    assert first[-1].o_orderkey < keys[0]


def test_sql_endpoint_matches_dataframe_path(api, spark):
    got = api.sql(
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity > 45"
    ).collect()[0].n
    want = api.table("lineitem").filter(F.col("l_quantity") > 45).count()
    assert got == want


def test_series_endpoints_delegate_to_declared_operators(api, spark):
    from gpe import timeseries

    day = api.series_rollup("day")
    assert day.count() > 0
    assert {r.grain for r in day.select("grain").distinct().collect()} == {
        "day"
    }
    assert api.series_vwap().count() == timeseries.q_ts_vwap(
        spark, SF_T2
    ).count()
    assert api.pricing_summary().count() == 6


def test_query_pushes_predicates_to_the_scan(api):
    df = api.query(
        "lineitem",
        columns=["l_orderkey", "l_quantity"],
        where="l_shipdate >= '1996-01-01'",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]


# ---- r8 (VERDICT r7 #8): every retrieval endpoint proves scan-level
# pruning in its PLAN, so the façade can't silently regress into full
# scans ----


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _read_schema(df):
    plan = _plan(df)
    assert "ReadSchema" in plan, plan
    return plan.split("ReadSchema:")[1].splitlines()[0]


def test_query_prunes_scan_to_requested_columns(api):
    rs = _read_schema(
        api.query("lineitem", columns=["l_orderkey", "l_quantity"])
    )
    assert "l_orderkey" in rs and "l_quantity" in rs
    # a full 11-column lineitem scan for a 2-column projection is the
    # regression this guards against
    assert "l_comment" not in rs and "l_extendedprice" not in rs
    assert "l_shipdate" not in rs


def test_query_orderby_nonselected_column_still_prunes(api):
    # ADVICE r7 fix: ordering by a column outside the projection works
    # AND the scan reads only {projection ∪ ordering} columns
    df = api.query(
        "orders", columns=["o_orderkey"], order_by=["o_orderdate"], limit=5
    )
    rs = _read_schema(df)
    assert "o_orderkey" in rs and "o_orderdate" in rs
    assert "o_totalprice" not in rs and "o_custkey" not in rs
    rows = df.collect()
    assert len(rows) == 5
    assert list(rows[0].asDict()) == ["o_orderkey"]


def test_query_filter_plus_projection_pushdown(api):
    df = api.query(
        "orders",
        columns=["o_orderkey"],
        where="o_orderstatus = 'F'",
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters")[1][:300]
    rs = _read_schema(df)
    assert "o_totalprice" not in rs


def test_paged_listing_compiles_to_topk_not_full_sort(api):
    # offset+limit over an ordered scan must become TakeOrderedAndProject
    # (bounded top-k) — never a global Sort materialization
    df = api.top_orders_page(page=2, size=50)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    rs = _read_schema(df)
    assert "o_orderdate" not in rs and "o_orderstatus" not in rs
    rows = df.collect()
    assert len(rows) == 50
    keys = [r.o_orderkey for r in rows]
    assert keys == sorted(keys) and keys[0] >= 100


def test_sql_endpoint_pushes_predicates(api):
    df = api.sql(
        "SELECT l_orderkey FROM lineitem WHERE l_quantity > 45"
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:300]
    rs = _read_schema(df)
    assert "l_extendedprice" not in rs


def test_series_rollup_prunes_event_scan(api):
    df = api.series_rollup("day")
    rs = _read_schema(df)
    # the ladder needs ts + value only — user_id/props must be pruned
    assert "ts" in rs and "value" in rs
    assert "props" not in rs and "user_id" not in rs


def test_search_endpoint_prunes_and_heaps(api):
    """GET /search delegates to the BM25 operator: the scan must read
    only the columns the ranking needs (text + doc_id) and the top-k
    must compile to TakeOrderedAndProject, not a global sort."""
    df = api.search()
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    rs = _read_schema(df)
    assert "text" in rs and "doc_id" in rs
    assert "lang" not in rs and "source" not in rs
    assert len(df.limit(25).collect()) == 20


def test_corpus_quality_endpoint_prunes_scan(api):
    df = api.corpus_quality()
    rs = _read_schema(df)
    assert "text" in rs and "doc_id" in rs
    assert "lang" not in rs and "n_chars" not in rs


def test_table_changes_endpoint_summarizes(api):
    rows = api.table_changes().collect()
    kinds = {r.change_type for r in rows}
    assert kinds <= {"added", "removed", "changed", "unchanged"}
    assert "changed" in kinds and "added" in kinds


def test_r8_endpoints_delegate_to_declared_operators(api, spark):
    """Every late-r8 endpoint must be a pure delegation — row-for-row
    equal to its declared operator (the façade adds no logic)."""
    import __spark_entry__ as spec

    qs = spec.queries()
    pairs = [
        (api.corpus_gate(), "q_pipeline_quality_gate"),
        (api.corpus_readability(), "q_text_readability"),
        (api.model_metrics(), "q_ml_class_metrics"),
        (api.join_graph(), "q_catalog_fk_infer"),
        (api.data_quality(), "q_catalog_quality_checks"),
        (api.series_changepoints(), "q_ts_changepoint"),
    ]
    for got_df, key in pairs:
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, qs[key](spark, api.sf_dir).collect()))
        assert got == want and len(got) > 0, key


def test_series_trend_stitches_slope_and_significance(api, spark):
    """The trend panel joins Theil-Sen and Mann-Kendall on the group key
    — one row per priority carrying both the slope and its z."""
    rows = api.series_trend().collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_pairs > 0 and r.var_s > 0
        assert r.slope_c_per_month is not None and r.z_stat is not None


def test_r9_endpoints_delegate_to_declared_operators(api, spark):
    """Every r9 endpoint must be pure delegation — row-for-row equal to
    its declared operator (the façade adds no logic)."""
    import __spark_entry__ as spec

    qs = spec.queries()
    pairs = [
        (api.model_eval(), "q_ml_auc"),
        (api.model_calibration(), "q_ml_calibration"),
        (api.audit_sample(), "q_sample_weighted"),
        (api.contamination_radius(), "q_graph_bfs_layers"),
        (api.activity_profile(), "q_ts_interarrival"),
        (api.traffic_mix(), "q_ts_mix_entropy"),
    ]
    for got_df, key in pairs:
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, qs[key](spark, api.sf_dir).collect()))
        assert got == want and len(got) > 0, key


def test_drift_report_appends_ks_row(api):
    """The drift panel is the 10 PSI bands plus the KS summary as band
    −1 — one frame, uniform schema."""
    rows = sorted(api.drift_report().collect(), key=lambda r: r.bin)
    assert [r.bin for r in rows] == [-1] + list(range(10))
    ks = rows[0]
    assert 0 <= ks.psi_term_e6 <= 1_000_000  # KS stat in e6 fixed point
    # exact e6 fixed point (ADVICE r9): must equal the integer floor
    # quotient of the KS row's exact integers, not a truncated double
    from gpe import ml as _ml

    ks_row = _ml.q_ml_ks(api.spark, api.sf_dir).collect()[0]
    assert ks.psi_term_e6 == (ks_row.d_num * 1_000_000) // (
        ks_row.na * ks_row.nb
    )


def test_r11_endpoints_delegate_to_declared_operators(api, spark):
    import __spark_entry__ as spec

    qs = spec.queries()
    pairs = [
        (api.filtered_search(), "q_vec_knn_filtered"),
        (api.ingest_dedup_screen(), "q_dedup_delta"),
    ]
    for got_df, key in pairs:
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, qs[key](spark, api.sf_dir).collect()))
        assert got == want and len(got) > 0, key


def test_r10_endpoints_delegate_to_declared_operators(api, spark):
    import __spark_entry__ as spec

    qs = spec.queries()
    pairs = [
        (api.tokenize_corpus(), "q_text_bpe_encode"),
        (api.pii_screen(), "q_text_pii_screen"),
        (api.diversity_sample(), "q_sample_cluster_balanced"),
        (api.embedding_truncation_audit(), "q_vec_matryoshka_recall"),
        (api.media_near_duplicates(), "q_multimodal_phash"),
        (api.dataset_freshness(), "q_catalog_freshness"),
        (api.key_audit(), "q_catalog_pk_infer"),
        (api.corpus_zipf(), "q_text_zipf_fit"),
        (api.robust_order_stats(), "q_agg_winsorized"),
    ]
    for got_df, key in pairs:
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, qs[key](spark, api.sf_dir).collect()))
        assert got == want and len(got) > 0, key


def test_late_r9_endpoints_delegate_to_declared_operators(api, spark):
    import __spark_entry__ as spec

    qs = spec.queries()
    pairs = [
        (api.series_anomalies(), "q_ts_anomaly_seasonal"),
        (api.supplier_frontier(), "q_agg_skyline"),
        (api.model_knn_eval(), "q_ml_knn_eval"),
        (api.boilerplate_paragraphs(), "q_text_dup_paragraphs"),
        (api.storage_dedup_report(), "q_multimodal_dedup"),
        (api.fulfillment_lag(), "q_join_ship_lag"),
        (api.column_entropy(), "q_catalog_column_entropy"),
    ]
    for got_df, key in pairs:
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, qs[key](spark, api.sf_dir).collect()))
        assert got == want and len(got) > 0, key


def test_r12_endpoints_delegate_to_declared_operators(api, spark):
    import __spark_entry__ as spec

    qs = spec.queries()
    pairs = [
        (api.substring_duplicates(), "q_text_substring_dedup"),
        (api.decontamination_report(), "q_text_decontaminate"),
        (api.vector_index_delta(), "q_vec_index_delta"),
        (api.zorder_optimize(), "q_lake_zorder_write"),
        (api.quality_model_filter(), "q_ml_quality_fit"),
        (api.hourly_rollup_backfill(), "q_stream_tumbling_availablenow"),
    ]
    for got_df, key in pairs:
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, qs[key](spark, api.sf_dir).collect()))
        assert got == want and len(got) > 0, key


def test_r13_endpoints_delegate_to_declared_operators(api, spark):
    import __spark_entry__ as spec

    qs = spec.queries()
    pairs = [
        (api.semantic_duplicates(), "q_dedup_semantic"),
        (api.tokenizer_train_trajectory(), "q_text_bpe_train"),
        (
            api.benchmark_decontamination_report(),
            "q_text_decontaminate_external",
        ),
        (api.forget_audit(), "q_gov_forget_audit"),
        (api.semantic_cell_report(), "q_dedup_semantic_cells"),
        (api.sliding_rollup_backfill(), "q_stream_sliding_availablenow"),
    ]
    for got_df, key in pairs:
        got = sorted(map(tuple, got_df.collect()))
        want = sorted(map(tuple, qs[key](spark, api.sf_dir).collect()))
        assert got == want and len(got) > 0, key


def test_r14_endpoints_delegate_to_declared_operators(api, spark):
    import __spark_entry__ as spec

    qs = spec.queries()
    pairs = [
        (api.semantic_recall_report(), "q_dedup_semantic_recall"),
        (api.ingest_dedup_backfill(), "q_stream_dedup_availablenow"),
        (api.forget_corpus(), "q_gov_forget_corpus"),
    ]

    def nsafe(t):  # the recall ROLLUP total row carries a NULL sim_bin
        return tuple((v is None, v) for v in t)

    for got_df, key in pairs:
        got = sorted(map(tuple, got_df.collect()), key=nsafe)
        want = sorted(
            map(tuple, qs[key](spark, api.sf_dir).collect()), key=nsafe
        )
        assert got == want and len(got) > 0, key
