"""Data-lake API façade — the reference-shaped endpoint surface.

SURVEY.md §0.2 concludes the reference (`informa-agra/GpeDatalakeAPI`) is
a web API over lake storage: dataset listing, schema/catalog endpoints,
filtered retrieval with pagination, and time-series slicing/aggregation.
This module exposes that surface as a thin, typed Python façade over the
declared operators, so a reference user can map endpoints 1:1 onto engine
calls (the HTTP layer itself is out of scope per BASELINE.json:6 — any
server framework can wrap these methods; every method returns a LAZY
DataFrame the caller pages or collects).

Everything here is composition — no operator logic lives in this file;
the driver-scored builders in gpe/* remain the single source of truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpe import catalog as _catalog
from gpe import relational as _relational
from gpe import timeseries as _timeseries
from gpe.io import TABLES, load_table, register_views


class LakeAPI:
    """One façade instance per (session, lake directory)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    # ---- catalog endpoints -------------------------------------------

    def list_datasets(self) -> DataFrame:
        """GET /datasets — name, path, format, schema, row count, size."""
        return _catalog.scan_lake(self.spark, self.sf_dir)

    def dataset_schema(self, name: str | None = None) -> DataFrame:
        """GET /datasets/{name}/schema — information_schema-style column
        report; all tables when name is omitted."""
        report = _catalog.q_catalog_schema(self.spark, self.sf_dir)
        if name is not None:
            if name not in TABLES:
                raise KeyError(f"unknown dataset {name!r}")
            report = report.filter(F.col("table_name") == name)
        return report

    def dataset_profile(self) -> DataFrame:
        """GET /datasets/lineitem/profile — per-column min/max/distinct."""
        return _catalog.q_catalog_column_stats(self.spark, self.sf_dir)

    # ---- data endpoints ----------------------------------------------

    def table(self, name: str) -> DataFrame:
        """Raw dataset handle (schema-on-read)."""
        if name not in TABLES:
            raise KeyError(f"unknown dataset {name!r}")
        return load_table(self.spark, self.sf_dir, name)

    def query(
        self,
        name: str,
        columns: list[str] | None = None,
        where: str | None = None,
        order_by: list[str] | None = None,
        limit: int | None = None,
        offset: int = 0,
    ) -> DataFrame:
        """GET /datasets/{name}?columns=&where=&order=&limit=&offset= —
        filtered, projected, paginated retrieval. `where` is a SQL
        predicate pushed into the scan by Catalyst; ordered pagination
        requires `order_by` (keyset-stable pages need a unique key in
        the order, q_page_orders' contract).

        `where`/`order_by` are raw expressions handed to Catalyst — fine
        for an in-process façade, but a server wrapping this method MUST
        sanitize/allowlist them (they are as powerful as SQL fragments).
        `order_by` is applied BEFORE the projection so ordering by a
        non-selected column works (ADVICE r7); Catalyst resolves the sort
        against the pre-projection schema and prunes it from the output."""
        df = self.table(name)
        if where:
            df = df.filter(where)
        if order_by:
            df = df.orderBy(*order_by)
        if columns:
            df = df.select(*columns)
        if offset:
            df = df.offset(offset)
        if limit is not None:
            df = df.limit(limit)
        return df

    def sql(self, statement: str) -> DataFrame:
        """POST /query — ad-hoc SQL over registered lake views."""
        register_views(self.spark, self.sf_dir)
        return self.spark.sql(statement)

    # ---- time-series endpoints ---------------------------------------

    def series_rollup(self, grain: str = "day") -> DataFrame:
        """GET /series/events?grain=hour|day|month|total — one leg of the
        multi-grain continuous-aggregate ladder."""
        ladder = _timeseries.q_ts_rollup_multigrain(self.spark, self.sf_dir)
        return ladder.filter(F.col("grain") == grain)

    def series_vwap(self) -> DataFrame:
        """GET /series/vwap — monthly + since-inception VWAP."""
        return _timeseries.q_ts_vwap(self.spark, self.sf_dir)

    def series_ohlc(self) -> DataFrame:
        """GET /series/ohlc — daily OHLC rollup."""
        return _timeseries.q_ts_ohlc(self.spark, self.sf_dir)

    def series_downsample(self) -> DataFrame:
        """GET /series/chart — LTTB-style representative points."""
        return _timeseries.q_ts_downsample_triangle(self.spark, self.sf_dir)

    # ---- search / corpus endpoints -----------------------------------

    def search(self) -> DataFrame:
        """GET /search?q=spark+table+query — BM25-ranked top-20 over the
        document corpus (the declared fixed-query scored operator;
        a server layer would template the term list into the same
        scan-shaped plan)."""
        from gpe import text as _text

        return _text.q_text_bm25_search(self.spark, self.sf_dir)

    def corpus_quality(self) -> DataFrame:
        """GET /corpus/quality — per-doc repetition profile (the
        first-pass pretraining filter)."""
        from gpe import text as _text

        return _text.q_text_repetition(self.spark, self.sf_dir)

    def corpus_gate(self) -> DataFrame:
        """GET /corpus/gate — the filter-funnel dashboard: per (source,
        drop_reason) counts and per-source keep shares."""
        from gpe import pipeline as _pipeline

        return _pipeline.q_pipeline_quality_gate(self.spark, self.sf_dir)

    def corpus_readability(self) -> DataFrame:
        """GET /corpus/readability — per-doc Flesch/grade-level
        features."""
        from gpe import text as _text

        return _text.q_text_readability(self.spark, self.sf_dir)

    def model_metrics(self) -> DataFrame:
        """GET /models/langid/metrics — per-class precision/recall/F1 of
        the in-lake language-ID classifier."""
        from gpe import text as _text

        return _text.q_ml_class_metrics(self.spark, self.sf_dir)

    def join_graph(self) -> DataFrame:
        """GET /catalog/join-graph — audited FK/inclusion-dependency
        candidates with containment ratios."""
        return _catalog.q_catalog_fk_infer(self.spark, self.sf_dir)

    def data_quality(self) -> DataFrame:
        """GET /catalog/quality — the per-ingest validation suite (PK
        uniqueness, referential integrity, range checks)."""
        return _catalog.q_catalog_quality_checks(self.spark, self.sf_dir)

    def series_trend(self) -> DataFrame:
        """GET /series/trend — Theil-Sen robust slope + Mann-Kendall
        significance per priority, stitched on the group key (the
        robust-trend panel an ops dashboard draws)."""
        slope = _timeseries.q_ts_theilsen(self.spark, self.sf_dir)
        sig = _timeseries.q_ts_mann_kendall(self.spark, self.sf_dir).select(
            "o_orderpriority", "s_stat", "var_s", "z_stat"
        )
        return slope.join(F.broadcast(sig), "o_orderpriority")

    def series_changepoints(self) -> DataFrame:
        """GET /series/changepoints — the per-type single-changepoint
        report (split day, segment means, shift)."""
        return _timeseries.q_ts_changepoint(self.spark, self.sf_dir)

    def table_changes(self) -> DataFrame:
        """GET /datasets/orders/changes — the two-snapshot time-travel
        diff summary (Delta-CDF/Iceberg-changelog shaped)."""
        from gpe import cdc as _cdc

        return _cdc.q_lake_snapshot_diff(self.spark, self.sf_dir)

    def model_eval(self) -> DataFrame:
        """GET /models/embeddings/eval — per-class one-vs-rest AUC of the
        prototype scorer over the embeddings table."""
        from gpe import ml as _ml

        return _ml.q_ml_auc(self.spark, self.sf_dir)

    def model_calibration(self) -> DataFrame:
        """GET /models/embeddings/calibration — reliability deciles
        (bin size, mean score, positive rate)."""
        from gpe import ml as _ml

        return _ml.q_ml_calibration(self.spark, self.sf_dir)

    def drift_report(self) -> DataFrame:
        """GET /drift — PSI per value band between the two order eras,
        with the two-sample KS row appended as band −1 (one endpoint =
        the full drift panel a monitoring page renders)."""
        from gpe import ml as _ml

        psi = _ml.q_ml_psi(self.spark, self.sf_dir)
        # e6 fixed point from the EXACT integers in the KS row (ADVICE r9:
        # `ks_stat * 1e6` truncated a 6-dp-rounded double one unit low —
        # e.g. 0.084 -> 83999.999... -> 83999). Decimal DIV is an exact
        # integral floor quotient; decimal(38,0) keeps 1e10×1e10-sample
        # products representable.
        ks = _ml.q_ml_ks(self.spark, self.sf_dir).select(
            F.lit(-1).cast("long").alias("bin"),
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            F.expr(
                "(CAST(d_num AS DECIMAL(38,0)) * 1000000) DIV "
                "(CAST(na AS DECIMAL(19,0)) * CAST(nb AS DECIMAL(19,0)))"
            ).cast("long").alias("psi_term_e6"),
        )
        return psi.unionByName(ks)

    def audit_sample(self) -> DataFrame:
        """GET /datasets/orders/sample?weighted=true — the value-weighted
        (PPS) audit sample."""
        from gpe import pipeline as _pipeline

        return _pipeline.q_sample_weighted(self.spark, self.sf_dir)

    def contamination_radius(self) -> DataFrame:
        """GET /corpus/contamination-radius — per-layer counts of docs
        within k duplicate-hops of the flagged seed set."""
        from gpe import dedup as _dedup

        return _dedup.q_graph_bfs_layers(self.spark, self.sf_dir)

    def activity_profile(self) -> DataFrame:
        """GET /users/activity-profile — per-user inter-arrival mean/CV/
        burstiness (the bot-detection feed)."""
        return _timeseries.q_ts_interarrival(self.spark, self.sf_dir)

    def traffic_mix(self) -> DataFrame:
        """GET /series/mix — per-day event-type entropy/evenness."""
        return _timeseries.q_ts_mix_entropy(self.spark, self.sf_dir)

    def model_knn_eval(self) -> DataFrame:
        """GET /models/embeddings/knn-eval — per-label k-NN (k=5)
        neighborhood-purity accuracy."""
        from gpe import ml as _ml

        return _ml.q_ml_knn_eval(self.spark, self.sf_dir)

    def boilerplate_paragraphs(self) -> DataFrame:
        """GET /corpus/boilerplate — cross-document duplicated-paragraph
        groups (sub-document dedup)."""
        from gpe import text as _text

        return _text.q_text_dup_paragraphs(self.spark, self.sf_dir)

    def storage_dedup_report(self) -> DataFrame:
        """GET /media/dedup — block-level duplicate payload blocks and
        reclaimable bytes."""
        from gpe import multimodal as _multimodal

        return _multimodal.q_multimodal_dedup(self.spark, self.sf_dir)

    def fulfillment_lag(self) -> DataFrame:
        """GET /reports/fulfillment-lag — per-priority ship-lag stats."""
        return _relational.q_join_ship_lag(self.spark, self.sf_dir)

    def column_entropy(self) -> DataFrame:
        """GET /catalog/column-entropy — categorical selectivity/skew
        priors per declared column."""
        return _catalog.q_catalog_column_entropy(self.spark, self.sf_dir)

    def series_anomalies(self) -> DataFrame:
        """GET /series/anomalies — seasonality-aware anomaly days
        (residual beyond 1.5× the weekday's mean absolute residual)."""
        return _timeseries.q_ts_anomaly_seasonal(self.spark, self.sf_dir)

    def supplier_frontier(self) -> DataFrame:
        """GET /reports/supplier-frontier — the (revenue ↑, ship lag ↓)
        Pareto shortlist."""
        return _relational.q_agg_skyline(self.spark, self.sf_dir)

    def tokenize_corpus(self) -> DataFrame:
        """GET /corpus/tokenize — per-doc BPE-table encode report
        (token counts + compression vs whitespace)."""
        from gpe import text as _text

        return _text.q_text_bpe_encode(self.spark, self.sf_dir)

    def filtered_search(self) -> DataFrame:
        """GET /vectors/search?filter=… — attribute-filtered top-5
        vector search (the predicate pushed into the IVF probe)."""
        from gpe import vectors as _vectors

        return _vectors.q_vec_knn_filtered(self.spark, self.sf_dir)

    def ingest_dedup_screen(self) -> DataFrame:
        """POST /ingest/dedup-screen — the new-batch slice screened
        against the standing corpus signature index: per-doc
        accepted/duplicate decision + index-upsert counts."""
        from gpe import dedup as _dedup

        return _dedup.q_dedup_delta(self.spark, self.sf_dir)

    def packing_plan_report(self) -> DataFrame:
        """GET /training/packing-plan — best-fit-decreasing vs streaming
        next-fit padding-waste comparison (the offline-re-pack tuning
        number)."""
        from gpe import packing as _packing

        return _packing.q_pack_bestfit(self.spark, self.sf_dir)

    def sketch_calibration_report(self) -> DataFrame:
        """GET /dedup/sketch-calibration — MinHash estimate-vs-exact
        Jaccard error per decile (index-quality audit)."""
        from gpe import dedup as _dedup

        return _dedup.q_dedup_sketch_calibration(self.spark, self.sf_dir)

    def hybrid_search(self) -> DataFrame:
        """GET /vectors/hybrid-search — reciprocal-rank fusion of the
        semantic and lexical legs (fused top-5 per query)."""
        from gpe import vectors as _vectors

        return _vectors.q_rag_rank_fusion(self.spark, self.sf_dir)

    def zorder_audit(self) -> DataFrame:
        """GET /lake/zorder-audit — zone-map quality of z-curve vs
        linear layouts (the OPTIMIZE ZORDER decision table)."""
        from gpe import catalog as _catalog

        return _catalog.q_lake_zorder(self.spark, self.sf_dir)

    def k_anonymity_report(self) -> DataFrame:
        """GET /governance/k-anonymity — quasi-identifier equivalence-
        class census and re-identification risk share."""
        from gpe import catalog as _catalog

        return _catalog.q_privacy_k_anon(self.spark, self.sf_dir)

    def hard_negative_triplets(self) -> DataFrame:
        """GET /ml/hard-negatives — per-query contrastive triplet
        (best positive, hardest negative, margin, violation flag)."""
        from gpe import ml as _ml

        return _ml.q_ml_hard_negatives(self.spark, self.sf_dir)

    def retrieval_ndcg(self) -> DataFrame:
        """GET /ml/retrieval-ndcg — NDCG@10 per query for the
        label-relevance retrieval audit."""
        from gpe import ml as _ml

        return _ml.q_ml_ndcg(self.spark, self.sf_dir)

    def column_mutual_info(self) -> DataFrame:
        """GET /profile/mutual-info — MI/NMI between the status and
        priority columns (feature-redundancy screen)."""
        from gpe import relational as _relational

        return _relational.q_agg_mutual_info(self.spark, self.sf_dir)

    def dup_ngram_report(self) -> DataFrame:
        """GET /corpus/dup-ngram-coverage — per-source duplicate-trigram
        mass (the RefinedWeb-style filter signal)."""
        from gpe import text as _text

        return _text.q_text_dup_ngram_coverage(self.spark, self.sf_dir)

    def pii_screen(self) -> DataFrame:
        """GET /corpus/pii-screen — per-source regex screen (hits per
        pattern class + redacted sample) over the mixed corpus."""
        from gpe import text as _text

        return _text.q_text_pii_screen(self.spark, self.sf_dir)

    def diversity_sample(self) -> DataFrame:
        """GET /datasets/embeddings/sample?balanced=clusters — the
        cluster-balanced quota sample."""
        from gpe import vectors as _vectors

        return _vectors.q_sample_cluster_balanced(self.spark, self.sf_dir)

    def dataset_freshness(self) -> DataFrame:
        """GET /datasets/freshness — per-feed staleness/density panel."""
        from gpe import catalog as _catalog

        return _catalog.q_catalog_freshness(self.spark, self.sf_dir)

    def key_audit(self) -> DataFrame:
        """GET /catalog/keys — candidate-key uniqueness verdicts."""
        from gpe import catalog as _catalog

        return _catalog.q_catalog_pk_infer(self.spark, self.sf_dir)

    def media_near_duplicates(self) -> DataFrame:
        """GET /media/near-duplicates — banded perceptual-hash pairs
        within Hamming 12."""
        from gpe import multimodal as _multimodal

        return _multimodal.q_multimodal_phash(self.spark, self.sf_dir)

    def embedding_truncation_audit(self) -> DataFrame:
        """GET /datasets/embeddings/truncation-audit — matryoshka
        prefix-dim recall@5 vs the full-dim exact top-5."""
        from gpe import vectors as _vectors

        return _vectors.q_vec_matryoshka_recall(self.spark, self.sf_dir)

    def corpus_zipf(self) -> DataFrame:
        """GET /corpus/zipf — head-term power-law fit (slope, r²)."""
        from gpe import text as _text

        return _text.q_text_zipf_fit(self.spark, self.sf_dir)

    def robust_order_stats(self) -> DataFrame:
        """GET /reports/order-value-robust — winsorized/trimmed means
        per priority."""
        return _relational.q_agg_winsorized(self.spark, self.sf_dir)

    def substring_duplicates(self) -> DataFrame:
        """GET /corpus/substring-dups — exact shared-substring spans
        >= 50 tokens per doc pair (the removal-grade dedup report)."""
        from gpe import text as _text

        return _text.q_text_substring_dedup(self.spark, self.sf_dir)

    def vector_index_delta(self) -> DataFrame:
        """GET /vectors/index-delta — nightly-batch cell assignment
        stats + the batch's top-k served from the standing index."""
        from gpe import vectors as _vectors

        return _vectors.q_vec_index_delta(self.spark, self.sf_dir)

    def zorder_optimize(self) -> DataFrame:
        """POST /lake/zorder-optimize — performs the z-order re-layout
        write and returns the achieved-layout audit."""
        from gpe import catalog as _catalog

        return _catalog.q_lake_zorder_write(self.spark, self.sf_dir)

    def quality_model_filter(self) -> DataFrame:
        """GET /corpus/quality-model — in-lake trained linear quality
        filter: fitted weights + keep/drop band histogram."""
        from gpe import ml as _ml

        return _ml.q_ml_quality_fit(self.spark, self.sf_dir)

    def decontamination_report(self) -> DataFrame:
        """GET /corpus/decontaminate — per-source removable sub-document
        duplicate mass under the keep-first span-removal rule."""
        from gpe import text as _text

        return _text.q_text_decontaminate(self.spark, self.sf_dir)

    def hourly_rollup_backfill(self) -> DataFrame:
        """POST /streams/hourly-rollup/backfill — runs the tumbling
        streaming twin to completion (availableNow) and returns the
        materialized hourly rollup."""
        from gpe import streaming as _streaming

        return _streaming.q_stream_tumbling_availablenow(
            self.spark, self.sf_dir
        )

    def semantic_duplicates(self) -> DataFrame:
        """GET /corpus/semantic-duplicates — cluster-bounded embedding
        near-dup keep decisions (SemDeDup composition)."""
        from gpe import dedup as _dedup

        return _dedup.q_dedup_semantic(self.spark, self.sf_dir)

    def tokenizer_train_trajectory(self) -> DataFrame:
        """POST /tokenizer/train?steps=3 — unrolled BPE merge trajectory
        (chosen pair + corpus compression per step)."""
        from gpe import text as _text

        return _text.q_text_bpe_train(self.spark, self.sf_dir)

    def benchmark_decontamination_report(self) -> DataFrame:
        """GET /corpus/decontaminate-external — per-source removable
        span mass of corpus docs against the benchmark slice
        (keep-benchmark)."""
        from gpe import text as _text

        return _text.q_text_decontaminate_external(self.spark, self.sf_dir)

    def forget_audit(self) -> DataFrame:
        """POST /governance/forget — right-to-be-forgotten propagation
        audit: per-table purge counts + residual-reference certification."""
        from gpe import cdc as _cdc

        return _cdc.q_gov_forget_audit(self.spark, self.sf_dir)

    def semantic_cell_report(self) -> DataFrame:
        """GET /corpus/semantic-duplicates/cells — per-cell dup-mass
        rollup (size, removals, pairs, share) for k/τ tuning."""
        from gpe import dedup as _dedup

        return _dedup.q_dedup_semantic_cells(self.spark, self.sf_dir)

    def sliding_rollup_backfill(self) -> DataFrame:
        """POST /streams/sliding-rollup/backfill — runs the sliding
        streaming twin to completion (availableNow) and returns the
        materialized overlapping-window rollup."""
        from gpe import streaming as _streaming

        return _streaming.q_stream_sliding_availablenow(
            self.spark, self.sf_dir
        )

    def semantic_recall_report(self) -> DataFrame:
        """GET /corpus/semantic-duplicates/recall — the cross-cell
        recall audit of cluster-bounded dedup vs global exact pairs
        (per-cosine-bin census + ROLLUP total)."""
        from gpe import dedup as _dedup

        return _dedup.q_dedup_semantic_recall(self.spark, self.sf_dir)

    def ingest_dedup_backfill(self) -> DataFrame:
        """POST /streams/ingest-dedup/backfill — runs the streaming
        content-hash dedup sieve to completion (availableNow) and
        returns the accepted set labeled with keeper/copy counts."""
        from gpe import streaming as _streaming

        return _streaming.q_stream_dedup_availablenow(
            self.spark, self.sf_dir
        )

    def forget_corpus(self) -> DataFrame:
        """POST /governance/forget-corpus — erasure propagation across
        documents/embeddings plus the standing dedup/ANN index
        retractions, residuals re-probed."""
        from gpe import cdc as _cdc

        return _cdc.q_gov_forget_corpus(self.spark, self.sf_dir)

    # ---- reporting endpoints -----------------------------------------

    def top_orders_page(self, page: int = 0, size: int = 50) -> DataFrame:
        """GET /orders?page= — keyset-stable pagination over orders."""
        return self.query(
            "orders",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
            order_by=["o_orderkey"],
            limit=size,
            offset=page * size,
        )

    def pricing_summary(self) -> DataFrame:
        """GET /reports/pricing-summary — the TPC-H-Q1-shaped flagship."""
        return _relational.q_agg_groupby(self.spark, self.sf_dir)
