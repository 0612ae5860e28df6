"""Structured Streaming batch-equivalence (SURVEY.md §2.10, §5.4):
replay the sf0.001 events file as a stream and assert the streaming
aggregations equal their batch twins."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gpe import streaming, timeseries

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.fixture()
def stream(spark):
    return streaming.stream_events(spark, SF)


def test_tumbling_equals_batch(spark, stream):
    q = streaming.run_to_memory(
        streaming.tumbling_counts(stream), "t_tumbling", "complete"
    )
    try:
        got = _rows(
            spark.table("t_tumbling"), ["bucket_start", "n_events", "sum_value"]
        )
        want = _rows(
            timeseries.q_ts_tumbling(spark, SF),
            ["bucket_start", "n_events", "sum_value"],
        )
        assert got == want
    finally:
        q.stop()


def test_session_window_equals_batch(spark, stream):
    q = streaming.run_to_memory(
        streaming.session_aggregates(stream), "t_sessions", "complete"
    )
    try:
        got = _rows(
            spark.table("t_sessions"),
            ["user_id", "session_start", "n_events", "sum_value"],
        )
        want = _rows(
            timeseries.q_ts_sessionize(spark, SF),
            ["user_id", "session_start", "n_events", "sum_value"],
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_dedup_idempotent(spark, stream):
    """Replaying the same file through union (simulated duplicate delivery)
    then dropDuplicatesWithinWatermark yields each event once."""
    q = streaming.run_to_memory(
        streaming.dedup_stream(stream).select("event_id"), "t_dedup", "append"
    )
    try:
        n = spark.table("t_dedup").count()
        distinct = spark.table("t_dedup").distinct().count()
        assert n == distinct == 1000
    finally:
        q.stop()


def test_stateful_running_stats(spark, stream):
    q = streaming.run_to_memory(
        streaming.running_user_stats(stream), "t_state", "update"
    )
    try:
        # final state per user equals the batch aggregate
        final = (
            spark.table("t_state")
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("max_value").alias("max_value"))
        )
        batch = (
            spark.read.parquet(f"{SF}/events.parquet")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max("value").alias("max_value"))
        )
        got = _rows(final, ["user_id", "n_events", "max_value"])
        want = _rows(batch, ["user_id", "n_events", "max_value"])
        assert got == want
    finally:
        q.stop()


def test_stream_stream_join_matches_batch(spark):
    """Stream-stream inner join with watermarks + time-range condition:
    purchases joined to views of the same user within the preceding hour;
    result must equal the equivalent batch join."""
    views = streaming.stream_events(spark, SF).filter("event_type = 'view'")
    purchases = streaming.stream_events(spark, SF).filter(
        "event_type = 'purchase'"
    )
    joined = (
        views.withWatermark("ts", "1 hour")
        .alias("v")
        .join(
            purchases.withWatermark("ts", "1 hour").alias("p"),
            F.expr(
                """v.user_id = p.user_id AND
                   p.ts BETWEEN v.ts AND v.ts + INTERVAL 1 HOUR"""
            ),
        )
        .select(
            F.col("v.event_id").alias("v_id"), F.col("p.event_id").alias("p_id")
        )
    )
    q = streaming.run_to_memory(joined, "t_ssj", "append")
    try:
        got = sorted((r.v_id, r.p_id) for r in spark.table("t_ssj").collect())
    finally:
        q.stop()
    from gpe.io import load_table

    ev = load_table(spark, SF, "events")
    v = ev.filter("event_type = 'view'").alias("v")
    p = ev.filter("event_type = 'purchase'").alias("p")
    want = sorted(
        (r.v_id, r.p_id)
        for r in v.join(
            p,
            F.expr(
                """v.user_id = p.user_id AND
                   p.ts BETWEEN v.ts AND v.ts + INTERVAL 1 HOUR"""
            ),
        )
        .select(F.col("v.event_id").alias("v_id"), F.col("p.event_id").alias("p_id"))
        .collect()
    )
    assert got == want


def test_exact_gap_boundary_batch_matches_streaming(spark, tmp_path):
    """An event arriving EXACTLY 30 minutes after the previous one stays in
    the same session in BOTH engines sides: session_window merges at
    last_ts + gap (verified empirically — a review suggestion to flip the
    batch predicate to >= was falsified by this very scenario), and the
    batch formula uses strict > to match."""
    import pandas as pd

    ev = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:30:00",
                 "2024-01-01 00:45:00"]
            ),
            "user_id": [7, 7, 7],
            "event_type": ["view"] * 3,
            "value": [1.0] * 3,
            "props": ['{"k":1}'] * 3,
        }
    )
    ev.to_parquet(str(tmp_path / "events.parquet"))  # single file, fixture layout
    batch = timeseries.q_ts_sessionize(spark, str(tmp_path)).collect()
    assert sorted(r.n_events for r in batch) == [3]
    st = streaming.stream_events(spark, str(tmp_path))
    q = streaming.run_to_memory(
        streaming.session_aggregates(st), "t_boundary", "complete"
    )
    try:
        assert sorted(
            r.n_events for r in spark.table("t_boundary").collect()
        ) == [3]
    finally:
        q.stop()


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append a batch of on-time rows, then a late batch beyond the
    watermark horizon; the late rows must not create/extend closed windows
    in append-mode output."""
    import pandas as pd

    d = str(tmp_path / "late_src")
    schema = "event_id long, ts timestamp, user_id long, value double"
    on_time = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:10:00", "2024-01-01 01:10:00",
                 "2024-01-01 03:10:00"]
            ),
            "user_id": [1, 1, 1],
            "value": [1.0, 1.0, 1.0],
        }
    )
    spark.createDataFrame(on_time, schema).write.mode("overwrite").parquet(d)
    src = spark.readStream.schema(schema).parquet(d)
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("t_late")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        emitted_1 = {r.ws for r in spark.table("t_late").collect()}
        # hour-0 and hour-1 windows are closed by the 03:10 event + watermark
        assert len(emitted_1) >= 2
        late = pd.DataFrame(
            {
                "event_id": [99],
                "ts": pd.to_datetime(["2024-01-01 00:20:00"]),  # far late
                "user_id": [1],
                "value": [1.0],
            }
        )
        spark.createDataFrame(late, schema).write.mode("append").parquet(d)
        q.processAllAvailable()
        # the late row belongs to the already-emitted hour-0 window → dropped;
        # append mode must not re-emit that window
        rows = [r for r in spark.table("t_late").collect()]
        hour0 = [r for r in rows if r.ws.hour == 0]
        assert len(hour0) == 1 and hour0[0].n == 1
    finally:
        q.stop()


def test_streaming_compact_equals_batch(spark, stream):
    """compact_stream's final per-key state must equal q_cdc_compact (the
    batch changelog compaction) row-for-row — update-mode emits newer
    states as batches arrive; the LAST emission per key is the answer."""
    from gpe import cdc

    q = streaming.run_to_memory(
        streaming.compact_stream(stream), "t_compact", "update"
    )
    try:
        final = {}
        for r in spark.table("t_compact").collect():
            k = (r["user_id"], r["event_type"])
            cur = (r["ts"], r["event_id"], r["value"])
            if k not in final or (cur[0], cur[1]) > (
                final[k][0], final[k][1]
            ):
                final[k] = cur
        got = sorted((k[0], k[1], v[0], v[1], v[2]) for k, v in final.items())
        want = sorted(
            (r["user_id"], r["event_type"], r["ts"], r["event_id"], r["value"])
            for r in cdc.q_cdc_compact(spark, SF).collect()
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_transitions_survive_chunked_arrow_batches(spark):
    """ADVICE r6: a group spanning multiple Arrow record batches used to
    be sorted PER CHUNK, corrupting cross-chunk event-time order. The
    fixture's groups fit one chunk, so force pathological chunking
    (maxRecordsPerBatch = 7) and assert batch equivalence still holds."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = streaming.stream_events(spark, SF)
        q = streaming.run_to_memory(
            streaming.transitions_stream(stream), "t_trans_chunked", "update"
        )
        try:
            got: dict = {}
            for r in spark.table("t_trans_chunked").collect():
                k = (r["from_type"], r["to_type"])
                got[k] = got.get(k, 0) + r["n_delta"]
            want = {
                (r["from_type"], r["to_type"]): r["n_transitions"]
                for r in timeseries.q_ts_transitions(spark, SF).collect()
            }
            assert got == want
        finally:
            q.stop()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )


def test_streaming_user_paths_equal_batch(spark, stream):
    """user_paths_stream's final per-user paths, grouped in the sink,
    must reproduce q_ts_user_paths' path histogram exactly (n_seen
    settles the final emission per user — it grows monotonically and
    freezes at 3)."""
    from collections import Counter

    q = streaming.run_to_memory(
        streaming.user_paths_stream(stream), "t_paths", "update"
    )
    try:
        final = {}
        for r in spark.table("t_paths").collect():
            k = r["user_id"]
            if k not in final or r["n_seen"] > final[k][1]:
                final[k] = (r["path"], r["n_seen"])
        got = sorted(Counter(p for p, _ in final.values()).items())
        want = sorted(
            (r["path"], r["n_users"])
            for r in timeseries.q_ts_user_paths(spark, SF).collect()
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_max_gap_equals_batch(spark, stream):
    """max_gap_stream's final per-user state must equal q_ts_max_gap
    row-for-row — all-integer state, identical (gap, start_µs, end
    event_id) argmax key, so equality is exact (n_events settles the
    'final' emission per user: it grows monotonically)."""
    q = streaming.run_to_memory(
        streaming.max_gap_stream(stream), "t_maxgap", "update"
    )
    try:
        final = {}
        for r in spark.table("t_maxgap").collect():
            k = r["user_id"]
            cur = (
                r["n_events"],
                r["max_gap_seconds"],
                r["gap_start"],
                r["gap_end"],
            )
            if k not in final or cur[0] > final[k][0]:
                final[k] = cur
        got = sorted((k,) + v for k, v in final.items())
        want = sorted(
            (
                r["user_id"],
                r["n_events"],
                r["max_gap_seconds"],
                r["gap_start"],
                r["gap_end"],
            )
            for r in timeseries.q_ts_max_gap(spark, SF).collect()
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_zscore_equals_batch(spark, stream):
    """zscore_stream must be BIT-equal to q_ts_anomaly_zscore: same
    window counts, same IEEE z-scores (including the null-on-singleton /
    null-on-zero-variance cases), same flags. event_id leads the sort
    tuple (unique), so None zscores never get compared."""
    q = streaming.run_to_memory(
        streaming.zscore_stream(stream), "t_zscore", "update"
    )
    try:
        cols = ["event_id", "n_window", "zscore", "is_anomaly"]
        got = _rows(spark.table("t_zscore"), cols)
        want = _rows(timeseries.q_ts_anomaly_zscore(spark, SF), cols)
        assert got == want
    finally:
        q.stop()


def test_streaming_attribution_equals_batch(spark, stream):
    """attribution_stream must equal q_ts_attribution row-for-row: same
    attributed purchases, same touches (ordering semantics replicated),
    same integer gap arithmetic; direct purchases appear in neither."""
    q = streaming.run_to_memory(
        streaming.attribution_stream(stream), "t_attrib", "update"
    )
    try:
        cols = [
            "purchase_event_id",
            "touch_event_id",
            "touch_type",
            "gap_seconds",
        ]
        got = _rows(spark.table("t_attrib"), cols)
        want = _rows(timeseries.q_ts_attribution(spark, SF), cols)
        assert got == want
    finally:
        q.stop()


def test_streaming_quality_scores_equal_batch(spark):
    from gpe import text

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.quality_scores_stream(doc_stream), "t_quality", "append"
    )
    try:
        cols = ["doc_id", "n_tokens", "stopword_ratio", "quality_score"]
        got = _rows(spark.table("t_quality"), cols)
        want = _rows(text.q_text_quality(spark, SF), cols)
        assert got == want
    finally:
        q.stop()


def test_streaming_zipf_fit_equals_batch(spark):
    """Streaming token counts + the shared sink-side rank/OLS must equal
    the batch fit bit-for-bit (exact integer moments make this an
    equality, not a tolerance)."""
    from gpe import text

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.token_counts_stream(doc_stream), "t_tokcnt", "complete"
    )
    try:
        cols = ["n_terms", "zipf_slope", "ln_intercept", "r2"]
        got = _rows(text.zipf_fit_frame(spark.table("t_tokcnt")), cols)
        want = _rows(text.q_text_zipf_fit(spark, SF), cols)
        assert got == want and len(got) == 1
    finally:
        q.stop()


def test_streaming_pii_screen_equals_batch(spark):
    """Stateless per-doc screen on the stream + sink-side pii_rollup must
    equal the batch operator's documents row exactly (the clean-source
    zero counts and NULL sample included)."""
    from gpe import text

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.pii_scan_stream(doc_stream), "t_pii_scan", "append"
    )
    try:
        cols = [
            "source",
            "n_rows",
            "n_flagged",
            "hits_handle",
            "hits_id",
            "hits_money",
            "sample_redacted",
        ]
        got = _rows(text.pii_rollup(spark.table("t_pii_scan")), cols)
        want = _rows(
            text.q_text_pii_screen(spark, SF).filter(
                F.col("source") == "documents"
            ),
            cols,
        )
        assert got == want and len(got) == 1
    finally:
        q.stop()


def test_streaming_repetition_filter_equals_batch(spark):
    from gpe import text

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.repetition_stream(doc_stream), "t_repetition", "append"
    )
    try:
        cols = [
            "doc_id",
            "n_tokens",
            "n_types",
            "ttr",
            "dup2_ratio",
            "dup3_ratio",
            "is_repetitive",
        ]
        got = _rows(spark.table("t_repetition"), cols)
        want = _rows(text.q_text_repetition(spark, SF), cols)
        assert got == want
    finally:
        q.stop()


def test_streaming_heavy_hitters_equals_batch(spark):
    """Streaming bigram counts (complete mode) + the sink-side threshold
    cut must reproduce the batch Misra-Gries + exact-recount operator
    row for row — the sketch is a batch-only pruner, so both paths land
    on the same exact counts."""
    from gpe import text

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.bigram_counts_stream(doc_stream), "t_bigram_counts",
        "complete",
    )
    try:
        cols = ["bigram", "n", "share_e6"]
        got = _rows(
            streaming.heavy_hitters_from_counts(
                spark.table("t_bigram_counts")
            ),
            cols,
        )
        want = _rows(text.q_text_heavy_hitters(spark, SF), cols)
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_streaming_readability_equals_batch(spark):
    from gpe import text

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.readability_stream(doc_stream), "t_readability", "append"
    )
    try:
        cols = [
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syllables",
            "n_complex",
            "words_per_sent_e3",
            "syll_per_word_e3",
            "flesch_e3",
        ]
        got = _rows(spark.table("t_readability"), cols)
        want = _rows(text.q_text_readability(spark, SF), cols)
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_streaming_calendar_profile_equals_batch(spark):
    """Streaming calendar cells (complete mode, ≤168 state rows) + the
    sink-side share derivation must reproduce the batch heatmap row for
    row — cell sums are exact decimal/integer, so no bit lottery."""
    from gpe import timeseries

    ev_stream = streaming.stream_events(spark, SF)
    q = streaming.run_to_memory(
        streaming.calendar_cells_stream(ev_stream), "t_calendar_cells",
        "complete",
    )
    try:
        cols = ["isodow", "hour", "n_events", "sum_value", "share_e6"]
        got = _rows(
            streaming.calendar_profile_shares(spark.table("t_calendar_cells")),
            cols,
        )
        want = _rows(timeseries.q_ts_calendar_profile(spark, SF), cols)
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_streaming_changepoint_equals_batch(spark):
    """Streaming daily cells (complete mode, calendar-bounded state) +
    the sink-side prefix-sum/argmax scan must reproduce the batch
    changepoint row for row — cents are exact integers and the ordering
    score chain is identical, so no bit lottery."""
    from gpe import timeseries

    ev_stream = streaming.stream_events(spark, SF)
    q = streaming.run_to_memory(
        streaming.daily_cells_stream(ev_stream), "t_daily_cells", "complete"
    )
    try:
        cols = [
            "event_type", "split_day", "n_days", "n_left", "n_right",
            "mean_left_c", "mean_right_c", "shift_c",
        ]
        got = _rows(
            streaming.changepoint_from_cells(spark.table("t_daily_cells")),
            cols,
        )
        want = _rows(timeseries.q_ts_changepoint(spark, SF), cols)
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_streaming_quality_gate_equals_batch(spark):
    """Streaming gate cells (complete mode) + the sink-side share
    derivation must reproduce the batch filter funnel row for row —
    the gate decision is stateless, so both paths land on the same
    (source, reason) cells."""
    from gpe import pipeline

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.quality_gate_stream(doc_stream), "t_gate_cells",
        "complete",
    )
    try:
        cols = ["source", "drop_reason", "n_docs", "total_chars", "share_e6"]
        got = _rows(
            streaming.quality_gate_shares(spark.table("t_gate_cells")),
            cols,
        )
        want = _rows(pipeline.q_pipeline_quality_gate(spark, SF), cols)
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_streaming_chunker_equals_batch(spark):
    from gpe import packing

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.chunk_stream(doc_stream), "t_chunks", "append"
    )
    try:
        cols = ["doc_id", "chunk_idx", "chunk_text", "n_tokens"]
        got = _rows(spark.table("t_chunks"), cols)
        want = _rows(packing.q_text_chunk_windows(spark, SF), cols)
        assert got == want
    finally:
        q.stop()


def test_streaming_minhash_dedup_equals_batch(spark):
    """Stream the corpus against itself as the static index: every batch
    near-dup pair (a, b) must surface in BOTH directions, and nothing
    else may surface (the band join + exact verify is output-equal to
    q_dedup_minhash_lsh)."""
    from gpe import dedup
    from gpe.io import load_table

    corpus = load_table(spark, SF, "documents")
    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.minhash_dedup_stream(doc_stream, corpus),
        "t_minhash",
        "append",
    )
    try:
        got = {
            (r["doc_id"], r["corpus_doc_id"], r["inter"], r["union_size"])
            for r in spark.table("t_minhash").collect()
        }
        batch = dedup.q_dedup_minhash_lsh(spark, SF).collect()
        want = set()
        for r in batch:
            want.add((r["id_a"], r["id_b"], r["inter"], r["union_size"]))
            want.add((r["id_b"], r["id_a"], r["inter"], r["union_size"]))
        assert got == want
    finally:
        q.stop()


def test_streaming_transitions_equal_batch(spark, stream):
    """transitions_stream emits per-batch count DELTAS; their sum per
    (from, to) must equal the batch matrix counts exactly (ordering
    semantics replicated), and the batch probabilities follow."""
    q = streaming.run_to_memory(
        streaming.transitions_stream(stream), "t_trans", "update"
    )
    try:
        got = sorted(
            (r["from_type"], r["to_type"], r["total"])
            for r in spark.table("t_trans")
            .groupBy("from_type", "to_type")
            .agg(F.sum("n_delta").alias("total"))
            .collect()
        )
        want = sorted(
            (r["from_type"], r["to_type"], r["n_transitions"])
            for r in timeseries.q_ts_transitions(spark, SF).collect()
        )
        assert got == want
    finally:
        q.stop()


@pytest.mark.parametrize("grain", ["hour", "day", "month"])
def test_streaming_grain_counts_equal_batch_rollup(spark, stream, grain):
    """Each streaming grain leg must equal the batch multigrain ROLLUP's
    rows at that grain (complete mode; calendar-month buckets come from
    the date_trunc grouping key, which window() cannot express)."""
    q = streaming.run_to_memory(
        streaming.grain_counts_stream(stream, grain),
        f"t_grain_{grain}",
        "complete",
    )
    try:
        got = _rows(
            spark.table(f"t_grain_{grain}"),
            ["bucket", "n_events", "sum_value"],
        )
        want = _rows(
            timeseries.q_ts_rollup_multigrain(spark, SF).filter(
                F.col("grain") == grain
            ),
            ["bucket", "n_events", "sum_value"],
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_ewma_equals_batch_closed_days(spark, stream):
    """ewma_stream emits a day when it CLOSES; every closed day must be
    BIT-equal to the batch closed-form scan (same integer-cent daily
    means, same IEEE scan order, same Spark-ROUND). The still-open final
    day per type is the only batch row legitimately absent."""
    q = streaming.run_to_memory(
        streaming.ewma_stream(stream), "t_ewma", "update"
    )
    try:
        cols = ["event_type", "day", "daily_avg", "ewma"]
        got = _rows(spark.table("t_ewma"), cols)
        batch = timeseries.q_ts_ewma(spark, SF)
        last = batch.groupBy("event_type").agg(
            F.max("day").alias("last_day")
        )
        want = _rows(
            batch.join(last, "event_type").filter(
                F.col("day") < F.col("last_day")
            ),
            cols,
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_cusum_equals_batch_closed_days(spark, stream):
    """cusum_stream (all-integer-cents state, drift fed from the batch
    parameter table) must be BIT-equal to q_ts_cusum on every closed
    day; the open final day per type is the only absent row."""
    drift = streaming.batch_drift_cents(spark, SF)
    q = streaming.run_to_memory(
        streaming.cusum_stream(stream, drift), "t_cusum", "update"
    )
    try:
        cols = ["event_type", "day", "day_sum", "drift_k", "cusum",
                "is_burst"]
        got = _rows(spark.table("t_cusum"), cols)
        batch = timeseries.q_ts_cusum(spark, SF)
        last = batch.groupBy("event_type").agg(F.max("day").alias("d1"))
        want = _rows(
            batch.join(last, "event_type").filter(F.col("day") < F.col("d1")),
            cols,
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_active_users_equals_batch(spark, stream):
    """DAU rows must equal the batch q_ts_active_users dau column for
    every day, and WAU rows (restricted to days that exist in the data —
    the batch spine cut) its wau column."""
    q = streaming.run_to_memory(
        streaming.active_users_stream(stream), "t_active", "complete"
    )
    try:
        got = {
            (r.kind, r.tday): r.n_users
            for r in spark.table("t_active").collect()
        }
        batch = timeseries.q_ts_active_users(spark, SF).collect()
        assert len(batch) > 0
        for r in batch:
            assert got[("dau", r.day)] == r.dau, r.day
            assert got[("wau", r.day)] == r.wau, r.day
        # streaming emits wau entries for up to 6 days past the data's
        # edge (no spine cut mid-stream); dau entries exist only for
        # real days
        dau_days = {d for (k, d) in got if k == "dau"}
        assert dau_days == {r.day for r in batch}
    finally:
        q.stop()


def test_streaming_interarrival_equals_batch(spark, stream):
    """interarrival_stream's final per-user emission must equal
    q_ts_interarrival BIT-for-bit: integer state (Σg² as an exact string
    int), and the float tail replays the batch expression chain
    (float(int) ≡ DECIMAL→DOUBLE, math.sqrt ≡ IEEE sqrt). n_gaps grows
    monotonically, so it selects the final row per user."""
    q = streaming.run_to_memory(
        streaming.interarrival_stream(stream), "t_inter", "update"
    )
    try:
        final = {}
        for r in spark.table("t_inter").collect():
            k = r["user_id"]
            cur = (r["n_gaps"], r["mean_gap_s"], r["cv_gap"], r["burstiness"])
            if k not in final or cur[0] > final[k][0]:
                final[k] = cur
        got = sorted((k,) + v for k, v in final.items())
        want = sorted(
            (
                r["user_id"],
                r["n_gaps"],
                r["mean_gap_s"],
                r["cv_gap"],
                r["burstiness"],
            )
            for r in timeseries.q_ts_interarrival(spark, SF).collect()
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_mix_entropy_equals_batch(spark, stream):
    """The streamed (day, type) cells + the sink-side entropy reduction
    must reproduce q_ts_mix_entropy bit-for-bit (identical e6-floor
    chain over identical cell counts)."""
    q = streaming.run_to_memory(
        streaming.mix_entropy_cells_stream(stream), "t_mixcells", "complete"
    )
    try:
        cells = spark.table("t_mixcells")
        got = _rows(
            streaming.mix_entropy_from_cells(cells),
            ["day", "n_events", "n_types", "entropy_nats", "evenness"],
        )
        want = _rows(
            timeseries.q_ts_mix_entropy(spark, SF),
            ["day", "n_events", "n_types", "entropy_nats", "evenness"],
        )
        assert got == want
    finally:
        q.stop()


def test_streaming_dup_paragraphs_equals_batch(spark):
    """The streamed chunk-hash counts + sink-side ≥2-docs cut must match
    q_text_dup_paragraphs on every shared column (the twin drops the
    exact n_docs count — its O(1) state proves only the ≥2 predicate via
    min(doc) < max(doc))."""
    from gpe import text

    doc_stream = streaming.stream_documents(spark, SF)
    q = streaming.run_to_memory(
        streaming.chunk_hash_counts_stream(doc_stream), "t_dupchunks",
        "complete",
    )
    try:
        got = _rows(
            streaming.dup_paragraphs_from_counts(spark.table("t_dupchunks")),
            ["chunk_hash", "n_occurrences", "n_tokens", "first_doc_id",
             "first_chunk_idx"],
        )
        want = _rows(
            text.q_text_dup_paragraphs(spark, SF),
            ["chunk_hash", "n_occurrences", "n_tokens", "first_doc_id",
             "first_chunk_idx"],
        )
        assert got == want and len(got) > 0
    finally:
        q.stop()


def test_streaming_erasure_sieve_equals_batch_anti_join(spark, stream):
    """Stream-static tombstone sieve: the streamed survivor set must
    equal the batch anti-join of events against the same erasure batch
    (c_custkey % 97 == 0 — the forget-audit batch), and every erased
    identity must be absent from the sink."""
    erased = (
        spark.read.parquet(f"{SF}/customer.parquet")
        .filter(F.expr("c_custkey % 97 = 0"))
        .select(F.col("c_custkey").alias("k"))
    )
    q = streaming.run_to_memory(
        streaming.erasure_sieve_stream(stream, erased), "t_erasure", "append"
    )
    try:
        got = _rows(spark.table("t_erasure"), ["event_id", "user_id"])
        ev = spark.read.parquet(f"{SF}/events.parquet")
        want = _rows(
            ev.join(erased, ev.user_id == erased.k, "left_anti"),
            ["event_id", "user_id"],
        )
        assert got == want and len(got) > 0
        erased_ids = {r.k for r in erased.collect()}
        assert not ({u for _, u in got} & erased_ids)
        assert len(got) < ev.count()  # the sieve really dropped rows
    finally:
        q.stop()


def test_streaming_anomaly_seasonal_equals_batch(spark, stream):
    """Streamed daily cells (shared with the changepoint twin) + the
    sink-side decompose/anomaly chain must reproduce
    q_ts_anomaly_seasonal bit-for-bit."""
    q = streaming.run_to_memory(
        streaming.daily_cells_stream(stream), "t_anomcells", "complete"
    )
    try:
        cols = ["event_type", "day", "dow", "resid_value", "severity"]
        got = _rows(
            streaming.anomaly_seasonal_from_cells(spark.table("t_anomcells")),
            cols,
        )
        want = _rows(timeseries.q_ts_anomaly_seasonal(spark, SF), cols)
        assert got == want
    finally:
        q.stop()
