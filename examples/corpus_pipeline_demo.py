"""Worked example: the LLM training-data pipeline, end to end.

Run: python examples/corpus_pipeline_demo.py [sf_dir]

The corpus-assembly flow a data-curation team runs: quality-score →
near-dup detection (MinHash-LSH) → cluster → keep best per cluster →
contamination screen → mix sources → train/val split. Every stage is a
lazy DataFrame; at 100 TB the same code fans out across executors.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gpe import dedup, packing, pipeline, text, vectors
from gpe.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-demo")
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(f"corpus: {n_docs} docs")

    print("== profile FIRST (r8): length distribution + per-source dup health ==")
    text.q_text_length_histogram(spark, sf_dir).orderBy("bucket_lo").show(5)
    dedup.q_dedup_dup_stats(spark, sf_dir).orderBy(
        F.desc("dup_ratio"), "source"
    ).show(5)

    print("== winnowing fingerprints (partial-overlap detection) ==")
    fps = text.q_text_winnowing(spark, sf_dir)
    fps.orderBy(F.desc("density")).show(3)

    print("== quality scores (worst 5) ==")
    text.q_text_quality(spark, sf_dir).orderBy("quality_score").show(5)

    print("== repetition filter (late r8): most repetitive docs ==")
    rep = text.q_text_repetition(spark, sf_dir)
    rep.orderBy(F.desc("dup2_ratio"), "doc_id").show(3)
    print(f"   {rep.filter('is_repetitive').count()} docs flagged repetitive")

    print("== the filter funnel (final r8): keep rate per source ==")
    pipeline.q_pipeline_quality_gate(spark, sf_dir).orderBy(
        "source", "drop_reason"
    ).show(8)

    print("== readability features (final r8): hardest 3 docs ==")
    text.q_text_readability(spark, sf_dir).orderBy("flesch_e3").show(3)

    print("== langid model QA (final r8): per-class P/R/F1 ==")
    text.q_ml_class_metrics(spark, sf_dir).orderBy("lang").show()

    print("== search the corpus (BM25 top-5, late r8) ==")
    text.q_text_bm25_search(spark, sf_dir).select(
        "doc_id", "score", "tf_spark", "tf_table", "tf_query"
    ).show(5)

    print("== one BPE merge step (tokenizer-training inner loop, late r8) ==")
    bpe = text.q_text_bpe_merge_step(spark, sf_dir)
    bpe.groupBy("pair_a", "pair_b", "pair_count").agg(
        F.sum("n_merges").alias("total_merges")
    ).show(1)

    print("== PageRank centrality of the near-dup graph (late r8) ==")
    dedup.q_graph_pagerank(spark, sf_dir).orderBy(F.desc("rank_e12")).show(3)

    print("== near-duplicate pairs via MinHash-LSH (exact-verified) ==")
    pairs = dedup.q_dedup_minhash_lsh(spark, sf_dir)
    print(f"   {pairs.count()} pairs with Jaccard > 0.9")

    print("== dedup: keep the best doc per duplicate cluster ==")
    kept = pipeline.q_dedup_keep_best(spark, sf_dir)
    print(f"   {n_docs} docs -> {kept.count()} cluster representatives")
    kept.orderBy(F.desc("n_members")).show(5)

    print("== benchmark contamination screen ==")
    cont = pipeline.q_text_contamination(spark, sf_dir)
    flagged = cont.filter("is_contaminated")
    print(f"   {flagged.count()} docs flagged (> 50% 3-gram overlap)")

    print("== source mixing + split ==")
    mixed = pipeline.q_mix_sources(spark, sf_dir)
    split = pipeline.q_split_train_val(spark, sf_dir)
    split.groupBy("split").count().show()
    print(f"   mixing kept {mixed.count()} docs")

    print("== mixture temperature weights (alpha=0.5, 10k budget) ==")
    packing.q_mix_temperature(spark, sf_dir).show(5)

    print("== chunk + pack for training (window 32/stride 16 -> 512-token packs) ==")
    chunks = packing.q_text_chunk_windows(spark, sf_dir)
    packs = packing.q_pack_sequences(spark, sf_dir)
    print(f"   {chunks.count()} chunks; {packs.count()} packs")
    print("== packing efficiency (r8) ==")
    packing.q_pack_bin_stats(spark, sf_dir).show()

    print("== order-sensitive near-dups via shingle MinHash-LSH (open vocab) ==")
    ngram = dedup.q_dedup_ngram_lsh(spark, sf_dir)
    print(f"   {ngram.count()} trigram-Jaccard > 0.5 pairs (banded + exact-verified)")

    print("== nearest neighbors in embedding space (query 0) ==")
    vectors.q_vec_knn_brute(spark, sf_dir).filter("query_id = 0").show()

    print("== ANN index quality audit (recall@5 per method) ==")
    vectors.q_vec_ann_recall(spark, sf_dir).groupBy("method").agg(
        F.round(F.avg("recall"), 3).alias("mean_recall")
    ).orderBy("method").show()

    print("== truncated-embedding audit (r10): recall@5 at 16/32 of 64 dims ==")
    vectors.q_vec_matryoshka_recall(spark, sf_dir).groupBy("prefix_dim").agg(
        F.round(F.avg("recall"), 3).alias("mean_recall")
    ).orderBy("prefix_dim").show()

    print("== cluster-balanced diversity sample (r10): 40 per kmeans cell ==")
    vectors.q_sample_cluster_balanced(spark, sf_dir).groupBy("cluster").agg(
        F.count(F.lit(1)).alias("sampled"), F.min("cluster_n").alias("cluster_n")
    ).orderBy("cluster").show(5)

    print("== tokenizer APPLY (r10): fixed merge table, per-doc compression ==")
    enc = text.q_text_bpe_encode(spark, sf_dir)
    enc.agg(
        F.min("n_merge_rules").alias("rules"),
        F.sum("n_merges").alias("total_merges"),
        F.round(F.avg("compression"), 4).alias("mean_compression"),
    ).show()

    print("== corpus health: Zipf head fit (r10; slope ~ -1 on natural text) ==")
    text.q_text_zipf_fit(spark, sf_dir).show()

    print("== release audit (r10): PII screen per source + redacted sample ==")
    text.q_text_pii_screen(spark, sf_dir).orderBy("source").show(truncate=40)

    print("== duplicate-trigram mass per source (r11, RefinedWeb filter) ==")
    text.q_text_dup_ngram_coverage(spark, sf_dir).orderBy(
        F.desc("avg_dup_coverage")
    ).show(5)

    print("== incremental ingest (r11): new batch vs standing dedup index ==")
    dedup.q_dedup_delta(spark, sf_dir).groupBy("status").agg(
        F.count(F.lit(1)).alias("docs")
    ).show()

    print("== sketch calibration (r11): MinHash est-vs-exact per J decile ==")
    dedup.q_dedup_sketch_calibration(spark, sf_dir).orderBy(
        "jaccard_bin"
    ).show()

    print("== packing strategy comparison (r11): best-fit vs streaming ==")
    packing.q_pack_bestfit(spark, sf_dir).show()

    print("== hybrid retrieval (r11): RRF of semantic + lexical legs ==")
    vectors.q_rag_rank_fusion(spark, sf_dir).filter("query_id = 0").orderBy(
        "fused_rank"
    ).show()

    print("== sub-document dedup (r12): exact shared spans >= 50 tokens ==")
    text.q_text_substring_dedup(spark, sf_dir).orderBy(
        F.desc("len")
    ).show(5)

    print("== decontamination report (r12): removable span mass/source ==")
    text.q_text_decontaminate(spark, sf_dir).orderBy(
        F.desc("removable_share")
    ).show(5)

    print("== trained quality filter (r12): in-plan Cramer fit + bands ==")
    from gpe import ml

    ml.q_ml_quality_fit(spark, sf_dir).show()

    print("== ANN index nightly delta (r12): cell stats + served top-k ==")
    vectors.q_vec_index_delta(spark, sf_dir).filter(
        "section = 'cell_delta'"
    ).orderBy("cell").show()

    print("== semantic dedup (r13): cluster-bounded embedding near-dups ==")
    dedup.q_dedup_semantic(spark, sf_dir).orderBy(
        F.desc("max_sim"), "vec_id"
    ).show(5)

    print("== BPE trainer (r13): 3-step compression trajectory ==")
    text.q_text_bpe_train(spark, sf_dir).orderBy("step").show()

    print("== external decontamination (r13): corpus vs benchmark slice ==")
    text.q_text_decontaminate_external(spark, sf_dir).orderBy(
        F.desc("removable_share")
    ).show(5)

    print("== right-to-be-forgotten audit (r13): purge propagation ==")
    from gpe import cdc

    cdc.q_gov_forget_audit(spark, sf_dir).orderBy("table_name").show()

    print("== semantic dedup recall audit (r14): cross-cell miss census ==")
    dedup.q_dedup_semantic_recall(spark, sf_dir).orderBy(
        F.asc_nulls_last("sim_bin")
    ).show()

    print("== streaming ingest dedup (r14): availableNow sieve vs batch ==")
    from gpe import streaming

    streaming.q_stream_dedup_availablenow(spark, sf_dir).orderBy(
        F.desc("n_copies"), "keeper_doc_id"
    ).show(5)

    print("== corpus erasure (r14): documents/embeddings + index retractions ==")
    cdc.q_gov_forget_corpus(spark, sf_dir).orderBy("table_name").show()


if __name__ == "__main__":
    main()
