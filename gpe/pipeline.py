"""Training-data pipeline operators (BASELINE.json:6 mandate, beyond the
per-family §2.9 ops): deterministic sampling, source mixing, train/val
splitting, cluster-dedup with keep-best selection, and benchmark
contamination detection.

Determinism doctrine: "random" decisions derive from md5 of stable keys —
reproducible across engines, runs, and cluster sizes (no RNG state, no
sample() nondeterminism). Uniform [0,1) draws are FIXED-WIDTH LOWERCASE HEX
PREFIXES compared lexicographically against hex thresholds — monotone in
value and portable to any engine with md5 and string compare, with no hex→
int parsing differences.

Scale notes: every operator is a map-side expression or one bounded
shuffle; the mixing/splitting ops in particular are the embarrassingly
parallel backbone of corpus assembly at 100 TB (each row decides its fate
from its own hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpe.io import load_table

_STRATUM_K = 20  # stratified sample size per language


def _md5_hex8(col) -> "F.Column":
    """First 8 hex chars of md5(key-as-string) — a uniform draw comparable
    as a string against hex thresholds."""
    return F.substring(F.md5(col.cast("string").cast("binary")), 1, 8)


def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-20 sample of lineitem on the composite primary key —
    the zero-coordination sampling pattern (each row self-selects)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 20 == 0
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: 20 docs per language, selected by md5 order
    (deterministic pseudo-random, doc_id tiebreak)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        _md5_hex8(F.col("doc_id")), F.asc("doc_id")
    )
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _STRATUM_K)
        .select("doc_id", "lang", "source", "rnk")
    )


def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: per-source keep rates applied via hash thresholds
    (srcN rates: src0-4 keep all, src5-9 keep 1/2, rest keep 1/4) — the
    downsample-overrepresented-sources op of corpus assembly."""
    d = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", "src(\\d+)", 1).cast("int")
    threshold = (
        F.when(src_num < 5, F.lit("ffffffff"))
        .when(src_num < 10, F.lit("80000000"))
        .otherwise(F.lit("40000000"))
    )
    u = _md5_hex8(F.col("doc_id"))
    return (
        d.withColumn("u8", u)
        .withColumn("thr", threshold)
        .filter(F.col("u8") < F.col("thr"))
        .select("doc_id", "lang", "source", "u8")
    )


def q_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val split (~87.5/12.5 by first md5 nibble) —
    stable under reshuffling, re-partitioning, and incremental appends."""
    d = load_table(spark, sf_dir, "documents")
    first_nibble = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    return d.select(
        "doc_id",
        "lang",
        F.when(first_nibble < F.lit("e"), "train").otherwise("val").alias("split"),
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline end-to-end: near-dup graph → connected
    components → keep the HIGHEST-QUALITY member per cluster (quality from
    q_text_quality; ties → min doc_id). This is the operator a corpus
    builder actually runs; near_pairs/components/quality are its stages."""
    from gpe.dedup import q_dedup_components
    from gpe.text import q_text_quality

    comp = q_dedup_components(spark, sf_dir).select("doc_id", "component_id")
    qual = q_text_quality(spark, sf_dir).select("doc_id", "quality_score")
    joined = comp.join(qual, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    # member count as a second window over the SAME partition key — one
    # shuffle serves both (a groupBy + self-join re-evaluated the whole
    # upstream components∘quality pipeline a second time)
    w_all = Window.partitionBy("component_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(w_all))
        .filter(F.col("rn") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("quality_score").alias("keeper_quality"),
            "n_members",
        )
    )


def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination detection: fraction of each candidate doc's
    distinct token-3-grams that appear in the benchmark set (doc_id < 10
    stands in for the eval set). At 100 TB the benchmark gram set is tiny
    and broadcast; candidates stream through one semi-join + ratio."""
    d = load_table(spark, sf_dir, "documents")
    # map-side shingling (indexed transform over a MATERIALIZED split —
    # no window shuffle, no per-element re-split; same build as
    # q_dedup_ngram_jaccard). Gram text uses ' ' joins, matching the
    # oracle's concat_ws semantics.
    toksed = d.select("doc_id", F.split("text", " ").alias("toks"))
    arr = F.col("toks")
    gram_arr = F.array_distinct(
        F.filter(
            F.transform(
                arr,
                lambda x, i: F.concat(
                    x,
                    F.lit(" "),
                    F.try_element_at(arr, i + 2),
                    F.lit(" "),
                    F.try_element_at(arr, i + 3),
                ),
            ),
            lambda g: g.isNotNull(),
        )
    )
    grams = toksed.select("doc_id", F.explode(gram_arr).alias("gram"))
    bench = (
        grams.filter(F.col("doc_id") < 10)
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # ONE pass over the candidate grams: broadcast LEFT join carries a hit
    # flag, so n_grams and n_hit come from the same aggregation (round 1
    # ran a semi-join agg AND a totals agg AND joined them — three
    # evaluations of the gram subtree)
    agg = (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_hit"),
        )
    )
    ratio = F.floor(
        F.col("n_hit") * F.lit(1000000) / F.col("n_grams")
    ) / F.lit(1000000.0)
    return agg.select(
        "doc_id",
        "n_grams",
        "n_hit",
        ratio.alias("contamination_ratio"),
        (ratio > 0.5).alias("is_contaminated"),
    )


def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order novelty score: the fraction of each doc's distinct
    token-3-grams whose FIRST corpus occurrence (minimum doc_id) is this
    doc — the diversity/freshness metric a curation pipeline tracks as
    the corpus grows (novelty → 0 means the doc only repeats earlier
    material). Integer-exact: counts + the floor-scaled ratio.

    Scale notes (100 TB): the gram build is the same map-side indexed
    transform as q_text_contamination (no window shuffle); first-
    occurrence is ONE shuffle on gram (the inverted-index build — the
    honest cost, with map-side partial MIN); the per-doc score reuses
    the gram join's output in one doc_id aggregate."""
    d = load_table(spark, sf_dir, "documents")
    toksed = d.select("doc_id", F.split("text", " ").alias("toks"))
    arr = F.col("toks")
    gram_arr = F.array_distinct(
        F.filter(
            F.transform(
                arr,
                lambda x, i: F.concat(
                    x,
                    F.lit(" "),
                    F.try_element_at(arr, i + 2),
                    F.lit(" "),
                    F.try_element_at(arr, i + 3),
                ),
            ),
            lambda g: g.isNotNull(),
        )
    )
    grams = toksed.select("doc_id", F.explode(gram_arr).alias("gram"))
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    j = grams.join(first, "gram")
    agg = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
            "n_novel"
        ),
    )
    ratio = F.floor(
        F.col("n_novel") * F.lit(1000000) / F.col("n_grams")
    ) / F.lit(1000000.0)
    return agg.select(
        "doc_id", "n_grams", "n_novel", ratio.alias("novelty_ratio")
    )


def gate_frame(d: DataFrame) -> DataFrame:
    """Per-document gate decision for q_pipeline_quality_gate — map-side
    only (split/distinct/filter scalar array exprs), so the SAME tree
    runs unmodified on a document stream (gpe.streaming.
    quality_gate_stream). Rules short-circuit IN ORDER (CaseWhen), so
    drop_reason is the FIRST failing rule — the attribution a filter
    funnel dashboard needs."""
    from gpe.text import _STOPWORDS, _floor6

    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    ttr = _floor6(F.size(F.array_distinct(toks)), n_tokens)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    stop_ratio = _floor6(
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))),
        n_tokens,
    )
    reason = (
        F.when(n_tokens < 20, F.lit("too_short"))
        .when(ttr <= 0.40, F.lit("repetitive"))
        .when(stop_ratio >= 0.10, F.lit("stopword_heavy"))
        .otherwise(F.lit("kept"))
    )
    return d.select(
        "doc_id", "source", "n_chars", reason.alias("drop_reason")
    )


def q_pipeline_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining filter funnel — every corpus pipeline's first
    dashboard: documents flow through ordered gates (too short →
    repetitive → stopword-heavy → kept) and each doc is attributed to
    the FIRST rule that drops it (C4/Gopher-style curation, Raffel et
    al. 2020 §2.2 / Rae et al. 2021 §A1.1). Output per (source,
    drop_reason): doc count, total chars, and the share of that
    source's docs — the keep-rate-by-source view that decides which
    crawl sources are worth their storage.

    Determinism: the gate thresholds compare e6-floored ratios (exact
    k/1e6 doubles, identical both engines); shares are integer DIV.

    Scale notes (100 TB): the per-doc decision is ENTIRELY map-side
    scalar array expressions in whole-stage codegen — no explode, no
    join; the decision frame is persisted once and feeds the two
    aggregations (cells + per-source totals, both map-side partials to
    ≤ #sources×4 rows); the totals join broadcasts."""
    from gpe.common import persist_tracked

    d = load_table(spark, sf_dir, "documents")
    gate = persist_tracked(gate_frame(d))
    g = gate.groupBy("source", "drop_reason").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    tot = gate.groupBy("source").agg(
        F.count(F.lit(1)).alias("src_total")
    )
    return g.join(F.broadcast(tot), "source").select(
        "source",
        "drop_reason",
        "n_docs",
        "total_chars",
        F.expr("(n_docs * 1000000) DIV src_total").alias("share_e6"),
    )


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size (PPS) Bernoulli sample of orders:
    each order self-selects with probability min(1, k·w/W) where w is its
    exact cent value, W the corpus total, k = 500 the expected sample
    size — the value-weighted audit sample (big orders almost surely in,
    the long tail represented in proportion) of survey-sampling practice
    (Hansen–Hurwitz estimation; certainty items are the standard PPS
    caveat and are simply always kept here).

    Determinism: the uniform draw is the first 8 md5 hex chars of the
    salted key ('ws:' || o_orderkey) as a 32-bit integer — the repo's
    cross-engine hash recipe (q_sample_stratified) — and the inclusion
    test h·W < k·w·2³² is EXACT integer arithmetic (DECIMAL(19,0)
    products on the Spark side, HUGEINT on the oracle side; a BIGINT
    product overflows at h·W ≈ 10²¹). No float appears anywhere.

    Scale notes (100 TB): zero-coordination map-side filter — the only
    shared state is the one-row total W, broadcast from a single
    partial-agg pass (or a catalog statistic); sample size concentrates
    tightly around k regardless of input scale, so the output is always
    driver-safe."""
    o = load_table(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(12,2)") * 100
    ).cast("long")
    h32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("ws:"), F.col("o_orderkey").cast("string")
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    tot = o.agg(
        F.sum((F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
        .cast("long")
        .alias("w_tot")
    )
    d19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    return (
        o.crossJoin(F.broadcast(tot))
        .withColumn("w_cents", cents)
        .withColumn("h32", h32)
        .filter(
            d19(F.col("h32")) * d19(F.col("w_tot"))
            < d19(F.lit(500) * F.col("w_cents")) * d19(F.lit(4294967296))
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "w_cents", "h32")
    )


QUERIES = {
    "q_sample_weighted": q_sample_weighted,
    "q_pipeline_quality_gate": q_pipeline_quality_gate,
    "q_sample_systematic": q_sample_systematic,
    "q_text_ngram_novelty": q_text_ngram_novelty,
    "q_sample_stratified": q_sample_stratified,
    "q_mix_sources": q_mix_sources,
    "q_split_train_val": q_split_train_val,
    "q_dedup_keep_best": q_dedup_keep_best,
    "q_text_contamination": q_text_contamination,
}


def _oracles() -> dict[str, str]:
    from gpe.dedup import ORACLES as _DED
    from gpe.text import ORACLES as _TXT

    components_sql = _DED["q_dedup_components"]
    # derive the quality stage from text.py's oracle so a tuned scoring
    # formula can never silently diverge between the two declared queries
    quality_sql = (
        f"SELECT doc_id, quality_score FROM ({_TXT['q_text_quality']})"
    )
    return {
        # same salted md5 32-bit draw; the inclusion test is exact int128
        # (HUGEINT) — the BIGINT product h·W would overflow at ~10²¹
        "q_sample_weighted": """
            WITH t AS (
              SELECT CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                   AS BIGINT)) AS BIGINT) AS w_tot
              FROM orders),
            h AS (
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                          AS BIGINT) AS w_cents,
                     CAST(CONCAT('0x', substr(
                            md5('ws:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
                          AS BIGINT) AS h32
              FROM orders)
            SELECT o_orderkey, o_custkey, o_totalprice, w_cents, h32
            FROM h CROSS JOIN t
            WHERE CAST(h32 AS HUGEINT) * CAST(w_tot AS HUGEINT)
                  < 500 * CAST(w_cents AS HUGEINT) * 4294967296""",
        # same ordered CASE gate over the same e6-floored ratios; the
        # stopword list is inlined from text._STOPWORDS
        "q_pipeline_quality_gate": """
            WITH base AS (
              SELECT doc_id, source, n_chars,
                     CASE
                       WHEN len(string_split(text, ' ')) < 20
                         THEN 'too_short'
                       WHEN FLOOR(len(list_distinct(string_split(text, ' ')))
                                  * 1000000.0
                                  / len(string_split(text, ' ')))
                            / 1000000.0 <= 0.40
                         THEN 'repetitive'
                       WHEN FLOOR(len(list_filter(string_split(text, ' '),
                                                  x -> x IN ('the', 'a')))
                                  * 1000000.0
                                  / len(string_split(text, ' ')))
                            / 1000000.0 >= 0.10
                         THEN 'stopword_heavy'
                       ELSE 'kept'
                     END AS drop_reason
              FROM documents),
            g AS (
              SELECT source, drop_reason,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS total_chars
              FROM base GROUP BY 1, 2),
            t AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS src_total
              FROM base GROUP BY 1)
            SELECT g.source, drop_reason, n_docs, total_chars,
                   (n_docs * 1000000) // src_total AS share_e6
            FROM g JOIN t ON g.source = t.source""",
        "q_text_ngram_novelty": """
            WITH pos_tok AS (
              SELECT doc_id,
                     generate_subscripts(string_split(text, ' '), 1) AS pos,
                     unnest(string_split(text, ' ')) AS token
              FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     token || ' ' || LEAD(token, 1) OVER w || ' '
                           || LEAD(token, 2) OVER w AS gram
              FROM pos_tok
              WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
              QUALIFY LEAD(token, 2) OVER w IS NOT NULL),
            first AS (
              SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
            SELECT g.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(COUNT(CASE WHEN f.first_doc = g.doc_id THEN 1 END)
                        AS BIGINT) AS n_novel,
                   FLOOR(COUNT(CASE WHEN f.first_doc = g.doc_id THEN 1 END)
                         * 1000000.0 / COUNT(*)) / 1000000.0
                     AS novelty_ratio
            FROM g JOIN first f ON g.gram = f.gram
            GROUP BY g.doc_id""",
        "q_sample_systematic": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE (l_orderkey * 7 + l_linenumber) % 20 = 0""",
        "q_sample_stratified": f"""
            SELECT doc_id, lang, source, rnk FROM (
              SELECT doc_id, lang, source,
                     CAST(ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                                   doc_id) AS INTEGER) AS rnk
              FROM documents)
            WHERE rnk <= {_STRATUM_K}""",
        "q_mix_sources": """
            WITH t AS (
              SELECT doc_id, lang, source,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS u8,
                     CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1)
                               AS INTEGER) < 5 THEN 'ffffffff'
                          WHEN CAST(regexp_extract(source, 'src(\\d+)', 1)
                               AS INTEGER) < 10 THEN '80000000'
                          ELSE '40000000' END AS thr
              FROM documents)
            SELECT doc_id, lang, source, u8 FROM t WHERE u8 < thr""",
        "q_split_train_val": """
            SELECT doc_id, lang,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                        THEN 'train' ELSE 'val' END AS split
            FROM documents""",
        "q_dedup_keep_best": f"""
            WITH comp AS ({components_sql}),
            qual AS ({quality_sql}),
            joined AS (
              SELECT comp.doc_id, comp.component_id, qual.quality_score
              FROM comp JOIN qual ON comp.doc_id = qual.doc_id),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY component_id
                        ORDER BY quality_score DESC, doc_id ASC) AS rn
              FROM joined),
            sizes AS (
              SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_members
              FROM joined GROUP BY component_id)
            SELECT r.component_id,
                   r.doc_id AS keeper_doc_id,
                   r.quality_score AS keeper_quality,
                   s.n_members
            FROM ranked r JOIN sizes s ON r.component_id = s.component_id
            WHERE r.rn = 1""",
        "q_text_contamination": """
            WITH pos_tok AS (
              SELECT doc_id,
                     generate_subscripts(string_split(text, ' '), 1) AS pos,
                     unnest(string_split(text, ' ')) AS token
              FROM documents),
            g AS (
              SELECT DISTINCT doc_id,
                     token || ' ' || LEAD(token, 1) OVER w || ' '
                           || LEAD(token, 2) OVER w AS gram
              FROM pos_tok
              WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
              QUALIFY LEAD(token, 2) OVER w IS NOT NULL),
            bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10),
            cand AS (SELECT doc_id, gram FROM g WHERE doc_id >= 10),
            hits AS (
              SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
              FROM cand c SEMI JOIN bench b ON c.gram = b.gram
              GROUP BY c.doc_id),
            totals AS (
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
              FROM cand GROUP BY doc_id)
            SELECT t.doc_id, t.n_grams,
                   COALESCE(h.n_hit, 0) AS n_hit,
                   FLOOR(COALESCE(h.n_hit, 0) * 1000000.0 / t.n_grams)
                     / 1000000.0 AS contamination_ratio,
                   FLOOR(COALESCE(h.n_hit, 0) * 1000000.0 / t.n_grams)
                     / 1000000.0 > 0.5 AS is_contaminated
            FROM totals t LEFT JOIN hits h ON t.doc_id = h.doc_id""",
    }


ORACLES = _oracles()
