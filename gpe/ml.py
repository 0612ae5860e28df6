"""Model-evaluation / drift metrics over the lake — the scoring queries an
ML platform runs where the data already lives (no sklearn round-trip):
one-vs-rest AUC, calibration (reliability) deciles, population-stability
drift, and the two-sample Kolmogorov–Smirnov statistic.

Reference note: /root/reference is an EMPTY checkout (SURVEY §0); these
operators extend SURVEY §2's contract under the BASELINE.json:6 mandate
(training-data pipeline analytics as first-class operators). Algorithms
are public-literature standards: rank-form AUC (Hanley & McNeil 1982 /
Mann-Whitney U), PSI (the standard credit-scoring drift measure, e.g.
Karakoulas 2004), two-sample KS via cumulative-count crossings.

Cross-engine determinism (the repo-wide fixed-point discipline,
SURVEY §5.3): scores are exact DECIMAL dot products (the gpe/vectors.py
recipe — float32 widened to double, cast DECIMAL(12,10), order-free
decimal sums); counts and rank statistics are exact integers; ln() terms
are e6-floored with the EPS nudge before any aggregation; only final
display ratios return to double via ROUND(x + EPS, 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpe.common import EPS
from gpe.io import load_table
from gpe.io import load_table_spread as _lts

# Exploded embeddings + per-class component SUM table (NOT the mean:
# AUC/calibration rank by the score, and ranking is invariant under the
# positive per-class scale 1/n — skipping the division keeps every score
# an exact decimal with no rounding step at all).
_SQL_EXPLODED = """
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
"""

# DuckDB widens FLOAT→DECIMAL in float32 precision; the explicit DOUBLE
# cast first makes both engines round the identical 64-bit value
# (measured in gpe/vectors.py — same twin comment there).
_SQL_CLASS_SCORES = f"""
    ex AS ({_SQL_EXPLODED}),
    cd AS (
      SELECT label AS cls, pos,
             CAST(SUM(CAST(x AS DECIMAL(12,10))) AS DECIMAL(18,10)) AS sdim
      FROM ex GROUP BY 1, 2),
    sc AS (
      SELECT e.vec_id, e.label, c.cls,
             SUM(CAST(e.x AS DECIMAL(12,10)) * c.sdim) AS score
      FROM ex e JOIN cd c ON e.pos = c.pos
      GROUP BY 1, 2, 3)
"""


def _class_scores(emb: DataFrame) -> DataFrame:
    """(vec_id, label, cls, score): every vector scored against every
    class prototype, score = <embedding, Σ members of cls> as an exact
    DECIMAL (order-free; ties compare exactly, so downstream ranks are
    engine-identical by construction).

    Scale notes (100 TB): the prototype table is (k·dim) rows — built by
    one (label, pos) shuffle with map-side partial sums, then BROADCAST;
    scoring is a map-side explode-join-reaggregate keyed by vec_id, so
    the corpus side streams through one shuffle regardless of k."""
    ex = emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "x"))
    cd = (
        ex.groupBy(F.col("label").alias("cls"), "pos")
        .agg(
            F.sum(F.col("x").cast("decimal(12,10)"))
            .cast("decimal(18,10)")
            .alias("sdim")
        )
    )
    return (
        ex.join(F.broadcast(cd), "pos")
        .groupBy("vec_id", "label", "cls")
        .agg(
            F.sum(F.col("x").cast("decimal(12,10)") * F.col("sdim")).alias(
                "score"
            )
        )
    )


def q_ml_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest ROC AUC per class over the embeddings table, scored by
    the nearest-class-prototype dot product — the rank-form (Mann-Whitney
    U) AUC: U = Σ_pos rank − n⁺(n⁺+1)/2, AUC = U/(n⁺·n⁻), computed here
    in the tie-aware cumulative form 2U = Σ_s pos_s·(2·cumneg_below + neg_s)
    over DISTINCT score groups (Hanley & McNeil 1982).

    Determinism: scores are exact decimals (see _class_scores), the group
    cumsum is exact integers, and 2U is an exact LONG — only the final
    AUC ratio is a double, rounded with the EPS nudge.

    Scale notes (100 TB): one groupBy (cls, score) with map-side partial
    counts collapses the corpus to distinct-score rows; the rank window
    partitions by cls (k-way parallel) over that aggregate output — never
    a raw-table global sort. At 10⁹ vectors the distinct-score frame is
    the only window input, and the final answer is k rows."""
    emb = _lts(spark, sf_dir, "embeddings")
    sc = _class_scores(emb)
    ps = sc.groupBy("cls", "score").agg(
        F.sum(F.when(F.col("label") == F.col("cls"), 1).otherwise(0)).alias(
            "pos_s"
        ),
        F.sum(F.when(F.col("label") != F.col("cls"), 1).otherwise(0)).alias(
            "neg_s"
        ),
    )
    w = (
        Window.partitionBy("cls")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = ps.withColumn(
        "cumneg", F.coalesce(F.sum("neg_s").over(w), F.lit(0))
    )
    return (
        cum.groupBy(F.col("cls").alias("label"))
        .agg(
            F.sum("pos_s").cast("long").alias("n_pos"),
            F.sum("neg_s").cast("long").alias("n_neg"),
            F.sum(
                F.col("pos_s") * (F.lit(2) * F.col("cumneg") + F.col("neg_s"))
            )
            .cast("long")
            .alias("u2x"),
        )
        .select(
            "label",
            "n_pos",
            "n_neg",
            "u2x",
            F.round(
                F.col("u2x")
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg"))
                + F.lit(EPS),
                6,
            ).alias("auc"),
        )
    )


_SQL_ML_AUC = f"""
    WITH {_SQL_CLASS_SCORES},
    ps AS (
      SELECT cls, score,
             SUM(CASE WHEN label = cls THEN 1 ELSE 0 END) AS pos_s,
             SUM(CASE WHEN label <> cls THEN 1 ELSE 0 END) AS neg_s
      FROM sc GROUP BY 1, 2),
    cum AS (
      SELECT cls, pos_s, neg_s,
             COALESCE(SUM(neg_s) OVER (PARTITION BY cls ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumneg
      FROM ps)
    SELECT cls AS label,
           CAST(SUM(pos_s) AS BIGINT) AS n_pos,
           CAST(SUM(neg_s) AS BIGINT) AS n_neg,
           CAST(SUM(pos_s * (2 * cumneg + neg_s)) AS BIGINT) AS u2x,
           ROUND(SUM(pos_s * (2 * cumneg + neg_s))
                 / (2.0 * SUM(pos_s) * SUM(neg_s)) + 1e-9, 6) AS auc
    FROM cum GROUP BY 1
"""


def q_ml_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) deciles for the class-0 prototype score:
    rank all vectors by score, cut into 10 equal-rank bins (NTILE), and
    report per-bin size, exact mean score, and positive rate — the table
    behind every calibration curve / ECE computation.

    Rank bins instead of value bins on purpose: NTILE over (score, vec_id)
    is a pure integer rank computation over exact-decimal scores — no
    min-max normalization (whose decimal division would round) and no
    empty bins. Determinism: the (score, vec_id) order is total, so bin
    membership is engine-identical.

    Scale notes (100 TB): the score frame is one row per vector — OPEN
    cardinality — so the global NTILE is the two-pass range-partition
    recipe (gpe/common.two_pass_ntile: range repartition → local rank →
    broadcast offset table; the r11 window-audit tightening retired the
    old unpartitioned-NTILE-over-aggregate form). Partition-count-
    invariant per tests/test_two_pass_invariance.py."""
    from gpe.common import two_pass_ntile

    emb = _lts(spark, sf_dir, "embeddings")
    sc = _class_scores(emb).filter(F.col("cls") == 0)
    # cast: Spark ntile is INT, DuckDB NTILE is BIGINT — the driver's
    # schema gate compares dtypes (tests/test_io_sources.py dtype parity)
    b = two_pass_ntile(spark, sc, 10, ["score", "vec_id"], "bin").withColumn(
        "bin", F.col("bin").cast("long")
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.sum("score").alias("s_sum"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(
                F.col("s_sum").cast("double") / F.col("n") + F.lit(EPS), 6
            ).alias("mean_score"),
            F.round(F.col("n_pos") / F.col("n") + F.lit(EPS), 6).alias(
                "pos_rate"
            ),
        )
    )


_SQL_ML_CALIBRATION = f"""
    WITH {_SQL_CLASS_SCORES},
    b AS (
      SELECT vec_id, label, score,
             NTILE(10) OVER (ORDER BY score, vec_id) AS bin
      FROM sc WHERE cls = 0)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           ROUND(CAST(SUM(score) AS DOUBLE) / COUNT(*) + 1e-9, 6)
             AS mean_score,
           ROUND(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) + 1e-9, 6) AS pos_rate
    FROM b GROUP BY 1
"""


def q_ml_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution between
    the 1995–97 and 1998–2001 eras — the standard score/feature drift
    monitor (PSI = Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ); <0.1 stable, >0.25 shifted).
    Fixed 50k-wide value bins, Laplace-smoothed ((n+1)/(N+B)) so empty
    bins stay finite — per-bin rows so the monitor can show WHICH value
    band drifted, not just the total.

    Determinism: bin counts are exact integers; p, q are correctly-rounded
    doubles of integer ratios; each (p−q)·ln(p/q) term (≥ 0 by sign
    agreement) is e6-floored with the EPS nudge into a LONG before any
    reader sums them — the q_text_unigram_logprob libm discipline.

    Scale notes (100 TB): one groupBy (bin, era) with map-side partials
    collapses the fact table to ≤ 2·B rows; era totals ride the same
    aggregate through a broadcast — a single fact-scan pass."""
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9))
        .cast("long")
        .alias("bin"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_a"),
    )
    cnt = binned.groupBy("bin").agg(
        F.sum("is_a").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).cast("long").alias("n_b"),
    )
    tot = cnt.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    p = (F.col("n_a") + 1) / (F.col("t_a") + 10)
    q = (F.col("n_b") + 1) / (F.col("t_b") + 10)
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_a",
            "n_b",
            F.floor((p - q) * F.log(p / q) * F.lit(1_000_000) + F.lit(EPS))
            .cast("long")
            .alias("psi_term_e6"),
        )
    )


_SQL_ML_PSI = """
    WITH binned AS (
      SELECT CAST(LEAST(FLOOR(o_totalprice / 50000), 9) AS BIGINT) AS bin,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0
               END AS is_a
      FROM orders),
    cnt AS (
      SELECT bin, CAST(SUM(is_a) AS BIGINT) AS n_a,
             CAST(SUM(1 - is_a) AS BIGINT) AS n_b
      FROM binned GROUP BY 1),
    tot AS (SELECT SUM(n_a) AS t_a, SUM(n_b) AS t_b FROM cnt)
    SELECT bin, n_a, n_b,
           CAST(FLOOR(((n_a + 1) / (t_a + 10.0) - (n_b + 1) / (t_b + 10.0))
                 * ln(((n_a + 1) / (t_a + 10.0))
                      / ((n_b + 1) / (t_b + 10.0)))
                 * 1000000 + 1e-9) AS BIGINT) AS psi_term_e6
    FROM cnt CROSS JOIN tot
"""


def q_ml_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the `value`
    distributions of click and purchase events — the distribution-shift
    test an experimentation/drift platform runs pairwise. D = max_v
    |F₁(v) − F₂(v)|, computed over the merged distinct-value support in
    the cross-multiplied integer form |cum₁·N₂ − cum₂·N₁| so the max and
    its argmax (earliest value on ties) are exact-integer decisions.

    Scale notes (100 TB): groupBy(value) with map-side partials collapses
    the events scan to distinct-value rows; that support is still OPEN
    cardinality (distinct metric values grow with the data), so both
    cumulative sums are the two-pass range-partition recipe
    (gpe/common.two_pass_running_sums — one shuffle computes both
    prefixes; the r11 window-audit tightening retired the old
    unpartitioned-window form) and the argmax is a 1-row sort-limit
    (TakeOrdered — per-partition top-1, no global sort). The result is
    one row."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.col("value").cast("decimal(12,2)").alias("v"),
            (F.col("event_type") == "click").cast("int").alias("is_a"),
        )
    )
    per_v = e.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("a"),
        F.sum(F.lit(1) - F.col("is_a")).cast("long").alias("b"),
    )
    from gpe.common import two_pass_running_sums

    cum = two_pass_running_sums(
        spark, per_v, ["v"], [("a", "ca"), ("b", "cb")]
    ).select("v", "ca", "cb")
    tot = per_v.agg(
        F.sum("a").cast("long").alias("na"), F.sum("b").cast("long").alias("nb")
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "na",
        "nb",
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).alias(
            "d_num"
        ),
    )
    return (
        d.orderBy(F.desc("d_num"), F.asc("v"))
        .limit(1)
        .select(
            "na",
            "nb",
            F.col("v").cast("double").alias("at_value"),
            "d_num",
            F.round(
                F.col("d_num") / (F.col("na") * F.col("nb")) + F.lit(EPS), 6
            ).alias("ks_stat"),
        )
    )


_SQL_ML_KS = """
    WITH e AS (
      SELECT CAST(value AS DECIMAL(12,2)) AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('click', 'purchase')),
    per_v AS (
      SELECT v, CAST(SUM(is_a) AS BIGINT) AS a,
             CAST(SUM(1 - is_a) AS BIGINT) AS b
      FROM e GROUP BY 1),
    cum AS (
      SELECT v,
             SUM(a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS ca,
             SUM(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS cb
      FROM per_v),
    tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM per_v),
    d AS (
      SELECT v, na, nb, ABS(ca * nb - cb * na) AS d_num
      FROM cum CROSS JOIN tot)
    SELECT na, nb, CAST(v AS DOUBLE) AS at_value,
           CAST(d_num AS BIGINT) AS d_num,
           ROUND(d_num / CAST(na * nb AS DOUBLE) + 1e-9, 6) AS ks_stat
    FROM d
    ORDER BY d_num DESC, v ASC
    LIMIT 1
"""


def q_ml_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the nearest-prototype classifier (predict the
    class whose prototype dot is highest): per (true label, predicted)
    cell count and the row-normalized share — the error-structure view
    that tells WHICH classes the embedding space confuses, next to
    q_ml_auc's threshold-free ranking quality.

    Determinism: the argmax is a row_number over exact-decimal scores
    with (score DESC, cls ASC) — a total order, so ties break
    identically cross-engine; shares are _floor-style e6 ratios of exact
    counts.

    Scale notes (100 TB): the argmax window partitions by vec_id over
    the k-scored aggregate frame (maximal parallelism, k rows per
    partition group); the matrix is a ≤k² rollup with the row marginal
    as a window over it."""
    emb = _lts(spark, sf_dir, "embeddings")
    sc = _class_scores(emb)
    w = Window.partitionBy("vec_id").orderBy(F.desc("score"), F.asc("cls"))
    pred = (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("cls").alias("pred"))
    )
    cm = pred.groupBy("label", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_row = Window.partitionBy("label")
    return cm.select(
        "label",
        "pred",
        "n",
        (
            F.floor(F.col("n") * F.lit(1_000_000) / F.sum("n").over(w_row))
            / F.lit(1_000_000.0)
        ).alias("row_share"),
    )


_SQL_ML_CONFUSION = f"""
    WITH {_SQL_CLASS_SCORES},
    pred AS (
      SELECT vec_id, label, cls AS pred,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY score DESC, cls ASC) AS rn
      FROM sc),
    cm AS (
      SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred WHERE rn = 1 GROUP BY 1, 2)
    SELECT label, pred, n,
           FLOOR(n * 1000000 / SUM(n) OVER (PARTITION BY label))
             / 1000000.0 AS row_share
    FROM cm
"""


def q_ml_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class separation margins of the prototype scorer: for each
    vector, margin = (own-class score) − (best other-class score) — the
    geometric audit behind the confusion matrix (positive margin ⇔
    nearest-prototype-correct; the mean/min margins say HOW safely).

    Determinism: margins are differences of exact decimals; the
    per-class mean returns to double only at the display round; the min
    is an exact decimal comparison cast at the end.

    Scale notes (100 TB): one vec_id-partial aggregate over the scored
    frame (own via a conditional max, best-other likewise — single
    pass, no self-join), then a k-row rollup."""
    emb = _lts(spark, sf_dir, "embeddings")
    sc = _class_scores(emb)
    per_vec = sc.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("cls") == F.col("label"), F.col("score"))).alias(
            "own"
        ),
        F.max(F.when(F.col("cls") != F.col("label"), F.col("score"))).alias(
            "other"
        ),
    )
    m = per_vec.select(
        "label", (F.col("own") - F.col("other")).alias("margin")
    )
    return m.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("margin") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_separated"),
        F.round(
            F.sum("margin").cast("double") / F.count(F.lit(1)) + F.lit(EPS),
            6,
        ).alias("mean_margin"),
        F.round(F.min("margin").cast("double") + F.lit(EPS), 6).alias(
            "min_margin"
        ),
    )


_SQL_ML_MARGIN = f"""
    WITH {_SQL_CLASS_SCORES},
    per_vec AS (
      SELECT vec_id, label,
             MAX(CASE WHEN cls = label THEN score END) AS own,
             MAX(CASE WHEN cls <> label THEN score END) AS other
      FROM sc GROUP BY 1, 2)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN own - other > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_separated,
           ROUND(CAST(SUM(own - other) AS DOUBLE) / COUNT(*) + 1e-9, 6)
             AS mean_margin,
           ROUND(CAST(MIN(own - other) AS DOUBLE) + 1e-9, 6) AS min_margin
    FROM per_vec GROUP BY 1
"""


_KNN_EVAL_QUERIES = 100  # eval set: vec_id < 100 (the sampled-audit shape)
_KNN_K = 5

# Prefilter-margin derivation (ADVICE r10 — the superset property is now
# ENFORCED, not assumed): the IEEE-double dot fold's absolute error is
# ≤ dim · u · Σ|qᵢ·cᵢ| ≤ dim² · u · B² with u = 2⁻⁵³ and |component| ≤ B.
# With B = 32 and dim ≤ 2048 that is ≤ 4.8e-7 < _KNN_MARGIN, so keeping
# every candidate within _KNN_MARGIN of the k-th double score is a
# guaranteed superset of the exact-decimal top-k. Both B and the dim cap
# are asserted IN-PLAN (once per row, fused into the embedding projection
# so column pruning cannot drop the check) — a fixture with larger
# components fails loudly instead of silently weakening the guarantee.
_KNN_COMP_BOUND = 32.0
_KNN_DIM_CAP = 2048
_KNN_MARGIN = 1e-6


def _bound_checked(emb_col: str):
    """The embedding column, guarded: evaluates to the array when every
    |component| ≤ _KNN_COMP_BOUND and dim ≤ _KNN_DIM_CAP, raises
    otherwise. assert_true returns NULL on pass, so the WHEN fuses the
    check into the consuming expression's own column."""
    ok = (
        F.aggregate(
            F.col(emb_col),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
        )
        <= F.lit(_KNN_COMP_BOUND)
    ) & (F.size(F.col(emb_col)) <= F.lit(_KNN_DIM_CAP))
    return F.when(
        F.assert_true(
            ok, F.lit("knn_eval: embedding breaks the prefilter bound")
        ).isNull(),
        F.col(emb_col),
    )


def q_ml_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier evaluation (k = 5, cosine-by-dot): for each of the
    first 100 vectors, take the 5 nearest corpus neighbors (self
    excluded), majority-vote their labels (ties → smallest label), and
    report per-true-label accuracy — the label-consistency audit
    (Fix & Hodges 1951 k-NN) that complements q_ml_confusion's
    prototype view: prototypes test global separation, k-NN tests LOCAL
    neighborhood purity.

    Determinism: dots are exact decimals (`_dot_dec`'s order-free
    DECIMAL(12,10)-component fold — the same value the oracle's
    positional-join SUM computes); the top-5 cut is a (dot DESC,
    neighbor_id ASC) total order; votes are integer counts with a
    (count DESC, label ASC) argmax — every decision exact.

    Scale notes (100 TB): the eval set is BROADCAST as whole ARRAYS
    against one corpus scan and the dot is a map-side array fold —
    NO explode, NO shuffle of embedding payloads (the q_vec_knn_brute
    shape, gpe/vectors.py). The r9 version posexploded both sides and
    joined on `pos` alone — a queries×corpus×dim intermediate funneled
    through a 4-key groupBy (~12.8 M rows at sf0.1, ~1.3 B at 100× —
    the repo's own documented fold-before-explode anti-pattern, VERDICT
    r9 #1); this rewrite removes that shuffle entirely. The hot scan
    runs the ~5×-cheaper IEEE double fold; the top-k cut keeps every
    candidate within _KNN_MARGIN of the k-th double score — a superset
    of the exact top-k GUARANTEED by the in-plan component-bound guard
    (see the _KNN_MARGIN derivation above; a fixture breaking the bound
    raises instead of silently weakening the cut), and only
    that (queries × ~k)-row shortlist pays the exact-decimal re-rank —
    the q_vec_range_search prefilter discipline applied to a RANK cut.
    Evaluating EVERY vector is the all-pairs job
    q_vec_pairs_threshold's cogrouped BLAS grid exists for."""
    from gpe.vectors import _dot_dbl, _dot_dec

    emb = _lts(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _KNN_EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        "embedding",
    )
    # bound guards evaluate ONCE PER ROW below the broadcast join (the
    # projection sits on each join input, not on the pair fan-out)
    q_chk = q.select(
        "query_id", _bound_checked("q_emb").alias("q_emb")
    )
    c_chk = c.select("nid", _bound_checked("embedding").alias("embedding"))
    scores = (
        F.broadcast(q_chk)
        .join(c_chk, F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            "nid",
            _dot_dbl("q_emb", "embedding").alias("dbl"),
        )
    )
    w_dbl = Window.partitionBy("query_id").orderBy(F.desc("dbl"), F.asc("nid"))
    w_q = Window.partitionBy("query_id")
    shortlist = (
        scores.withColumn("rk_dbl", F.row_number().over(w_dbl))
        .withColumn(
            "kth_dbl",
            F.max(F.when(F.col("rk_dbl") == _KNN_K, F.col("dbl"))).over(w_q),
        )
        .filter(
            (F.col("rk_dbl") <= _KNN_K)
            | (F.col("dbl") >= F.col("kth_dbl") - F.lit(_KNN_MARGIN))
        )
        .select("query_id", "nid")
    )
    # exact-decimal re-rank on the tiny shortlist: re-join the arrays
    # (shortlist broadcast against one more corpus scan; the query side
    # is already driver-sized) so embedding payloads never shuffle.
    dots = (
        F.broadcast(shortlist)
        .join(c, "nid")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "true_label",
            "nid",
            "nlabel",
            _dot_dec("q_emb", "embedding").alias("dot"),
        )
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.desc("dot"), F.asc("nid")
    )
    top = dots.withColumn("rk", F.row_number().over(w_top)).filter(
        F.col("rk") <= _KNN_K
    )
    votes = top.groupBy("query_id", "true_label", "nlabel").agg(
        F.count(F.lit(1)).alias("v")
    )
    w_vote = Window.partitionBy("query_id").orderBy(
        F.desc("v"), F.asc("nlabel")
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w_vote))
        .filter(F.col("rn") == 1)
        .select("query_id", "true_label", F.col("nlabel").alias("pred"))
    )
    return (
        pred.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(
                F.when(F.col("pred") == F.col("true_label"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "label",
            "n_queries",
            "n_correct",
            F.round(
                F.col("n_correct") / F.col("n_queries") + F.lit(EPS), 6
            ).alias("accuracy"),
        )
    )


_SQL_ML_KNN_EVAL = f"""
    WITH ex AS ({_SQL_EXPLODED}),
    lab AS (SELECT vec_id, label FROM embeddings),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nid,
             SUM(CAST(q.x AS DECIMAL(12,10)) * CAST(c.x AS DECIMAL(12,10)))
               AS dot
      FROM ex q JOIN ex c ON q.pos = c.pos AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {_KNN_EVAL_QUERIES}
      GROUP BY 1, 2),
    top AS (
      SELECT d.query_id, lq.label AS true_label, ln.label AS nlabel,
             ROW_NUMBER() OVER (PARTITION BY d.query_id
                                ORDER BY d.dot DESC, d.nid ASC) AS rk
      FROM dots d
      JOIN lab lq ON lq.vec_id = d.query_id
      JOIN lab ln ON ln.vec_id = d.nid),
    votes AS (
      SELECT query_id, true_label, nlabel, COUNT(*) AS v
      FROM top WHERE rk <= {_KNN_K} GROUP BY 1, 2, 3),
    pred AS (
      SELECT query_id, true_label, nlabel AS pred,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY v DESC, nlabel ASC) AS rn
      FROM votes)
    SELECT true_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(SUM(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE) + 1e-9, 6) AS accuracy
    FROM pred WHERE rn = 1 GROUP BY 1
"""


# NDCG@10 retrieval audit: queries vec_id < 10 (the q_vec_* query set),
# graded relevance = label match, ranked by exact-decimal cosine dot.
_NDCG_QUERIES = 10
_NDCG_K = 10
_NDCG_SALT = 16
# rank-discount weights floor(1e9 / log2(rank+1)), PRECOMPUTED once here in
# Python and baked as integer literals into BOTH engines' plans — libm
# log2 may differ in the last ulp between the JVM and DuckDB, and a
# floor() on either side of that ulp would flip a weight; a shared literal
# table removes the hazard by construction (the SURVEY §5.3 discipline).
_NDCG_W = tuple(
    int(1_000_000_000 / __import__("math").log2(i + 1))
    for i in range(1, _NDCG_K + 1)
)


def q_ml_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query for label-relevance retrieval (Järvelin &
    Kekäläinen 2002): each query's corpus ranking by exact-decimal cosine
    dot (self excluded, ties → smaller neighbor id), binary relevance =
    label match, ideal DCG from min(k, n_relevant) top slots — the
    ranking-quality audit that complements q_vec_ann_recall (overlap@k
    says the index returns the right SET; NDCG says the ORDER puts
    same-class items first, which is what a RAG/curation consumer feels).

    Determinism: dots are order-free exact decimals (gpe/vectors._dot_dec);
    ranks are a total order; discount weights are the module-level
    _NDCG_W integer literals (see its comment — no runtime log2 anywhere);
    DCG/IDCG are exact integer sums and NDCG is one exact integer DIV
    followed by a display division. Every label class has dozens of
    members in the fixture, so IDCG > 0 always; a zero-relevant query
    surfaces as a NULL ndcg, not a crash — the integer DIV is guarded by
    an explicit idcg_e9 > 0 predicate on BOTH engines (Spark 4's
    ANSI-default would otherwise raise DIVIDE_BY_ZERO; r12 ADVICE fix).

    Scale notes (100 TB): queries broadcast as whole arrays against one
    corpus scan — no embedding shuffle (the q_vec_knn_brute audit shape);
    the top-10 cut is the house TWO-STAGE salted rank (stage 1 partitions
    by (query, nid % 16) and keeps 10 per salt bucket, stage 2 re-ranks
    the ≤160-row survivor set) so no corpus-size window partition exists
    anywhere; n_relevant is one partial-agg groupBy. Never a global or
    per-query full sort."""
    from gpe.common import persist_tracked
    from gpe.vectors import _dot_dec

    emb = _lts(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NDCG_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("q_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("nid"), F.col("label").alias("nlabel"), "embedding"
    )
    dots = persist_tracked(
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            "qlabel",
            "nid",
            (F.col("nlabel") == F.col("qlabel")).cast("int").alias("rel"),
            _dot_dec("q_emb", "embedding").alias("dot"),
        )
    )
    nrel = dots.groupBy("query_id").agg(F.sum("rel").alias("n_rel"))
    w1 = Window.partitionBy("query_id", F.col("nid") % _NDCG_SALT).orderBy(
        F.desc("dot"), F.asc("nid")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("nid"))
    top = (
        dots.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= _NDCG_K)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _NDCG_K)
    )
    w_tab = F.array(*[F.lit(w) for w in _NDCG_W])
    scored = top.join(F.broadcast(nrel), "query_id").withColumn(
        "w_e9", F.element_at(w_tab, F.col("rk"))
    )
    per_q = scored.groupBy("query_id", "qlabel", "n_rel").agg(
        F.sum(F.col("rel") * F.col("w_e9")).alias("dcg_e9"),
        F.sum(
            F.when(
                F.col("rk") <= F.least(F.lit(_NDCG_K), F.col("n_rel")),
                F.col("w_e9"),
            ).otherwise(F.lit(0))
        ).alias("idcg_e9"),
    )
    return per_q.select(
        "query_id",
        F.col("qlabel").cast("int").alias("label"),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.col("dcg_e9").cast("long").alias("dcg_e9"),
        F.col("idcg_e9").cast("long").alias("idcg_e9"),
        F.when(
            F.col("idcg_e9") > 0,
            F.expr("(dcg_e9 * 1000000) DIV idcg_e9") / F.lit(1_000_000.0),
        ).alias("ndcg_at_10"),
    )


def q_ml_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the in-batch
    hard-negative selection of DPR, Karpukhin et al. 2020 / SimCSE): for
    each query vector (vec_id < 10), the single best SAME-label neighbor
    (the positive) and the single best DIFFERENT-label neighbor (the
    hard negative) by exact-decimal cosine dot, with the triplet margin
    pos − neg and a violation flag (margin ≤ 0 ⇔ the hardest negative
    outranks the best positive — the pairs a contrastive fine-tune must
    fix first). Complements q_ml_margin: that audits CLASS PROTOTYPES,
    this mines INSTANCE-level triplets a training job consumes.

    Determinism: dots are order-free exact decimals; each leg's argmax
    is max(struct(dot, −nid)) — an exact lexicographic comparison whose
    tie-break is the smaller neighbor id; the margin is an exact decimal
    difference; display values round at 6dp. ``violated`` is AUTHORITATIVE
    (computed from the PRE-round exact dots); ``margin`` is
    display-rounded, so a true margin in (0, 5e-7) prints as 0.0 with
    violated=false — by design, the flag wins (r12 ADVICE note). A query
    with no same-label or no different-label corpus member is DROPPED
    (matching the oracle's inner pos JOIN neg), not emitted with NULL
    legs — degenerate-label robustness, r12 ADVICE fix.

    Scale notes (100 TB): queries broadcast as arrays against one corpus
    scan (the q_vec_knn_brute shape); each leg is a map-side PARTIAL
    argmax folded per (query, leg) — NO window, NO sort, NO self-join
    anywhere, so the whole operator is one broadcast join + one
    partial-agg shuffle of 2 struct rows per query."""
    from gpe.vectors import _dot_dec

    emb = _lts(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NDCG_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("q_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("nid"), F.col("label").alias("nlabel"), "embedding"
    )
    dots = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            "qlabel",
            (F.col("nlabel") == F.col("qlabel")).alias("same"),
            F.struct(
                _dot_dec("q_emb", "embedding").alias("dot"),
                (-F.col("nid")).alias("mneg"),
            ).alias("s"),
        )
    )
    per_q = dots.groupBy("query_id", "qlabel").agg(
        F.max(F.when(F.col("same"), F.col("s"))).alias("pos"),
        F.max(F.when(~F.col("same"), F.col("s"))).alias("neg"),
    ).filter(F.col("pos").isNotNull() & F.col("neg").isNotNull())
    return per_q.select(
        "query_id",
        F.col("qlabel").cast("int").alias("label"),
        (-F.col("pos.mneg")).cast("long").alias("pos_id"),
        F.round("pos.dot", 6).cast("double").alias("pos_sim"),
        (-F.col("neg.mneg")).cast("long").alias("neg_id"),
        F.round("neg.dot", 6).cast("double").alias("neg_sim"),
        F.round(F.col("pos.dot") - F.col("neg.dot"), 6)
        .cast("double")
        .alias("margin"),
        (F.col("pos.dot") <= F.col("neg.dot")).alias("violated"),
    )


_SQL_ML_HARD_NEGATIVES = f"""
    WITH ex AS ({_SQL_EXPLODED}),
    lab AS (SELECT vec_id, label FROM embeddings),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nid,
             SUM(CAST(q.x AS DECIMAL(12,10)) * CAST(c.x AS DECIMAL(12,10)))
               AS dot
      FROM ex q JOIN ex c ON q.pos = c.pos AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {_NDCG_QUERIES}
      GROUP BY 1, 2),
    rel AS (
      SELECT d.query_id, lq.label AS qlabel, d.nid, d.dot,
             (ln.label = lq.label) AS same
      FROM dots d
      JOIN lab lq ON lq.vec_id = d.query_id
      JOIN lab ln ON ln.vec_id = d.nid),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id, same
                 ORDER BY dot DESC, nid ASC) AS rk
      FROM rel),
    pos AS (SELECT query_id, qlabel, nid, dot FROM ranked
            WHERE same AND rk = 1),
    neg AS (SELECT query_id, nid, dot FROM ranked
            WHERE NOT same AND rk = 1)
    SELECT p.query_id,
           CAST(p.qlabel AS INTEGER) AS label,
           CAST(p.nid AS BIGINT) AS pos_id,
           CAST(ROUND(p.dot, 6) AS DOUBLE) AS pos_sim,
           CAST(n.nid AS BIGINT) AS neg_id,
           CAST(ROUND(n.dot, 6) AS DOUBLE) AS neg_sim,
           CAST(ROUND(p.dot - n.dot, 6) AS DOUBLE) AS margin,
           (p.dot <= n.dot) AS violated
    FROM pos p JOIN neg n ON n.query_id = p.query_id
"""


_SQL_ML_NDCG = f"""
    WITH ex AS ({_SQL_EXPLODED}),
    lab AS (SELECT vec_id, label FROM embeddings),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nid,
             SUM(CAST(q.x AS DECIMAL(12,10)) * CAST(c.x AS DECIMAL(12,10)))
               AS dot
      FROM ex q JOIN ex c ON q.pos = c.pos AND q.vec_id <> c.vec_id
      WHERE q.vec_id < {_NDCG_QUERIES}
      GROUP BY 1, 2),
    rel AS (
      SELECT d.query_id, lq.label AS qlabel, d.nid, d.dot,
             CASE WHEN ln.label = lq.label THEN 1 ELSE 0 END AS rel
      FROM dots d
      JOIN lab lq ON lq.vec_id = d.query_id
      JOIN lab ln ON ln.vec_id = d.nid),
    nrel AS (SELECT query_id, SUM(rel) AS n_rel FROM rel GROUP BY 1),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY dot DESC, nid ASC) AS rk
      FROM rel),
    scored AS (
      SELECT t.query_id, t.qlabel, n.n_rel, t.rel, t.rk,
             ({list(_NDCG_W)})[t.rk] AS w_e9
      FROM ranked t JOIN nrel n ON n.query_id = t.query_id
      WHERE t.rk <= {_NDCG_K}),
    agg AS (
      SELECT query_id, qlabel, n_rel,
             SUM(rel * w_e9) AS dcg_e9,
             SUM(CASE WHEN rk <= LEAST({_NDCG_K}, n_rel)
                 THEN w_e9 ELSE 0 END) AS idcg_e9
      FROM scored GROUP BY 1, 2, 3)
    SELECT query_id,
           CAST(qlabel AS INTEGER) AS label,
           CAST(n_rel AS BIGINT) AS n_rel,
           CAST(dcg_e9 AS BIGINT) AS dcg_e9,
           CAST(idcg_e9 AS BIGINT) AS idcg_e9,
           CASE WHEN idcg_e9 > 0
                THEN ((dcg_e9 * 1000000) // idcg_e9) / 1000000.0
           END AS ndcg_at_10
    FROM agg
"""


# q_ml_quality_fit: keep/drop threshold on the e6-scaled predicted
# quality (0.5 on the 0..1 score)
_QFIT_THRESH_E6 = 900_000


def _qfit_dec(x: str) -> str:
    """Widen one BIGINT moment to DECIMAL(38,0) so the Cramer triple
    products stay exact far past int64 (n·Sxx·Szz ≈ 1e36 at a 1e10-doc
    lake). DuckDB's twin widens to HUGEINT (int128) — both are exact
    integers, so the dets agree bit-for-bit."""
    return f"CAST({x} AS DECIMAL(38,0))"


def _qfit_dets(dialect_cast) -> dict[str, str]:
    """The four Cramer determinants of the 3x3 normal equations
    A·w = b, A = [[n,Sx,Sz],[Sx,Sxx,Sxz],[Sz,Sxz,Szz]], b = [Sy,Sxy,
    Szy] — ONE expression template instantiated per engine (cast
    differs, arithmetic identical)."""
    c = dialect_cast
    m00 = f"({c('s_xx')} * s_zz - {c('s_xz')} * s_xz)"
    return {
        "det": f"{c('n')} * {m00}"
        f" - {c('s_x')} * ({c('s_x')} * s_zz - {c('s_xz')} * s_z)"
        f" + {c('s_z')} * ({c('s_x')} * s_xz - {c('s_xx')} * s_z)",
        "det0": f"{c('s_y')} * {m00}"
        f" - {c('s_x')} * ({c('s_xy')} * s_zz - {c('s_xz')} * s_zy)"
        f" + {c('s_z')} * ({c('s_xy')} * s_xz - {c('s_xx')} * s_zy)",
        "det1": f"{c('n')} * ({c('s_xy')} * s_zz - {c('s_xz')} * s_zy)"
        f" - {c('s_y')} * ({c('s_x')} * s_zz - {c('s_xz')} * s_z)"
        f" + {c('s_z')} * ({c('s_x')} * s_zy - {c('s_xy')} * s_z)",
        "det2": f"{c('n')} * ({c('s_xx')} * s_zy - {c('s_xy')} * s_xz)"
        f" - {c('s_x')} * ({c('s_x')} * s_zy - {c('s_xy')} * s_z)"
        f" + {c('s_y')} * ({c('s_x')} * s_xz - {c('s_xx')} * s_z)",
    }


def q_ml_quality_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-lake TRAINED quality filter (VERDICT r11 next-round #8) — the
    model-based curation step (fastText-style classifier distilled to a
    linear probe) closed end-to-end IN-PLAN: (1) assemble the 3x3
    normal-equation moments for quality ~ n_tokens + n_stopwords over
    the documents table (the q_ml_gram_moments summation-form pattern,
    Chu et al. NIPS'06 — target y = the e6-scaled q_text_quality
    heuristic score, i.e. heuristic→model distillation), (2) SOLVE the
    system via closed-form Cramer determinants over the exact integer
    moments (no driver solve — the 1-row moment frame never leaves the
    cluster), (3) score EVERY doc with the fitted weights and emit the
    filter decision histogram: per band (keep: predicted >= 0.9, else
    drop — 0.9 sits at the fixture score distribution's upper half, so
    both bands are populated and the threshold is a real decision), doc count and mean predicted quality, with the fitted
    weights (e6-floored) on each row.

    Determinism: features and the e6 target are exact integers (the
    quality score is the already-hash-checked round-6 double; ·1e6 +
    floor(+0.5) pins it); all nine moments are exact BIGINT sums;
    determinants are exact DECIMAL(38,0) integer arithmetic (DuckDB:
    HUGEINT) — identical by construction; weights are single IEEE
    divisions of the SAME exact integers (decimal→double conversion is
    correctly rounded in both engines), and every per-doc prediction is
    the same 5-op IEEE expression. A singular system (det = 0, only
    possible with degenerate collinear features) yields NULL weights
    and band 'unscored' on both engines rather than a crash.

    Scale notes (100 TB): pass 1 is ONE map-side-partial aggregate to a
    single 9-moment row (shipping moments, not rows — the statistical-
    query pattern); the solve is arithmetic ON that row; pass 2
    broadcasts the 1-row weight table into a second scan and reduces to
    2 band rows. No window, no join wider than a 1-row broadcast, two
    projected scans total."""
    from gpe.text import quality_exprs

    d = load_table(spark, sf_dir, "documents")
    q = d.select(*quality_exprs()).select(
        F.col("n_tokens").cast("long").alias("x"),
        F.col("n_stopwords").cast("long").alias("z"),
        F.floor(F.col("quality_score") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    m = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s_x"),
        F.sum("z").alias("s_z"),
        F.sum("y").alias("s_y"),
        F.sum(F.col("x") * F.col("x")).alias("s_xx"),
        F.sum(F.col("x") * F.col("z")).alias("s_xz"),
        F.sum(F.col("z") * F.col("z")).alias("s_zz"),
        F.sum(F.col("x") * F.col("y")).alias("s_xy"),
        F.sum(F.col("z") * F.col("y")).alias("s_zy"),
    )
    dets = _qfit_dets(_qfit_dec)
    solved = m.select(
        *[F.expr(e).alias(k) for k, e in dets.items()]
    ).select(
        *[
            F.when(
                F.col("det") != 0,
                F.expr(f"CAST({dk} AS DOUBLE) / CAST(det AS DOUBLE)"),
            ).alias(w)
            for dk, w in (("det0", "w0"), ("det1", "w1"), ("det2", "w2"))
        ]
    )
    scored = q.crossJoin(F.broadcast(solved)).select(
        F.floor(
            F.col("w0") + F.col("w1") * F.col("x") + F.col("w2") * F.col("z")
        ).alias("pred_e6"),
        "w0",
        "w1",
        "w2",
    )
    return (
        scored.groupBy(
            F.when(F.col("pred_e6").isNull(), "unscored")
            .when(F.col("pred_e6") >= _QFIT_THRESH_E6, "keep")
            .otherwise("drop")
            .alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(pred_e6) DIV count(1)").alias("mean_pred_e6"),
            F.floor(F.min("w0") * 1_000_000).cast("long").alias("w0_e6"),
            F.floor(F.min("w1") * 1_000_000).cast("long").alias("w1_e6"),
            F.floor(F.min("w2") * 1_000_000).cast("long").alias("w2_e6"),
        )
    )


def _qfit_hug(x: str) -> str:
    return f"CAST({x} AS HUGEINT)"


_QFIT_DETS_SQL = _qfit_dets(_qfit_hug)

_SQL_ML_QUALITY_FIT = f"""
    WITH t AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
             CAST(len(list_filter(string_split(text, ' '),
                  tk -> tk IN ('the', 'a'))) AS BIGINT) AS z,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    q AS (
      SELECT x, z,
             CAST(FLOOR(ROUND(0.5 * LEAST(CAST(x AS DOUBLE) / 50.0, 1.0)
                   + 0.5 * (1.0 - FLOOR(z * 1000000.0 / x) / 1000000.0)
                   + {EPS}, 6) * 1000000 + 0.5) AS BIGINT) AS y
      FROM t),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(x) AS s_x, SUM(z) AS s_z, SUM(y) AS s_y,
             SUM(x * x) AS s_xx, SUM(x * z) AS s_xz,
             SUM(z * z) AS s_zz, SUM(x * y) AS s_xy,
             SUM(z * y) AS s_zy
      FROM q),
    d AS (
      SELECT ({_QFIT_DETS_SQL['det']}) AS det,
             ({_QFIT_DETS_SQL['det0']}) AS det0,
             ({_QFIT_DETS_SQL['det1']}) AS det1,
             ({_QFIT_DETS_SQL['det2']}) AS det2
      FROM m),
    w AS (
      SELECT CASE WHEN det <> 0
                  THEN CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) END AS w0,
             CASE WHEN det <> 0
                  THEN CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) END AS w1,
             CASE WHEN det <> 0
                  THEN CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) END AS w2
      FROM d),
    scored AS (
      SELECT CAST(FLOOR(w.w0 + w.w1 * q.x + w.w2 * q.z) AS BIGINT)
               AS pred_e6,
             w.w0, w.w1, w.w2
      FROM q CROSS JOIN w)
    SELECT CASE WHEN pred_e6 IS NULL THEN 'unscored'
                WHEN pred_e6 >= {_QFIT_THRESH_E6} THEN 'keep'
                ELSE 'drop' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pred_e6) // COUNT(*) AS BIGINT) AS mean_pred_e6,
           CAST(FLOOR(MIN(w0) * 1000000) AS BIGINT) AS w0_e6,
           CAST(FLOOR(MIN(w1) * 1000000) AS BIGINT) AS w1_e6,
           CAST(FLOOR(MIN(w2) * 1000000) AS BIGINT) AS w2_e6
    FROM scored GROUP BY 1
"""


QUERIES = {
    "q_ml_quality_fit": q_ml_quality_fit,
    "q_ml_knn_eval": q_ml_knn_eval,
    "q_ml_ndcg": q_ml_ndcg,
    "q_ml_hard_negatives": q_ml_hard_negatives,
    "q_ml_confusion": q_ml_confusion,
    "q_ml_margin": q_ml_margin,
    "q_ml_auc": q_ml_auc,
    "q_ml_calibration": q_ml_calibration,
    "q_ml_psi": q_ml_psi,
    "q_ml_ks": q_ml_ks,
}

ORACLES = {
    "q_ml_quality_fit": _SQL_ML_QUALITY_FIT,
    "q_ml_knn_eval": _SQL_ML_KNN_EVAL,
    "q_ml_ndcg": _SQL_ML_NDCG,
    "q_ml_hard_negatives": _SQL_ML_HARD_NEGATIVES,
    "q_ml_confusion": _SQL_ML_CONFUSION,
    "q_ml_margin": _SQL_ML_MARGIN,
    "q_ml_auc": _SQL_ML_AUC,
    "q_ml_calibration": _SQL_ML_CALIBRATION,
    "q_ml_psi": _SQL_ML_PSI,
    "q_ml_ks": _SQL_ML_KS,
}
