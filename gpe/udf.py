"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

Two declared queries exercise the Arrow boundary end-to-end (vectorized
pandas UDF, applyInPandas group aggregation); the UDTF and the plain Python
UDF are engine capabilities verified in tests/test_udf_surface.py only —
row-at-a-time Python stays out of declared (hot) paths by design.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from gpe.io import load_table


@pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Deterministic text normalization (lower, trim, collapse whitespace) —
    Arrow-vectorized; the oracle reproduces it with SQL string functions."""
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF over documents: normalized text + its sha256.
    (The corpus is already clean, so normalize == lower(trim(.)) — which is
    exactly what makes an exact SQL oracle possible.)"""
    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.length(norm).alias("norm_len"),
        F.sha2(norm.cast("binary"), 256).alias("norm_hash"),
    )


def q_udaf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user median inter-event gap (µs) via applyInPandas.

    The gaps are exact integers (µs), numpy's median averages the two
    middle values for even counts — exact halves, bit-identical to DuckDB's
    MEDIAN over the same integers."""
    ev = load_table(spark, sf_dir, "events")

    def median_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf.sort_values(["ts", "event_id"])
        # explicit µs cast — unit-independent (Arrow↔pandas may deliver
        # datetime64[ns] or [us] depending on versions; a raw astype(int64)
        # would silently change scale by 1000×)
        gaps = (
            p["ts"].diff().dropna().astype("timedelta64[us]").astype("int64")
        )
        if len(gaps) == 0:
            return pd.DataFrame(
                {"user_id": [p["user_id"].iloc[0]], "median_gap_us": [None],
                 "n_events": [len(p)]}
            )
        return pd.DataFrame(
            {
                "user_id": [p["user_id"].iloc[0]],
                "median_gap_us": [float(gaps.median())],
                "n_events": [len(p)],
            }
        )

    from gpe.common import two_pass_parts

    # EXPLICIT repartition on the grouping key before the grouped map
    # (r5): AQE coalesces shuffle partitions by BYTE size, but a
    # Python-boundary stage is CPU-bound per row — at sf0.1 the ~2 MB
    # shuffle coalesced to ONE partition and every group ran serially in
    # a single Python worker (measured 3.2 s for a trivial grouped map;
    # 0.8 s with the partition count pinned). A user-specified numPartitions
    # is exempt from AQE coalescing, and HashPartitioning(user_id)
    # satisfies the grouped-map distribution so no second shuffle appears.
    return (
        ev.select("user_id", F.col("ts"), "event_id")
        .repartition(two_pass_parts(spark), "user_id")
        .groupBy("user_id")
        .applyInPandas(
            median_gap, "user_id long, median_gap_us double, n_events long"
        )
    )


def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map over the Arrow boundary: per user, purchases and views
    arrive as two pandas frames (`groupBy.cogroup.applyInPandas`) and merge
    into one row — n_purchases, n_views, how many purchases exceed the
    user's max view value, and that max.

    All outputs are counts or an exact MAX (no float arithmetic), so the
    SQL twin (FULL OUTER JOIN of the two per-user aggregates) hashes
    identically. Cogroup shuffles BOTH inputs on user_id once — the same
    cost as the equivalent join — but hands the merge to Python, which is
    the escape hatch for merge logic SQL can't express (merge_asof,
    per-group model scoring); here the logic is deliberately SQL-
    expressible so the oracle can certify the plumbing."""
    ev = load_table(spark, sf_dir, "events")
    # DISTINCT aliases per side, not a shared "value": in a self-cogroup
    # both sides carry the same attribute ids, and under a
    # pruned-output consumer (e.g. count()) Catalyst drops the right
    # side's copy from requiredChildOutput — the pandas frame then
    # arrives without the column and the UDF crashes. Fresh aliases give
    # each side its own lineage, which prunes correctly. (toPandas/
    # collect consumers never hit this; found by the vanilla-session
    # driver-sim in tests/test_vanilla_session.py.)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("value").alias("p_value")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("value").alias("v_value")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        uid = (left if len(left) else right)["user_id"].iloc[0]
        max_view = float(right["v_value"].max()) if len(right) else None
        n_above = (
            int((left["p_value"] > max_view).sum())
            if len(left) and max_view is not None
            else 0
        )
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_purchases": [len(left)],
                "n_views": [len(right)],
                "n_purch_above_max_view": [n_above],
                "max_view": [max_view],
            }
        )

    from gpe.common import two_pass_parts

    # pin both cogroup sides' partition counts — same AQE-coalescing-vs-
    # Python-parallelism rationale as q_udaf_applyinpandas above
    n_parts = two_pass_parts(spark)
    return (
        p.repartition(n_parts, "user_id")
        .groupBy("user_id")
        .cogroup(v.repartition(n_parts, "user_id").groupBy("user_id"))
        .applyInPandas(
            merge,
            "user_id long, n_purchases long, n_views long,"
            " n_purch_above_max_view long, max_view double",
        )
    )


def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.11 UDTF surface as a declared key (previously pytest-only):
    a Python table function emits (pos, token) rows per document through
    a LATERAL join, then a plain aggregate profiles each token (count,
    doc count, earliest 1-based position). The oracle recomputes the
    same rows with unnest + subscripts, so a green hash pins the whole
    UDTF path — registration, LATERAL correlation, the Python row
    emitter, and the 1-based position contract.

    Scale notes (100 TB): UDTFs are row-at-a-time Python — this key is
    the SURFACE demonstrator over the document corpus; the declared
    scale path for tokenization is the codegen'd explode
    (q_explode_tokens), and the pytest equivalence between the two is
    the real guard. Keep UDTFs for logic that genuinely needs arbitrary
    Python per row, and batch everything else."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class TokenEmitter:
        def eval(self, text: str):  # noqa: ANN001
            for i, tok in enumerate(text.split(" ")):
                yield i + 1, tok

    spark.udtf.register("gpe_token_emitter", TokenEmitter)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "gpe_udtf_docs"
    )
    rows = spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM gpe_udtf_docs d, LATERAL gpe_token_emitter(d.text) t
        """
    )
    return rows.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.min("pos").alias("min_pos"),
    )


QUERIES = {
    "q_udf_pandas_scalar": q_udf_pandas_scalar,
    "q_udaf_applyinpandas": q_udaf_applyinpandas,
    "q_udf_cogroup": q_udf_cogroup,
    "q_udtf_tokens": q_udtf_tokens,
}

ORACLES = {
    "q_udtf_tokens": """
        WITH t AS (
          SELECT doc_id,
                 generate_subscripts(string_split(text, ' '), 1) AS pos,
                 unnest(string_split(text, ' ')) AS token
          FROM documents)
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(MIN(pos) AS INTEGER) AS min_pos
        FROM t GROUP BY 1""",
    # full twin of normalize_text: lowercase, strip ALL leading/trailing
    # whitespace classes, collapse internal runs — LOWER(TRIM(.)) alone
    # would diverge on any doubled space / tab / newline
    "q_udf_pandas_scalar": """
        WITH n AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(LOWER(text), '^\\s+|\\s+$', '', 'g'),
                   '\\s+', ' ', 'g') AS norm
          FROM documents)
        SELECT doc_id,
               CAST(LENGTH(norm) AS INTEGER) AS norm_len,
               sha256(norm) AS norm_hash
        FROM n""",
    "q_udaf_applyinpandas": """
        WITH gaps AS (
          SELECT user_id,
                 date_diff('microsecond',
                           LAG(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id), ts) AS gap
          FROM events)
        SELECT user_id,
               CAST(MEDIAN(gap) AS DOUBLE) AS median_gap_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM gaps GROUP BY user_id""",
    "q_udf_cogroup": """
        WITH p AS (
          SELECT user_id, value FROM events WHERE event_type = 'purchase'),
        v AS (
          SELECT user_id, MAX(value) AS max_view, COUNT(*) AS n_views
          FROM events WHERE event_type = 'view' GROUP BY 1),
        pa AS (
          SELECT user_id, COUNT(*) AS n_purchases FROM p GROUP BY 1),
        above AS (
          SELECT p.user_id, COUNT(*) AS n_above
          FROM p JOIN v ON p.user_id = v.user_id AND p.value > v.max_view
          GROUP BY 1)
        SELECT COALESCE(pa.user_id, v.user_id) AS user_id,
               CAST(COALESCE(pa.n_purchases, 0) AS BIGINT) AS n_purchases,
               CAST(COALESCE(v.n_views, 0) AS BIGINT) AS n_views,
               CAST(COALESCE(a.n_above, 0) AS BIGINT)
                 AS n_purch_above_max_view,
               v.max_view
        FROM pa
        FULL OUTER JOIN v ON pa.user_id = v.user_id
        LEFT JOIN above a ON COALESCE(pa.user_id, v.user_id) = a.user_id""",
}
