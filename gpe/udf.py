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

    return (
        ev.select("user_id", F.col("ts"), "event_id")
        .groupBy("user_id")
        .applyInPandas(
            median_gap, "user_id long, median_gap_us double, n_events long"
        )
    )


QUERIES = {
    "q_udf_pandas_scalar": q_udf_pandas_scalar,
    "q_udaf_applyinpandas": q_udaf_applyinpandas,
}

ORACLES = {
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
}
