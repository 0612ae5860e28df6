"""Lake catalog / metadata extraction (SURVEY.md §1.1 catalog row,
BASELINE.json:6 "Spark batch jobs for metadata extraction").

`scan_lake` walks a lake directory and emits a metadata DataFrame straight
from parquet footers + cheap aggregates — the Spark-native version of a
data-lake API's catalog endpoint. At 100 TB the schema/row-count/size facts
come from footers only (no data scan); per-column min/max piggyback on
parquet column statistics via Spark's metadata-only plans where possible.

One declared query (q_catalog_column_stats) pins column-level profiling
semantics with a SQL oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from gpe.io import TABLES, load_table


def scan_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog the lake directory: (table, path, format, n_cols, schema_ddl,
    n_rows, size_bytes). Row counts come from parquet metadata (count()
    compiles to a footer read, no data scan)."""
    rows = []
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        df = load_table(spark, sf_dir, name)
        rows.append(
            Row(
                table_name=name,
                path=path,
                format="parquet",
                n_cols=len(df.schema.fields),
                schema_ddl=df.schema.simpleString(),
                n_rows=df.count(),
                size_bytes=os.path.getsize(path),
            )
        )
    return spark.createDataFrame(rows)


def q_catalog_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of lineitem's measure columns: min/max/distinct
    — the catalog's per-column statistics endpoint, one scan for all rows
    (Spark fuses the unioned aggregates over a shared cached scan at small
    column counts; at lake scale you profile per column-chunk from footer
    stats instead)."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = [
        li.agg(
            F.lit(col).alias("column_name"),
            F.min(col).cast("double").alias("min_value"),
            F.max(col).cast("double").alias("max_value"),
            F.countDistinct(col).alias("n_distinct"),
            F.count(col).alias("n_rows"),
        )
        for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


QUERIES = {
    "q_catalog_column_stats": q_catalog_column_stats,
}

ORACLES = {
    "q_catalog_column_stats": " UNION ALL ".join(
        f"""SELECT '{col}' AS column_name,
               CAST(MIN({col}) AS DOUBLE) AS min_value,
               CAST(MAX({col}) AS DOUBLE) AS max_value,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(COUNT({col}) AS BIGINT) AS n_rows
            FROM lineitem"""
        for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    ),
}
