"""Relational operators: projection, filter, join, aggregation, set ops,
scalar-function families (SURVEY.md §2.2, §2.3, §2.4, §2.6, §2.7).

Every query is a pure builder ``(spark, sf_dir) -> DataFrame`` returning a
lazy plan; the driver materializes. Float outputs follow the §5.3
hash-stability rules via gpe.common (exact-decimal sums, deterministic avgs).

Scale notes (100 TB): all queries here compile to stock Catalyst plans —
scan → filter (pushed to parquet) → partial/final hash aggregate → exchange.
Dimension joins take explicit broadcast hints; fact-fact joins rely on
sort-merge + AQE (skew split, partition coalescing). No Python UDFs anywhere
on this path: everything is JVM whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpe.common import davg, dec, dsum, sql_davg, sql_dec, sql_dsum
from gpe.io import load_table

# ---------------------------------------------------------------------------
# §2.4 q_agg_groupby — TPC-H Q1 pricing summary (also the entry() flagship)
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "2001-08-02 00:00:00"


def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary report over lineitem.

    Plan shape: parquet scan with pushed l_shipdate filter → partial
    HashAggregate (map-side combine) → single shuffle on the 6-value group
    key → final HashAggregate → sort. At 100 TB the 6-row result makes the
    shuffle negligible; the scan dominates and prunes to 7 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # All-decimal arithmetic: raw columns are exact 2-decimal values, so the
    # casts are tie-free and the products/sums are exact → engine-identical.
    disc_price = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    charge = disc_price * dec(1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity', 'sum_qty')},
  {sql_dsum('l_extendedprice', 'sum_base_price')},
  {sql_dsum(f"{sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}",
            'sum_disc_price', raw=False)},
  {sql_dsum(f"{sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}"
            f" * {sql_dec('1 + l_tax')}", 'sum_charge', raw=False)},
  {sql_davg('l_quantity', 'avg_qty')},
  {sql_davg('l_extendedprice', 'avg_price')},
  {sql_davg('l_discount', 'avg_disc')},
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


QUERIES = {
    "q_agg_groupby": q_agg_groupby,
}

ORACLES = {
    "q_agg_groupby": _Q1_ORACLE,
}
