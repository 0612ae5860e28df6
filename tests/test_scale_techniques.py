"""Plan-level proof of the 100 TB techniques SCALE.md claims: bucketed
co-located joins (no exchange) and salted two-stage aggregation for skewed
keys (same result, bounded per-task fan-in)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gpe.io import load_table, salt_keys, write_bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    # managed tables land in ./spark-warehouse (warehouse.dir is a static
    # conf); DROP TABLE below removes the files
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(o, "o_b", "o_orderkey", 8)
    joined = spark.table("li_b").join(
        spark.table("o_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # disable broadcast so the bucket layout is what avoids the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert joined.count() == 6000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_salted_aggregation_matches_plain(spark):
    """Two-stage salted sum == direct sum (the skew-safe rewrite is
    result-transparent)."""
    ev = load_table(spark, SF, "events")
    plain = {
        r.event_type: r.s
        for r in ev.groupBy("event_type")
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("s"))
        .collect()
    }
    salted = salt_keys(ev, "event_type", n_salts=8)
    partial = salted.groupBy("event_type", "_salt").agg(
        F.sum(F.col("value").cast("decimal(12,2)")).alias("ps")
    )
    final = {
        r.event_type: r.s
        for r in partial.groupBy("event_type")
        .agg(F.sum("ps").alias("s"))
        .collect()
    }
    assert plain == final


def test_salt_is_deterministic(spark):
    ev = load_table(spark, SF, "events")
    a = salt_keys(ev, "event_type").select("event_id", "_salt").collect()
    b = salt_keys(ev, "event_type").select("event_id", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = {r._salt for r in a}
    assert n == set(range(8))  # all salt buckets populated
