"""Semantic invariants of the CDC/table-maintenance family (gpe/cdc.py)
beyond oracle parity: merge partition algebra, compaction state bounds,
SCD2 interval chaining."""

from __future__ import annotations

import pyspark.sql.functions as F

import __spark_entry__ as spec
from gpe.io import load_table

SF = "/root/testdata/sf0.01"
_Q = spec.queries()


def test_merge_partitions_the_key_space(spark):
    """kept/updated/inserted partition the post-merge snapshot: every base
    key appears exactly once as kept or updated, every insert key exactly
    once as inserted, and the action counts follow the change-batch
    derivation arithmetic."""
    out = _Q["q_merge_upsert"](spark, SF)
    o = load_table(spark, SF, "orders")
    n_base = o.count()
    n_upd = o.filter(F.col("o_orderkey") % 10 == 0).count()
    n_ins = o.filter(F.col("o_orderkey") % 17 == 3).count()
    counts = {
        r["merge_action"]: r["n"]
        for r in out.groupBy("merge_action").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {
        "kept": n_base - n_upd,
        "updated": n_upd,
        "inserted": n_ins,
    }
    # the merge key stays unique across the snapshot
    assert out.count() == out.select("o_orderkey").distinct().count()


def test_cdc_compact_state_is_bounded_by_keys(spark):
    """Compaction emits exactly one row per observed (user_id, event_type)
    key, and each emitted ts is that key's maximum."""
    out = _Q["q_cdc_compact"](spark, SF)
    e = load_table(spark, SF, "events")
    n_keys = e.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys
    maxed = (
        out.alias("o")
        .join(
            e.groupBy("user_id", "event_type").agg(F.max("ts").alias("mts")),
            ["user_id", "event_type"],
        )
        .filter(F.col("ts") != F.col("mts"))
    )
    assert maxed.count() == 0


def test_scd2_intervals_chain_without_gaps(spark):
    """Per user: exactly one open (is_current) interval, and every closed
    interval's valid_to equals the next interval's valid_from (half-open
    chaining, no gaps or overlaps)."""
    out = _Q["q_scd2_intervals"](spark, SF)
    opens = out.filter("is_current").groupBy("user_id").count()
    assert opens.filter("count != 1").count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from", "version_event_id")
    chained = out.withColumn("nxt_from", F.lead("valid_from").over(w)).filter(
        F.col("valid_to").isNotNull()
    )
    assert chained.filter(F.col("valid_to") != F.col("nxt_from")).count() == 0


def test_scd2_pointintime_shadows_zero_length_versions(spark, tmp_path):
    """Two purchases in the SAME microsecond create a zero-length SCD2
    version; the docstring claims the carry order shadows it exactly as
    the oracle's from <= ts < to predicate would — craft the collision
    (the fixture's unique timestamps never produce one) and compare the
    operator against the DuckDB oracle on the same file."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as spec
    from gpe.cdc import q_join_scd2_pointintime

    t0 = pd.Timestamp("2024-01-01 10:00:00")
    rows = [
        # (event_id, ts, type)
        (1, t0, "purchase"),                      # zero-length version
        (2, t0, "purchase"),                      # shadows version 1
        (3, t0, "view"),                          # same-µs fact row
        (4, t0 + pd.Timedelta(minutes=30), "view"),
        (5, t0 - pd.Timedelta(hours=1), "view"),  # before any version
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
            "user_id": 1,
            "event_type": [r[2] for r in rows],
            "value": [float(r[0]) for r in rows],
            "props": '{"k": 1}',
        }
    )
    d = tmp_path / "scd2_zero"
    d.mkdir()
    pdf.to_parquet(str(d / "events.parquet"))

    got = sorted(
        (r.event_id, r.version_event_id, r.attr_value)
        for r in q_join_scd2_pointintime(spark, str(d)).collect()
    )
    # both views at/after t0 see version 2 (the shadowing row); the
    # pre-version view drops (inner semantics)
    assert got == [(3, 2, 2.0), (4, 2, 2.0)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    want = sorted(
        (r[0], r[4], r[5])
        for r in con.execute(
            spec.oracle_sql()["q_join_scd2_pointintime"]
        ).fetchall()
    )
    assert got == want
