"""r14 input spread (gpe.io.load_table_spread): the opt-in fix for the
single-row-group fixture layout (guide §2.5 "input skew — one huge
unsplittable file"), under which every scan stage and all map-side work
behind it ran as ONE task.

Pins the three contract points of the optimization:
1. the spread actually raises the scan's partition count to the session
   parallelism for an above-floor single-row-group file;
2. the gate is layout-derived, not a constant — tiny files (broadcast
   dims) stay unspread, and at lake scale (row_groups >> parallelism)
   the gate is off entirely;
3. values are identical with and without the spread (partitioning
   independence — the property full oracle parity re-verifies registry-
   wide, and which it now exercises because the spread fires at the
   driver's correctness SFs too).
"""

from __future__ import annotations

import os

from gpe.io import _SPREAD_MIN_BYTES, load_table, load_table_spread

from tests.conftest import SF_SMOKE, SF_T2


def test_spread_raises_partition_count_for_documents(spark):
    par = spark.sparkContext.defaultParallelism
    plain = load_table(spark, SF_T2, "documents")
    spread = load_table_spread(spark, SF_T2, "documents")
    assert os.path.getsize(f"{SF_T2}/documents.parquet") >= _SPREAD_MIN_BYTES
    assert plain.rdd.getNumPartitions() * 2 < par  # single-row-group file
    assert spread.rdd.getNumPartitions() == par


def test_spread_gate_skips_tiny_dims(spark):
    # region/nation are below the floor: no exchange added
    for t in ("region", "nation"):
        assert os.path.getsize(f"{SF_SMOKE}/{t}.parquet") < _SPREAD_MIN_BYTES
        plain = load_table(spark, SF_SMOKE, t)
        spread = load_table_spread(spark, SF_SMOKE, t)
        assert (
            spread.rdd.getNumPartitions() == plain.rdd.getNumPartitions()
        ), t


def test_spread_values_identical(spark):
    plain = load_table(spark, SF_T2, "documents")
    spread = load_table_spread(spark, SF_T2, "documents")
    a = sorted((r.doc_id, r.text) for r in plain.collect())
    b = sorted((r.doc_id, r.text) for r in spread.collect())
    assert a == b


def test_spread_env_off_is_identity(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCAN_SPREAD", "off")
    plain = load_table(spark, SF_T2, "documents")
    spread = load_table_spread(spark, SF_T2, "documents")
    assert spread.rdd.getNumPartitions() == plain.rdd.getNumPartitions()


def test_spread_env_unknown_value_raises(spark, monkeypatch):
    # ADVICE r14 #4: a typo'd A/B env value must fail loudly, not silently
    # behave as "auto" and measure the wrong arm
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_SCAN_SPREAD", "on")
    with pytest.raises(ValueError, match="SPARK_GRAFT_SCAN_SPREAD"):
        load_table_spread(spark, SF_T2, "documents")
