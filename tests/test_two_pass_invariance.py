"""The two-pass global-rank / running-total pattern (VERDICT r2 #4) claims
its output is partition-count-invariant: the per-partition offset table
reconstructs the same global row numbers / running totals for ANY range
partition count. Prove it by running each two-pass builder at 8 and 64
partitions and comparing full result multisets."""

from __future__ import annotations

from tests.conftest import SF_SMOKE, SF_T2


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run_at(monkeypatch, module, builder, spark, sf_dir, parts: int):
    monkeypatch.setattr(module, "two_pass_parts", lambda s, _p=parts: _p)
    return _rows(builder(spark, sf_dir))


def test_ntile_pctrank_partition_count_invariant(spark, monkeypatch):
    import gpe.windows as W

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, W, W.q_win_ntile_pctrank, spark, sf, 8)
        b = _run_at(monkeypatch, W, W.q_win_ntile_pctrank, spark, sf, 64)
        assert a == b


def test_pack_sequences_partition_count_invariant(spark, monkeypatch):
    import gpe.packing as P

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, P, P.q_pack_sequences, spark, sf, 8)
        b = _run_at(monkeypatch, P, P.q_pack_sequences, spark, sf, 64)
        assert a == b


def test_approx_quantile_partition_count_invariant(spark, monkeypatch):
    # q_agg_approx_quantile imports two_pass_parts function-locally from
    # gpe.common, so the patch targets the source module
    import gpe.common as C
    import gpe.relational as R

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, C, R.q_agg_approx_quantile, spark, sf, 8)
        b = _run_at(monkeypatch, C, R.q_agg_approx_quantile, spark, sf, 64)
        assert a == b


def test_customer_rfm_partition_count_invariant(spark, monkeypatch):
    # q_customer_rfm's quintiles run through gpe.common.two_pass_ntile,
    # which reads two_pass_parts from its defining module
    import gpe.common as C
    import gpe.windows as W

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, C, W.q_customer_rfm, spark, sf, 8)
        b = _run_at(monkeypatch, C, W.q_customer_rfm, spark, sf, 64)
        assert a == b


def test_two_pass_ntile_degenerate_and_distribution(spark):
    """two_pass_ntile edge semantics: with n < k every row gets its own
    bucket (1..n, the SQL-standard answer — the DIV-by-zero branch is
    unreachable); with n = 7, k = 5 the first two buckets take the extra
    rows (sizes 2,2,1,1,1)."""
    from pyspark.sql import functions as F

    from gpe.common import two_pass_ntile

    small = spark.range(3).select(F.col("id").alias("v"))
    got = {
        (r.v, r.b)
        for r in two_pass_ntile(spark, small, 5, ["v"], "b").collect()
    }
    assert got == {(0, 1), (1, 2), (2, 3)}

    seven = spark.range(7).select(F.col("id").alias("v"))
    buckets = [
        r.b
        for r in two_pass_ntile(spark, seven, 5, ["v"], "b")
        .orderBy("v")
        .collect()
    ]
    assert buckets == [1, 1, 2, 2, 3, 4, 5]


def test_two_pass_parts_tracks_parallelism(spark):
    from gpe.common import two_pass_parts

    assert two_pass_parts(spark) == max(
        2, spark.sparkContext.defaultParallelism
    )


def test_weighted_median_partition_count_invariant(spark, monkeypatch):
    # q_agg_weighted_median imports two_pass_parts function-locally from
    # gpe.common; the crossing-partition pruning must reconstruct the same
    # median for ANY partition count
    import gpe.common as C
    import gpe.relational as R

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, C, R.q_agg_weighted_median, spark, sf, 8)
        b = _run_at(monkeypatch, C, R.q_agg_weighted_median, spark, sf, 64)
        assert a == b


def test_gini_partition_count_invariant(spark, monkeypatch):
    import gpe.common as C
    import gpe.relational as R

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, C, R.q_agg_gini, spark, sf, 8)
        b = _run_at(monkeypatch, C, R.q_agg_gini, spark, sf, 64)
        assert a == b


def test_vocab_coverage_partition_count_invariant(spark, monkeypatch):
    # q_text_vocab_coverage runs rank + cumulative share through the
    # N-column two_pass_running_sums (r7) — both prefix columns must
    # reconstruct identically for ANY range partition count
    import gpe.common as C
    import gpe.text as T

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, C, T.q_text_vocab_coverage, spark, sf, 8)
        b = _run_at(monkeypatch, C, T.q_text_vocab_coverage, spark, sf, 64)
        assert a == b


def test_running_sums_plural_matches_singular(spark):
    # the N-column variant with one pair must equal the original helper
    from pyspark.sql import functions as F

    from gpe.common import two_pass_running_sum, two_pass_running_sums

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    a = sorted(
        tuple(r)
        for r in two_pass_running_sum(spark, df, ["id"], "v", "cum")
        .select("id", "v", "cum")
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in two_pass_running_sums(spark, df, ["id"], [("v", "cum")])
        .select("id", "v", "cum")
        .collect()
    )
    assert a == b
    # and the prefix really is the running total
    run = 0
    for _id, v, cum in a:
        run += v
        assert cum == run

def test_prior_min_matches_single_partition_window(spark):
    """two_pass_prior_min must equal the naive unpartitioned strict-prior
    window (the r11 skyline rewrite's correctness anchor), including the
    NULL on the global first row and at duplicate values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpe.common import two_pass_prior_min

    df = spark.range(500).select(
        F.col("id"), ((F.col("id") * 37) % 101).alias("v")
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = sorted(
        tuple(r)
        for r in df.withColumn("m", F.min("v").over(w))
        .select("id", "v", "m")
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in two_pass_prior_min(spark, df, ["id"], "v", "m")
        .select("id", "v", "m")
        .collect()
    )
    assert got == want
    assert got[0][2] is None  # strict-prior: first row has no prior


def test_skyline_partition_count_invariant(spark, monkeypatch):
    # q_agg_skyline's strict-prior sweep runs through
    # gpe.common.two_pass_prior_min (r11); the offset-table reconstruction
    # must return the same Pareto front for ANY range partition count
    import gpe.common as C
    import gpe.relational as R

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, C, R.q_agg_skyline, spark, sf, 8)
        b = _run_at(monkeypatch, C, R.q_agg_skyline, spark, sf, 64)
        assert a == b


def test_ml_calibration_partition_count_invariant(spark, monkeypatch):
    # r11: the calibration NTILE runs through gpe.common.two_pass_ntile
    import gpe.common as C
    import gpe.ml as M

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, C, M.q_ml_calibration, spark, sf, 8)
        b = _run_at(monkeypatch, C, M.q_ml_calibration, spark, sf, 64)
        assert a == b


def test_ml_ks_partition_count_invariant(spark, monkeypatch):
    # r11: both KS cumulative sums run through two_pass_running_sums
    import gpe.common as C
    import gpe.ml as M

    for sf in (SF_SMOKE, SF_T2):
        a = _run_at(monkeypatch, C, M.q_ml_ks, spark, sf, 8)
        b = _run_at(monkeypatch, C, M.q_ml_ks, spark, sf, 64)
        assert a == b
