"""Shared builder helpers — cross-engine hash-stability primitives.

The driver compares every declared query against a DuckDB oracle with an
order-insensitive VALUE-HASH (SURVEY.md §5.1), so float outputs must be
bit-identical across engines. Three hazards and their fixes:

1. ``SUM(double)`` is summation-order-dependent (Spark partial-aggregates
   per partition, DuckDB per thread). Fix: sum in exact DECIMAL — decimal
   addition is associative, so the result is independent of partitioning.

2. Casting a COMPUTED double (e.g. ``price * (1-disc)``) to decimal differs
   between engines at rounding ties: Spark goes through Java's
   ``BigDecimal.valueOf`` (shortest decimal repr, HALF_UP) while DuckDB
   rounds the exact binary value. Products of short-decimal inputs land on
   exact ties constantly (measured: 0.01 drift on TPC-H Q1 at sf0.01).
   Fix: cast only RAW columns to decimal — every measure column in the
   testdata is an exact 2-decimal value (verified for all 10 tables), so
   the scale-2 cast has no ties — then keep ALL arithmetic in decimal.

3. ``ROUND(double, n)`` at an exact decimal tie differs the same way.
   Fix for ratios/averages: add a 1e-9 epsilon before rounding — both
   engines compute the same IEEE double, the nudge clears any short-rational
   tie (the dangerous set) by far more than double-repr ambiguity (~1e-12
   for values < 1e5), and biases ties deterministically up in BOTH engines.

Decimal width discipline: raw casts use DECIMAL(12,2); one product gives
(25,4), a second factor gives (38,6) — exactly at Spark's 38-digit cap with
zero precision loss. Never chain a third decimal multiplication.

At 100 TB this costs nothing: decimal(12,2) sums use Spark's unscaled-Long
fast path inside whole-stage codegen, with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"
EPS = 1e-9


# Session-scoped persist bookkeeping (ADVICE r3 #4): builders that cache a
# hot subtree register it here instead of calling .persist() bare, so
# long-lived sessions (the 122-query driver bench, a notebook) can release
# executor memory between queries rather than leaking one cache entry per
# builder invocation. Builders stay lazy — registration does not trigger a
# job — and callers that never release simply keep today's behavior.
# SINGLE-THREADED-SESSION ASSUMPTION (ADVICE r4): the list is process-global
# with no lock; a threaded driver interleaving builder calls with
# release_persists() could unpersist a frame another in-flight query still
# reads (Spark recomputes it — correct, just slower). Every driver shape in
# this contract (bench.py, tools/parity.py, the round driver) is
# single-threaded; guard with a lock before adding a concurrent driver.
_TRACKED_PERSISTS: list = []


def scratch_path(*parts: str) -> str:
    """Session-unique scratch directory for write-path builders.

    ADVICE r7: fixed shared /tmp/gpe_lake paths keyed only by sf name race
    when two concurrent sessions run the same key (one overwrites the
    layout while the other's lazy readback scans it). The PID component
    gives each driver/pytest/bench process its own namespace — mirroring
    the per-sf uniqueness the bucketed table names already use — while
    staying stable WITHIN a session so re-invocations overwrite cleanly.
    """
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), f"gpe_lake_{os.getpid()}", *parts
    )


def persist_tracked(df):
    """persist() + register for later release_persists()."""
    df.persist()
    _TRACKED_PERSISTS.append(df)
    return df


def release_persists() -> None:
    """Unpersist every builder-cached frame registered since the last call
    (blocking=False: eviction proceeds async, callers never wait)."""
    while _TRACKED_PERSISTS:
        df = _TRACKED_PERSISTS.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def two_pass_parts(spark) -> int:
    """Partition count for the two-pass global-rank / running-total pattern
    (range repartition → local window → per-partition offset table).

    Derived from the session's parallelism instead of a hardcoded 32
    (VERDICT r2 #4): at 100× scale a fixed fan-in leaves the offset table
    fine but the data partitions coarse. The two-pass formulas are
    partition-count-invariant (proven by tests/test_two_pass_invariance.py
    running 8 and 64), so this only moves work, never results."""
    return max(2, spark.sparkContext.defaultParallelism)


def two_pass_ntile(spark, df, k: int, order_cols, out_col: str):
    """Distributed ``NTILE(k) OVER (ORDER BY order_cols)`` — the two-pass
    global-rank pattern (range repartition → local row_number → per-
    partition offset table) followed by the SQL-standard bucket formula
    (first n%k buckets take one extra row). A naive unpartitioned Window
    funnels every row through ONE task; here every stage is distributed
    and the offset table is bounded by the partition count, never the
    data. ``order_cols`` must be a TOTAL order (include a unique key) or
    the bucket assignment is nondeterministic. Results are
    partition-count-invariant (same argument as q_win_ntile_pctrank,
    tests/test_two_pass_invariance.py).

    Internal columns are underscore-prefixed and dropped; the input
    schema plus ``out_col`` (int) comes back."""
    from pyspark.sql import Window

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    part = df.repartitionByRange(two_pass_parts(spark), *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*cols)
    # persist pass-1: feeds the output rows AND the count aggregate (the
    # range shuffle would otherwise evaluate per consumer)
    loc = persist_tracked(part.withColumn("_lrn", F.row_number().over(w_local)))
    cnts = loc.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = cnts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    )
    tot = cnts.agg(F.sum("_cnt").alias("_n_total"))
    g = (
        loc.join(F.broadcast(offs.select("_pid", "_off")), "_pid")
        .withColumn("_grn", F.col("_off") + F.col("_lrn"))
        .crossJoin(F.broadcast(tot))
        .withColumn("_base", F.expr(f"_n_total DIV {k}"))
        .withColumn("_rem", F.expr(f"_n_total % {k}"))
        .withColumn("_big", F.expr("_rem * (_base + 1)"))
    )
    # integer DIV throughout; when n < k, _big = n so the DIV-by-zero
    # branch below is unreachable (CaseWhen is lazy)
    bucket = F.when(
        F.col("_grn") <= F.col("_big"),
        F.expr("(_grn - 1) DIV (_base + 1) + 1"),
    ).otherwise(F.expr("_rem + (_grn - _big - 1) DIV _base + 1"))
    return g.withColumn(out_col, bucket.cast("int")).drop(
        "_pid", "_lrn", "_off", "_grn", "_n_total", "_base", "_rem", "_big"
    )


def two_pass_running_sum(spark, df, order_cols, value_col: str, out_col: str):
    """Distributed GLOBAL running sum of ``value_col`` ordered by
    ``order_cols`` — the two-pass range-partition pattern (range
    repartition → local cumulative sum → broadcast per-partition offset
    table), the same machinery as two_pass_ntile but for prefix sums.
    A naive ``Window.orderBy(...)`` funnels every row through ONE task;
    here the only global structure is the partition-count-sized offset
    table. ``order_cols`` must be a TOTAL order (include a unique key)
    or prefix values at ties are nondeterministic. Partition-count-
    invariant by the usual offset-table argument.

    Internal columns are underscore-prefixed and dropped; the input
    schema plus ``out_col`` comes back."""
    return two_pass_running_sums(spark, df, order_cols, [(value_col, out_col)])


def two_pass_running_sums(spark, df, order_cols, value_out_pairs):
    """N-column variant of two_pass_running_sum: one range repartition +
    one local window pass computes a global prefix sum for EVERY
    (value_col, out_col) pair — callers needing both a running total and
    a running count (e.g. rank + cumulative share) pay one shuffle, not
    two."""
    from pyspark.sql import Window

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    part = df.repartitionByRange(two_pass_parts(spark), *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    loc = part
    for i, (value_col, _) in enumerate(value_out_pairs):
        loc = loc.withColumn(f"_lsum{i}", F.sum(value_col).over(w_local))
    loc = persist_tracked(loc)
    cnts = loc.groupBy("_pid").agg(
        *[
            F.sum(value_col).alias(f"_psum{i}")
            for i, (value_col, _) in enumerate(value_out_pairs)
        ]
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = cnts.select(
        "_pid",
        *[
            F.coalesce(F.sum(f"_psum{i}").over(w_off), F.lit(0)).alias(
                f"_off{i}"
            )
            for i in range(len(value_out_pairs))
        ],
    )
    out = loc.join(F.broadcast(offs), "_pid")
    drop = ["_pid"]
    for i, (_, out_col) in enumerate(value_out_pairs):
        out = out.withColumn(out_col, F.col(f"_off{i}") + F.col(f"_lsum{i}"))
        drop += [f"_lsum{i}", f"_off{i}"]
    return out.drop(*drop)


def two_pass_prior_min(spark, df, order_cols, value_col: str, out_col: str):
    """Distributed ``MIN(value) OVER (ORDER BY order_cols ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` — the STRICT-prior running min
    behind sorted-sweep skylines (q_agg_skyline), by the same two-pass
    range-partition recipe as two_pass_running_sums: range repartition →
    local prior-min window → broadcast per-partition-minimum offset
    table. ``out_col`` is NULL exactly on the global first row (the
    window-function convention: F.least skips NULLs, so it is NULL only
    when both the local prior-min and the prior-partition min are).
    ``order_cols`` must be a TOTAL order or prior-min values at ties are
    nondeterministic. Partition-count-invariant (min is associative;
    tests/test_two_pass_invariance.py runs 8 and 64)."""
    from pyspark.sql import Window

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    part = df.repartitionByRange(two_pass_parts(spark), *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # persist pass-1: feeds the output rows AND the per-partition minima
    loc = persist_tracked(
        part.withColumn("_lmin", F.min(value_col).over(w_local))
    )
    mins = loc.groupBy("_pid").agg(F.min(value_col).alias("_pmin"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = mins.select(
        "_pid", F.min("_pmin").over(w_off).alias("_omin")
    )
    out = loc.join(F.broadcast(offs), "_pid").withColumn(
        out_col, F.least("_omin", "_lmin")
    )
    return out.drop("_pid", "_lmin", "_omin")


def dec(col: Column | str) -> Column:
    """Exact decimal view of a raw 2-decimal-valued double column (or of a
    double expression whose true value has ≤2 decimals, e.g. ``1 - disc``)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum → round (decimal-space HALF_UP, both engines
    agree — verified) → double."""
    return F.round(F.sum(dec(col) if isinstance(col, str) else col), scale).cast(
        "double"
    ).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum → double, / count,
    epsilon-nudge, round."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(dec(c)).cast("double") / F.count(c) + EPS, scale).alias(
        alias
    )


def umicros(col: Column | str) -> Column:
    """Epoch microseconds of a (possibly NTZ) timestamp. All lake
    timestamps are naive wall-clock values and the session tz is pinned to
    UTC (gpe/io.py), so the ntz→ltz cast is the identity on the stored
    value and unix_micros is well-defined."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def ntz(col: Column) -> Column:
    """Derived-timestamp outputs are emitted as TIMESTAMP_NTZ to match both
    the at-rest parquet type and DuckDB's naive TIMESTAMP (arrow schema
    parity: no tz annotation)."""
    return col.cast("timestamp_ntz")


def fround(col: Column, alias: str, scale: int = 6) -> Column:
    """Epsilon-nudged double rounding for ratio-like outputs computed
    identically (IEEE) in both engines. Not for plain per-row 2-decimal
    passthroughs — those need no rounding at all."""
    return F.round(col + EPS, scale).alias(alias)


# --- DuckDB oracle twins ----------------------------------------------------


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def sql_dsum(expr: str, alias: str, scale: int = 2, raw: bool = True) -> str:
    """Oracle twin of dsum. ``raw=True`` wraps expr in the decimal cast;
    pass ``raw=False`` when expr is already a decimal product."""
    inner = sql_dec(expr) if raw else expr
    return f"CAST(ROUND(SUM({inner}), {scale}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(12,2))) AS DOUBLE)"
        f" / COUNT({expr}) + {EPS}, {scale}) AS {alias}"
    )


def sql_fround(expr: str, alias: str, scale: int = 6) -> str:
    return f"ROUND({expr} + {EPS}, {scale}) AS {alias}"
