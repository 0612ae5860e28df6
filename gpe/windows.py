"""Window-function queries (SURVEY.md §2.5).

Determinism rules applied throughout (§5.3): ``row_number``/``ntile`` always
order by a UNIQUE key chain (value, then primary key); ``rank``/
``dense_rank``/``percent_rank`` are tie-deterministic by definition so they
order by the value alone to actually exercise tie semantics. Running sums use
exact decimal arithmetic so every prefix is engine-identical.

Scale notes (100 TB): a window partitioned by a key is one shuffle on that
key; frames evaluate streamingly within each partition (no materialization
of the whole partition for running frames). Skewed partition keys (one user
with millions of events) are the hazard — AQE cannot split a window
partition, so upstream salting/bucketing is the mitigation for pathological
keys; user_id/custkey here are near-uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpe.common import EPS, dec, persist_tracked, two_pass_parts, umicros
from gpe.io import load_table


def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank of orders per customer by totalprice."""
    o = load_table(spark, sf_dir, "orders")
    w_unique = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_ties = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
    )


def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (rank + filter). At scale this is the
    standard groupwise-top-k: one shuffle, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas: value change and µs since previous event.

    Raw double subtraction is IEEE-identical across engines — no rounding
    needed. Time delta kept in exact integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        (umicros("ts") - umicros(F.lag("ts").over(w))).alias(
            "micros_since_prev"
        ),
        F.lead("event_type").over(w).alias("next_type"),
    )


def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer over order dates — exact decimal
    prefix sums over a deterministic (date, orderkey) order."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(dec("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("cum_spend"),
    )


def q_win_moving_avg_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour trailing average of value per user — a time-RANGE frame.

    Spark range frames need a numeric ordering column, so we order by epoch
    microseconds with a [-3600e6, 0] frame — semantically identical to
    DuckDB's RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW on
    the µs-precision timestamp."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(umicros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(
            F.sum(dec("value")).over(w).cast("double")
            / F.count("value").over(w)
            + EPS,
            6,
        ).alias("avg_1h"),
    )


def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE frame: per customer, how many of their orders fall
    within $1000 below each order's price, and those orders' price sum.

    The ordering key is integer CENTS derived through the exact decimal
    cast (never a raw double→long truncation, which rounds differently in
    DuckDB), so the frame boundary [price-1000, price] is exact integer
    arithmetic in both engines and the frame's sum is an exact decimal —
    peers at equal price are all in-frame, so tie order can't matter."""
    o = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("bigint")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("cents"))
        .rangeBetween(-100_000, 0)
    )
    return (
        o.withColumn("cents", cents)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n_within_1k"),
            F.round(F.sum(dec("o_totalprice")).over(w), 2)
            .cast("double")
            .alias("sum_within_1k"),
        )
    )


def q_win_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a window: per customer, how many
    distinct order priorities appear up to each order (ordered by the
    unique o_orderkey, so the running set — hence its size — is a
    deterministic function of the frame regardless of tie order).

    Spark has no COUNT(DISTINCT) OVER; `size(collect_set() over w)` is the
    canonical rewrite. The per-row set is bounded by the dimension's
    cardinality (5 priorities), so state is O(1) per row — the rewrite is
    only safe for bounded-cardinality dimensions, which is exactly when a
    running distinct count is meaningful at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("long")
        .alias("n_prio_so_far"),
        F.size(F.collect_set("o_orderpriority").over(wall))
        .cast("long")
        .alias("n_prio_total"),
    )


def q_win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucket (unique-ordered) + percent_rank (tie-deterministic)
    of customers by account balance.

    TWO-PASS global ranking — a naive Window.orderBy() with no
    partitionBy (round 1) funnels every row through ONE task. Here:
    range-repartition by the sort key, rank locally per partition, then
    add per-partition offsets computed from a count table with one row
    per partition (whose own global window is bounded by the partition
    count, not the data). ntile(4) is reconstructed arithmetically from
    the global row number and total count (SQL-standard distribution:
    first n%4 buckets get one extra row); percent_rank's tie handling
    comes from min(global row number) over each acctbal group. Every
    stage is distributed; output is identical to the single-window form
    (oracle unchanged) and partition-count-invariant
    (tests/test_two_pass_invariance.py)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    part = c.repartitionByRange(
        two_pass_parts(spark), F.asc("c_acctbal"), F.asc("c_custkey")
    ).withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    # persist pass-1 (ranked partitions): it feeds the output rows AND the
    # two tiny count aggregates, and without it the range shuffle evaluates
    # three times (per-branch pruning defeats ReuseExchange). Materializing
    # stage 1 is the textbook two-pass formulation.
    loc = persist_tracked(part.withColumn("lrn", F.row_number().over(w_local)))
    cnts = loc.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    # global window over <=32 rows (one per partition) — bounded by the
    # partition count, never by the data
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = cnts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    )
    tot = cnts.agg(F.sum("cnt").alias("n_total"))
    g = (
        loc.join(F.broadcast(offs.select("pid", "off")), "pid")
        .withColumn("grn", F.col("off") + F.col("lrn"))
        .crossJoin(F.broadcast(tot))
    )
    g = g.withColumn(
        "rank_ties", F.min("grn").over(Window.partitionBy("c_acctbal"))
    )
    # integer DIV throughout — double division would lose exactness once
    # counts exceed 2^53 row numbers
    g = (
        g.withColumn("base", F.expr("n_total DIV 4"))
        .withColumn("rem", F.expr("n_total % 4"))
        .withColumn("big_span", F.expr("rem * (base + 1)"))
    )
    n = F.col("n_total")
    # degenerate-input note (ADVICE r2): when n_total < 4, base = 0 but
    # big_span = rem·(base+1) = n_total, so EVERY row takes the first
    # branch ((grn-1) DIV 1 + 1 = grn — exactly NTILE's one-row-per-bucket
    # answer) and the DIV-by-zero branch is unreachable (CaseWhen is lazy)
    quartile = F.when(
        F.col("grn") <= F.col("big_span"),
        F.expr("(grn - 1) DIV (base + 1) + 1"),
    ).otherwise(F.expr("rem + (grn - big_span - 1) DIV base + 1"))
    # n_total == 1 would make pct_rank 0/0 = NaN; SQL PERCENT_RANK defines
    # a single-row partition as 0.0 — special-case to match both oracles
    pct = F.when(n == 1, F.lit(0.0)).otherwise(
        F.round((F.col("rank_ties") - 1).cast("double") / (n - 1) + EPS, 6)
    )
    return g.select(
        "c_custkey",
        "c_acctbal",
        quartile.cast("int").alias("quartile"),
        pct.alias("pct_rank"),
    )


def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First and last event_type per user by time (frame to partition end
    for last_value, per SQL semantics)."""
    ev = load_table(spark, sf_dir, "events")
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w_full).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    ).distinct()


def q_win_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value coverage: suppliers ranked by acctbal within
    nation, with the 2nd-highest balance carried per nation."""
    s = load_table(spark, sf_dir, "supplier")
    w_ties = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    w_full = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.round(F.cume_dist().over(w_ties) + EPS, 6).alias("cume"),
        F.nth_value("s_acctbal", 2).over(w_full).alias("second_best"),
    )


def q_win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive purchase
    DAYS (ties broken by earliest start) — the canonical streak/retention
    pattern every product-analytics warehouse runs.

    The island key is the classic constant-offset trick: over each user's
    distinct purchase dates in order, `date - row_number() days` is
    constant exactly within a consecutive run — so islands fall out of one
    groupBy, no self-join, no iteration. Cost: one shuffle on user_id
    (distinct + the ranking window share it), then a per-user argmax —
    the same plan at any scale."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("dt"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("dt")
    isl = e.withColumn(
        "grp", F.date_sub(F.col("dt"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("dt").alias("streak_start"),
        F.max("dt").alias("streak_end"),
    )
    w_top = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    # date outputs ship as TIMESTAMP_NTZ per the repo-wide dtype convention
    # (gpe/common.py ntz rationale; DuckDB DATE→TIMESTAMP matches)
    return (
        streaks.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "streak_days",
            F.col("streak_start").cast("timestamp_ntz").alias("streak_start"),
            F.col("streak_end").cast("timestamp_ntz").alias("streak_end"),
        )
    )


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the canonical analytics-API scoring
    query: per customer, Recency (days since last order, against the
    global max order date), Frequency (#orders), Monetary (total spend),
    each quintile-scored with NTILE(5) (score 1 = most recent / most
    frequent / highest spend), combined into a 3-digit segment code.

    Scale notes (100 TB): the per-customer aggregate is one map-side-
    partial shuffle; each of the three global quintiles runs through the
    DISTRIBUTED two-pass ntile (gpe.common.two_pass_ntile — range
    repartition + offset table), so no stage ever funnels all customers
    through one task. Three range shuffles of the per-customer frame
    (#customers rows, not #orders) is the honest cost of three
    independent global rankings. All orderings carry c_custkey as the
    total-order tiebreak, so every score is deterministic. The recency
    anchor (global max date) is a 1-row broadcast."""
    from gpe.common import two_pass_ntile

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    anchor = o.agg(F.max("o_orderdate").alias("_anchor"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("f_orders"),
            F.round(F.sum(dec("o_totalprice")), 2)
            .cast("double")
            .alias("m_spend"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("_anchor", "_last").cast("long").alias("r_days"),
            "f_orders",
            "m_spend",
        )
    )
    scored = two_pass_ntile(
        spark, base, 5, [F.asc("r_days"), F.asc("o_custkey")], "r_score"
    )
    scored = two_pass_ntile(
        spark, scored, 5, [F.desc("f_orders"), F.asc("o_custkey")], "f_score"
    )
    scored = two_pass_ntile(
        spark, scored, 5, [F.desc("m_spend"), F.asc("o_custkey")], "m_score"
    )
    return scored.select(
        "o_custkey",
        "r_days",
        "f_orders",
        "m_spend",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).alias("rfm_segment"),
    )


def q_win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact moving MEDIAN of daily revenue over a 7-row trailing frame,
    per order priority. Spark has no exact-median window aggregate
    (percentile_approx is approximate and unordered-merge-dependent), so
    the frame is materialized as a sorted array — collect_list over ROWS
    BETWEEN 6 PRECEDING AND CURRENT ROW, array_sort, middle element(s).

    The oracle deliberately mirrors the SAME list/element arithmetic
    (list() OVER w → list_sort → 1-based middle picks → (lo+hi)/2)
    instead of DuckDB's median()/quantile_cont, whose lo+(hi−lo)·0.5
    interpolation is a DIFFERENT IEEE expression from (lo+hi)/2 and can
    diverge in the last ulp.

    Scale notes (100 TB): the frame array is bounded by the FRAME (7
    rows), not the data — collect_list over a bounded rows-frame is O(7)
    state per row. The window itself runs over the post-agg daily frame
    (#priorities × #days rows, one map-side-partial shuffle upstream),
    so no stage scales with raw fact rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.col("o_orderdate").alias("day")
    ).agg(
        F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias("day_rev")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("day").rowsBetween(-6, 0)
    acc = daily.select(
        "o_orderpriority",
        "day",
        "day_rev",
        F.array_sort(F.collect_list("day_rev").over(w)).alias("_arr"),
    )
    lo = F.expr("element_at(_arr, CAST((size(_arr) + 1) div 2 AS INT))")
    hi = F.expr("element_at(_arr, CAST(size(_arr) div 2 + 1 AS INT))")
    return acc.select(
        "o_orderpriority",
        "day",
        "day_rev",
        F.size("_arr").alias("n_window"),
        F.round((lo + hi) / 2.0 + EPS, 4).alias("moving_median"),
    )


def q_win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drawdown tracking over the monthly revenue series: each month's
    gap below the running peak (runmax − current, 0 at new highs), plus
    the worst drawdown per year — the risk statistic every
    price/metric-series API serves alongside VWAP.

    Scale notes (100 TB): one map-side-partial month aggregate; the
    running max and the yearly regroup run over the POST-AGG months
    frame (q_ts_vwap argument). Everything stays exact DECIMAL — the
    running max of exact decimals and the subtraction are
    engine-identical, so only the final 2-decimal doubles cross the
    hash."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month")
    ).agg(F.sum(dec("o_totalprice")).alias("_rev"))
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dd = F.max("_rev").over(w) - F.col("_rev")
    t = m.select(
        "month",
        F.year("month").alias("year"),
        F.col("_rev"),
        dd.alias("_dd"),
    )
    return t.groupBy("year").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.round(F.max("_dd"), 2).cast("double").alias("max_drawdown"),
        (
            F.floor(F.sum("_rev").cast("double") * F.lit(100) / F.count(F.lit(1)))
            / F.lit(100.0)
        ).alias("avg_revenue"),
    )


QUERIES = {
    "q_win_rank": q_win_rank,
    "q_win_moving_median": q_win_moving_median,
    "q_win_drawdown": q_win_drawdown,
    "q_customer_rfm": q_customer_rfm,
    "q_win_cume_nth": q_win_cume_nth,
    "q_win_distinct_count": q_win_distinct_count,
    "q_win_range_frame": q_win_range_frame,
    "q_win_topk_per_group": q_win_topk_per_group,
    "q_win_lag_lead": q_win_lag_lead,
    "q_win_running_sum": q_win_running_sum,
    "q_win_moving_avg_time": q_win_moving_avg_time,
    "q_win_ntile_pctrank": q_win_ntile_pctrank,
    "q_win_first_last": q_win_first_last,
    "q_win_streaks": q_win_streaks,
}

ORACLES = {
    "q_win_drawdown": f"""
        WITH m AS (
          SELECT date_trunc('month', o_orderdate) AS month,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
          FROM orders GROUP BY 1),
        t AS (
          SELECT month, EXTRACT(year FROM month) AS year, rev,
                 MAX(rev) OVER (ORDER BY month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - rev
                   AS dd
          FROM m)
        SELECT CAST(year AS INT) AS year,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(ROUND(MAX(dd), 2) AS DOUBLE) AS max_drawdown,
               FLOOR(CAST(SUM(rev) AS DOUBLE) * 100 / COUNT(*)) / 100.0
                 AS avg_revenue
        FROM t GROUP BY year""",
    "q_win_moving_median": f"""
        WITH daily AS (
          SELECT o_orderpriority, o_orderdate AS day,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                      AS DOUBLE) AS day_rev
          FROM orders GROUP BY 1, 2),
        acc AS (
          SELECT o_orderpriority, day, day_rev,
                 list_sort(list(day_rev) OVER (
                   PARTITION BY o_orderpriority ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
          FROM daily)
        SELECT o_orderpriority, day, day_rev,
               CAST(len(arr) AS INT) AS n_window,
               ROUND((arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1])
                     / 2.0 + {EPS}, 4) AS moving_median
        FROM acc""",
    "q_customer_rfm": """
        WITH base AS (
          SELECT o_custkey,
                 date_diff('day', MAX(o_orderdate),
                           (SELECT MAX(o_orderdate) FROM orders)) AS r_days,
                 COUNT(*) AS f_orders,
                 CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                      AS DOUBLE) AS m_spend
          FROM orders GROUP BY 1),
        scored AS (
          SELECT o_custkey, r_days, f_orders, m_spend,
                 CAST(NTILE(5) OVER (ORDER BY r_days, o_custkey)
                      AS INTEGER) AS r_score,
                 CAST(NTILE(5) OVER (ORDER BY f_orders DESC, o_custkey)
                      AS INTEGER) AS f_score,
                 CAST(NTILE(5) OVER (ORDER BY m_spend DESC, o_custkey)
                      AS INTEGER) AS m_score
          FROM base)
        SELECT o_custkey, r_days, f_orders, m_spend,
               r_score, f_score, m_score,
               r_score * 100 + f_score * 10 + m_score AS rfm_segment
        FROM scored""",
    "q_win_streaks": """
        WITH days AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt
          FROM events WHERE event_type = 'purchase'),
        isl AS (
          SELECT user_id, dt,
                 dt - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                              ORDER BY dt) AS INTEGER) AS grp
          FROM days),
        streaks AS (
          SELECT user_id, grp,
                 CAST(COUNT(*) AS BIGINT) AS streak_days,
                 MIN(dt) AS streak_start,
                 MAX(dt) AS streak_end
          FROM isl GROUP BY user_id, grp)
        SELECT user_id, streak_days,
               CAST(streak_start AS TIMESTAMP) AS streak_start,
               CAST(streak_end AS TIMESTAMP) AS streak_end
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY streak_days DESC, streak_start ASC) AS rn
          FROM streaks)
        WHERE rn = 1""",
    "q_win_distinct_count": """
        SELECT o_custkey, o_orderkey,
               COUNT(DISTINCT o_orderpriority) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS n_prio_so_far,
               COUNT(DISTINCT o_orderpriority) OVER (
                 PARTITION BY o_custkey) AS n_prio_total
        FROM orders""",
    "q_win_range_frame": """
        WITH o AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders)
        SELECT o_custkey, o_orderkey, o_totalprice,
               COUNT(*) OVER w AS n_within_1k,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w, 2)
                    AS DOUBLE) AS sum_within_1k
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY cents
                     RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)""",
    "q_win_cume_nth": f"""
        SELECT s_suppkey, s_nationkey, s_acctbal,
               ROUND(CUME_DIST() OVER (PARTITION BY s_nationkey
                     ORDER BY s_acctbal DESC) + {EPS}, 6) AS cume,
               NTH_VALUE(s_acctbal, 2) OVER (PARTITION BY s_nationkey
                     ORDER BY s_acctbal DESC, s_suppkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS second_best
        FROM supplier""",
    "q_win_rank": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey)
                    AS INTEGER) AS rn,
               CAST(RANK() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice DESC) AS INTEGER)
                 AS drnk
        FROM orders""",
    "q_win_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey)
                      AS INTEGER) AS rn
          FROM orders)
        WHERE rn <= 3""",
    "q_win_lag_lead": """
        SELECT user_id, event_id, ts,
               value - LAG(value) OVER w AS value_delta,
               date_diff('microsecond', LAG(ts) OVER w, ts) AS micros_since_prev,
               LEAD(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q_win_running_sum": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                          OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                          2) AS DOUBLE) AS cum_spend
        FROM orders""",
    "q_win_moving_avg_time": f"""
        SELECT user_id, event_id, ts,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                     / COUNT(value) OVER w + {EPS}, 6) AS avg_1h
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)""",
    "q_win_ntile_pctrank": f"""
        SELECT c_custkey, c_acctbal,
               CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER)
                 AS quartile,
               ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal) + {EPS}, 6)
                 AS pct_rank
        FROM customer""",
    "q_win_first_last": """
        SELECT DISTINCT user_id,
               FIRST_VALUE(event_type) OVER w AS first_type,
               LAST_VALUE(event_type) OVER w AS last_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
}
