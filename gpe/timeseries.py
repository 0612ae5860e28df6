"""Time-series / sessionization batch analytics on `events`
(SURVEY.md §2.8). Streaming analogs live in gpe/streaming.py.

Scale notes (100 TB): all of these group or window by (user_id) or by time
bucket — both near-uniform here. Tumbling/sliding buckets are pure map-side
expressions feeding one hash aggregate; sessionization is one shuffle on
user_id then a streaming window pass; the funnel is three semi-join-shaped
reductions that each collapse to ≤1 row per user before joining (never a
row-multiplying self-join on raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpe.common import EPS, dec, dsum, fround, ntz, sql_dsum, sql_fround, umicros
from gpe.io import load_table

_SESSION_GAP_US = 1_800_000_000  # 30 minutes


def q_ts_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per 1-hour tumbling bucket (epoch-aligned, ≡ date_trunc)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "sum_value")
    )


def q_ts_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 minutes (each event lands in 4)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "sum_value")
    )


def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions per user with a 30-min inactivity gap.

    Classic batch formula: lag → new-session flag → running sum = session
    ordinal → group. One shuffle on user_id; the window and the final group
    share that partitioning (no second exchange)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # > : a gap of EXACTLY the threshold stays in the SAME session — this
    # matches Structured Streaming's session_window, which merges an event
    # arriving at last_ts + gap into the open session (verified empirically
    # with a synthetic exactly-30-min-gap file; see session history note in
    # tests/test_streaming_equivalence.py)
    gap = umicros("ts") - umicros(F.lag("ts").over(w))
    flag = F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0)
    return (
        ev.withColumn("session_id", F.sum(flag).over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
        )
    )


def q_ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who did view → click → purchase in order, completing within
    24h of the first view. Conditional-min semantics: first view, first
    click AFTER that view, first purchase AFTER that click."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id", "v_ts")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id", "v_ts", "c_ts")
        .agg(F.min("ts").alias("p_ts"))
    )
    return p.filter(
        F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 24 HOURS")
    ).select("user_id", "v_ts", "c_ts", "p_ts")


def q_ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-cohort retention: distinct active users per (cohort day,
    day offset ≥ 0)."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(ntz(F.date_trunc("day", F.min("ts"))).alias("cohort_day"))
    )
    return (
        ev.join(cohort, "user_id")
        .withColumn(
            "day_offset", F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day"))
        )
        .filter(F.col("day_offset") >= 0)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


def q_ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event counts with zero-filled missing days over the span."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        ntz(F.date_trunc("day", F.min("ts"))).alias("d0"),
        ntz(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    counts = ev.groupBy(ntz(F.date_trunc("day", "ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return days.join(counts, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n_events")
    )


def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation onto a regular hourly grid, per user — the
    time-weighted complement to q_ts_gap_fill's zero-fill (hypertable
    `interpolate()`-style resampling).

    Observed value per (user, hour) = value of the last event in the hour
    ((ts, event_id)-max, deterministic). The grid spans each user's
    observed hours, so every missing bucket has both a previous and a next
    observation; its value is vp + (vn - vp)·(t - tp)/(tn - tp) on exact
    integer epoch-µs — one IEEE expression evaluated identically by both
    engines, ε-rounded on output per the §5.3 playbook.

    Shape: bucket-argmax (one shuffle), lead-pair consecutive observations
    (reuses the same user_id partitioning), then explode ONLY the missing
    buckets between each pair — the dense grid never materializes through
    a window, so cost scales with observations + emitted gap rows, not
    users × span (the naive dense-grid + ignore-nulls-carry formulation,
    which the oracle uses, went quadratic-ish: 26 s at sf0.1 vs ~3 s for
    this shape). At 100 TB this is the standard downsample-then-densify
    rollup: bucket first map-side, densify per observation pair after."""
    ev = load_table(spark, sf_dir, "events")
    hb = ntz(F.date_trunc("hour", "ts")).alias("hb")
    wlast = Window.partitionBy("user_id", "hb").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    obs = (
        ev.select("user_id", hb, "ts", "event_id", "value")
        .withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select("user_id", "hb", F.col("value").alias("v_obs"))
    )
    observed = obs.select(
        "user_id",
        "hb",
        fround(F.col("v_obs"), "v_interp"),
        F.lit(True).alias("is_observed"),
    )
    wlead = Window.partitionBy("user_id").orderBy("hb")
    pairs = obs.select(
        "user_id",
        "hb",
        "v_obs",
        F.lead("hb").over(wlead).alias("tn"),
        F.lead("v_obs").over(wlead).alias("vn"),
    ).filter(F.col("tn") > F.expr("hb + INTERVAL 1 HOUR"))

    # unix_micros needs TIMESTAMP (not NTZ); session tz is pinned UTC in
    # load_table, so the ntz→ltz cast is the identity on the stored value
    def em(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    frac = (em("gb") - em("hb")).cast("double") / (
        em("tn") - em("hb")
    ).cast("double")
    missing = pairs.select(
        "user_id",
        "hb",
        "v_obs",
        "tn",
        "vn",
        F.explode(
            F.sequence(
                F.expr("hb + INTERVAL 1 HOUR"),
                F.expr("tn - INTERVAL 1 HOUR"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("gb"),
    ).select(
        "user_id",
        F.col("gb").alias("hb"),
        fround(
            F.col("v_obs") + (F.col("vn") - F.col("v_obs")) * frac,
            "v_interp",
        ),
        F.lit(False).alias("is_observed"),
    )
    return observed.unionByName(missing)


def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsample (hypertable-rollup style): per event_type × day,
    open/close = value at the first/last event, high/low = min/max.

    open/close use min_by/max_by keyed on event_id — the fixture guarantees
    event_id is dense in ts order (FIXTURES.md), so the ordinal key is a
    strict total order and the result is deterministic where a raw-ts key
    could tie. One shuffle, full map-side partial aggregation; at 100 TB
    this is the canonical first-rollup over a time-partitioned event log
    (partition pruning on the date dimension comes free from the
    date_trunc groupBy when the table is date-partitioned)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", ntz(F.date_trunc("day", "ts")).alias("day"))
        .agg(
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing z-score anomaly flags: each event's value against its
    user's 1-hour trailing window (the continuous-monitoring primitive of
    a time-series store). Variance comes from the closed form
    (Σx² − (Σx)²/n)/(n−1) over EXACT decimal sums inside the RANGE frame
    (the q_agg_stats determinism recipe applied to a window), so the only
    float ops are the final IEEE-identical expression, ε-nudged. Events
    with a singleton window emit NULL z (no variance estimate). One
    shuffle on user_id; the frame state is O(window) per user."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(umicros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    n = F.count("value").over(w)
    sx = F.sum(dec("value")).over(w).cast("double")
    sxx = F.sum(dec("value") * dec("value")).over(w).cast("double")
    var = (sxx - sx * sx / n) / (n - F.lit(1))
    z = F.when(
        (n > 1) & (var > 0),
        F.round(
            (F.col("value") - sx / n) / F.sqrt(var) + F.lit(EPS), 6
        ),
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        n.cast("long").alias("n_window"),
        z.alias("zscore"),
        (F.abs(F.coalesce(z, F.lit(0.0))) > F.lit(2.0)).alias("is_anomaly"),
    )


def q_ts_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly + cumulative volume-weighted average price over the
    lineitem fact — the ratio-of-sums slice a commodity-price API serves
    (VWAP = Σ price·qty / Σ qty; l_extendedprice is already the extended
    price). Two ratio columns: within-month VWAP and the running
    since-inception VWAP.

    Scale notes (100 TB): the groupBy is one shuffle with map-side partial
    aggregation; the window then runs over the POST-AGG frame (one row per
    month — dozens, not billions), so the unpartitioned running-sum window
    is driver-trivial by construction, not a scale hazard. Determinism:
    both running and per-month sums stay in exact DECIMAL space; the only
    float op is the final identical IEEE division, ε-nudged."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        ntz(F.date_trunc("month", "l_shipdate")).alias("ship_month")
    ).agg(
        F.sum(dec("l_extendedprice")).alias("sp"),
        F.sum(dec("l_quantity")).alias("sq"),
    )
    w = Window.orderBy("ship_month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return m.select(
        "ship_month",
        fround(F.col("sp").cast("double") / F.col("sq").cast("double"), "vwap"),
        fround(
            F.sum("sp").over(w).cast("double")
            / F.sum("sq").over(w).cast("double"),
            "cum_vwap",
        ),
    )


_ATTRIB_WINDOW_US = 7 * 24 * 3_600 * 1_000_000  # 7-day lookback


def q_ts_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRIOR non-purchase event (view/click/signup) within a
    7-day lookback; purchases with no qualifying touch (direct) are
    excluded. The marketing-attribution join every analytics API exposes.

    One shuffle on user_id; the carried touch columns are three
    last(..., ignorenulls) over the same (ts, event_id)-ordered frame
    ending at 1 PRECEDING — same-ts touches with a lower event_id count
    as prior, mirroring the SQL ordering exactly. State is O(1) per user
    (the single best-so-far touch), not O(history)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.col("event_type") != "purchase"

    def carry(col: str):
        return F.last(F.when(touch, F.col(col)), ignorenulls=True).over(w)

    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            carry("event_id").alias("touch_event_id"),
            carry("event_type").alias("touch_type"),
            carry("ts").alias("touch_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .filter(
            F.col("touch_ts").isNotNull()
            & (
                umicros("ts") - umicros(F.col("touch_ts"))
                <= F.lit(_ATTRIB_WINDOW_US)
            )
        )
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "touch_event_id",
            "touch_type",
            "touch_ts",
            F.expr(
                "(unix_micros(CAST(ts AS TIMESTAMP))"
                " - unix_micros(CAST(touch_ts AS TIMESTAMP))) div 1000000"
            ).alias("gap_seconds"),
        )
    )


def q_ts_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov estimate): for
    every consecutive pair of events per user, count from→to transitions
    and the conditional probability P(to | from). The user-path /
    clickstream-flow query of a product-analytics API.

    Scale notes (100 TB): one shuffle on user_id for the lag window (same
    partitioning as sessionization); the pair stream then collapses
    through a map-side-partial hash aggregate into a ≤|types|² matrix, so
    the per-from probability window runs over ≤25 rows on the driver-
    trivial post-agg frame. The (ts, event_id) ordering is total, so the
    lag assignment — and therefore every count — is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    m = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_from = Window.partitionBy("from_type")
    return m.select(
        "from_type",
        "to_type",
        "n_transitions",
        fround(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_from).cast("double"),
            "p_transition",
        ),
    )


_EWMA_ALPHA = 0.3


def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the daily mean event
    value, per event_type (α=0.3, s_0 = x_0). Spark has no recursive
    window aggregate, so the recurrence s_d = α·x_d + (1−α)·s_{d−1} is
    re-expressed as its closed form over a prefix scan:

        s_d = (1−α)^d · ( x_0 + α · Σ_{j=1..d} x_j·(1−α)^{−j} )

    i.e. one cumulative windowed sum of x_j·(1−α)^{−j} plus a
    first_value, then a rescale — no iteration, no UDF.

    Scale notes (100 TB): the daily aggregate is one map-side-partial
    shuffle; the scan runs over the POST-AGG frame (#types × #days rows),
    partitioned by event_type. The (1−α)^{−j} weights grow ~43,000× over
    a 30-day month — well inside double range for any realistic window;
    for multi-year series, reset the exponent per month and chain the
    month-boundary states (documented, not needed at this span).
    Determinism: daily means are ε-rounded to 6 decimals BEFORE the scan
    so both engines scan identical inputs; the scan itself is a sum of
    ≤31 doubles whose association-order ulp noise is absorbed by the
    final ε-nudged rounding."""
    ev = load_table(spark, sf_dir, "events")
    a = _EWMA_ALPHA
    daily = ev.groupBy(
        "event_type", ntz(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.round(
            F.sum(dec("value")).cast("double") / F.count("value") + EPS, 6
        ).alias("daily_avg")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = (F.row_number().over(w_ord) - 1).cast("double")
    acc = daily.select(
        "event_type",
        "day",
        "daily_avg",
        d.alias("_d"),
        F.sum(
            F.col("daily_avg") * F.pow(F.lit(1.0 / (1.0 - a)), d)
        ).over(w_cum).alias("_a"),
        F.first("daily_avg").over(w_cum).alias("_x0"),
    )
    return acc.select(
        "event_type",
        "day",
        "daily_avg",
        fround(
            F.pow(F.lit(1.0 - a), F.col("_d"))
            * (F.col("_x0") + a * (F.col("_a") - F.col("_x0"))),
            "ewma",
        ),
    )


def q_ts_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate ladder: hour, day, and month
    buckets (plus the grand total) of the event stream materialized in
    ONE pass via ROLLUP over the nested truncations — hour ⊂ day ⊂ month,
    so ROLLUP(month, day, hour) enumerates exactly the hour/day/month/
    total grains with no self-union and no second scan.

    Scale notes (100 TB): a union of three groupBys would scan the fact
    three times; ROLLUP expands each row to 4 grouping tuples BEFORE the
    map-side partial aggregate, so the fact is read once and the shuffle
    carries only pre-aggregated (grain, bucket) partials — the classic
    hypertable rollup maintenance job. Grain is derived from NULLness of
    the truncation columns (never NULL in data), not grouping_id(), so
    the oracle needs no bit-layout agreement between engines."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        ntz(F.date_trunc("month", "ts")).alias("g_month"),
        ntz(F.date_trunc("day", "ts")).alias("g_day"),
        ntz(F.date_trunc("hour", "ts")).alias("g_hour"),
        "value",
    )
    r = g.rollup("g_month", "g_day", "g_hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )
    grain = (
        F.when(F.col("g_hour").isNotNull(), "hour")
        .when(F.col("g_day").isNotNull(), "day")
        .when(F.col("g_month").isNotNull(), "month")
        .otherwise("total")
    )
    return r.select(
        grain.alias("grain"),
        F.coalesce("g_hour", "g_day", "g_month").alias("bucket"),
        "n_events",
        "sum_value",
    )


def q_ts_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: monthly order revenue with
    month-over-month and year-over-year percentage change (NULL where no
    prior period exists) — the trend endpoint of every analytics API.

    Scale notes (100 TB): one map-side-partial shuffle for the month
    aggregate; the lag window runs over the POST-AGG months-cardinality
    frame (dozens of rows), so the unpartitioned ordering is driver-
    trivial by construction (same argument as q_ts_vwap). Revenue stays
    exact decimal; the growth ratios are identical IEEE divisions of
    identical rounded doubles, ε-nudged."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        ntz(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(dsum("o_totalprice", "revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue", 1).over(w)
    prev12 = F.lag("revenue", 12).over(w)
    return m.select(
        "month",
        "revenue",
        fround((F.col("revenue") - prev) / prev * 100, "mom_pct", 4),
        fround((F.col("revenue") - prev12) / prev12 * 100, "yoy_pct", 4),
    )


def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM burst detection over the daily value stream per
    event type: S_d = max(0, S_{d−1} + (x_d − k)) with drift k = the
    type's own mean daily total; a burst flags when S exceeds k (one
    average day of accumulated excess). The change-point monitor every
    ops/analytics API runs on its metric streams.

    Spark has no recursive window, but the clamped recurrence has an
    exact prefix form: S_d = cum_d − min(0, min_{j≤d} cum_j) where
    cum = running Σ(x−k) — one cumulative sum and one running min, both
    over the same frame. Everything stays in exact DECIMAL (k is the
    e2-floor-scaled mean, so the subtraction never leaves decimal space):
    S — and the integer-exact burst flag — is engine-identical with no
    float ever crossing the hash except the final rounded reports.

    Scale notes (100 TB): one map-side-partial daily aggregate shuffle;
    the two stacked windows run over the post-agg (#types × #days) frame
    partitioned by event_type; the drift table is a ≤|types|-row
    broadcast."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", ntz(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(dec("value")).alias("_s"))
    drift = daily.groupBy("event_type").agg(
        (
            F.floor(F.sum("_s").cast("double") * F.lit(100) / F.count(F.lit(1)))
            / F.lit(100.0)
        )
        .cast("decimal(18,2)")
        .alias("_k")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = daily.join(F.broadcast(drift), "event_type").withColumn(
        "_dev", F.col("_s") - F.col("_k")
    )
    cum = F.sum("_dev").over(w)
    acc = d.select(
        "event_type",
        "day",
        "_s",
        "_k",
        cum.alias("_cum"),
        F.min(cum).over(w).alias("_runmin"),
    )
    s = F.col("_cum") - F.least(F.col("_runmin"), F.lit(0).cast("decimal(18,2)"))
    return acc.select(
        "event_type",
        "day",
        F.round("_s", 2).cast("double").alias("day_sum"),
        F.round("_k", 2).cast("double").alias("drift_k"),
        F.round(s, 2).cast("double").alias("cusum"),
        (s > F.col("_k")).alias("is_burst"),
    )


def q_ts_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest — the baseline every forecasting
    endpoint must beat: predict each day's total value per event type as
    the value 7 daily ROWS earlier (lag-7 over the daily series — on
    this gap-free fixture that is exactly 7 calendar days; a gapped
    series would want the gap-filled frame from q_ts_gap_fill first),
    then score MAE and MAPE over the scorable days. Errors stay in exact decimal
    (|actual − forecast| of exact decimal sums); the means use the
    floor-scaling idiom, so the report is engine-exact.

    Scale notes (100 TB): one map-side-partial daily aggregate shuffle;
    the lag-7 window and the per-type score run over the post-agg
    (#types × #days) frame. A real horizon-h forecast is the same lag
    with offset h — the backtest IS the production plan."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", ntz(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(dec("value")).alias("_s"))
    w = Window.partitionBy("event_type").orderBy("day")
    scored = daily.withColumn("_f", F.lag("_s", 7).over(w)).filter(
        F.col("_f").isNotNull()
    )
    err = F.abs(F.col("_s") - F.col("_f"))
    # per-day relative error e6-floored to a LONG before summation (the
    # unigram-logprob idiom): decimal/decimal division has engine-specific
    # scale rules, so the ratio runs in IEEE double on identical inputs
    # and quantizes immediately — the aggregate is then an exact LONG sum
    ape_e6 = F.floor(
        err.cast("double") / F.col("_s").cast("double") * F.lit(1_000_000)
        + F.lit(EPS)
    ).cast("long")
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        (
            F.floor(F.sum(err).cast("double") * F.lit(100) / F.count(F.lit(1)))
            / F.lit(100.0)
        ).alias("mae"),
        F.round(
            F.sum(ape_e6) / F.lit(1_000_000.0) / F.count(F.lit(1))
            + F.lit(EPS),
            6,
        ).alias("mape"),
    )


def q_ts_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour — the interval-overlap sweep
    every capacity/monitoring API serves: each session (from
    q_ts_sessionize) emits +1 at its start and −1 at its end (half-open
    [start, end): at equal timestamps the −1 sorts first), and the
    GLOBAL running sum of deltas in (t, delta, user_id, session_id)
    order is the live concurrency; the report is the per-hour maximum.

    Scale notes (100 TB): the sweep is the reusable distributed prefix
    sum (gpe.common.two_pass_running_sum — range repartition + offset
    table), so the global time-ordered scan never funnels through one
    task; the sweep frame is 2 rows per SESSION (not per event). The
    hourly max is deterministic under the tie order: within an equal-
    (t, delta) run of +1s the maximum lands on the run's last row
    regardless of user order."""
    from gpe.common import two_pass_running_sum

    sess = q_ts_sessionize(spark, sf_dir)
    pts = sess.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("session_start").alias("t"),
                    F.lit(1).alias("delta"),
                    F.col("user_id"),
                    F.col("session_id"),
                ),
                F.struct(
                    F.col("session_end").alias("t"),
                    F.lit(-1).alias("delta"),
                    F.col("user_id"),
                    F.col("session_id"),
                ),
            )
        ).alias("p")
    ).select("p.t", "p.delta", "p.user_id", "p.session_id")
    swept = two_pass_running_sum(
        spark,
        pts,
        ["t", "delta", "user_id", "session_id"],
        "delta",
        "concurrency",
    )
    return (
        swept.groupBy(ntz(F.date_trunc("hour", "t")).alias("hour"))
        .agg(
            F.max("concurrency").cast("long").alias("max_concurrent"),
            F.count(F.lit(1)).alias("n_changes"),
        )
    )


def q_ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: mean daily total
    by weekday (0 = Monday, ISO — Spark's weekday() and DuckDB's
    isodow−1 agree; the engines' default dayofweek() origins do NOT)
    and each weekday's share of the weekly total — the seasonality
    endpoint behind staffing/traffic dashboards.

    Scale notes (100 TB): one map-side-partial daily aggregate; the
    profile collapses to ≤|types|×7 rows before the share window.
    Determinism: means floor-scaled from exact decimal sums; shares
    e6-floored ratios of those identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", ntz(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(dec("value")).alias("_s"))
    prof = daily.groupBy(
        "event_type", F.weekday("day").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.floor(F.sum("_s").cast("double") * F.lit(100) / F.count(F.lit(1)))
            / F.lit(100.0)
        ).alias("avg_day_total"),
    )
    w = Window.partitionBy("event_type")
    share = F.floor(
        F.col("avg_day_total")
        / F.sum("avg_day_total").over(w)
        * F.lit(1_000_000)
        + F.lit(EPS)
    ) / F.lit(1_000_000.0)
    return prof.select(
        "event_type", "dow", "n_days", "avg_day_total",
        share.alias("dow_share"),
    )


_HOLT_ALPHA, _HOLT_BETA = 0.5, 0.3


def _holt_weight_rows(n: int) -> list[tuple]:
    """Constant table (k, ws, wb, i0, i1) for Holt's linear-trend
    smoother written as a LINEAR RECURSION v_t = A·v_{t−1} + c·x_t with
    A = [[1−α, 1−α], [−αβ, 1−αβ]], c = (α, αβ), v = (level, trend):
    ws/wb are the components of A^k·c (the weight of x_{t−k} in
    level/trend) and i0/i1 the first column of A^k (the weight of the
    s₀ = x₀, b₀ = 0 initialization). Pure-Python constants — computed
    once on the driver, embedded IDENTICALLY into the Spark literal
    table and the oracle's VALUES list, so both engines convolve with
    bit-identical weights."""
    a, b = _HOLT_ALPHA, _HOLT_BETA
    A = ((1 - a, 1 - a), (-a * b, 1 - a * b))
    c = (a, a * b)
    rows = []
    m = (1.0, 0.0, 0.0, 1.0)  # A^k, row-major, starting at identity
    for k in range(n + 1):
        rows.append(
            (k, m[0] * c[0] + m[1] * c[1], m[2] * c[0] + m[3] * c[1],
             m[0], m[2])
        )
        m = (
            A[0][0] * m[0] + A[0][1] * m[2],
            A[0][0] * m[1] + A[0][1] * m[3],
            A[1][0] * m[0] + A[1][1] * m[2],
            A[1][0] * m[1] + A[1][1] * m[3],
        )
    return rows


_HOLT_MAX_DAYS = 40  # weight-table horizon (31 days in the fixture month)


def q_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double exponential smoothing (level + trend) of the daily
    mean value per event type, plus the one-step-ahead forecast — the
    trend-aware upgrade of q_ts_ewma. Spark has no 2-term recursive
    window, but the recursion is LINEAR, so it unrolls into a
    convolution against precomputed powers of the 2×2 transition matrix:
    level_t = Σ_k ws(k)·x_{t−k} + i0(t)·x₀ (trend likewise) — a join of
    the daily series against a ≤_HOLT_MAX_DAYS-row broadcast weight
    table and one aggregate. No iteration, no UDF.

    Scale notes (100 TB): the convolution joins the POST-AGG daily frame
    (#types × #days) against a constant-size broadcast; per-type output
    is one row per day. For year-scale horizons the weights decay
    geometrically (spectral radius < 1 for these α, β), so the table
    truncates at machine precision — k beyond ~60 contributes < 1e-9.
    Determinism: per-(t, j) terms e6-floor to LONGs before the exact
    integer sum (the fixed-point idiom), with both engines using the
    SAME repr-round-tripped weight constants."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", ntz(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.round(
            F.sum(dec("value")).cast("double") / F.count("value") + EPS, 6
        ).alias("x")
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type",
        "day",
        "x",
        (F.row_number().over(w_ord) - 1).alias("_t"),
    )
    wt = spark.createDataFrame(
        _holt_weight_rows(_HOLT_MAX_DAYS),
        "k int, ws double, wb double, i0 double, i1 double",
    )
    x0 = idx.filter(F.col("_t") == 0).select(
        "event_type", F.col("x").alias("_x0")
    )
    # contribution of x_j (j ≥ 1) to every later t = j + k
    contrib = (
        idx.filter(F.col("_t") >= 1)
        .join(F.broadcast(wt), how="cross")
        .select(
            "event_type",
            (F.col("_t") + F.col("k")).alias("_tt"),
            F.floor(F.col("ws") * F.col("x") * F.lit(1_000_000) + F.lit(EPS))
            .cast("long")
            .alias("_se6"),
            F.floor(F.col("wb") * F.col("x") * F.lit(1_000_000) + F.lit(EPS))
            .cast("long")
            .alias("_be6"),
        )
        .groupBy("event_type", "_tt")
        .agg(F.sum("_se6").alias("_ss"), F.sum("_be6").alias("_bs"))
    )
    init = (
        wt.crossJoin(F.broadcast(x0))
        .select(
            "event_type",
            F.col("k").alias("_tt"),
            F.floor(F.col("i0") * F.col("_x0") * F.lit(1_000_000) + F.lit(EPS))
            .cast("long")
            .alias("_si"),
            F.floor(F.col("i1") * F.col("_x0") * F.lit(1_000_000) + F.lit(EPS))
            .cast("long")
            .alias("_bi"),
        )
    )
    contrib = contrib.withColumnRenamed("event_type", "_cet")
    init = init.withColumnRenamed("event_type", "_iet").withColumnRenamed(
        "_tt", "_it"
    )
    out = (
        idx.join(
            contrib,
            (F.col("event_type") == F.col("_cet"))
            & (F.col("_t") == F.col("_tt")),
            "left",
        )
        .join(
            F.broadcast(init),
            (F.col("event_type") == F.col("_iet"))
            & (F.col("_t") == F.col("_it")),
            # LEFT: a series longer than the weight horizon must KEEP its
            # tail rows (an inner join silently dropped them — ADVICE r6);
            # beyond the horizon the init weight has geometrically decayed
            # below the e6 fixed point, so missing-init ≡ 0 is exact.
            "left",
        )
    )
    level = (
        F.coalesce("_ss", F.lit(0)) + F.coalesce("_si", F.lit(0))
    ) / F.lit(1_000_000.0)
    trend = (
        F.coalesce("_bs", F.lit(0)) + F.coalesce("_bi", F.lit(0))
    ) / F.lit(1_000_000.0)
    return out.select(
        "event_type",
        "day",
        "x",
        level.alias("level"),
        trend.alias("trend"),
        fround(level + trend, "forecast_next"),
    )


_LTTB_BUCKET = 10  # hours per bucket


def q_ts_downsample_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chart downsampling: pick ONE representative point per 10-hour
    bucket of the global hourly value series by largest triangle area
    against the neighboring buckets' MEAN points — the parallel
    bucket-mean variant of LTTB (Steinarsson's largest-triangle
    downsampling; classic LTTB anchors on the previously SELECTED point,
    a sequential dependency, so the serving-layer variant anchors on
    bucket means and every bucket selects independently). The endpoint a
    dashboard API serves when the chart wants ~N points from millions.

    Scale notes (100 TB): the hourly aggregate bounds the frame by the
    TIME SPAN, not data volume; bucket means are a tiny broadcast;
    selection is an argmax-as-aggregate (max-of-struct), no window sort.
    Determinism: y comes exact-decimal → correctly-rounded double, x is
    an integer hour index, neighbor means are ratios of exact sums — so
    the area expression sees identical doubles in both engines and the
    (area, min-index) argmax is engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        ntz(F.date_trunc("hour", "ts")).alias("h")
    ).agg(F.sum(dec("value")).alias("_y"))
    t0 = hourly.agg(F.min("h").alias("_h0"))
    pts = hourly.crossJoin(F.broadcast(t0)).select(
        "h",
        F.col("_y"),
        ((umicros("h") - umicros(F.col("_h0"))) / F.lit(3_600_000_000))
        .cast("long")
        .alias("_x"),
    ).withColumn("_b", F.expr(f"_x div {_LTTB_BUCKET}"))
    bmeans = pts.groupBy("_b").agg(
        (F.sum("_x").cast("double") / F.count(F.lit(1))).alias("_mx"),
        (F.sum("_y").cast("double") / F.count(F.lit(1))).alias("_my"),
    )
    prev = bmeans.select(
        (F.col("_b") + 1).alias("_b"),
        F.col("_mx").alias("_px"),
        F.col("_my").alias("_py"),
    )
    nxt = bmeans.select(
        (F.col("_b") - 1).alias("_b"),
        F.col("_mx").alias("_nx"),
        F.col("_my").alias("_ny"),
    )
    j = pts.join(F.broadcast(prev), "_b").join(F.broadcast(nxt), "_b")
    x2 = F.col("_x").cast("double")
    y2 = F.col("_y").cast("double")
    area = F.abs(
        (F.col("_px") - F.col("_nx")) * (y2 - F.col("_py"))
        - (F.col("_px") - x2) * (F.col("_ny") - F.col("_py"))
    )
    best = (
        j.withColumn("_area", area)
        .groupBy("_b")
        .agg(
            F.max(
                F.struct(
                    F.col("_area").alias("a"),
                    (-F.col("_x")).alias("negx"),
                    F.col("h").alias("h"),
                    F.col("_y").alias("y"),
                )
            ).alias("s")
        )
    )
    return best.select(
        F.col("_b").alias("bucket"),
        F.col("s.h").alias("sel_hour"),
        F.round(F.col("s.y"), 2).cast("double").alias("sel_value"),
        (
            F.floor(F.col("s.a") * F.lit(1_000_000) + F.lit(EPS))
            / F.lit(1_000_000.0)
        ).alias("tri_area"),
    )


def q_win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day correlation between the daily 'click' and 'view'
    value totals — the co-movement diagnostic a metrics API serves next
    to the ACF ("are these two streams still coupled this week"). Only
    full 7-day windows emit.

    Determinism: the q_agg_corr_regr recipe applied to a bounded rows
    frame — the windowed co-moment sums run over EXACT decimal daily
    totals (conditional aggregation, one pass), and the closed-form IEEE
    combination is identical in both engines, ε-rounded. Scale notes
    (100 TB): one daily partial-agg shuffle; every window runs on the
    POST-AGG days-cardinality frame (bounded by the time span)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(ntz(F.date_trunc("day", "ts")).alias("day")).agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", dec("value"))),
            F.lit(0),
        )
        .cast("decimal(18,2)")
        .alias("c"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "view", dec("value"))),
            F.lit(0),
        )
        .cast("decimal(18,2)")
        .alias("v"),
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    wn = Window.orderBy("day")
    r = daily.select(
        "day",
        F.row_number().over(wn).alias("_rn"),
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
        F.sum("c").over(w).cast("double").alias("sx"),
        F.sum("v").over(w).cast("double").alias("sy"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("double").alias("sxx"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("double").alias("syy"),
        F.sum(F.col("c") * F.col("v")).over(w).cast("double").alias("sxy"),
    ).filter(F.col("_rn") >= 7)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # Zero-variance guard (ADVICE r7): a constant 7-day window makes a
    # variance term 0 (or ulp-negative) — Spark's non-ANSI x/0 is NULL
    # while DuckDB's IEEE float ops yield NaN/±inf, so the undefined
    # correlation is pinned to NULL EXPLICITLY on both sides
    # (crafted-data test: tests/test_property_determinism.py).
    corr = F.when(
        (denx <= 0) | (deny <= 0), F.lit(None).cast("double")
    ).otherwise(F.round(num / F.sqrt(denx * deny) + F.lit(EPS), 6))
    return r.select(
        "day",
        F.col("n").cast("int").alias("n_days"),
        corr.alias("rolling_corr"),
    )


def q_ts_session_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event → session attachment: every event labeled with its session
    ordinal (the q_ts_sessionize 30-min-gap formula BEFORE the session
    rollup) plus its 1-based position within the session — the
    enrichment an analytics API applies before any per-session drill-
    down. Shares the gap formula with sessionize/bounce-rate verbatim.

    Scale notes (100 TB): one user_id shuffle; both windows (the session
    running-sum and the in-session position) reuse that partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = umicros("ts") - umicros(F.lag("ts").over(w))
    flag = F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0)
    tagged = ev.withColumn("session_id", F.sum(flag).over(wrun))
    w_sess = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    return tagged.select(
        "event_id",
        "user_id",
        "session_id",
        F.row_number().over(w_sess).alias("event_in_session"),
    )


def q_ts_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: per session-START day, total sessions,
    single-event ("bounce") sessions, and the floor-scaled bounce ratio —
    the engagement headline metric beside sessionization and
    concurrency (sessions reuse q_ts_sessionize's 30-min-gap formula
    verbatim, so the two keys cannot drift apart).

    Scale notes (100 TB): the session build is one user_id shuffle (lag
    window + groupBy share the partitioning); the daily rollup is a
    second partial-agg shuffle onto a days-cardinality frame; the ratio
    is exact-integer floor-scaling."""
    sess = q_ts_sessionize(spark, sf_dir)
    daily = sess.groupBy(
        ntz(F.date_trunc("day", "session_start")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count(F.when(F.col("n_events") == 1, 1)).alias("n_bounces"),
    )
    return daily.select(
        "day",
        "n_sessions",
        "n_bounces",
        (
            F.floor(F.col("n_bounces") * F.lit(1_000_000) / F.col("n_sessions"))
            / F.lit(1_000_000.0)
        ).alias("bounce_rate"),
    )


def q_ts_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: per signup cohort day and day-age, the
    purchase revenue earned that day and the CUMULATIVE revenue to date —
    the LTV curve every subscription/commerce analytics API serves next
    to the retention matrix (q_ts_retention shares the cohort spine).

    Determinism: daily revenue is an exact decimal sum; the cumulative
    window adds exact decimals, rounded only at emission. Scale notes
    (100 TB): cohort spine = one signup aggregate (map-side partial),
    broadcast onto purchases; one (cohort, age) partial-agg shuffle; the
    running-sum window runs on the POST-AGG cohort×age frame (≤ span²
    rows), never on raw events."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(ntz(F.date_trunc("day", F.min("ts"))).alias("cohort_day"))
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(cohort), "user_id")
        .withColumn(
            "age_days",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")),
        )
        .filter(F.col("age_days") >= 0)
        .groupBy("cohort_day", "age_days")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(dec("value")).alias("_rev"),
        )
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "cohort_day",
        "age_days",
        "n_purchases",
        F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        F.round(F.sum("_rev").over(w), 2).cast("double").alias("cum_revenue"),
    )


def q_ts_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top entry paths: each user's first 3 events (by ts, event_id)
    joined into a '>'-separated path string, counted across users — the
    clickstream path-analysis endpoint ("how do sessions begin") that
    complements the funnel (fixed target order) and the transition matrix
    (first-order, memoryless).

    Spark-first: one rank window on user_id keeps rows 1-3, then the path
    assembles MAP-SIDE from a sorted struct array (collect over ≤3 rows
    per user — O(1) state) and one path-cardinality aggregate finishes.
    Scale notes (100 TB): two shuffles total (user_id window + path
    count), both with map-side partials; no string aggregation ever sees
    more than 3 elements."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first3 = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
    )
    paths = first3.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("_rn", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


_ACF_MAX_LAG = 7


def q_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily total value per event type,
    lags 1..7 — the seasonality/persistence diagnostic every forecasting
    endpoint (q_ts_forecast_snaive, q_ts_holt) should be driven by: a
    lag-7 spike says "weekly season", near-zero everywhere says the
    snaive baseline is unbeatable.

    ACF_k here is the Pearson correlation of the (x_t, x_{t−k}) overlap
    pairs (the q_agg_corr_regr recipe applied to a lagged self-pairing):
    five EXACT decimal co-moment sums per (type, lag) — order-free, so
    partitioning can't drift them — then one closed-form IEEE expression
    identical in both engines, ε-rounded to 6.

    Scale notes (100 TB): one daily partial-agg shuffle; the lag window
    runs on the POST-AGG days-cardinality frame (the q_ts_vwap argument);
    the 7 lags stack map-side via one explode (no 7-way self-join); the
    final co-moment aggregate is ≤ |types|·7 groups."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", ntz(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(dec("value")).cast("decimal(18,2)").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "x",
        *[
            F.lag("x", k).over(w).alias(f"_l{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    stacked = (
        lagged.select(
            "event_type",
            "x",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("k"), F.col(f"_l{k}").alias("xl")
                        )
                        for k in range(1, _ACF_MAX_LAG + 1)
                    ]
                )
            ).alias("p"),
        )
        .select("event_type", F.col("p.k").alias("lag"), "x", F.col("p.xl").alias("xl"))
        .filter(F.col("xl").isNotNull())
    )
    agg = stacked.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("xl").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("xl") * F.col("xl")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("xl")).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # Zero-variance guard (ADVICE r7): a constant overlap series makes a
    # variance term 0 — NULL pinned explicitly on both engines (Spark
    # x/0 → NULL vs DuckDB IEEE NaN/inf would otherwise diverge).
    acf = F.when(
        (denx <= 0) | (deny <= 0), F.lit(None).cast("double")
    ).otherwise(F.round(num / F.sqrt(denx * deny) + F.lit(EPS), 6))
    return agg.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        acf.alias("acf"),
    )


def q_ts_max_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest silent gap per user — the monitoring/watchdog complement to
    sessionization: the longest interval between consecutive events, with
    its endpoints. The outage-detection primitive a device/user-activity
    API serves ("when did this sensor go quiet, and for how long").

    Spark-first: one lag window over (ts, event_id) order, then the
    argmax AS AN AGGREGATE (max-of-struct keyed on (gap_µs, start_µs,
    end event_id) — equal gaps resolve to the LATEST start and the
    end-side event_id makes the key strictly unique per row, so the
    winner is engine-exact), never a rank-window re-sort. One shuffle on
    user_id, O(1) state per row; users with a single event have no gap
    and drop out."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("ts").over(w).alias("_pts"),
    ).filter(F.col("_pts").isNotNull())
    gap_us = umicros("ts") - umicros(F.col("_pts"))
    best = g.groupBy("user_id").agg(
        (F.count(F.lit(1)) + F.lit(1)).alias("n_events"),
        F.max(
            F.struct(
                gap_us.alias("gap"),
                umicros(F.col("_pts")).alias("su"),
                F.col("event_id").alias("eid"),
                F.col("_pts").alias("gs"),
                F.col("ts").alias("ge"),
            )
        ).alias("b"),
    )
    return best.select(
        "user_id",
        "n_events",
        F.floor(F.col("b.gap") / F.lit(1_000_000)).cast("long").alias(
            "max_gap_seconds"
        ),
        F.col("b.gs").alias("gap_start"),
        F.col("b.ge").alias("gap_end"),
    )


def q_ts_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily/weekly active users + stickiness: per day, the EXACT
    distinct users active that day (DAU), the distinct users active in
    the trailing 7-day window (WAU), and DAU/WAU — the engagement
    headline every product-analytics API serves. A windowed
    COUNT(DISTINCT) has no native Spark form and a naive per-day
    re-scan is 7× the work.

    Spark-first shape: ONE distinct (day, user) shuffle contracts the
    stream to user-days, each user-day then contributes map-side to the
    7 target days it keeps active (explode of a 7-element sequence — no
    self-join, no re-scan), and one count-distinct shuffle finishes; the
    day spine join drops windows past the data's edge. Scale notes
    (100 TB): both shuffles carry user-day-bounded rows (≤ users × span
    after the first distinct), the 7× expansion happens AFTER the
    contraction, and the spine broadcast is span-sized."""
    ev = load_table(spark, sf_dir, "events")
    du = (
        ev.select(
            ntz(F.date_trunc("day", "ts")).alias("day"), "user_id"
        ).distinct()
    )
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(
        F.count_distinct("user_id").alias("dau")
    )
    target = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("_g"),
        "day",
        "user_id",
    ).select(
        F.timestamp_add("DAY", F.col("_g"), F.col("day")).alias("day"),
        "user_id",
    )
    wau = (
        target.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (
            F.floor(F.col("dau") * F.lit(1_000_000) / F.col("wau"))
            / F.lit(1_000_000.0)
        ).alias("stickiness"),
    )


def q_ts_daily_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50 / p95 / max of event value per event type — the
    latency-dashboard staple (exact percentiles, not sketches: the
    monitoring endpoint that pages someone must be reproducible).

    Determinism: exact continuous percentiles over 2-decimal values
    interpolate with the same IEEE expression in both engines (the
    q_agg_percentiles/q_agg_mad recipe), ε-rounded to 2. Scale notes
    (100 TB): one sort-based percentile aggregate per (type, day) group
    — a single shuffle with bounded groups; at extreme cardinality the
    approx_percentile sketch family (q_agg_approx_quantile) is the
    declared fallback."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", ntz(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.percentile("value", F.lit(0.5)) + EPS, 2).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)) + EPS, 2).alias("p95"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


def q_ts_calendar_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly calendar heatmap — event volume and value by (ISO weekday,
    hour-of-day), the load-profile rollup every ops/analytics dashboard
    draws (when does traffic land, which cells carry the value).

    Determinism: Spark's dayofweek() is 1=Sunday while DuckDB's isodow
    is 1=Monday, so the engine maps (dayofweek+5)%7+1 to ISO; shares are
    integer fixed-point, value sums exact-decimal.

    Scale notes (100 TB): pure map-side bucket expressions → one partial
    aggregate to ≤168 cells; the share denominator is a 1-row broadcast.
    This is the cheapest shape a scan-heavy profile can take."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.expr("(dayofweek(ts) + 5) % 7 + 1").cast("int").alias("isodow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n_total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "isodow",
        "hour",
        "n_events",
        "sum_value",
        F.expr("(n_events * 1000000) DIV n_total").alias("share_e6"),
    )


def q_ts_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve over customer reorder delay — the
    censoring-correct answer to "how long until a customer orders
    again?" (Kaplan & Meier '58). Subjects enter at their FIRST order;
    the event is the SECOND order (duration = day gap); customers who
    never reorder are right-censored at the global last order date.
    Output: one row per event time with the risk-set size, event count,
    the per-step log factor and the running product (survival).

    Determinism: durations are integer days off a row_number total
    order (date + orderkey tiebreak); the risk set is a reverse running
    sum of integer counts; each step's ln((n−d)/n) is e6-floored to a
    LONG before the cumulative sum (the q_text_unigram_logprob libm
    idiom), so the curve's fixed-point column hashes identically
    cross-engine; only the final exp returns to double (ε-rounded).

    Scale notes (100 TB): one partitioned window over orders grouped by
    customer (single shuffle), a subject-level aggregate, then ALL
    curve arithmetic runs on the #distinct-durations frame (bounded by
    the calendar span in days, thousands of rows at any data scale) —
    the windows there are aggregate-frame windows, never a global sort
    of subjects. The censoring anchor is a 1-row broadcast."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = o.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    )
    anchor = o.agg(F.max("o_orderdate").alias("_anchor"))
    per = (
        r.groupBy("o_custkey")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("o_orderdate"))).alias(
                "first_d"
            ),
            F.min(F.when(F.col("rn") == 2, F.col("o_orderdate"))).alias(
                "second_d"
            ),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.when(
                F.col("second_d").isNotNull(),
                F.datediff("second_d", "first_d"),
            )
            .otherwise(F.datediff("_anchor", "first_d"))
            .cast("long")
            .alias("dur_days"),
            F.col("second_d").isNotNull().cast("int").alias("event"),
        )
    )
    g = per.groupBy("dur_days").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("event").cast("long").alias("n_events"),
    )
    w_risk = Window.orderBy("dur_days").rowsBetween(
        0, Window.unboundedFollowing
    )
    risk = g.withColumn("n_risk", F.sum("n_all").over(w_risk))
    ev = risk.filter(F.col("n_events") > 0).withColumn(
        "factor_e6",
        F.when(
            F.col("n_events") < F.col("n_risk"),
            F.floor(
                F.log(
                    (F.col("n_risk") - F.col("n_events"))
                    / F.col("n_risk")
                )
                * F.lit(1_000_000)
                + F.lit(EPS)
            ).cast("long"),
        ),
    )
    w_cum = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ev.withColumn(
        "log_surv_e6", F.sum("factor_e6").over(w_cum)
    ).select(
        F.col("dur_days").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        "n_events",
        "factor_e6",
        "log_surv_e6",
        F.when(
            F.col("factor_e6").isNull(), F.lit(0.0)
        )
        .otherwise(
            F.round(
                F.exp(F.col("log_surv_e6") / F.lit(1_000_000.0)) + F.lit(EPS),
                6,
            )
        )
        .alias("surv"),
    )


def q_ts_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per order priority — the median of all
    pairwise slopes of the monthly revenue series (Theil '50, Sen '68):
    up to ~29% outlier months cannot move it, unlike the OLS slope
    q_agg_corr_regr fits. The classic robust-regression primitive for
    noisy operational series.

    Determinism: monthly revenue is exact cents; each pair's slope is
    ONE IEEE division of exact integers (identical in both engines);
    the median is picked by ROW_NUMBER over the total order (slope,
    rise, run) at rank (n+1) DIV 2 — the lower median, no float
    averaging of two middle elements; the reported slope re-divides the
    chosen pair's exact integers (ε-rounded).

    Scale notes (100 TB): the pair join runs on the POST-AGGREGATE
    monthly frame — C(#months, 2) pairs per group is calendar-bounded
    (~3.5k for 7 years) regardless of row scale, so the quadratic step
    never touches raw data; the monthly frame is persisted once and
    self-joined co-partitioned on the group key; the median window is
    partitioned per group over the bounded pair set."""
    from gpe.common import persist_tracked

    o = load_table(spark, sf_dir, "orders")
    m = persist_tracked(
        o.groupBy(
            "o_orderpriority",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("midx"),
        ).agg(F.sum((dec("o_totalprice") * 100).cast("long")).alias("y_c"))
    )
    nm = m.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_months")
    )
    a, b = m.alias("a"), m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
        & (F.col("b.midx") > F.col("a.midx")),
    ).select(
        F.col("a.o_orderpriority").alias("o_orderpriority"),
        (F.col("b.y_c") - F.col("a.y_c")).alias("rise_c"),
        (F.col("b.midx") - F.col("a.midx")).alias("run_m"),
    )
    slope = F.col("rise_c").cast("double") / F.col("run_m")
    w = Window.partitionBy("o_orderpriority").orderBy(
        slope, "rise_c", "run_m"
    )
    wc = Window.partitionBy("o_orderpriority")
    med = (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn("n_pairs", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
    )
    return med.join(F.broadcast(nm), "o_orderpriority").select(
        "o_orderpriority",
        "n_months",
        "n_pairs",
        F.col("rise_c").alias("med_rise_c"),
        F.col("run_m").alias("med_run_m"),
        fround(slope, "slope_c_per_month"),
    )


def q_ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per order priority — the nonparametric
    significance companion to q_ts_theilsen's slope (Mann '45, Kendall
    '75, with the tie correction): S = Σ_{i<j} sign(y_j − y_i) over the
    monthly revenue series, Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18,
    and the continuity-corrected z statistic. |z| > 1.96 ⇒ monotone
    trend at 95%.

    Determinism: S and both variance polynomials are exact BIGINTs;
    the only float ops are one division by 18.0, one sqrt (IEEE
    correctly-rounded in BOTH engines — unlike ln/exp, sqrt carries no
    libm variance), and one division — identical chains, ε-rounded.
    Zero-variance groups (all-tied series) emit NULL z on both sides.

    Scale notes (100 TB): the sign-pair join runs on the POST-AGGREGATE
    monthly frame (calendar-bounded C(n,2) per group — never raw rows);
    the tie histogram is an aggregate OF that frame; one broadcast
    join stitches the ≤ #groups rows together."""
    from gpe.common import persist_tracked

    o = load_table(spark, sf_dir, "orders")
    m = persist_tracked(
        o.groupBy(
            "o_orderpriority",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("midx"),
        ).agg(F.sum((dec("o_totalprice") * 100).cast("long")).alias("y_c"))
    )
    a, b = m.alias("a"), m.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
            & (F.col("b.midx") > F.col("a.midx")),
        )
        .select(
            F.col("a.o_orderpriority").alias("o_orderpriority"),
            F.when(F.col("b.y_c") > F.col("a.y_c"), 1)
            .when(F.col("b.y_c") < F.col("a.y_c"), -1)
            .otherwise(0)
            .cast("long")
            .alias("sgn"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("sgn").alias("s_stat"))
    )
    nm = m.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_months")
    )
    ties = (
        m.groupBy("o_orderpriority", "y_c")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_tied_groups"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
        )
    )
    g = (
        s.join(F.broadcast(nm), "o_orderpriority")
        .join(F.broadcast(ties), "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n_months",
            "s_stat",
            F.coalesce("n_tied_groups", F.lit(0)).alias("n_tied_groups"),
            (
                (
                    F.col("n_months")
                    * (F.col("n_months") - 1)
                    * (2 * F.col("n_months") + 5)
                    - F.coalesce("tie_term", F.lit(0))
                ).cast("double")
                / 18.0
            ).alias("_var"),
        )
    )
    z = F.when(
        F.col("_var") > 0,
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt("_var"),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt("_var"),
        )
        .otherwise(F.lit(0.0)),
    )
    return g.select(
        "o_orderpriority",
        "n_months",
        "s_stat",
        "n_tied_groups",
        fround(F.col("_var"), "var_s"),
        fround(z, "z_stat"),
    )


def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection per event type — the first step of
    binary segmentation (Scott & Knott '74 / the CUSUM-adjacent family):
    over the daily value series, find the split that maximizes the
    explained sum of squares S₁²/k + S₂²/(n−k) (equivalently, minimizes
    within-segment SSE for a piecewise-constant mean). Output per type:
    the split day, segment sizes, and the exact-integer segment means.

    Determinism: daily sums are exact cents; every candidate's score is
    the same chain of IEEE ops on exact integers in both engines, used
    ONLY for ordering (the score itself is never emitted — its 1e14
    magnitude is exactly where cross-engine double rounding gets
    treacherous); the argmax tiebreaks on the earlier day; reported
    means are integer DIV cents.

    Scale notes (100 TB): the candidate scan runs entirely on the
    POST-AGGREGATE daily frame (calendar-bounded rows per type at any
    data scale); prefix sums and the argmax are windows partitioned by
    event type over that bounded frame — the raw-event shuffle is the
    single daily groupBy."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum((dec("value") * 100).cast("long")).alias("v_c"))
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    g = (
        daily.withColumn("cum_c", F.sum("v_c").over(wp))
        .withColumn("k", F.count(F.lit(1)).over(wp))
        .withColumn("tot_c", F.sum("v_c").over(wt))
        .withColumn("n_days", F.count(F.lit(1)).over(wt))
        .filter(F.col("k") < F.col("n_days"))
    )
    left = F.col("cum_c").cast("double")
    right = (F.col("tot_c") - F.col("cum_c")).cast("double")
    score = left * left / F.col("k") + right * right / (
        F.col("n_days") - F.col("k")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(score), F.asc("day")
    )
    return (
        g.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            # DATE → NTZ TIMESTAMP: pandas promotes DuckDB DATEs to
            # datetimes, so both engines emit the timestamp form
            ntz(F.col("day").cast("timestamp")).alias("split_day"),
            "n_days",
            F.col("k").alias("n_left"),
            (F.col("n_days") - F.col("k")).alias("n_right"),
            F.expr("cum_c DIV k").alias("mean_left_c"),
            F.expr("(tot_c - cum_c) DIV (n_days - k)").alias("mean_right_c"),
            (
                F.expr("(tot_c - cum_c) DIV (n_days - k)")
                - F.expr("cum_c DIV k")
            ).alias("shift_c"),
        )
    )


def q_ts_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival statistics: mean gap, coefficient of
    variation, and Goh–Barabási burstiness B = (σ−μ)/(σ+μ) (Goh &
    Barabási 2008, EPL 81) — the activity-regularity profile behind bot
    detection (B → −1 metronomic), engagement scoring, and arrival-model
    fitting (B ≈ 0 Poisson, B → 1 bursty).

    Determinism: gaps are exact integer epoch-µs; Σg and Σg² are exact
    decimal integers (g² via DECIMAL(19,0)² → DECIMAL(38,0) — a BIGINT
    square overflows past ~50-minute gaps); n·Σg² − (Σg)² is the exact
    population-variance numerator, and the only float tail is
    sqrt(numerator) (correctly-rounded IEEE in both engines, the
    q_ts_mann_kendall argument) followed by the same ± / ÷ chain:
    cv = √num/Σg, B = (√num − Σg)/(√num + Σg) — n cancels in both, so
    the doubles are identical cross-engine before the EPS-nudged round.

    Scale notes (100 TB): one shuffle on user_id feeds the lag window and
    the aggregation; output is one row per user with ≥ 2 gaps. A constant
    stream (σ = 0) is well-defined (cv 0, B −1); an all-zero-gap user
    (Σg = 0) emits NULL cv/burstiness on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        ev.select(
            "user_id", (umicros("ts") - F.lag(umicros("ts")).over(w)).alias("g")
        )
        .filter(F.col("g").isNotNull())
    )
    agg = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        # ADVICE r9 widening: decimal(6,0)/(16,0) overflowed to NULL at
        # >=1M gaps / ~3M summed years — decimal(19,0)/(38,0) carries any
        # BIGINT-countable user; the n·Σg² product stays exact in Spark's
        # 38-digit cap (values < 1e38) and the oracle runs it in HUGEINT.
        F.sum("g").cast("decimal(19,0)").alias("s"),
        F.sum(
            F.col("g").cast("decimal(19,0)") * F.col("g").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("ssq"),
    )
    num = (
        F.col("n_gaps").cast("decimal(19,0)") * F.col("ssq")
        - F.col("s") * F.col("s")
    ).cast("double")
    s_dbl = F.col("s").cast("double")
    return (
        agg.filter(F.col("n_gaps") >= 2)
        .select(
            "user_id",
            "n_gaps",
            fround(s_dbl / F.col("n_gaps") / F.lit(1e6), "mean_gap_s"),
            F.when(
                F.col("s") > 0,
                F.round(F.sqrt(num) / s_dbl + F.lit(EPS), 6),
            ).alias("cv_gap"),
            F.when(
                F.col("s") > 0,
                F.round(
                    (F.sqrt(num) - s_dbl) / (F.sqrt(num) + s_dbl) + F.lit(EPS),
                    6,
                ),
            ).alias("burstiness"),
        )
    )


def q_ts_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection on the daily revenue series per event type:
    a day is a peak when its revenue STRICTLY exceeds both calendar
    neighbors' (series edges excluded — no one-sided peaks). Reports per
    type: days observed, peak count, and the top peak (value + day,
    earliest day on value ties) — the spike-inventory feed of an
    anomaly-triage dashboard.

    Determinism: daily revenues are exact decimal sums; peak flags and
    the (rev DESC, day ASC) argmax are exact comparisons — no floats
    anywhere until the final display cast.

    Scale notes (100 TB): the raw scan collapses to (type, day) rows via
    one map-side-partial aggregate; the lag/lead window and the argmax
    run per type over that calendar-bounded frame. The flagged frame is
    persisted once — it feeds both the per-type rollup and the top-peak
    pick."""
    from gpe.common import persist_tracked

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("dt")
    ).agg(F.sum(dec("value")).alias("rev"))
    w = Window.partitionBy("event_type").orderBy("dt")
    flagged = persist_tracked(
        daily.select(
            "event_type",
            "dt",
            "rev",
            (
                F.lag("rev").over(w).isNotNull()
                & F.lead("rev").over(w).isNotNull()
                & (F.col("rev") > F.lag("rev").over(w))
                & (F.col("rev") > F.lead("rev").over(w))
            ).alias("is_peak"),
        )
    )
    agg = flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("is_peak").cast("int")).cast("long").alias("n_peaks"),
    )
    w_top = Window.partitionBy("event_type").orderBy(F.desc("rev"), F.asc("dt"))
    top = (
        flagged.filter(F.col("is_peak"))
        .withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("rev").cast("double").alias("top_peak_rev"),
            ntz(F.col("dt")).alias("top_peak_day"),
        )
    )
    return agg.join(top, "event_type", "left")


def q_ts_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Shannon entropy (nats) of the event-type mix, plus the
    ln(k)-normalized evenness — the traffic-composition drift monitor (a
    day whose mix collapses onto one event type signals an outage or a
    bot flood even when total volume looks normal).

    Determinism: each (c/n)·ln(n/c) term is e6-floored with the EPS nudge
    into a LONG before summation (the q_text_token_entropy libm
    discipline); evenness divides the exact integer sum by ln(k) and
    EPS-rounds. Single-type days emit evenness 0 (not 0/0) on both
    engines.

    Scale notes (100 TB): one (day, type) groupBy with map-side partials
    collapses the scan to calendar × |types| rows; the per-day total is a
    window over that aggregate output."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy(F.to_date("ts").alias("dt"), "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.sum("c").over(Window.partitionBy("dt"))
    term = cnt.select(
        "dt",
        F.col("c"),
        n.alias("n"),
        F.floor(
            (F.col("c") / n) * F.log(n / F.col("c")) * F.lit(1_000_000)
            + F.lit(EPS)
        )
        .cast("long")
        .alias("h_e6"),
    )
    return (
        term.groupBy("dt")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("h_e6").alias("sum_e6"),
        )
        .select(
            ntz(F.col("dt")).alias("day"),
            "n_events",
            "n_types",
            (F.col("sum_e6") / F.lit(1_000_000.0)).alias("entropy_nats"),
            F.when(F.col("n_types") > 1,
                F.round(
                    F.col("sum_e6")
                    / F.lit(1_000_000.0)
                    / F.log(F.col("n_types").cast("double"))
                    + F.lit(EPS),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("evenness"),
        )
    )


def _daily_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, dow, det7): the detrended daily series in exact
    7·cents integer units — det = 7c − Σ₇c over the centered full 7-day
    window (edge days excluded). Shared by q_ts_decompose and
    q_ts_anomaly_seasonal so the two can never diverge on the trend
    pass."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        (F.sum(dec("value")) * 100).cast("long").alias("c")
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    return (
        daily.select(
            "event_type",
            "day",
            "c",
            F.sum("c").over(w7).alias("sum7"),
            F.count(F.lit(1)).over(w7).alias("cnt7"),
        )
        .filter(F.col("cnt7") == 7)
        .select(
            "event_type",
            "day",
            (F.dayofweek("day") - 1).cast("long").alias("dow"),
            (F.lit(7) * F.col("c") - F.col("sum7")).alias("det7"),
        )
    )


def q_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition (STL-lite, Cleveland et al. 1990
    shape with fixed linear passes): per event type, daily revenue is
    split into a centered 7-day moving-average TREND, a day-of-week
    SEASONAL index (mean of the detrended values per weekday), and a
    RESIDUAL — reported per (type, weekday) as the seasonal index and
    the mean absolute residual, the table a capacity planner reads to
    separate "weekends are slow" from "something broke".

    Determinism: the whole pipeline runs in "7·cents" integer units —
    det = 7·c − Σ₇c is exact (no mean division), the per-weekday index
    FLOOR(Σdet/n) floors an exact-int IEEE division (exact quotients
    stay exact, so both engines floor identically — and floor, unlike
    integer DIV, agrees cross-engine on NEGATIVES: Spark DIV truncates
    toward zero, DuckDB // floors), and the display values divide by
    the constant 700 only at the end.

    Scale notes (100 TB): one map-side-partial daily rollup; the ±3-day
    window and both aggregations run over the calendar-bounded
    (#types × #days) frame. Edge days (incomplete 7-day windows) are
    excluded by the window COUNT guard, as in classical decomposition."""
    det = _daily_det(spark, sf_dir).drop("day")
    seas = det.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.sum("det7").alias("s_num"),
    )
    seas7 = F.floor(F.col("s_num") / F.col("n_weeks")).cast("long")
    resid = (
        det.join(
            seas.select(
                "event_type", "dow", seas7.alias("seas7")
            ),
            ["event_type", "dow"],
        )
        .select(
            "event_type",
            "dow",
            F.abs(F.col("det7") - F.col("seas7")).alias("ar7"),
        )
        .groupBy("event_type", "dow")
        .agg(F.sum("ar7").alias("ar_num"), F.count(F.lit(1)).alias("n2"))
    )
    return (
        seas.join(resid, ["event_type", "dow"])
        .select(
            "event_type",
            "dow",
            "n_weeks",
            (seas7 / F.lit(700.0)).alias("seasonal_value"),
            (
                F.floor(F.col("ar_num") / F.col("n2")).cast("long")
                / F.lit(700.0)
            ).alias("mean_abs_resid"),
        )
    )


def q_ts_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly days: flag days whose RESIDUAL (after
    removing the q_ts_decompose trend and weekday seasonal) exceeds 1.5×
    the weekday's mean absolute residual — the alert that stays quiet on
    "weekends are always slow" and fires only on genuinely off-pattern
    days, upgrading q_ts_anomaly_zscore's raw-series z-score.

    Determinism: the flag is the EXACT INTEGER comparison
    2·|det − seas|·n > 3·Σ|resid| (both sides in 7·cents·n units — no
    division anywhere in the decision; the multiplier is deliberately
    modest because with w weeks per weekday the ratio is bounded by w,
    so a z-style 3-4× gate is unreachable on short series); a constant
    series (Σ|resid| = 0)
    degenerates to "any nonzero residual fires", the right limit.
    Severity returns to double only for display.

    Scale notes (100 TB): shares _daily_det's calendar-bounded frame;
    two #types×7-row aggregates broadcast back onto it; output is only
    the flagged days."""
    from gpe.common import persist_tracked

    det = persist_tracked(_daily_det(spark, sf_dir))
    seas = det.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("det7").alias("s_num"),
    )
    seas7 = F.floor(F.col("s_num") / F.col("n")).cast("long").alias("seas7")
    sj = seas.select("event_type", "dow", seas7)
    resid = det.join(F.broadcast(sj), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "dow",
        (F.col("det7") - F.col("seas7")).alias("r7"),
    )
    stats = resid.groupBy("event_type", "dow").agg(
        F.sum(F.abs(F.col("r7"))).alias("ar_num"),
        F.count(F.lit(1)).alias("n2"),
    )
    return (
        resid.join(F.broadcast(stats), ["event_type", "dow"])
        .filter(
            F.lit(2) * F.abs(F.col("r7")) * F.col("n2")
            > F.lit(3) * F.col("ar_num")
        )
        .select(
            "event_type",
            ntz(F.col("day")).alias("day"),
            "dow",
            (F.col("r7") / F.lit(700.0)).alias("resid_value"),
            F.when(
                F.col("ar_num") > 0,
                F.round(
                    F.lit(2.0)
                    * F.abs(F.col("r7"))
                    * F.col("n2")
                    / (F.lit(3.0) * F.col("ar_num"))
                    + F.lit(EPS),
                    6,
                ),
            ).alias("severity"),
        )
    )


QUERIES = {
    "q_ts_anomaly_seasonal": q_ts_anomaly_seasonal,
    "q_ts_decompose": q_ts_decompose,
    "q_ts_interarrival": q_ts_interarrival,
    "q_ts_peaks": q_ts_peaks,
    "q_ts_mix_entropy": q_ts_mix_entropy,
    "q_ts_theilsen": q_ts_theilsen,
    "q_ts_mann_kendall": q_ts_mann_kendall,
    "q_ts_changepoint": q_ts_changepoint,
    "q_ts_calendar_profile": q_ts_calendar_profile,
    "q_ts_survival_km": q_ts_survival_km,
    "q_ts_active_users": q_ts_active_users,
    "q_ts_daily_percentiles": q_ts_daily_percentiles,
    "q_ts_anomaly_zscore": q_ts_anomaly_zscore,
    "q_ts_forecast_snaive": q_ts_forecast_snaive,
    "q_ts_concurrency": q_ts_concurrency,
    "q_ts_seasonality": q_ts_seasonality,
    "q_ts_downsample_triangle": q_ts_downsample_triangle,
    "q_ts_holt": q_ts_holt,
    "q_ts_acf": q_ts_acf,
    "q_ts_max_gap": q_ts_max_gap,
    "q_ts_user_paths": q_ts_user_paths,
    "q_ts_cohort_ltv": q_ts_cohort_ltv,
    "q_ts_bounce_rate": q_ts_bounce_rate,
    "q_win_rolling_corr": q_win_rolling_corr,
    "q_ts_session_attach": q_ts_session_attach,
    "q_ts_transitions": q_ts_transitions,
    "q_ts_ewma": q_ts_ewma,
    "q_ts_rollup_multigrain": q_ts_rollup_multigrain,
    "q_ts_mom_growth": q_ts_mom_growth,
    "q_ts_cusum": q_ts_cusum,
    "q_ts_vwap": q_ts_vwap,
    "q_ts_attribution": q_ts_attribution,
    "q_ts_tumbling": q_ts_tumbling,
    "q_ts_ohlc": q_ts_ohlc,
    "q_ts_sliding": q_ts_sliding,
    "q_ts_sessionize": q_ts_sessionize,
    "q_ts_funnel": q_ts_funnel,
    "q_ts_retention": q_ts_retention,
    "q_ts_gap_fill": q_ts_gap_fill,
    "q_ts_interpolate": q_ts_interpolate,
}

_SUM_VAL = "CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value"

_HOLT_VALUES = ",\n          ".join(
    f"({k}, {ws!r}, {wb!r}, {i0!r}, {i1!r})"
    for k, ws, wb, i0, i1 in _holt_weight_rows(_HOLT_MAX_DAYS)
)

_ACF_LAG_STACK = "\n          UNION ALL ".join(
    f"SELECT event_type, {k} AS lag, x, l{k} AS xl FROM lagged "
    f"WHERE l{k} IS NOT NULL"
    for k in range(1, _ACF_MAX_LAG + 1)
)

_ACF_LAG_COLS = ",\n                 ".join(
    f"LAG(x, {k}) OVER w AS l{k}" for k in range(1, _ACF_MAX_LAG + 1)
)

ORACLES = {
    # same det CTE as decompose; the flag is the exact integer compare
    # 2·|det−seas|·n > 3·Σ|resid| — no division in the decision
    "q_ts_anomaly_seasonal": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS c
          FROM events GROUP BY 1, 2),
        det AS (
          SELECT event_type, day,
                 CAST(dayofweek(day) AS BIGINT) AS dow,
                 7 * c - SUM(c) OVER w AS det7,
                 COUNT(*) OVER w AS cnt7
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        d2 AS (SELECT event_type, day, dow, det7 FROM det WHERE cnt7 = 7),
        seas AS (
          SELECT event_type, dow,
                 CAST(FLOOR(SUM(det7) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
                   AS seas7
          FROM d2 GROUP BY 1, 2),
        resid AS (
          SELECT d.event_type, d.day, d.dow, d.det7 - s.seas7 AS r7
          FROM d2 d JOIN seas s
            ON d.event_type = s.event_type AND d.dow = s.dow),
        stats AS (
          SELECT event_type, dow, SUM(ABS(r7)) AS ar_num,
                 COUNT(*) AS n2
          FROM resid GROUP BY 1, 2)
        SELECT r.event_type, CAST(r.day AS TIMESTAMP) AS day, r.dow,
               r.r7 / 700.0 AS resid_value,
               CASE WHEN st.ar_num > 0
                 THEN ROUND(2.0 * ABS(r.r7) * st.n2 / (3.0 * st.ar_num)
                            + 1e-9, 6) END AS severity
        FROM resid r JOIN stats st
          ON r.event_type = st.event_type AND r.dow = st.dow
        WHERE 2 * ABS(r.r7) * st.n2 > 3 * st.ar_num""",
    # identical 7·cents integer units; FLOOR of exact-int division (not
    # integer DIV — they disagree on negatives); Spark dayofweek−1 ==
    # DuckDB dayofweek (both Sunday-based, off by one)
    "q_ts_decompose": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS c
          FROM events GROUP BY 1, 2),
        det AS (
          SELECT event_type,
                 CAST(dayofweek(day) AS BIGINT) AS dow,
                 7 * c - SUM(c) OVER w AS det7,
                 COUNT(*) OVER w AS cnt7
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        d2 AS (SELECT event_type, dow, det7 FROM det WHERE cnt7 = 7),
        seas AS (
          SELECT event_type, dow,
                 CAST(COUNT(*) AS BIGINT) AS n_weeks,
                 SUM(det7) AS s_num,
                 CAST(FLOOR(SUM(det7) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
                   AS seas7
          FROM d2 GROUP BY 1, 2),
        resid AS (
          SELECT d.event_type, d.dow,
                 SUM(ABS(d.det7 - s.seas7)) AS ar_num,
                 COUNT(*) AS n2
          FROM d2 d JOIN seas s
            ON d.event_type = s.event_type AND d.dow = s.dow
          GROUP BY 1, 2)
        SELECT s.event_type, s.dow, s.n_weeks,
               s.seas7 / 700.0 AS seasonal_value,
               CAST(FLOOR(r.ar_num / CAST(r.n2 AS DOUBLE)) AS BIGINT)
                 / 700.0 AS mean_abs_resid
        FROM seas s JOIN resid r
          ON s.event_type = r.event_type AND s.dow = r.dow""",
    # exact integer-µs gaps; Σg² via DECIMAL(19,0)² (BIGINT squares
    # overflow); √num is correctly-rounded IEEE in both engines and n
    # cancels in cv/B, so the float chains are identical
    "q_ts_interarrival": f"""
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS g
          FROM events),
        agg AS (
          SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(g) AS DECIMAL(19,0)) AS s,
                 SUM(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS ssq
          FROM g WHERE g IS NOT NULL GROUP BY 1),
        v AS (
          SELECT user_id, n_gaps, s,
                 CAST(CAST(n_gaps AS HUGEINT) * CAST(ssq AS HUGEINT)
                      - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)
                      AS DOUBLE) AS num,
                 CAST(s AS DOUBLE) AS s_dbl
          FROM agg WHERE n_gaps >= 2)
        SELECT user_id, n_gaps,
               ROUND(s_dbl / n_gaps / 1e6 + {EPS}, 6) AS mean_gap_s,
               CASE WHEN s > 0
                 THEN ROUND(sqrt(num) / s_dbl + {EPS}, 6) END AS cv_gap,
               CASE WHEN s > 0
                 THEN ROUND((sqrt(num) - s_dbl) / (sqrt(num) + s_dbl)
                            + {EPS}, 6) END AS burstiness
        FROM v""",
    # identical daily decimal sums, strict-neighbor peak flag, and
    # (rev DESC, day ASC) argmax — all exact comparisons
    "q_ts_peaks": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS dt,
                 SUM(CAST(value AS DECIMAL(12,2))) AS rev
          FROM events GROUP BY 1, 2),
        flagged AS (
          SELECT event_type, dt, rev,
                 (LAG(rev) OVER w IS NOT NULL
                  AND LEAD(rev) OVER w IS NOT NULL
                  AND rev > LAG(rev) OVER w
                  AND rev > LEAD(rev) OVER w) AS is_peak
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY dt)),
        agg AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(CASE WHEN is_peak THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_peaks
          FROM flagged GROUP BY 1),
        top AS (
          SELECT event_type, CAST(rev AS DOUBLE) AS top_peak_rev,
                 CAST(dt AS TIMESTAMP) AS top_peak_day,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY rev DESC, dt ASC) AS rn
          FROM flagged WHERE is_peak)
        SELECT a.event_type, a.n_days, a.n_peaks,
               t.top_peak_rev, t.top_peak_day
        FROM agg a LEFT JOIN top t
          ON a.event_type = t.event_type AND t.rn = 1""",
    # e6-floored (c/n)·ln(n/c) terms (libm discipline); evenness guards
    # the single-type day with CASE, not 0/0
    "q_ts_mix_entropy": f"""
        WITH cnt AS (
          SELECT CAST(ts AS DATE) AS dt, event_type, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        term AS (
          SELECT dt, c, SUM(c) OVER (PARTITION BY dt) AS n
          FROM cnt),
        t2 AS (
          SELECT dt, n,
                 CAST(FLOOR((c / CAST(n AS DOUBLE))
                       * ln(CAST(n AS DOUBLE) / c) * 1000000 + {EPS})
                      AS BIGINT) AS h_e6
          FROM term)
        SELECT CAST(dt AS TIMESTAMP) AS day,
               CAST(MAX(n) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               SUM(h_e6) / 1000000.0 AS entropy_nats,
               CASE WHEN COUNT(*) > 1
                 THEN ROUND(SUM(h_e6) / 1000000.0
                            / ln(CAST(COUNT(*) AS DOUBLE)) + {EPS}, 6)
                 ELSE 0.0 END AS evenness
        FROM t2 GROUP BY 1""",
    # identical pair set, identical (slope, rise, run) total order,
    # lower-median rank pick; the one float op per pair is the same
    # exact-int IEEE division in both engines
    "q_ts_theilsen": f"""
        WITH m AS (
          SELECT o_orderpriority,
                 CAST(EXTRACT(year FROM o_orderdate) * 12
                      + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT)
                   AS midx,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                               AS BIGINT)) AS BIGINT) AS y_c
          FROM orders GROUP BY 1, 2),
        nm AS (SELECT o_orderpriority,
                      CAST(COUNT(*) AS BIGINT) AS n_months
               FROM m GROUP BY 1),
        pairs AS (
          SELECT a.o_orderpriority,
                 b.y_c - a.y_c AS rise_c,
                 b.midx - a.midx AS run_m
          FROM m a JOIN m b
            ON a.o_orderpriority = b.o_orderpriority AND b.midx > a.midx),
        ranked AS (
          SELECT *,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY CAST(rise_c AS DOUBLE) / run_m, rise_c, run_m)
                   AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY o_orderpriority)
                      AS BIGINT) AS n_pairs
          FROM pairs)
        SELECT ranked.o_orderpriority, n_months, n_pairs,
               rise_c AS med_rise_c, run_m AS med_run_m,
               ROUND(CAST(rise_c AS DOUBLE) / run_m + {EPS}, 6)
                 AS slope_c_per_month
        FROM ranked JOIN nm USING (o_orderpriority)
        WHERE rn = (n_pairs + 1) // 2""",
    # same exact-integer S and variance polynomials; the float tail is
    # /18.0 → sqrt (IEEE correctly-rounded both engines) → one division
    "q_ts_mann_kendall": f"""
        WITH m AS (
          SELECT o_orderpriority,
                 CAST(EXTRACT(year FROM o_orderdate) * 12
                      + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT)
                   AS midx,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                               AS BIGINT)) AS BIGINT) AS y_c
          FROM orders GROUP BY 1, 2),
        s AS (
          SELECT a.o_orderpriority,
                 CAST(SUM(CASE WHEN b.y_c > a.y_c THEN 1
                               WHEN b.y_c < a.y_c THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM m a JOIN m b
            ON a.o_orderpriority = b.o_orderpriority AND b.midx > a.midx
          GROUP BY 1),
        nm AS (SELECT o_orderpriority,
                      CAST(COUNT(*) AS BIGINT) AS n_months
               FROM m GROUP BY 1),
        ties AS (
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_tied_groups,
                 CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
          FROM (SELECT o_orderpriority, y_c,
                       CAST(COUNT(*) AS BIGINT) AS t
                FROM m GROUP BY 1, 2) tg
          WHERE t > 1 GROUP BY 1),
        g AS (
          SELECT s.o_orderpriority, n_months, s_stat,
                 COALESCE(n_tied_groups, 0) AS n_tied_groups,
                 CAST(n_months * (n_months - 1) * (2 * n_months + 5)
                      - COALESCE(tie_term, 0) AS DOUBLE) / 18.0 AS var_d
          FROM s JOIN nm USING (o_orderpriority)
          LEFT JOIN ties USING (o_orderpriority))
        SELECT o_orderpriority, n_months, s_stat, n_tied_groups,
               ROUND(var_d + {EPS}, 6) AS var_s,
               ROUND(CASE WHEN var_d > 0 THEN
                       CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_d)
                            WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_d)
                            ELSE 0.0 END
                     END + {EPS}, 6) AS z_stat
        FROM g""",
    # same prefix-sum frame and the same IEEE score chain used ONLY in
    # the ORDER BY; emitted columns are exact integers
    "q_ts_changepoint": """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100
                               AS BIGINT)) AS BIGINT) AS v_c
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT *,
                 CAST(SUM(v_c) OVER (PARTITION BY event_type ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c,
                 CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS k,
                 CAST(SUM(v_c) OVER (PARTITION BY event_type) AS BIGINT)
                   AS tot_c,
                 CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_days
          FROM daily),
        cand AS (SELECT * FROM g WHERE k < n_days),
        ranked AS (
          SELECT *,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(cum_c AS DOUBLE) * CAST(cum_c AS DOUBLE) / k
                            + CAST(tot_c - cum_c AS DOUBLE)
                              * CAST(tot_c - cum_c AS DOUBLE) / (n_days - k)
                            DESC,
                            day ASC) AS rn
          FROM cand)
        SELECT event_type, CAST(day AS TIMESTAMP) AS split_day, n_days,
               k AS n_left, n_days - k AS n_right,
               cum_c // k AS mean_left_c,
               (tot_c - cum_c) // (n_days - k) AS mean_right_c,
               (tot_c - cum_c) // (n_days - k) - cum_c // k AS shift_c
        FROM ranked WHERE rn = 1""",
    # isodow native in DuckDB; the engine maps Spark's 1=Sunday
    # dayofweek to ISO — fixed-point share, decimal value sum.
    "q_ts_calendar_profile": f"""
        WITH g AS (
          SELECT CAST(EXTRACT(isodow FROM ts) AS INTEGER) AS isodow,
                 CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 {sql_dsum("value", "sum_value")}
          FROM events GROUP BY 1, 2),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events)
        SELECT isodow, hour, n_events, sum_value,
               (n_events * 1000000) // tot.n_total AS share_e6
        FROM g, tot""",
    # identical row_number total order, reverse running-sum risk set,
    # e6-floored ln factors summed as BIGINT; only the final exp is
    # double (ε-rounded) — mirrors the engine column for column.
    "q_ts_survival_km": f"""
        WITH r AS (
          SELECT o_custkey, o_orderdate,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders),
        anchor AS (SELECT MAX(o_orderdate) AS a FROM orders),
        subj AS (
          SELECT o_custkey,
                 MIN(CASE WHEN rn = 1 THEN o_orderdate END) AS first_d,
                 MIN(CASE WHEN rn = 2 THEN o_orderdate END) AS second_d
          FROM r GROUP BY 1),
        per AS (
          SELECT CAST(CASE WHEN second_d IS NOT NULL
                      THEN date_diff('day', CAST(first_d AS DATE),
                                     CAST(second_d AS DATE))
                      ELSE date_diff('day', CAST(first_d AS DATE),
                                     CAST(anchor.a AS DATE))
                      END AS BIGINT) AS dur_days,
                 CASE WHEN second_d IS NOT NULL THEN 1 ELSE 0 END AS event
          FROM subj, anchor),
        g AS (
          SELECT dur_days, CAST(COUNT(*) AS BIGINT) AS n_all,
                 CAST(SUM(event) AS BIGINT) AS n_events
          FROM per GROUP BY 1),
        risk AS (
          SELECT dur_days, n_events,
                 CAST(SUM(n_all) OVER (ORDER BY dur_days
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                      AS BIGINT) AS n_risk
          FROM g),
        ev AS (
          SELECT dur_days, n_risk, n_events,
                 CASE WHEN n_events < n_risk THEN
                   CAST(FLOOR(LN(CAST(n_risk - n_events AS DOUBLE) / n_risk)
                              * 1000000 + {EPS}) AS BIGINT)
                 END AS factor_e6
          FROM risk WHERE n_events > 0)
        SELECT dur_days AS t_days, n_risk, n_events, factor_e6,
               CAST(SUM(factor_e6) OVER (ORDER BY dur_days
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS log_surv_e6,
               CASE WHEN factor_e6 IS NULL THEN 0.0
                    ELSE ROUND(EXP(CAST(SUM(factor_e6) OVER (ORDER BY
                           dur_days ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           / 1000000.0) + {EPS}, 6)
               END AS surv
        FROM ev""",
    "q_ts_daily_percentiles": f"""
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(quantile_cont(value, 0.5) + {EPS}, 2) AS p50,
               ROUND(quantile_cont(value, 0.95) + {EPS}, 2) AS p95,
               ROUND(MAX(value), 2) AS max_value
        FROM events GROUP BY 1, 2""",
    "q_ts_active_users": """
        WITH du AS (
          SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 user_id
          FROM events),
        days AS (SELECT DISTINCT day FROM du),
        tgt AS (
          SELECT du.day + to_days(CAST(g.g AS INTEGER)) AS day, du.user_id
          FROM du CROSS JOIN
               (SELECT unnest(generate_series(0, 6)) AS g) g),
        wau AS (
          SELECT t.day, CAST(COUNT(DISTINCT t.user_id) AS BIGINT) AS wau
          FROM tgt t JOIN days d ON t.day = d.day GROUP BY 1),
        dau AS (
          SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
          FROM du GROUP BY 1)
        SELECT d.day, d.dau, w.wau,
               FLOOR(d.dau * 1000000 / w.wau) / 1000000.0 AS stickiness
        FROM dau d JOIN wau w ON d.day = w.day""",
    "q_win_rolling_corr": f"""
        WITH daily AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 CAST(COALESCE(SUM(CASE WHEN event_type = 'click'
                                        THEN CAST(value AS DECIMAL(12,2))
                                   END), 0) AS DECIMAL(18,2)) AS c,
                 CAST(COALESCE(SUM(CASE WHEN event_type = 'view'
                                        THEN CAST(value AS DECIMAL(12,2))
                                   END), 0) AS DECIMAL(18,2)) AS v
          FROM events GROUP BY 1),
        r AS (
          SELECT day,
                 ROW_NUMBER() OVER wo AS rn,
                 CAST(COUNT(*) OVER w AS DOUBLE) AS n,
                 CAST(SUM(c) OVER w AS DOUBLE) AS sx,
                 CAST(SUM(v) OVER w AS DOUBLE) AS sy,
                 CAST(SUM(c * c) OVER w AS DOUBLE) AS sxx,
                 CAST(SUM(v * v) OVER w AS DOUBLE) AS syy,
                 CAST(SUM(c * v) OVER w AS DOUBLE) AS sxy
          FROM daily
          WINDOW wo AS (ORDER BY day),
                 w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
                       AND CURRENT ROW))
        SELECT day, CAST(n AS INTEGER) AS n_days,
               CASE WHEN (n * sxx - sx * sx) <= 0
                      OR (n * syy - sy * sy) <= 0 THEN NULL
                    ELSE ROUND((n * sxy - sx * sy)
                         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                         + {EPS}, 6) END AS rolling_corr
        FROM r WHERE rn >= 7""",
    "q_ts_session_attach": f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR date_diff('microsecond', LAG(ts) OVER w, ts)
                           > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts, event_id,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged)
        SELECT event_id, user_id, session_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                     ORDER BY ts, event_id) AS INTEGER)
                 AS event_in_session
        FROM s""",
    "q_ts_cohort_ltv": """
        WITH cohort AS (
          SELECT user_id,
                 CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
          FROM events WHERE event_type = 'signup' GROUP BY 1),
        daily AS (
          SELECT c.cohort_day,
                 datediff('day', c.cohort_day,
                          CAST(date_trunc('day', e.ts) AS TIMESTAMP))
                   AS age_days,
                 CAST(COUNT(*) AS BIGINT) AS n_purchases,
                 SUM(CAST(e.value AS DECIMAL(12,2))) AS rev
          FROM events e JOIN cohort c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND datediff('day', c.cohort_day,
                         CAST(date_trunc('day', e.ts) AS TIMESTAMP)) >= 0
          GROUP BY 1, 2)
        SELECT cohort_day,
               CAST(age_days AS INTEGER) AS age_days,
               n_purchases,
               CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
               CAST(ROUND(SUM(rev) OVER (PARTITION BY cohort_day
                                         ORDER BY age_days
                                         ROWS UNBOUNDED PRECEDING), 2)
                    AS DOUBLE) AS cum_revenue
        FROM daily""",
    "q_ts_user_paths": """
        WITH r AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        p AS (
          SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 3 GROUP BY 1)
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM p GROUP BY 1""",
    "q_ts_acf": f"""
        WITH daily AS (
          SELECT event_type,
                 date_trunc('day', ts) AS day,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2))
                   AS x
          FROM events GROUP BY 1, 2),
        lagged AS (
          SELECT event_type, x,
                 {_ACF_LAG_COLS}
          FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        stacked AS (
          {_ACF_LAG_STACK}),
        agg AS (
          SELECT event_type, lag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(x) AS DOUBLE) AS sx,
                 CAST(SUM(xl) AS DOUBLE) AS sy,
                 CAST(SUM(x * x) AS DOUBLE) AS sxx,
                 CAST(SUM(xl * xl) AS DOUBLE) AS syy,
                 CAST(SUM(x * xl) AS DOUBLE) AS sxy
          FROM stacked GROUP BY 1, 2)
        SELECT event_type,
               CAST(lag AS INTEGER) AS lag,
               CAST(n AS BIGINT) AS n_pairs,
               CASE WHEN (n * sxx - sx * sx) <= 0
                      OR (n * syy - sy * sy) <= 0 THEN NULL
                    ELSE ROUND((n * sxy - sx * sy)
                         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                         + {EPS}, 6) END AS acf
        FROM agg""",
    "q_ts_max_gap": """
        WITH g AS (
          SELECT user_id, ts, event_id,
                 LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS pts
          FROM events),
        g2 AS (SELECT * FROM g WHERE pts IS NOT NULL),
        r AS (
          SELECT user_id, ts, event_id, pts,
                 epoch_us(ts) - epoch_us(pts) AS gap_us,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_pairs,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY (epoch_us(ts) - epoch_us(pts)) DESC,
                              epoch_us(pts) DESC, event_id DESC) AS rn
          FROM g2)
        SELECT user_id,
               n_pairs + 1 AS n_events,
               CAST(FLOOR(gap_us / 1000000) AS BIGINT) AS max_gap_seconds,
               pts AS gap_start,
               ts AS gap_end
        FROM r WHERE rn = 1""",
    "q_ts_holt": f"""
        WITH wt(k, ws, wb, i0, i1) AS (VALUES
          {_HOLT_VALUES}),
        daily AS (
          SELECT event_type,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                       / COUNT(value) + {EPS}, 6) AS x
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, day, x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY day) - 1 AS t
          FROM daily),
        x0 AS (SELECT event_type, x AS x0 FROM idx WHERE t = 0),
        contrib AS (
          SELECT i.event_type, i.t + w.k AS tt,
                 SUM(CAST(FLOOR(w.ws * i.x * 1000000 + {EPS}) AS BIGINT))
                   AS ss,
                 SUM(CAST(FLOOR(w.wb * i.x * 1000000 + {EPS}) AS BIGINT))
                   AS bs
          FROM idx i CROSS JOIN wt w WHERE i.t >= 1 GROUP BY 1, 2),
        init AS (
          SELECT x0.event_type, w.k AS tt,
                 CAST(FLOOR(w.i0 * x0.x0 * 1000000 + {EPS}) AS BIGINT)
                   AS si,
                 CAST(FLOOR(w.i1 * x0.x0 * 1000000 + {EPS}) AS BIGINT)
                   AS bi
          FROM wt w CROSS JOIN x0)
        SELECT i.event_type, i.day, i.x,
               (COALESCE(c.ss, 0) + COALESCE(n.si, 0)) / 1000000.0 AS level,
               (COALESCE(c.bs, 0) + COALESCE(n.bi, 0)) / 1000000.0 AS trend,
               ROUND((COALESCE(c.ss, 0) + COALESCE(n.si, 0)) / 1000000.0
                     + (COALESCE(c.bs, 0) + COALESCE(n.bi, 0)) / 1000000.0
                     + {EPS}, 6) AS forecast_next
        FROM idx i
        LEFT JOIN contrib c ON c.event_type = i.event_type AND c.tt = i.t
        LEFT JOIN init n ON n.event_type = i.event_type AND n.tt = i.t""",
    "q_ts_downsample_triangle": f"""
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS h,
                 SUM(CAST(value AS DECIMAL(12,2))) AS y
          FROM events GROUP BY 1),
        pts AS (
          SELECT h, y,
                 CAST((epoch_us(h) - (SELECT epoch_us(MIN(h)) FROM hourly))
                      / 3600000000 AS BIGINT) AS x
          FROM hourly),
        pb AS (
          SELECT h, y, x, x // {_LTTB_BUCKET} AS b FROM pts),
        bm AS (
          SELECT b, CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mx,
                 CAST(SUM(y) AS DOUBLE) / COUNT(*) AS my
          FROM pb GROUP BY b),
        j AS (
          SELECT p.b, p.h, p.y, p.x,
                 ABS((prev.mx - nxt.mx)
                       * (CAST(p.y AS DOUBLE) - prev.my)
                     - (prev.mx - CAST(p.x AS DOUBLE))
                       * (nxt.my - prev.my)) AS area
          FROM pb p
          JOIN bm prev ON prev.b = p.b - 1
          JOIN bm nxt ON nxt.b = p.b + 1),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY b
                     ORDER BY area DESC, x ASC) AS rn
          FROM j)
        SELECT b AS bucket,
               CAST(h AS TIMESTAMP) AS sel_hour,
               CAST(ROUND(y, 2) AS DOUBLE) AS sel_value,
               FLOOR(area * 1000000 + {EPS}) / 1000000.0 AS tri_area
        FROM ranked WHERE rn = 1""",
    "q_ts_seasonality": f"""
        WITH daily AS (
          SELECT event_type,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 SUM(CAST(value AS DECIMAL(12,2))) AS s
          FROM events GROUP BY 1, 2),
        prof AS (
          SELECT event_type,
                 CAST(isodow(day) - 1 AS INT) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 FLOOR(CAST(SUM(s) AS DOUBLE) * 100 / COUNT(*)) / 100.0
                   AS avg_day_total
          FROM daily GROUP BY 1, 2)
        SELECT event_type, dow, n_days, avg_day_total,
               FLOOR(avg_day_total
                     / SUM(avg_day_total) OVER (PARTITION BY event_type)
                     * 1000000 + {EPS}) / 1000000.0 AS dow_share
        FROM prof""",
    "q_ts_concurrency": f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR date_diff('microsecond', LAG(ts) OVER w, ts)
                           > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess_rows AS (
          SELECT user_id, ts,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged),
        s AS (
          SELECT user_id, session_id,
                 MIN(ts) AS session_start, MAX(ts) AS session_end
          FROM sess_rows GROUP BY 1, 2),
        pts AS (
          SELECT session_start AS t, 1 AS delta, user_id, session_id FROM s
          UNION ALL
          SELECT session_end AS t, -1 AS delta, user_id, session_id FROM s),
        swept AS (
          SELECT t, SUM(delta) OVER (ORDER BY t, delta, user_id, session_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS concurrency
          FROM pts)
        SELECT date_trunc('hour', t) AS hour,
               CAST(MAX(concurrency) AS BIGINT) AS max_concurrent,
               CAST(COUNT(*) AS BIGINT) AS n_changes
        FROM swept GROUP BY 1""",
    "q_ts_forecast_snaive": f"""
        WITH daily AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 SUM(CAST(value AS DECIMAL(12,2))) AS s
          FROM events GROUP BY 1, 2),
        scored AS (
          SELECT event_type, day, s,
                 lag(s, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
          FROM daily),
        t AS (
          SELECT event_type, s, ABS(s - f) AS err,
                 CAST(FLOOR(CAST(ABS(s - f) AS DOUBLE) / CAST(s AS DOUBLE)
                            * 1000000 + {EPS}) AS BIGINT) AS ape_e6
          FROM scored WHERE f IS NOT NULL)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days_scored,
               FLOOR(CAST(SUM(err) AS DOUBLE) * 100 / COUNT(*)) / 100.0
                 AS mae,
               ROUND(SUM(ape_e6) / 1000000.0 / COUNT(*) + {EPS}, 6) AS mape
        FROM t GROUP BY event_type""",
    "q_ts_cusum": """
        WITH daily AS (
          SELECT event_type,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 SUM(CAST(value AS DECIMAL(12,2))) AS s
          FROM events GROUP BY 1, 2),
        drift AS (
          SELECT event_type,
                 CAST(FLOOR(CAST(SUM(s) AS DOUBLE) * 100 / COUNT(*))
                      / 100.0 AS DECIMAL(18,2)) AS k
          FROM daily GROUP BY 1),
        cums AS (
          SELECT d.event_type, d.day, d.s, dr.k,
                 SUM(d.s - dr.k) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM daily d JOIN drift dr ON d.event_type = dr.event_type),
        acc AS (
          SELECT event_type, day, s, k, cum,
                 MIN(cum) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS runmin
          FROM cums)
        SELECT event_type, day,
               CAST(ROUND(s, 2) AS DOUBLE) AS day_sum,
               CAST(ROUND(k, 2) AS DOUBLE) AS drift_k,
               CAST(ROUND(cum - LEAST(runmin, CAST(0 AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS cusum,
               (cum - LEAST(runmin, CAST(0 AS DECIMAL(18,2)))) > k
                 AS is_burst
        FROM acc""",
    "q_ts_rollup_multigrain": f"""
        WITH g AS (
          SELECT date_trunc('month', ts) AS g_month,
                 date_trunc('day', ts) AS g_day,
                 date_trunc('hour', ts) AS g_hour,
                 value
          FROM events)
        SELECT CASE WHEN g_hour IS NOT NULL THEN 'hour'
                    WHEN g_day IS NOT NULL THEN 'day'
                    WHEN g_month IS NOT NULL THEN 'month'
                    ELSE 'total' END AS grain,
               COALESCE(g_hour, g_day, g_month) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {sql_dsum('value', 'sum_value')}
        FROM g GROUP BY ROLLUP (g_month, g_day, g_hour)""",
    "q_ts_mom_growth": f"""
        WITH m AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                   AS month,
                 {sql_dsum('o_totalprice', 'revenue')}
          FROM orders GROUP BY 1)
        SELECT month, revenue,
               ROUND((revenue - lag(revenue, 1) OVER w)
                     / lag(revenue, 1) OVER w * 100 + {EPS}, 4) AS mom_pct,
               ROUND((revenue - lag(revenue, 12) OVER w)
                     / lag(revenue, 12) OVER w * 100 + {EPS}, 4) AS yoy_pct
        FROM m WINDOW w AS (ORDER BY month)""",
    "q_ts_transitions": f"""
        WITH pairs AS (
          SELECT lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS from_type,
                 event_type AS to_type
          FROM events),
        m AS (
          SELECT from_type, to_type, COUNT(*) AS n_transitions
          FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n_transitions,
               ROUND(CAST(n_transitions AS DOUBLE)
                     / CAST(SUM(n_transitions)
                            OVER (PARTITION BY from_type) AS DOUBLE)
                     + {EPS}, 6) AS p_transition
        FROM m""",
    "q_ts_ewma": f"""
        WITH daily AS (
          SELECT event_type,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                       / COUNT(value) + {EPS}, 6) AS daily_avg
          FROM events GROUP BY 1, 2),
        idx AS (
          SELECT event_type, day, daily_avg,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY day) - 1 AS DOUBLE) AS d
          FROM daily),
        acc AS (
          SELECT event_type, day, daily_avg, d,
                 SUM(daily_avg * power(1.0 / {1.0 - _EWMA_ALPHA}, d))
                   OVER w AS a,
                 FIRST_VALUE(daily_avg) OVER w AS x0
          FROM idx
          WINDOW w AS (PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_type, day, daily_avg,
               ROUND(power({1.0 - _EWMA_ALPHA}, d)
                     * (x0 + {_EWMA_ALPHA} * (a - x0)) + {EPS}, 6) AS ewma
        FROM acc""",
    "q_ts_vwap": f"""
        WITH m AS (
          SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)
                   AS ship_month,
                 SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
          FROM lineitem GROUP BY 1)
        SELECT ship_month,
               ROUND(CAST(sp AS DOUBLE) / CAST(sq AS DOUBLE) + {EPS}, 6)
                 AS vwap,
               ROUND(CAST(SUM(sp) OVER w AS DOUBLE)
                     / CAST(SUM(sq) OVER w AS DOUBLE) + {EPS}, 6)
                 AS cum_vwap
        FROM m
        WINDOW w AS (ORDER BY ship_month
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_ts_attribution": f"""
        WITH carried AS (
          SELECT user_id, ts, event_id, event_type,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN event_id END IGNORE NULLS)
                   OVER w AS touch_event_id,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN event_type END IGNORE NULLS)
                   OVER w AS touch_type,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN ts END IGNORE NULLS)
                   OVER w AS touch_ts
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT event_id AS purchase_event_id, user_id,
               ts AS purchase_ts, touch_event_id, touch_type, touch_ts,
               (epoch_us(ts) - epoch_us(touch_ts)) // 1000000 AS gap_seconds
        FROM carried
        WHERE event_type = 'purchase'
          AND touch_ts IS NOT NULL
          AND epoch_us(ts) - epoch_us(touch_ts) <= {_ATTRIB_WINDOW_US}""",
    "q_ts_anomaly_zscore": f"""
        WITH t AS (
          SELECT event_id, user_id, ts, value,
                 COUNT(value) OVER w AS n,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                   AS sx,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))
                          * CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                   AS sxx
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL '1' HOUR PRECEDING
                       AND CURRENT ROW)),
        z AS (
          SELECT event_id, user_id, ts, value,
                 CAST(n AS BIGINT) AS n_window,
                 CASE WHEN n > 1 AND (sxx - sx * sx / n) / (n - 1) > 0
                      THEN ROUND((value - sx / n)
                                 / SQRT((sxx - sx * sx / n) / (n - 1))
                                 + {EPS}, 6)
                 END AS zscore
          FROM t)
        SELECT event_id, user_id, ts, value, n_window, zscore,
               ABS(COALESCE(zscore, 0.0)) > 2.0 AS is_anomaly
        FROM z""",
    "q_ts_interpolate": f"""
        WITH ranked AS (
          SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hb,
                 value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events),
        obs AS (
          SELECT user_id, hb, value AS v_obs FROM ranked WHERE rn = 1),
        grid AS (
          SELECT user_id,
                 unnest(generate_series(MIN(hb), MAX(hb),
                                        INTERVAL 1 HOUR)) AS hb
          FROM obs GROUP BY user_id),
        f AS (
          SELECT g.user_id, g.hb, o.v_obs,
                 LAST_VALUE(o.v_obs IGNORE NULLS) OVER wp AS vp,
                 LAST_VALUE(CASE WHEN o.v_obs IS NOT NULL THEN g.hb END
                            IGNORE NULLS) OVER wp AS tp,
                 FIRST_VALUE(o.v_obs IGNORE NULLS) OVER wn AS vn,
                 FIRST_VALUE(CASE WHEN o.v_obs IS NOT NULL THEN g.hb END
                             IGNORE NULLS) OVER wn AS tn
          FROM grid g
          LEFT JOIN obs o ON g.user_id = o.user_id AND g.hb = o.hb
          WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.hb
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY g.user_id ORDER BY g.hb
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT user_id, hb,
               {sql_fround(
                   "CASE WHEN v_obs IS NOT NULL THEN v_obs"
                   " ELSE vp + (vn - vp)"
                   " * (CAST(epoch_us(hb) - epoch_us(tp) AS DOUBLE)"
                   "    / CAST(epoch_us(tn) - epoch_us(tp) AS DOUBLE))"
                   " END", "v_interp")},
               (v_obs IS NOT NULL) AS is_observed
        FROM f""",
    "q_ts_ohlc": """
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               arg_min(value, event_id) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               arg_max(value, event_id) AS close,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2""",
    "q_ts_tumbling": f"""
        SELECT date_trunc('hour', ts) AS bucket_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {_SUM_VAL}
        FROM events GROUP BY 1""",
    "q_ts_sliding": f"""
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - k * INTERVAL '15 minutes' AS bucket_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {_SUM_VAL}
        FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k)
        GROUP BY 1""",
    "q_ts_bounce_rate": f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR date_diff('microsecond', LAG(ts) OVER w, ts)
                           > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, ts,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged),
        s AS (
          SELECT user_id, session_id, MIN(ts) AS session_start,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM sessions GROUP BY 1, 2),
        d AS (
          SELECT CAST(date_trunc('day', session_start) AS TIMESTAMP) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_sessions,
                 CAST(COUNT(*) FILTER (n_events = 1) AS BIGINT) AS n_bounces
          FROM s GROUP BY 1)
        SELECT day, n_sessions, n_bounces,
               FLOOR(n_bounces * 1000000 / n_sessions) / 1000000.0
                 AS bounce_rate
        FROM d""",
    "q_ts_sessionize": f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR date_diff('microsecond', LAG(ts) OVER w, ts)
                           > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, ts, value,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged)
        SELECT user_id, session_id,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {_SUM_VAL}
        FROM sessions GROUP BY user_id, session_id""",
    "q_ts_funnel": """
        WITH v AS (
          SELECT user_id, MIN(ts) AS v_ts FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, v.v_ts, MIN(e.ts) AS c_ts
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts
          GROUP BY e.user_id, v.v_ts),
        p AS (
          SELECT e.user_id, c.v_ts, c.c_ts, MIN(e.ts) AS p_ts
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
          GROUP BY e.user_id, c.v_ts, c.c_ts)
        SELECT user_id, v_ts, c_ts, p_ts FROM p
        WHERE p_ts <= v_ts + INTERVAL '24 hours'""",
    "q_ts_retention": """
        WITH cohort AS (
          SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP)
                   AS cohort_day
          FROM events WHERE event_type = 'signup' GROUP BY user_id)
        SELECT cohort_day,
               CAST(date_diff('day', cohort_day, date_trunc('day', e.ts))
                    AS INTEGER) AS day_offset,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM events e JOIN cohort USING (user_id)
        WHERE date_diff('day', cohort_day, date_trunc('day', e.ts)) >= 0
        GROUP BY 1, 2""",
    "q_ts_gap_fill": """
        WITH bounds AS (
          SELECT date_trunc('day', MIN(ts)) AS d0,
                 date_trunc('day', MAX(ts)) AS d1
          FROM events),
        days AS (
          SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
          FROM bounds),
        counts AS (
          SELECT date_trunc('day', ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1)
        SELECT day, COALESCE(n, 0) AS n_events
        FROM days LEFT JOIN counts USING (day)""",
}
