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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpe.common import (
    EPS,
    davg,
    dec,
    dsum,
    fround,
    ntz,
    sql_davg,
    sql_dec,
    sql_dsum,
    sql_fround,
    umicros,
)
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


# ---------------------------------------------------------------------------
# §2.2 Projection / filter / predicates
# ---------------------------------------------------------------------------


def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: revenue = price*(1-disc), decimal-exact round."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(revenue, 2).cast("double").alias("revenue"),
        F.round(dec("l_extendedprice") * dec("l_tax"), 2)
        .cast("double")
        .alias("tax_amount"),
    )


def q_filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped conjunctive predicate; returns qualifying rows.

    All three predicates push down to the parquet scan (row-group skipping
    on l_shipdate min/max at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")


def q_filter_disj_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag").isin("A", "R")) | (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        (F.col("p_type").like("PROMO%")) & (F.col("p_name").contains("a"))
    ).select("p_partkey", "p_name", "p_type")


def q_filter_between_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").between(
            F.lit("1997-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")


def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiering + coalesce/nullif coverage."""
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return o.select(
        "o_orderkey",
        tier.alias("price_tier"),
        # nullif→coalesce round-trip: 'F' status maps to fallback
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit("final"))
        .alias("status_label"),
    )


# ---------------------------------------------------------------------------
# §2.3 Joins (equi)
# ---------------------------------------------------------------------------


def q_join_inner_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer with an explicit broadcast hint on the dim side.

    At 100 TB: customer is the small side of a star join — broadcasting it
    avoids shuffling the orders fact entirely (verified BroadcastHashJoin in
    tests/test_explain.py)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")


def q_join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders fact-fact join — no hint: Spark picks sort-merge,
    AQE may convert to broadcast at small sf. Both keys cluster by orderkey
    so the shuffle is the minimal co-partitioning exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderdate", "o_orderpriority"
    )


def q_join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation for ASIA customers.

    lineitem ⋈ orders (shuffle) then broadcast dims customer/nation/region.
    One big-table scan, one fact shuffle, rest map-side — the canonical
    star-join plan at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy("n_name")
    )


def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customers with their order counts including zero."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over a partially-overlapping derived pair: per-customer
    order counts in 1995 vs 1996. Null-free output via coalesce for
    cross-engine dtype stability."""
    o = load_table(spark, sf_dir, "orders")
    y95 = (
        o.filter(F.year("o_orderdate") == 1995)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_1995"))
    )
    y96 = (
        o.filter(F.year("o_orderdate") == 1996)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_1996"))
    )
    # USING-column full join: Spark emits o_custkey pre-coalesced across sides
    return y95.join(y96, "o_custkey", "full").select(
        F.col("o_custkey").alias("custkey"),
        F.coalesce("n_1995", F.lit(0)).alias("n_1995"),
        F.coalesce("n_1996", F.lit(0)).alias("n_1996"),
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having ≥1 URGENT order (left semi — no row multiplication,
    the build side only carries the key at scale)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no order above 400000."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_join_cross_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-small cartesian: region × nation (25×5 rows)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join: pairs of same-user events ≤ 5 minutes apart.

    The user_id equality makes this an equi-join with a residual range
    filter — Spark plans SortMergeJoin on user_id, so the cartesian blow-up
    is bounded per user, never global. (event_id order == ts order in this
    data; the range predicate is the semantic guard.)"""
    ev = load_table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    diff = umicros(F.col("b.ts")) - umicros(F.col("a.ts"))
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (diff >= 0)
            & (diff <= 300_000_000),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("a_id"),
            F.col("b.event_id").alias("b_id"),
            diff.alias("micros_apart"),
        )
    )


def q_join_theta_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same ≤-5-minute same-user pair set as q_join_theta_range,
    computed through TIME-BUCKET DECOMPOSITION — the scalable range-join
    pattern for when the band predicate has no (or a low-selectivity)
    equi component: bucket both sides into band-width windows, equi-join
    on (key, bucket) with the left side expanded to {b, b+1}, then apply
    the exact predicate as a residual filter.

    Every qualifying pair (0 ≤ Δt ≤ W) satisfies bucket(b) ∈
    {bucket(a), bucket(a)+1} when the bucket width equals the band W —
    EXACT recall, no missed pairs (same argument as the containment
    prefix filter). Shares q_join_theta_range's oracle: hash-equality
    proves the decomposition is lossless.

    Scale notes (100 TB): the naive theta join relies on the user_id
    equi key to bound the per-key cartesian; with millions of events per
    user (or no user key at all) the (key, bucket) join bounds every
    reducer by the events-per-bucket instead — the 2× replication of
    the probe side is the whole cost, and the bucket count grows with
    the time span, not the data."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    W = 300_000_000  # 5 minutes in µs == the bucket width
    a = ev.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.explode(
            F.array(
                (umicros("ts") / W).cast("long"),
                (umicros("ts") / W).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    b = ev.select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        (umicros("ts") / W).cast("long").alias("bucket"),
    )
    diff = umicros(F.col("b_ts")) - umicros(F.col("a_ts"))
    return (
        a.join(b, ["user_id", "bucket"])
        .filter(
            (F.col("a_id") < F.col("b_id")) & (diff >= 0) & (diff <= W)
        )
        .select(
            "user_id",
            "a_id",
            "b_id",
            diff.alias("micros_apart"),
        )
    )


# the bloom filter: m bits in m/64 longs, _BLOOM_K md5-derived positions
# per key (md5, not xxhash64 — the oracle needs the same membership
# decisions and DuckDB has no xxhash64)
_BLOOM_BITS = 1 << 16
_BLOOM_K = 3


def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning — the pattern that avoids shuffling a
    100 TB fact for a selective dim-filtered join: build an m-bit Bloom
    filter over the qualifying dim keys (AUTOMOBILE-segment customers),
    broadcast the BITMAP (1 row, m/64 longs), pre-filter the fact
    MAP-SIDE (zero shuffle — false positives only, never false
    negatives), then remove the false positives with an exact broadcast
    semi join over the tiny survivor set. Output = revenue profile of
    the qualifying orders per priority.

    The oracle is the PLAIN semi-join aggregate: hash-equality proves
    the bloom pass is a pure (lossless) pre-filter. Membership bits are
    md5-derived on both engines, but correctness needs no cross-engine
    bit agreement — the exact verify decides the final set.

    Scale notes (100 TB): Spark's own runtime row-filtering
    (InjectRuntimeFilter) does this transparently for shuffle joins;
    the explicit operator is for when the verify side must stay
    broadcast (billion-row fact, thousand-row qualifying dim) or the
    filter is reused across queries (write the bitmap once, prefilter
    many scans)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    nwords = _BLOOM_BITS // 64

    def positions(col):
        # k md5-derived bit positions per key (deterministic, portable)
        return [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("|", F.lit(i), col)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(_BLOOM_BITS),
            )
            for i in range(_BLOOM_K)
        ]

    bits = dim.select(
        F.explode(F.array(*positions(F.col("c_custkey")))).alias("pos")
    )
    words = (
        bits.groupBy((F.col("pos") / 64).cast("int").alias("word"))
        .agg(
            F.bit_or(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
                )
            ).alias("mask")
        )
    )
    # assemble the bitmap as ONE array<long> row: missing words → 0
    bitmap = words.agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(nwords - 1)),
            lambda i: F.coalesce(
                F.element_at(
                    F.map_from_entries(
                        F.collect_list(F.struct("word", "mask"))
                    ),
                    i.cast("int"),
                ),
                F.lit(0).cast("long"),
            ),
        ).alias("_bloom")
    )
    probed = o.crossJoin(F.broadcast(bitmap))
    for i, p in enumerate(positions(F.col("o_custkey"))):
        probed = probed.withColumn(f"_p{i}", p)
    hit = None
    for i in range(_BLOOM_K):
        test = F.expr(
            f"(element_at(_bloom, CAST(_p{i} / 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 64 AS INT)))"
            " != 0"
        )
        hit = test if hit is None else (hit & test)
    survivors = probed.filter(hit).select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    exact = survivors.join(
        F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"), "semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(dec("o_totalprice")), 2)
        .cast("double")
        .alias("total_price"),
    )


def q_join_fuzzy_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy self-join: per supplier, its COMPLETE edit-distance-<=2
    neighborhood (count at distance 1 and 2, plus the nearest neighbor
    with deterministic (dist, suppkey) tie-break).

    Plan: triangle (bucket-pair) self-join. Each row hashes to one of
    _FUZZ_P buckets; every unordered bucket pair (u, v), u <= v, becomes
    one join key, so the verify work spreads evenly over
    _FUZZ_P*(_FUZZ_P+1)/2 keys with ~2n/_FUZZ_P rows each (~5% of rows
    at the default) and NO single hot reducer. Pairs are verified once
    (ka < kb) and mirrored afterwards.

    Why not a pruning block: on this corpus the TRUE lev<=2 output is
    >50% of ALL pairs (names differ only in a few trailing digits), so
    candidate volume is output-bound — any complete candidate scheme,
    including the symmetric-delete (FastSS/SymSpell) variant join we
    measured first, generates all-pairs-order candidates but with MORE
    overhead (172x row expansion + distinct). Round 1's 15-char-prefix
    block was the opposite failure: one degenerate block = the whole
    quadratic on ONE task. The triangle join keeps the inherent O(n^2)
    but makes it embarrassingly parallel; at 100 TB with a DIVERSE name
    corpus (sparse true neighborhood) the symmetric-delete variant join
    becomes the right plan — see q_dedup_ngram_jaccard for the
    sparse-output inverted-index pattern. The nearest neighbor travels
    as one composite integer dist*1e6+key so min() stays a plain
    partial-aggregable MIN."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.pmod(F.xxhash64("s_suppkey"), F.lit(_FUZZ_P)).cast("int").alias("bkt"),
    )
    left = s.select(
        F.col("s_suppkey").alias("ka"),
        F.col("s_name").alias("na"),
        F.col("bkt").alias("p1"),
        F.explode(F.sequence(F.col("bkt"), F.lit(_FUZZ_P - 1))).alias("p2"),
    )
    right = s.select(
        F.col("s_suppkey").alias("kb"),
        F.col("s_name").alias("nb"),
        F.explode(F.sequence(F.lit(0), F.col("bkt"))).alias("p1"),
        F.col("bkt").alias("p2"),
    )
    d = F.levenshtein(F.col("na"), F.col("nb"))
    ver = (
        left.join(right, ["p1", "p2"])
        # each unordered pair must survive exactly ONCE: cross-bucket
        # pairs already appear under a single (u,v) key (any orientation —
        # the mirror below restores symmetry); the same-bucket key carries
        # the full bucket cross product, so it alone needs ka<kb
        .filter((F.col("p1") != F.col("p2")) | (F.col("ka") < F.col("kb")))
        # free pre-filter: lev(a,b) >= |len(a)-len(b)|, so this prunes
        # without touching semantics (matters on length-diverse corpora)
        .filter(F.abs(F.length("na") - F.length("nb")) <= 2)
        .withColumn("d", d)
        .filter(F.col("d") <= 2)
        .select("ka", "kb", "d")
    )
    # mirror with a map-side explode (a unionByName of two selects would
    # evaluate the whole triangle-join pipeline twice)
    sym = ver.select(
        F.explode(
            F.array(
                F.struct(F.col("ka"), F.col("kb")),
                F.struct(F.col("kb").alias("ka"), F.col("ka").alias("kb")),
            )
        ).alias("e"),
        "d",
    ).select("e.ka", "e.kb", "d")
    return (
        sym.groupBy(F.col("ka").alias("s_suppkey"))
        .agg(
            F.count(F.when(F.col("d") == 1, 1)).alias("n_dist1"),
            F.count(F.when(F.col("d") == 2, 1)).alias("n_dist2"),
            F.min(F.col("d").cast("long") * 1_000_000 + F.col("kb")).alias(
                "mk"
            ),
        )
        .select(
            "s_suppkey",
            "n_dist1",
            "n_dist2",
            (F.col("mk") % 1_000_000).cast("bigint").alias("nearest_id"),
            F.expr("CAST(mk DIV 1000000 AS INT)").alias("nearest_dist"),
        )
    )


_FUZZ_P = 40


_SALT_N = 8


def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim equi-join — the skew-mitigation pattern, made a
    first-class operator so its result is provably identical to the plain
    join (the oracle IS the plain join).

    The fact side (lineitem) gets a deterministic salt in [0, 8) from
    l_linenumber; the dim side (orders) is replicated 8× via an exploded
    sequence; the join key becomes (orderkey, salt), splitting any hot
    orderkey's rows across 8 reducers. Aggregation after the join is
    unchanged — salting only re-shards the shuffle. At 100 TB this is the
    manual fallback when AQE skew-join can't help (e.g. the skewed side
    feeds a window, or the join is the first of a chained pipeline whose
    partitioning must stay stable); salt count scales with the observed
    hot-key factor. Result: per-priority quantity totals."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", (F.col("l_linenumber") % _SALT_N).cast("int")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1)))
        )
        .withColumn("salt", F.col("salt").cast("int"))
    )
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == o["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(
            dsum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each customer's most frequent order
    priority, ties broken by priority ASC (native mode() is
    tie-nondeterministic in both engines, so both sides use the same
    count-then-argmax rewrite — two shuffles on (custkey[, priority]),
    both partial-aggregable; the window partition is the groupBy key so
    it reuses the aggregate's partitioning)."""
    c = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("cnt").desc(), F.col("o_orderpriority").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join: for each purchase, the latest view of the same
    user with v.ts <= p.ts (DuckDB ASOF JOIN `>=` semantics mirrored).

    Spark has no native ASOF; rather than a join + per-key max (which
    re-shuffles the matched pairs), we use the union-scan formulation:
    one pass over events per user ordered by time, carrying the last seen
    view via last(ignorenulls) — a single shuffle on user_id, O(n) state,
    no row multiplication. This is the 100 TB-safe shape."""
    ev = load_table(spark, sf_dir, "events")
    is_view = F.col("event_type") == "view"
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("v_event_id"),
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("v_ts"),
    )
    return (
        carried.filter(
            (F.col("event_type") == "purchase") & F.col("v_event_id").isNotNull()
        )
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            "v_event_id",
            "v_ts",
        )
    )


_ASOF_TOL_US = 3_600_000_000  # 1 hour


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT as-of join with a match tolerance (the TimescaleDB/kdb asof
    flavor): every purchase appears; its latest same-user view within 1
    hour attaches, else the match columns are NULL. Same single-pass
    union-scan shape as q_join_asof (one shuffle on user_id, O(1) state
    per row, no row multiplication); the tolerance is a post-carry
    predicate, so the 100 TB profile is unchanged. Oracle: DuckDB ASOF
    LEFT JOIN + the same tolerance CASE."""
    ev = load_table(spark, sf_dir, "events")
    is_view = F.col("event_type") == "view"
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("cv_id"),
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("cv_ts"),
    )
    gap = umicros(F.col("ts")) - umicros(F.col("cv_ts"))
    in_tol = F.col("cv_id").isNotNull() & (gap <= F.lit(_ASOF_TOL_US))
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.when(in_tol, F.col("cv_id")).alias("v_event_id"),
        F.when(in_tol, F.col("cv_ts")).alias("v_ts"),
        F.when(in_tol, gap).alias("gap_us"),
    )


def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: events against a derived calendar-day
    interval table [day, day+1). The interval table is tiny (≤31 rows) →
    broadcast nested-loop is the right plan and stays right at 100 TB
    (intervals grow with time span, not data volume)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        ntz(F.date_trunc("day", F.min("ts"))).alias("d0"),
        ntz(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias(
            "day_start"
        )
    ).withColumn("day_end", F.col("day_start") + F.expr("INTERVAL 1 DAY"))
    return (
        F.broadcast(days)
        .join(ev, (ev.ts >= days.day_start) & (ev.ts < days.day_end))
        .groupBy("day_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregation (basics)
# ---------------------------------------------------------------------------


def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregates over lineitem revenue — no grouping, partial
    aggregation reduces each partition to one row before the single-row
    final combine."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return li.agg(
        F.round(F.sum(revenue), 2).cast("double").alias("total_revenue"),
        davg("l_quantity", "avg_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via percentile_approx (Greenwald-Khanna
    sketch) with an IN-QUERY accuracy audit (VERDICT r3 #7, graduating the
    key from rows-only to a full SQL oracle): raw sketch values differ
    across engines by design, so the DECLARED columns are the
    engine-independent facts — the exact disc quantiles (value at rank
    ceil(q·n), no interpolation) and a boolean per percentile asserting the
    engine's own sketch landed within rank tolerance (rank(approx)/n within
    [0.45, 0.55] for the median; ≥ 0.985 for p99 — generous vs the 1/1000
    G-K guarantee and DuckDB's t-digest, measured ~5e-4 both engines).
    Both engines audit their own sketch against their own data, so the
    flags (and hence hashes) agree exactly while still failing loudly on a
    broken sketch. At 100 TB the sketch is the only viable quantile path
    (exact percentile sorts per group) — and this shape is also how you'd
    monitor it in production: sketch + exact on a sampled audit slice."""
    from pyspark.sql import Window

    from gpe.common import persist_tracked, two_pass_parts

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("_am"),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(1000)).alias(
            "_ap99"
        ),
    )
    # rank audit: how many rows each approx value dominates (one broadcast
    # join + re-aggregate; counts are integers → engine-identical). The p99
    # bound is TWO-SIDED (ADVICE r4): <= counts floor it at 0.985·n, and
    # the strict-< count caps it at 0.995·n — with < (not <=) so a heavily
    # tied true p99 value can't trip the upper bound, while a sketch that
    # returns e.g. the group max still fails loudly.
    checks = (
        li.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_am"), 1).otherwise(0)
            ).alias("_rk_med"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("_ap99"), 1).otherwise(0)
            ).alias("_rk_p99"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("_ap99"), 1).otherwise(0)
            ).alias("_rk_p99_lt"),
        )
    )
    # exact disc quantiles: value at rank ceil(q·n) — picks an element of
    # the sorted multiset, so ties and float interpolation can't diverge.
    # TWO-PASS rank lookup (VERDICT r4 #5): a row_number() partitioned by
    # the 3-value flag funnels ~n/3 rows through single tasks — a
    # scale-killer at 100×. Instead: range-repartition on (flag, price),
    # rank locally per partition (task-bounded sorts), then per-flag
    # partition offsets from a count table whose own window is bounded by
    # the partition count — the same pattern as q_win_ntile_pctrank.
    part = li.repartitionByRange(
        two_pass_parts(spark), F.asc("l_returnflag"), F.asc("l_extendedprice")
    ).withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid", "l_returnflag").orderBy(
        "l_extendedprice"
    )
    # persist pass-1: it feeds the per-partition count table AND the rank
    # filter; without it the range shuffle evaluates twice
    loc = persist_tracked(part.withColumn("lrn", F.row_number().over(w_local)))
    cnts = loc.groupBy("pid", "l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_off = (
        Window.partitionBy("l_returnflag")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    )
    targets = (
        offs.groupBy("l_returnflag")
        .agg(F.sum("cnt").alias("n"))
        .select(
            "l_returnflag",
            F.ceil(F.col("n") * F.lit(0.5)).alias("_tmed"),
            F.ceil(F.col("n") * F.lit(0.99)).alias("_tp99"),
        )
    )
    g = (
        loc.join(
            F.broadcast(offs.select("pid", "l_returnflag", "off")),
            ["pid", "l_returnflag"],
        )
        .withColumn("grn", F.col("off") + F.col("lrn"))
        .join(F.broadcast(targets), "l_returnflag")
    )
    exacts = (
        g.filter((F.col("grn") == F.col("_tmed")) | (F.col("grn") == F.col("_tp99")))
        .groupBy("l_returnflag")
        .agg(
            F.max(
                F.when(F.col("grn") == F.col("_tmed"), F.col("l_extendedprice"))
            ).alias("exact_median"),
            F.max(
                F.when(F.col("grn") == F.col("_tp99"), F.col("l_extendedprice"))
            ).alias("exact_p99"),
        )
    )
    return (
        checks.join(exacts, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n_rows").cast("long").alias("n_rows"),
            "exact_median",
            "exact_p99",
            (
                (F.col("_rk_med") >= F.lit(0.45) * F.col("n_rows"))
                & (F.col("_rk_med") <= F.lit(0.55) * F.col("n_rows"))
            ).alias("median_bound_ok"),
            (
                (F.col("_rk_p99") >= F.lit(0.985) * F.col("n_rows"))
                & (F.col("_rk_p99_lt") <= F.lit(0.995) * F.col("n_rows"))
            ).alias("p99_bound_ok"),
        )
        .orderBy("l_returnflag")
    )


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch distinct with an IN-QUERY accuracy audit (VERDICT r3 #7,
    graduating from rows-only): sketch estimates differ across engines, so
    the declared columns are exact_users (exact distinct — the audit
    reference) and hll_bound_ok asserting the engine's own HLL estimate is
    within 6% relative error (3σ of rsd=0.02; DuckDB's HLL measured ≤1.1%
    on this corpus). One extra distinct-aggregate on the same shuffle; at
    100 TB you'd run the audit on a sampled slice and ship only the
    sketch."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.lit(0.06) * F.col("exact_users")
            ).alias("hll_bound_ok"),
        )
        .orderBy("event_type")
    )


def q_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates in one pass (Spark expands to a single
    shuffle with grouping-id replication — still one scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups filtered post-aggregation (HAVING). Filter applies to the
    exact decimal sum BEFORE rounding so both engines gate identically."""
    ev = load_table(spark, sf_dir, "events")
    summed = ev.groupBy("event_type").agg(F.sum(dec("value")).alias("_sv"))
    return (
        summed.filter(F.col("_sv") > 50000)
        .select(
            "event_type", F.round("_sv", 2).cast("double").alias("sum_value")
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# §2.6 Sort / limit / set ops
# ---------------------------------------------------------------------------


def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + limit → TakeOrderedAndProject (top-k without a full
    sort; each partition keeps 100 rows, driver merges). Unique tiebreak
    (l_orderkey, l_linenumber) makes the limit deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.desc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .limit(100)
    )


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mid = F.lit("2024-01-15 00:00:00").cast("timestamp")
    first = ev.filter(F.col("ts") < mid)
    second = ev.filter(F.col("ts") >= mid)
    return first.unionByName(second).select("event_id", "ts", "event_type")


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_name")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name"
    )
    return rich.union(building).distinct()


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return auto.intersect(urgent)


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys with no URGENT order. The subtrahend is a FILTERED order
    set: subtracting all orders (round 1-2 form) gave 0 rows at every sf
    (every customer has >=1 order), which made the oracle check vacuously
    satisfiable by any empty result."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return c.select(F.col("c_custkey").alias("custkey")).exceptAll(
        urgent.select(F.col("o_custkey").alias("custkey")).distinct()
    )


def q_distinct_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup primitive: distinct (event_type, user_id) pairs.
    Expressed as groupBy (deterministic) rather than dropDuplicates
    (keep-any) per SURVEY.md §5.3 rule 4."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type", "user_id").distinct()


# ---------------------------------------------------------------------------
# §2.4 Grouping extensions: rollup / cube / grouping sets / collect / stats
# ---------------------------------------------------------------------------


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (returnflag, linestatus) with ROLLUP subtotals; NULL
    subtotal keys relabeled 'ALL' (data itself is null-free)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(value) by CUBE(event_type, user_id % 10)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .cube("event_type", "user_bucket")
        .agg(
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("user_bucket", F.lit(-1)).alias("user_bucket"),
            "sum_value",
            "n_events",
        )
    )


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((returnflag), (linestatus), ()) — via the SQL
    surface with a parameterized table ref (no temp-view name collisions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS sum_qty
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        li=li,
    )


def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order: its line numbers collected, sorted, and serialized to a
    comma-joined STRING. The array is sorted for hash stability (§5.3
    rule 2) and string-serialized because the correctness harness
    canonicalizes rows via pandas, which cannot hash list cells — the
    string is a bijective encoding of the sorted int array."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.sort_array(F.collect_list("l_linenumber")), ",").alias(
            "line_numbers"
        )
    )


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag sample stddev of price + exact median of quantity.

    stddev via the closed form sqrt((Σx² − (Σx)²/n)/(n−1)) over EXACT decimal
    sums (x and x² both exact decimals) → the only float ops are the final
    IEEE-identical double arithmetic, so no engine drift — unlike native
    stddev_samp whose streaming accumulation differs per partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = F.sum(dec("l_extendedprice")).cast("double")
    sxx = F.sum(dec("l_extendedprice") * dec("l_extendedprice")).cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n_rows"),
            F.round(
                F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))) + EPS, 6
            ).alias("std_price"),
            F.median("l_quantity").alias("median_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Data-lake API surface extensions: pivot, subqueries, listagg, percentiles,
# pagination, histogram (round-1 additions, SURVEY.md §2.12)
# ---------------------------------------------------------------------------


def q_pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per year × order-status (fixed pivot values so
    the plan is static — at scale an unbounded pivot needs a two-pass
    distinct-values collect; a closed domain avoids it)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("yr", F.year("o_orderdate"))
        .groupBy("yr")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "yr",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
        .orderBy("yr")
    )


def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average total price (scalar subquery —
    Catalyst plans the aggregate once and broadcasts the scalar)."""
    o = load_table(spark, sf_dir, "orders")
    # exact-decimal sum → the threshold double is engine-identical (a raw
    # double AVG differs in its last bits per summation order, which could
    # flip membership for a price sitting exactly on the average)
    avg_price = o.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("ap")
    )
    return (
        o.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("ap"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's most expensive order (correlated-subquery shape,
    expressed as the decorrelated groupBy+join Catalyst would produce)."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.max("o_totalprice").alias("max_price")
    )
    return (
        o.join(
            mx,
            (o.o_custkey == mx.ck) & (o.o_totalprice == mx.max_price),
        )
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").alias("max_price"))
    )


def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted string aggregation per group (listagg/string_agg): nation
    names per region, comma-joined in alphabetical order (internal sort per
    §5.3 rule 2)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (p25/p50/p75) of order totalprice per
    status — linear interpolation over exact 2-decimal values is IEEE-
    identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.75)).alias("p75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


def q_agg_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized + trimmed mean of order value per priority (5%/95%
    discrete percentiles): the robust-location pair every metrics
    platform publishes next to the raw mean, since a handful of whale
    orders can move the plain average by percents. p05/p95 are
    percentile_disc (smallest value whose cumulative count reaches
    ceil(q·n)); winsorizing CLAMPS to the fences, trimming DROPS
    outside them.

    Determinism: everything is exact integer cents — the cumulative
    cut, both fences, the clamped/trimmed sums (decimal(38,0);
    HUGEINT oracle-side), and the means are exact integer DIV at e6
    fixed point. No float enters until the final display divisions.

    Scale notes (100 TB): groupBy (priority, cents) with map-side
    partials collapses the scan to distinct values per group; both
    cumulative windows run over that aggregate output
    (window-audit-bounded); the fences broadcast back onto the same
    aggregate, never onto raw rows. The two-pass shape of
    q_agg_percentiles applies unchanged if distinct values per group
    outgrow a partition."""
    o = load_table(spark, sf_dir, "orders")
    pv = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("v_cents"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.partitionBy("priority")
        .orderBy("v_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_g = Window.partitionBy("priority")
    cum = pv.select(
        "priority",
        "v_cents",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_g).alias("n"),
    )
    qs = cum.groupBy("priority", "n").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 19) DIV 20"), F.col("v_cents"))
        ).alias("p05_c"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("(19 * n + 19) DIV 20"),
                F.col("v_cents"),
            )
        ).alias("p95_c"),
    )

    def d38(col):
        return col.cast("decimal(38,0)")

    inside = (F.col("v_cents") >= F.col("p05_c")) & (
        F.col("v_cents") <= F.col("p95_c")
    )
    clamp = F.greatest(F.least(F.col("v_cents"), F.col("p95_c")), F.col("p05_c"))
    agg = (
        pv.join(F.broadcast(qs), "priority")
        .groupBy("priority", "n", "p05_c", "p95_c")
        .agg(
            F.sum(d38(clamp) * d38(F.col("cnt"))).alias("sw"),
            F.sum(
                F.when(inside, d38(F.col("v_cents")) * d38(F.col("cnt")))
            ).alias("st"),
            F.sum(F.when(inside, F.col("cnt"))).cast("long").alias("n_kept"),
        )
    )
    return agg.select(
        "priority",
        F.col("n").cast("long").alias("n_orders"),
        (F.col("p05_c") / F.lit(100.0)).alias("p05"),
        (F.col("p95_c") / F.lit(100.0)).alias("p95"),
        # Spark DIV truncates toward zero, DuckDB // floors — identical
        # here because order values are strictly positive (fixture
        # invariant); a signed-measure variant must floor explicitly
        (F.expr("(sw * 10000) DIV n") / F.lit(1_000_000.0)).alias(
            "mean_winsor"
        ),
        (F.expr("(st * 10000) DIV n_kept") / F.lit(1_000_000.0)).alias(
            "mean_trimmed"
        ),
        "n_kept",
    )


def q_agg_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-statistics outlier screen: per order status, the exact
    interquartile range and the Tukey-fence outlier counts
    (x < q1 − 1.5·IQR or x > q3 + 1.5·IQR) — the box-plot numbers every
    data-profiling endpoint serves, and the robust sibling of
    q_ts_anomaly_zscore's mean/σ flags.

    Determinism: q1/q3 are exact continuous percentiles over 2-decimal
    values (the q_agg_percentiles recipe — interpolation is the same IEEE
    expression in both engines), so the fences and the per-row compares
    see identical doubles. Scale notes (100 TB): one percentile aggregate
    (Spark's exact percentile is a single-shuffle sort-based aggregate
    per group), then one broadcast of the |status|-row fence table back
    onto the fact scan for the counts — two passes, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
        F.count(F.lit(1)).alias("n"),
    )
    fences = stats.select(
        "o_orderstatus",
        "n",
        "q1",
        "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("_lo"),
        (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("_hi"),
    )
    counts = (
        o.join(F.broadcast(fences.select("o_orderstatus", "_lo", "_hi")),
               "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.when(F.col("o_totalprice") < F.col("_lo"), 1)).alias(
                "n_low_outliers"
            ),
            F.count(F.when(F.col("o_totalprice") > F.col("_hi"), 1)).alias(
                "n_high_outliers"
            ),
        )
    )
    return fences.join(counts, "o_orderstatus").select(
        "o_orderstatus",
        "n",
        F.round(F.col("q1") + EPS, 2).alias("q1"),
        F.round(F.col("q3") + EPS, 2).alias("q3"),
        F.round(F.col("iqr") + EPS, 2).alias("iqr"),
        "n_low_outliers",
        "n_high_outliers",
    )


def q_agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample skewness and excess kurtosis of lineitem quantity per
    return flag — the 3rd/4th-moment distribution profile beside
    q_agg_stats and q_agg_corr_regr. Native skewness()/kurtosis()
    accumulate in doubles (partitioning-dependent, the q_agg_stats
    hazard), so both come from the four EXACT decimal power sums via the
    standard central-moment identities, combined in one closed-form IEEE
    expression identical in both engines.

    Scale notes (100 TB): one partial-agg shuffle of 5 numbers per group
    — the same profile as every co-moment key here."""
    li = load_table(spark, sf_dir, "lineitem")
    # tight DECIMAL(4,2): quantity ∈ [1, 50] with 2 decimals; the default
    # (12,2) cast would push q⁴ past precision 38 in both engines
    q = F.col("l_quantity").cast("decimal(4,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    n = F.col("n")
    m = F.col("s1") / n
    # central moments from raw power sums
    m2 = F.col("s2") / n - m * m
    m3 = F.col("s3") / n - F.lit(3.0) * m * F.col("s2") / n + F.lit(2.0) * m * m * m
    m4 = (
        F.col("s4") / n
        - F.lit(4.0) * m * F.col("s3") / n
        + F.lit(6.0) * m * m * F.col("s2") / n
        - F.lit(3.0) * m * m * m * m
    )
    # Zero-variance guard (VERDICT r7 #7): a constant column makes m2 = 0
    # and the moment ratios 0/0 — Spark's non-ANSI x/0 is NULL while
    # DuckDB's IEEE ops give NaN/inf. m2 is bit-identical across engines
    # (same IEEE expression over the same exact sums), so an exact
    # m2 <= 0 test pins NULL identically on both sides.
    g1 = F.when(m2 <= 0, F.lit(None).cast("double")).otherwise(
        F.round(m3 / F.sqrt(m2 * m2 * m2) + F.lit(EPS), 6)
    )
    g2 = F.when(m2 <= 0, F.lit(None).cast("double")).otherwise(
        F.round(m4 / (m2 * m2) - F.lit(3.0) + F.lit(EPS), 6)
    )
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        fround(m, "mean_qty", 4),
        g1.alias("skewness"),
        g2.alias("excess_kurtosis"),
    )


def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of order totalprice per status — the
    robust dispersion statistic (breakdown point 50% vs the standard
    deviation's 0%), completing the robust family beside q_agg_iqr_fences
    and the moving median.

    Two exact-percentile passes: median per group, broadcast back, then
    the median of |x − med|. Exact continuous percentiles over 2-decimal
    values interpolate with the same IEEE expression in both engines (the
    q_agg_percentiles recipe); |x − med| subtraction of exact values is
    exact. Scale notes (100 TB): two sort-based percentile aggregates
    (each one shuffle), one |status|-row broadcast between them."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("_med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = o.join(F.broadcast(med), "o_orderstatus").select(
        "o_orderstatus",
        "n",
        F.abs(F.col("o_totalprice") - F.col("_med")).alias("_ad"),
        F.col("_med"),
    )
    return dev.groupBy("o_orderstatus").agg(
        F.max("n").alias("n"),
        F.round(F.max("_med") + EPS, 2).alias("median_price"),
        F.round(F.percentile("_ad", F.lit(0.5)) + EPS, 2).alias("mad"),
    )


def q_agg_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-statistic of event `value` for every event
    type against the 'view' baseline — the A/B-comparison endpoint of an
    analytics API ("is this event type's value distribution different
    from baseline browsing"), including the Welch–Satterthwaite degrees
    of freedom.

    Determinism: per-type n/Σx/Σx² are EXACT decimal sums (order-free);
    means, variances, t, and df are one closed-form IEEE expression over
    those exact sums — identical in both engines — ε-rounded at the end
    (the q_agg_corr_regr recipe). Scale notes (100 TB): one partial-agg
    shuffle to |types| rows, a 1-row broadcast of the baseline, map-side
    arithmetic after that."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec("value")).cast("double").alias("sx"),
        F.sum(dec("value") * dec("value")).cast("double").alias("sxx"),
    )
    # Degenerate-group guard (ADVICE r7): a singleton group makes the
    # sample variance divide by n−1 = 0 (Spark NULL vs DuckDB NaN/inf) —
    # Welch's t is undefined there, so groups need n ≥ 2 on BOTH engines
    # (crafted-data test: tests/test_property_determinism.py).
    s = s.filter(F.col("n") >= 2)
    mean = F.col("sx") / F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - F.lit(1.0)
    )
    s = s.select("event_type", "n", mean.alias("m"), var.alias("v"))
    base = s.filter(F.col("event_type") == "view").select(
        F.col("n").alias("_n0"), F.col("m").alias("_m0"), F.col("v").alias("_v0")
    )
    # LEFT join onto the baseline (ADVICE r7): a missing/degenerate 'view'
    # baseline previously returned a silently-EMPTY frame (inner cross
    # join against zero rows); now every group still reports n and
    # mean_value with NULL t_stat/welch_df — visibly wrong beats silently
    # absent. Fixture data always carries the baseline, so the declared
    # output is unchanged.
    t = s.filter(F.col("event_type") != "view").join(
        F.broadcast(base), F.lit(True), "left"
    )
    se2 = F.col("v") / F.col("n") + F.col("_v0") / F.col("_n0")
    df_ws = (se2 * se2) / (
        (F.col("v") / F.col("n")) * (F.col("v") / F.col("n"))
        / (F.col("n") - F.lit(1.0))
        + (F.col("_v0") / F.col("_n0")) * (F.col("_v0") / F.col("_n0"))
        / (F.col("_n0") - F.lit(1.0))
    )
    return t.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        fround(F.col("m"), "mean_value"),
        fround((F.col("m") - F.col("_m0")) / F.sqrt(se2), "t_stat"),
        fround(df_ws, "welch_df", 2),
    )


def q_page_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-stable pagination (the data-lake API's list endpoint):
    ORDER BY unique key, rows 101-150. offset+limit compiles to a global
    sort bounded by limit+offset — fine for shallow pages; deep pagination
    at scale should switch to keyset predicates (WHERE key > last_seen)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .offset(100)
        .limit(50)
    )


def q_unpivot_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the per-year status counts of q_pivot_status_by_year
    folded back to long form — the wide↔long round trip every reporting
    API needs."""
    wide = q_pivot_status_by_year(spark, sf_dir)
    return wide.unpivot(
        ids=["yr"],
        values=["n_f", "n_o", "n_p"],
        variableColumnName="status_col",
        valueColumnName="n_orders",
    )


def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each nation's two most recent orders
    (per-row dependent subquery — Catalyst decorrelates to a ranked
    window, but the declared surface is the LATERAL form)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.o_orderdate
        FROM {n} n,
        LATERAL (
          SELECT o.o_orderkey, o.o_orderdate
          FROM {o} o JOIN {c} c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
          LIMIT 2
        ) t
        """,
        n=n,
        o=o,
        c=c,
    )


def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totalprice (50k buckets) — integer
    bucket arithmetic on exact values, the catalog's distribution-profile
    endpoint."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


def q_agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag correlation / simple linear regression of
    extendedprice on quantity (corr, covar_samp, regr_slope,
    regr_intercept).

    Built from the five EXACT decimal co-moment sums rather than the native
    streaming aggregates (corr/covar accumulate in doubles, so their result
    depends on partitioning — same hazard as stddev, see q_agg_stats). The
    decimal sums are order-independent; the closed-form combination is the
    identical IEEE double expression in both engines. At 100 TB the decimal
    sums still take the partial-aggregation fast path (one shuffle of 5
    numbers per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(dec("l_quantity")).cast("double")
    sy = F.sum(dec("l_extendedprice")).cast("double")
    sxx = F.sum(dec("l_quantity") * dec("l_quantity")).cast("double")
    syy = F.sum(dec("l_extendedprice") * dec("l_extendedprice")).cast("double")
    sxy = F.sum(dec("l_quantity") * dec("l_extendedprice")).cast("double")
    agg = li.groupBy("l_returnflag").agg(
        n.alias("n"), sx.alias("sx"), sy.alias("sy"),
        sxx.alias("sxx"), syy.alias("syy"), sxy.alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / denx
    return (
        agg.select(
            "l_returnflag",
            F.col("n").cast("bigint").alias("n_rows"),
            fround(num / F.sqrt(denx * deny), "corr_qty_price"),
            fround(num / (F.col("n") * (F.col("n") - F.lit(1.0))), "covar_samp", 4),
            fround(slope, "regr_slope"),
            fround((F.col("sy") - slope * F.col("sx")) / F.col("n"),
                   "regr_intercept", 4),
        )
        .orderBy("l_returnflag")
    )


def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate family over order keys: per status,
    bit_and/bit_or/bit_xor of the low 16 key bits, total popcount, and how
    many keys have any of the low 4 bits set. Pure integer arithmetic —
    deterministic everywhere; all aggregates partial-combine map-side."""
    o = load_table(spark, sf_dir, "orders")
    low16 = F.col("o_orderkey").bitwiseAND(F.lit(65535))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and(low16).alias("and16"),
            F.bit_or(low16).alias("or16"),
            F.bit_xor(low16).alias("xor16"),
            F.sum(F.bit_count("o_orderkey")).alias("popcount_total"),
            F.count(F.when(F.col("o_orderkey").bitwiseAND(F.lit(15)) != 0, 1))
            .alias("n_low4_set"),
            F.max(
                F.shiftleft(F.col("o_orderkey").bitwiseXOR(F.lit(255)), 2)
                .bitwiseAND(F.lit(1048575))
            ).alias("max_xor_shift"),
        )
        .orderBy("o_orderstatus")
    )


def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median (lower median: smallest price whose
    cumulative quantity reaches half the group total) of l_extendedprice
    weighted by l_quantity, per return flag — the inventory-valuation /
    fair-price statistic no engine ships as a builtin.

    Distributed as the two-pass range-partition pattern generalized to
    grouped cumulative sums: range-repartition on (flag, price, key) so
    each partition holds a contiguous slice of one-or-two flags' price
    range, aggregate per-partition weight totals, and locate the ONE
    crossing partition per flag from the broadcast offset table — only
    that partition's rows are then sorted for the local cumulative sum,
    so the scan-after-shuffle touches ~1/P of the data and no stage
    funnels a whole group through one task (a naive
    Window.partitionBy(flag) would: 3 flags → 3 tasks at any scale).
    The crossing test 2·cum ≥ total stays in EXACT decimal, so no
    threshold float ever crosses the oracle hash.

    Results are partition-count-invariant (same offset-table argument as
    gpe.common.two_pass_ntile; tests/test_two_pass_invariance.py)."""
    from gpe.common import persist_tracked, two_pass_parts

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        dec("l_quantity").alias("_q"),
        "l_orderkey",
        "l_linenumber",
    )
    order = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    part = persist_tracked(
        li.repartitionByRange(
            two_pass_parts(spark), "l_returnflag", *order
        ).withColumn("_pid", F.spark_partition_id())
    )
    cnts = part.groupBy("_pid", "l_returnflag").agg(F.sum("_q").alias("_pq"))
    w_off = (
        Window.partitionBy("l_returnflag")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("l_returnflag")
    # crossing-partition pruning: per (partition, flag), [_off, _off+_pq)
    # is its cumulative-weight span; the median row lives ONLY in the
    # partition whose span contains tot/2, so the cumulative window below
    # scans ~1/P of the data instead of every row (the other partitions'
    # rows never reach the sort)
    spans = cnts.select(
        "_pid",
        "l_returnflag",
        F.coalesce(
            F.sum("_pq").over(w_off), F.lit(0).cast("decimal(32,2)")
        ).alias("_off"),
        F.col("_pq"),
        F.sum("_pq").over(w_tot).alias("_tot"),
    )
    crossing = spans.filter(
        (F.lit(2) * F.col("_off") < F.col("_tot"))
        & (F.lit(2) * (F.col("_off") + F.col("_pq")) >= F.col("_tot"))
    ).select("_pid", "l_returnflag", "_off", "_tot")
    w_loc = (
        Window.partitionBy("_pid", "l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = part.join(F.broadcast(crossing), ["_pid", "l_returnflag"]).withColumn(
        "_lcum", F.sum("_q").over(w_loc)
    )
    crossed = g.filter(
        F.lit(2) * (F.col("_lcum") + F.col("_off")) >= F.col("_tot")
    )
    return crossed.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("weighted_median_price"),
        F.round(F.max("_tot"), 2).cast("double").alias("total_qty"),
    )


def q_agg_topn_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N concentration drill-down beside HHI/Gini: per market
    segment, the revenue share captured by its top-5 customers (plus the
    top customer's own share and the customer count) — the "how much of
    this market is 5 accounts" number a commercial analytics API serves
    where HHI is too abstract.

    Determinism: per-customer spend is an exact decimal sum; the top-5
    cut is a (spend DESC, custkey ASC) row_number with a total-order
    tiebreak; shares are e6-floored IEEE ratios of exact sums. Scale
    notes (100 TB): one per-customer partial-agg shuffle, one
    segment-partitioned rank window over the CONTRACTED per-customer
    frame (#customers rows, never #orders), one |segments|-row
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("_spend"), F.asc("c_custkey")
    )
    r = spend.withColumn("_rn", F.row_number().over(w))
    out = r.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("_spend"), 2).cast("double").alias("total_spend"),
        F.round(F.sum(F.when(F.col("_rn") <= 5, F.col("_spend"))), 2)
        .cast("double")
        .alias("top5_spend"),
        # IEEE ratios of exact-decimal sums (cast to double FIRST —
        # decimal÷decimal scale rules differ across engines), e6-floored
        (
            F.floor(
                F.sum(F.when(F.col("_rn") <= 5, F.col("_spend")))
                .cast("double")
                * F.lit(1_000_000)
                / F.sum("_spend").cast("double")
            )
            / F.lit(1_000_000.0)
        ).alias("top5_share"),
        (
            F.floor(
                F.max(F.when(F.col("_rn") == 1, F.col("_spend")))
                .cast("double")
                * F.lit(1_000_000)
                / F.sum("_spend").cast("double")
            )
            / F.lit(1_000_000.0)
        ).alias("top1_share"),
    )
    return out


def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration report: the Herfindahl–Hirschman index of
    customer spend across nations within each market segment —
    HHI = Σᵢ shareᵢ². Each share is the IEEE ratio of two exact-decimal
    sums (identical doubles in both engines), e8-quantized to a LONG
    with the standard epsilon-nudged floor; HHI is then the exact
    integer sum of squared e8 shares (≤25·10¹⁶, well inside LONG) over
    10¹⁶ — no decimal square ever approaches width limits at any SF
    (squaring the raw spend decimals overflows DuckDB's int64 decimal
    kernel even at sf0.01).

    Scale notes (100 TB): orders→customer is a broadcast join on the
    dimension; one (segment, nation) map-side-partial shuffle; the HHI
    aggregate runs over the ≤|segments|×|nations| frame."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    sp = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.sum(dec("o_totalprice")).alias("_sp"))
    )
    w = Window.partitionBy("c_mktsegment")
    tot = F.sum("_sp").over(w)
    share_e8 = F.floor(
        F.col("_sp").cast("double") / tot.cast("double") * F.lit(100000000)
        + F.lit(EPS)
    ).cast("long")
    t = sp.select(
        "c_mktsegment",
        "_sp",
        tot.alias("_tot"),
        share_e8.alias("_sh"),
    )
    return t.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.round(F.max("_tot"), 2).cast("double").alias("total_spend"),
        F.round(
            F.sum(F.col("_sh") * F.col("_sh")) / F.lit(1e16) + EPS, 6
        ).alias("hhi"),
    )


def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend within each market segment —
    the inequality statistic next to HHI in every market-structure
    report: G = Σᵢ(2i − n − 1)·xᵢ / (n·Σxᵢ) over the spend-ascending
    ranking (i = 1..n, c_custkey tiebreak).

    Distributed ranking: the same grouped two-pass range-partition
    pattern as q_agg_weighted_median — range repartition on (segment,
    spend, key), local row_number, broadcast per-(partition, segment)
    COUNT offsets reconstruct the exact global rank i per segment with
    no single-task sort. The weighted sum Σ(2i−n−1)x stays in exact
    decimal (integer coefficient × decimal spend), so only the final
    identical IEEE division crosses the hash.

    Results are partition-count-invariant (offset-table argument;
    tests/test_two_pass_invariance.py)."""
    from gpe.common import persist_tracked, two_pass_parts

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        # capped to DECIMAL(18,2) so the rank-coefficient product stays
        # inside decimal width in BOTH engines (DuckDB's int×decimal
        # widens by 19 digits)
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("_x"))
    )
    order = ["_x", "c_custkey"]
    part = persist_tracked(
        spend.repartitionByRange(
            two_pass_parts(spark), "c_mktsegment", *order
        ).withColumn("_pid", F.spark_partition_id())
    )
    cnts = part.groupBy("_pid", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("_pn")
    )
    w_off = (
        Window.partitionBy("c_mktsegment")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("c_mktsegment")
    offs = cnts.select(
        "_pid",
        "c_mktsegment",
        F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_pn").over(w_tot).alias("_n"),
    )
    w_loc = (
        Window.partitionBy("_pid", "c_mktsegment")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        part.withColumn("_lrn", F.row_number().over(w_loc))
        .join(F.broadcast(offs), ["_pid", "c_mktsegment"])
        .withColumn("_i", F.col("_off") + F.col("_lrn"))
    )
    agg = ranked.groupBy("c_mktsegment").agg(
        F.max("_n").alias("n_customers"),
        F.sum("_x").alias("_sx"),
        F.sum(
            (F.lit(2) * F.col("_i") - F.col("_n") - F.lit(1)) * F.col("_x")
        ).alias("_num"),
    )
    return agg.select(
        "c_mktsegment",
        "n_customers",
        F.round(F.col("_sx"), 2).cast("double").alias("total_spend"),
        F.round(
            F.col("_num").cast("double")
            / (
                F.col("n_customers").cast("double")
                * F.col("_sx").cast("double")
            )
            + EPS,
            6,
        ).alias("gini"),
    )


def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join (bidirectional): each non-purchase
    event matched to the CLOSEST purchase of the same user in either
    direction; exact ties go backward (the earlier purchase). Completes
    the as-of family (backward `q_join_asof`, tolerance, interval,
    point-in-time) with the variant sensor-fusion pipelines use.

    Spark-first: two carry passes over ONE scan — the backward pass
    carries the last purchase in (ts, purchase-first, event_id) order;
    the forward pass carries over the REVERSED order (so the carried
    value is the minimum (ts, event_id) purchase at-or-after each row) —
    then a per-row gap compare. One shuffle on user_id (both window
    sorts share the partitioning; the second is a re-sort, not a
    re-shuffle), zero joins, O(1) state per row."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("_p"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("_p"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("_p"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(w, col):
        return F.last(
            F.when(F.col("_p") == 1, col), ignorenulls=True
        ).over(w)

    t = u.select(
        "user_id",
        "ts",
        "event_id",
        "_p",
        carry(wb, F.col("event_id")).alias("_idb"),
        carry(wb, F.col("ts")).alias("_tsb"),
        carry(wf, F.col("event_id")).alias("_idf"),
        carry(wf, F.col("ts")).alias("_tsf"),
    ).filter(
        (F.col("_p") == 0)
        & (F.col("_idb").isNotNull() | F.col("_idf").isNotNull())
    )
    gb = umicros("ts") - umicros(F.col("_tsb"))
    gf = umicros(F.col("_tsf")) - umicros("ts")
    fwd = F.col("_tsb").isNull() | (F.col("_tsf").isNotNull() & (gf < gb))
    return t.select(
        "event_id",
        "user_id",
        F.col("ts").alias("event_ts"),
        F.when(fwd, F.col("_idf")).otherwise(F.col("_idb")).alias(
            "nearest_purchase_id"
        ),
        F.when(fwd, F.lit("forward")).otherwise(F.lit("backward")).alias(
            "direction"
        ),
        F.floor(F.when(fwd, gf).otherwise(gb) / F.lit(1_000_000))
        .cast("long")
        .alias("gap_seconds"),
    )


def q_agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-purchase affinity (market-basket support + lift) over
    the order "baskets": for every unordered brand pair that appears
    together in an order, the co-order count, each brand's own order
    count, the floor-scaled support (share of all orders carrying the
    pair) and lift (observed co-occurrence over the independence
    expectation). The classic recommendation / assortment endpoint.

    Scale notes (100 TB): part is a broadcast dimension; the pair
    generator is a SELF-join of the distinct (order, brand) frame on
    l_orderkey — co-partitioned on the same key so the sort-merge join
    reuses one exchange, and the expansion is bounded per order at
    C(b,2) where b ≤ distinct brands per order (≤7 lines in this
    schema) — never corpus-quadratic. Marginals (≤ |brands| rows) and
    the 1-row order total are broadcast back onto the ~|brands|² result.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    from gpe.common import persist_tracked

    # persisted: referenced 5x downstream (both self-join sides, both
    # marginal joins, the order total) — without the cache Spark
    # re-scans lineitem for every reference (measured 8 scans at r8)
    ob = persist_tracked(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.alias("a")
    b = ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co_orders"))
    )
    marg = ob.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_orders_brand")
    )
    total = ob.select(
        F.count_distinct("l_orderkey").alias("n_orders_total")
    )
    f6 = lambda num, den: F.floor(num * F.lit(1_000_000) / den) / F.lit(
        1_000_000.0
    )
    return (
        pairs.join(
            F.broadcast(marg).withColumnRenamed("n_orders_brand", "n_a"),
            F.col("brand_a") == F.col("brand"),
        )
        .drop("brand")
        .join(
            F.broadcast(marg).withColumnRenamed("n_orders_brand", "n_b"),
            F.col("brand_b") == F.col("brand"),
        )
        .drop("brand")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "n_co_orders",
            "n_a",
            "n_b",
            f6(F.col("n_co_orders"), F.col("n_orders_total")).alias(
                "support"
            ),
            f6(
                F.col("n_co_orders") * F.col("n_orders_total"),
                F.col("n_a") * F.col("n_b"),
            ).alias("lift"),
        )
    )


_BENFORD_E6 = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 58503, 8: 51153, 9: 45757,
}  # floor(log10(1+1/d) * 1e6), precomputed so neither engine calls libm


def q_agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over order totals — the classic
    forensic data-quality check (fabricated or unit-mangled monetary
    columns drift from the log-uniform first-digit law; Nigrini '96).
    Output per digit 1-9: row count, observed share (1e6 fixed-point)
    and the deviation from the Benford expectation.

    Determinism: the digit comes from the STRING head of the integral
    part (FLOOR then cast — no log10, whose libm rounding differs per
    platform); shares are integer DIV; the Benford expectations are
    precomputed integer literals. Every output column is exact.

    Scale notes (100 TB): one projected scan → 9-group partial
    aggregate; the total is a 1-row broadcast. This is the cheapest
    possible full-column profile — the shuffle carries 9 rows per
    map task."""
    o = load_table(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n_total"))
    bf = F.create_map(
        *[F.lit(x) for kv in _BENFORD_E6.items() for x in kv]
    )
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_rows",
            F.expr("(n_rows * 1000000) DIV n_total").alias("share_e6"),
            bf[F.col("digit")].cast("long").alias("benford_e6"),
            (
                F.expr("(n_rows * 1000000) DIV n_total")
                - bf[F.col("digit")].cast("long")
            ).alias("dev_e6"),
        )
    )


def q_agg_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile lift table — the marketing/analytics gains
    chart: customers ranked by total spend, cut into 10 deciles, each
    decile's revenue share and lift vs the average customer (decile 1 =
    top spenders; lift_e6 > 1e6 means the decile outspends the mean).

    Determinism: spend is an exact-decimal cents LONG; the decile comes
    from the distributed two-pass NTILE with (spend DESC, custkey) as a
    total order; share/lift/cum_share are integer fixed-point (the lift
    cross-multiplies cents×counts instead of dividing averages, so no
    float ever enters).

    Scale notes (100 TB): per-customer aggregate (one map-side-partial
    shuffle over #customers rows), ONE range shuffle for the global
    decile (two_pass_ntile — never a single-task global window), then a
    10-row aggregate; the cumulative share runs on the 10-row frame.
    The overall totals are a 1-row broadcast."""
    from gpe.common import two_pass_ntile

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("spend_c")
    )
    scored = two_pass_ntile(
        spark, base, 10, [F.desc("spend_c"), F.asc("o_custkey")], "decile"
    )
    deciles = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("spend_c").alias("revenue_c"),
    )
    tot = base.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("spend_c").alias("rev_total_c"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        deciles.crossJoin(F.broadcast(tot))
        .withColumn("cum_rev_c", F.sum("revenue_c").over(w))
        .select(
            "decile",
            "n_customers",
            (F.col("revenue_c") / 100.0).alias("revenue"),
            F.expr("(revenue_c * 1000000) DIV rev_total_c").alias(
                "share_e6"
            ),
            F.expr("(cum_rev_c * 1000000) DIV rev_total_c").alias(
                "cum_share_e6"
            ),
            # lift from the floored share (share_e6 ≤ 1e6, × #customers
            # stays far under int64; the 3-way cross-multiply would
            # overflow cents×count×1e6 beyond ~sf100)
            F.expr(
                "(((revenue_c * 1000000) DIV rev_total_c) * n_total)"
                " DIV n_customers"
            ).alias("lift_e6"),
        )
    )


def q_ml_gram_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normal-equation moment assembly for a distributed linear model —
    per return flag, every Gram/cross moment needed to fit
    price ~ quantity + discount by least squares (n, Σx, Σxxᵀ, Σxy).
    This is the scale-correct half of distributed regression: the O(N)
    sums reduce in ONE map-side-partial pass; the O(k³) solve of the
    3×3 system happens wherever the 3-row result lands (driver, or a
    notebook) — shipping moments, not rows, is how 100 TB fits are done
    (the classic "statistical queries" / summation-form pattern, e.g.
    Chu et al. NIPS'06 map-reduce ML).

    Determinism: features are integer fixed-point up front (quantity is
    integral; discount scaled e2 and price to cents via FLOOR(x·s+0.5)
    — IEEE multiply+floor is bit-identical cross-engine, unlike
    CAST-to-int rounding which truncates in Spark but rounds in DuckDB).
    All nine moments are exact BIGINT sums — hash-stable under any
    partitioning or summation order."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.select(
        "l_returnflag",
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("q"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("d2"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("pc"),
    )
    return f.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s_q"),
        F.sum("d2").alias("s_d_e2"),
        F.sum("pc").alias("s_p_c"),
        F.sum(F.col("q") * F.col("q")).alias("s_qq"),
        F.sum(F.col("q") * F.col("d2")).alias("s_qd_e2"),
        F.sum(F.col("d2") * F.col("d2")).alias("s_dd_e4"),
        F.sum(F.col("q") * F.col("pc")).alias("s_qp_c"),
        F.sum(F.col("d2") * F.col("pc")).alias("s_dp_ce2"),
    )


def q_agg_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence screen between order status and order
    priority — the contingency-table test every analytics layer ships
    (is the fulfilment mix independent of priority?). Output per cell:
    observed count, expected count under independence, and the cell's
    χ² contribution; the caller sums the terms and compares against the
    χ² critical value for (r−1)(c−1) degrees of freedom.

    Determinism: marginals and the grand total are exact BIGINT counts;
    expected = row_tot·col_tot/n_total is one double division of exact
    integers (row_tot·col_tot stays inside int64 far past sf100 and
    inside the 2^53 double-exact range through sf100) — bit-identical
    IEEE in both engines; contributions are epsilon-nudged e6 rounds.

    Scale notes (100 TB): ONE map-side-partial aggregate to the
    #statuses × #priorities cell grid (≤ 15 rows); marginals are
    aggregates OF the cell grid (no second scan); the joins broadcast
    the tiny marginal tables. The scan is projected to two columns."""
    from gpe.common import persist_tracked

    o = load_table(spark, sf_dir, "orders")
    cells = persist_tracked(
        o.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_obs")
        )
    )
    row_m = cells.groupBy("o_orderstatus").agg(
        F.sum("n_obs").alias("row_tot")
    )
    col_m = cells.groupBy("o_orderpriority").agg(
        F.sum("n_obs").alias("col_tot")
    )
    tot = cells.agg(F.sum("n_obs").alias("n_total"))
    expected = (
        F.col("row_tot") * F.col("col_tot")
    ).cast("double") / F.col("n_total")
    return (
        cells.join(F.broadcast(row_m), "o_orderstatus")
        .join(F.broadcast(col_m), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_obs",
            fround(expected, "expected"),
            # explicit multiply, not pow(x,2): pow is a libm call whose
            # last-ulp rounding may differ per engine; x*x is a single
            # IEEE multiply, identical everywhere
            fround(
                (F.col("n_obs") - expected)
                * (F.col("n_obs") - expected)
                / expected,
                "chi2_term",
            ),
        )
    )


def q_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-lag distribution: join lineitem to orders (the
    canonical fact-fact FK join) and profile ship_date − order_date in
    whole days per order priority — line count, exact mean lag
    (floor-e3), and the p50/p90 lag percentiles every operations
    dashboard tracks against SLA.

    Determinism: lags are exact integer days (date_diff of date-truncated
    timestamps); the mean is an e3-floored exact-int ratio; percentiles
    interpolate over the integer lattice with the same IEEE expression in
    both engines (the q_agg_percentiles recipe).

    Scale notes (100 TB): one sort-merge join co-partitioned on the FK
    (AQE free to split skew), then a #priorities-row aggregate with
    map-side partials; both scans project only the key + date columns
    (ReadSchema-pruned)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("odate")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", F.datediff("ship", "odate").alias("lag_days")
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("lag_days").alias("_s"),
            F.percentile("lag_days", F.lit(0.5)).alias("p50_lag"),
            F.percentile("lag_days", F.lit(0.9)).alias("p90_lag"),
        )
        .select(
            "o_orderpriority",
            "n_lines",
            (
                F.floor(F.col("_s") * F.lit(1000) / F.col("n_lines"))
                / F.lit(1000.0)
            ).alias("mean_lag_days"),
            "p50_lag",
            "p90_lag",
        )
    )


def q_agg_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front, Börzsönyi et al. ICDE'01) of the
    supplier scorecard: suppliers not DOMINATED on (revenue ↑, mean ship
    lag ↓) — no other supplier is at least as good on both axes and
    strictly better on one. The vendor-selection shortlist a procurement
    dashboard draws as "the efficient frontier".

    Algorithm: the classic sorted sweep — order by (revenue DESC, lag
    ASC, key ASC) and keep a row iff its lag beats the strict running
    minimum over all prior rows (every prior row has ≥ revenue, so a
    prior lag ≤ ours dominates; exact duplicate points report once,
    smallest key — the standard skyline-with-distinct convention).

    Determinism: revenue is an exact e4 decimal sum (2-dec price × 2-dec
    (1−disc)); lag is the e3-floored exact-int mean; the sweep compares
    LONGs under a total order — every decision exact.

    Scale notes (100 TB): one FK sort-merge join + one supplier-keyed
    partial agg collapse the fact table to #suppliers rows — still OPEN
    cardinality (suppliers scale with the data) — so the sweep's strict-
    prior running min is the two-pass range-partition recipe
    (gpe/common.two_pass_prior_min: range repartition on the sweep order
    → local prior-min window → broadcast per-partition-minimum offset
    table; the r11 window-audit tightening retired the old unpartitioned
    sweep window). Every stage is distributed; the only global structure
    is the partition-count-sized offset table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))).alias(
            "rev"
        ),
        F.to_date("l_shipdate").alias("ship"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("odate")
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey", "rev", F.datediff("ship", "odate").alias("lag_days")
    )
    agg = j.groupBy("l_suppkey").agg(
        (F.sum("rev") * 10000).cast("long").alias("rev_e4"),
        F.floor(
            F.sum("lag_days") * F.lit(1000) / F.count(F.lit(1))
        )
        .cast("long")
        .alias("lag_e3"),
    )
    from gpe.common import two_pass_prior_min

    sky = two_pass_prior_min(
        spark,
        agg,
        [F.desc("rev_e4"), F.asc("lag_e3"), F.asc("l_suppkey")],
        "lag_e3",
        "cummin_prev",
    ).filter(
        F.col("cummin_prev").isNull()
        | (F.col("lag_e3") < F.col("cummin_prev"))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sky.join(F.broadcast(sup), sky.l_suppkey == sup.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            (F.col("rev_e4") / F.lit(10000.0)).alias("revenue"),
            (F.col("lag_e3") / F.lit(1000.0)).alias("mean_lag_days"),
        )
    )


def q_agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the status × priority association —
    the 1-row summary a dashboard shows next to q_agg_chi2's per-cell
    contributions (V = √(χ²/(n·(min(r,c)−1))) ∈ [0,1]; χ² alone grows
    with n, V does not — Cramér 1946).

    Determinism: identical cell/marginal integers as q_agg_chi2; each
    cell's χ² term is e6-FLOORED (EPS-nudged) into a LONG before
    summation (summing the display-rounded doubles would be order-
    dependent in the last ulp), so the χ² total is an exact integer;
    the √ tail is the one correctly-rounded IEEE sqrt.

    Scale notes (100 TB): same single-scan cell-grid shape as q_agg_chi2
    (≤15 cell rows; marginals are aggregates OF the grid); the summary
    is a 1-row reduce."""
    from gpe.common import persist_tracked

    o = load_table(spark, sf_dir, "orders")
    cells = persist_tracked(
        o.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_obs")
        )
    )
    row_m = cells.groupBy("o_orderstatus").agg(F.sum("n_obs").alias("row_tot"))
    col_m = cells.groupBy("o_orderpriority").agg(
        F.sum("n_obs").alias("col_tot")
    )
    tot = cells.agg(
        F.sum("n_obs").alias("n_total"),
        F.count_distinct("o_orderstatus").alias("r"),
        F.count_distinct("o_orderpriority").alias("c"),
    )
    expected = (
        F.col("row_tot") * F.col("col_tot")
    ).cast("double") / F.col("n_total")
    term_e6 = F.floor(
        (F.col("n_obs") - expected)
        * (F.col("n_obs") - expected)
        / expected
        * F.lit(1_000_000)
        + F.lit(EPS)
    ).cast("long")
    # FULL r×c grid (marginal cross join), not just observed cells:
    # a zero cell still contributes exp = rt·ct/n to χ² — dropping the
    # zeros understates χ² exactly when the association is strongest
    # (q_agg_chi2 reports observed cells by design; the SUMMARY must not)
    grid = row_m.crossJoin(col_m)
    return (
        grid.join(cells, ["o_orderstatus", "o_orderpriority"], "left")
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .groupBy("n_total", "r", "c")
        .agg(F.sum(term_e6).alias("chi2_e6"))
        .select(
            F.col("n_total").cast("long").alias("n_total"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
            (F.col("chi2_e6") / F.lit(1_000_000.0)).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2_e6")
                    / F.lit(1_000_000.0)
                    / (
                        F.col("n_total")
                        * (F.least("r", "c") - 1)
                    )
                )
                + F.lit(EPS),
                6,
            ).alias("cramers_v"),
        )
    )


def q_agg_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between order status and priority, with
    the marginal entropies and the normalized MI (NMI = I/√(H_x·H_y),
    Strehl & Ghosh 2002) — the feature-redundancy/leakage screen a
    training pipeline runs on categorical column pairs before using one
    to stratify or split on the other (complements q_agg_cramers_v:
    V measures association strength in χ² units, MI in information
    units, and NMI is comparable across column pairs).

    Observed cells only: a zero cell contributes p·ln(…) = 0 to MI
    (lim p→0), so unlike q_agg_cramers_v no marginal cross-join grid is
    needed.

    Determinism: counts are exact integers; each cell term
    (n_xy/N)·ln(N·n_xy/(n_x·n_y)) and each marginal entropy term is one
    IEEE double expression over exact ints, e9-FLOORED (EPS-nudged) into
    a LONG before summation (the q_text_cooccurrence_pmi idiom at e9 —
    terms can be NEGATIVE for anti-associated cells; floor is the same
    deterministic bias in both engines); NMI's √ and division run over
    the exact integer sums and are display-rounded with the ε nudge.

    Scale notes (100 TB): one scan → one partial-agg shuffle into the
    ≤ r×c cell grid (15 rows here); marginals are aggregates OF the
    grid; everything after the first shuffle is broadcast arithmetic on
    a bounded frame."""
    from gpe.common import persist_tracked

    o = load_table(spark, sf_dir, "orders")
    cells = persist_tracked(
        o.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_obs")
        )
    )
    row_m = cells.groupBy("o_orderstatus").agg(F.sum("n_obs").alias("row_tot"))
    col_m = cells.groupBy("o_orderpriority").agg(
        F.sum("n_obs").alias("col_tot")
    )
    tot = cells.agg(F.sum("n_obs").alias("n_total"))

    def _h_e9(tot_col: str) -> F.Column:
        # (m/N)·ln(N/m), e9-floored per marginal term
        return F.sum(
            F.floor(
                (F.col(tot_col) / F.col("n_total"))
                * F.log(F.col("n_total") / F.col(tot_col))
                * F.lit(1_000_000_000)
                + F.lit(EPS)
            ).cast("long")
        )

    hx = (
        row_m.crossJoin(F.broadcast(tot))
        .agg(_h_e9("row_tot").alias("hx_e9"))
    )
    hy = (
        col_m.crossJoin(F.broadcast(tot))
        .agg(_h_e9("col_tot").alias("hy_e9"))
    )
    term_e9 = F.floor(
        (F.col("n_obs") / F.col("n_total"))
        * F.log(
            F.col("n_obs").cast("double")
            * F.col("n_total")
            / (F.col("row_tot").cast("double") * F.col("col_tot"))
        )
        * F.lit(1_000_000_000)
        + F.lit(EPS)
    ).cast("long")
    return (
        cells.join(F.broadcast(row_m), "o_orderstatus")
        .join(F.broadcast(col_m), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .groupBy("n_total")
        .agg(F.sum(term_e9).alias("mi_e9"))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.col("n_total").cast("long").alias("n_total"),
            (F.col("mi_e9") / F.lit(1_000_000_000.0)).alias("mi_nats"),
            (F.col("hx_e9") / F.lit(1_000_000_000.0)).alias("entropy_status"),
            (F.col("hy_e9") / F.lit(1_000_000_000.0)).alias(
                "entropy_priority"
            ),
            # a constant column has zero entropy: NMI's normalizer is 0
            # and the ratio is undefined — NULL, not a division error
            # (ANSI Spark throws on /0; DuckDB returns inf)
            F.when(
                (F.col("hx_e9") > 0) & (F.col("hy_e9") > 0),
                F.round(
                    F.col("mi_e9")
                    / F.sqrt(F.col("hx_e9").cast("double") * F.col("hy_e9"))
                    + F.lit(EPS),
                    6,
                ),
            ).alias("nmi"),
        )
    )


def q_agg_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two (log-spaced) histogram of order totals — the data-
    profiling shape for heavy-tailed columns where q_agg_histogram's
    fixed-width buckets put 99% of rows in one bin. Bucket k holds
    values with k binary digits of cents, i.e. cents ∈ [2^(k−1), 2^k).

    Determinism: the bucket is the STRING LENGTH of the binary
    representation of exact cents (both engines' ``bin`` agree; no
    log2/libm call anywhere); shares are integer DIV; bounds are exact
    cents back in dollars.

    Scale notes (100 TB): one projected scan → map-side partial
    aggregate to ≤ 64 buckets (int64 width bounds the output rows
    regardless of data size); the total is a 1-row broadcast."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.length(
            F.expr("bin(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))")
        ).alias("bucket"),
        (dec("o_totalprice") * 100).cast("long").alias("cents"),
    )
    tot = d.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        d.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("min_c"),
            F.max("cents").alias("max_c"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_orders",
            F.expr("(n_orders * 1000000) DIV n_total").alias("share_e6"),
            (F.col("min_c") / 100.0).alias("min_price"),
            (F.col("max_c") / 100.0).alias("max_price"),
        )
    )


QUERIES = {
    "q_agg_chi2": q_agg_chi2,
    "q_agg_cramers_v": q_agg_cramers_v,
    "q_agg_mutual_info": q_agg_mutual_info,
    "q_join_ship_lag": q_join_ship_lag,
    "q_agg_skyline": q_agg_skyline,
    "q_agg_log_histogram": q_agg_log_histogram,
    "q_agg_benford": q_agg_benford,
    "q_agg_decile_lift": q_agg_decile_lift,
    "q_ml_gram_moments": q_ml_gram_moments,
    "q_agg_market_basket": q_agg_market_basket,
    "q_agg_groupby": q_agg_groupby,
    "q_agg_weighted_median": q_agg_weighted_median,
    "q_agg_topn_share": q_agg_topn_share,
    "q_agg_hhi": q_agg_hhi,
    "q_agg_gini": q_agg_gini,
    "q_join_asof_nearest": q_join_asof_nearest,
    "q_agg_corr_regr": q_agg_corr_regr,
    "q_agg_bitwise": q_agg_bitwise,
    "q_join_fuzzy_name": q_join_fuzzy_name,
    "q_join_skew_salted": q_join_skew_salted,
    "q_agg_mode": q_agg_mode,
    "q_pivot_status_by_year": q_pivot_status_by_year,
    "q_subquery_scalar": q_subquery_scalar,
    "q_subquery_correlated": q_subquery_correlated,
    "q_agg_listagg": q_agg_listagg,
    "q_agg_percentiles": q_agg_percentiles,
    "q_agg_iqr_fences": q_agg_iqr_fences,
    "q_agg_winsorized": q_agg_winsorized,
    "q_agg_ttest_welch": q_agg_ttest_welch,
    "q_agg_mad": q_agg_mad,
    "q_agg_skew_kurtosis": q_agg_skew_kurtosis,
    "q_page_orders": q_page_orders,
    "q_unpivot_order_counts": q_unpivot_order_counts,
    "q_join_lateral": q_join_lateral,
    "q_agg_histogram": q_agg_histogram,
    "q_agg_rollup": q_agg_rollup,
    "q_agg_cube": q_agg_cube,
    "q_agg_grouping_sets": q_agg_grouping_sets,
    "q_agg_collect": q_agg_collect,
    "q_agg_stats": q_agg_stats,
    "q_project_compute": q_project_compute,
    "q_filter_conj": q_filter_conj,
    "q_filter_disj_in": q_filter_disj_in,
    "q_filter_like": q_filter_like,
    "q_filter_between_dates": q_filter_between_dates,
    "q_case_when": q_case_when,
    "q_join_inner_bcast": q_join_inner_bcast,
    "q_join_inner_shuffle": q_join_inner_shuffle,
    "q_join_multiway_star": q_join_multiway_star,
    "q_join_left_outer": q_join_left_outer,
    "q_join_full_outer": q_join_full_outer,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_cross_limited": q_join_cross_limited,
    "q_join_theta_range": q_join_theta_range,
    "q_join_theta_bucketed": q_join_theta_bucketed,
    "q_join_bloom_prefilter": q_join_bloom_prefilter,
    "q_join_asof": q_join_asof,
    "q_join_asof_tolerance": q_join_asof_tolerance,
    "q_join_interval": q_join_interval,
    "q_agg_global": q_agg_global,
    "q_agg_count_distinct": q_agg_count_distinct,
    "q_agg_approx_distinct": q_agg_approx_distinct,
    "q_agg_approx_quantile": q_agg_approx_quantile,
    "q_agg_multi_distinct": q_agg_multi_distinct,
    "q_agg_having": q_agg_having,
    "q_sort_multi": q_sort_multi,
    "q_union_all": q_union_all,
    "q_union_distinct": q_union_distinct,
    "q_intersect": q_intersect,
    "q_except": q_except,
    "q_distinct_dropdup": q_distinct_dropdup,
}

_REV_DEC = f"{sql_dec('l_extendedprice')} * {sql_dec('1 - l_discount')}"

_SQL_BENFORD_CASE = (
    "CASE g.digit "
    + " ".join(f"WHEN {d} THEN {v}" for d, v in _BENFORD_E6.items())
    + " END"
)

ORACLES = {
    # digit from the string head of the FLOORed integral part (no log10 —
    # libm-free on both engines); shares and deviations all-integer.
    # same exact-integer marginals; expected/χ² terms are the identical
    # IEEE double division + epsilon-nudged rounds
    # same exact e4 revenue / e3 lag integers, same strict-cummin sweep
    "q_agg_skyline": """
        WITH j AS (
          SELECT l.l_suppkey,
                 CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * CAST(1 - l.l_discount AS DECIMAL(12,2)) AS rev,
                 date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) AS lag_days
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        agg AS (
          SELECT l_suppkey,
                 CAST(SUM(rev) * 10000 AS BIGINT) AS rev_e4,
                 CAST(FLOOR(SUM(lag_days) * 1000 / CAST(COUNT(*) AS DOUBLE))
                      AS BIGINT) AS lag_e3
          FROM j GROUP BY 1),
        sweep AS (
          SELECT *,
                 MIN(lag_e3) OVER (ORDER BY rev_e4 DESC, lag_e3 ASC,
                   l_suppkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND
                   1 PRECEDING) AS cummin_prev
          FROM agg)
        SELECT s.s_suppkey AS suppkey, s.s_name,
               sw.rev_e4 / 10000.0 AS revenue,
               sw.lag_e3 / 1000.0 AS mean_lag_days
        FROM sweep sw JOIN supplier s ON sw.l_suppkey = s.s_suppkey
        WHERE sw.cummin_prev IS NULL OR sw.lag_e3 < sw.cummin_prev""",
    # same integer day lags, e3-floored mean, identical quantile_cont
    # interpolation over the int lattice
    "q_join_ship_lag": """
        WITH j AS (
          SELECT o.o_orderpriority,
                 date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) AS lag_days
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               FLOOR(SUM(lag_days) * 1000 / COUNT(*)) / 1000.0
                 AS mean_lag_days,
               quantile_cont(lag_days, 0.5) AS p50_lag,
               quantile_cont(lag_days, 0.9) AS p90_lag
        FROM j GROUP BY 1""",
    # identical cells/marginals as chi2; e6-floored terms → exact-int
    # χ² sum; one IEEE sqrt tail
    "q_agg_mutual_info": """
        WITH cells AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_obs
          FROM orders GROUP BY 1, 2),
        rm AS (SELECT o_orderstatus, SUM(n_obs) AS row_tot
               FROM cells GROUP BY 1),
        cm AS (SELECT o_orderpriority, SUM(n_obs) AS col_tot
               FROM cells GROUP BY 1),
        tot AS (SELECT SUM(n_obs) AS n_total FROM cells),
        hx AS (
          SELECT SUM(CAST(FLOOR((row_tot / n_total)
                     * ln(n_total / row_tot)
                     * 1000000000 + 1e-9) AS BIGINT)) AS hx_e9
          FROM rm CROSS JOIN tot),
        hy AS (
          SELECT SUM(CAST(FLOOR((col_tot / n_total)
                     * ln(n_total / col_tot)
                     * 1000000000 + 1e-9) AS BIGINT)) AS hy_e9
          FROM cm CROSS JOIN tot),
        mi AS (
          SELECT t.n_total,
                 SUM(CAST(FLOOR((ce.n_obs / t.n_total)
                     * ln(CAST(ce.n_obs AS DOUBLE) * t.n_total
                          / (CAST(rm.row_tot AS DOUBLE) * cm.col_tot))
                     * 1000000000 + 1e-9) AS BIGINT)) AS mi_e9
          FROM cells ce
          JOIN rm ON rm.o_orderstatus = ce.o_orderstatus
          JOIN cm ON cm.o_orderpriority = ce.o_orderpriority
          CROSS JOIN tot t
          GROUP BY t.n_total)
        SELECT CAST(n_total AS BIGINT) AS n_total,
               mi_e9 / 1000000000.0 AS mi_nats,
               hx_e9 / 1000000000.0 AS entropy_status,
               hy_e9 / 1000000000.0 AS entropy_priority,
               CASE WHEN hx_e9 > 0 AND hy_e9 > 0
                    THEN ROUND(mi_e9 / sqrt(CAST(hx_e9 AS DOUBLE) * hy_e9)
                               + 1e-9, 6)
               END AS nmi
        FROM mi CROSS JOIN hx CROSS JOIN hy""",
    "q_agg_cramers_v": """
        WITH cells AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_obs
          FROM orders GROUP BY 1, 2),
        rm AS (SELECT o_orderstatus, SUM(n_obs) AS row_tot
               FROM cells GROUP BY 1),
        cm AS (SELECT o_orderpriority, SUM(n_obs) AS col_tot
               FROM cells GROUP BY 1),
        tot AS (SELECT SUM(n_obs) AS n_total,
                       COUNT(DISTINCT o_orderstatus) AS r,
                       COUNT(DISTINCT o_orderpriority) AS c
                FROM cells),
        grid AS (
          SELECT rm.o_orderstatus, cm.o_orderpriority,
                 rm.row_tot, cm.col_tot,
                 COALESCE(ce.n_obs, 0) AS n_obs
          FROM rm CROSS JOIN cm
          LEFT JOIN cells ce
            ON ce.o_orderstatus = rm.o_orderstatus
           AND ce.o_orderpriority = cm.o_orderpriority),
        terms AS (
          SELECT t.n_total, t.r, t.c,
                 CAST(FLOOR((g.n_obs - (g.row_tot * g.col_tot)
                               / CAST(t.n_total AS DOUBLE))
                     * (g.n_obs - (g.row_tot * g.col_tot)
                               / CAST(t.n_total AS DOUBLE))
                     / ((g.row_tot * g.col_tot)
                               / CAST(t.n_total AS DOUBLE))
                     * 1000000 + 1e-9) AS BIGINT) AS term_e6
          FROM grid g CROSS JOIN tot t)
        SELECT CAST(n_total AS BIGINT) AS n_total,
               CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
               SUM(term_e6) / 1000000.0 AS chi2,
               ROUND(sqrt(SUM(term_e6) / 1000000.0
                          / (n_total * (LEAST(r, c) - 1))) + 1e-9, 6)
                 AS cramers_v
        FROM terms GROUP BY n_total, r, c""",
    "q_agg_chi2": f"""
        WITH cells AS (
          SELECT o_orderstatus, o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_obs
          FROM orders GROUP BY 1, 2),
        rm AS (SELECT o_orderstatus, CAST(SUM(n_obs) AS BIGINT) AS row_tot
               FROM cells GROUP BY 1),
        cm AS (SELECT o_orderpriority, CAST(SUM(n_obs) AS BIGINT) AS col_tot
               FROM cells GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM cells)
        SELECT cells.o_orderstatus, cells.o_orderpriority, n_obs,
               ROUND(CAST(row_tot * col_tot AS DOUBLE) / n_total + {EPS}, 6)
                 AS expected,
               ROUND((n_obs - CAST(row_tot * col_tot AS DOUBLE) / n_total)
                       * (n_obs - CAST(row_tot * col_tot AS DOUBLE) / n_total)
                       / (CAST(row_tot * col_tot AS DOUBLE) / n_total)
                     + {EPS}, 6) AS chi2_term
        FROM cells
        JOIN rm USING (o_orderstatus)
        JOIN cm USING (o_orderpriority)
        CROSS JOIN tot""",
    # bucket = length of the binary repr of exact cents in BOTH engines
    # (bin() agrees; no libm log2 anywhere)
    "q_agg_log_histogram": """
        WITH d AS (
          SELECT length(bin(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                               AS BIGINT))) AS bucket,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
          FROM orders),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d)
        SELECT CAST(bucket AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               (CAST(COUNT(*) AS BIGINT) * 1000000) // n_total AS share_e6,
               CAST(MIN(cents) AS DOUBLE) / 100.0 AS min_price,
               CAST(MAX(cents) AS DOUBLE) / 100.0 AS max_price
        FROM d CROSS JOIN tot
        GROUP BY 1, n_total""",
    "q_agg_benford": f"""
        WITH d AS (
          SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                     AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM orders WHERE o_totalprice >= 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d),
        g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_rows
              FROM d GROUP BY 1)
        SELECT g.digit, g.n_rows,
               (g.n_rows * 1000000) // tot.n_total AS share_e6,
               CAST({_SQL_BENFORD_CASE} AS BIGINT) AS benford_e6,
               (g.n_rows * 1000000) // tot.n_total
                 - CAST({_SQL_BENFORD_CASE} AS BIGINT) AS dev_e6
        FROM g, tot""",
    # NTILE over the identical (spend DESC, custkey) total order; all
    # fixed-point arithmetic mirrors the engine's DIV chain, including
    # the lift-from-floored-share form (overflow discipline).
    "q_agg_decile_lift": """
        WITH base AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                               AS BIGINT)) AS BIGINT) AS spend_c
          FROM orders GROUP BY 1),
        scored AS (
          SELECT o_custkey, spend_c,
                 CAST(NTILE(10) OVER (ORDER BY spend_c DESC, o_custkey)
                      AS INTEGER) AS decile
          FROM base),
        dg AS (
          SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
                 CAST(SUM(spend_c) AS BIGINT) AS revenue_c
          FROM scored GROUP BY 1),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                 CAST(SUM(spend_c) AS BIGINT) AS rev_total_c
          FROM base)
        SELECT decile, n_customers,
               CAST(revenue_c AS DOUBLE) / 100.0 AS revenue,
               (revenue_c * 1000000) // rev_total_c AS share_e6,
               (CAST(SUM(revenue_c) OVER (ORDER BY decile
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000)
                 // rev_total_c AS cum_share_e6,
               (((revenue_c * 1000000) // rev_total_c) * n_total)
                 // n_customers AS lift_e6
        FROM dg, tot""",
    # FLOOR(x·s + 0.5) scaling on both sides (CAST-to-int would round in
    # DuckDB but truncate in Spark); nine exact BIGINT moments.
    "q_ml_gram_moments": """
        WITH f AS (
          SELECT l_returnflag,
                 CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
                 CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS d2,
                 CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
          FROM lineitem)
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS s_q,
               CAST(SUM(d2) AS BIGINT) AS s_d_e2,
               CAST(SUM(pc) AS BIGINT) AS s_p_c,
               CAST(SUM(q * q) AS BIGINT) AS s_qq,
               CAST(SUM(q * d2) AS BIGINT) AS s_qd_e2,
               CAST(SUM(d2 * d2) AS BIGINT) AS s_dd_e4,
               CAST(SUM(q * pc) AS BIGINT) AS s_qp_c,
               CAST(SUM(d2 * pc) AS BIGINT) AS s_dp_ce2
        FROM f GROUP BY 1""",
    "q_agg_market_basket": """
        WITH ob AS (
          SELECT DISTINCT l.l_orderkey, p.p_brand
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        pairs AS (
          SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                 CAST(COUNT(*) AS BIGINT) AS n_co_orders
          FROM ob a JOIN ob b
            ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
          GROUP BY 1, 2),
        marg AS (
          SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n
          FROM ob GROUP BY 1),
        tot AS (
          SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_total
          FROM ob)
        SELECT p.brand_a, p.brand_b, p.n_co_orders,
               ma.n AS n_a, mb.n AS n_b,
               FLOOR(p.n_co_orders * 1000000.0 / t.n_total)
                 / 1000000.0 AS support,
               FLOOR(p.n_co_orders * t.n_total * 1000000.0
                     / (ma.n * mb.n)) / 1000000.0 AS lift
        FROM pairs p
        JOIN marg ma ON p.brand_a = ma.brand
        JOIN marg mb ON p.brand_b = mb.brand
        CROSS JOIN tot t""",
    "q_agg_groupby": _Q1_ORACLE,
    "q_join_asof_nearest": """
        WITH u AS (
          SELECT user_id, ts, event_id,
                 (event_type = 'purchase') AS p
          FROM events),
        b AS (
          SELECT *,
                 last_value(CASE WHEN p THEN event_id END IGNORE NULLS)
                   OVER wb AS idb,
                 last_value(CASE WHEN p THEN ts END IGNORE NULLS)
                   OVER wb AS tsb
          FROM u
          WINDOW wb AS (PARTITION BY user_id
                        ORDER BY ts, p DESC, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        f AS (
          SELECT *,
                 last_value(CASE WHEN p THEN event_id END IGNORE NULLS)
                   OVER wf AS idf,
                 last_value(CASE WHEN p THEN ts END IGNORE NULLS)
                   OVER wf AS tsf
          FROM b
          WINDOW wf AS (PARTITION BY user_id
                        ORDER BY ts DESC, p DESC, event_id DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        t AS (
          SELECT *,
                 (tsb IS NULL OR (tsf IS NOT NULL
                   AND epoch_us(tsf) - epoch_us(ts)
                       < epoch_us(ts) - epoch_us(tsb))) AS fwd
          FROM f
          WHERE NOT p AND (idb IS NOT NULL OR idf IS NOT NULL))
        SELECT event_id, user_id, ts AS event_ts,
               CASE WHEN fwd THEN idf ELSE idb END AS nearest_purchase_id,
               CASE WHEN fwd THEN 'forward' ELSE 'backward' END AS direction,
               CAST(FLOOR(CASE WHEN fwd
                               THEN epoch_us(tsf) - epoch_us(ts)
                               ELSE epoch_us(ts) - epoch_us(tsb) END
                          / 1000000) AS BIGINT) AS gap_seconds
        FROM t""",
    "q_agg_gini": f"""
        WITH spend AS (
          SELECT c_mktsegment, c_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                      AS DECIMAL(18,2)) AS x
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        r AS (
          SELECT c_mktsegment, x,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY x, c_custkey) AS i,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM spend)
        SELECT c_mktsegment,
               CAST(MAX(n) AS BIGINT) AS n_customers,
               CAST(ROUND(SUM(x), 2) AS DOUBLE) AS total_spend,
               ROUND(CAST(SUM((2 * i - n - 1) * x) AS DOUBLE)
                     / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                     + {EPS}, 6) AS gini
        FROM r GROUP BY 1""",
    "q_agg_topn_share": """
        WITH spend AS (
          SELECT c_mktsegment, c_custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        r AS (
          SELECT c_mktsegment, spend,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY spend DESC, c_custkey ASC)
                   AS rn
          FROM spend)
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(ROUND(SUM(spend), 2) AS DOUBLE) AS total_spend,
               CAST(ROUND(SUM(CASE WHEN rn <= 5 THEN spend END), 2)
                    AS DOUBLE) AS top5_spend,
               FLOOR(CAST(SUM(CASE WHEN rn <= 5 THEN spend END) AS DOUBLE)
                     * 1000000 / CAST(SUM(spend) AS DOUBLE)) / 1000000.0
                 AS top5_share,
               FLOOR(CAST(MAX(CASE WHEN rn = 1 THEN spend END) AS DOUBLE)
                     * 1000000 / CAST(SUM(spend) AS DOUBLE)) / 1000000.0
                 AS top1_share
        FROM r GROUP BY 1""",
    "q_agg_hhi": f"""
        WITH sp AS (
          SELECT c_mktsegment, c_nationkey,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sp
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        t AS (
          SELECT c_mktsegment, sp,
                 SUM(sp) OVER (PARTITION BY c_mktsegment) AS tot,
                 CAST(FLOOR(CAST(sp AS DOUBLE)
                            / CAST(SUM(sp) OVER (PARTITION BY c_mktsegment)
                                   AS DOUBLE)
                            * 100000000 + {EPS}) AS BIGINT) AS sh
          FROM sp)
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_nations,
               CAST(ROUND(MAX(tot), 2) AS DOUBLE) AS total_spend,
               ROUND(SUM(sh * sh) / 1e16 + {EPS}, 6) AS hhi
        FROM t GROUP BY c_mktsegment""",
    "q_agg_weighted_median": """
        WITH t AS (
          SELECT l_returnflag, l_extendedprice,
                 CAST(l_quantity AS DECIMAL(12,2)) AS q,
                 l_orderkey, l_linenumber
          FROM lineitem),
        c AS (
          SELECT l_returnflag, l_extendedprice,
                 SUM(q) OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice, l_orderkey,
                                       l_linenumber
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(q) OVER (PARTITION BY l_returnflag) AS tot
          FROM t)
        SELECT l_returnflag,
               MIN(l_extendedprice) AS weighted_median_price,
               CAST(ROUND(MAX(tot), 2) AS DOUBLE) AS total_qty
        FROM c
        WHERE 2 * cum >= tot
        GROUP BY l_returnflag""",
    "q_agg_corr_regr": f"""
        WITH s AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) AS sx,
                 CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE) AS sy,
                 CAST(SUM({sql_dec('l_quantity')} * {sql_dec('l_quantity')})
                      AS DOUBLE) AS sxx,
                 CAST(SUM({sql_dec('l_extendedprice')}
                          * {sql_dec('l_extendedprice')}) AS DOUBLE) AS syy,
                 CAST(SUM({sql_dec('l_quantity')}
                          * {sql_dec('l_extendedprice')}) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag),
        m AS (
          SELECT l_returnflag, n, sx, sy,
                 n * sxy - sx * sy AS num,
                 n * sxx - sx * sx AS denx,
                 n * syy - sy * sy AS deny
          FROM s)
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_rows,
               {sql_fround('num / sqrt(denx * deny)', 'corr_qty_price')},
               {sql_fround('num / (n * (n - 1.0))', 'covar_samp', 4)},
               {sql_fround('num / denx', 'regr_slope')},
               {sql_fround('(sy - (num / denx) * sx) / n', 'regr_intercept', 4)}
        FROM m
        """,
    "q_join_skew_salted": f"""
        SELECT o_orderpriority,
               {sql_dsum('l_quantity', 'sum_qty')},
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority""",
    "q_agg_mode": """
        WITH c AS (
          SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt
          FROM orders GROUP BY 1, 2),
        r AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY cnt DESC, o_orderpriority ASC) AS rn
          FROM c)
        SELECT o_custkey,
               o_orderpriority AS mode_priority,
               CAST(cnt AS BIGINT) AS mode_count
        FROM r WHERE rn = 1""",
    "q_join_fuzzy_name": """
        WITH nb AS (
          SELECT a.s_suppkey,
                 levenshtein(a.s_name, b.s_name) AS d,
                 b.s_suppkey AS b_key
          FROM supplier a JOIN supplier b ON a.s_suppkey <> b.s_suppkey
          WHERE levenshtein(a.s_name, b.s_name) <= 2)
        SELECT s_suppkey,
               COUNT(CASE WHEN d = 1 THEN 1 END) AS n_dist1,
               COUNT(CASE WHEN d = 2 THEN 1 END) AS n_dist2,
               CAST(MIN(d * 1000000 + b_key) % 1000000 AS BIGINT)
                 AS nearest_id,
               CAST(MIN(d * 1000000 + b_key) // 1000000 AS INTEGER)
                 AS nearest_dist
        FROM nb GROUP BY s_suppkey""",
    "q_agg_bitwise": """
        SELECT o_orderstatus,
               bit_and(o_orderkey & 65535) AS and16,
               bit_or(o_orderkey & 65535) AS or16,
               bit_xor(o_orderkey & 65535) AS xor16,
               CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS popcount_total,
               COUNT(CASE WHEN (o_orderkey & 15) <> 0 THEN 1 END)
                 AS n_low4_set,
               MAX((xor(o_orderkey, 255) << 2) & 1048575) AS max_xor_shift
        FROM orders
        GROUP BY o_orderstatus
        """,
    "q_pivot_status_by_year": """
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
               CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
               CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
               CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
        FROM orders GROUP BY 1 ORDER BY 1""",
    "q_subquery_scalar": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                      / COUNT(*) FROM orders)""",
    "q_subquery_correlated": """
        SELECT o.o_custkey, o.o_orderkey, o.o_totalprice AS max_price
        FROM orders o
        WHERE o.o_totalprice = (SELECT MAX(i.o_totalprice) FROM orders i
                                WHERE i.o_custkey = o.o_custkey)""",
    "q_agg_listagg": """
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name""",
    "q_agg_skew_kurtosis": f"""
        WITH s AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2)))
                      AS DOUBLE) AS s2,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))
                          * CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE) AS s3,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))
                          * CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2)))
                      AS DOUBLE) AS s4
          FROM lineitem GROUP BY 1),
        m AS (
          SELECT l_returnflag, n, s1 / n AS mu,
                 s2 / n - (s1 / n) * (s1 / n) AS m2,
                 s3 / n - 3.0 * (s1 / n) * s2 / n
                   + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
                 s4 / n - 4.0 * (s1 / n) * s3 / n
                   + 6.0 * (s1 / n) * (s1 / n) * s2 / n
                   - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
          FROM s)
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_rows,
               {sql_fround('mu', 'mean_qty', 4)},
               CASE WHEN m2 <= 0 THEN NULL
                    ELSE ROUND(m3 / sqrt(m2 * m2 * m2) + {EPS}, 6)
               END AS skewness,
               CASE WHEN m2 <= 0 THEN NULL
                    ELSE ROUND(m4 / (m2 * m2) - 3.0 + {EPS}, 6)
               END AS excess_kurtosis
        FROM m""",
    "q_agg_mad": f"""
        WITH m AS (
          SELECT o_orderstatus,
                 quantile_cont(o_totalprice, 0.5) AS med,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM orders GROUP BY 1),
        d AS (
          SELECT o.o_orderstatus, m.n, m.med,
                 ABS(o.o_totalprice - m.med) AS ad
          FROM orders o JOIN m ON o.o_orderstatus = m.o_orderstatus)
        SELECT o_orderstatus,
               MAX(n) AS n,
               {sql_fround('MAX(med)', 'median_price', 2)},
               {sql_fround('quantile_cont(ad, 0.5)', 'mad', 2)}
        FROM d GROUP BY o_orderstatus""",
    # identical cents fixed point, percentile_disc cumulative cut,
    # HUGEINT clamp/trim sums, and exact integer-DIV e6 means
    "q_agg_winsorized": """
        WITH pv AS (
          SELECT o_orderpriority AS priority,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                      AS BIGINT) AS v_cents,
                 COUNT(*) AS cnt
          FROM orders GROUP BY 1, 2),
        cum AS (
          SELECT priority, v_cents, cnt,
                 SUM(cnt) OVER (PARTITION BY priority ORDER BY v_cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 SUM(cnt) OVER (PARTITION BY priority) AS n
          FROM pv),
        qs AS (
          SELECT priority, n,
                 MIN(CASE WHEN cum >= (n + 19) // 20
                          THEN v_cents END) AS p05_c,
                 MIN(CASE WHEN cum >= (19 * n + 19) // 20
                          THEN v_cents END) AS p95_c
          FROM cum GROUP BY 1, 2),
        agg AS (
          SELECT pv.priority, qs.n, qs.p05_c, qs.p95_c,
                 SUM(CAST(GREATEST(LEAST(v_cents, p95_c), p05_c)
                          AS HUGEINT) * cnt) AS sw,
                 SUM(CASE WHEN v_cents BETWEEN p05_c AND p95_c
                          THEN CAST(v_cents AS HUGEINT) * cnt END) AS st,
                 CAST(SUM(CASE WHEN v_cents BETWEEN p05_c AND p95_c
                          THEN cnt END) AS BIGINT) AS n_kept
          FROM pv JOIN qs ON pv.priority = qs.priority
          GROUP BY 1, 2, 3, 4)
        SELECT priority, CAST(n AS BIGINT) AS n_orders,
               p05_c / 100.0 AS p05, p95_c / 100.0 AS p95,
               CAST((sw * 10000) // CAST(n AS HUGEINT) AS BIGINT)
                 / 1000000.0 AS mean_winsor,
               CAST((st * 10000) // CAST(n_kept AS HUGEINT) AS BIGINT)
                 / 1000000.0 AS mean_trimmed,
               n_kept
        FROM agg""",
    "q_agg_iqr_fences": f"""
        WITH s AS (
          SELECT o_orderstatus,
                 quantile_cont(o_totalprice, 0.25) AS q1,
                 quantile_cont(o_totalprice, 0.75) AS q3,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM orders GROUP BY o_orderstatus),
        f AS (
          SELECT o_orderstatus, n, q1, q3, q3 - q1 AS iqr,
                 q1 - 1.5 * (q3 - q1) AS lo,
                 q3 + 1.5 * (q3 - q1) AS hi
          FROM s),
        c AS (
          SELECT o.o_orderstatus,
                 CAST(COUNT(*) FILTER (o.o_totalprice < f.lo) AS BIGINT)
                   AS n_low_outliers,
                 CAST(COUNT(*) FILTER (o.o_totalprice > f.hi) AS BIGINT)
                   AS n_high_outliers
          FROM orders o JOIN f ON o.o_orderstatus = f.o_orderstatus
          GROUP BY 1)
        SELECT f.o_orderstatus, f.n,
               {sql_fround('f.q1', 'q1', 2)},
               {sql_fround('f.q3', 'q3', 2)},
               {sql_fround('f.iqr', 'iqr', 2)},
               c.n_low_outliers, c.n_high_outliers
        FROM f JOIN c ON f.o_orderstatus = c.o_orderstatus""",
    "q_agg_ttest_welch": f"""
        WITH s AS (
          SELECT event_type,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM({sql_dec('value')}) AS DOUBLE) AS sx,
                 CAST(SUM({sql_dec('value')} * {sql_dec('value')})
                      AS DOUBLE) AS sxx
          FROM events GROUP BY 1),
        m AS (
          SELECT event_type, n, sx / n AS m,
                 (sxx - sx * sx / n) / (n - 1.0) AS v
          FROM s WHERE n >= 2),
        b AS (SELECT n AS n0, m AS m0, v AS v0 FROM m
              WHERE event_type = 'view'),
        t AS (
          SELECT m.event_type, m.n, m.m, m.v, b.n0, b.m0, b.v0,
                 m.v / m.n + b.v0 / b.n0 AS se2
          FROM m LEFT JOIN b ON TRUE WHERE m.event_type <> 'view')
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               {sql_fround('m', 'mean_value')},
               {sql_fround('(m - m0) / sqrt(se2)', 't_stat')},
               {sql_fround(
                   '(se2 * se2) / ((v / n) * (v / n) / (n - 1.0)'
                   ' + (v0 / n0) * (v0 / n0) / (n0 - 1.0))',
                   'welch_df', 2)}
        FROM t""",
    "q_agg_percentiles": """
        SELECT o_orderstatus,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.5)  AS p50,
               quantile_cont(o_totalprice, 0.75) AS p75,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_page_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "q_unpivot_order_counts": """
        WITH wide AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
                 CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
                 CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
                 CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
          FROM orders GROUP BY 1)
        SELECT yr, 'n_f' AS status_col, n_f AS n_orders FROM wide
        UNION ALL SELECT yr, 'n_o', n_o FROM wide
        UNION ALL SELECT yr, 'n_p', n_p FROM wide""",
    "q_join_lateral": """
        SELECT n.n_name, t.o_orderkey, t.o_orderdate
        FROM nation n,
        LATERAL (
          SELECT o.o_orderkey, o.o_orderdate
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
          LIMIT 2
        ) t""",
    "q_agg_histogram": """
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(o_totalprice) AS lo,
               MAX(o_totalprice) AS hi
        FROM orders GROUP BY 1 ORDER BY 1""",
    "q_agg_rollup": f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(ROUND(SUM({_REV_DEC}), 2) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_agg_cube": """
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(user_id % 10, -1) AS user_bucket,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS sum_value,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY CUBE (event_type, user_id % 10)""",
    "q_agg_grouping_sets": """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""",
    "q_agg_collect": """
        SELECT l_orderkey,
               string_agg(l_linenumber, ',' ORDER BY l_linenumber)
                 AS line_numbers
        FROM lineitem GROUP BY l_orderkey""",
    "q_agg_stats": f"""
        WITH g AS (
          SELECT l_returnflag,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   AS sxx,
                 MEDIAN(l_quantity) AS med
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n_rows,
               ROUND(SQRT((sxx - sx * sx / n) / (n - 1)) + {EPS}, 6)
                 AS std_price,
               med AS median_qty
        FROM g ORDER BY l_returnflag""",
    "q_project_compute": f"""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND({_REV_DEC}, 2) AS DOUBLE) AS revenue,
               CAST(ROUND({sql_dec('l_extendedprice')} * {sql_dec('l_tax')}, 2)
                    AS DOUBLE) AS tax_amount
        FROM lineitem""",
    "q_filter_conj": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24""",
    "q_filter_disj_in": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R') OR l_quantity > 45""",
    "q_filter_like": """
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE p_type LIKE 'PROMO%' AND p_name LIKE '%a%'""",
    "q_filter_between_dates": """
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01'
                              AND TIMESTAMP '1997-12-31'""",
    "q_case_when": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    WHEN o_totalprice < 300000 THEN 'large'
                    ELSE 'jumbo' END AS price_tier,
               COALESCE(NULLIF(o_orderstatus, 'F'), 'final') AS status_label
        FROM orders""",
    "q_join_inner_bcast": """
        SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey""",
    "q_join_inner_shuffle": """
        SELECT l_orderkey, l_linenumber, l_quantity, o_orderdate, o_orderpriority
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "q_join_multiway_star": f"""
        SELECT n_name,
               CAST(ROUND(SUM({_REV_DEC}), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY n_name""",
    "q_join_left_outer": """
        SELECT c_custkey, c_name, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name""",
    "q_join_full_outer": """
        WITH y95 AS (
          SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_1995
          FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
          GROUP BY o_custkey),
        y96 AS (
          SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_1996
          FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
          GROUP BY o_custkey)
        SELECT COALESCE(y95.o_custkey, y96.o_custkey) AS custkey,
               COALESCE(n_1995, 0) AS n_1995,
               COALESCE(n_1996, 0) AS n_1996
        FROM y95 FULL OUTER JOIN y96 ON y95.o_custkey = y96.o_custkey""",
    "q_join_semi": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')""",
    "q_join_anti": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 400000)""",
    "q_join_cross_limited": """
        SELECT r_name, n_name FROM region CROSS JOIN nation""",
    "q_join_theta_range": """
        SELECT a.user_id AS user_id,
               a.event_id AS a_id,
               b.event_id AS b_id,
               date_diff('microsecond', a.ts, b.ts) AS micros_apart
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND date_diff('microsecond', a.ts, b.ts) BETWEEN 0 AND 300000000""",
    # shares the exact theta-range oracle: hash-equality proves the
    # time-bucket decomposition is lossless (the minhash↔near_pairs
    # precedent)
    "q_join_theta_bucketed": """
        SELECT a.user_id AS user_id,
               a.event_id AS a_id,
               b.event_id AS b_id,
               date_diff('microsecond', a.ts, b.ts) AS micros_apart
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND date_diff('microsecond', a.ts, b.ts) BETWEEN 0 AND 300000000""",
    # the PLAIN semi-join aggregate — equality proves the bloom pass is
    # a pure pre-filter (false positives removed, no false negatives)
    "q_join_bloom_prefilter": f"""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM({sql_dec('o_totalprice')}), 2) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'AUTOMOBILE')
        GROUP BY 1""",
    # deterministic as-of: "latest view at or before the purchase in
    # (ts, event_id) order". DuckDB's native ASOF JOIN matches on ts alone
    # and picks an ARBITRARY view among equal-µs ties (verified), so the
    # oracle spells out the exact (ts, event_id)-lexicographic semantics the
    # Spark union-scan implements — identical to ASOF on tie-free data.
    "q_join_asof": """
        SELECT p_event_id, user_id, p_ts, v_event_id, v_ts FROM (
          SELECT p.event_id AS p_event_id,
                 p.user_id AS user_id,
                 p.ts AS p_ts,
                 v.event_id AS v_event_id,
                 v.ts AS v_ts,
                 ROW_NUMBER() OVER (PARTITION BY p.event_id
                                    ORDER BY v.ts DESC, v.event_id DESC) AS rn
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON p.user_id = v.user_id
           AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id)))
        WHERE rn = 1""",
    "q_join_asof_tolerance": f"""
        WITH p AS (
          SELECT event_id AS p_event_id, user_id, ts AS p_ts
          FROM events WHERE event_type = 'purchase'),
        m AS (
          SELECT p_event_id, v_event_id, v_ts FROM (
            SELECT p.p_event_id,
                   v.event_id AS v_event_id,
                   v.ts AS v_ts,
                   ROW_NUMBER() OVER (PARTITION BY p.p_event_id
                                      ORDER BY v.ts DESC, v.event_id DESC)
                     AS rn
            FROM p JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id
             AND (v.ts < p.p_ts OR (v.ts = p.p_ts
                                    AND v.event_id < p.p_event_id)))
          WHERE rn = 1)
        SELECT p.p_event_id, p.user_id, p.p_ts,
               CASE WHEN date_diff('microsecond', m.v_ts, p.p_ts)
                         <= {_ASOF_TOL_US}
                    THEN m.v_event_id END AS v_event_id,
               CASE WHEN date_diff('microsecond', m.v_ts, p.p_ts)
                         <= {_ASOF_TOL_US}
                    THEN m.v_ts END AS v_ts,
               CASE WHEN date_diff('microsecond', m.v_ts, p.p_ts)
                         <= {_ASOF_TOL_US}
                    THEN CAST(date_diff('microsecond', m.v_ts, p.p_ts)
                              AS BIGINT) END AS gap_us
        FROM p LEFT JOIN m ON p.p_event_id = m.p_event_id""",
    "q_join_interval": """
        WITH bounds AS (
          SELECT date_trunc('day', MIN(ts)) AS d0,
                 date_trunc('day', MAX(ts)) AS d1
          FROM events),
        days AS (
          SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day_start
          FROM bounds)
        SELECT day_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM days JOIN events e
          ON e.ts >= day_start AND e.ts < day_start + INTERVAL 1 DAY
        GROUP BY day_start""",
    "q_agg_global": f"""
        SELECT CAST(ROUND(SUM({_REV_DEC}), 2) AS DOUBLE) AS total_revenue,
               {sql_davg('l_quantity', 'avg_qty')},
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem""",
    "q_agg_count_distinct": """
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type""",
    "q_agg_approx_quantile": """
        WITH li AS (SELECT l_returnflag, l_extendedprice FROM lineitem),
        approx AS (
          SELECT l_returnflag,
                 approx_quantile(l_extendedprice, 0.5) AS am,
                 approx_quantile(l_extendedprice, 0.99) AS ap99
          FROM li GROUP BY l_returnflag),
        checks AS (
          SELECT li.l_returnflag, COUNT(*) AS n_rows,
                 SUM(CASE WHEN li.l_extendedprice <= a.am
                          THEN 1 ELSE 0 END) AS rk_med,
                 SUM(CASE WHEN li.l_extendedprice <= a.ap99
                          THEN 1 ELSE 0 END) AS rk_p99,
                 SUM(CASE WHEN li.l_extendedprice < a.ap99
                          THEN 1 ELSE 0 END) AS rk_p99_lt
          FROM li JOIN approx a USING (l_returnflag)
          GROUP BY li.l_returnflag),
        ranked AS (
          SELECT l_returnflag, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice) AS rn,
                 COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          FROM li),
        exacts AS (
          SELECT l_returnflag,
                 MAX(CASE WHEN rn = CEIL(0.5 * n)
                          THEN l_extendedprice END) AS exact_median,
                 MAX(CASE WHEN rn = CEIL(0.99 * n)
                          THEN l_extendedprice END) AS exact_p99
          FROM ranked GROUP BY l_returnflag)
        SELECT c.l_returnflag, CAST(c.n_rows AS BIGINT) AS n_rows,
               e.exact_median, e.exact_p99,
               c.rk_med >= 0.45 * c.n_rows AND c.rk_med <= 0.55 * c.n_rows
                 AS median_bound_ok,
               c.rk_p99 >= 0.985 * c.n_rows
                 AND c.rk_p99_lt <= 0.995 * c.n_rows AS p99_bound_ok
        FROM checks c JOIN exacts e USING (l_returnflag)
        ORDER BY l_returnflag""",
    "q_agg_approx_distinct": """
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
                 <= 0.06 * COUNT(DISTINCT user_id) AS hll_bound_ok
        FROM events GROUP BY event_type ORDER BY event_type""",
    "q_agg_multi_distinct": """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_having": """
        SELECT event_type,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                 AS sum_value
        FROM events
        GROUP BY event_type
        HAVING SUM(CAST(value AS DECIMAL(12,2))) > 50000
        ORDER BY event_type""",
    "q_sort_multi": """
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        FROM lineitem
        ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
        LIMIT 100""",
    "q_union_all": """
        SELECT event_id, ts, event_type FROM events
        WHERE ts < TIMESTAMP '2024-01-15'
        UNION ALL
        SELECT event_id, ts, event_type FROM events
        WHERE ts >= TIMESTAMP '2024-01-15'""",
    "q_union_distinct": """
        SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000
        UNION
        SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'""",
    "q_intersect": """
        SELECT c_custkey AS custkey FROM customer
        WHERE c_mktsegment = 'AUTOMOBILE'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'""",
    "q_except": """
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'""",
    "q_distinct_dropdup": """
        SELECT DISTINCT event_type, user_id FROM events""",
}
