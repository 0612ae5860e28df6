"""Sources and sinks (SURVEY.md §2.1).

Scale notes (100 TB): a table here is one parquet file per scale factor, but
every loader goes through ``spark.read.parquet`` which handles
directory-of-files layouts identically, so at cluster scale the same code
reads a partitioned lake directory. Column pruning and predicate pushdown
are preserved by returning lazy DataFrames and never calling actions here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region and
# nation are fixed-size; customer/supplier/part grow with sf but stay tiny
# relative to the facts — at 100 TB the facts are lineitem/orders/events, and
# these dims remain broadcastable or at worst shuffle-joined by AQE).
BROADCAST_DIMS = frozenset({"region", "nation"})


# Input-spread floor: below this the table is a broadcast-dim-scale frame
# whose decode is trivial either way — adding an exchange is pure overhead.
# There is deliberately NO byte cap: the spread is OPT-IN per call site
# (load_table_spread), and a site opts in exactly because its map-side work
# (shingling, 64 minhash transforms, 64-dim decimal folds) dominates any
# one-time round-robin shuffle of the rows. A blanket spread in load_table
# was measured and REJECTED: for wide fact tables the map-side partial
# aggregate already contracts rows inside the scan stage, so shuffling them
# costs more than it buys (lineitem count-agg 0.3 s unspread vs 0.7-0.9 s
# spread at sf0.1).
_SPREAD_MIN_BYTES = 32 * 1024


def _spread_input(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Parallelize single-row-group file scans (r14; guide §2.5 "input
    skew: one huge unsplittable file").

    Every fixture table is written as ONE parquet row group, and a row
    group is parquet's split unit — so every scan stage ran as ONE task
    regardless of `maxPartitionBytes`, and everything map-side behind it
    (tokenizing, the 64 minhash transforms, 64-dim decimal folds)
    inherited the single-threaded stage. A round-robin repartition to
    the session parallelism right after the read spreads the decode
    output once and restores the parallelism a real lake layout gives
    for free — for the tables where that map work dominates (see the
    byte-window comment above: spreading a wide fact table costs more
    in shuffle than it buys, because partial aggregation already
    contracts it inside the scan stage).

    SCALE-ADAPTIVE, not a local[32] constant: the gate reads the file's
    actual row-group count (memoized beside the schema, driver-side, no
    Spark job) and adds the exchange ONLY when the layout under-splits
    the session (row_groups·2 < parallelism) and the file is above the
    trivial-size floor. At 100 TB — thousands of files × many row
    groups — the gate is permanently off and no shuffle is added;
    values are partitioning-independent by the engine's cross-engine
    hash discipline (every aggregate exact-decimal / total-ordered),
    which full-registry oracle parity re-verifies."""
    import os as _os

    # A/B escape hatch; default is the layout-derived gate. Unknown values
    # raise instead of silently behaving as "auto" (ADVICE r14 #4: a typo'd
    # SPARK_GRAFT_SCAN_SPREAD=of during an A/B run must fail loudly, not
    # quietly measure the wrong arm).
    mode = _os.environ.get("SPARK_GRAFT_SCAN_SPREAD", "auto")
    if mode == "off":
        return df
    if mode != "auto":
        raise ValueError(
            f"SPARK_GRAFT_SCAN_SPREAD={mode!r}: expected 'auto' or 'off'"
        )
    try:
        st = _os.stat(path)
    except OSError:
        return df  # non-local URI: splittability is the lake's problem
    if st.st_size < _SPREAD_MIN_BYTES:
        return df
    key = ("rowgroups", path, st.st_mtime_ns, st.st_size)
    rg = _SCHEMA_CACHE.get(key)
    if rg is None:
        try:
            import pyarrow.parquet as pq

            rg = pq.ParquetFile(path).metadata.num_row_groups
        except Exception as e:  # noqa: BLE001
            rg = 1 << 30  # unreadable footer → assume splittable, add nothing
            # log ONCE per file version (the memo key dedups): the A/B
            # escape behavior must be observable, not silent (ADVICE r14 #4)
            import sys as _sys

            print(
                f"gpe.io: row-group footer read failed for {path}"
                f" ({e!r}); assuming splittable (no spread)",
                file=_sys.stderr,
            )
        _SCHEMA_CACHE[key] = rg
    par = spark.sparkContext.defaultParallelism
    if rg * 2 >= par:
        return df
    return df.repartition(par)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table. Filters/projections applied by the
    caller push down into this scan (verified in tests/test_explain.py).

    ``events.ts`` is TIMESTAMP(NANOS) at rest, which Spark's vectorized
    parquet reader rejects; we read it as nanos-since-epoch longs and
    truncate to µs — byte-identical to DuckDB's own ns→µs truncation of the
    same file (verified), so oracle hashes agree.
    """
    # All timestamps in this lake are naive wall-clock values (parquet
    # isAdjustedToUTC=false → Spark reads TIMESTAMP_NTZ), matching DuckDB's
    # naive TIMESTAMP. Pin the session tz so any ltz↔ntz conversion a
    # downstream expression introduces is the identity on the stored value
    # regardless of the machine/driver timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_cached_schema(spark, sf_dir, name)
        # ns-at-rest files arrive as longs (convert); files already written
        # with µs timestamps pass through (normalized to NTZ either way)
        if isinstance(df.schema["ts"].dataType, LongType):
            return df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return _read_cached_schema(spark, sf_dir, name)


def load_table_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """load_table + the single-row-group input spread — OPT-IN for builders
    whose first map stage is compute-dense (shingling, the 64 minhash
    transforms, n×k decimal assignment folds). Measured per consumer at
    sf0.1 before opting each in (OPTIMIZATION_r14.md): a blanket spread in
    load_table regressed light consumers by the cost of the added exchange
    (e.g. q_text_tfidf_topterms 0.7 → 1.4 s), while the minhash/fold-dense
    consumers gain 25-45%."""
    return _spread_input(
        spark, load_table(spark, sf_dir, name), f"{sf_dir}/{name}.parquet"
    )


# Schema memo: Spark runs one footer-read JOB per schema-less
# spark.read.parquet call; with 120 builders each touching 1-4 tables that
# is hundreds of redundant metadata jobs per session (and at lake scale a
# footer sample over a 100k-file listing). One inference per (sf_dir,
# table), then every later read passes the schema explicitly and plan
# construction is fully job-free (asserted in tests/test_builders_lazy.py).
# Keyed by (path, mtime_ns, size) — NOT path alone (ADVICE r2): a file
# regenerated in place with a different schema must re-infer, not silently
# apply the stale schema and corrupt columns.
_SCHEMA_CACHE: dict = {}


def _read_cached_schema(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    path = f"{sf_dir}/{name}.parquet"
    # non-local URIs (s3://, hdfs://) have no os.stat; BYPASS the memo
    # entirely there (ADVICE r5) — a degenerate path-only key could never
    # invalidate, so a remote file regenerated in place mid-session would
    # silently serve its stale schema. Spark's own footer read handles the
    # remote case; the memo only exists to dedup LOCAL footer jobs, with
    # the mtime/size key catching in-place regeneration (ADVICE r2).
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Declared queries (§2.1)
# ---------------------------------------------------------------------------


def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of lineitem, stable column order."""
    return load_table(spark, sf_dir, "lineitem")


def q_scan_projected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan — Catalyst prunes the parquet ReadSchema to
    exactly these three columns (asserted in tests/test_explain.py)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )


def q_scan_all_tables_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count of each of the 10 tables as (table_name, n_rows).

    Catalog-surface query: at lake scale each count() is a metadata-only
    parquet footer read (Spark's LocalLimit/statistics fast path), so this
    stays cheap even over 100 TB of files.
    """
    parts = [
        load_table(spark, sf_dir, name)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(name).alias("table_name"), "n_rows")
        for name in TABLES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-explicit CSV source (header expected). Schema-on-read with an
    EXPLICIT schema — never inferSchema in production paths: inference scans
    the data twice and types drift between files at lake scale."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-explicit JSON-lines source. Corrupt records are quarantined in
    _corrupt_record (PERMISSIVE mode) rather than failing the job."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """ORC source — the second columnar lake format Spark reads natively
    (vectorized reader, predicate pushdown, column pruning — same scan
    properties as parquet). Schema optional: ORC footers carry types, but
    production paths should still pass one to skip the footer-sample job
    (same policy as the parquet schema memo above)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (snappy default) — round-trip partner of read_orc."""
    df.write.mode("overwrite").orc(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Bucketed managed table — the co-located-join layout for 100 TB
    fact-fact joins: two tables bucketed on the same key join with ZERO
    exchange (verified in tests/test_scale_techniques.py). On a cluster
    this is the difference between re-shuffling petabytes per join and
    reading pre-shuffled buckets."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def salt_keys(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Skew mitigation: spread a hot key over n_salts sub-keys via a
    deterministic hash of a secondary column set (never a random() — keeps
    retries/speculative tasks consistent). Aggregations then run in two
    stages: partial on (key, salt), final on key — see
    tests/test_scale_techniques.py for the composed pattern."""
    all_cols = [F.col(c) for c in df.columns]
    return df.withColumn(
        "_salt", F.pmod(F.hash(*all_cols), F.lit(n_salts))
    )


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Lake sink: partitioned parquet write (smoke-tested, not driver-scored).

    At scale this is the canonical lake layout — one directory per partition
    value enables partition pruning for downstream readers.
    """
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed CO-LOCATED fact-fact join, driver-visible: lineitem and
    orders are written as managed tables bucketed 8-ways on the join key,
    then joined through the bucket layout — at 100 TB this is the
    difference between re-shuffling petabytes on every join and reading
    pre-shuffled buckets (the warehouse's standing layout investment).
    The driver-green hash proves the bucketed write + bucketed-table join
    produces exactly the plain join's answer; the ZERO-join-side-exchange
    plan property is asserted in tests/test_explain.py (broadcast
    disabled there so the bucket layout, not a broadcast, is what removes
    the shuffle).

    WRITE-PATH-BY-DESIGN: plan construction performs the two bucketed
    writes (the layout IS the operator under test); the returned plan is
    the lazy join + aggregate over the bucketed tables.
    tests/test_builders_lazy.py carries the pinned exemption."""
    import os as _os

    sfname = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    tli, to = f"gpe_bjoin_li_{sfname}", f"gpe_bjoin_o_{sfname}"

    # a managed table's LOCATION outlives the session-scoped metastore:
    # a fresh session that re-runs the key would fail saveAsTable with
    # LOCATION_ALREADY_EXISTS — drop both the catalog entry and the dir
    def _clear(table: str) -> None:
        import shutil
        from urllib.parse import urlparse

        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(_os.path.join(wh, table), ignore_errors=True)

    _clear(tli)
    _clear(to)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, tli, "l_orderkey", 8)
    write_bucketed(o, to, "o_orderkey", 8)
    from gpe.common import dec

    revenue = dec("l_extendedprice") * dec(1 - F.col("l_discount"))
    return (
        spark.table(tli)
        .join(
            spark.table(to), F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
        )
    )


def q_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source/sink made driver-visible (the csv/json readers were
    unit-test-only per the §2.1 plan): the part table is written as
    JSON-lines and read back with an EXPLICIT schema (schema-on-read,
    no inference pass), then profiled per brand. The oracle profiles the
    SOURCE parquet, so a green hash proves the JSON round trip is
    lossless — including the double shortest-repr print → re-parse cycle
    for retail prices.

    WRITE-PATH-BY-DESIGN: plan construction performs the write (the
    interchange format round trip IS the operator under test); the
    returned plan is the lazy readback profile. Scale notes (100 TB):
    the write is a shuffle-free pass; the explicit schema keeps the read
    single-pass (inference would double-scan the files)."""
    import os as _os

    from gpe.common import scratch_path

    sfname = _os.path.basename(sf_dir.rstrip("/"))
    # PID-unique scratch (ADVICE r7): concurrent sessions must not share
    # a write-path directory (overwrite-vs-readback race)
    path = scratch_path(f"json_roundtrip_{sfname}")
    part = load_table(spark, sf_dir, "part")
    part.write.mode("overwrite").json(path)
    back = spark.read.schema(part.schema).json(path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum(F.col("p_retailprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total_price"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink made driver-visible (VERDICT r7 #4 — JSON
    graduated in r7, CSV was still unit-test-only): orders is written as
    headered CSV with an explicit timestamp format and read back with an
    EXPLICIT schema + the same format, then profiled per order status.
    The oracle profiles the SOURCE parquet, so a green hash pins the
    whole CSV dialect trap surface — quoting, timestamp print/parse,
    double shortest-repr round trip, type re-parse — losslessly.

    WRITE-PATH-BY-DESIGN: plan construction performs the write (the
    interchange round trip IS the operator under test); the returned
    plan is the lazy readback profile. Scale notes (100 TB): shuffle-free
    write; the explicit schema keeps the read single-pass (inference
    would double-scan) and the pinned timestampFormat keeps parsing
    locale/version-independent."""
    import os as _os

    from gpe.common import scratch_path

    sfname = _os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path(f"csv_roundtrip_{sfname}")
    orders = load_table(spark, sf_dir, "orders")
    tsfmt = "yyyy-MM-dd HH:mm:ss"
    (
        orders.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", tsfmt)
        .csv(path)
    )
    back = (
        spark.read.schema(orders.schema)
        .option("header", "true")
        .option("timestampFormat", tsfmt)
        .csv(path)
    )
    from gpe.common import dec

    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.round(F.sum(dec("o_totalprice")), 2)
        .cast("double")
        .alias("total_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read path (VERDICT r7 #5): real lakes append
    files and ADD columns over time — never one static file per table.
    Orders is split into two write "eras": era 1 (even orderkeys) lands
    WITHOUT o_orderpriority, era 2 (odd orderkeys) with it. The directory
    pair is read back through ``mergeSchema`` (the added column
    back-fills NULL for era-1 files) and profiled per era: row count,
    rows carrying the new column, exact-decimal revenue, key range. The
    oracle computes the same two-era profile from the SOURCE table, so a
    green hash proves the drifted-schema union reads losslessly and the
    NULL back-fill hits exactly the era-1 rows.

    WRITE-PATH-BY-DESIGN (the evolved layout IS the operator under
    test). Scale notes (100 TB): mergeSchema samples ALL footers — on a
    100k-file lake pin the merged schema explicitly once discovered (the
    schema-memo policy above); the readback profile is one partial-agg
    shuffle."""
    import os as _os

    from gpe.common import dec, scratch_path

    sfname = _os.path.basename(sf_dir.rstrip("/"))
    base = scratch_path(f"schema_evolution_{sfname}")
    p1, p2 = _os.path.join(base, "era1"), _os.path.join(base, "era2")
    orders = load_table(spark, sf_dir, "orders")
    era1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    era2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    era1.write.mode("overwrite").parquet(p1)
    era2.write.mode("overwrite").parquet(p2)
    back = spark.read.option("mergeSchema", "true").parquet(p1, p2)
    era = F.when(F.col("o_orderpriority").isNull(), 1).otherwise(2)
    return back.groupBy(era.alias("schema_era")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderpriority").alias("n_with_priority"),
        F.round(F.sum(dec("o_totalprice")), 2)
        .cast("double")
        .alias("total_price"),
        F.min("o_orderkey").alias("min_orderkey"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink made driver-visible — the last §2.1 interchange
    format still unit-test-only after JSON (r7) and CSV (r8) graduated:
    customer is written as ORC and read back with an EXPLICIT schema,
    then profiled per market segment. The oracle profiles the SOURCE
    parquet, so a green hash proves the ORC round trip is lossless —
    including the double column (ORC stores IEEE doubles natively, so
    unlike CSV/JSON there is no print→parse cycle to survive; a mismatch
    here would mean type coercion, not formatting).

    WRITE-PATH-BY-DESIGN: plan construction performs the write (the
    interchange round trip IS the operator under test); the returned
    plan is the lazy readback profile. Scale notes (100 TB): shuffle-free
    columnar write; the explicit schema skips footer-driven inference on
    the read; ORC carries column statistics so the same predicate/
    projection pushdown as parquet applies to the readback scan."""
    import os as _os

    from gpe.common import dec, scratch_path

    sfname = _os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path(f"orc_roundtrip_{sfname}")
    cust = load_table(spark, sf_dir, "customer")
    cust.write.mode("overwrite").orc(path)
    back = spark.read.schema(cust.schema).orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count_distinct("c_nationkey").alias("n_nations"),
        F.round(F.sum(dec("c_acctbal")), 2).cast("double").alias("total_bal"),
        F.min("c_custkey").alias("min_custkey"),
        F.max("c_custkey").alias("max_custkey"),
    )


QUERIES = {
    "q_scan_parquet": q_scan_parquet,
    "q_scan_projected": q_scan_projected,
    "q_scan_all_tables_counts": q_scan_all_tables_counts,
    "q_join_bucketed_colocated": q_join_bucketed_colocated,
    "q_source_json_roundtrip": q_source_json_roundtrip,
    "q_source_csv_roundtrip": q_source_csv_roundtrip,
    "q_source_schema_evolution": q_source_schema_evolution,
    "q_source_orc_roundtrip": q_source_orc_roundtrip,
}

ORACLES = {
    # profile of the SOURCE table — hash-equality with the ORC readback
    # proves the columnar round trip (types, native IEEE doubles) is
    # lossless
    "q_source_orc_roundtrip": """
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_bal,
               MIN(c_custkey) AS min_custkey,
               MAX(c_custkey) AS max_custkey
        FROM customer GROUP BY 1""",
    # profile of the SOURCE table — hash-equality with the CSV readback
    # proves the CSV dialect round trip (quoting, timestamp format,
    # double shortest-repr) is lossless
    "q_source_csv_roundtrip": """
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_price,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order
        FROM orders GROUP BY 1""",
    # the same two-era profile computed from the SOURCE table — equality
    # proves the mergeSchema union read is lossless and the NULL
    # back-fill hits exactly the era-1 rows
    "q_source_schema_evolution": """
        SELECT 1 AS schema_era,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(0 AS BIGINT) AS n_with_priority,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_price,
               MIN(o_orderkey) AS min_orderkey,
               MAX(o_orderkey) AS max_orderkey
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT 2 AS schema_era,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_with_priority,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_price,
               MIN(o_orderkey) AS min_orderkey,
               MAX(o_orderkey) AS max_orderkey
        FROM orders WHERE o_orderkey % 2 = 1""",
    "q_source_json_roundtrip": """
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_price,
               MIN(p_size) AS min_size,
               MAX(p_size) AS max_size
        FROM part GROUP BY 1""",
    "q_join_bucketed_colocated": """
        SELECT o_orderpriority, l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(1 - l_discount AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2""",
    "q_scan_parquet": "SELECT * FROM lineitem",
    "q_scan_projected": "SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem",
    "q_scan_all_tables_counts": " UNION ALL ".join(
        f"SELECT '{name}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM {name}"
        for name in TABLES
    ),
}
