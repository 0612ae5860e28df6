"""Scalar-function families (SURVEY.md §2.7) — string, date, math, array,
JSON, map, and token explosion. Each family is exercised through one combined
query rather than one query per function.

All expressions are built-in pyspark.sql.functions (JVM whole-stage codegen;
no Python UDFs). Cross-engine dtype notes are inline — DuckDB widens many
results to BIGINT/DOUBLE where Spark stays INT/LONG, so oracles cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpe.common import EPS, dec, sql_davg
from gpe.io import load_table


def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_type").alias("lo_type"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
        F.regexp_extract("p_name", "([aeiou]+)", 1).alias("first_vowels"),
        F.col("p_name").contains("a").alias("has_a"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trim"
        ),
    )


def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias(
            "month_start"
        ),
        F.last_day("o_orderdate").cast("timestamp_ntz").alias("month_end"),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp_ntz").alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch0"
        ),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
    )


def q_scalar_date2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date/interval scalar family (§2.7 completeness beyond
    q_scalar_date): quarter, ISO week/day-of-year, add_months,
    months_between, and day-name extraction over order dates — the
    calendar arithmetic a time-series API leans on. All integer/string
    outputs except months_between, which both engines compute as the same
    31-day-normalized fraction (rounded to 8 in Spark; the oracle
    replicates the formula with integer parts so the compare is exact)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("qtr"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format("o_orderdate", "EEEE").alias("day_name"),
        F.add_months(F.col("o_orderdate"), 3).cast("timestamp_ntz").alias(
            "plus_quarter"
        ),
        F.trunc(F.col("o_orderdate"), "quarter")
        .cast("timestamp_ntz")
        .alias("quarter_start"),
        (F.year("o_orderdate") * F.lit(12) + F.month("o_orderdate"))
        .cast("long")
        .alias("month_index"),
    )


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    x = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        # decimal-space rounding (double ROUND at .x5 ties differs per engine)
        F.round(dec(x), 1).cast("double").alias("price_r1"),
        F.abs(x - 1000.0).alias("abs_diff"),
        F.ceil(x).alias("price_ceil"),
        F.floor(x).alias("price_floor"),
        # sqrt is IEEE-correctly-rounded → identical; ln/log10 are libm
        # (≤1 ulp drift possible) → epsilon-nudged rounding
        F.round(F.sqrt(x) + EPS, 6).alias("price_sqrt"),
        F.round(F.log(x) + EPS, 6).alias("price_ln"),
        F.round(F.log10(x) + EPS, 6).alias("price_log10"),
        (x * x).alias("price_sq"),
        F.signum(x - 1500.0).cast("int").alias("sign_vs_1500"),
        F.greatest(x, F.lit(1000.0)).alias("hi"),
        F.least(x, F.lit(1000.0)).alias("lo"),
    )


def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops with STRING-serialized array outputs (comma-joined, sorted
    where set-valued) — the driver's canonicalizer hashes rows via pandas
    and cannot hash list cells, so every declared output column must be a
    scalar type (§5.3). Semantics are unchanged: the string is a bijective
    encoding of the sorted array (tokens contain no commas)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(toks, 1, 3), ",").alias("first3"),
        F.array_join(F.sort_array(F.array_distinct(toks)), ",").alias(
            "uniq_sorted"
        ),
    )


def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus and count token frequencies (explode ≡ UNNEST).
    At 100 TB: explode is pipelined (no materialized blow-up) into the
    partial hash aggregate — the shuffle carries only (token, count)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(
                F.sum(dec("k")).cast("double") / F.count("k") + EPS, 6
            ).alias("avg_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props parsed into a derived MapType column → key list + element."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_value"),
    )


def q_scalar_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: split_part/translate/repeat/reverse/left/
    right/position/ascii/chr + starts/endswith over customer names."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.translate("c_name", "Cu", "Kv").alias("translated"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg_twice"),
        F.reverse("c_name").alias("rev_name"),
        F.substring("c_name", 1, 4).alias("left4"),
        F.col("c_name").substr(F.length("c_name") - 3, F.lit(4)).alias("right4"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.ascii("c_mktsegment").alias("seg_ascii"),
        F.chr(F.col("c_nationkey") + 65).alias("nation_chr"),
        F.col("c_name").startswith("Customer").alias("is_cust"),
        F.col("c_mktsegment").endswith("RY").alias("seg_ry"),
    )


def q_scalar_arrayops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra over each document's first/second token halves —
    intersections/unions/positions with internal sorting for hash
    stability (Spark and DuckDB order set-op results differently)."""
    d = load_table(spark, sf_dir, "documents")
    # explicit FLOOR: Spark's double→int cast truncates but DuckDB's
    # ROUNDS (29/2 → 14 vs 15) — another cross-engine cast trap
    toks = F.split("text", " ")
    n = F.size(toks)
    half = F.floor(n / 2).cast("int")
    a = F.slice(toks, 1, half)
    b = F.expr(
        "slice(split(text, ' '),"
        " CAST(FLOOR(size(split(text, ' '))/2) AS INT) + 1,"
        " size(split(text, ' ')))"
    )
    return d.select(
        "doc_id",
        F.array_join(
            F.sort_array(F.array_distinct(F.array_intersect(a, b))), ","
        ).alias("common_tokens"),
        F.size(F.array_distinct(F.array_union(a, b))).alias("n_union"),
        F.arrays_overlap(a, b).alias("halves_overlap"),
        F.array_position(toks, "the").alias("the_pos"),
    )


def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates per event type: count_if, bool_and,
    bool_or over the value column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_if(F.col("value") > 5).alias("n_high"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 9.9).alias("any_extreme"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def q_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pseudonymization / masking — the privacy pass every
    training-data pipeline runs before sharing a table: irreversible
    column hash (sha256), partial masking (all but the last 3 chars),
    a short join-stable pseudonym (hash prefix — still collision-safe at
    12 hex chars for ≪ 2^24 entities per SURVEY §2 scale envelope), and
    k-anonymity-style generalization of the numeric column into fixed
    1000-unit bands (floor → toward −∞ for negative balances, identical
    in both engines).

    Scale notes (100 TB): pure per-row map — no shuffle, whole-stage
    codegen end to end; sha256 is JVM-side (no Python boundary).
    Domain note: the mask expressions assume names ≥ 4 chars (true for
    the fixed `Customer#%09d` pattern, FIXTURES.md); sub-4-char inputs
    would hit the engines' diverging substr(·, 0, ·) edge semantics."""
    c = load_table(spark, sf_dir, "customer")
    h = F.sha2(F.col("c_name").cast("string"), 256)
    return c.select(
        "c_custkey",
        h.alias("name_sha256"),
        F.substring(h, 1, 12).alias("pseudonym"),
        F.concat(
            F.expr("repeat('*', length(c_name) - 3)"),
            F.expr("substr(c_name, length(c_name) - 2, 3)"),
        ).alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("long")
        .alias("bal_band"),
        "c_mktsegment",
    )


QUERIES = {
    "q_scalar_string": q_scalar_string,
    "q_pii_mask": q_pii_mask,
    "q_scalar_string2": q_scalar_string2,
    "q_scalar_arrayops": q_scalar_arrayops,
    "q_agg_conditional": q_agg_conditional,
    "q_scalar_date": q_scalar_date,
    "q_scalar_date2": q_scalar_date2,
    "q_scalar_math": q_scalar_math,
    "q_scalar_array": q_scalar_array,
    "q_explode_tokens": q_explode_tokens,
    "q_scalar_json": q_scalar_json,
    "q_scalar_map": q_scalar_map,
}

ORACLES = {
    # DuckDB: isodow-based day name via dayname(); week() is ISO week;
    # add_months ≡ ts + INTERVAL 3 MONTH (both clamp to month end);
    # quarter start via date_trunc('quarter')
    "q_scalar_date2": """
        SELECT o_orderkey,
               CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
               CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
               CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
               dayname(o_orderdate) AS day_name,
               CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)
                 AS plus_quarter,
               CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
                 AS quarter_start,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                 AS month_index
        FROM orders""",
    "q_pii_mask": """
        SELECT c_custkey,
               sha256(c_name) AS name_sha256,
               substr(sha256(c_name), 1, 12) AS pseudonym,
               concat(repeat('*', length(c_name) - 3),
                      substr(c_name, length(c_name) - 2, 3)) AS name_masked,
               CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
               c_mktsegment
        FROM customer""",
    "q_scalar_string2": """
        SELECT c_custkey,
               split_part(c_name, '#', 2) AS cust_num,
               translate(c_name, 'Cu', 'Kv') AS translated,
               repeat(c_mktsegment, 2) AS seg_twice,
               reverse(c_name) AS rev_name,
               left(c_name, 4) AS left4,
               right(c_name, 4) AS right4,
               CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
               CAST(ascii(c_mktsegment) AS INTEGER) AS seg_ascii,
               chr(c_nationkey + 65) AS nation_chr,
               starts_with(c_name, 'Customer') AS is_cust,
               c_mktsegment LIKE '%RY' AS seg_ry
        FROM customer""",
    "q_scalar_arrayops": """
        WITH t AS (
          SELECT doc_id,
                 string_split(text, ' ') AS toks,
                 string_split(text, ' ')[1:CAST(FLOOR(
                   len(string_split(text, ' '))/2) AS INTEGER)] AS a,
                 string_split(text, ' ')[CAST(FLOOR(
                   len(string_split(text, ' '))/2) AS INTEGER) + 1:] AS b
          FROM documents)
        SELECT doc_id,
               COALESCE(array_to_string(
                 list_sort(list_distinct(list_intersect(a, b))), ','),
                 '') AS common_tokens,
               CAST(len(list_distinct(list_concat(a, b))) AS INTEGER)
                 AS n_union,
               list_has_any(a, b) AS halves_overlap,
               CAST(COALESCE(list_position(toks, 'the'), 0) AS BIGINT)
                 AS the_pos
        FROM t""",
    "q_agg_conditional": """
        SELECT event_type,
               CAST(COUNT(*) FILTER (value > 5) AS BIGINT) AS n_high,
               bool_and(value >= 0) AS all_nonneg,
               bool_or(value > 9.9) AS any_extreme,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type ORDER BY event_type""",
    "q_scalar_string": """
        SELECT p_partkey,
               UPPER(p_name) AS up_name,
               LOWER(p_type) AS lo_type,
               CAST(LENGTH(p_name) AS INTEGER) AS name_len,
               SUBSTRING(p_name, 1, 5) AS name_pre,
               CONCAT_WS('-', p_brand, p_type) AS brand_type,
               LPAD(p_brand, 12, '*') AS brand_pad,
               REPLACE(p_type, ' ', '_') AS type_us,
               string_split(p_type, ' ')[1] AS type_head,
               regexp_extract(p_name, '([aeiou]+)', 1) AS first_vowels,
               p_name LIKE '%a%' AS has_a,
               TRIM('  ' || p_brand || '  ') AS brand_trim
        FROM part""",
    "q_scalar_date": """
        SELECT o_orderkey,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
               CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dom,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                 AS month_start,
               CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
               o_orderdate + INTERVAL 30 DAY AS plus30,
               CAST(date_diff('day', DATE '1995-01-01', o_orderdate)
                    AS INTEGER) AS days_since_epoch0,
               CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
        FROM orders""",
    "q_scalar_math": f"""
        SELECT p_partkey,
               CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DOUBLE)
                 AS price_r1,
               ABS(p_retailprice - 1000.0) AS abs_diff,
               CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
               CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
               ROUND(SQRT(p_retailprice) + {EPS}, 6) AS price_sqrt,
               ROUND(LN(p_retailprice) + {EPS}, 6) AS price_ln,
               ROUND(LOG10(p_retailprice) + {EPS}, 6) AS price_log10,
               p_retailprice * p_retailprice AS price_sq,
               CAST(SIGN(p_retailprice - 1500.0) AS INTEGER) AS sign_vs_1500,
               GREATEST(p_retailprice, 1000.0) AS hi,
               LEAST(p_retailprice, 1000.0) AS lo
        FROM part""",
    "q_scalar_array": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               array_to_string(string_split(text, ' ')[1:3], ',') AS first3,
               array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                               ',') AS uniq_sorted
        FROM documents""",
    "q_explode_tokens": """
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token""",
    "q_scalar_json": f"""
        SELECT event_type,
               MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
               {sql_davg("CAST(json_extract_string(props, '$.k') AS INTEGER)", "avg_k")},
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type ORDER BY event_type""",
    "q_scalar_map": """
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
        FROM events""",
}
