"""CSV/JSON source round-trips (SURVEY.md §2.1 source row) and the dtype
parity lock: every oracle key's Spark schema must map 1:1 onto the DuckDB
result types (the driver compares schemas; tools/parity only checks names)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

import __spark_entry__ as spec
from gpe.io import load_table, read_csv, read_json
from tools.parity import duck_connect

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_schema_explicit(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    p = str(tmp_path / "nation_csv")
    nation.write.option("header", "true").mode("overwrite").csv(p)
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    back = read_csv(spark, p, schema)
    assert back.schema == schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """ORC round-trips losslessly and keeps the parquet-grade scan
    properties: an explicit schema skips inference, and a filter reaches
    the ORC scan as a pushed predicate."""
    from gpe.io import read_orc, write_orc

    nation = load_table(spark, SF, "nation")
    p = str(tmp_path / "nation_orc")
    write_orc(nation, p)
    back = read_orc(spark, p, nation.schema)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )
    plan = (
        read_orc(spark, p, nation.schema)
        .filter("n_regionkey = 2")
        .select("n_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "n_regionkey" in plan


def test_json_roundtrip_and_corrupt_quarantine(spark, tmp_path):
    region = load_table(spark, SF, "region")
    p = str(tmp_path / "region_json")
    region.write.mode("overwrite").json(p)
    schema = StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    back = read_json(spark, p, schema).select("r_regionkey", "r_name")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, region.collect()))
    # corrupt line lands in _corrupt_record instead of failing the read
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "x.json").write_text('{"r_regionkey": 1, "r_name": "A"}\nnot json\n')
    # Spark disallows filtering on _corrupt_record alone over the raw
    # source — cache the parsed frame first (documented workaround)
    got = read_json(spark, str(bad), schema).cache()
    try:
        assert got.filter("_corrupt_record IS NOT NULL").count() == 1
    finally:
        got.unpersist()


# DuckDB relation type → Spark simpleString equivalence (naive TIMESTAMP
# pairs with timestamp_ntz per the NTZ alignment)
_TYPE_MAP = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp_ntz",
    "DATE": "date",
    "BLOB": "binary",
    "DOUBLE[]": "array<double>",
    "FLOAT[]": "array<float>",
    "VARCHAR[]": "array<string>",
    "INTEGER[]": "array<int>",
    "BIGINT[]": "array<bigint>",
}

_QS = spec.queries()
_ORACLES = spec.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF)
    yield con
    con.close()


def test_file_stats_matches_duckdb_parquet_metadata(spark):
    """gpe.catalog.file_stats vs DuckDB's parquet footer readers — the
    parity promised in its docstring (ADVICE r3): row counts, row-group
    counts, leaf-column counts, and compressed/uncompressed byte totals
    must agree exactly (both sides read the same footers)."""
    import duckdb

    from gpe.catalog import TABLES, file_stats

    got = {
        r["table_name"]: (
            r["n_rows"],
            r["n_row_groups"],
            r["n_leaf_columns"],
            r["compressed_bytes"],
            r["uncompressed_bytes"],
        )
        for r in file_stats(spark, SF).collect()
    }
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF}/{t}.parquet"
        n_rows, n_rg = con.execute(
            "SELECT num_rows, num_row_groups FROM parquet_file_metadata(?)",
            [path],
        ).fetchone()
        n_cols, comp, unc = con.execute(
            """SELECT COUNT(DISTINCT column_id),
                      SUM(total_compressed_size),
                      SUM(total_uncompressed_size)
               FROM parquet_metadata(?)""",
            [path],
        ).fetchone()
        assert got[t] == (n_rows, n_rg, n_cols, comp, unc), t


@pytest.mark.parametrize("key", sorted(_ORACLES))
def test_dtype_parity(key, spark, duck):
    st = {
        f.name: f.dataType.simpleString()
        for f in _QS[key](spark, SF).schema.fields
    }
    rel = duck.sql(_ORACLES[key])
    dt = dict(zip(rel.columns, [str(t) for t in rel.types]))
    for col, spark_t in st.items():
        duck_t = _TYPE_MAP.get(dt.get(col, "?"), dt.get(col, "?").lower())
        assert duck_t == spark_t, f"{key}.{col}: spark={spark_t} duck={dt.get(col)}"


def test_load_table_reads_multifile_directory(spark, tmp_path):
    """VERDICT r7 missing #3: every fixture table is ONE parquet file, but
    real lakes append files — load_table must read a directory-of-files
    table identically (same spark.read.parquet path, schema memo keyed on
    the directory stat)."""
    import pandas as pd

    from gpe.io import load_table as lt

    src = lt(spark, SF, "nation").toPandas()
    d = tmp_path / "multifile" / "nation.parquet"
    d.mkdir(parents=True)
    # two part files, disjoint halves
    src.iloc[:10].to_parquet(str(d / "part-000.parquet"))
    src.iloc[10:].to_parquet(str(d / "part-001.parquet"))

    back = lt(spark, str(tmp_path / "multifile"), "nation")
    assert back.schema == lt(spark, SF, "nation").schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.itertuples(index=False, name=None))
    )


def test_merge_schema_backfills_added_column(spark, tmp_path):
    """mergeSchema semantics pinned: a column added in a later file era
    back-fills NULL for early-era rows and only early-era rows."""
    import pandas as pd
    from pyspark.sql import functions as F

    p1, p2 = str(tmp_path / "era1"), str(tmp_path / "era2")
    pd.DataFrame({"k": [1, 2], "x": [10.0, 20.0]}).to_parquet(
        p1 + ".parquet"
    )
    pd.DataFrame(
        {"k": [3, 4], "x": [30.0, 40.0], "y": ["a", "b"]}
    ).to_parquet(p2 + ".parquet")
    back = spark.read.option("mergeSchema", "true").parquet(
        p1 + ".parquet", p2 + ".parquet"
    )
    assert set(back.columns) == {"k", "x", "y"}
    rows = {r.k: r.y for r in back.collect()}
    assert rows == {1: None, 2: None, 3: "a", 4: "b"}
