"""Assert the FIXTURES.md facts so a driver-side data change is detected
loudly (SURVEY.md §5.4)."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.01"

EXPECTED_COUNTS = {
    "region": 5,
    "nation": 25,
    "customer": 1500,
    "supplier": 100,
    "part": 2000,
    "orders": 15000,
    "lineitem": 60000,
    "events": 10000,
    "documents": 500,
    "embeddings": 500,
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


@pytest.mark.parametrize("table,n", sorted(EXPECTED_COUNTS.items()))
def test_row_counts(con, table, n):
    got = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/{table}.parquet')"
    ).fetchone()[0]
    assert got == n


def test_fk_closure(con):
    q = """
    SELECT
      (SELECT COUNT(*) FROM read_parquet('{sf}/lineitem.parquet') l
        LEFT JOIN read_parquet('{sf}/orders.parquet') o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL),
      (SELECT COUNT(*) FROM read_parquet('{sf}/orders.parquet') o
        LEFT JOIN read_parquet('{sf}/customer.parquet') c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL)
    """.format(sf=SF)
    dangling_li, dangling_o = con.execute(q).fetchone()
    assert dangling_li == 0 and dangling_o == 0


def test_embeddings_unit_norm(con):
    off = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{SF}/embeddings.parquet')
            WHERE ABS(SQRT(list_aggregate(list_transform(embedding, x -> x*x), 'sum')) - 1.0) > 1e-5"""
    ).fetchone()[0]
    assert off == 0


def test_measures_are_two_decimal(con):
    """The hash-stability scheme in gpe/common.py depends on this."""
    for table, col in [
        ("lineitem", "l_extendedprice"),
        ("lineitem", "l_discount"),
        ("lineitem", "l_tax"),
        ("lineitem", "l_quantity"),
        ("orders", "o_totalprice"),
        ("events", "value"),
        ("customer", "c_acctbal"),
    ]:
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{SF}/{table}.parquet')"
            f" WHERE ROUND({col}, 2) <> {col}"
        ).fetchone()[0]
        assert n == 0, f"{table}.{col} has >2-decimal values"
