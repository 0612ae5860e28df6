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


def test_ngram_true_pairs_stay_above_lsh_knee(con):
    """Recall contract guard for q_dedup_ngram_lsh (see the ORACLES note in
    gpe/dedup.py): the 32×2 banding has P(miss | J) = (1 − J²)^32 — ≈1e-4
    right at the J=0.5 verify threshold but ≤4e-9 at J=0.7. Exact equality
    with the exact-Jaccard oracle is only sound while every TRUE pair's J
    stays ≥ 0.7. If a regenerated fixture trips this, raise the band count
    in gpe/dedup.py rather than chasing a phantom correctness bug."""
    min_j = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id,
                 generate_subscripts(string_split(text, ' '), 1) AS pos,
                 unnest(string_split(text, ' ')) AS tok
          FROM read_parquet('{SF}/documents.parquet')),
        grams AS (
          SELECT DISTINCT doc_id,
                 tok || '|' || lead(tok, 1) OVER w || '|' || lead(tok, 2) OVER w AS g
          FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
          QUALIFY lead(tok, 2) OVER w IS NOT NULL),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT MIN(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter))
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE 2 * inter > sa.sz + sb.sz - inter
        """
    ).fetchone()[0]
    assert min_j is not None and min_j >= 0.7, (
        f"fixture now has a true near-threshold pair (min J = {min_j}); "
        "q_dedup_ngram_lsh's banding needs more bands to keep exact recall"
    )


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


def test_quantity_fits_tight_decimal(con):
    """q_agg_skew_kurtosis casts quantity to DECIMAL(4,2) so q**4 stays
    inside precision 38 — a regenerated fixture with quantities >= 100
    would overflow the cast loudly, but assert the domain here so the
    failure names the cause."""
    lo, hi = con.execute(
        f"SELECT MIN(l_quantity), MAX(l_quantity)"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()
    assert lo >= 0 and hi < 100, (lo, hi)


def test_documents_are_ascii(con):
    """The multimodal oracles equate byte arithmetic with ord(substr(...))
    codepoints — only true for ASCII text. A regenerated fixture with
    multibyte text must fail HERE, not as a silent hash mismatch."""
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
        " WHERE strlen(text) <> length(text)"
    ).fetchone()[0]
    assert n == 0


def test_event_values_cover_tombstone_branches(con):
    """q_cdc_compact_deletes derives op = 'D' from value < 5; the fixture
    must exercise BOTH branches among per-key LATEST changes or the
    delete path degenerates to untested."""
    alive, total = con.execute(
        f"""
        WITH r AS (
          SELECT user_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM read_parquet('{SF}/events.parquet'))
        SELECT COUNT(*) FILTER (value >= 5.0), COUNT(*)
        FROM r WHERE rn = 1
        """
    ).fetchone()
    assert 0 < alive < total, (alive, total)
