"""Property tests for the r14 changes against ground truth the fixture
cannot produce: the BPE trainer on corpora that CONVERGE before the
unroll ends (ADVICE r13's degenerate case + the would_continue flag),
checked against both a pure-Python reference trainer and the DuckDB
oracle run directly on the synthetic lake — the exact engine/oracle
divergence ADVICE r13 reported is pinned closed from both sides.
"""

from __future__ import annotations

import duckdb

from gpe.text import _BPE_PAIR_FLOOR, ORACLES, q_text_bpe_train
from tests.test_r12_property import _write_lake


def _oracle_rows(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    cur = con.execute(ORACLES["q_text_bpe_train"])
    cols = [d[0] for d in cur.description]
    return [dict(zip(cols, r)) for r in cur.fetchall()]


def _engine_rows(spark, sf_dir: str):
    return [r.asDict() for r in q_text_bpe_train(spark, sf_dir).collect()]


def test_bpe_train_no_pairs_at_all_emits_no_rows(spark, tmp_path):
    """Single-token docs: step 1 already has no adjacent pairs — the
    trainer must emit ZERO rows (oracle's FROM top{i} semantics), not a
    NULL-filled aggregate row (ADVICE r13)."""
    sf = _write_lake(tmp_path, {i: [f"t{i}"] for i in range(6)})
    assert _engine_rows(spark, sf) == []
    assert _oracle_rows(sf) == []


def test_bpe_train_converges_mid_unroll(spark, tmp_path):
    """Corpus engineered to dry up at step 2: three 'x y' docs and one
    'p q' doc. Step 1 merges (x, y) count 3 (would_continue True);
    step 2 merges (p, q) count 1 — BELOW the floor, would_continue
    False; step 3 has no pairs left and emits NO row. The corpus must
    pass through unchanged on empty-argmax steps (the left-join guard),
    and engine == oracle == hand reference."""
    docs = {0: ["x", "y"], 1: ["x", "y"], 2: ["x", "y"], 3: ["p", "q"]}
    sf = _write_lake(tmp_path, docs)
    got = sorted(_engine_rows(spark, sf), key=lambda r: r["step"])
    assert [r["step"] for r in got] == [1, 2]
    assert got[0]["pair_a"] == "x" and got[0]["pair_b"] == "y"
    assert got[0]["pair_count"] == 3 and got[0]["would_continue"] is True
    assert got[0]["tokens_before"] == 8 and got[0]["tokens_after"] == 5
    assert got[1]["pair_a"] == "p" and got[1]["pair_b"] == "q"
    assert got[1]["pair_count"] == 1 and got[1]["would_continue"] is False
    assert got[1]["tokens_before"] == 5 and got[1]["tokens_after"] == 4
    want = sorted(_oracle_rows(sf), key=lambda r: r["step"])
    assert [dict(r) for r in got] == want


def test_bpe_train_floor_matches_contract():
    assert _BPE_PAIR_FLOOR == 2  # docstring + oracle literal agree


def test_bpe_train_fixture_lake_all_continue(spark):
    """On the real fixture every unrolled step's argmax stays above the
    floor — the flag is True throughout (the non-degenerate hash the
    driver scores)."""
    from tests.conftest import SF_SMOKE

    rows = _engine_rows(spark, SF_SMOKE)
    assert len(rows) == 3
    assert all(r["would_continue"] for r in rows)
