"""Registry-order regression net (VERDICT r1, next-round #2/#8).

The driver hash-verifies exactly the first 50 keys of queries() per round,
so registry order IS coverage policy. These tests pin the intended
hard-signal window so a refactor can't silently rotate driver verification
away from the families that still lack hard signal.
"""

from gpe import registry


def test_first_50_is_the_declared_hard_signal_set():
    keys = list(registry.queries().keys())
    assert keys[:50] == registry.HARD_SIGNAL_FIRST_50
    assert len(registry.HARD_SIGNAL_FIRST_50) == 50


def test_priority_keys_all_exist_and_unique():
    keys = list(registry.queries().keys())
    assert len(keys) == len(set(keys))
    pri = registry.HARD_SIGNAL_FIRST_50 + registry._SECOND_WAVE
    assert len(pri) == len(set(pri))
    assert set(pri) <= set(keys)


def test_reorder_loses_no_keys_and_every_oracle_has_a_query():
    qs = registry.queries()
    oracles = registry.oracle_sql()
    assert len(qs) >= 111  # round-1 inventory is the floor, never shrink
    assert set(oracles) <= set(qs)


def test_doc_counts_match_registry():
    """README.md and SURVEY.md quote the declared-key total; SURVEY §2 is
    the scored contract, so doc drift is a grading bug (VERDICT r6 #7:
    assert the three counts mechanically equal)."""
    import re

    n = len(registry.queries())
    readme = open("README.md").read()
    m = re.search(r"(\d+) declared query keys", readme)
    assert m and int(m.group(1)) == n, f"README count != registry ({n})"
    survey = open("SURVEY.md").read()
    m = re.search(r"Inventory totals: (\d+) declared `queries\(\)` keys", survey)
    assert m and int(m.group(1)) == n, f"SURVEY count != registry ({n})"
    # every declared key has a full oracle — both docs claim it
    assert len(registry.oracle_sql()) == n
