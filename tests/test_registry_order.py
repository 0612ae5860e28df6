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
