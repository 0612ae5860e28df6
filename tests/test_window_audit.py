"""Bounded-window audit (VERDICT r6 #6): an UNPARTITIONED window funnels
every row of its input through one task, so the only acceptable place for
one is a frame already bounded by construction — the output of an
aggregation (months/days/types/offset tables), a distinct, or a literal
local table. Until now this invariant lived only in docstrings and per-key
plan tests; here it is enforced mechanically for EVERY declared key, so a
new operator cannot silently introduce a global-sort window.

Mechanism: walk each key's optimized logical plan, find Window nodes with
an empty partitionSpec, and require an Aggregate / Deduplicate /
LocalRelation / one-row-limit node somewhere below — i.e. the window's
input cardinality is an aggregate's group count, never the raw table.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as spec

from tests.conftest import SF_SMOKE

# Iterative drivers run jobs during plan construction; their plans are
# audited too, just noted here for why construction is slower.
_BOUNDED_BELOW = {
    "Aggregate",        # groupBy / distinct-as-aggregate → group-count frame
    "Deduplicate",      # .distinct()
    "LocalRelation",    # literal tables (holt weights, calendar spines)
    "OneRowRelation",   # lit-only frames
    "CommandResult",
    "GlobalLimit",      # already-limited frames
}


def _iter_nodes(node):
    yield node
    for i in range(node.children().size()):
        yield from _iter_nodes(node.children().apply(i))


def _has_bounded_source(node) -> bool:
    return any(
        n.getClass().getSimpleName() in _BOUNDED_BELOW
        for n in _iter_nodes(node)
    )


def test_audit_catches_a_global_sort_window(spark):
    """Negative control: the audit must FLAG a raw-table global window,
    or a green main test proves nothing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpe.io import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    bad = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    plan = bad._jdf.queryExecution().optimizedPlan()
    flagged = [
        node
        for node in _iter_nodes(plan)
        if node.getClass().getSimpleName() == "Window"
        and node.partitionSpec().size() == 0
        and not _has_bounded_source(node.children().apply(0))
    ]
    assert flagged, "audit failed to flag a raw-table global window"


def test_every_unpartitioned_window_sits_on_a_bounded_frame(spark):
    offenders: list[str] = []
    for key, builder in spec.queries().items():
        df = builder(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().optimizedPlan()
        for node in _iter_nodes(plan):
            if node.getClass().getSimpleName() != "Window":
                continue
            if node.partitionSpec().size() > 0:
                continue
            # unpartitioned window: its child subtree must be bounded
            child = node.children().apply(0)
            if not _has_bounded_source(child):
                offenders.append(
                    f"{key}: unpartitioned Window over unbounded input — "
                    f"{child.getClass().getSimpleName()}"
                )
    assert not offenders, "\n".join(offenders)
