"""Bounded-window audit, r11 tightening (VERDICT r10 #4): an UNPARTITIONED
window funnels every row of its input through one task, so the only
acceptable place for one is a frame that is PROVABLY small. Until r10 the
audit ran on the optimized plan and accepted "an Aggregate somewhere
below" — a policy gap, because an aggregate's group count can itself be
OPEN cardinality (token counts, pair counts, distinct-value supports grow
with the corpus): exactly the shapes that admitted the r10 zipf/bpe global
head cuts. This version:

1. audits the ANALYZED plan (the authored shape — the optimizer's
   limit-pushdown rewrites old-zipf-style `filter(rank<=k)` into
   GlobalLimit and would hide the policy violation);
2. classifies aggregates: a grouped Aggregate / Deduplicate bounds the
   frame ONLY if its grouping is partition-id-shaped (offset tables of
   the two-pass recipes — cardinality = partition count) or carries an
   explicit JUSTIFIED allowlist entry below (closed enums, calendar
   units, guarded vocabularies). Anything else — token/pair/value/key
   groupings — is an offender: use the two-stage salted top-k
   (gpe/text.zipf_fit_frame's shape) or a two-pass range-partition
   recipe (gpe/common.py) instead;
3. accepts the two-stage contraction structurally: a rank Filter over a
   PARTITIONED window bounds its output (≤ buckets × k rows).

A new key with an unpartitioned window over an open aggregate now fails
this test unless its author adds an allowlist entry with a justification
— the same contract as a lint suppression.
"""

from __future__ import annotations

import re

import __spark_entry__ as spec

from tests.conftest import SF_SMOKE

# Grouping columns that bound an aggregate by construction: the two-pass
# offset tables group by spark_partition_id (cardinality = partition
# count, never the data).
_PID_NAMES = {"pid", "_pid"}

# Justified closed-cardinality groupings, keyed by (query_key, kind,
# normalized grouping signature). Signature = sorted grouping-expression
# strings with exprIds stripped, so changing a key's grouping breaks the
# entry and forces a re-justification here.
_ENUM_ENTROPY_COLS = (
    "o_orderstatus",
    "o_orderpriority",
    "l_returnflag",
    "l_linestatus",
    "event_type",
    "lang",
    "source",
)
# r15: the _CLOSED_VOCAB_DISTINCT_KEYS block (nine keys funneling through
# gpe/dedup._vocab's row_number-over-distinct(token) window) is GONE — the
# vocabulary is now a broadcast 1-row sorted array (_vocab_array, still
# raise_error-guarded at _MAX_VOCAB) and the per-doc mask is a map-side
# fold, so no unpartitioned vocab window exists to allowlist.
ALLOWLIST: dict[tuple, str] = {
    **{
        ("q_catalog_column_entropy", "agg", (f"cast({c} as string)",)): (
            "_ENTROPY_COLS are fixed enum/categorical columns — value "
            "histogram bounded by the enum domain"
        )
        for c in _ENUM_ENTROPY_COLS
    },
    (
        "q_ts_mom_growth",
        "agg",
        ("cast(date_trunc(month, cast(o_orderdate as timestamp), "
         "some(utc)) as timestamp_ntz)",),
    ): "calendar months — bounded by the date domain, not the data",
    (
        "q_ts_vwap",
        "agg",
        ("cast(date_trunc(month, cast(l_shipdate as timestamp), "
         "some(utc)) as timestamp_ntz)",),
    ): "calendar months — bounded by the date domain, not the data",
    (
        "q_win_drawdown",
        "agg",
        ("cast(date_trunc(month, cast(o_orderdate as timestamp), "
         "some(utc)) as timestamp_ntz)",),
    ): "calendar months — bounded by the date domain, not the data",
    (
        "q_win_rolling_corr",
        "agg",
        ("cast(date_trunc(day, cast(ts as timestamp), "
         "some(utc)) as timestamp_ntz)",),
    ): "calendar days — bounded by the date domain, not the data",
    ("q_ts_survival_km", "agg", ("dur_days",)): (
        "day-granular durations inside a bounded observation window "
        "(datediff of two calendar-bounded dates)"
    ),
    ("q_agg_decile_lift", "agg", ("decile",)): (
        "NTILE(10) bucket ids — cardinality fixed at 10 by the query "
        "constant"
    ),
}


def _children(n):
    return [n.children().apply(i) for i in range(n.children().size())]


def _iter_nodes(node):
    yield node
    for c in _children(node):
        yield from _iter_nodes(c)


_EXPRID = re.compile(r"#\d+L?")


def _norm(s: str) -> str:
    return _EXPRID.sub("", s).strip().lower()


def _agg_signature(node) -> tuple:
    ge = node.groupingExpressions()
    return tuple(
        sorted(_norm(ge.apply(i).toString()) for i in range(ge.size()))
    )


def _dedup_signature(node) -> tuple:
    ks = node.keys()
    return tuple(sorted(_norm(ks.apply(i).toString()) for i in range(ks.size())))


_BOUNDED_LEAF = {"LocalRelation", "OneRowRelation", "CommandResult"}
_PASS_THROUGH = {
    "Filter",
    "Project",
    "Sort",
    "SubqueryAlias",
    "Repartition",
    "RepartitionByExpression",
    "Window",
    "WithColumns",
    "Generate",
    "Expand",
    "Tail",
    "ResolvedHint",
}


def _bounded(node, key: str, offenders: list) -> bool:
    """True iff node's output cardinality is bounded by construction
    under the policy above. Appends a reason per violation."""
    nm = node.getClass().getSimpleName()
    if nm in _BOUNDED_LEAF or nm in ("GlobalLimit", "LocalLimit"):
        return True
    if nm == "Filter":
        # two-stage contraction: a rank filter directly over a
        # PARTITIONED window (possibly through projections) bounds the
        # frame to buckets x k
        c = _children(node)[0]
        cc = c
        while cc.getClass().getSimpleName() in ("Project", "SubqueryAlias"):
            cc = _children(cc)[0]
        if (
            cc.getClass().getSimpleName() == "Window"
            and cc.partitionSpec().size() > 0
        ):
            return True
        return _bounded(c, key, offenders)
    if nm == "Aggregate":
        sig = _agg_signature(node)
        if not sig:
            return True  # global aggregate: one row
        if set(sig) <= _PID_NAMES:
            return True  # two-pass offset table: cardinality = #partitions
        if (key, "agg", sig) in ALLOWLIST:
            return True
        # row-count-reducing: an aggregate OVER a bounded frame is bounded
        if _bounded(_children(node)[0], key, []):
            return True
        offenders.append(
            f"{key}: unpartitioned window over OPEN-cardinality "
            f"Aggregate{sig} — use the two-stage salted top-k or a "
            "two-pass recipe, or add a justified allowlist entry"
        )
        return False
    if nm == "Deduplicate":
        sig = _dedup_signature(node)
        if (key, "distinct", sig) in ALLOWLIST:
            return True
        if _bounded(_children(node)[0], key, []):
            return True
        offenders.append(
            f"{key}: unpartitioned window over OPEN-cardinality "
            f"Deduplicate{sig} — same remedies as an open Aggregate"
        )
        return False
    if nm in _PASS_THROUGH:
        return _bounded(_children(node)[0], key, offenders)
    if nm in ("Join", "Union", "Intersect", "Except"):
        return all(_bounded(c, key, offenders) for c in _children(node))
    offenders.append(
        f"{key}: unpartitioned window over unbounded/unknown node {nm}"
    )
    return False


def _audit(df, key: str) -> list:
    """All policy violations for one DataFrame's ANALYZED plan."""
    offenders: list = []
    seen = set()
    for node in _iter_nodes(df._jdf.queryExecution().analyzed()):
        if node.getClass().getSimpleName() != "Window":
            continue
        if node.partitionSpec().size() > 0:
            continue
        # dedupe DAG re-expansions (self-joins revisit the same node)
        ident = node.semanticHash()
        if ident in seen:
            continue
        seen.add(ident)
        _bounded(_children(node)[0], key, offenders)
    return offenders


def test_audit_flags_the_r10_zipf_shape(spark):
    """Negative control 1 — the exact policy gap this audit was tightened
    to close (VERDICT r10 #2): a global row_number head cut directly over
    an open token-count aggregate must be FLAGGED, even though the
    optimizer rewrites it into a GlobalLimit (which is why the audit runs
    on the analyzed plan)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpe.io import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    w_rk = Window.orderBy(F.desc("c"), "w")
    bad = cnt.withColumn("rank", F.row_number().over(w_rk)).filter(
        F.col("rank") <= 100
    )
    assert _audit(bad, "zipf_replica"), "audit missed the r10 zipf shape"


def test_audit_flags_a_raw_table_global_window(spark):
    """Negative control 2: a raw-table global window is still flagged."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpe.io import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    bad = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    assert _audit(bad, "raw_replica"), "audit missed a raw global window"


def test_audit_flags_an_unlisted_open_aggregate(spark):
    """Negative control 3: grouping by a KEY column (open cardinality,
    not pid-shaped, not allowlisted) must be flagged."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpe.io import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    per_doc = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    bad = per_doc.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert _audit(bad, "open_agg_replica"), "audit missed an open aggregate"


def test_audit_accepts_the_two_stage_contraction(spark):
    """Positive control: the fixed zipf head cut (stage-1 salted
    partitioned rank filter -> stage-2 global re-rank) passes —
    structurally, via the Filter-over-partitioned-Window rule."""
    from pyspark.sql import functions as F

    from gpe.io import load_table
    from gpe.text import zipf_fit_frame

    d = load_table(spark, SF_SMOKE, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("w"))
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    assert _audit(zipf_fit_frame(cnt), "zipf_fixed") == []


def test_every_unpartitioned_window_sits_on_a_bounded_frame(spark):
    offenders: list[str] = []
    for key, builder in spec.queries().items():
        df = builder(spark, SF_SMOKE)
        offenders.extend(_audit(df, key))
    assert not offenders, "\n".join(sorted(set(offenders)))


def test_allowlist_entries_are_live(spark):
    """Every allowlist entry must still match a real plan node — a stale
    entry is a silent policy hole (the key was fixed or regrouped but the
    suppression stayed)."""
    hits: set[tuple] = set()
    qs = spec.queries()
    keys_with_entries = {k for (k, _, _) in ALLOWLIST}
    for key in keys_with_entries:
        df = qs[key](spark, SF_SMOKE)
        for node in _iter_nodes(df._jdf.queryExecution().analyzed()):
            nm = node.getClass().getSimpleName()
            if nm == "Aggregate":
                ent = (key, "agg", _agg_signature(node))
            elif nm == "Deduplicate":
                ent = (key, "distinct", _dedup_signature(node))
            else:
                continue
            if ent in ALLOWLIST:
                hits.add(ent)
    stale = set(ALLOWLIST) - hits
    assert not stale, f"stale allowlist entries: {sorted(stale)}"
