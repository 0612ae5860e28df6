"""Change-data-capture / table-maintenance operators (SURVEY.md §2.12,
round 5) — the data-lake API surface a warehouse exposes for mutating and
historizing tables, expressed as pure relational transforms so the same
plans run on any storage layer (Delta/Iceberg implement exactly these
shapes under MERGE INTO and snapshot expiry).

Scale notes (100 TB):
- MERGE upsert is ONE equi-join on the merge key: broadcast when the
  change batch is small (the overwhelmingly common CDC case — hinted
  here), shuffle-join on the key otherwise. The output is the new table
  snapshot — in a real lakehouse only touched files rewrite (copy-on-
  write), but the JOIN is the same.
- Changelog compaction (latest-per-key) is the standard shuffle-once
  row_number pattern — state bounded by #keys, not #changes.
- SCD2 historization is a per-key window (lag/lead) — one shuffle on the
  business key, intervals derive map-side after the sort.

Determinism: prices go through exact DECIMAL(12,2) arithmetic (both
engines agree bit-for-bit after the final double cast); interval
timestamps are carried as-is (µs instants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpe.io import load_table

# deterministic change-batch derivation shared by builder and oracle:
# ~10% of orders get an update (status → 'U', price + 100.00), and the
# o_orderkey % 17 = 3 slice re-enters as brand-new keys. The insert-key
# offset is max(o_orderkey)+1 — derived from the data, NOT a constant, so
# the inserted keys stay disjoint from the base key space at EVERY scale
# factor (a fixed 100M offset collides once SF ≳ 4: TPC-H sparse orderkeys
# reach 24M·SF). The 1-row max aggregate broadcasts; both engines share
# the same derivation so parity holds by construction.


def _change_batch(o: DataFrame) -> DataFrame:
    mx = o.agg((F.max("o_orderkey") + F.lit(1)).alias("_ins_base"))
    upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(12,2)") + F.lit(100.00))
        .cast("double")
        .alias("o_totalprice"),
    )
    ins = (
        o.filter(F.col("o_orderkey") % 17 == 3)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("o_orderkey") + F.col("_ins_base")).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    return upd.unionByName(ins)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (SCD1 upsert): apply a deterministic change batch to the
    orders table — WHEN MATCHED update status/price, WHEN NOT MATCHED
    insert. Emits the post-merge snapshot with a merge_action audit column
    ('kept' / 'updated' / 'inserted').

    The naive formulation is one FULL OUTER join — but Spark cannot
    broadcast a full outer join (falls back to SortMergeJoin: full shuffle
    + sort of the billion-row base — verified in the executed plan). The
    shipped plan is the textbook copy-on-write MERGE decomposition every
    lakehouse engine runs: with the change batch broadcast, the base table
    is only ever the STREAMED side of broadcast hash joins —
      kept     = base LEFT ANTI  ⊕bcast(src)   (untouched rows)
      updated  = base INNER      ⊕bcast(src)   (new image from src)
      inserted = src  LEFT ANTI  ⊕bcast(matched keys from `updated`)
    Zero shuffles of the base at any scale; the plan test asserts no
    SortMergeJoin survives. src and the matched-key frame (both
    change-batch-sized) are persisted — each feeds two consumers."""
    from gpe.common import persist_tracked

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src = persist_tracked(_change_batch(o))
    s = src.select(
        F.col("o_orderkey").alias("s_key"),
        F.col("o_orderstatus").alias("s_status"),
        F.col("o_totalprice").alias("s_price"),
    )
    updated = persist_tracked(
        o.join(F.broadcast(s), o.o_orderkey == s.s_key, "inner").select(
            "o_orderkey",
            "o_custkey",
            F.col("s_status").alias("o_orderstatus"),
            F.col("s_price").alias("o_totalprice"),
            F.lit("updated").alias("merge_action"),
        )
    )
    kept = o.join(
        F.broadcast(src.select("o_orderkey")), "o_orderkey", "left_anti"
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit("kept").alias("merge_action"),
    )
    inserted = src.join(
        F.broadcast(updated.select("o_orderkey")), "o_orderkey", "left_anti"
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit("inserted").alias("merge_action"),
    )
    return kept.unionByName(updated).unionByName(inserted)


def q_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: the events stream read as a CDC log keyed by
    (user_id, event_type) — keep only the LATEST change per key (ts, then
    event_id as the uniquifying tie-break), the materialized-view state a
    streaming upsert sink maintains. One shuffle on the key; state bounded
    by #keys."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", "ts", "event_id", "value")
    )


def q_cdc_compact_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction WITH TOMBSTONES — the missing op-code half of
    q_cdc_compact: each change carries an upsert/delete op (derived
    deterministically here: value < 5 marks the change a tombstone —
    data-derived so the fixture exercises BOTH latest-op branches per
    key), the final state keeps the latest change per key and DROPS keys
    whose latest op is a delete. This is the Debezium/Kafka-compaction
    contract (null-payload tombstone removes the key) that a lakehouse
    MERGE sink must honor.

    Scale notes (100 TB): identical shape to q_cdc_compact — one shuffle
    on the key, row_number argmax, state bounded by #keys; the tombstone
    filter is a post-argmax predicate, zero extra cost."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        "value",
        F.when(F.col("value") < F.lit(5.0), F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") == "U"))
        .select("user_id", "event_type", "ts", "event_id", "value")
    )


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 historization of the purchase stream: per user, each purchase
    event opens a validity interval [valid_from, valid_to) that the next
    purchase closes; the current row carries NULL valid_to and
    is_current = true. The dimension-history build every warehouse runs —
    one shuffle on the business key, lead() over the per-key sort."""
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.col("event_id").alias("version_event_id"),
        F.col("value").alias("attr_value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def q_cdc_scd2_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-snapshot extraction from the SCD2 purchase history — the
    `dim_current` view every warehouse derives from its historized
    dimension (q_scd2_intervals' NULL-open row), enriched with the
    version count and first-seen timestamp per key.

    Spark-first: instead of building the full interval table and
    filtering is_current (two consumers of the window pass), the
    snapshot is ONE groupBy with argmax-as-aggregate (max-of-struct on
    the same (ts, event_id) version order the SCD2 build sorts by —
    identical winner, engine-exact) plus count/min — a single shuffle,
    no window, no join. Scale notes (100 TB): one map-side-partial
    shuffle to #keys rows; state O(1) per key."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    agg = e.groupBy("user_id").agg(
        F.max(
            F.struct(
                F.col("ts").alias("ts"),
                F.col("event_id").alias("eid"),
                F.col("value").alias("v"),
            )
        ).alias("cur"),
        F.count(F.lit(1)).alias("n_versions"),
        F.min("ts").alias("first_seen"),
    )
    return agg.select(
        "user_id",
        F.col("cur.eid").alias("current_event_id"),
        F.col("cur.v").alias("current_value"),
        F.col("cur.ts").alias("valid_from"),
        "n_versions",
        "first_seen",
    )


def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (IVM): the per-customer
    view  (n_orders, total_spent)  updated from the CDC change batch by
    DELTA ARITHMETIC — never rescanning the merged table. Updates
    contribute (new − old) price per key, inserts contribute (+1, +price);
    the delta aggregate (change-batch-sized) broadcasts onto the old view.
    The oracle recomputes the view FROM SCRATCH over the post-merge
    snapshot, so the driver check IS the IVM equivalence theorem
    (incremental ≡ full recompute).

    Scale notes (100 TB): in production the old view is the materialized
    table (zero scan) and before-images ride the changelog; both derive
    from base here to keep the query self-contained — the before-image
    lookup is the standard broadcast join of the tiny delta against base.
    The view-side work is one broadcast join: no shuffle of the view, no
    scan of the merged table. Delta custkeys ⊆ view custkeys by
    construction (updates/inserts reference existing customers), so a
    LEFT join suffices; a general IVM would full-outer-merge new group
    keys. Arithmetic stays in exact DECIMAL until the final round."""
    from gpe.common import persist_tracked

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src = persist_tracked(_change_batch(o))
    old_view = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_base"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("s_base"),
    )
    upd = src.filter(F.col("o_orderstatus") == "U").select(
        F.col("o_orderkey").alias("u_key"),
        F.col("o_totalprice").alias("new_price"),
    )
    upd_delta = o.join(F.broadcast(upd), o.o_orderkey == upd.u_key).select(
        "o_custkey",
        (
            F.col("new_price").cast("decimal(12,2)")
            - F.col("o_totalprice").cast("decimal(12,2)")
        ).alias("sdelta"),
        F.lit(0).cast("long").alias("cdelta"),
    )
    ins_delta = src.filter(F.col("o_orderstatus") == "N").select(
        "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("sdelta"),
        F.lit(1).cast("long").alias("cdelta"),
    )
    delta = (
        upd_delta.unionByName(ins_delta)
        .groupBy("o_custkey")
        .agg(F.sum("sdelta").alias("sdelta"), F.sum("cdelta").alias("cdelta"))
    )
    return old_view.join(F.broadcast(delta), "o_custkey", "left").select(
        "o_custkey",
        (F.col("n_base") + F.coalesce("cdelta", F.lit(0))).alias("n_orders"),
        F.round(
            F.col("s_base")
            + F.coalesce(F.col("sdelta"), F.lit(0).cast("decimal(12,2)")),
            2,
        )
        .cast("double")
        .alias("total_spent"),
    )


def q_join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each non-purchase event joined to
    the SCD2 purchase-history version valid at its timestamp
    (valid_from ≤ ts < valid_to, NULL-open current row) — the standard
    warehouse pattern of enriching a fact against a slowly-changing
    dimension AS OF the fact time.

    Spark-first plan: NOT an interval join (which would range-explode);
    the interval predicate collapses to an as-of carry — flag dimension
    versions inline on ONE scan (no dim/fact union), sort each user by
    (ts, dim-first, event_id), and carry the last version forward. The
    carried version is
    by construction the latest with valid_from ≤ ts, and its valid_to is
    either NULL or the next version's valid_from > ts, so the interval
    containment holds without ever evaluating it: ONE shuffle on user_id,
    zero joins. Zero-length versions (two purchases in the same µs) are
    correctly shadowed: the carry order ends on the higher event_id,
    exactly the row the oracle's from ≤ ts < to predicate selects.
    Events before a user's first purchase have no valid version and drop
    (inner semantics), mirroring the oracle's JOIN."""
    from pyspark.sql import Window

    # ONE scan: every event row is either a dimension version (purchase)
    # or a fact row — no dim/fact union (which would read the table
    # twice); the flag is computed inline
    u = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("_is_dim"),
        "event_type",
        F.col("value").alias("_attr"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.desc("_is_dim"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(col):
        return F.last(
            F.when(F.col("_is_dim") == 1, col), ignorenulls=True
        ).over(w)

    return (
        u.select(
            "user_id",
            "ts",
            "event_id",
            "_is_dim",
            "event_type",
            carry(F.col("event_id")).alias("version_event_id"),
            carry(F.col("_attr")).alias("attr_value"),
            carry(F.col("ts")).alias("valid_from"),
        )
        .filter(
            (F.col("_is_dim") == 0) & F.col("version_event_id").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("event_ts"),
            "event_type",
            "version_event_id",
            "attr_value",
            "valid_from",
        )
    )


def q_lake_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot table diff — the time-travel `DESCRIBE CHANGES`
    endpoint every lakehouse exposes (Delta CDF / Iceberg changelog):
    snapshot v1 and v2 of orders are WRITTEN as real parquet snapshots
    (deterministically derived — v2 drops o_orderkey%89=5, adds back
    %97=3 which v1 lacked, bumps price +1.00 on %10=0), read back, and
    FULL-OUTER diffed on the key into per-(change_type, status) counts
    with the exact-decimal price delta and key range.

    WRITE-PATH-BY-DESIGN (the snapshot pair on disk IS the operator
    under test); the oracle recomputes both snapshot definitions
    logically from the source table, so a green hash proves the diff
    classification AND the parquet round-trip of both eras.

    Scale notes (100 TB): the diff is ONE full-outer sort-merge join
    co-partitioned on the snapshot key — in a real lakehouse you'd
    prune unchanged FILES first via manifest min/max, then run exactly
    this join over the touched partitions; the summary is one partial-
    agg shuffle of ≤ |types|×|statuses| rows."""
    import os as _os

    from gpe.common import dec, scratch_path

    sfname = _os.path.basename(sf_dir.rstrip("/"))
    base = scratch_path(f"snapshot_diff_{sfname}")
    p1, p2 = _os.path.join(base, "v1"), _os.path.join(base, "v2")
    # both snapshots carry the price as exact DECIMAL(12,2) so the v2
    # bump and the diff delta never touch float rounding
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        dec("o_totalprice").alias("o_totalprice"),
    )
    k = F.col("o_orderkey")
    v1 = o.filter(k % 97 != 3)
    v2 = o.filter(k % 89 != 5).withColumn(
        "o_totalprice",
        F.when(
            k % 10 == 0,
            (F.col("o_totalprice") + F.lit(1).cast("decimal(12,2)")).cast(
                "decimal(12,2)"
            ),
        ).otherwise(F.col("o_totalprice")),
    )
    v1.write.mode("overwrite").parquet(p1)
    v2.write.mode("overwrite").parquet(p2)
    b1 = spark.read.parquet(p1).alias("v1")
    b2 = spark.read.parquet(p2).alias("v2")
    j = b1.join(
        b2, F.col("v1.o_orderkey") == F.col("v2.o_orderkey"), "full_outer"
    )
    ctype = (
        F.when(F.col("v1.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("v2.o_orderkey").isNull(), F.lit("removed"))
        .when(
            dec("v1.o_totalprice") != dec("v2.o_totalprice"),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    delta = F.when(
        F.col("v1.o_orderkey").isNotNull()
        & F.col("v2.o_orderkey").isNotNull(),
        dec("v2.o_totalprice") - dec("v1.o_totalprice"),
    ).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        j.select(
            ctype.alias("change_type"),
            F.coalesce(
                F.col("v2.o_orderstatus"), F.col("v1.o_orderstatus")
            ).alias("status"),
            F.coalesce(
                F.col("v2.o_orderkey"), F.col("v1.o_orderkey")
            ).alias("key"),
            delta.alias("delta"),
        )
        .groupBy("change_type", "status")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("delta"), 2).cast("double").alias("price_delta"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
    )


_FORGET_MOD = 97  # deterministic erasure batch: c_custkey % 97 == 0


def _forget_leg(
    name: str, base: DataFrame, key: str, keys: DataFrame, bcast: bool
) -> DataFrame:
    """One erasure-propagation leg (factored from q_gov_forget_audit for
    the corpus/index legs of q_gov_forget_corpus): flag base rows whose
    `key` matches the erasure set `keys` (column `k`), emit (table_name,
    n_before, n_purged, n_after, n_residual_refs) with the residual
    RE-probed against the post-purge frame by a second, independent join
    — a broken purge leg cannot certify itself."""
    marked = keys.select("k").withColumn("_del", F.lit(1))
    if bcast:
        marked = F.broadcast(marked)
    flagged = base.join(marked, base[key] == marked["k"], "left")
    stats = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(F.coalesce(F.col("_del"), F.lit(0)))
        .cast("long")
        .alias("n_purged"),
    )
    remaining = flagged.filter(F.col("_del").isNull()).select(
        *[F.col(cn) for cn in base.columns]
    )
    resid = remaining.join(marked, remaining[key] == marked["k"], "left").agg(
        F.sum(F.coalesce(F.col("_del"), F.lit(0)))
        .cast("long")
        .alias("n_residual_refs")
    )
    return stats.crossJoin(resid).select(
        F.lit(name).alias("table_name"),
        "n_before",
        "n_purged",
        (F.col("n_before") - F.col("n_purged")).cast("long").alias("n_after"),
        "n_residual_refs",
    )


def q_gov_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR / right-to-be-forgotten propagation audit (VERDICT r12
    next-round #8): apply a deterministic erasure batch (customers with
    c_custkey % 97 == 0 — the arrival-slice idiom of q_dedup_delta) and
    PROPAGATE the deletion through every table that references the
    erased identity — orders by o_custkey, lineitem transitively by
    l_orderkey of the purged orders, events by user_id (identifier
    match wherever it appears; events' user population only partially
    overlaps the custkey domain, which is exactly what a real erasure
    sweep sees). Emits one row per table: rows before, rows purged,
    rows after, and the RESIDUAL-REFERENCE count — recomputed by
    re-probing the post-purge frame against the erased keys (never
    assumed 0; the invariant the DPO report certifies).

    Purge legs use q_merge_upsert's broadcast MERGE-delete
    decomposition: the erasure batch is bounded (the keys to forget)
    and broadcast, so customer/orders/events purge without shuffling
    the base; the lineitem leg keys on the PURGED-ORDER set, which is
    Ω(erased customers' order count) and therefore joined WITHOUT a
    broadcast hint — AQE broadcasts it when measured small and degrades
    to a shuffle join on the fact table's own key otherwise.

    Determinism: the batch is arithmetic on c_custkey; every output is
    an exact long count.

    Scale notes (100 TB): each leg is one anti/left join on the
    reference key plus a 1-row aggregate; the residual audit is a
    second pass over the remaining rows — the cost a real audit
    genuinely pays to certify rather than assume. In a lakehouse
    deployment the same joins drive the DELETE's file rewrite set."""
    from gpe.common import persist_tracked

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    batch = persist_tracked(
        c.filter(F.pmod(F.col("c_custkey"), F.lit(_FORGET_MOD)) == 0)
        .select(F.col("c_custkey").alias("k"))
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # transitive key set: orderkeys of the purged orders — Ω(erased
    # customers' order count), persisted because it feeds the lineitem
    # purge AND its residual re-probe
    del_orders = persist_tracked(
        o.join(F.broadcast(batch), o.o_custkey == batch.k, "semi").select(
            F.col("o_orderkey").alias("k")
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    ev = load_table(spark, sf_dir, "events").select("user_id")
    return (
        _forget_leg("customer", c, "c_custkey", batch, True)
        .unionByName(_forget_leg("orders", o, "o_custkey", batch, True))
        .unionByName(
            _forget_leg("lineitem", li, "l_orderkey", del_orders, False)
        )
        .unionByName(_forget_leg("events", ev, "user_id", batch, True))
    )


def q_gov_forget_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erasure propagation into the CORPUS/VECTOR modalities (VERDICT
    r13 next-round #4 — the half of right-to-be-forgotten
    q_gov_forget_audit's relational star doesn't cover): the same
    deterministic erasure batch (c_custkey % 97 == 0, identifier match
    wherever it appears — documents/embeddings ids share the custkey
    domain exactly as events.user_id does, partial overlap and all)
    sweeps four assets, each a _forget_leg with the residual RE-probed:

    - `documents` / `embeddings` — the content rows themselves;
    - `dedup_index` — the STANDING banded shingle-MinHash signature
      index (q_dedup_delta's standing side: _ngram_minhash_bands rows,
      _NGRAM_N_BANDS per doc), whose erased-doc entries must be
      retracted or the dedup sieve keeps matching new arrivals against
      forgotten content — the index-upsert half of the governance
      story;
    - `ann_index` — the standing IVF posting list (one (label cell,
      vec_id) entry per vector, q_vec_ann_ivf's index side), same
      retraction argument for similarity serving.

    INVARIANT the audit certifies across legs: posting lists hold
    exactly one entry per vector and the signature index exactly
    _NGRAM_N_BANDS rows per doc, so ann_index counts must equal
    embeddings counts and dedup_index counts must be exactly
    _NGRAM_N_BANDS × documents counts — a divergence means the standing
    index was ALREADY stale before the purge
    (tests/test_r14_ops.py pins both equalities).

    Determinism: arithmetic batch; exact long counts everywhere.

    Scale notes (100 TB): every leg is one broadcast-batch left join +
    1-row aggregate plus the independent residual re-probe (the audit's
    honest second pass); the index legs scan the INDEX frames (32×docs
    / 1×vecs rows), never re-shingle pair candidates. In a lakehouse
    deployment the same flagged joins drive the DELETE file-rewrite set
    for the index tables, and q_dedup_delta / q_vec_index_delta absorb
    the next batch's re-inserts."""
    from gpe.common import persist_tracked

    emb = load_table(spark, sf_dir, "embeddings")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    # persisted (r14, guide §2.4): every leg evaluates the erasure batch
    # three times (flag join, residual re-probe, broadcast build) — the
    # before-plan held 12 customer scans for one bounded key list
    batch = persist_tracked(
        c.filter(
            F.pmod(F.col("c_custkey"), F.lit(_FORGET_MOD)) == 0
        ).select(F.col("c_custkey").alias("k"))
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    from gpe.dedup import _doc_gram_sets, _ngram_minhash_bands

    # persisted (r14): the leg's flag pass and its independent residual
    # re-probe each consume the index frame — without the persist the
    # full shingle+MinHash banding pipeline (the key's dominant cost)
    # executed TWICE (before-plan: 2 complete gram/minhash subtrees,
    # 4 documents scans)
    from gpe.io import load_table_spread

    sig_index = persist_tracked(
        _ngram_minhash_bands(
            # r14 input spread: the shingle+MinHash pipeline is map-side
            # behind the scan — single-task without it
            _doc_gram_sets(load_table_spread(spark, sf_dir, "documents"))
        ).select("doc_id")
    )
    posting = emb.select("vec_id", "label")
    return (
        _forget_leg("documents", d, "doc_id", batch, True)
        .unionByName(_forget_leg("embeddings", emb.select("vec_id"), "vec_id", batch, True))
        .unionByName(_forget_leg("dedup_index", sig_index, "doc_id", batch, True))
        .unionByName(_forget_leg("ann_index", posting, "vec_id", batch, True))
    )


QUERIES = {
    "q_gov_forget_audit": q_gov_forget_audit,
    "q_gov_forget_corpus": q_gov_forget_corpus,
    "q_lake_snapshot_diff": q_lake_snapshot_diff,
    "q_merge_upsert": q_merge_upsert,
    "q_join_scd2_pointintime": q_join_scd2_pointintime,
    "q_mv_incremental": q_mv_incremental,
    "q_cdc_compact": q_cdc_compact,
    "q_cdc_compact_deletes": q_cdc_compact_deletes,
    "q_scd2_intervals": q_scd2_intervals,
    "q_cdc_scd2_current": q_cdc_scd2_current,
}

ORACLES = {
    "q_lake_snapshot_diff": """
        WITH o AS (
          SELECT o_orderkey, o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(12,2)) AS p
          FROM orders),
        v1 AS (SELECT * FROM o WHERE o_orderkey % 97 <> 3),
        v2 AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 10 = 0
                      THEN CAST(p + CAST(1 AS DECIMAL(12,2))
                                AS DECIMAL(12,2))
                      ELSE p END AS p
          FROM o WHERE o_orderkey % 89 <> 5),
        j AS (
          SELECT CASE
                   WHEN v1.o_orderkey IS NULL THEN 'added'
                   WHEN v2.o_orderkey IS NULL THEN 'removed'
                   WHEN v1.p <> v2.p THEN 'changed'
                   ELSE 'unchanged' END AS change_type,
                 COALESCE(v2.o_orderstatus, v1.o_orderstatus) AS status,
                 COALESCE(v2.o_orderkey, v1.o_orderkey) AS key,
                 CASE WHEN v1.o_orderkey IS NOT NULL
                       AND v2.o_orderkey IS NOT NULL
                      THEN CAST(v2.p - v1.p AS DECIMAL(12,2))
                      ELSE CAST(0 AS DECIMAL(12,2)) END AS delta
          FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
        SELECT change_type, status,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(ROUND(SUM(delta), 2) AS DOUBLE) AS price_delta,
               MIN(key) AS min_key,
               MAX(key) AS max_key
        FROM j GROUP BY 1, 2""",
    "q_cdc_scd2_current": """
        WITH p AS (
          SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'purchase'),
        r AS (
          SELECT user_id, ts, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_versions,
                 MIN(ts) OVER (PARTITION BY user_id) AS first_seen
          FROM p)
        SELECT user_id,
               event_id AS current_event_id,
               value AS current_value,
               ts AS valid_from,
               CAST(n_versions AS BIGINT) AS n_versions,
               first_seen
        FROM r WHERE rn = 1""",
    "q_join_scd2_pointintime": """
        WITH dim AS (
          SELECT user_id, event_id AS version_event_id,
                 value AS attr_value, ts AS valid_from,
                 lead(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS valid_to
          FROM events WHERE event_type = 'purchase'),
        e AS (
          SELECT user_id, event_id, ts, event_type
          FROM events WHERE event_type <> 'purchase')
        SELECT e.event_id, e.user_id, e.ts AS event_ts, e.event_type,
               d.version_event_id, d.attr_value, d.valid_from
        FROM e JOIN dim d
          ON e.user_id = d.user_id
         AND d.valid_from <= e.ts
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)""",
    "q_merge_upsert": f"""
        WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                   FROM orders),
        upd AS (
          SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 100.00 AS DOUBLE)
                   AS o_totalprice
          FROM o WHERE o_orderkey % 10 = 0),
        ins AS (
          SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders)
                   AS o_orderkey, o_custkey,
                 'N' AS o_orderstatus, o_totalprice
          FROM o WHERE o_orderkey % 17 = 3),
        src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        SELECT COALESCE(o.o_orderkey, s.o_orderkey) AS o_orderkey,
               COALESCE(o.o_custkey, s.o_custkey) AS o_custkey,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                    ELSE o.o_orderstatus END AS o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                    ELSE o.o_totalprice END AS o_totalprice,
               CASE WHEN o.o_orderkey IS NOT NULL
                         AND s.o_orderkey IS NOT NULL THEN 'updated'
                    WHEN o.o_orderkey IS NULL THEN 'inserted'
                    ELSE 'kept' END AS merge_action
        FROM o FULL OUTER JOIN src s ON o.o_orderkey = s.o_orderkey""",
    # the IVM equivalence oracle: FULL RECOMPUTE of the view over the
    # post-merge snapshot (incremental ≡ recompute is exactly what the
    # driver hash-compares). Defined after the dict via the q_merge_upsert
    # SQL — see the module bottom.
    "q_mv_incremental": None,
    "q_cdc_compact": """
        SELECT user_id, event_type, ts, event_id, value
        FROM (
          SELECT user_id, event_type, ts, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1""",
    "q_cdc_compact_deletes": """
        SELECT user_id, event_type, ts, event_id, value
        FROM (
          SELECT user_id, event_type, ts, event_id, value,
                 CASE WHEN value < 5.0 THEN 'D' ELSE 'U' END AS op,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND op = 'U'""",
    "q_scd2_intervals": """
        SELECT user_id,
               event_id AS version_event_id,
               value AS attr_value,
               ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               LEAD(ts) OVER w IS NULL AS is_current
        FROM events
        WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
}

ORACLES["q_mv_incremental"] = f"""
    WITH merged AS ({ORACLES["q_merge_upsert"]})
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_spent
    FROM merged GROUP BY 1"""

ORACLES["q_gov_forget_audit"] = f"""
    WITH batch AS (
      SELECT c_custkey AS k FROM customer
      WHERE c_custkey % {_FORGET_MOD} = 0),
    del_orders AS (
      SELECT o_orderkey AS k FROM orders
      WHERE o_custkey IN (SELECT k FROM batch))
    SELECT 'customer' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM batch)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
           CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM batch)
                    THEN 0 ELSE 1 END) AS BIGINT) AS n_after,
           CAST(SUM(CASE WHEN c_custkey NOT IN (SELECT k FROM batch)
                          AND c_custkey IN (SELECT k FROM batch)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_residual_refs
    FROM customer
    UNION ALL
    SELECT 'orders',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM batch)
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IN (SELECT k FROM batch)
                    THEN 0 ELSE 1 END) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey NOT IN (SELECT k FROM batch)
                          AND o_custkey IN (SELECT k FROM batch)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_orderkey IN (SELECT k FROM del_orders)
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN l_orderkey IN (SELECT k FROM del_orders)
                    THEN 0 ELSE 1 END) AS BIGINT),
           CAST(SUM(CASE WHEN l_orderkey NOT IN (SELECT k FROM del_orders)
                          AND l_orderkey IN (SELECT k FROM del_orders)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'events',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN user_id IN (SELECT k FROM batch)
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN user_id IN (SELECT k FROM batch)
                    THEN 0 ELSE 1 END) AS BIGINT),
           CAST(SUM(CASE WHEN user_id NOT IN (SELECT k FROM batch)
                          AND user_id IN (SELECT k FROM batch)
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM events
"""


def _forget_corpus_oracle() -> str:
    # the index frames recompute in closed form: the signature index holds
    # exactly _NGRAM_N_BANDS rows per doc (band keys explode
    # unconditionally) and the IVF posting list one entry per vector, so
    # the SQL materializes them as doc×bands / vec-posting frames and runs
    # the same purge arithmetic; residuals use the audit's contradictory-
    # predicate recompute idiom (provably 0, never assumed)
    from gpe.dedup import _NGRAM_N_BANDS

    legs = []
    for name, frame, key in [
        ("documents", "documents", "doc_id"),
        ("embeddings", "embeddings", "vec_id"),
        (
            "dedup_index",
            f"(SELECT doc_id FROM documents CROSS JOIN "
            f"(SELECT unnest(range({_NGRAM_N_BANDS})) AS band)) six",
            "doc_id",
        ),
        ("ann_index", "(SELECT label, vec_id FROM embeddings) pst", "vec_id"),
    ]:
        legs.append(f"""SELECT '{name}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN {key} IN (SELECT k FROM batch)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
           CAST(SUM(CASE WHEN {key} IN (SELECT k FROM batch)
                    THEN 0 ELSE 1 END) AS BIGINT) AS n_after,
           CAST(SUM(CASE WHEN {key} NOT IN (SELECT k FROM batch)
                          AND {key} IN (SELECT k FROM batch)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_residual_refs
    FROM {frame}""")
    body = "\n    UNION ALL\n    ".join(legs)
    return f"""
    WITH batch AS (
      SELECT c_custkey AS k FROM customer
      WHERE c_custkey % {_FORGET_MOD} = 0)
    {body}
"""


ORACLES["q_gov_forget_corpus"] = _forget_corpus_oracle()
