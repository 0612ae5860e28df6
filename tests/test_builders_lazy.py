"""Every declared builder must be LAZY — constructing the DataFrame plan
may not trigger a single Spark job (VERDICT r1, next-round #5: round 1's
q_vec_pairs_threshold collected the index side to the driver during plan
construction, which cannot run at 100 TB).

Mechanism: builders run inside a dedicated job group; any job launched
during construction would be tagged with that group and show up in the
status tracker.
"""

from tests.conftest import SF_SMOKE


# Iterative-to-fixpoint operators: the driver LOOP is the algorithm (the
# Pregel model — per-round actions decide convergence), so plan
# construction necessarily runs jobs. Data never leaves the cluster
# (localCheckpoint, not collect); these are exempt BY DESIGN, and the
# exemption list is pinned here so a new eager builder can't hide in it.
ITERATIVE_BY_DESIGN = {
    "q_dedup_components",
    "q_dedup_components_star",  # star rounds converge via driver loop
    "q_dedup_keep_best",  # composes q_dedup_components
    # WRITE-PATH-BY-DESIGN: the write action IS the operator under test;
    # the returned plan is the lazy readback/join
    "q_catalog_partition_profile",
    "q_join_bucketed_colocated",
    "q_source_json_roundtrip",
    "q_source_csv_roundtrip",
    "q_source_schema_evolution",
    "q_source_orc_roundtrip",
    "q_join_partition_pruned",
    "q_lake_snapshot_diff",  # writes the two snapshot eras under diff
    "q_lake_zorder_write",  # performs the z-order re-layout write
    # RUN-BY-DESIGN: starts and awaits the bounded streaming query
    "q_stream_tumbling_availablenow",
    "q_stream_sessionize_availablenow",
    "q_stream_sliding_availablenow",
    "q_stream_dedup_availablenow",
}


def test_builders_trigger_zero_jobs(spark):
    import __spark_entry__ as spec
    from gpe.io import TABLES, load_table

    sc = spark.sparkContext
    # Warm the schema memo outside the probe group: the ONE footer-read
    # job Spark runs per schema-less parquet read is metadata, not compute.
    for t in TABLES:
        load_table(spark, SF_SMOKE, t)
    group = "gpe-lazy-probe"
    sc.setJobGroup(group, "builder laziness probe")
    try:
        seen: set[int] = set()
        for key, builder in spec.queries().items():
            df = builder(spark, SF_SMOKE)
            assert df is not None, key
            jobs = set(sc.statusTracker().getJobIdsForGroup(group)) - seen
            if key in ITERATIVE_BY_DESIGN:
                seen |= jobs
                continue
            assert jobs == set(), (
                f"builder {key} launched Spark job(s) {sorted(jobs)} during "
                "plan construction — builders must be lazy"
            )
    finally:
        sc.setJobGroup("", "")
