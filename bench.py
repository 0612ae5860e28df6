"""Benchmark harness — runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec, ...}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
collect-to-driver, no disk write) — the same execution profile a cluster job
would have minus the final exchange to storage.
"""

from __future__ import annotations

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
    # absorb one-time codegen/classloading cost.
    force(spark.read.parquet(f"{sf_dir}/region.parquet"))

    times: dict[str, float] = {}
    for key in sorted(qs):
        t0 = time.perf_counter()
        try:
            force(qs[key](spark, sf_dir))
            times[key] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error {key}: {e}", file=sys.stderr)
            times[key] = -1.0

    total = round(sum(t for t in times.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
