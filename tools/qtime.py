"""Isolated per-key timing probe — the bench's exact protocol (noop sink,
untimed release_persists + gc between reps) on a fresh session, N reps per
key. rep0 carries first-compile cost (the bench pays it once per key);
"steady" is the min of the later reps.

Usage: python tools/qtime.py [-n REPS] key [key ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as spec
    from gpe.common import release_persists
    from gpe.session import get_spark

    spark = get_spark("gpe-qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spec.queries()

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for key in args:
        ts = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{key} rep{r}")
            t0 = time.perf_counter()
            force(qs[key](spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 3))
            release_persists()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        print(
            f"{key}: reps={ts} steady={min(ts[1:]) if len(ts) > 1 else ts[0]}"
            f" loadavg={os.getloadavg()[0]:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
