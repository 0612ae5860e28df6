"""Capture `.explain("formatted")` for declared keys into plans/<dir>/.

Usage: python tools/capture_plan.py <outdir-suffix> <key> [<key> ...]
Writes plans/r14/<key>_<suffix>.txt (suffix e.g. 'before'/'after').
Driver-only: builds the plan, never executes it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as spec
    from gpe.session import get_spark

    spark = get_spark("gpe-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spec.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_SUBDIR", "r15"),
    )
    os.makedirs(outdir, exist_ok=True)
    for k in keys:
        df = qs[k](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
