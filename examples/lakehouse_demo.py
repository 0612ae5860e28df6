"""Worked example: the lakehouse / table-maintenance surface (round 7).

Run: python examples/lakehouse_demo.py [sf_dir]

The write-path and table-maintenance flow a data-lake API operates:
write a Hive-partitioned layout and profile it back (proving the round
trip lossless), invest in a bucketed layout so fact-fact joins stop
shuffling, maintain a changelog-compacted state that honors delete
tombstones, and keep an aggregate view fresh by delta arithmetic instead
of rescans. Every stage is a lazy DataFrame except the writes, which ARE
the operators under demonstration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpe import catalog, cdc, io
from gpe.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lakehouse-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print("== partitioned write + readback profile (lossless round trip) ==")
    catalog.q_catalog_partition_profile(spark, sf_dir).orderBy(
        "o_orderpriority"
    ).show(truncate=False)

    print("== bucketed co-located join (no join-side shuffle) ==")
    df = io.q_join_bucketed_colocated(spark, sf_dir)
    df.orderBy("o_orderpriority", "l_returnflag").show(5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    print("join strategy:", "SortMergeJoin" if "SortMergeJoin" in plan
          else "BroadcastHashJoin")

    print("== changelog compaction with delete tombstones ==")
    alive = cdc.q_cdc_compact_deletes(spark, sf_dir)
    total = cdc.q_cdc_compact(spark, sf_dir)
    print(f"keys alive after tombstones: {alive.count()} / {total.count()}")

    print("== incremental view maintenance (delta arithmetic) ==")
    cdc.q_mv_incremental(spark, sf_dir).show(5)

    print("== catalog freshness panel (r10) ==")
    catalog.q_catalog_freshness(spark, sf_dir).orderBy("table_col").show()

    print("== key audit (r10): is the assumed PK actually unique? ==")
    catalog.q_catalog_pk_infer(spark, sf_dir).orderBy("key_cols").show(
        truncate=False
    )

    print("lakehouse demo complete")


if __name__ == "__main__":
    main()
