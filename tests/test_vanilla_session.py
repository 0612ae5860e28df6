"""Driver-sim in a VANILLA SparkSession (subprocess — the suite's session
carries gpe.session configs the driver does not set).

Every declared query must build and execute in a bare
SparkSession.builder.master(...).getOrCreate(), and must survive a
PRUNED-OUTPUT consumer (count()), not just collect/toPandas: Catalyst
prunes UDF child outputs under count(), which exposed a self-cogroup
attribute-aliasing bug in q_udf_cogroup that collect-based parity could
never see.
"""

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as spec
# every key must produce ROWS at sf0.001 (a vacuously-empty result makes
# the oracle check trivially satisfiable — the r2 q_except lesson); the
# one exception is audited: q_agg_having's post-agg threshold legitimately
# eliminates all groups at 1/10 the t2 scale (non-empty at sf0.01, where
# the driver checks it).
MAY_BE_EMPTY = {"q_agg_having"}
fails = []
for key, fn in spec.queries().items():
    try:
        df = fn(spark, "/root/testdata/sf0.001")
        cols = df.columns
        if not cols:
            fails.append((key, "no output columns"))
        if len(cols) != len(set(cols)):
            fails.append((key, "duplicate output columns"))
        n = df.count()
        if n == 0 and key not in MAY_BE_EMPTY:
            fails.append((key, "degenerate: 0 rows at sf0.001"))
    except Exception as e:  # noqa: BLE001
        fails.append((key, str(e)[:200]))
if fails:
    print("VANILLA-FAILS:", fails)
    sys.exit(1)
print("VANILLA-OK", len(spec.queries()))
"""


def test_all_queries_run_in_vanilla_session_under_count():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        # 540 was a near-miss once the r12 availableNow keys joined the
        # loop (448 s isolated on a quiet rig; rig noise flaked it) — the
        # bound guards against hangs, not throughput
        timeout=780,
    )
    assert r.returncode == 0, (r.stdout or "") + (r.stderr or "")[-2000:]
    assert "VANILLA-OK" in r.stdout


_STREAMING_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from gpe import streaming
from gpe.io import load_table

SF = "/root/testdata/sf0.001"
fails = []

def drain(name, df, mode):
    try:
        q = streaming.run_to_memory(df, name, mode)
        try:
            n = spark.table(name).count()
            if n == 0:
                fails.append((name, "0 rows"))
        finally:
            q.stop()
    except Exception as e:  # noqa: BLE001
        fails.append((name, str(e)[:200]))

ev = lambda: streaming.stream_events(spark, SF)
docs = lambda: streaming.stream_documents(spark, SF)
drain("v_tumbling", streaming.tumbling_counts(ev()), "complete")
drain("v_sessions", streaming.session_aggregates(ev()), "complete")
drain("v_dedup", streaming.dedup_stream(ev()).select("event_id"), "append")
drain("v_state", streaming.running_user_stats(ev()), "update")
drain("v_zscore", streaming.zscore_stream(ev()), "update")
drain("v_compact", streaming.compact_stream(ev()), "update")
drain("v_attrib", streaming.attribution_stream(ev()), "update")
drain("v_trans", streaming.transitions_stream(ev()), "update")
drain("v_maxgap", streaming.max_gap_stream(ev()), "update")
drain("v_paths", streaming.user_paths_stream(ev()), "update")
drain("v_grain_month", streaming.grain_counts_stream(ev(), "month"), "complete")
drain("v_active", streaming.active_users_stream(ev()), "complete")
drain("v_ewma", streaming.ewma_stream(ev()), "update")
drain(
    "v_cusum",
    streaming.cusum_stream(ev(), streaming.batch_drift_cents(spark, SF)),
    "update",
)
drain("v_quality", streaming.quality_scores_stream(docs()), "append")
drain("v_repetition", streaming.repetition_stream(docs()), "append")
drain("v_bigrams", streaming.bigram_counts_stream(docs()), "complete")
drain("v_gate", streaming.quality_gate_stream(docs()), "complete")
drain("v_readability", streaming.readability_stream(docs()), "append")
drain("v_calendar", streaming.calendar_cells_stream(ev()), "complete")
drain("v_daily", streaming.daily_cells_stream(ev()), "complete")
drain("v_chunks", streaming.chunk_stream(docs()), "append")
drain(
    "v_minhash",
    streaming.minhash_dedup_stream(docs(), load_table(spark, SF, "documents")),
    "append",
)
if fails:
    print("VANILLA-STREAM-FAILS:", fails)
    sys.exit(1)
print("VANILLA-STREAM-OK")
"""


def test_streaming_twins_run_in_vanilla_session():
    """The 8 streaming builders under the driver-shaped bare session
    (VERDICT r4 #1/#9: the stream_events ts-unit breakage only reproduced
    in a FRESH session — the suite's warm session masked it)."""
    r = subprocess.run(
        [sys.executable, "-c", _STREAMING_SCRIPT],
        capture_output=True,
        text=True,
        timeout=780,
    )
    assert r.returncode == 0, (r.stdout or "") + (r.stderr or "")[-2000:]
    assert "VANILLA-STREAM-OK" in r.stdout
