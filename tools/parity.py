"""Local replica of the driver's correctness gate (SURVEY.md §5.1).

For every key in __spark_entry__.queries(): run the Spark builder at a given
sf_dir, run the matching oracle_sql() in DuckDB over views of the same
parquet files, and compare row-count + column names + order-insensitive
value multiset. Exact equality on every cell (floats bit-compared — builders
are responsible for cross-engine determinism per SURVEY.md §5.3).

Usage:
    python tools/parity.py                    # all keys at sf0.001 + sf0.01
    python tools/parity.py q_agg_groupby ...  # subset
    SF_DIRS=/root/testdata/sf0.01 python tools/parity.py
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def duck_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    """Canonicalize one cell for cross-engine multiset comparison.

    Type-TAGGED so Python's cross-type equality (1 == 1.0 == True,
    Decimal('1.5') == 1.5) can't mask a dtype divergence, and floats
    compare by BIT PATTERN (distinguishing -0.0 / +0.0 / every last ulp).
    Timestamps normalize to naive µs instants (the ns-vs-µs pandas unit is
    a library artifact, not an engine difference) but carry an awareness
    flag so a missing NTZ cast is still caught."""
    import struct

    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", struct.pack("<d", v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "tolist"):  # numpy scalar or array
        return _norm_cell(v.tolist())
    if isinstance(v, pd.Timestamp):
        aware = v.tzinfo is not None
        return ("t", v.to_pydatetime().replace(tzinfo=None), aware)
    if hasattr(v, "isoformat"):  # datetime/date
        tz = getattr(v, "tzinfo", None)
        try:
            return ("t", v.replace(tzinfo=None), tz is not None)
        except TypeError:
            return ("t", v, False)
    import decimal

    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("s", str(v)) if isinstance(v, str) else (type(v).__name__, v)


def canonical_rows(df: pd.DataFrame) -> Counter:
    cols = sorted(df.columns)
    df = df[cols]
    rows = Counter()
    for tup in df.itertuples(index=False, name=None):
        rows[tuple(_norm_cell(v) for v in tup)] += 1
    return rows


def driver_hashable(pdf: pd.DataFrame, label: str) -> str | None:
    """Replicate the DRIVER's canonicalization (pandas sort_values +
    factorize per column). The driver crashed on array<int> outputs
    (CORRECTNESS_r01: TypeError unhashable 'list') while this tool's
    tuple-based multiset accepted them — so local PASS did not imply
    driver-green. Any output the driver cannot hash must fail HERE."""
    try:
        if len(pdf.columns):
            pdf.sort_values(by=list(pdf.columns))
        for c in pdf.columns:
            pd.factorize(pdf[c])
    except Exception as e:  # noqa: BLE001
        return f"{label} not driver-hashable: {type(e).__name__}: {e}"
    return None


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> dict:
    report: dict = {"ok": True, "issues": []}
    for pdf, label in ((spark_pdf, "spark"), (duck_pdf, "duck")):
        err = driver_hashable(pdf, label)
        if err:
            report["ok"] = False
            report["issues"].append(err)
    if len(spark_pdf) != len(duck_pdf):
        report["ok"] = False
        report["issues"].append(
            f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}"
        )
    # ORDERED column comparison — SURVEY §5.3 rule 1 says builders emit
    # columns in oracle order; a sorted comparison would hide violations
    s_cols, d_cols = list(spark_pdf.columns), list(duck_pdf.columns)
    if s_cols != d_cols:
        report["ok"] = False
        report["issues"].append(f"columns: spark={s_cols} duck={d_cols}")
        return report
    s_rows, d_rows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    if s_rows != d_rows:
        report["ok"] = False
        only_s = list((s_rows - d_rows).items())[:3]
        only_d = list((d_rows - s_rows).items())[:3]
        report["issues"].append(f"value multiset differs; spark-only sample={only_s}")
        report["issues"].append(f"duck-only sample={only_d}")
    return report


def run(keys: list[str] | None = None, sf_dirs: list[str] | None = None) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as spec
    from gpe.session import get_spark

    spark = get_spark("parity")
    qs = spec.queries()
    oracles = spec.oracle_sql()
    keys = keys or sorted(qs.keys())
    sf_dirs = sf_dirs or DEFAULT_SF_DIRS

    n_fail = 0
    for sf_dir in sf_dirs:
        con = duck_connect(sf_dir)
        for key in keys:
            t0 = time.time()
            try:
                spark_pdf = qs[key](spark, sf_dir).toPandas()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {key} @ {sf_dir}: spark error: {e}")
                n_fail += 1
                continue
            finally:
                from gpe.common import release_persists

                release_persists()
            if key not in oracles:
                err = driver_hashable(spark_pdf, "spark")
                if err:
                    n_fail += 1
                    print(f"FAIL {key} @ {sf_dir}: {err}")
                elif len(spark_pdf) > 0:
                    print(f"ROWS-ONLY {key} @ {sf_dir}: {len(spark_pdf)} rows "
                          f"({time.time()-t0:.1f}s)")
                else:
                    n_fail += 1
                    print(f"FAIL {key} @ {sf_dir}: rows-only key returned 0 rows")
                continue
            try:
                duck_pdf = con.execute(oracles[key]).fetch_df()
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {key} @ {sf_dir}: duckdb error: {e}")
                n_fail += 1
                continue
            rep = compare(spark_pdf, duck_pdf)
            if rep["ok"]:
                print(f"PASS {key} @ {sf_dir}: {len(spark_pdf)} rows "
                      f"({time.time()-t0:.1f}s)")
            else:
                n_fail += 1
                print(f"FAIL {key} @ {sf_dir}:")
                for issue in rep["issues"]:
                    print(f"    {issue}")
        con.close()
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    arg_keys = [a for a in sys.argv[1:] if not a.startswith("-")] or None
    env_dirs = os.environ.get("SF_DIRS")
    dirs = env_dirs.split(",") if env_dirs else None
    sys.exit(run(arg_keys, dirs))
