"""Merged query/oracle registry consumed by __spark_entry__.py.

Each gpe module exposes module-level ``QUERIES`` (key → builder) and
``ORACLES`` (key → DuckDB SQL, omitted for rows-only checks). This module
merges them and enforces key discipline: duplicate keys are a bug, and every
oracle key must have a query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gpe import io as _io
from gpe import relational as _relational

_MODULES = [_io, _relational]

# Strict imports: a broken module must fail LOUDLY here. (An earlier
# tolerant `except ImportError` could silently drop a whole module's
# queries from the registry — the driver would then run fewer keys with no
# error, which is the worst possible failure mode for the coverage gate.)
for _name in (
    "windows",
    "timeseries",
    "scalars",
    "text",
    "dedup",
    "vectors",
    "multimodal",
    "pipeline",
    "catalog",
    "udf",
):
    _MODULES.append(__import__(f"gpe.{_name}", fromlist=[_name]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for key, fn in getattr(mod, "QUERIES", {}).items():
            if key in out:
                raise ValueError(f"duplicate query key {key!r} in {mod.__name__}")
            out[key] = fn
    return out


def oracle_sql() -> dict[str, str]:
    qkeys = set(queries().keys())
    out: dict[str, str] = {}
    for mod in _MODULES:
        for key, sql in getattr(mod, "ORACLES", {}).items():
            if key in out:
                raise ValueError(f"duplicate oracle key {key!r} in {mod.__name__}")
            if key not in qkeys:
                raise ValueError(f"oracle {key!r} has no matching query")
            out[key] = sql
    return out
