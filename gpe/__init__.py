"""gpe — a PySpark-native analytics engine with the query surface of
informa-agra/GpeDatalakeAPI (see SURVEY.md; the reference checkout is empty,
so SURVEY.md §2 is the authoritative capability contract).

Architecture: pure Spark DataFrame/SQL compositions — no custom Catalyst
rules, no RDDs in the hot path. Every operator is declared as a pure builder
``(spark, sf_dir) -> DataFrame`` so the driver controls materialization, and
carries a DuckDB-runnable ANSI-SQL oracle for the correctness gate.

Modules:
    io          — parquet/csv/json sources, view registration, sinks
    relational  — projection/filter/join/aggregate/set-op/scalar queries
    windows     — window-function queries
    timeseries  — event-stream batch analytics (sessionize, funnel, ...)
    text        — text analysis (stats, tf-idf, n-grams, lang/quality)
    dedup       — exact + near-duplicate detection, connected components
    vectors     — embedding similarity search (brute kNN, LSH scale path)
    catalog     — lake metadata extraction jobs
    streaming   — Structured Streaming equivalents (pytest-verified)
    udf         — pandas UDF / applyInPandas / UDTF surface
    registry    — merged QUERIES/ORACLES dicts consumed by __spark_entry__
"""

__version__ = "0.1.0"
