"""mapreduce_mit_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first reimplementation of the *capabilities* of
the reference MapReduce engine (SidneyPrimas/MapReduce_MIT — an MIT 6.824
Go MapReduce library plus word-count / inverted-index applications), widened
to a full relational / streaming / LLM-data-pipeline surface:

- ``session``    — SparkSession factory tuned for local[N] and cluster scale.
- ``sources``    — sources/sinks: parquet tables, whole-file text corpora,
                   line text, CSV, JSON.
- ``functions``  — scalar expression helpers (tokenization, hashing,
                   text-quality metrics) emitted BOTH as Spark Columns and
                   as ANSI-SQL strings so every operator is oracle-checkable.
- ``operators``  — reusable dataflow operators (MapReduce-compat API, dedup,
                   similarity search, top-k, multimodal plumbing).
- ``plans``      — the named query catalog: every operator from SURVEY.md §2
                   exposed as ``(spark, sf_dir) -> DataFrame`` plus a DuckDB
                   oracle SQL string.
- ``streaming``  — Structured Streaming variants (watermarks, windows,
                   stateful dedup) of the batch window queries.

Design stance (SURVEY.md §7): declare logical plans with the DataFrame API,
let Catalyst/Tungsten choose physical strategy; no custom scheduler, no
custom shuffle, no row-at-a-time Python in any hot path.
"""

__version__ = "0.1.0"
