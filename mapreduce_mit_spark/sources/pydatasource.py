"""Custom Python data source (Spark 4 DataSource API): whole-file text.

The reference engine's only input format is "one file = one map task,
map sees (filename, full contents)" (master.go:63-65, common_map.go:61).
Spark's line-oriented ``text`` source can't express that; RDD
``wholeTextFiles`` can but lives outside the DataFrame planner. This
rebuilds the reference's scan contract as a first-class PySpark
DataSource plugin: each file is one InputPartition (the literal
"one file = one split" rule), each partition yields a single
(path, content) row, and the result is a plain DataFrame any catalog
operator can consume.

Usage::

    register_wholefile_source(spark)
    df = spark.read.format("wholefile_text").option("path", glob).load()

Scale posture: partition-per-file is exactly the reference's
parallelism model; a production variant would coalesce small files into
multi-file partitions (maxPartitionBytes-style binpacking) — the
partitions() hook is where that policy lives, driver-side, file-list
only (no data touched at planning)."""

from __future__ import annotations

import glob as _glob

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class WholeFileTextDataSource(DataSource):
    """``format("wholefile_text")``: one row per file — (path, content)."""

    @classmethod
    def name(cls) -> str:
        return "wholefile_text"

    def schema(self) -> str:
        return "path string, content string"

    def reader(self, schema) -> "WholeFileTextReader":
        return WholeFileTextReader(self.options)


class WholeFileTextReader(DataSourceReader):
    def __init__(self, options) -> None:
        pattern = options.get("path")
        if not pattern:
            raise ValueError("wholefile_text requires option 'path' (a glob)")
        self._pattern = pattern

    def partitions(self):
        # Planning is a driver-side listing only; sorted so partition
        # numbering is deterministic. One file = one split = one task,
        # the reference's scheduling unit (schedule.go:11-13).
        paths = sorted(_glob.glob(self._pattern, recursive=True))
        if not paths:
            raise FileNotFoundError(f"no files match {self._pattern}")
        return [InputPartition(p) for p in paths]

    def read(self, partition):
        path = partition.value
        with open(path, "rb") as f:
            yield (path, f.read().decode("utf-8", errors="replace"))


def register_wholefile_source(spark: SparkSession) -> None:
    """Register the source with this session (idempotent by API
    contract: re-registering the same name simply replaces the entry,
    verified on PySpark 4.1 — so genuine failures like a missing
    DataSource API must propagate, never be swallowed)."""
    spark.dataSource.register(WholeFileTextDataSource)
