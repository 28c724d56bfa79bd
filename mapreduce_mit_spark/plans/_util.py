"""Shared plan helpers.

Cross-engine float discipline: Spark and DuckDB may sum doubles in
different orders, so every aggregated double surfaced to the driver's
value-hash is wrapped in ``round(, N)``. Rounding a sum whose
order-dependent wobble is ~1e-10 relative makes the two engines
bit-identical except on astronomically unlikely boundary values.
Row-level arithmetic (same ops, same inputs) is bit-identical without
rounding, but we still round surfaced metrics for stable display.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import fan_out, load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def tw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Wide load: ``load_table`` + ``fan_out`` — for pipelines whose cost
    is CPU-bound per-row compute (tokenize/minhash/simhash/vector math),
    where an under-parallelized scan serializes the whole stage."""
    return fan_out(load_table(spark, sf_dir, name))


def money_sum(col: str = "value", alias: str = "total_value") -> Column:
    """Order-independent money sum: accumulate integer cents, surface
    dollars. ``sum(bigint)/100.0`` is a deterministic function of an
    exact integer, so Spark and DuckDB produce bit-identical doubles
    regardless of partitioning/summation order. Shared by the batch
    window plans and their streaming twins."""
    return (F.sum(F.expr(f"CAST(round({col} * 100) AS BIGINT)")) / 100.0).alias(alias)


def rsum(col: Column | str, alias: str, nd: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c), nd).alias(alias)


def ravg(col: Column | str, alias: str, nd: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.avg(c), nd).alias(alias)
