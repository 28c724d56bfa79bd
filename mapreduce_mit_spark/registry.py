"""Central query catalog.

Every operator this engine claims (SURVEY.md §2 inventory + the
LLM-data-pipeline extensions) registers here as a named query:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
- ``oracle`` — an equivalent DuckDB SQL string over the same parquet
  tables (views ``region nation customer supplier part orders lineitem
  events documents embeddings``), or ``None`` for genuinely
  non-SQL-expressible operators (streaming state, approximate sketches),
  which the driver checks rows-only.

The driver-facing ``__spark_entry__.py`` simply re-exports this catalog.
Column names are part of the contract: the driver hashes values after
sorting columns by name, so Spark aliases and SQL ``AS`` names must agree
exactly (enforced by tests/test_oracle_parity.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def load_all_plans() -> None:
    """Import every plan module so their @register decorators run."""
    # Imports are inside the function to avoid import cycles and to let
    # the package import cheaply (pyspark import is heavy enough already).
    from .operators import multimodal  # noqa: F401
    from .plans import (  # noqa: F401
        dedup,
        features,
        io_roundtrip,
        iterative,
        maintenance,
        mapreduce_parity,
        modern,
        pipeline,
        quality,
        relational,
        scalar_funcs,
        selection,
        similarity,
        text_analysis,
        windows,
    )
    from .streaming import stream_queries  # noqa: F401


def queries() -> dict[str, QueryFn]:
    load_all_plans()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    load_all_plans()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
