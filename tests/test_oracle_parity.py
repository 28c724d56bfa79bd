"""Column-name AND column-type parity between Spark queries and oracles.

The driver's value hash sorts columns BY NAME before hashing and is
TYPE-TAGGED: both r2 correctness failures (q15, q56) were bit-identical
values whose oracle column typed to DuckDB HUGEINT (bare ``sum(BIGINT)``)
while Spark produced LongType. Two gates here make that class of bug
mechanically impossible to ship:

1. ``test_columns_match_oracle`` — Spark aliases == oracle ``AS`` names.
2. ``test_types_match_oracle`` — every oracle output column's DuckDB
   type is the canonical mapping of the Spark column's DataType
   (long↔BIGINT, double↔DOUBLE, …; see mapreduce_mit_spark/typemap.py),
   and no oracle column types to HUGEINT/DECIMAL.

Most queries need only plan analysis on the Spark side (no job), but the
``sink``-tagged round-trips (q55-q57) EXECUTE real write/read jobs when
constructed — accepted cost at sf0.001 (tiny, scratch is per-process and
cleaned at exit); each fn is invoked once and its schema cached so the
two gates don't double-execute.

Streaming queries are excluded from the Spark-side gates (constructing
them runs the availableNow drain — covered by tests/test_streaming.py);
their oracles still get the duck-only hazard check in
``test_streaming_oracle_no_hazard_types``.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_mit_spark import registry
from mapreduce_mit_spark.sources.io import TABLE_NAMES
from mapreduce_mit_spark.typemap import HAZARD_TYPES, type_mismatches

from .conftest import SF_SMALL

registry.load_all_plans()

CHECKED = sorted(
    name
    for name, q in registry.REGISTRY.items()
    if q.oracle is not None and "streaming" not in q.tags
)

STREAMING_CHECKED = sorted(
    name
    for name, q in registry.REGISTRY.items()
    if q.oracle is not None and "streaming" in q.tags
)

_SCHEMA_CACHE: dict[str, object] = {}


def _spark_schema(spark, name):
    if name not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[name] = registry.REGISTRY[name].fn(spark, SF_SMALL).schema
    return _SCHEMA_CACHE[name]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_SMALL}/{name}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", CHECKED)
def test_columns_match_oracle(spark, duck, name):
    q = registry.REGISTRY[name]
    spark_cols = sorted(f.name for f in _spark_schema(spark, name).fields)
    duck_cols = sorted(duck.sql(q.oracle).columns)
    assert spark_cols == duck_cols, (
        f"{name}: Spark {spark_cols} vs oracle {duck_cols} — the driver "
        "hash compares by sorted column name; alias both sides identically"
    )


@pytest.mark.parametrize("name", CHECKED)
def test_types_match_oracle(spark, duck, name):
    q = registry.REGISTRY[name]
    rel = duck.sql(q.oracle)
    problems = type_mismatches(
        _spark_schema(spark, name), list(rel.columns), list(rel.types)
    )
    assert not problems, (
        f"{name}: cross-engine type contract violated — the driver's value "
        f"hash is type-tagged, equal values still mismatch: {problems}"
    )


@pytest.mark.parametrize("name", STREAMING_CHECKED)
def test_streaming_oracle_no_hazard_types(duck, name):
    q = registry.REGISTRY[name]
    rel = duck.sql(q.oracle)
    hazards = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(h in str(t).upper() for h in HAZARD_TYPES)
    ]
    assert not hazards, (
        f"{name}: oracle columns type to {hazards} — no Spark twin; "
        "CAST(sum(x) AS BIGINT) / integer-cents the oracle expression"
    )
