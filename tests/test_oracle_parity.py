"""Column-name parity between every Spark query and its DuckDB oracle.

The driver's value hash sorts columns BY NAME before hashing, so a
Spark alias that differs from the oracle's ``AS`` name fails the gate
even when values are identical — this is the cheapest class of red row
and the easiest to pin. Spark's side needs only plan analysis
(``df.columns``, no job), DuckDB's only binding (relation ``.columns``,
no fetch), so the whole catalog checks in seconds.

Streaming queries are excluded: constructing them EXECUTES the stream
(the fn runs the availableNow drain internally), which tests/
test_streaming.py and the oracle harness already cover.
"""

from __future__ import annotations

import duckdb
import pytest

from mapreduce_mit_spark import registry
from mapreduce_mit_spark.sources.io import TABLE_NAMES

from .conftest import SF_SMALL

registry.load_all_plans()

CHECKED = sorted(
    name
    for name, q in registry.REGISTRY.items()
    if q.oracle is not None and "streaming" not in q.tags
)


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
    spark_cols = sorted(q.fn(spark, SF_SMALL).columns)
    duck_cols = sorted(duck.sql(q.oracle).columns)
    assert spark_cols == duck_cols, (
        f"{name}: Spark {spark_cols} vs oracle {duck_cols} — the driver "
        "hash compares by sorted column name; alias both sides identically"
    )
