"""Skew-mitigation operators: salted aggregation and salted joins.

The reference routes every key through ``fnv32a(key) % R``
(/root/reference/src/mapreduce/common_map.go:90-107): one hot key lands
every record on one reduce task and the job runs at the speed of that
task. Spark's AQE skew-join splitting handles *join* skew at runtime,
but hot-key *aggregation* skew and deliberate salting remain library
concerns — these helpers implement the classic two-stage pattern:

  stage 1: group by (key, salt) — hot keys spread over ``n_salts``
           reducers, each computing a partial aggregate;
  stage 2: group by key — combine the ≤ n_salts partials per key.

Algebraic aggregates only (sum/count/min/max — anything with an
associative combine); avg is sum/count at the call site. The salt is
deterministic (hash of a caller-chosen spread column, not rand()), so
results are reproducible and retries are consistent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# second-stage combiner per first-stage aggregate
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    spread_col: str,
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` is ``[(col, fn, alias)]`` with fn in sum/count/min/max.
    ``spread_col`` is any column whose hash spreads a hot key's rows
    (an id, a timestamp — anything high-cardinality within the key).
    """
    unknown = [fn for _, fn, _ in aggs if fn not in _COMBINE]
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s): {unknown}")
    salt = F.pmod(F.hash(spread_col), F.lit(n_salts)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        *[getattr(F, fn)(c).alias(a) for c, fn, a in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[fn](a).alias(a) for _, fn, a in aggs]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    spread_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: salt the fact side, replicate the dim side.

    Each fact row gets a deterministic salt in [0, n_salts); the dim side
    is exploded n_salts× so every (key, salt) pair finds its match. The
    shuffle key becomes (key, salt) — a hot key spreads over n_salts
    reducers at the cost of an n_salts× dim replication (dim must be the
    small side; for dims small enough to broadcast, prefer
    ``F.broadcast`` which needs no salt at all). AQE's skew-join split
    covers the same ground reactively; this is the proactive form that
    also works where AQE can't see the skew (e.g. under a custom
    partitioner or a non-join downstream stage).
    """
    f_salted = fact.withColumn("_salt", F.pmod(F.hash(spread_col), F.lit(n_salts)))
    d_salted = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f_salted.join(d_salted, [on, "_salt"]).drop("_salt")
