"""Property-based cross-engine semantics checks (hypothesis).

The driver's testdata can't contain every adversarial arrangement —
random timestamps almost never collide or land exactly a session gap
apart. These properties generate exactly those inputs and assert the
two semantic rewrites the catalog leans on hardest:

1. session windows ≡ gaps-and-islands with an INCLUSIVE gap comparison
   (tests/test_streaming.py pins the boundary by example; this pins it
   over arbitrary event sets, including exact-gap chains and duplicate
   timestamps),
2. the as-of join's single window pass (running max over a RANGE frame
   ending 1 µs before the row) ≡ the quadratic max-per-pair reference
   formulation, including same-timestamp click/purchase collisions
   which the strict `<` must exclude.

Examples are small (≤24 events over a tiny key/time domain to force
collisions) and deterministic (derandomize), so the suite stays fast
and reproducible.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1, 9, 0, 0)
GAP_MIN = 10

# minutes offsets drawn from multiples of the gap and near-misses so
# exact-gap adjacency, sub-gap, and super-gap spacings all occur; tiny
# user domain forces multi-event users and duplicate timestamps.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),          # user_id
        st.integers(min_value=0, max_value=12),         # slot
        st.sampled_from([0, 1, GAP_MIN, GAP_MIN + 1]),  # extra minutes
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=25, deadline=None, derandomize=True)
@given(events_strategy)
def test_session_window_equals_gaps_and_islands(spark_prop, raw):
    spark = spark_prop
    rows = [
        (i, u, BASE + timedelta(minutes=slot * GAP_MIN + extra))
        for i, (u, slot, extra) in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = sorted(
        (r["user_id"], r["w"]["start"], r["w"]["end"], r["n"])
        for r in df.groupBy(
            F.session_window("ts", f"{GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    con = duckdb.connect()
    con.register("ev", __import__("pandas").DataFrame(rows, columns=["event_id", "user_id", "ts"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH ordered AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               <= INTERVAL {GAP_MIN} MINUTE
                          THEN 0 ELSE 1 END AS is_new
              FROM ev
            ),
            sess AS (
              SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS sid
              FROM ordered
            )
            SELECT user_id, min(ts), max(ts) + INTERVAL {GAP_MIN} MINUTE, count(*)
            FROM sess GROUP BY user_id, sid
            """
        ).fetchall()
    )
    assert got == want


@settings(max_examples=25, deadline=None, derandomize=True)
@given(events_strategy)
def test_asof_window_pass_equals_pairwise(spark_prop, raw):
    spark = spark_prop
    rows = [
        (
            i,
            u,
            "click" if i % 2 == 0 else "purchase",
            BASE + timedelta(minutes=slot * GAP_MIN + extra),
        )
        for i, (u, slot, extra) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    got = sorted(
        (r["event_id"], r["last_click_ts"])
        for r in df.withColumn(
            "last_click_ts",
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
        )
        .where(F.col("event_type") == "purchase")
        .select("event_id", "last_click_ts")
        .collect()
    )
    con = duckdb.connect()
    con.register(
        "ev",
        __import__("pandas").DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts"]
        ),
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT p.event_id, max(c.ts) AS last_click_ts
            FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND c.ts < p.ts
            GROUP BY p.event_id
            """
        ).fetchall()
    )
    assert got == want


@settings(max_examples=25, deadline=None, derandomize=True)
@given(events_strategy)
def test_forward_asof_window_pass_equals_pairwise(spark_prop, raw):
    """q136's rewrite: a forward RANGE frame (+1 us, +1 h] min-of-
    purchase-ts == the quadratic pairwise min with p.ts > c.ts AND
    p.ts <= c.ts + 1 h — including same-timestamp collisions (strict >
    must exclude them) and events exactly at the tolerance bound
    (inclusive <= must keep them)."""
    spark = spark_prop
    rows = [
        (
            i,
            u,
            "click" if i % 2 == 0 else "purchase",
            BASE + timedelta(minutes=slot * GAP_MIN + extra),
        )
        for i, (u, slot, extra) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(1, 3_600_000_000)
    )
    got = sorted(
        (r["event_id"], r["next_purchase_ts"])
        for r in df.withColumn(
            "next_purchase_ts",
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
        )
        .where(F.col("event_type") == "click")
        .select("event_id", "next_purchase_ts")
        .collect()
    )
    con = duckdb.connect()
    con.register(
        "ev",
        __import__("pandas").DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts"]
        ),
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT c.event_id, min(p.ts) AS next_purchase_ts
            FROM (SELECT * FROM ev WHERE event_type = 'click') c
            LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id
             AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
            GROUP BY c.event_id
            """
        ).fetchall()
    )
    assert got == want



quantile_groups_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),                 # group
        st.integers(min_value=-1000, max_value=1000),          # value (ties likely)
    ),
    min_size=1,
    max_size=40,
)


@given(raw=quantile_groups_strategy)
@settings(max_examples=30, deadline=None, derandomize=True)
def test_quantile_strategies_agree_with_numpy(spark_prop, raw):
    """Both exact-quantile formulations — the window sort (q17's
    strategy) and the ranged prefix-count recovery (q153's) — must
    return numpy's 'linear' quantile for ARBITRARY group shapes:
    singleton groups, all-duplicate values, negative values, and group
    counts above and below the partition count. This is the consistency
    contract exact_quantiles_auto relies on: routing can never change
    the answer."""
    import numpy as np

    from mapreduce_mit_spark.operators.quantiles import (
        exact_quantiles,
        exact_quantiles_ranged,
    )

    spark = spark_prop
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in raw], "g int, v double"
    )
    qs = {"p10": 0.10, "p50": 0.50, "p75": 0.75}
    byg: dict[int, list[float]] = {}
    for g, v in raw:
        byg.setdefault(g, []).append(float(v))

    for impl in (
        lambda: exact_quantiles(df, ["g"], "v", qs),
        lambda: exact_quantiles_ranged(df, ["g"], "v", qs, partitions=4),
    ):
        got = {r["g"]: r for r in impl().collect()}
        assert set(got) == set(byg)
        for g, vals in byg.items():
            for alias, q in qs.items():
                want = float(np.percentile(vals, q * 100, method="linear"))
                assert abs(got[g][alias] - want) < 1e-9, (g, alias, raw)


@pytest.fixture(scope="module")
def spark_prop(spark):
    # hypothesis re-enters the test many times; reuse the session fixture
    # but shrink shuffle partitions for the tiny frames
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", prev)
