"""Event-time window aggregations over ``events`` (batch mode).

The reference is strictly batch with no notion of time (SURVEY §2.2);
these are the batch twins of the Structured Streaming queries in
``streaming/stream_queries.py`` — identical window arithmetic, so the
DuckDB oracle hash-checks the core semantics that the streaming
variants then re-run with watermarks (SURVEY §7.5 risk 5).

Oracle note: Spark's ``window()`` aligns tumbling/sliding windows to the
Unix epoch; DuckDB's ``time_bucket`` origin (2000-01-03 00:00:00) is
hour-aligned with it, so boundaries agree for the widths used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import money_sum as _total_value
from ._util import t


@register(
    "q70_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts)                    AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR  AS window_end,
           event_type,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
    tags=("window-time", "tumbling"),
)
def q70_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × event_type. One shuffle on
    (window, type); partial agg collapses before shuffle.

    ``value`` carries 2-decimal money; both engines sum integer cents so
    the surfaced double is summation-order independent (hash-safe)."""
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), _total_value())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q71_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL 15 MINUTE) AS window_start,
             value
      FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
      WHERE ts IS NOT NULL
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM slid
    GROUP BY 1, 2
    ORDER BY window_start
    """,
    tags=("window-time", "sliding"),
)
def q71_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour long, every 15 minutes — each event lands
    in 4 windows (Spark expands via the window generator; the oracle
    reproduces the expansion with an explicit ×4 cross join)."""
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "15 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_events"), _total_value())
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


@register(
    "q72_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 10 MINUTE
                  THEN 0 ELSE 1 END AS is_new
      FROM events
      WHERE ts IS NOT NULL
    ),
    sess AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           count(*) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM sess
    GROUP BY user_id, sess_id
    ORDER BY user_id, session_start
    """,
    tags=("window-time", "session"),
)
def q72_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user. Spark's session_window
    merges adjacent events server-side in one shuffle on user_id; the
    oracle is the classic gaps-and-islands rewrite with an INCLUSIVE
    gap comparison — two events exactly the gap apart MERGE (adjacency
    counts as overlap; pinned by tests/test_streaming.py::
    test_session_window_gap_boundary). Session end = last event + gap
    (Spark's definition)."""
    e = t(spark, sf_dir, "events")
    sw = F.session_window("ts", "10 minutes")
    return (
        e.groupBy(sw.alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), _total_value())
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "q135_rollup_ladder",
    oracle="""
    WITH minute AS (
      SELECT time_bucket(INTERVAL '1 minute', ts) AS bucket_start,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    hour AS (
      SELECT time_bucket(INTERVAL '1 hour', bucket_start) AS bucket_start,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
      FROM minute GROUP BY 1
    ),
    day AS (
      SELECT time_bucket(INTERVAL '1 day', bucket_start) AS bucket_start,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
      FROM hour GROUP BY 1
    )
    SELECT level, bucket_start, n_events, total_value FROM (
      SELECT 'hour' AS level, bucket_start, n AS n_events,
             cents / 100.0 AS total_value
      FROM hour
      UNION ALL
      SELECT 'day' AS level, bucket_start, n AS n_events,
             cents / 100.0 AS total_value
      FROM day
    )
    ORDER BY level, bucket_start
    """,
    tags=("window-time", "rollup-ladder", "timeseries"),
)
def q135_rollup_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate ladder: raw events roll up
    to minute buckets ONCE, then each coarser level (hour, day)
    aggregates the PREVIOUS level — the mergeable-aggregate discipline
    (count and integer-cent sums are associative) that time-series
    engines use to serve any-resolution queries without re-touching raw
    data.

    Scale shape: the 100 TB raw table is scanned exactly once, for the
    minute level; the hour level shuffles minute-cardinality rows and
    the day level hour-cardinality — both negligible. Catalyst plans
    the reused minute subtree once per consumer; on a real deployment
    each level would be a materialized sink the next level reads
    incrementally (the q115 upsert pattern), so the plan shape here —
    level N reading level N-1, never raw — is the one that matters."""
    e = t(spark, sf_dir, "events")
    minute = e.groupBy(
        F.date_trunc("minute", "ts").alias("bucket_start")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket_start").alias("bucket_start")
    ).agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    day = hour.groupBy(
        F.date_trunc("day", "bucket_start").alias("bucket_start")
    ).agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))

    def level(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            "bucket_start",
            F.col("n").alias("n_events"),
            (F.col("cents") / 100.0).alias("total_value"),
        )

    return (
        level(hour, "hour")
        .unionAll(level(day, "day"))
        .orderBy("level", "bucket_start")
    )


@register(
    "q142_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_view
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
           s3.user_id IS NOT NULL AS completed
    FROM s1
      LEFT JOIN s2 ON s1.user_id = s2.user_id
      LEFT JOIN s3 ON s2.user_id = s3.user_id
    ORDER BY s1.user_id
    """,
    tags=("window-time", "funnel", "sequential-pattern"),
)
def q142_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): each step's
    timestamp is the first occurrence STRICTLY AFTER the previous
    step — the sequential-pattern query engines with MATCH_RECOGNIZE
    express natively, built here from ordered min-aggregates and
    same-key joins.

    Scale shape: each step is one filtered scan (event_type pushes to
    the parquet scan) aggregated to user cardinality; every join and
    aggregate keys on user_id, so AQE schedules the step joins on the
    same partitioning with no extra exchange; step N's input is
    step N-1's (shrinking) survivor set. min(ts) is exact —
    deterministic flags."""
    e = t(spark, sf_dir, "events")

    def step(etype: str, prev: DataFrame | None, prev_ts: str, out_ts: str) -> DataFrame:
        s = e.where(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            s = s.join(prev.select("user_id", prev_ts), "user_id").where(
                F.col("ts") > F.col(prev_ts)
            )
        return s.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    s1 = step("view", None, "", "t_view")
    s2 = step("click", s1, "t_view", "t_click")
    s3 = step("purchase", s2, "t_click", "t_purchase")
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_purchase").isNotNull().alias("completed"),
        )
        .orderBy("user_id")
    )


@register(
    "q144_cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, time_bucket(INTERVAL '1 week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, time_bucket(INTERVAL '1 week', ts) AS active_week
      FROM events
    ),
    ret AS (
      SELECT c.cohort_week,
             CAST(date_diff('day', c.cohort_week, a.active_week) / 7 AS BIGINT)
               AS week_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM cohorts c JOIN activity a ON c.user_id = a.user_id
      WHERE a.active_week >= c.cohort_week
        AND date_diff('day', c.cohort_week, a.active_week) <= 21
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_week, count(*) AS n_cohort FROM cohorts GROUP BY 1
    )
    SELECT r.cohort_week, r.week_offset, r.n_active, s.n_cohort,
           round(r.n_active * 100.0 / s.n_cohort, 2) AS retention_pct
    FROM ret r JOIN sizes s ON r.cohort_week = s.cohort_week
    ORDER BY r.cohort_week, week_offset
    """,
    tags=("window-time", "cohort", "retention"),
)
def q144_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, then the
    share still active 0-3 weeks later — the product-analytics query
    every event warehouse serves.

    Scale shape: cohorts and activity are both user-keyed aggregates of
    one events scan each (the distinct collapses map-side); their join
    keys on user_id so AQE reuses the partitioning, and the retention
    matrix is (weeks × offsets) rows — tiny. The percentage divides two
    exact counts. Week buckets use Monday-anchored truncation in both
    engines (DuckDB time_bucket's default origin is 2000-01-03, a
    Monday, matching Spark's date_trunc('week'))."""
    e = t(spark, sf_dir, "events")
    week = lambda c: F.date_trunc("week", c)  # noqa: E731
    cohorts = e.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    activity = e.select("user_id", week("ts").alias("active_week")).distinct()
    offset = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("long")
    ret = (
        cohorts.join(activity, "user_id")
        .where(
            (F.col("active_week") >= F.col("cohort_week"))
            & (F.datediff(F.col("active_week"), F.col("cohort_week")) <= 21)
        )
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    sizes = cohorts.groupBy("cohort_week").agg(F.count("*").alias("n_cohort"))
    return (
        ret.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") * 100.0 / F.col("n_cohort"), 2).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )
