"""Relational operator catalog (SURVEY.md §2.2 checklist).

The reference engine has NO relational operators — projection/filter
exist only inside user map functions (wc.go:55-57), grouping only as the
reduce phase (common_reduce.go:49-73). This module supplies the full
relational surface a user of a modern engine expects, every query a
declarative DataFrame plan (Catalyst handles pushdown / pruning /
join-strategy / partial aggregation) with a DuckDB oracle twin.

Scale notes per query are in the docstrings; the common principles:
- dimension joins are broadcast (``F.broadcast``) — no shuffle of the
  fact table for small dims;
- fact-fact joins shuffle on the join key and rely on AQE for skew;
- aggregates are algebraic (sum/count/avg/min/max) so Catalyst emits
  partial (map-side) aggregation automatically — unlike the reference,
  which ships every raw KV across the shuffle (common_map.go:90-98).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ._util import ravg, rsum, t


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → hash agg (partial+final).

    Scale: one shuffle on the 2-value group key; partial aggregation
    collapses ~100 TB of lineitem to a handful of rows before shuffle.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rsum("l_quantity", "sum_qty"),
            rsum("l_extendedprice", "sum_base_price"),
            rsum(disc_price, "sum_disc_price"),
            rsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            ravg("l_quantity", "avg_qty"),
            ravg("l_extendedprice", "avg_price"),
            ravg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue,
           l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.08
      AND l_quantity > 30
    """,
    tags=("filter", "projection"),
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection + projection; predicates and column pruning reach the
    parquet scan (PushedFilters in .explain) — zero shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.08)
        & (F.col("l_quantity") > 30)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        "l_quantity",
    )


@register(
    "q10_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           count(*)                    AS n_orders,
           count(DISTINCT o_custkey)   AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           round(sum(o_totalprice), 2) AS total_revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg", "distinct"),
)
def q10_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase partial-distinct
    aggregate (expand + two shuffles), never a driver-side set."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            rsum("o_totalprice", "total_revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q11_rollup",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_balance
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("agg", "rollup"),
)
def q11_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total).

    Both dims are broadcast; the expand operator multiplies rows 3× but
    partial aggregation keeps the shuffle tiny."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), rsum("c_acctbal", "total_balance"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@register(
    "q12_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("agg", "cube"),
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims — all 4 grouping sets."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), rsum("o_totalprice", "revenue"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q13_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("agg", "grouping-sets"),
)
def q13_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@register(
    "q14_having",
    oracle="""
    SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
    FROM part
    GROUP BY p_brand
    HAVING count(*) >= 5
    ORDER BY p_brand
    """,
    tags=("agg", "having"),
)
def q14_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    p = t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"), ravg("p_retailprice", "avg_price"))
        .where(F.col("n_parts") >= 5)
        .orderBy("p_brand")
    )


@register(
    "q15_conditional_agg",
    oracle="""
    SELECT n_name,
           count(*) AS n_customers,
           CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'  THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
           CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS BIGINT) AS n_machinery,
           sum(CASE WHEN c_acctbal > 0 THEN CAST(round(c_acctbal * 100) AS BIGINT) ELSE 0 END) / 100.0 AS positive_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("agg", "case-when"),
)
def q15_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (sum of CASE WHEN).

    The money sum accumulates integer cents on both sides so the
    surfaced double is summation-order independent — `round(sum(double))`
    failed the cross-engine value-hash at a boundary value (r1)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)).alias("n_building"),
            F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)).alias("n_machinery"),
            (
                F.sum(
                    F.when(
                        F.col("c_acctbal") > 0,
                        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)"),
                    ).otherwise(F.lit(0))
                )
                / 100.0
            ).alias("positive_balance"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------

@register(
    "q20_broadcast_join",
    oracle="""
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("join", "broadcast"),
)
def q20_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim: explicit broadcast hint — the 100 TB lineitem
    never shuffles for this join; part ships to every executor."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            rsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


@register(
    "q21_shuffle_join",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c_mktsegment
    ORDER BY revenue DESC, c_mktsegment
    """,
    tags=("join", "sort-merge"),
)
def q21_shuffle_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact equi-join: sort-merge on the shuffled key at scale
    (AQE may downgrade to broadcast at small SF — that's the point of
    letting the optimizer choose)."""
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), rsum("o_totalprice", "revenue"))
        .orderBy(F.col("revenue").desc(), "c_mktsegment")
    )


@register(
    "q22_multiway_join",
    oracle="""
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    tags=("join", "multiway", "tpch"),
)
def q22_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: lineitem→orders→customer→nation→region.

    Scale: orders filter is pushed to the scan before the join; nation &
    region broadcast; lineitem⋈orders shuffles on orderkey once."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            rsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "q23_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def q23_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — existence check without duplicating rows."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q24_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def q24_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — customers with no large (>250k) order.

    The price predicate keeps the result non-empty at every SF (every
    customer has *some* order in this data); it lands on the join's
    streamed side pre-shuffle, so the anti-join shape is unchanged."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "q25_outer_join",
    oracle="""
    SELECT n_name,
           count(c_custkey) AS n_customers
    FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("join", "outer"),
)
def q25_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched dimension rows (count of a
    nullable column skips nulls — nations with zero customers show 0)."""
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy("n_name")
    )


@register(
    "q26_range_join",
    oracle="""
    SELECT o_orderkey,
           count(*) AS n_late_items,
           round(sum(l_extendedprice), 2) AS late_value
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderkey
    HAVING count(*) >= 4
    ORDER BY o_orderkey
    """,
    tags=("join", "range"),
)
def q26_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range predicate join (ship >90 days after order).

    The equi conjunct keeps this a hash/sort-merge join — the range
    condition is evaluated as a join residual, NOT a cartesian product."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAY")),
    )
    return (
        joined.groupBy("o_orderkey")
        .agg(F.count("*").alias("n_late_items"), rsum("l_extendedprice", "late_value"))
        .where(F.col("n_late_items") >= 4)
        .orderBy("o_orderkey")
    )


@register(
    "q27_theta_join",
    oracle="""
    SELECT a.s_name AS s1, b.s_name AS s2,
           round(a.s_acctbal - b.s_acctbal, 2) AS balance_gap
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_acctbal > b.s_acctbal
    ORDER BY s1, s2
    """,
    tags=("join", "theta"),
)
def q27_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta self-join (inequality pairing within nation). Supplier is a
    small dim so the nested-loop residual is cheap; at scale a band-
    partitioning would bound the quadratic blowup."""
    a = t(spark, sf_dir, "supplier").alias("a")
    b = t(spark, sf_dir, "supplier").alias("b")
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_acctbal") > F.col("b.s_acctbal")),
        )
        .select(
            F.col("a.s_name").alias("s1"),
            F.col("b.s_name").alias("s2"),
            F.round(F.col("a.s_acctbal") - F.col("b.s_acctbal"), 2).alias("balance_gap"),
        )
        .orderBy("s1", "s2")
    )


@register(
    "q28_asof_join",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           p.ts,
           max(c.ts) AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof"),
)
def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: for each purchase, the most recent strictly-earlier
    click by the same user.

    Spark plan: NOT a pairwise join — a single window pass over the
    unioned event stream (partition by user, order by time, running max
    of click timestamps). One shuffle on user_id, linear work; this is
    the scalable as-of strategy (the oracle's join+max formulation would
    be quadratic per user at 100 TB).
    """
    e = t(spark, sf_dir, "events")
    # RANGE frame over the numeric timestamp: the frame ends 1 µs before
    # the current row's ts, so "strictly earlier" is exact even when a
    # click and a purchase share a timestamp (a ROWS -1 frame would
    # admit same-ts peers and silently disagree with the strict < ).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    enriched = e.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return (
        enriched.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "q30_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
             CAST(rank()       OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk,
             CAST(dense_rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS drnk
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("window", "topk-per-group"),
)
def q30_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number/rank/dense_rank — one shuffle on
    the partition key; Spark pushes a per-partition limit (WindowGroupLimit)
    before the final sort."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "q31_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(datediff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS INTEGER) AS days_since_prev,
           lead(o_orderkey) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_orderkey
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("window", "lag-lead"),
)
def q31_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a per-customer event sequence."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@register(
    "q32_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg_3
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    tags=("window", "running"),
)
def q32_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average (explicit ROWS frames)."""
    o = t(spark, sf_dir, "orders")
    ordered = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = ordered.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(running), 2).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(moving), 4).alias("moving_avg_3"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


# --------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# --------------------------------------------------------------------------

@register(
    "q40_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort", "topk"),
)
def q40_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Catalyst plans TakeOrderedAndProject — each partition
    keeps k rows, only k×partitions reach the driver-side merge; no full
    sort of 100 TB ever happens."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q41_set_ops",
    oracle="""
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
         c96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
    SELECT 'both' AS cohort, o_custkey FROM (SELECT * FROM c95 INTERSECT SELECT * FROM c96)
    UNION ALL
    SELECT 'only_1995' AS cohort, o_custkey FROM (SELECT * FROM c95 EXCEPT SELECT * FROM c96)
    UNION ALL
    SELECT 'only_1996' AS cohort, o_custkey FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c95)
    ORDER BY cohort, o_custkey
    """,
    tags=("setop",),
)
def q41_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL cohort analysis."""
    o = t(spark, sf_dir, "orders")

    def cohort(year: int) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    c95, c96 = cohort(1995), cohort(1996)
    both = c95.intersect(c96).select(F.lit("both").alias("cohort"), "o_custkey")
    only95 = c95.exceptAll(c96).select(F.lit("only_1995").alias("cohort"), "o_custkey")
    only96 = c96.exceptAll(c95).select(F.lit("only_1996").alias("cohort"), "o_custkey")
    return both.unionAll(only95).unionAll(only96).orderBy("cohort", "o_custkey")


@register(
    "q42_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, l_quantity
    """,
    tags=("distinct",),
)
def q42_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates — hash aggregate on the full row, partial+final."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus", "l_quantity")
    )


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------

@register(
    "q43_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
    tags=("subquery", "scalar"),
)
def q43_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders at >1.8× the mean price
    — multiplier chosen so the result is non-empty at every SF)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "q44_in_subquery",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    ORDER BY p_partkey
    """,
    tags=("subquery", "in"),
)
def q44_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery — Catalyst rewrites to a left-semi join."""
    t(spark, sf_dir, "part").createOrReplaceTempView("part")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        ORDER BY p_partkey
        """
    )


@register(
    "q45_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_discount >= 0.09)
    ORDER BY s_suppkey
    """,
    tags=("subquery", "exists"),
)
def q45_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a semi join."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_discount >= 0.09)
        ORDER BY s_suppkey
        """
    )


@register(
    "q16_approx_distinct",
    oracle="""
    SELECT c_mktsegment,
           count(DISTINCT o_custkey) AS exact_customers,
           count(*) AS n_orders,
           true AS approx_within_bound
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg", "approx", "sketch"),
)
def q16_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per market segment.

    The 100 TB cardinality path: a fixed-size sketch that merges
    associatively across partitions — no expand + double shuffle like
    exact COUNT(DISTINCT), no memory proportional to cardinality.

    The HLL estimate itself is engine-specific, so it can't be surfaced
    to a cross-engine hash — instead the query asserts its documented
    accuracy in-band: ``approx_within_bound`` is true iff the sketch is
    within 5% (2.5× the configured rsd) of the exact sibling column,
    which the oracle expects to be uniformly true. A broken sketch
    flips the boolean and fails the hash — falsifiable, not rows-only.
    (The exact COUNT(DISTINCT) sibling exists for the check; at 100 TB
    you would ship only the sketch column.)"""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.count("*").alias("n_orders"),
        )
    )
    return agg.select(
        "c_mktsegment",
        "exact_customers",
        "n_orders",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("approx_within_bound"),
    ).orderBy("c_mktsegment")


@register(
    "q17_percentiles",
    oracle="""
    WITH rp AS (
      SELECT l_returnflag, l_extendedprice AS v,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             count(*)     OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           max(CASE WHEN rn = floor((n-1) * 0.25) + 1 THEN v END) AS p25_price,
           max(CASE WHEN rn = floor((n-1) * 0.5)  + 1 THEN v END) AS median_price,
           max(CASE WHEN rn = floor((n-1) * 0.9)  + 1 THEN v END) AS p90_price
    FROM rp GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def q17_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles: the data value at rank
    floor((n-1)*q)+1 per group (numpy method='lower').

    Implemented with operators/quantiles.exact_quantiles — a
    range-partitioned window sort + rank arithmetic instead of Spark's
    builtin ``percentile`` hashmap-merge aggregate (measured 2× faster
    at sf0.1; the builtin's per-group value maps merge on single
    reducers and OOM at scale, the sort path distributes and spills).
    Discrete mode returns values that exist in the data — bit-identical
    across engines with no rounding, where interpolated quantiles
    produce exact half-way midpoints whose float rounding is
    engine-dependent (observed at sf0.001). The operator also offers
    mode='linear' (numpy-verified); sketch-tolerant consumers should use
    ``approx_percentile`` (t-digest) instead.

    Group-size caveat, now MEASURED (SCALING.md round 5): each group
    sorts on ONE task here, and with only 3 l_returnflag groups the
    100× study degrades this plan 102× (1.0 s → 105 s) while q153's
    ranged formulation (exact_quantiles_ranged — every sort bounded by
    a shuffle partition) runs the same semantics at 8.7×. This query
    keeps the window strategy deliberately as the many-modest-groups
    representative; library users should call
    operators/quantiles.exact_quantiles_auto, which routes between the
    two from an approx_count_distinct probe. Both paths are checked
    against the same oracle."""
    from ..operators.quantiles import exact_quantiles

    li = t(spark, sf_dir, "lineitem")
    return (
        exact_quantiles(
            li, ["l_returnflag"], "l_extendedprice",
            {"p25_price": 0.25, "median_price": 0.5, "p90_price": 0.9},
            mode="disc",
        )
        .select("l_returnflag", "p25_price", "median_price", "p90_price")
        .orderBy("l_returnflag")
    )


@register(
    "q153_quantiles_giant_groups",
    oracle="""
    WITH rp AS (
      SELECT l_returnflag, l_extendedprice AS v,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             count(*)     OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           max(CASE WHEN rn = floor((n-1) * 0.25) + 1 THEN v END) AS p25_price,
           max(CASE WHEN rn = floor((n-1) * 0.5)  + 1 THEN v END) AS median_price,
           max(CASE WHEN rn = floor((n-1) * 0.9)  + 1 THEN v END) AS p90_price
    FROM rp GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "percentile", "skew"),
)
def q153_quantiles_giant_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17's exact percentiles computed by the FEW-GIANT-GROUPS path
    (operators/quantiles.exact_quantiles_ranged): range-repartition on
    (group, value), partition-local ranks, broadcast prefix counts —
    no task ever sorts more than one shuffle partition, so 3 groups
    spanning a 100 TB table cannot serialize onto 3 tasks the way a
    group-keyed window sort would. Same oracle as q17: the two rank
    strategies must agree value-for-value (and do — this is the
    cross-implementation check).

    Routed through ``exact_quantiles_auto`` with ``n_groups_hint=3``:
    l_returnflag is a known 3-value enum, so the hint replaces the
    per-call approx_count_distinct probe job with a pure plan-time
    decision (3 < shuffle-partitions → the ranged path, as before)."""
    from ..operators.quantiles import exact_quantiles_auto

    li = t(spark, sf_dir, "lineitem")
    return (
        exact_quantiles_auto(
            li, ["l_returnflag"], "l_extendedprice",
            {"p25_price": 0.25, "median_price": 0.5, "p90_price": 0.9},
            mode="disc",
            n_groups_hint=3,
        )
        .select("l_returnflag", "p25_price", "median_price", "p90_price")
        .orderBy("l_returnflag")
    )


@register(
    "q33_window_frames",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4)  OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER wr AS DOUBLE) AS range_sum,
           count(*) OVER wr AS range_n
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
           wr AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
    tags=("window", "frames"),
)
def q33_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame coverage: ntile / percent_rank / cume_dist over a
    row-ordered window plus a RANGE frame (value-based: all orders within
    10k below the current price). The ORDER BY includes o_orderkey so
    tile assignment on price ties is deterministic across engines.

    Float discipline: the frame aggregate is an exact decimal SUM (plus
    the frame row count) — summation-order independent and boundary-free,
    where a rounded double avg() differed between engines at half-cent
    boundaries."""
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wr = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(wr)
            .cast("double")
            .alias("range_sum"),
            F.count("*").over(wr).alias("range_n"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q46_hash_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '199a'
    ORDER BY o_orderkey
    """,
    tags=("sampling", "training-pipeline"),
)
def q46_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample (md5 of the key) — the training-
    pipeline split primitive. Unlike TABLESAMPLE/rand(), the sample is a
    pure function of the key: stable across runs, engines, partitionings
    and cluster sizes, and it composes (the same predicate defines the
    holdout everywhere). Evaluates scan-side with zero shuffle."""
    o = t(spark, sf_dir, "orders")
    return (
        o.where(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4) < "199a")
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )


@register(
    "q47_pivot",
    oracle="""
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS rev_f,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS rev_o,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS rev_p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg", "pivot"),
)
def q47_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order status becomes columns (explicit value list, so the
    plan is a single pass of conditional aggregates — no second job to
    discover pivot values, which at 100 TB would be its own scan)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
        )
    )
    return piv.select(
        "c_mktsegment",
        F.col("F_n").alias("n_f"),
        F.col("O_n").alias("n_o"),
        F.col("P_n").alias("n_p"),
        F.col("F_rev").alias("rev_f"),
        F.col("O_rev").alias("rev_o"),
        F.col("P_rev").alias("rev_p"),
    ).orderBy("c_mktsegment")


@register(
    "q18_salted_agg",
    oracle="""
    SELECT o_orderstatus,
           count(o_orderkey)            AS n_orders,
           round(sum(o_totalprice), 2)  AS revenue,
           round(min(o_totalprice), 2)  AS min_price,
           round(max(o_totalprice), 2)  AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "skew", "salting"),
)
def q18_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on a deliberately skewed key
    (o_orderstatus has 3 values — every row is a 'hot key'). The salted
    plan must produce byte-identical results to the plain GROUP BY the
    oracle runs: salting changes the shuffle layout, never the answer."""
    from ..operators.skew import salted_aggregate

    o = t(spark, sf_dir, "orders")
    out = salted_aggregate(
        o,
        keys=["o_orderstatus"],
        aggs=[
            ("o_orderkey", "count", "n_orders"),
            ("o_totalprice", "sum", "revenue"),
            ("o_totalprice", "min", "min_price"),
            ("o_totalprice", "max", "max_price"),
        ],
        spread_col="o_orderkey",
        n_salts=32,
    )
    return out.select(
        "o_orderstatus",
        "n_orders",
        F.round("revenue", 2).alias("revenue"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    ).orderBy("o_orderstatus")


@register(
    "q19_salted_join",
    oracle="""
    SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("join", "skew", "salting"),
)
def q19_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (customer nationkeys are skewed toward a few
    nations at scale): fact side salted by hash(c_custkey), nation
    replicated 8×, shuffle key (nationkey, salt). Must equal the plain
    join the oracle runs."""
    from ..operators.skew import salted_join

    c = t(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "nk")
    n = t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "nk")
    joined = salted_join(c, n, on="nk", spread_col="c_custkey", n_salts=8)
    return (
        joined.groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), rsum("c_acctbal", "total_bal"))
        .orderBy("n_name")
    )


@register(
    "q29_full_outer_join",
    oracle="""
    WITH big AS (SELECT o_custkey, count(*) AS n_big FROM orders
                 WHERE o_totalprice > 200000 GROUP BY o_custkey),
         rich AS (SELECT c_custkey, round(c_acctbal, 2) AS bal FROM customer
                  WHERE c_acctbal > 9000)
    SELECT coalesce(o_custkey, c_custkey) AS custkey,
           n_big, bal
    FROM big FULL OUTER JOIN rich ON o_custkey = c_custkey
    ORDER BY custkey
    """,
    tags=("join", "outer"),
)
def q29_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two partial views of the customer base —
    rows survive from either side; COALESCE rebuilds the key."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        o.where(F.col("o_totalprice") > 200000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    rich = c.where(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    return (
        big.join(rich, big.o_custkey == rich.c_custkey, "full_outer")
        .select(
            F.coalesce("o_custkey", "c_custkey").alias("custkey"),
            "n_big",
            "bal",
        )
        .orderBy("custkey")
    )


@register(
    "q48_stratified_sample",
    oracle="""
    WITH sampled AS (
      SELECT c_mktsegment, c_custkey, c_acctbal
      FROM customer
      WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4) <
            CASE c_mktsegment WHEN 'AUTOMOBILE' THEN '1999' ELSE '0ccd' END
    )
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS c_acctbal
    FROM sampled
    ORDER BY c_mktsegment, c_custkey
    """,
    tags=("sampling", "stratified", "training-pipeline"),
)
def q48_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum rates (10% arms,
    oversample AUTOMOBILE at 20%) via the same md5-keyed predicate as
    q46 — the class-rebalancing primitive of training pipelines, still a
    pure function of the key (stable under reruns, engines, partition
    layouts) and still pushed to the scan with zero shuffle."""
    c = t(spark, sf_dir, "customer")
    threshold = F.when(F.col("c_mktsegment") == "AUTOMOBILE", F.lit("1999")).otherwise(
        F.lit("0ccd")
    )
    return (
        c.where(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 4) < threshold)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"))
        .orderBy("c_mktsegment", "c_custkey")
    )


@register(
    "q49_histogram",
    oracle="""
    SELECT least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9) AS bucket,
           CAST(least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9) * 50000.0 AS DOUBLE) AS bucket_lo,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY bucket
    """,
    tags=("agg", "histogram"),
)
def q49_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (50k buckets, top-coded at bucket 9) — one
    partial+final hash aggregate over an integer bucket expression; the
    profiling primitive that replaces a sort-based quantile scan when
    only the distribution shape is needed."""
    o = t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"), (bucket * 50000.0).alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("bucket")
    )


@register(
    "q34_first_last_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey)  OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_orderkey
    """,
    tags=("window", "value-functions"),
)
def q34_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit unbounded
    frame (the default frame for last_value — rows up to CURRENT ROW —
    is the classic wrong answer; pinning the frame makes 'last' mean
    the partition's last). Unique (date, key) ordering keeps ties
    deterministic across engines."""
    o = t(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(w).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "q35_unpivot",
    oracle="""
    WITH stats AS (
      SELECT o_orderstatus,
             round(min(o_totalprice), 2) AS min_price,
             round(max(o_totalprice), 2) AS max_price,
             round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, metric, value
    FROM stats
    UNPIVOT (value FOR metric IN (min_price, max_price, sum_price))
    ORDER BY o_orderstatus, metric
    """,
    tags=("reshape", "unpivot"),
)
def q35_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long, the inverse of q47): per-status price stats
    melted to (status, metric, value) rows via stack() — an Expand node,
    no shuffle beyond the feeding aggregate."""
    o = t(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderstatus").agg(
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )
    return (
        stats.selectExpr(
            "o_orderstatus",
            "stack(3, 'min_price', min_price, 'max_price', max_price, "
            "'sum_price', sum_price) AS (metric, value)",
        )
        # EXCLUDE NULLS — the SQL-standard UNPIVOT default (and
        # DuckDB's): a group whose prices are all NULL melts to zero
        # rows; stack() alone would keep the NULL cells
        .where(F.col("value").isNotNull())
        .orderBy("o_orderstatus", "metric")
    )


@register(
    "q69_approx_percentile",
    oracle="""
    WITH rp AS (
      SELECT l_returnflag, l_extendedprice AS v,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             count(*)     OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           max(CASE WHEN rn = floor((n-1) * 0.5) + 1 THEN v END) AS median_exact,
           max(n) AS n_rows,
           true AS approx_within_bound
    FROM rp GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "approx", "percentile", "sketch"),
)
def q69_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) with an in-band
    falsifiable accuracy check — the sketch sibling of q16's HLL
    pattern.

    The sketch value itself is engine-specific, so what the oracle
    checks is its GUARANTEE: with accuracy=1000 the returned value's
    rank must lie within n/1000 of the target rank; the query verifies
    rank(approx_median) ∈ [n/2 − n/100, n/2 + n/100] (10× slack) by
    counting values on each side of the sketch's answer, and surfaces
    the boolean the oracle expects to be uniformly true, plus the
    exact median (q17's rank arithmetic) as the value-checked sibling.
    At 100 TB the sketch is the only viable path — fixed-size state,
    associative merge — and this query is the harness that keeps it
    honest."""
    from ..operators.quantiles import exact_quantiles

    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    ap = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("av"),
        F.count("*").alias("n_rows"),
    )
    # eqNullSafe join: a NULL group key is legitimate dirty data and a
    # plain equi-join would silently drop that whole group (NULL never
    # equals NULL), diverging from the oracle's window formulation
    ranks = (
        li.join(
            F.broadcast(ap.withColumnRenamed("l_returnflag", "_rf")),
            F.col("l_returnflag").eqNullSafe(F.col("_rf")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_extendedprice") < F.col("av"), 1).otherwise(0)).alias("r_lo"),
            F.sum(F.when(F.col("l_extendedprice") <= F.col("av"), 1).otherwise(0)).alias("r_hi"),
            F.any_value("n_rows").alias("n_rows"),
            F.any_value("av").alias("av"),
        )
    )
    eps = F.col("n_rows") / 100.0
    target = F.col("n_rows") / 2.0
    checked = ranks.select(
        "l_returnflag",
        "n_rows",
        # a group with no non-NULL values has no sketch answer to
        # grade: the guarantee holds vacuously (the oracle emits a
        # constant true)
        F.when(F.col("av").isNull(), F.lit(True))
        .otherwise((F.col("r_hi") >= target - eps) & (F.col("r_lo") <= target + eps))
        .alias("approx_within_bound"),
    )
    exact = exact_quantiles(
        li, ["l_returnflag"], "l_extendedprice", {"median_exact": 0.5}, mode="disc"
    ).select("l_returnflag", "median_exact")
    return (
        exact.withColumnRenamed("l_returnflag", "_erf")
        .join(checked, F.col("_erf").eqNullSafe(F.col("l_returnflag")))
        .select("l_returnflag", "median_exact", "n_rows", "approx_within_bound")
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# TPC-H classics (adapted to the driver schema)
# --------------------------------------------------------------------------

# Integer-cents revenue: the row-level product is IEEE-identical across
# engines, rounding it to whole cents makes the SUM an exact integer —
# summation-order independent, so the surfaced double hashes identically.
# (Column built lazily — F.expr at module import would need a live
# SparkContext.)
_REV_CENTS_SQL = "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _rev_cents() -> Column:
    return F.expr(_REV_CENTS_SQL)


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           sum({_REV_CENTS_SQL}) / 100.0 AS revenue,
           o_orderdate
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority), adapted to the driver schema
    (no o_shippriority column; date pivot chosen inside the data range).

    Scale shape: customer is the small side (broadcast after its
    segment filter); orders⋈lineitem is the fact-fact equi-join on the
    shuffle key both sides already filter; the top-10 fuses into
    TakeOrderedAndProject after the group-by — no global sort."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(_rev_cents()) / 100.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           sum({_REV_CENTS_SQL}) / 100.0 AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "multiway", "agg", "tpch"),
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): six-way join with the
    cross-table correlation c_nationkey = s_nationkey — revenue only
    counts when the customer's nation matches the supplier's.

    Scale shape: region/nation/supplier/customer are all dimension
    sides (broadcast); the only fact-fact shuffle is orders⋈lineitem on
    orderkey. The nation-match correlation rides the supplier join as a
    second equi-condition — no extra exchange. Output is nations (≤25
    rows), so the final sort is trivial."""
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(_rev_cents()) / 100.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q106_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS ship_year,
           sum({_REV_CENTS_SQL}) / 100.0 AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
        OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """,
    tags=("join", "multiway", "agg", "tpch"),
)
def q106_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): trade between two nations in both
    directions, yearly — the same dimension table (nation) joined TWICE
    under different roles, with a disjunctive cross-role predicate.

    Scale shape: both nation roles, supplier, and customer broadcast;
    the only shuffle is the fact-fact orders⋈lineitem join plus the
    final small group-by. The OR predicate over the two role pairs is
    evaluated post-broadcast-join — Catalyst cannot push a cross-table
    disjunction into either scan, but the broadcast sides make it a
    map-side filter, no extra exchange."""
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg((F.sum(_rev_cents()) / 100.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q107_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           sum({_REV_CENTS_SQL}) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q107_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): revenue lost to returns per
    customer, top 20 — join-heavy aggregation whose group key is the
    customer, not the order.

    Scale shape: the selective l_returnflag filter is pushed to the
    lineitem scan (parquet min/max + dictionary); customer and nation
    broadcast; the group-by shuffles on c_custkey and the top-20 fuses
    into TakeOrderedAndProject — no global sort of all customers."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (F.sum(_rev_cents()) / 100.0).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q108_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 150
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           round(o_totalprice, 2) AS total_price,
           total_qty
    FROM big
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 25
    """,
    tags=("join", "agg", "having", "semi", "tpch"),
)
def q108_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): customers whose single orders
    exceed a quantity threshold — aggregate-then-join, the HAVING
    result driving the join rather than filtering after it.

    Scale shape: the heavy aggregation (sum of quantity per order)
    runs FIRST on lineitem alone with map-side partial sums; only the
    surviving order keys (a tiny fraction) join back to orders and
    customer. At 100 TB the big-order set is small enough that AQE
    converts the orders join to broadcast at runtime — the expensive
    table is touched exactly once."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(25)
    )


@register(
    "q109_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "agg", "subquery", "tpch"),
)
def q109_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed
    0, 1, 2, … orders — a LEFT OUTER join whose null-extended rows are
    the point (zero-order customers must survive into the histogram),
    then a second aggregation over the first's result.

    Scale shape: the outer join shuffles both sides on custkey once;
    the per-customer count is map-side partial after it; the second
    group-by is over a tiny domain (distinct order counts), so the
    final exchange moves almost nothing. count(o_orderkey) — not
    count(*) — keeps null-extended rows at zero in both engines."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q110_idle_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_custs,
           sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "anti", "subquery", "scalar", "agg", "tpch"),
)
def q110_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no URGENT order — an uncorrelated scalar subquery
    (the average) AND a correlated NOT EXISTS (the anti join) in one
    predicate. (Q22 correlates against all orders; the synthetic data
    gives every customer at least one order at small SFs, so the
    correlate filters to urgent orders to keep the result non-empty —
    5 / 75 / 937 rows-in at sf 0.001 / 0.01 / 0.1.)

    Scale shape: the average is one map-side-combinable pass over
    customer, broadcast back as a literal; the NOT EXISTS becomes a
    left-anti shuffle join on custkey against orders projected to its
    join key only (column pruning makes the probe side narrow). Money
    accumulates as integer cents so the surfaced double is
    summation-order independent."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_custs,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0D AS total_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@register(
    "q111_cheapest_in_type",
    oracle="""
    SELECT p_type, p_partkey, p_name, p_brand,
           round(p_retailprice, 2) AS retail
    FROM part p
    WHERE p_retailprice = (SELECT min(p2.p_retailprice)
                           FROM part p2 WHERE p2.p_type = p.p_type)
    ORDER BY p_type, p_partkey
    """,
    tags=("subquery", "correlated", "window", "argmin", "tpch"),
)
def q111_cheapest_in_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's core pattern (correlated argmin): the row(s) holding
    the per-group minimum, expressed in the oracle as a correlated
    scalar subquery.

    Scale shape: implemented as a window min over p_type — ONE shuffle
    on the group key and a streaming filter, where the naive
    decorrelation (aggregate + self-join) would shuffle part twice.
    Equality on the raw stored double is bit-exact in both engines
    because min() returns one of the stored values unchanged."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        p.withColumn("min_price", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("min_price"))
        .select(
            "p_type",
            "p_partkey",
            "p_name",
            "p_brand",
            F.round("p_retailprice", 2).alias("retail"),
        )
        .orderBy("p_type", "p_partkey")
    )


@register(
    "q112_priority_returns",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "subquery", "exists", "agg", "tpch"),
)
def q112_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders with at least
    one returned line, counted per priority — a correlated EXISTS that
    must NOT double-count orders with several matching lines.

    Scale shape: the EXISTS is a left-semi join (emits each order at
    most once, no dedup pass needed); the returnflag filter is pushed
    to the lineitem scan and the semi-join probe side carries only
    l_orderkey. The final group-by is over 5 priorities — the last
    exchange is negligible."""
    o = t(spark, sf_dir, "orders")
    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q113_top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, sum({_REV_CENTS_SQL}) / 100.0 AS total_revenue
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("subquery", "scalar", "agg", "join", "tpch"),
)
def q113_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose total revenue
    equals the global maximum — the same derived aggregate used twice
    (as rows and as a scalar max), the pattern Q15 expresses with a
    view.

    Scale shape: revenue-per-supplier is one partial+final aggregation
    of lineitem; the max is a 1-row aggregate of THAT small result
    (supplier-cardinality, not lineitem-cardinality) broadcast back as
    a scalar; supplier joins by broadcast. The fact table is scanned
    exactly once. Revenue sums integer cents, so the double compared
    for equality is identical in both engines."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        f"""
        WITH rev AS (
          SELECT l_suppkey, sum({_REV_CENTS_SQL}) / 100.0D AS total_revenue
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s_suppkey
        """
    )


# --------------------------------------------------------------------------
# TPC-H completion pack (the remaining 11 of the 22 canonical queries).
# The synthetic schema is a reduced TPC-H — no partsupp, l_shipmode,
# l_commitdate/l_receiptdate, or p_container — so Q9/Q11/Q12/Q16/Q19/
# Q20/Q21 keep the canonical query SHAPE (the join topology, subquery
# nesting, and aggregate structure the optimizer must handle) with
# predicates adapted to the columns that exist. Reference provenance:
# the reference engine (mapreduce/master.go:55-87) can express none of
# these — they are the relational surface a reference user would need
# Spark for.
# --------------------------------------------------------------------------

@register(
    "q116_forecast_revenue",
    oracle="""
    SELECT sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) / 100.0
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
    tags=("agg", "filter", "tpch"),
)
def q116_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): a pure scan-filter-agg
    with three conjunctive range predicates and no join or group key.

    Scale shape: ALL three predicates push to the parquet scan
    (min/max row-group skipping on l_shipdate does most of the work at
    100 TB — a year of a 7-year table reads ~1/7 of the row groups);
    the aggregate is a map-side partial sum with a 1-row final — no
    meaningful shuffle. The revenue product rounds to integer cents
    per row before summing, so the surfaced double is bit-identical
    across engines and partitionings."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(F.expr("CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)"))
                / 100.0
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q117_market_share",
    oracle=f"""
    WITH sold AS (
      SELECT EXTRACT(year FROM o_orderdate) AS order_year,
             sn.n_name AS supp_nation,
             {_REV_CENTS_SQL} AS cents
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT order_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN cents ELSE 0 END) AS BIGINT)
                 * 1.0 / CAST(sum(cents) AS BIGINT), 6) AS mkt_share
    FROM sold
    GROUP BY order_year
    ORDER BY order_year
    """,
    tags=("join", "multiway", "agg", "ratio", "tpch"),
)
def q117_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of revenue
    within one region's customers for one part type, per year — an
    8-table join with nation playing two roles, feeding a conditional-
    sum ratio.

    Scale shape: every dimension (part, supplier, customer, nation x2,
    region) broadcasts; the only repartition-scale shuffle is
    lineitem⋈orders, then a tiny group-by on year. The share divides
    two exact integer cent sums, so the rounded double is
    deterministic regardless of partial-agg order."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    p = t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation_cents = F.sum(
        F.when(F.col("supp_nation") == "NATION_7", _rev_cents()).otherwise(F.lit(0))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(nation_cents * 1.0 / F.sum(_rev_cents()), 6).alias("mkt_share")
        )
        .orderBy("order_year")
    )


@register(
    "q118_product_profit",
    oracle="""
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS order_year,
           sum(CAST(round((l_extendedprice * (1 - l_discount)
                           - 0.5 * p_retailprice * l_quantity) * 100) AS BIGINT))
             / 100.0 AS profit
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, order_year
    ORDER BY nation, order_year DESC
    """,
    tags=("join", "multiway", "agg", "expression", "tpch"),
)
def q118_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit): per-nation, per-year profit on
    parts matching a name pattern. The canonical cost term is
    ps_supplycost (partsupp is absent from this schema), so cost is
    modeled as half the part's retail price per unit — same expression
    shape: a multi-table arithmetic combining fact and dimension
    columns inside one aggregate.

    Scale shape: part (filtered by the LIKE before broadcast),
    supplier, and nation broadcast; lineitem⋈orders is the one big
    shuffle. The LIKE prefix pattern pushes to the part scan as a
    string-range predicate. Profit rounds to integer cents per row
    before summation — order-independent across engines."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    profit_cents = F.expr(
        "CAST(round((l_extendedprice * (1 - l_discount)"
        " - 0.5 * p_retailprice * l_quantity) * 100) AS BIGINT)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg((F.sum(profit_cents) / 100.0).alias("profit"))
        .orderBy("nation", F.col("order_year").desc())
    )


@register(
    "q119_vital_suppliers",
    oracle=f"""
    WITH sv AS (
      SELECT s_suppkey, s_name,
             CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS value_cents
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_suppkey, s_name
    )
    SELECT s_suppkey, s_name, value_cents / 100.0 AS ship_value
    FROM sv
    WHERE value_cents > (SELECT CAST(sum(value_cents) AS BIGINT) FROM sv)
                        * 1.05 / (SELECT count(*) FROM supplier)
    ORDER BY value_cents DESC, s_suppkey
    """,
    tags=("agg", "subquery", "scalar", "having", "tpch"),
)
def q119_vital_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock) shape: per-key aggregate filtered
    against a FRACTION OF THE GLOBAL aggregate of the same measure —
    partsupp value in the canonical query, shipped revenue here. The
    defining feature survives: the same fact table aggregated twice at
    different granularities, the scalar feeding a HAVING-style filter.

    Scale shape: per-supplier revenue is one partial+final agg of
    lineitem; the global total is a second 1-row aggregate REUSING the
    per-supplier result (supplier-cardinality input, not a second
    lineitem scan — Spark-side, sv is cached into both roles by the
    self-referencing plan); the threshold broadcasts as a scalar.
    Integer-cents comparison both sides."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        f"""
        WITH sv AS (
          SELECT s_suppkey, s_name,
                 CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS value_cents
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY s_suppkey, s_name
        )
        SELECT s_suppkey, s_name, value_cents / 100.0D AS ship_value
        FROM sv
        WHERE value_cents > (SELECT sum(value_cents) FROM sv)
                            * 1.05 / (SELECT count(*) FROM supplier)
        ORDER BY value_cents DESC, s_suppkey
        """
    )


@register(
    "q120_late_shipment_priority",
    oracle="""
    SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 180 DAY
    GROUP BY ship_year
    ORDER BY ship_year
    """,
    tags=("join", "agg", "case-when", "tpch"),
)
def q120_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority): late line items
    bucketed into high- vs low-priority counts per group. The schema
    has no l_shipmode or commit/receipt dates, so "late" is shipped
    more than 180 days after the order date and the group key is the
    ship year — the shape (join + cross-table inequality predicate +
    dual conditional counts) is Q12's.

    Scale shape: the lateness predicate compares columns from BOTH
    sides, so it cannot push below the join — it evaluates as a
    post-join filter on the one lineitem⋈orders shuffle. Conditional
    counts are map-side partial; the final exchange carries one row
    per year."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAYS"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@register(
    "q121_promo_revenue",
    oracle=f"""
    SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
           round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_CENTS_SQL}
                          ELSE 0 END) AS BIGINT)
                 * 100.0 / CAST(sum({_REV_CENTS_SQL}) AS BIGINT), 4)
             AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY ship_year
    ORDER BY ship_year
    """,
    tags=("join", "agg", "ratio", "tpch"),
)
def q121_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of revenue from PROMO
    parts per ship year — a conditional sum over a dimension attribute
    divided by the unconditional sum, in one aggregation.

    Scale shape: part broadcasts (it is the small side everywhere);
    both sums fold into ONE map-side-combinable aggregate pass — the
    ratio of two exact cent totals is computed after the final agg, so
    no second scan and no float drift."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    promo_cents = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev_cents()).otherwise(F.lit(0))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.round(promo_cents * 100.0 / F.sum(_rev_cents()), 4).alias(
                "promo_share_pct"
            )
        )
        .orderBy("ship_year")
    )


@register(
    "q122_supplier_variety",
    oracle="""
    SELECT p_brand, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier
            WHERE s_acctbal < 0.5 * (SELECT avg(s_acctbal) FROM supplier))
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    tags=("join", "agg", "distinct", "subquery", "anti", "tpch"),
)
def q122_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many distinct
    suppliers ship each (brand, size) combination, excluding a
    blocklist of suppliers produced by a subquery — the canonical
    complaint-comment filter becomes a below-half-average balance
    filter on the columns this schema has.

    Scale shape: the NOT IN is a broadcast left-anti join (the
    blocklist is supplier-cardinality); part filters before its
    broadcast; count(DISTINCT) expands to a two-phase exact distinct
    (partial distinct on (brand,size,suppkey), then count) — one
    shuffle keyed by the group columns."""
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .where((F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    s = t(spark, sf_dir, "supplier")
    avg_bal = s.agg(F.avg("s_acctbal").alias("ab"))
    blocked = s.join(F.broadcast(avg_bal)).where(
        F.col("s_acctbal") < 0.5 * F.col("ab")
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(blocked), li.l_suppkey == blocked.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


@register(
    "q123_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(sum({_REV_CENTS_SQL}) AS BIGINT) / 100.0 / 7.0 AS avg_yearly,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    tags=("join", "agg", "subquery", "correlated", "tpch"),
)
def q123_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines whose quantity
    is below half that part's average quantity — a correlated scalar
    subquery on the FACT table itself, the classic decorrelate-to-
    aggregate-join pattern.

    Scale shape: decorrelated as a per-part average (one map-side-
    combinable agg of lineitem projected to two columns), joined back
    by part key. The per-part aggregate is part-cardinality, so it
    broadcasts; lineitem is scanned twice but shuffled zero times for
    the threshold path. Quantities are whole numbers stored as
    doubles, so avg = exact-sum / exact-count is bit-identical across
    engines and the 0.5× threshold comparison is deterministic."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    part_avg = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pa_partkey"))
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(part_avg), li.l_partkey == F.col("pa_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(_rev_cents()) / 100.0 / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q124_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(sum({_REV_CENTS_SQL}) AS BIGINT) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "disjunctive", "tpch"),
)
def q124_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): an OR of three conjunct groups,
    each mixing part attributes and lineitem attributes — the stress
    test for disjunctive predicate handling.

    Scale shape: Catalyst factors what it can (the implied
    p_brand IN (…) and l_quantity BETWEEN 1 AND 30 envelopes are
    derivable; the brand disjunction prunes part BEFORE broadcast) and
    evaluates the full cross-table disjunction as a map-side filter
    after the broadcast join — no shuffle at all on the fact table
    until the 1-row aggregate."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            (F.sum(_rev_cents()) / 100.0).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q125_part_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, n_name, round(s_acctbal, 2) AS acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS BIGINT)) >
               (SELECT 0.5 * CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       / count(DISTINCT l_suppkey)
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_name LIKE 'red%'))
    ORDER BY s_suppkey
    """,
    tags=("join", "semi", "subquery", "having", "scalar", "tpch"),
)
def q125_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers whose shipped
    quantity of pattern-matched parts clears a threshold derived from
    another aggregate of the same data — an IN subquery containing a
    GROUP BY … HAVING against a nested scalar subquery. (partsupp's
    available-quantity threshold becomes half the mean per-supplier
    shipped quantity.)

    Scale shape: the inner aggregate is one shuffle of the
    pattern-filtered lineitem keyed by supplier; its global mean is a
    1-row re-aggregate of THAT (supplier-cardinality) result; the
    survivors drive a broadcast semi join into supplier⋈nation. The
    fact table is scanned once; quantities sum as exact integers."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    per_supp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("red_qty"))
    )
    threshold = per_supp.agg(
        (0.5 * F.sum("red_qty") / F.count_distinct("l_suppkey")).alias("thr")
    )
    qualified = (
        per_supp.join(F.broadcast(threshold))
        .where(F.col("red_qty") > F.col("thr"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey", "s_name", "n_name", F.round("s_acctbal", 2).alias("acctbal")
        )
        .orderBy("s_suppkey")
    )


@register(
    "q126_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
      JOIN orders   ON l1.l_orderkey = o_orderkey
      JOIN supplier ON l1.l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 365 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "semi", "anti", "subquery", "correlated", "agg", "tpch"),
)
def q126_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): for finished
    orders, the supplier who was the ONLY late shipper on a
    multi-supplier order — the canonical EXISTS + NOT EXISTS pair of
    correlated self-joins on the fact table. "Late" is shipped >365
    days after the order date (no commit/receipt dates in this
    schema).

    Scale shape: both correlated subqueries decorrelate into ONE
    per-order aggregate over lineitem⋈orders (distinct supplier count,
    distinct LATE supplier count — two measures, one shuffle on
    l_orderkey), re-joined to the late rows ON THE SAME KEY — with the
    join and the aggregate co-partitioned on l_orderkey, AQE schedules
    no extra exchange for the probe. The EXISTS becomes
    n_suppliers > 1; the NOT EXISTS becomes n_late_suppliers = 1.
    Supplier and nation broadcast; the top-20 fuses into
    TakeOrderedAndProject."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn("is_late", late)
    order_stats = lo.groupBy(F.col("l_orderkey").alias("os_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supps"
        ),
    )
    return (
        lo.where(F.col("is_late"))
        .join(order_stats, F.col("l_orderkey") == F.col("os_orderkey"))
        .where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q136_asof_forward",
    oracle="""
    SELECT c.event_id,
           c.user_id,
           c.ts,
           min(p.ts) AS next_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    GROUP BY c.event_id, c.user_id, c.ts
    ORDER BY c.event_id
    """,
    tags=("join", "asof", "tolerance"),
)
def q136_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: for each click, the next
    purchase by the same user within one hour (conversion attribution).
    Completes the as-of family — q28 is backward/unbounded, this is
    forward/bounded.

    Spark plan: same single-window-pass strategy as q28 (reference for
    why: relational.py q28 docstring) — union stream, partition by
    user, RANGE frame (+1 µs, +1 h] over the numeric timestamp, min of
    purchase timestamps in frame. One shuffle on user_id, linear work;
    the tolerance bound also bounds window state. The oracle's
    join+min formulation is the quadratic shape this avoids."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(1, 3_600_000_000)
    )
    enriched = e.withColumn(
        "next_purchase_ts",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w),
    )
    return (
        enriched.where(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "next_purchase_ts")
        .orderBy("event_id")
    )


@register(
    "q146_lateral_join",
    oracle="""
    SELECT s.seg, l.c_custkey, round(l.c_acctbal, 2) AS acctbal
    FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) s,
    LATERAL (SELECT c_custkey, c_acctbal FROM customer
             WHERE c_mktsegment = s.seg
             ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
    ORDER BY seg, c_custkey
    """,
    tags=("join", "lateral", "subquery", "topk-per-group"),
)
def q146_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery in FROM (SQL:1999 lateral derived
    table): per market segment, the top-2 customers by balance — the
    lateral formulation of per-group top-k, complementing q30's window
    formulation and q100's UDTF lateral. Exercises Catalyst's
    DecorrelateInnerQuery on a LIMIT-bearing correlated subquery
    (supported since Spark 3.4).

    Scale shape: Catalyst decorrelates the lateral into a
    window/rank-per-partition over one shuffle on the correlation key —
    same physical shape as q30, arrived at from the SQL-surface side;
    deterministic via the custkey tie-break."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT s.seg, l.c_custkey, round(l.c_acctbal, 2) AS acctbal
        FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) s,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer
                 WHERE c_mktsegment = s.seg
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
        ORDER BY seg, c_custkey
        """
    )
