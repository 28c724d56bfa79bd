"""Scalar function coverage: string / date / math / JSON / array.

The reference's entire scalar vocabulary is: string split (wc.go:55-57),
int parse/format (wc.go:39,47), string join (ii.go:52-58), JSON
encode/decode (common_map.go:78). This module covers the full built-in
families a user expects, always JVM-side (whole-stage codegen), never a
Python UDF.

Oracle notes: only functions with identical semantics in Spark and
DuckDB are used in oracle-checked queries (e.g. DuckDB's regexp_replace
needs the 'g' flag to match Spark's replace-all default; dayofweek
numbering differs so we use EXTRACT-based arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import t


@register(
    "q50_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           lower(p_brand)                                  AS brand_lower,
           length(p_name)                                  AS name_len,
           substr(p_name, 1, 5)                            AS name_prefix,
           replace(p_name, ' ', '_')                       AS name_snake,
           concat_ws('|', p_brand, p_type)                 AS brand_type,
           regexp_extract(p_brand, '([0-9]+)$', 1)         AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           trim('  ' || p_type || ' ')                     AS type_trimmed,
           reverse(p_brand)                                AS brand_rev,
           strpos(p_name, 'a')                             AS first_a
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def q50_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)$", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
    ).orderBy("p_partkey")


@register(
    "q51_date_funcs",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year  FROM o_orderdate)                       AS order_year,
           EXTRACT(month FROM o_orderdate)                       AS order_month,
           EXTRACT(day   FROM o_orderdate)                       AS order_day,
           EXTRACT(quarter FROM o_orderdate)                     AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)   AS month_start,
           o_orderdate + INTERVAL 30 DAY                         AS due_date,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    tags=("scalar", "date"),
)
def q51_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over orders."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
    ).orderBy("o_orderkey")


@register(
    "q52_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 2)      AS abs_dev,
           CAST(floor(l_quantity / 7) AS BIGINT)       AS qty_bucket,
           CAST(ceil(l_discount * 100) AS BIGINT)      AS disc_pct,
           round(sqrt(l_extendedprice), 6)             AS price_sqrt,
           round(ln(l_extendedprice), 6)               AS price_ln,
           round(pow(1 + l_tax, 2), 6)                 AS tax_sq,
           CAST(l_quantity AS BIGINT) % 5              AS qty_mod5,
           CAST(sign(l_discount - 0.05) AS DOUBLE)     AS disc_sign,
           greatest(l_discount, l_tax)                 AS max_rate,
           least(l_discount, l_tax)                    AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math"),
)
def q52_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery over lineitem."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 2).alias("abs_dev"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod5"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q53_json_funcs",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT))           AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("scalar", "json"),
)
def q53_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column.

    Spark side uses get_json_object (codegen'd JSON path eval); a
    from_json(schema) variant is exercised in tests. At scale, parse
    once and persist typed columns instead of re-parsing per query."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q54_array_funcs",
    oracle="""
    SELECT vec_id,
           label,
           len(embedding)                                          AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)                  AS first_elem,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sq_norm,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6)  AS elem_sum,
           round(CAST(list_max(embedding) AS DOUBLE), 6)           AS elem_max,
           round(CAST(list_min(embedding) AS DOUBLE), 6)           AS elem_min
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
    tags=("scalar", "array"),
)
def q54_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array (vector) function battery over embeddings — all JVM-side
    higher-order functions, no Python in the loop."""
    e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 6).alias("elem_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("elem_max"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("elem_min"),
    ).orderBy("vec_id")


@register(
    "q58_map_funcs",
    oracle="""
    WITH typed AS (
      SELECT event_type,
             json_keys(props) AS ks,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
      FROM events
    ),
    stats AS (
      SELECT event_type,
             count(*) AS n_events,
             CAST(sum(len(ks)) AS BIGINT) AS total_keys,
             CAST(sum(kv) AS BIGINT) AS sum_k
      FROM typed GROUP BY event_type
    ),
    keys AS (
      SELECT event_type,
             list_aggregate(list_sort(list_distinct(flatten(list(ks)))), 'string_agg', ',') AS key_list
      FROM typed GROUP BY event_type
    )
    SELECT s.event_type, n_events, total_keys, sum_k, key_list
    FROM stats s LEFT JOIN keys k
      ON s.event_type IS NOT DISTINCT FROM k.event_type
    ORDER BY s.event_type
    """,
    tags=("scalar", "map"),
)
def q58_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column functions: ``from_json`` into ``map<string,
    bigint>``, then ``map_keys`` / ``size`` / ``element_at`` per event
    type, plus the distinct key vocabulary per group.

    The key vocabulary is computed scale-safely — explode keys,
    distinct, then collect the (bounded-by-vocabulary) set — never
    ``collect_list`` of unbounded per-row arrays. Maps stay internal;
    the surfaced columns are scalars/strings so the cross-engine hash
    is stable (map column ordering is engine-specific)."""
    e = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    typed = e.select("event_type", m.alias("m"))
    stats = typed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.size("m")).alias("total_keys"),
        F.sum(F.element_at("m", F.lit("k"))).alias("sum_k"),
    )
    keys = (
        typed.select("event_type", F.explode(F.map_keys("m")).alias("key"))
        .distinct()
        .groupBy("event_type")
        .agg(F.array_join(F.array_sort(F.collect_set("key")), ",").alias("key_list"))
    )
    # null-safe LEFT join: the NULL event_type group is real data, and
    # a group whose props are all NULL/empty has no key rows at all —
    # it must still surface (key_list NULL), not vanish on the join
    return (
        stats.join(
            keys.withColumnRenamed("event_type", "_ket"),
            F.col("event_type").eqNullSafe(F.col("_ket")),
            "left",
        )
        .select("event_type", "n_events", "total_keys", "sum_k", "key_list")
        .orderBy("event_type")
    )
