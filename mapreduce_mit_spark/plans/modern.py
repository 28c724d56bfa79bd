"""PySpark-4-native surfaces: Python UDTF, VARIANT, mergeable sketches.

The reference's whole programming model is user-supplied functions
(mapF/reduceF — /root/reference/src/mapreduce/master.go:55-58). The
engine covers UDF (pandas/Arrow, operators/multimodal.py), UDAF
(GROUPED_AGG pandas UDAF q150, batch applyInPandas q151, streaming
applyInPandasWithState q93), and completes the triple with a REAL
Python UDTF (table function, lateral join) — the exact flatMap shape
of the reference's mapF (one input row → N output rows,
common_map.go:61) surfaced through Spark 4's first-class UDTF API
rather than an explode(udf()) workaround.

Also here: VARIANT (Spark 4's semi-structured type — the right 100 TB
answer for the ``events.props`` JSON column: parse once, store binary
variant, extract without re-parsing) and DataSketches HLL aggregates
(``hll_sketch_agg``/``hll_union_agg`` — unlike approx_count_distinct's
opaque internal state, these sketches are STORABLE: persist per-day
sketch tables, merge across arbitrary date ranges without touching raw
data — the canonical warehouse rollup pattern).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import t, tw


@register(
    "q100_udtf_ngrams",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '[^\p{L}]+'),
                         x -> len(x) > 0) AS ts
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts)),
                                   i -> ts[i] || ' ' || ts[i+1])) AS bigram
      FROM toks
    )
    SELECT bigram,
           count(*) AS cnt,
           count(DISTINCT doc_id) AS n_docs
    FROM grams
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
    tags=("udtf", "python", "text"),
)
def q100_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token bigrams via a Python UDTF lateral join.

    The UDTF is the reference's mapF shape made first-class: eval(row)
    yields N rows (tokenize on non-letter runs — wc.go:55-57 semantics
    — then emit adjacent pairs). The aggregation on top is plain
    DataFrame groupBy, so only the row-expansion is Python.

    Scale: per-row Python is the slow path by design here — this query
    exists to prove the UDTF surface. The built-in equivalent (explode
    + transform over a split array, as the oracle does in SQL) is the
    hot-path choice; Spark 4 can also Arrow-batch UDTF exchange
    (spark.sql.execution.pythonUDTF.arrow.enabled). Output is bounded
    (top-20 with a total-order tie-break) so the result hash is
    deterministic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, bigram string")
    class BigramUDTF:
        def eval(self, doc_id, text):  # noqa: ANN001
            toks = re.findall(r"[^\W\d_]+", text or "", flags=re.UNICODE)
            for a, b in zip(toks, toks[1:]):
                yield doc_id, f"{a} {b}"

    spark.udtf.register("mms_bigrams", BigramUDTF)
    tw(spark, sf_dir, "documents").createOrReplaceTempView("mms_udtf_docs")
    return spark.sql(
        """
        SELECT b.bigram,
               count(*) AS cnt,
               count(DISTINCT b.doc_id) AS n_docs
        FROM mms_udtf_docs d,
        LATERAL mms_bigrams(d.doc_id, d.text) b
        GROUP BY b.bigram
        ORDER BY cnt DESC, bigram
        LIMIT 20
        """
    )


@register(
    "q101_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT)      AS k,
           CAST(NULL AS BIGINT)                                   AS k_missing,
           CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket
    FROM events
    WHERE event_id < 300
    ORDER BY event_id
    """,
    tags=("scalar", "variant", "json"),
)
def q101_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type.

    ``parse_json`` builds a binary variant once; ``variant_get``
    extracts typed paths without re-parsing, and ``try_variant_get`` on
    an absent path yields NULL instead of failing — the schema-drift
    posture a 100 TB ingest needs (unknown keys arrive silently). At
    scale the variant column would be WRITTEN to the table (parse once
    at ingest); q53/q58 cover the per-query string-parsing alternatives
    (get_json_object / from_json)."""
    e = t(spark, sf_dir, "events").where(F.col("event_id") < 300)
    v = e.select("event_id", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return v.select(
        "event_id",
        k.alias("k"),
        F.try_variant_get("v", "$.missing", "bigint").alias("k_missing"),
        F.floor(k / 10).alias("k_bucket"),
    ).orderBy("event_id")


@register(
    "q102_hll_mergeable",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)          AS exact_users,
           count(DISTINCT CAST(ts AS DATE)) AS n_days,
           true                             AS merged_within_bound
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg", "approx", "sketch", "mergeable"),
)
def q102_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-count rollup via storable DataSketches HLL.

    Level 1 builds one HLL sketch per (event_type, day) — at 100 TB
    this is the materialized daily rollup table, kilobytes per group.
    Level 2 merges the day sketches per event_type with
    ``hll_union_agg`` and estimates — reaggregation WITHOUT rescanning
    raw events, which approx_count_distinct cannot do (its state is
    not a storable column). Both levels are map-side-combinable.

    Falsifiable-sketch pattern (as q16): the estimate is asserted
    in-band against the exact sibling — ``merged_within_bound`` flips
    and fails the driver hash if the union-merge path breaks the
    documented ~2% accuracy (lgConfigK=12 default; 5% bound gives
    2.5× slack)."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("day_users"),
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        # count(day), not count(*): a NULL event time makes a NULL day
        # bucket whose sketch still merges into the union, but the
        # day COUNT must skip it exactly as the oracle's
        # count(DISTINCT CAST(ts AS DATE)) skips NULL
        F.count("day").alias("n_days"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        # eqNullSafe: the NULL event_type group is data, not a join miss
        merged.withColumnRenamed("event_type", "_et")
        .join(exact, F.col("_et").eqNullSafe(F.col("event_type")))
        .select(
            "event_type",
            "exact_users",
            "n_days",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("merged_within_bound"),
        )
        .orderBy("event_type")
    )


@register(
    "q141_arrow_normalize",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(sqrt(list_sum(list_transform(embedding,
                                              x -> CAST(x AS DOUBLE) * x))), 6)
             AS l2_norm
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("modern", "arrow", "vector", "similarity"),
)
def q141_arrow_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math via ``mapInArrow`` — Arrow RecordBatches processed
    directly (no pandas materialization): the embedding ListArray's
    flat float buffer is viewed zero-copy as a (rows × 64) numpy
    matrix, L2 norms computed vectorized, and a new RecordBatch
    emitted. The third Python batch surface after pandas_udf/
    mapInPandas (q97-q99) and applyInPandasWithState (q93) — this one
    skips the Arrow→pandas conversion entirely, which matters when the
    payload is large fixed-width arrays.

    Scale shape: a pure per-batch map — no shuffle, no state; each
    task streams batches through the UDF with one float64 upcast as
    the only copy. Norms are summed per row in float64; at dim=64 the
    engine-order drift is ~1e-15 relative, far below the 6-dp
    rounding."""
    import pyarrow as pa

    e = t(spark, sf_dir, "embeddings")
    dim = 64  # fixed by the table contract (TESTDATA.md)

    def normalize(batches):
        import numpy as np
        import pyarrow.compute as pc

        for batch in batches:
            emb = batch.column("embedding")
            lens = pc.list_value_length(emb)
            regular = emb.null_count == 0 and (
                len(batch) == 0 or pc.min(lens).as_py() == pc.max(lens).as_py() == dim
            )
            if regular:
                # fast path (every clean batch): flatten() yields the
                # values buffer; zero-copy to numpy, then one upcast to
                # float64 for the squared sum
                flat = emb.flatten().to_numpy(zero_copy_only=False)
                mat = flat.astype("float64").reshape(-1, dim)
                norms = np.sqrt((mat * mat).sum(axis=1)).round(6)
                dims = pa.array([dim] * len(batch), type=pa.int64())
            else:
                # robustness path, taken only when the batch carries a
                # malformed row (NULL or wrong-length vector): per-row
                # loop, NULL/empty vectors yield NULL norm (the oracle's
                # list_sum-of-empty semantics), dim reports the actual
                # length so the bad rows stay auditable downstream
                vals = emb.to_pylist()
                dims = pa.array(
                    [len(v) if v is not None else None for v in vals],
                    type=pa.int64(),
                )
                norms = [
                    round(math.sqrt(sum(float(x) * float(x) for x in v)), 6)
                    if v
                    else None
                    for v in vals
                ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("vec_id"),
                    dims,
                    pa.array(norms, type=pa.float64()),
                ],
                names=["vec_id", "dim", "l2_norm"],
            )

    return (
        e.select("vec_id", "embedding")
        .mapInArrow(normalize, "vec_id long, dim long, l2_norm double")
        .orderBy("vec_id")
    )


@register(
    "q150_pandas_udaf_trimmed_mean",
    oracle="""
    WITH v AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    r AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY c, event_id) AS rn,
             count(*)     OVER (PARTITION BY event_type) AS n
      FROM v
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(c) FILTER (WHERE rn > n // 10 AND rn <= n - n // 10)
                 / 100.0, 4) AS trimmed_mean_value
    FROM r
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("udaf", "pandas", "python", "robust-stats"),
)
def q150_pandas_udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True vectorized UDAF (GROUPED_AGG ``pandas_udf``): per event
    type, the 10%-trimmed mean of event values — the robust-stats
    aggregate Spark has no builtin for, computed over each group's
    Arrow-shipped column in one pass. Completes the user-aggregate
    surface next to applyInPandasWithState (streaming, q93) and the
    RDD-compat reduceF (operators/mapreduce.py).

    Cross-engine exactness: values become integer cents BEFORE any
    arithmetic; the trim boundary sorts on (cents, event_id) so ties
    are deterministic; every partial sum of the trimmed window stays
    under 2^53, so pandas' and DuckDB's accumulation orders cannot
    diverge; the single rounding happens JVM-side (F.round, HALF_UP —
    matching DuckDB, avoiding Python's banker's rounding).

    Scale shape: one hash shuffle on event_type feeding the grouped
    aggregate; each group streams to Python as Arrow batches. A
    skew-prone key set would pre-aggregate per (key, salt) and merge —
    the UDAF itself is the pattern's leaf."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType

    e = t(spark, sf_dir, "events")

    # explicit eval type: this module's `from __future__ import
    # annotations` stringifies type hints, which defeats signature
    # inference for pandas UDFs
    @F.pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(value, event_id):
        # nullable Int64: a NULL value must not kill the task. NULLs
        # sort last (pandas NaN-last == DuckDB's NULLS LAST under ORDER
        # BY c), count toward the trim boundaries exactly as the
        # oracle's row_number does, and are skipped by the mean exactly
        # as the oracle's avg FILTER skips NULL cents.
        df = pd.DataFrame(
            {"c": (value * 100).round().astype("Int64"), "e": event_id}
        ).sort_values(["c", "e"])
        n = len(df)
        k = n // 10
        m = df["c"].iloc[k : n - k].mean()
        return None if pd.isna(m) else float(m) / 100.0

    # Catalyst refuses to mix a GROUPED_AGG pandas UDF with JVM
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    # row count rides the same Arrow transfer as a second pandas UDAF
    @F.pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def n_rows(event_id):
        return len(event_id)

    return (
        e.groupBy("event_type")
        .agg(
            n_rows("event_id").alias("n_events"),
            F.round(trimmed_mean("value", "event_id"), 4).alias(
                "trimmed_mean_value"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q151_grouped_map_drawdown",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    r AS (
      SELECT user_id, c,
             max(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS rm
      FROM v
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(rm - c) AS BIGINT) / 100.0 AS max_drawdown
    FROM r
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("udaf", "pandas", "grouped-map", "python"),
)
def q151_grouped_map_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch grouped-map (``applyInPandas``): per-user maximum drawdown
    of the event-value series (largest drop from a running peak, in
    exact integer cents) — the canonical sequential-per-group
    computation, here surfacing the one Python batch surface the
    catalog hadn't pinned (groupBy().applyInPandas on a static frame;
    its streaming sibling is q93, its map-side sibling q97-q99).

    This particular statistic IS window-expressible (the oracle proves
    it with a running max + aggregate), and at 100 TB you would prefer
    that JVM-native form; the operator exists for the per-group logic
    that isn't — model scoring, per-entity solvers, library calls —
    and pins the plan you get: ONE hash shuffle on user_id, each
    group's rows shipped to Python as Arrow batches, group size
    bounded by the hottest key (salt + two-level merge when a key
    outgrows a worker)."""
    import pandas as pd

    e = t(spark, sf_dir, "events")

    def drawdown(pdf: pd.DataFrame) -> pd.DataFrame:
        # dirty-row contract, matching the oracle exactly: NULL ts
        # sorts last (pandas NaT-last == DuckDB NULLS LAST), a NULL
        # value contributes no drawdown sample (rm - NULL is NULL in
        # both engines) but still counts in n_events, and the NULL
        # user_id group survives as its own row instead of killing the
        # task on int(NaN).
        pdf = pdf.sort_values(["ts", "event_id"])
        c = (pdf["value"] * 100).round().astype("Int64")
        rm = c.cummax()
        dd = (rm - c).max()
        uid = pdf["user_id"].iloc[0]
        return pd.DataFrame(
            {
                "user_id": pd.array(
                    [None if pd.isna(uid) else int(uid)], dtype="Int64"
                ),
                "n_events": [len(pdf)],
                "dd_cents": pd.array(
                    [None if pd.isna(dd) else int(dd)], dtype="Int64"
                ),
            }
        )

    out = e.groupBy("user_id").applyInPandas(
        drawdown, "user_id bigint, n_events bigint, dd_cents bigint"
    )
    return out.select(
        "user_id",
        "n_events",
        (F.col("dd_cents") / 100.0).alias("max_drawdown"),
    ).orderBy("user_id")
