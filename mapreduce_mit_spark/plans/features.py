"""Feature-engineering pack — the per-example transforms a training-data
pipeline runs between raw tables and the trainer.

The reference engine's only transform surface is the user map function
(wc.go:52-62); everything here is what a user of that engine would write
map functions for, re-expressed as declarative single-pass DataFrame
plans: quantile bucketing, scaling/standardization, deterministic
train/val/test splitting, class rebalancing, SCD2 history, and batch CDC
upsert. All are built-ins-only (no Python in the hot path) and every
aggregate surfaced as a double is derived from exact integer sums so the
DuckDB oracle matches bit-for-bit.

Cross-engine determinism notes:
- ``ntile``/``row_number`` tie-break on a unique key, so window results
  are a pure function of the data.
- means/variances come from integer-cent sums (exact under any
  partitioning); only the final division produces a double.
- splits are md5-of-key predicates (q46's technique): stable across
  runs, engines, partition layouts, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ._util import t

# Exact integer-cent sum of c_acctbal, shared by the scaling queries.
_CENTS = "CAST(round(c_acctbal * 100) AS BIGINT)"


@register(
    "q127_quantile_bucketize",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment, c_acctbal,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    )
    SELECT c_mktsegment, quartile,
           count(*) AS n,
           round(min(c_acctbal), 2) AS lo,
           round(max(c_acctbal), 2) AS hi
    FROM q
    GROUP BY c_mktsegment, quartile
    ORDER BY c_mktsegment, quartile
    """,
    tags=("features", "window", "bucketize", "training-pipeline"),
)
def q127_quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile bucketing: each customer assigned to its
    account-balance quartile WITHIN its market segment (the categorical
    feature-binning primitive), then bucket boundaries summarized.

    Scale shape: the window partitions by segment, so each segment
    sorts independently in parallel — no global sort, no single-
    partition window. Parallelism is bounded by segment cardinality;
    for GLOBAL quantile bins over a low-cardinality key use the
    distributed-sort percentile path (operators/quantiles.py, q17)
    to compute cutpoints and broadcast them instead. ntile tie-breaks
    on the unique key, so bucket assignment is deterministic in both
    engines."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


@register(
    "q128_minmax_scale",
    oracle="""
    WITH stats AS (
      SELECT c_mktsegment AS seg, min(c_acctbal) AS lo, max(c_acctbal) AS hi
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - lo) / (hi - lo), 6) AS acctbal_scaled
    FROM customer JOIN stats ON c_mktsegment = seg
    ORDER BY c_custkey
    """,
    tags=("features", "scaling", "training-pipeline"),
)
def q128_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling to [0, 1] — the normalization
    step before numeric features feed a model.

    Scale shape: the stats side is group-cardinality (5 rows), computed
    by one map-side-combinable min/max agg and BROADCAST back onto the
    table — the fact side never shuffles. min/max are exact (no
    float-order wobble), so the scaled value is a deterministic
    function of each row and the oracle matches bit-for-bit after
    rounding."""
    c = t(spark, sf_dir, "customer")
    stats = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi")
    )
    return (
        c.join(F.broadcast(stats), c.c_mktsegment == stats.seg)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round((F.col("c_acctbal") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6).alias(
                "acctbal_scaled"
            ),
        )
        .orderBy("c_custkey")
    )


@register(
    "q129_zscore_standardize",
    oracle=f"""
    WITH stats AS (
      SELECT c_mktsegment AS seg,
             count(*) AS n,
             CAST(sum({_CENTS}) AS BIGINT) AS s,
             CAST(sum({_CENTS} * {_CENTS}) AS BIGINT) AS ss
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - s / 100.0 / n)
                 / sqrt((ss / 10000.0 - s / 100.0 * s / 100.0 / n) / (n - 1)), 4)
             AS acctbal_z
    FROM customer JOIN stats ON c_mktsegment = seg
    ORDER BY c_custkey
    """,
    tags=("features", "scaling", "training-pipeline"),
)
def q129_zscore_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization, with mean and sample variance
    derived from EXACT integer-cent sums (sum and sum-of-squares), so
    the statistics are order-independent — ``stddev_samp`` on doubles
    would differ between engines in the last bits and occasionally flip
    the rounded z.

    Scale shape: one map-side-combinable agg produces (n, Σ, Σ²) per
    segment (5 rows), broadcast back; the table never shuffles. The
    Σ² accumulator holds cents² — bounded by n·(max_cents)²; for
    columns where that nears int64 range at full scale, shift to
    per-partition Welford via applyInPandas (the sketch pattern), or
    scale the units down first."""
    c = t(spark, sf_dir, "customer")
    cents = F.expr(_CENTS)
    stats = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents * cents).alias("ss"),
    )
    mean = F.col("s") / 100.0 / F.col("n")
    var = (F.col("ss") / 10000.0 - F.col("s") / 100.0 * mean) / (F.col("n") - 1)
    return (
        c.join(F.broadcast(stats), c.c_mktsegment == stats.seg)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round((F.col("c_acctbal") - mean) / F.sqrt(var), 4).alias("acctbal_z"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q130_train_val_test_split",
    oracle="""
    WITH tagged AS (
      SELECT lang, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM tagged
    GROUP BY lang, split
    ORDER BY lang, split
    """,
    tags=("features", "sampling", "split", "training-pipeline"),
)
def q130_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split keyed on md5 of the
    document id, reported per language — the split is a pure function
    of the key (q46's primitive extended to three arms), so it is
    reproducible across engines, reruns, partitionings, and cluster
    sizes, and any later pipeline stage can recompute membership
    without a membership table.

    Scale shape: split assignment is a scan-side expression (zero
    shuffle); the only exchange carries (lang, split) partial counts.
    Leakage-safety note: keying on doc_id splits DOCUMENTS — dedup
    (q80/q81) must run upstream so near-duplicates can't straddle
    train/test."""
    d = t(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(h < "cccc", "train").when(h < "e666", "val").otherwise("test")
    )
    return (
        d.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


@register(
    "q131_class_weights",
    oracle="""
    WITH counts AS (
      SELECT label, count(*) AS n FROM embeddings GROUP BY label
    )
    SELECT label, n,
           round((SELECT CAST(sum(n) AS BIGINT) FROM counts) * 1.0
                 / ((SELECT count(*) FROM counts) * n), 6) AS class_weight
    FROM counts
    ORDER BY label
    """,
    tags=("features", "rebalancing", "training-pipeline"),
)
def q131_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's ``balanced``
    formula: total / (n_classes * count)) over the embedding labels —
    the loss-reweighting alternative to resampling (q48) for skewed
    label distributions.

    Scale shape: one agg to label cardinality, then the total/class
    count come from a 1-row re-aggregate of THAT tiny result joined
    back by broadcast — the embeddings table is scanned once and only
    (label, count) rows move. Integer count arithmetic, so the rounded
    weight is deterministic."""
    e = t(spark, sf_dir, "embeddings")
    counts = e.groupBy("label").agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_classes")
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "label",
            "n",
            F.round(
                F.col("total") * 1.0 / (F.col("n_classes") * F.col("n")), 6
            ).alias("class_weight"),
        )
        .orderBy("label")
    )


@register(
    "q132_scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_type,
             row_number() OVER w AS rn
      FROM events
      WHERE user_id < 30
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts AS effective_from
      FROM ordered
      WHERE rn = 1 OR event_type <> prev_type
    )
    SELECT user_id, event_type, effective_from,
           lead(effective_from) OVER (PARTITION BY user_id
                                      ORDER BY effective_from) AS effective_to,
           lead(effective_from) OVER (PARTITION BY user_id
                                      ORDER BY effective_from) IS NULL AS is_current
    FROM changes
    ORDER BY user_id, effective_from
    """,
    tags=("features", "scd2", "window", "cdc"),
)
def q132_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse an event stream into
    versioned (effective_from, effective_to, is_current) state rows per
    user, keeping only rows where the tracked attribute actually
    changed — the standard dimension-history build.

    Scale shape: both windows partition by user_id, so ONE hash
    exchange on user_id serves the lag, the change filter, and the
    lead (Spark reuses the partitioning across same-key windows; the
    change filter shrinks rows between them). Ties break on event_id →
    deterministic history. The user_id<30 filter bounds catalog output;
    remove it and nothing in the shape changes."""
    e = t(spark, sf_dir, "events").where(F.col("user_id") < 30)
    # asc_nulls_last on ts: a NULL event time must land at the END of
    # the user's history in both engines (Spark's bare asc is NULLS
    # FIRST, DuckDB's is NULLS LAST) — otherwise the change chain
    # shifts and the whole SCD2 history diverges on one dirty row
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    changes = (
        e.select(
            "user_id",
            "event_type",
            F.col("ts").alias("effective_from"),
            F.lag("event_type").over(w).alias("prev_type"),
            F.row_number().over(w).alias("rn"),
        )
        .where((F.col("rn") == 1) | (F.col("event_type") != F.col("prev_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("effective_from").asc_nulls_last()
    )
    eff_to = F.lead("effective_from").over(w2)
    return (
        changes.select(
            "user_id",
            "event_type",
            "effective_from",
            eff_to.alias("effective_to"),
            eff_to.isNull().alias("is_current"),
        )
        .orderBy("user_id", "effective_from")
    )


@register(
    "q133_cdc_upsert",
    oracle="""
    WITH base AS (
      SELECT user_id, value, ts FROM (
        SELECT user_id, value, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-20'
      ) WHERE rn = 1
    ),
    delta AS (
      SELECT user_id, value, ts FROM (
        SELECT user_id, value, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-20'
      ) WHERE rn = 1
    )
    SELECT coalesce(delta.user_id, base.user_id) AS user_id,
           round(coalesce(delta.value, base.value), 2) AS latest_value,
           coalesce(delta.ts, base.ts) AS latest_ts,
           delta.user_id IS NOT NULL AS updated
    FROM base FULL OUTER JOIN delta ON base.user_id = delta.user_id
    ORDER BY user_id
    """,
    tags=("features", "cdc", "merge", "upsert"),
)
def q133_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC merge (MERGE INTO emulation): a base snapshot (latest
    value per key before the cutoff) upserted with a delta batch
    (latest value per key after it) via full-outer-join + coalesce —
    insert-new, update-existing, keep-untouched in one pass. The
    streaming twin is q115's foreachBatch upsert sink.

    Scale shape: each side reduces to key cardinality with one
    row_number window (same user_id partitioning), and the merge join
    reuses that same key — with AQE, the snapshot-sized sides join
    without an extra exchange. Tie-break on event_id makes "latest"
    deterministic."""
    e = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.select("user_id", "value", "ts", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    base = latest(e.where(F.col("ts") < cutoff)).alias("base")
    delta = latest(e.where(F.col("ts") >= cutoff)).alias("delta")
    return (
        base.join(delta, F.col("base.user_id") == F.col("delta.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("delta.user_id"), F.col("base.user_id")).alias("user_id"),
            F.round(F.coalesce(F.col("delta.value"), F.col("base.value")), 2).alias(
                "latest_value"
            ),
            F.coalesce(F.col("delta.ts"), F.col("base.ts")).alias("latest_ts"),
            F.col("delta.user_id").isNotNull().alias("updated"),
        )
        .orderBy("user_id")
    )


@register(
    "q137_reservoir_sample",
    oracle="""
    SELECT lang, doc_id, source FROM (
      SELECT lang, doc_id, source,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    ) WHERE rn <= 5
    ORDER BY lang, doc_id
    """,
    tags=("features", "sampling", "reservoir", "training-pipeline"),
)
def q137_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-per-group uniform sample (the reservoir-sampling use
    case, derandomized): rank rows within each group by md5 of the key
    and keep the k smallest — each doc's rank key is a uniform hash, so
    the k kept are a uniform sample, yet fully deterministic and
    re-derivable (same property as the q46/q130 splits).

    Scale shape: one shuffle on the group key; Spark inserts
    WindowGroupLimit, so each map task forwards only its local top-k
    per group before the shuffle — the 100 TB table contributes
    k·partitions rows to the exchange, which IS the reservoir-merge
    dataflow of the classic algorithm."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", "source", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("lang", "doc_id")
    )


# Tables the ANALYZE pass profiles, with the column KINDS the oracle is
# generated from (num → avg_num, str → avg_len, other → min/max only).
# The Spark side derives everything from the LIVE DataFrame schema;
# tests/test_plan_shapes.py::test_profile_schema_map_matches_live pins
# this map against the live schema so drift is a test failure, not a
# silent oracle mismatch.
PROFILE_SCHEMA: dict[str, tuple[tuple[str, str], ...]] = {
    "region": (("r_regionkey", "num"), ("r_name", "str")),
    "nation": (("n_nationkey", "num"), ("n_name", "str"), ("n_regionkey", "num")),
    "customer": (
        ("c_custkey", "num"),
        ("c_name", "str"),
        ("c_nationkey", "num"),
        ("c_acctbal", "num"),
        ("c_mktsegment", "str"),
    ),
    "orders": (
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "num"),
        ("o_orderdate", "other"),
        ("o_orderpriority", "str"),
    ),
}

_NUM_DTYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_kind(dtype: str) -> str | None:
    """Map a Spark dtype string to a profile kind (None = skip)."""
    base = dtype.split("(")[0]
    if base in ("array", "map", "struct", "binary", "variant"):
        return None
    if base in _NUM_DTYPES or base == "decimal":
        return "num"
    if base == "string":
        return "str"
    return "other"


def _profile_one(df: DataFrame, tbl: str) -> DataFrame:
    """One table's full-schema profile, long format: derived from
    ``df.dtypes`` — nothing hand-listed."""
    aggs, cols = [], []
    for c, dt in df.dtypes:
        kind = profile_kind(dt)
        if kind is None:  # composite payloads are not profiled
            continue
        null_d = F.max(F.lit(None).cast("double"))
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.count_distinct(F.col(c)).alias(f"{c}__d"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            (
                F.round(F.avg(F.col(c).cast("double")), 4)
                if kind == "num"
                else null_d
            ).alias(f"{c}__avgn"),
            (
                F.round(F.avg(F.length(c).cast("double")), 4)
                if kind == "str"
                else null_d
            ).alias(f"{c}__avgl"),
        ]
        cols.append(c)
    stack = ", ".join(
        f"'{tbl}', '{c}', {c}__n, {c}__d, {c}__min, {c}__max, {c}__avgn, {c}__avgl"
        for c in cols
    )
    return df.agg(*aggs).selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(tbl, col, n_filled, n_distinct, min_s, max_s, avg_num, avg_len)"
    )


def _profile_oracle() -> str:
    selects = []
    for tbl, cols in PROFILE_SCHEMA.items():
        for c, kind in cols:
            avg_num = (
                f"round(avg(CAST({c} AS DOUBLE)), 4)"
                if kind == "num"
                else "CAST(NULL AS DOUBLE)"
            )
            avg_len = (
                f"round(avg(CAST(length({c}) AS DOUBLE)), 4)"
                if kind == "str"
                else "CAST(NULL AS DOUBLE)"
            )
            selects.append(
                f"SELECT '{tbl}' AS tbl, '{c}' AS col, count({c}) AS n_filled, "
                f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
                f"CAST(min({c}) AS VARCHAR) AS min_s, "
                f"CAST(max({c}) AS VARCHAR) AS max_s, "
                f"{avg_num} AS avg_num, {avg_len} AS avg_len FROM {tbl}"
            )
    return " UNION ALL ".join(selects) + " ORDER BY tbl, col"


@register(
    "q139_table_profile",
    oracle=_profile_oracle(),
    tags=("features", "profiling", "statistics"),
)
def q139_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style profile of EVERY column of every profiled table,
    driven by the live schema (``df.dtypes``), long format — the
    statistics-collection pass planners and data-quality monitors run
    over a lake. Per-kind stats: all columns get filled/distinct counts
    and min/max (as strings, so heterogeneous types share one schema);
    numeric columns add avg_num; string columns add avg length.

    Scale shape: ONE scan per table feeding one aggregate with several
    count(DISTINCT) columns — Catalyst plans the multi-distinct via a
    single Expand (rows × #distinct-cols before partial agg), the
    honest exact shape; a 100 TB profile run would swap
    count_distinct → approx_count_distinct (HLL, q16's
    falsifiable-sketch pattern) and drop the Expand entirely. Tables
    union AFTER their single-row aggregates, so the union is free."""
    parts = [
        _profile_one(t(spark, sf_dir, tbl), tbl) for tbl in PROFILE_SCHEMA
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl", "col")


@register(
    "q140_robust_outliers",
    oracle="""
    WITH rv AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*)     OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    med AS (
      SELECT event_type,
             max(CASE WHEN rn = floor((n-1) * 0.5) + 1 THEN value END) AS med
      FROM rv GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    rd AS (
      SELECT event_type, adev,
             row_number() OVER (PARTITION BY event_type ORDER BY adev) AS rn,
             count(*)     OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type,
             max(CASE WHEN rn = floor((n-1) * 0.5) + 1 THEN adev END) AS mad
      FROM rd GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n,
           round(max(d.med), 2) AS med,
           round(max(m.mad), 2) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
    tags=("features", "robust-stats", "outliers", "percentile"),
)
def q140_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median + MAD (median absolute
    deviation), flagging values beyond 3 MADs — the heavy-tail-safe
    alternative to q129's z-score for anomaly screening.

    Scale shape: two exact_quantiles passes (operators/quantiles.py —
    distributed range-sort, the same machinery as q17, no hashmap-merge
    percentile state), each producing a group-cardinality table that
    BROADCASTS back onto the stream; discrete-mode medians are data
    values, so every derived comparison is bit-deterministic across
    engines."""
    from ..operators.quantiles import exact_quantiles

    e = t(spark, sf_dir, "events").select("event_type", "value")
    med = exact_quantiles(e, ["event_type"], "value", {"med": 0.5}, mode="disc")
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = exact_quantiles(
        dev.select("event_type", "adev"), ["event_type"], "adev",
        {"mad": 0.5}, mode="disc",
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("med"), 2).alias("med"),
            F.round(F.max("mad"), 2).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def _q167_oracle() -> str:
    """q167's oracle: q148's closure chain (same CTE text as the q148
    oracle, via the same shared SQL helpers) + cluster-keyed split."""
    from ..functions.textfns import tokens_sql
    from .dedup import _lsh_bands_sql

    arm = (
        "CASE WHEN substr(md5(CAST({k} AS VARCHAR)), 1, 4) < 'cccc' THEN 'train' "
        "WHEN substr(md5(CAST({k} AS VARCHAR)), 1, 4) < 'e666' THEN 'val' "
        "ELSE 'test' END"
    )
    return f"""
    WITH RECURSIVE {_lsh_bands_sql()},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    cdocs AS (SELECT doc_a AS doc_id FROM cand UNION SELECT doc_b FROM cand),
    ctoks AS (
      SELECT doc_id, unnest(list_distinct({tokens_sql('text')})) AS token
      FROM documents WHERE doc_id IN (SELECT doc_id FROM cdocs)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM ctoks GROUP BY doc_id),
    shared AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_shared
      FROM cand c
        JOIN ctoks a ON a.doc_id = c.doc_a
        JOIN ctoks b ON b.doc_id = c.doc_b AND b.token = a.token
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT s.doc_a, s.doc_b
      FROM shared s
        JOIN sizes sa ON sa.doc_id = s.doc_a
        JOIN sizes sb ON sb.doc_id = s.doc_b
      WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM verified
    ),
    reach(node, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    comp AS (SELECT node AS doc_id, min(r) AS cluster FROM reach GROUP BY node),
    tagged AS (
      SELECT doc_id, cluster,
             {arm.format(k='cluster')} AS split,
             {arm.format(k='doc_id')} AS naive
      FROM comp
    ),
    agg AS (
      SELECT cluster,
             count(DISTINCT split) AS ns,
             count(DISTINCT naive) AS nn
      FROM tagged GROUP BY cluster
    )
    SELECT t.doc_id, t.cluster, t.split,
           (a.ns = 1) AS split_intact,
           (a.nn > 1) AS naive_leaks
    FROM tagged t JOIN agg a USING (cluster)
    ORDER BY t.doc_id
    """


@register(
    "q167_cluster_safe_split",
    oracle=_q167_oracle(),
    tags=("features", "split", "dedup", "leakage", "training-pipeline"),
)
def q167_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-PROOF train/val/test split: assignment is keyed on the
    NEAR-DUP CLUSTER id (q148's LSH→verify→connected-components
    closure over the full corpus), not the document id, so a whole
    cluster of near-duplicates always lands in ONE split arm — the
    standard fix for eval contamination via near-dups straddling
    train/test (the failure q159 audits after the fact; this operator
    prevents it at split time). Keying on md5 of the cluster id keeps
    q130's reproducibility properties: membership is a pure function
    of the data, recomputable by any stage without a membership table.

    Surfaced per doc: the cluster, the split arm, ``split_intact``
    (count of distinct arms in the doc's cluster == 1 — the in-band
    falsifiable contract; breaks if assignment ever keys on the doc),
    and ``naive_leaks`` (whether q130's doc-keyed split WOULD have
    torn this cluster across arms — measured on the driver corpus it
    tears 5 of 21 multi-doc clusters at sf0.001, 8 of 23 at sf0.01).

    Scale shape: identical to q148 up through the closure (memoized
    band table, merge-pinned band self-join, salted verify on
    candidate pairs only, pointer-jumped CC) — no new corpus-sized
    stage; the split tag is a pure map over the (doc_id, cluster) map
    and the two contract bits are one cluster-keyed aggregate joined
    back (q09's agg+join-back discipline, never a window over the
    cluster key)."""
    from ..operators.graph import connected_components
    from .dedup import (
        jaccard_verified_pairs,
        lsh_bands_for,
        lsh_candidate_pairs_df,
    )
    from ._util import tw

    d = t(spark, sf_dir, "documents")
    docs = tw(spark, sf_dir, "documents")
    cand = lsh_candidate_pairs_df(docs, bands=lsh_bands_for(spark, sf_dir))
    ver = jaccard_verified_pairs(docs, cand)
    comp = connected_components(
        d.select("doc_id"), ver, node_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    cmap = comp.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster")
    )

    def _arm(key: F.Column) -> F.Column:
        h = F.substring(F.md5(key.cast("string")), 1, 4)
        return (
            F.when(h < "cccc", "train").when(h < "e666", "val").otherwise("test")
        )

    tagged = cmap.select(
        "doc_id",
        "cluster",
        _arm(F.col("cluster")).alias("split"),
        _arm(F.col("doc_id")).alias("naive"),
    )
    per_cluster = tagged.groupBy("cluster").agg(
        F.countDistinct("split").alias("ns"),
        F.countDistinct("naive").alias("nn"),
    )
    return (
        tagged.join(per_cluster, "cluster")
        .select(
            "doc_id",
            "cluster",
            "split",
            (F.col("ns") == 1).alias("split_intact"),
            (F.col("nn") > 1).alias("naive_leaks"),
        )
        .orderBy("doc_id")
    )
