"""Training-data quality filters over ``documents``.

The four standard pre-training corpus-hygiene operators (the ones a
100 TB pipeline runs between raw crawl and tokenizer), each Spark-first
with a DuckDB oracle:

- **benchmark decontamination** (q06): flag training docs sharing
  5-grams with a held-out eval set — the GPT-3/PaLM n-gram-collision
  protocol. Scale shape: the eval set is MBs against a 100 TB train
  side, so its distinct-n-gram table BROADCASTS; the only shuffle is
  the per-doc count on ``doc_id``.
- **repetition statistics** (q07): Gopher/MassiveText-style intra-doc
  repetition signals (duplicate-token fraction, top-2-gram share).
  Scale shape: a PURE MAP — every signal is an array expression over
  the doc's own tokens, zero shuffles before the output sort; at
  100 TB this is the cheapest filter you have, so it runs first.
- **PII redaction** (q08): regex scrub of emails/phones/IPs with
  per-class match counts and a redacted-content hash. Pure map. The
  synthetic corpus contains no PII, so the query derives a
  deterministic PII suffix from ``doc_id`` IN BOTH ENGINES (no
  synthesized inputs — the driver's table stays the only source).
- **cross-doc span dedup** (q09): C4-style removal of spans repeated
  across documents — explode fixed token windows, count distinct docs
  per span globally, join back. Scale shape: both shuffles key on a
  short span hash (never the text); the span→count table is
  vocabulary-like, NOT corpus-sized.

All surfaced columns are integers, hashes, or booleans derived from
integer comparisons — no cross-engine float hazard (see _util note).

Every flag threshold is expressed as integer arithmetic
(``a * k > b``), never a float ratio, so both engines compare exact
values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens_col, tokens_sql
from ..registry import register
from ._util import fitted_family, hex_int_sql, t, tw

# Eval-set membership: deterministic, derivable in both engines.
BENCH_PRED = "doc_id % 25 = 0"
NGRAM = 5  # decontamination n-gram size (classic 8..13 for real corpora;
# 5 keeps collisions observable on the tiny synthetic vocabulary)
SPAN = 3  # q09 span width — small vocab makes 3-token spans collide
# across docs, which is the interesting case


def _ngrams_sql(toks: str, n: int) -> str:
    """DuckDB: list of space-joined n-grams (DuckDB slice is inclusive)."""
    return (
        f"[array_to_string(({toks})[i:i+{n - 1}], ' ') "
        f"for i in generate_series(1, greatest(len({toks}) - {n - 1}, 0))]"
    )


def _ngrams_col(toks, n: int):
    """Spark: same n-gram list. sequence(1, 0) counts DOWN in Spark, so
    short docs are guarded to an empty array explicitly."""
    size = F.size(toks)
    seq = F.sequence(F.lit(1), size - (n - 1))
    grams = F.transform(
        seq, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


@register(
    "q06_decontaminate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents
    ),
    ng AS (
      SELECT doc_id, unnest(list_distinct({_ngrams_sql('t', NGRAM)})) AS ng
      FROM tok
    ),
    bench AS (SELECT DISTINCT ng FROM ng WHERE {BENCH_PRED}),
    train AS (SELECT * FROM ng WHERE NOT ({BENCH_PRED}))
    SELECT train.doc_id,
           count(*) AS n_ngrams,
           count(bench.ng) AS n_contaminated,
           (count(bench.ng) * 20 >= count(*)) AS contaminated
    FROM train LEFT JOIN bench ON train.ng = bench.ng
    GROUP BY train.doc_id
    ORDER BY train.doc_id
    """,
    tags=("quality", "decontamination", "training-pipeline"),
)
def q06_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per train doc, how many of its distinct
    5-grams appear in the held-out eval slice; flag docs where ≥5% do.

    Plan: eval docs are a fixed tiny fraction, so their distinct-n-gram
    set stays broadcast-sized even when the train side is 100 TB — the
    contamination check is a broadcast LEFT join per exploded n-gram,
    then ONE shuffle (doc_id) for the per-doc counts. The n-gram text
    itself never keys a shuffle."""
    d = tw(spark, sf_dir, "documents")
    ng = d.select(
        "doc_id",
        F.explode(F.array_distinct(_ngrams_col(tokens_col("text"), NGRAM))).alias(
            "ng"
        ),
    )
    is_bench = F.expr(BENCH_PRED)
    bench = ng.where(is_bench).select("ng").distinct().withColumn("hit", F.lit(1))
    return (
        ng.where(~is_bench)
        .join(F.broadcast(bench), "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_contaminated"),
        )
        .withColumn("contaminated", F.col("n_contaminated") * 20 >= F.col("n_ngrams"))
        .orderBy("doc_id")
    )


@register(
    "q07_repetition_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents
    ),
    base AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct
      FROM tok
    ),
    bg AS (
      SELECT doc_id, unnest({_ngrams_sql('t', 2)}) AS bg FROM tok
    ),
    bg_counts AS (
      SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg
    ),
    bg_stats AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_count
      FROM bg_counts GROUP BY doc_id
    )
    SELECT base.doc_id, n_tokens, n_distinct,
           CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
           ((n_tokens - n_distinct) * 2 > n_tokens) AS dup_token_heavy,
           (coalesce(top_bigram_count, 0) * 5 > coalesce(n_bigrams, 0))
             AS top_bigram_heavy
    FROM base LEFT JOIN bg_stats ON base.doc_id = bg_stats.doc_id
    ORDER BY base.doc_id
    """,
    tags=("quality", "repetition", "training-pipeline"),
)
def q07_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition signals: duplicate-token
    fraction (as exact integer counts) and top-2-gram share.

    Plan: a PURE MAP — every column is an array expression over the
    row's own tokens (the per-doc bigram mode is an O(distinct·n)
    codegen'd expression, cheap on document-length arrays), so there is
    NO shuffle before the output sort. The oracle computes the same
    stats relationally (unnest → two GROUP BYs), proving the map-side
    expressions against a conventional formulation."""
    d = tw(spark, sf_dir, "documents")
    toks = tokens_col("text")
    bgs = _ngrams_col(toks, 2)
    # Per-doc bigram mode WITHOUT a shuffle and without the O(n·distinct)
    # count-each-distinct trap: sort the bigram list, then one linear
    # run-length pass (longest run of equal neighbors == max count).
    # O(n log n) per row, single pass over the array.
    top = F.aggregate(
        F.array_sort(bgs),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(acc.prev), acc.run + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc.best,
                F.when(x.eqNullSafe(acc.prev), acc.run + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
            F.size(bgs).cast("long").alias("n_bigrams"),
            F.coalesce(top, F.lit(0)).cast("long").alias("top_bigram_count"),
        )
        .withColumn(
            "dup_token_heavy",
            (F.col("n_tokens") - F.col("n_distinct")) * 2 > F.col("n_tokens"),
        )
        .withColumn(
            "top_bigram_heavy",
            F.col("top_bigram_count") * 5 > F.col("n_bigrams"),
        )
        .orderBy("doc_id")
    )


# Regex patterns restricted to the Java∩RE2 common dialect (character
# classes, +, {m,n} — no lookaround, no \d shorthands).
RE_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.\-]+"
RE_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
RE_PHONE = r"\+[0-9][0-9\-]{5,}[0-9]"

# Deterministic PII suffix derived from doc_id — identical construction
# in both engines, so the redaction operator has real matches to find
# without synthesizing input data.
# || not concat(): DuckDB's concat() IGNORES NULL arguments while
# Spark's is NULL-strict — with a NULL text the two engines would
# disagree on whether the synthetic PII suffix exists at all. || is
# NULL-strict in both, so a NULL document stays NULL end-to-end.
_PII_SQL = (
    "(text || ' contact user' || doc_id || '@mail.example.com or +1-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || (doc_id % 256) || '.7')"
)
_PII_SPARK = (
    "concat(text, ' contact user', doc_id, '@mail.example.com or +1-555-',"
    " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),"
    " ' from 10.0.', doc_id % 256, '.7')"
)


@register(
    "q08_pii_redact",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_SQL} AS body FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(body, '{RE_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(body, '{RE_IP}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(body, '{RE_PHONE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(body,
                 '{RE_EMAIL}', '<EMAIL>', 'g'),
                 '{RE_IP}', '<IP>', 'g'),
                 '{RE_PHONE}', '<PHONE>', 'g')) AS redacted_hash
    FROM aug
    ORDER BY doc_id
    """,
    tags=("quality", "pii", "training-pipeline"),
)
def q08_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and scrub emails / IPs / phone numbers,
    surface the redacted-content hash.

    Plan: pure map (regexp_count + chained regexp_replace, all
    whole-stage codegen). Patterns stay in the Java∩RE2 common dialect
    so one pattern string drives both engines. Redaction order is
    email → IP → phone (phone's dash-digit class cannot match the
    dotted IP remnant, so the chain is confluent)."""
    d = tw(spark, sf_dir, "documents")
    body = F.expr(_PII_SPARK)
    red = body
    for pat, tag in ((RE_EMAIL, "<EMAIL>"), (RE_IP, "<IP>"), (RE_PHONE, "<PHONE>")):
        red = F.regexp_replace(red, pat, tag)
    return d.select(
        "doc_id",
        F.regexp_count(body, F.lit(RE_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(body, F.lit(RE_IP)).cast("long").alias("n_ips"),
        F.regexp_count(body, F.lit(RE_PHONE)).cast("long").alias("n_phones"),
        F.md5(red).alias("redacted_hash"),
    ).orderBy("doc_id")


def _spans_col(toks):
    """Spark: non-overlapping SPAN-token windows (full windows only)."""
    size = F.size(toks)
    n_spans = (size / SPAN).cast("int")  # floor for non-negative sizes
    seq = F.sequence(F.lit(0), n_spans - 1)
    spans = F.transform(
        seq, lambda j: F.array_join(F.slice(toks, j * SPAN + 1, SPAN), " ")
    )
    return F.when(size >= SPAN, spans).otherwise(F.array().cast("array<string>"))


_SPANS_SQL = (
    f"[array_to_string(t[j * {SPAN} + 1 : j * {SPAN} + {SPAN}], ' ') "
    f"for j in generate_series(0, len(t) // {SPAN} - 1)]"
)


def _span_share(d):
    """Shared core of q09/q145: per-doc (n_spans, n_shared) from the
    single-tokenize pair pre-agg + span_hash doc-frequency agg/join.

    The doc-frequency is deliberately a groupBy + join-back rather than
    `count().over(Window.partitionBy("span_hash"))`: a window partition
    must land every (span, doc) pair for one hash on ONE task, so a
    boilerplate span shared by millions of docs ("all rights reserved…")
    serializes the whole stage — and windows get no AQE skew handling.
    The aggregate + equi-join shape keeps the partial count map-side
    combinable and lets AQE's skew-join split a hot span_hash across
    tasks."""
    pairs = (
        d.select(
            "doc_id",
            F.explode(_spans_col(tokens_col("text"))).alias("span"),
        )
        .select("doc_id", F.md5("span").alias("span_hash"))
        .groupBy("span_hash", "doc_id")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    # pairs are distinct per (span_hash, doc_id): the doc-frequency of a
    # span is the row count of its hash group
    freq = pairs.groupBy("span_hash").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        pairs.join(freq, "span_hash")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").alias("n_spans"),
            F.sum(F.when(F.col("n_docs") > 1, F.col("occ")).otherwise(0)).alias(
                "n_shared"
            ),
        )
    )

@register(
    "q09_span_dedup",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents
    ),
    spans AS (
      SELECT doc_id, md5(unnest({_SPANS_SQL})) AS span_hash FROM tok
    ),
    global_counts AS (
      SELECT span_hash, count(DISTINCT doc_id) AS n_docs
      FROM spans GROUP BY span_hash
    ),
    per_doc AS (
      SELECT s.doc_id,
             count(*) AS n_spans,
             CAST(sum(CASE WHEN g.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
      FROM spans s JOIN global_counts g ON s.span_hash = g.span_hash
      GROUP BY s.doc_id
    )
    SELECT tok.doc_id,
           CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
           coalesce(n_shared, 0) AS n_shared,
           (coalesce(n_shared, 0) * 2 <= coalesce(n_spans, 0)) AS keep
    FROM tok LEFT JOIN per_doc ON tok.doc_id = per_doc.doc_id
    ORDER BY tok.doc_id
    """,
    tags=("quality", "span-dedup", "training-pipeline"),
)
def q09_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document span dedup: hash fixed 3-token windows,
    count how many docs each span appears in globally, and drop docs
    where shared spans dominate.

    Plan: tokenize ONCE — the span stream is first reduced to distinct
    (span_hash, doc_id) pairs with an occurrence count (map-side
    combinable, so duplicate spans within a partition collapse before
    the shuffle), then the global doc-frequency is a groupBy on
    span_hash joined back to the pairs (skew-safe: AQE can split a hot
    span across tasks, which a window partition cannot — see
    _span_share), then one doc_id agg. Every shuffled row is
    (32-byte hash, id, small int) — the span text never moves after
    the map side."""
    d = tw(spark, sf_dir, "documents")
    per_doc = _span_share(d)
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        )
        .withColumn("keep", F.col("n_shared") * 2 <= F.col("n_spans"))
        .orderBy("doc_id")
    )


_SPAN_PER_DOC_SQL = f"""
    tok AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents
    ),
    spans AS (
      SELECT doc_id, md5(unnest({_SPANS_SQL})) AS span_hash FROM tok
    ),
    global_counts AS (
      SELECT span_hash, count(DISTINCT doc_id) AS n_docs
      FROM spans GROUP BY span_hash
    ),
    span_per_doc AS (
      SELECT s.doc_id,
             count(*) AS n_spans,
             CAST(sum(CASE WHEN g.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
      FROM spans s JOIN global_counts g ON s.span_hash = g.span_hash
      GROUP BY s.doc_id
    )
"""


# q63's HALF_UP integer-exact quality score ×10⁴ as reusable CTE text
# (CTEs ``q`` + ``quality``), shared by q145's funnel and q170's
# corpus→trainer capstone so both oracles replay the identical gate.
_QUALITY4_SQL = f"""
    q AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT)  AS nc,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
               AS na,
             CAST(len({tokens_sql('text')}) AS BIGINT) AS nt,
             CAST(len(list_filter({tokens_sql('text')},
                  x -> list_contains(['the','and','of','to','a','el','la','de',
                                      'le','der','die','und'], x)))
                  AS BIGINT) AS ns
      FROM documents
    ),
    quality AS (
      SELECT doc_id,
             (2 * (5 * na * greatest(nt, 1) * 100
                   + 3 * ns * greatest(nc, 1) * 100
                   + 2 * least(nt, 100) * greatest(nc, 1) * greatest(nt, 1))
                * 10000
              + 10 * greatest(nc, 1) * greatest(nt, 1) * 100)
             // (2 * 10 * greatest(nc, 1) * greatest(nt, 1) * 100) AS quality4
      FROM q
    )"""


def quality4_df(d: DataFrame) -> DataFrame:
    """(doc_id, quality4) — the Spark half of :data:`_QUALITY4_SQL`:
    q63's quality score scaled to an exact integer ×10⁴ (HALF_UP via
    the +denominator/2 trick, no float division crosses engines).
    Shared gate core for q145 and q170."""
    toks = tokens_col("text")
    sw = F.array(*[F.lit(w) for w in
                   ("the", "and", "of", "to", "a", "el", "la", "de", "le",
                    "der", "die", "und")])
    return d.select(
        "doc_id",
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("long").alias("na"),
        F.length("text").cast("long").alias("ncr"),
        F.size(toks).cast("long").alias("nt"),
        F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast("long").alias("ns"),
    ).select(
        "doc_id",
        F.expr(
            "(2 * (5 * na * greatest(nt, 1L) * 100"
            " + 3 * ns * greatest(ncr, 1L) * 100"
            " + 2 * least(nt, 100L) * greatest(ncr, 1L) * greatest(nt, 1L)) * 10000"
            " + 10 * greatest(ncr, 1L) * greatest(nt, 1L) * 100)"
            " div (2 * 10 * greatest(ncr, 1L) * greatest(nt, 1L) * 100)"
        ).alias("quality4"),
    )


@register(
    "q145_corpus_curation",
    oracle=f"""
    WITH {_SPAN_PER_DOC_SQL},
    {_QUALITY4_SQL},
    class AS (
      SELECT d.source,
             CASE
               WHEN d.lang <> 'en' THEN 'wrong_lang'
               WHEN coalesce(p.n_shared, 0) * 2 > coalesce(p.n_spans, 0)
                 THEN 'dup'
               WHEN quality4 < 5000 THEN 'low_quality'
               ELSE 'kept'
             END AS cls
      FROM documents d
        LEFT JOIN span_per_doc p ON d.doc_id = p.doc_id
        JOIN quality ON d.doc_id = quality.doc_id
    )
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN cls = 'wrong_lang' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_wrong_lang,
           CAST(sum(CASE WHEN cls = 'dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(sum(CASE WHEN cls = 'low_quality' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_quality,
           CAST(sum(CASE WHEN cls = 'kept' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM class
    GROUP BY source
    ORDER BY source
    """,
    tags=("quality", "curation", "pipeline-composition", "training-pipeline"),
)
def q145_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE plan: every document passes
    the language gate (en), the cross-doc span-dedup gate (q09's keep),
    and the quality gate (q63's integer-exact score ≥ 0.5) in strict
    precedence, and the result is the per-source survivorship funnel —
    the one-query version of the filter chain a 100 TB pretraining
    pipeline runs between crawl and tokenizer.

    Composition: the span stage is q09's shared core (_span_share —
    tokenize-once pair pre-agg + skew-safe doc-frequency agg/join); the quality
    stage is q63's HALF_UP integer arithmetic (no float ratios cross
    engines); the funnel is one conditional-count aggregate. Scale
    shape: one corpus tokenize feeding the span shuffle, one pure-map
    quality pass, then a source-cardinality agg — nothing new beyond
    the stages' own costs, which is the point of fusing them."""
    d = tw(spark, sf_dir, "documents")
    per_doc = _span_share(d)
    quality = quality4_df(d)
    cls = (
        d.select("doc_id", "lang", "source")
        .join(per_doc, "doc_id", "left")
        .join(quality, "doc_id")
        .select(
            "source",
            F.when(F.col("lang") != "en", "wrong_lang")
            .when(
                F.coalesce("n_shared", F.lit(0)) * 2
                > F.coalesce("n_spans", F.lit(0)),
                "dup",
            )
            .when(F.col("quality4") < 5000, "low_quality")
            .otherwise("kept")
            .alias("cls"),
        )
    )
    cnt = lambda name: F.sum(F.when(F.col("cls") == name, 1).otherwise(0)).alias(  # noqa: E731
        f"n_{name}"
    )
    return (
        cls.groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            cnt("wrong_lang"),
            cnt("dup"),
            cnt("low_quality"),
            cnt("kept"),
        )
        .orderBy("source")
    )


def _unigram_freq_df(docs: DataFrame) -> DataFrame:
    """(token, c) — q149's corpus unigram model, the fit core: one
    map-side-combinable aggregate over token occurrences. Kept as a
    separate function so the cold-start test can poison it and prove
    an attached session never refits."""
    return (
        docs.select(F.explode(tokens_col("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _unigram_lm_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram frequency table fit — memoized/persisted via the
    ``fitted_family`` lifecycle (:func:`unigram_lm_for`). The
    normalizing total is NOT stored — it is one aggregate away from
    ``freq`` and storing it would create a second thing to keep
    consistent. A production fluency gate fits this table on an ingest
    schedule and every scoring job reads it — exactly the KenLM-model
    lifecycle with the model as a DataFrame."""
    return _unigram_freq_df(tw(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )


# Unigram-LM lifecycle via fitted_family: ``freq`` (token, c),
# fingerprint-stamped against the documents file; an attached session
# (q149) scores fluency without re-tokenizing or re-fitting.
unigram_lm_for, unigram_lm_save, unigram_lm_load, unigram_lm_attach = fitted_family(
    "unigram_lm",
    "documents.parquet",
    [("freq", ["token", "c"], None)],
    _unigram_lm_fit,
)


@register(
    "q149_unigram_logprob",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, unnest({tokens_sql('text')}) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS c FROM occ GROUP BY token),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM freq),
    scored AS (
      SELECT o.doc_id, ln(f.c / t.total) AS lp
      FROM occ o JOIN freq f ON o.token = f.token, tot t
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_tokens, round(avg(lp), 4) AS avg_logprob
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           p.avg_logprob,
           (coalesce(p.avg_logprob, -100) >= -8.5) AS keep
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
    """,
    tags=("quality", "language-model", "training-pipeline"),
)
def q149_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM fluency filter: score each document by the mean
    log-probability of its tokens under the corpus's own unigram model
    (the cheap stand-in for the KenLM-perplexity gate production
    pipelines run; gibberish and boilerplate-stuffed docs score low).

    Scale shape: the model IS a DataFrame — one (token, count)
    aggregate over the corpus (map-side combinable); the normalizing
    total is a broadcast 1-row aggregate, never a driver ``.count()``.
    Scoring joins occurrences to the frequency table on token — an
    equi-join AQE can skew-split when a stopword dominates (same
    posture as q09's doc-frequency join; a window over token would
    serialize on "the"). Per-doc reduction is one doc_id aggregate.
    At 100 TB you'd trim the model to top-V tokens with a floor
    probability for the tail — the plan shape is unchanged. The mean
    log-prob is rounded to 4 decimals in both engines (the q63 float
    discipline); the keep gate compares the ROUNDED score so the
    boolean is cross-engine stable."""
    d = tw(spark, sf_dir, "documents")
    occ = d.select("doc_id", F.explode(tokens_col("text")).alias("token"))
    freq = unigram_lm_for(spark, sf_dir)
    tot = freq.agg(F.sum("c").cast("double").alias("total"))
    scored = occ.join(freq, "token").crossJoin(F.broadcast(tot)).select(
        "doc_id", F.log(F.col("c") / F.col("total")).alias("lp")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "avg_logprob",
            (F.coalesce("avg_logprob", F.lit(-100.0)) >= -8.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


# q165: lgConfigK for the per-source n-gram sketches. 14 → ~0.4%
# standard error per estimate; the triage bound below allows 3% of the
# pair's union, ~4× the worst inclusion-exclusion error observed at
# sf0.001/0.01/0.1 (HLL relative error is scale-invariant, so the
# slack holds at 100 TB).
OVERLAP_LG_K = 14


def _overlap_ngs_df(docs: DataFrame) -> DataFrame:
    """Distinct (source, 5-gram) pairs — shared by q165's exact audit
    tier and the sketch fit, so a cold run tokenizes the corpus once."""
    return docs.select(
        "source", F.explode(_ngrams_col(tokens_col("text"), NGRAM)).alias("ng")
    ).distinct()


def _overlap_sketches_df(docs: DataFrame, ngs: DataFrame | None = None) -> DataFrame:
    """(source, n, sk) per source: exact distinct-5-gram count + HLL
    sketch over the distinct (source, n-gram) pairs — q165's fit.
    Pass ``ngs`` (a precomputed :func:`_overlap_ngs_df`) to fit from a
    relation the caller is already materializing."""
    if ngs is None:
        ngs = _overlap_ngs_df(docs)
    return ngs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.hll_sketch_agg("ng", OVERLAP_LG_K).alias("sk"),
    )


def _overlap_fit(
    spark: SparkSession, sf_dir: str, ngs: DataFrame | None = None
) -> DataFrame:
    """The per-source overlap-sketch fit (the ``lsh_bands_for``
    discipline, via the ``fitted_family`` lifecycle —
    :func:`overlap_sketches_for`): a production triage service
    maintains these sketches ALONGSIDE the corpus — built once per
    ingest day per source, merged with ``hll_union_agg`` as shards
    arrive, and re-read by every pairwise audit. S rows of kilobyte
    sketches; the HLL column is the DataSketches wire format (binary),
    so a saved table keeps merging with future ``hll_union_agg`` calls
    — the artifact is the rollup, not a cache. ``ngs``: a precomputed
    :func:`_overlap_ngs_df` the caller is already materializing (only
    consulted on a cache miss)."""
    return _overlap_sketches_df(
        tw(spark, sf_dir, "documents"), ngs=ngs
    ).localCheckpoint(eager=True)


# Overlap-sketch lifecycle via fitted_family: ``sketches`` (source, n,
# sk); an attached session (q165) triages source pairs without
# re-tokenizing or re-sketching the corpus.
(
    overlap_sketches_for,
    overlap_index_save,
    overlap_index_load,
    overlap_index_attach,
) = fitted_family(
    "overlap_sketches",
    "documents.parquet",
    [("sketches", ["source", "n", "sk"], None)],
    _overlap_fit,
    params={"lg_k": OVERLAP_LG_K},
)


@register(
    "q165_sketch_overlap_triage",
    oracle=f"""
    WITH tok AS (
      SELECT source, {tokens_sql('text')} AS t FROM documents
    ),
    ng AS (
      SELECT DISTINCT source, unnest({_ngrams_sql('t', NGRAM)}) AS ng
      FROM tok
    ),
    per AS (SELECT source, count(*) AS n FROM ng GROUP BY source),
    ov AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS o
      FROM ng a JOIN ng b ON a.ng = b.ng AND a.source < b.source
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b, a.n AS na, b.n AS nb
      FROM per a JOIN per b ON a.source < b.source
    )
    SELECT p.src_a, p.src_b,
           coalesce(o.o, 0) AS exact_overlap,
           p.na + p.nb - coalesce(o.o, 0) AS exact_union,
           (coalesce(o.o, 0) * 50 >= p.na + p.nb - coalesce(o.o, 0))
             AS material,
           true AS sketch_within_bound
    FROM pairs p LEFT JOIN ov o
      ON p.src_a = o.src_a AND p.src_b = o.src_b
    ORDER BY p.src_a, p.src_b
    """,
    tags=("sketch", "approx", "decontamination", "triage", "training-pipeline"),
)
def q165_sketch_overlap_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus overlap TRIAGE via mergeable sketches: estimate the
    distinct-5-gram overlap of every source pair from per-source HLL
    sketches (inclusion-exclusion: est_a + est_b − est_union) and flag
    the ``material`` pairs (≥2% of the union) that justify q06's exact
    decontamination join. The estimate is audited in-band against the
    exact pairwise overlap (``sketch_within_bound`` — the q16/q102
    falsifiable-sketch discipline; the bound is 3% of the pair's union,
    ~4× the worst observed inclusion-exclusion error at lgConfigK=14).

    Scale shape: the per-source sketch table is the materialized
    artifact — ~16 KB per source at lgConfigK=14, built in ONE
    map-side-combinable pass over (source, n-gram), mergeable across
    shards and ingest days without rescanning (q102's rollup story).
    Pairwise triage is then O(S²) over KILOBYTE sketches — for 10⁴
    sources that is 5·10⁷ sketch unions on a broadcast table, never a
    data shuffle; only pairs the triage marks material pay q06's exact
    n-gram join. The exact sibling computed here (one collect_set pass
    keyed on the short n-gram hash, ≤S sources per gram) is the audit
    tier a production run drops — the surfaced decision column is
    exact-derived, so the oracle replays it verbatim while the bound
    boolean falsifies the sketch path itself. The sketch table is the
    memoized/persistable :func:`overlap_sketches_for` artifact
    (attachable via :func:`overlap_index_attach`), so a serving
    session never re-sketches the corpus."""
    d = tw(spark, sf_dir, "documents")
    # ONE definition of the tokenize+distinct relation feeds both
    # tiers (no drift between audit and fit). Physically, a cache-cold
    # call still runs it twice — once for the fit's checkpoint job,
    # once in this query — which is the production split anyway: the
    # fit is the offline job, and every warm/attached call serves the
    # sketches from the artifact and scans only for the audit tier.
    ngs = _overlap_ngs_df(d)

    per = overlap_sketches_for(spark, sf_dir, ngs=ngs)
    a = per.select(
        F.col("source").alias("src_a"),
        F.col("n").alias("na"),
        F.col("sk").alias("sk_a"),
    )
    b = per.select(
        F.col("source").alias("src_b"),
        F.col("n").alias("nb"),
        F.col("sk").alias("sk_b"),
    )
    est = a.join(F.broadcast(b), F.col("src_a") < F.col("src_b")).select(
        "src_a",
        "src_b",
        "na",
        "nb",
        (
            F.hll_sketch_estimate("sk_a")
            + F.hll_sketch_estimate("sk_b")
            - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
        ).alias("est_overlap"),
    )

    # Exact audit tier: sources per gram via ONE shuffle on the n-gram,
    # then ordered pairs map-side (≤ S sources per gram, never a
    # gram-keyed self-join materializing both sides).
    grp = ngs.groupBy("ng").agg(F.collect_set("source").alias("srcs"))
    ex = (
        grp.select(F.explode("srcs").alias("src_a"), "srcs")
        .select("src_a", F.explode("srcs").alias("src_b"))
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )

    u = F.col("na") + F.col("nb") - F.col("exact_overlap")
    return (
        est.join(ex, ["src_a", "src_b"], "left")
        .withColumn("exact_overlap", F.coalesce("exact_overlap", F.lit(0)))
        .select(
            "src_a",
            "src_b",
            "exact_overlap",
            u.alias("exact_union"),
            (F.col("exact_overlap") * 50 >= u).alias("material"),
            (F.abs(F.col("est_overlap") - F.col("exact_overlap")) <= 0.03 * u).alias(
                "sketch_within_bound"
            ),
        )
        .orderBy("src_a", "src_b")
    )


# q166: hashed-feature space (the "hashing trick" — Weinberger et al.
# 2009) and a deterministic stand-in weight vector. Real pipelines load
# trained fastText/logreg weights; the synthetic corpus has none, so the
# weight for bucket d is a fixed integer-arithmetic function of d —
# derivable in BOTH engines (q08's no-synthesized-inputs discipline),
# while the plan (hash → broadcast weight lookup → per-doc mean) is
# exactly the production classifier's.
CLS_BUCKETS = 256
CLS_KEEP_TAU = 0.0


def _classifier_weights_df(spark: SparkSession) -> DataFrame:
    """(bucket, w_milli) — q166's weight vector, the fit-core stand-in:
    in production this table is the OUTPUT of a training job (fastText
    / logreg over labeled quality data); here it is a deterministic
    integer function of the bucket id so both engines derive it.
    Kept as a separate function so the cold-start test can poison it
    and prove an attached session never "retrains"."""
    return spark.range(CLS_BUCKETS).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 2001 - 1000).alias("w_milli"),
    )


def _classifier_weights_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier weight vector fit, keyed on the corpus
    fingerprint it gates (the model's provenance: a production weight
    vector is trained against a corpus snapshot, and serving weights
    fitted on superseded data is the staleness bug the fingerprint
    exists to refuse — the ``fitted_family`` lifecycle,
    :func:`classifier_weights_for`). 256 rows — kilobytes;
    fastText-scale (2M buckets) is still MBs and broadcasts the same
    way."""
    return _classifier_weights_df(spark).localCheckpoint(eager=True)


# Classifier-weights lifecycle via fitted_family: ``weights`` (bucket,
# w_milli); an attached session (q166) gates documents without
# re-deriving the model.
(
    classifier_weights_for,
    classifier_weights_save,
    classifier_weights_load,
    classifier_weights_attach,
) = fitted_family(
    "cls_weights",
    "documents.parquet",
    [("weights", ["bucket", "w_milli"], None)],
    _classifier_weights_fit,
    params={"buckets": CLS_BUCKETS},
)


@register(
    "q166_classifier_filter",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents
    ),
    occ AS (SELECT doc_id, unnest(t) AS token FROM tok),
    b AS (
      SELECT doc_id, {hex_int_sql("md5(token)", 1, 2)} AS bucket
      FROM occ
    ),
    w AS (
      SELECT d AS bucket, (d * 2654435761) % 2001 - 1000 AS w_milli
      FROM generate_series(0, {CLS_BUCKETS - 1}) g(d)
    ),
    per AS (
      SELECT doc_id, count(*) AS n_tokens, CAST(sum(w_milli) AS BIGINT) AS s
      FROM b JOIN w USING (bucket) GROUP BY doc_id
    ),
    sc AS (
      SELECT doc_id, n_tokens,
             CAST(floor(s * 10.0 / n_tokens + 0.5) AS BIGINT) AS score4
      FROM per
    )
    SELECT d.doc_id,
           coalesce(p.n_tokens, 0) AS n_tokens,
           p.score4 / 10000.0 AS score,
           coalesce(p.score4 >= {int(CLS_KEEP_TAU * 10000)}, false) AS keep
    FROM documents d LEFT JOIN sc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
    """,
    tags=("quality", "classifier", "training-pipeline"),
)
def q166_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering via the hashing trick: each token
    hashes to one of CLS_BUCKETS feature buckets (md5 nibbles —
    cross-engine identical), the document's score is the mean bucket
    weight over its token occurrences, and ``keep`` gates on the
    ROUNDED score (q149's cross-engine boolean discipline). This is
    the fastText/logistic-regression filtering stage of modern corpus
    curation (CCNet, FineWeb-Edu) with the trained weight vector
    replaced by a deterministic integer stand-in — the PLAN is the
    production one, the weights are the fixture.

    Scale shape: the weight vector is a CLS_BUCKETS-row DataFrame —
    kilobytes at any real dimensionality (fastText uses 2M buckets ≈
    MBs) — so scoring is explode → BROADCAST weight join → ONE doc_id
    aggregate; no vocabulary-sized shuffle exists anywhere (contrast
    q149, whose model is corpus-derived and joins on raw token). At
    100 TB this is a pure map-side pipeline plus the per-doc combine;
    AQE has nothing to fix. Integer milli-weights keep the sum exact;
    the score is fixed to 4 decimals via TIE-PROOF integer rounding —
    ``floor(s*10/n + 0.5)`` over exact integers — because ``round()``
    diverges cross-engine on exact decimal ties (Spark rounds half-up,
    DuckDB half-even: s=-4879, n=28 → -0.17425 → -0.1743 vs -0.1742,
    caught by the sf0.01 oracle)."""
    d = tw(spark, sf_dir, "documents")
    occ = d.select("doc_id", F.explode(tokens_col("text")).alias("token")).select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 2), 16, 10).cast("int").alias("bucket"),
    )
    weights = classifier_weights_for(spark, sf_dir)
    per = (
        occ.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("w_milli").alias("s"))
    )
    score4 = F.floor(F.col("s") * 10.0 / F.col("n_tokens") + 0.5)
    return (
        d.select("doc_id")
        .join(per.withColumn("score4", score4), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            (F.col("score4") / 10000.0).alias("score"),
            F.coalesce(
                F.col("score4") >= int(CLS_KEEP_TAU * 10000), F.lit(False)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --- q201: k-anonymity export gate (generalize-then-suppress) ---------------

Q201_K = 5


@register(
    "q201_kanon_export",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, count(*) AS n
      FROM documents GROUP BY lang, source
    ),
    pass0 AS (
      SELECT lang, source, n, 0 AS level FROM g WHERE n >= {Q201_K}
    ),
    gen AS (
      SELECT lang, '*' AS source, CAST(sum(n) AS BIGINT) AS n, 1 AS level
      FROM g WHERE n < {Q201_K} GROUP BY lang
    )
    SELECT lang, source, CAST(n AS BIGINT) AS n_docs,
           CAST(level AS BIGINT) AS level,
           CASE WHEN n >= {Q201_K} THEN 'exported'
                ELSE 'suppressed' END AS status
    FROM (SELECT * FROM pass0 UNION ALL SELECT * FROM gen)
    ORDER BY lang, source
    """,
    tags=("quality", "governance", "training-pipeline"),
)
def q201_kanon_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY EXPORT GATE — the governance step before a corpus
    (or its metadata manifest) leaves the pipeline: no exported group
    of quasi-identifiers (here ``lang × source``) may describe fewer
    than K documents, or the manifest itself re-identifies rare
    provenances (the Sweeney 2002 k-anonymity model applied to
    dataset release). The standard GENERALIZE-THEN-SUPPRESS ladder,
    one level: groups passing K export as-is (level 0); failing
    groups climb the generalization hierarchy (``source → '*'``) and
    re-test as merged (lang, *) groups (level 1); groups that STILL
    fail are suppressed from the export — surfaced, never silently
    dropped, so the release audit shows exactly what was withheld.

    Scale shape: two group-sized aggregates (the second over the
    failing remainder only) — group-cardinality work end to end; the
    fact table is scanned once. At 100 TB the gate is a planning-time
    rounding error, which is why there is no excuse for skipping it.

    Reference analog: none (SURVEY §2.3 governance extension)."""
    g = (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pass0 = g.where(F.col("n") >= Q201_K).select(
        "lang", "source", "n", F.lit(0).cast("long").alias("level")
    )
    gen = (
        g.where(F.col("n") < Q201_K)
        .groupBy("lang")
        .agg(F.sum("n").cast("long").alias("n"))
        .select("lang", F.lit("*").alias("source"), "n",
                F.lit(1).cast("long").alias("level"))
    )
    return (
        pass0.unionByName(gen)
        .select(
            "lang",
            "source",
            F.col("n").cast("long").alias("n_docs"),
            "level",
            F.when(F.col("n") >= Q201_K, F.lit("exported"))
            .otherwise(F.lit("suppressed"))
            .alias("status"),
        )
        .orderBy("lang", "source")
    )


# --- q202: interpolated bigram-LM fluency (fourteenth persisted family) ----

Q202_LAMBDA = 0.7  # interpolation weight on the bigram term
Q202_KEEP = -3.43  # keep gate on the rounded per-doc average logprob
# (-3.43: ~p10 of the fixture distribution — the gate CUTS, like q149's)


def _bigram_counts_df(docs: DataFrame) -> DataFrame:
    """FIT CORE (poisonable): (pair, w1, w2, c) bigram counts, the
    pair stored as the space-joined string (tokens are letter-runs, so
    the space separator is collision-free in both engines)."""
    toks = docs.select("doc_id", tokens_col("text").alias("toks")).where(
        F.size("toks") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(toks[i-1], ' ', toks[i]))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "pair",
            F.expr("split(pair, ' ')[0]").alias("w1"),
            F.expr("split(pair, ' ')[1]").alias("w2"),
            "c",
        )
    )


def _bigram_lm_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bigram_counts_df(tw(spark, sf_dir, "documents")).localCheckpoint(
        eager=True
    )


(
    bigram_lm_for,
    bigram_lm_save,
    bigram_lm_load,
    bigram_lm_attach,
) = fitted_family(
    "bigram_lm",
    "documents.parquet",
    [("bigrams", ["pair", "w1", "w2", "c"], None)],
    _bigram_lm_fit,
    params={"order": 2},
)


def _q202_oracle() -> str:
    return f"""
    WITH docs AS (
      SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
    ),
    occ AS (SELECT doc_id, unnest(toks) AS token FROM docs),
    uni AS (SELECT token, count(*) AS c FROM occ GROUP BY token),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM uni),
    bp AS (
      SELECT doc_id, unnest([toks[i-1] || ' ' || toks[i]
                             for i in generate_series(2, len(toks))]) AS pair
      FROM docs WHERE len(toks) >= 2
    ),
    big AS (SELECT pair, count(*) AS c FROM bp GROUP BY pair),
    scored AS (
      SELECT bp.doc_id,
             ln({Q202_LAMBDA} * (coalesce(big.c, 0) * 1.0 / u1.c)
                + {1 - Q202_LAMBDA} * (u2.c / total)) AS lp
      FROM bp
      LEFT JOIN big ON big.pair = bp.pair
      JOIN uni u1 ON u1.token = split_part(bp.pair, ' ', 1)
      JOIN uni u2 ON u2.token = split_part(bp.pair, ' ', 2), tot
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 4) AS avg_logprob
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           p.avg_logprob,
           (coalesce(p.avg_logprob, -100) >= {Q202_KEEP}) AS keep
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id
    """


@register(
    "q202_bigram_logprob",
    oracle=_q202_oracle(),
    tags=("quality", "language-model", "training-pipeline"),
)
def q202_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATED BIGRAM-LM fluency filter — q149 one order deeper,
    the real shape of the KenLM gate: score each document by the mean
    ln(λ·p(w₂|w₁) + (1−λ)·p(w₂)) over its adjacent token pairs. The
    bigram conditional c(w₁w₂)/c(w₁) catches word-ORDER breakage that
    unigram frequency cannot (scrambled text keeps its unigram score;
    its bigrams crater — tested), and the interpolation is real
    Jelinek-Mercer: a pair UNSEEN at fit time is not skipped but
    floored at ln((1−λ)·p_uni(w₂)) via the LEFT join — the penalty
    that makes the word-order claim true on out-of-model text.

    The bigram table is the FOURTEENTH persisted family
    (:func:`bigram_lm_for`): vocabulary²-BOUNDED, not corpus-sized —
    at 100 TB you store the top-V² observed pairs with a count floor
    and the plan shape is unchanged. Scoring joins occurrences to the
    pair table on the pair string and to the unigram table (the q149
    family) on each side — equi-joins AQE can skew-split, the q149
    posture; the per-doc reduction is one doc_id aggregate.

    Scale shape: one tokenize pass, one pair explode (generator),
    vocabulary-sized model joins, one doc_id agg. The mean logprob is
    rounded to 4 decimals in both engines and the keep gate compares
    the ROUNDED score (q63/q149 float discipline).

    Reference analog: none (SURVEY §2.3 quality extension; the
    n-gram-LM step between q149's unigram and a production KenLM)."""
    d = tw(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col("text").alias("toks"))
    bp = toks.where(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat(toks[i-1], ' ', toks[i]))"
            )
        ).alias("pair"),
    )
    big = bigram_lm_for(spark, sf_dir)
    uni = unigram_lm_for(spark, sf_dir)
    tot = uni.agg(F.sum("c").cast("double").alias("total"))
    scored = (
        bp.withColumn("w1", F.expr("split(pair, ' ')[0]"))
        .withColumn("w2", F.expr("split(pair, ' ')[1]"))
        .join(big.select("pair", F.col("c").alias("cb")), "pair", "left")
        .join(uni.select(F.col("token").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("token").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.log(
                Q202_LAMBDA
                * (F.coalesce(F.col("cb"), F.lit(0)) * 1.0 / F.col("c1"))
                + (1 - Q202_LAMBDA) * (F.col("c2") / F.col("total"))
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "avg_logprob",
            (F.coalesce("avg_logprob", F.lit(-100.0)) >= Q202_KEEP).alias(
                "keep"
            ),
        )
        .orderBy("doc_id")
    )
