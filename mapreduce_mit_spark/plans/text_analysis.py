"""Text-analysis operators over the ``documents`` table.

Reference parity (word count = wc.go:22-51, inverted index =
ii.go:22-58) re-expressed on the typed documents table, plus the
training-data-pipeline text ops: token counting (whitespace + BPE-ish
regex), quality scoring, stopword-based language ID, and document
fingerprinting. All pure built-in expressions — tokenization stays in
whole-stage codegen; zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window
from pyspark.sql import functions as F

from ..functions.hashing import norm_text_col, norm_text_sql
from ..functions.textfns import tokens_col, tokens_sql, words_df
from ..registry import register
from ._util import t, tw

# A tiny multi-language stopword table for the language-ID heuristic.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
# (a simplified GPT-2-style pre-split; same RE2/Java regex both engines).
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


@register(
    "q60_wordcount",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest({tokens_sql('text')}) AS word FROM documents)
    GROUP BY word
    ORDER BY cnt DESC, word
    """,
    tags=("text", "mapreduce-parity"),
)
def q60_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference flagship: word count (wc.go) as scan → explode →
    hash agg. Catalyst's partial aggregation is the combiner the
    reference never implemented (SURVEY §4.2)."""
    d = t(spark, sf_dir, "documents")
    return (
        words_df(d.select("text"), "text", "word")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
    )


@register(
    "q61_inverted_index",
    oracle=f"""
    SELECT word,
           count(DISTINCT doc_id) AS n_docs,
           string_agg(DISTINCT CAST(doc_id AS VARCHAR), ',' ORDER BY CAST(doc_id AS VARCHAR)) AS doc_list
    FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS word FROM documents)
    GROUP BY word
    ORDER BY word
    """,
    tags=("text", "mapreduce-parity"),
)
def q61_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index (ii.go:36-58): per word, distinct-doc count + the
    lexicographically-sorted comma-joined doc list — collect_set +
    array_sort + array_join replaces the reference's in-memory map/set."""
    d = tw(spark, sf_dir, "documents")
    words = words_df(d.select("doc_id", "text"), "text", "word")
    docs = F.array_sort(F.collect_set(F.col("doc_id").cast("string")))
    return (
        words.groupBy("word")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.array_join(docs, ",").alias("doc_list"),
        )
        .orderBy("word")
    )


@register(
    "q62_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({tokens_sql('text')})                          AS n_tokens,
           len(list_distinct({tokens_sql('text')}))           AS n_distinct,
           CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
           round(list_aggregate(list_transform({tokens_sql('text')}, x -> CAST(length(x) AS DOUBLE)), 'sum')
                 / greatest(len({tokens_sql('text')}), 1), 4) AS avg_token_len
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "tokenize"),
)
def q62_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: letter-run tokens, distinct tokens, a BPE-ish
    regex pre-tokenizer count, and mean token length — per document."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    tok_lens = F.transform(toks, lambda x: F.length(x).cast("double"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).cast("long").alias("n_bpe_tokens"),
        F.round(
            F.aggregate(tok_lens, F.lit(0.0), lambda a, x: a + x)
            / F.greatest(F.size(toks).cast("double"), F.lit(1.0)),
            4,
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


@register(
    "q63_quality_score",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(length(text) AS BIGINT) AS n_chars_actual,
             len({tokens_sql('text')}) AS n_tokens,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS alpha_raw,
             CAST(len(list_filter({tokens_sql('text')},
                       x -> list_contains(['the','and','of','to','a','el','la','de','le','der','die','und'], x)))
                       AS DOUBLE) / greatest(len({tokens_sql('text')}), 1) AS stop_raw
      FROM documents
    )
    SELECT doc_id, lang, n_chars_actual, n_tokens,
           round(alpha_raw, 4) AS alpha_ratio,
           round(stop_raw, 4)  AS stopword_ratio,
           round(0.5 * alpha_raw + 0.3 * stop_raw
                 + 0.2 * least(n_tokens / 100.0, 1.0), 4) AS quality
    FROM scored
    ORDER BY doc_id
    """,
    tags=("text", "quality"),
)
def q63_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality score: alphabetic ratio, stopword
    ratio, and a length term — the standard cheap pre-filter stage of a
    training-data pipeline (runs fully codegen'd at scan speed)."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    sw = F.array(*[F.lit(w) for w in
                   ("the", "and", "of", "to", "a", "el", "la", "de", "le", "der", "die", "und")])
    n_tokens = F.size(toks).cast("long")
    # quality is computed from the UNROUNDED ratios: rounding first would
    # create exact decimal midpoints (e.g. 0.48265) where Spark's and
    # DuckDB's round() disagree; the raw quotients are bit-identical in
    # both engines, so the final single round agrees.
    alpha_raw = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double") / F.greatest(
        F.length("text"), F.lit(1)
    )
    stop_raw = F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast(
        "double"
    ) / F.greatest(F.size(toks), F.lit(1))
    scored = d.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        alpha_raw.alias("alpha_raw"),
        stop_raw.alias("stop_raw"),
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_chars_actual",
        "n_tokens",
        F.round("alpha_raw", 4).alias("alpha_ratio"),
        F.round("stop_raw", 4).alias("stopword_ratio"),
        F.round(
            0.5 * F.col("alpha_raw")
            + 0.3 * F.col("stop_raw")
            + 0.2 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0)),
            4,
        ).alias("quality"),
    ).orderBy("doc_id")


def _langid_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter({tokens_sql('text')}, x -> list_contains([{words}], x)))"
    )


@register(
    "q64_language_id",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, lang AS labeled_lang,
             {_langid_hits_sql('en')} AS hits_en,
             {_langid_hits_sql('es')} AS hits_es,
             {_langid_hits_sql('fr')} AS hits_fr,
             {_langid_hits_sql('de')} AS hits_de
      FROM documents
    )
    SELECT doc_id, labeled_lang, hits_en, hits_es, hits_fr, hits_de,
           CASE
             WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de THEN 'en'
             WHEN hits_es >= hits_fr AND hits_es >= hits_de THEN 'es'
             WHEN hits_fr >= hits_de THEN 'fr'
             ELSE 'de'
           END AS predicted_lang
    FROM hits
    ORDER BY doc_id
    """,
    tags=("text", "langid"),
)
def q64_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (n-gram-free heuristic): count hits per
    language's stopword list, argmax with a fixed tie-break order.
    (The synthetic corpus is English-ish — the operator, not the corpus,
    is what's under test.)"""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col("text")

    def hits(lang: str):
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).cast("long")

    withhits = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        hits("en").alias("hits_en"),
        hits("es").alias("hits_es"),
        hits("fr").alias("hits_fr"),
        hits("de").alias("hits_de"),
    )
    pred = (
        F.when(
            (F.col("hits_en") >= F.col("hits_es"))
            & (F.col("hits_en") >= F.col("hits_fr"))
            & (F.col("hits_en") >= F.col("hits_de")),
            "en",
        )
        .when((F.col("hits_es") >= F.col("hits_fr")) & (F.col("hits_es") >= F.col("hits_de")), "es")
        .when(F.col("hits_fr") >= F.col("hits_de"), "fr")
        .otherwise("de")
    )
    return withhits.select("*", pred.alias("predicted_lang")).orderBy("doc_id")


@register(
    "q65_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({norm_text_sql('text')}) AS content_hash,
           md5(array_to_string(list_sort(list_distinct({tokens_sql('text')})), ',')) AS bow_hash,
           substr(md5({norm_text_sql('text')}), 1, 8) AS shard_key
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "fingerprint"),
)
def q65_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash over normalized text,
    and an order-insensitive bag-of-words hash (sorted distinct tokens).
    md5 is used for cross-engine parity; swap xxhash64 at scale."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    return d.select(
        "doc_id",
        F.md5(norm_text_col("text")).alias("content_hash"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), ",")).alias("bow_hash"),
        F.substring(F.md5(norm_text_col("text")), 1, 8).alias("shard_key"),
    ).orderBy("doc_id")


@register(
    "q66_tfidf",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, word, count(*) AS tf
      FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS word FROM documents)
      GROUP BY doc_id, word
    ),
    df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word, tf.tf, df.df,
             round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
      FROM scored
    )
    SELECT doc_id, word, tf, df, tfidf
    FROM ranked WHERE rn <= 3 AND doc_id < 100
    ORDER BY doc_id, tfidf DESC, word
    """,
    tags=("text", "tfidf", "training-pipeline"),
)
def q66_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with smoothed idf (ln((N+1)/(df+1)) + 1), top-3 terms per
    document.

    Plan: term counts (one shuffle on (doc, word)) → document
    frequencies (shuffle on word, partial-agg'd) → broadcast both the
    1-row corpus count and the df table back onto tf → per-doc top-3
    window. At 100 TB the df table is vocabulary-sized (millions, not
    trillions) — it stays broadcastable; nothing reshuffles the corpus."""
    d = tw(spark, sf_dir, "documents")
    words = words_df(d.select("doc_id", "text"), "text", "word")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # literal, like the oracle's scalar subquery
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0), 4
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "word", "tf", "df", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "word")
    )
