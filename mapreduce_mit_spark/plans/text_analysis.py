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
    "q59_heavy_hitters",
    oracle=f"""
    WITH words AS (
      SELECT unnest({tokens_sql('text')}) AS word FROM documents
    ),
    counts AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM words GROUP BY word),
    total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM words)
    SELECT word, cnt, TRUE AS in_sketch
    FROM counts, total
    WHERE cnt > 0.02 * n
    ORDER BY cnt DESC, word
    """,
    tags=("text", "sketch", "approx", "heavy-hitters"),
)
def q59_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent items (heavy hitters) via Spark's built-in Misra-Gries
    summary (``df.stat.freqItems``), falsifiable-sketch pattern.

    The MG guarantee is one-sided: every item with frequency
    > support·N is IN the summary (false positives possible, false
    negatives not). So the checkable surface is the exact heavy-hitter
    list with an in-band ``in_sketch`` boolean per true hitter — the
    oracle expects uniformly TRUE; any missed hitter breaks the hash.

    Scale shape: the MG summary is a single-pass aggregation with a
    fixed-size (1/support) state per partition and a driver-free merge;
    the exact side is the same word-count shuffle q60 already pays.
    The false-positive side is intentionally NOT surfaced — it is
    sketch-dependent and carries no guarantee."""
    d = t(spark, sf_dir, "documents")
    words = words_df(d.select("text"), "text", "word").select("word")
    sketch = words.stat.freqItems(["word"], support=0.02).select(
        F.col("word_freqItems").alias("sketch_words")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    # total word count derived from the counts aggregate (sum of cnt) —
    # no third pass over the exploded words
    total = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") > 0.02 * F.col("n"))
        .crossJoin(F.broadcast(sketch))
        .select(
            "word",
            "cnt",
            F.array_contains(F.col("sketch_words"), F.col("word")).alias("in_sketch"),
        )
        .orderBy(F.col("cnt").desc(), "word")
    )


@register(
    "q61_inverted_index",
    oracle=f"""
    SELECT word,
           CAST(count(DISTINCT doc_id) AS INTEGER) AS n_docs,
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
        .agg(docs.alias("_docs"))
        # n_docs = |collect_set| — a separate countDistinct would force
        # Catalyst's distinct-expand (an extra aggregation phase) to
        # recompute exactly the set we already built
        .select(
            "word",
            F.size("_docs").alias("n_docs"),
            F.array_join("_docs", ",").alias("doc_list"),
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
           -- empty/punct-only doc -> avg 0.0 (Spark's fold starts at
           -- 0.0; DuckDB's sum over an empty list is NULL, hence the
           -- coalesce); NULL text -> NULL stats in both engines
           CASE WHEN text IS NULL THEN NULL ELSE
             round(coalesce(list_aggregate(list_transform({tokens_sql('text')}, x -> CAST(length(x) AS DOUBLE)), 'sum'), 0.0)
                   / greatest(len({tokens_sql('text')}), 1), 4) END AS avg_token_len
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
    WITH counted AS (
      SELECT doc_id, lang,
             CAST(length(text) AS BIGINT)  AS nc,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS na,
             CAST(len({tokens_sql('text')}) AS BIGINT) AS nt,
             CAST(len(list_filter({tokens_sql('text')},
                       x -> list_contains(['the','and','of','to','a','el','la','de','le','der','die','und'], x)))
                       AS BIGINT) AS ns
      FROM documents
    ),
    -- All ratios rounded HALF_UP at 4 decimals in EXACT integer
    -- arithmetic: floor((2*num*10^4 + den) / (2*den)) / 10^4. Float
    -- round() at a decimal boundary is engine-dependent (Spark expands
    -- the double's decimal digits, DuckDB multiplies by 10^k in float);
    -- integer arithmetic makes both engines compute the identical value.
    exact AS (
      SELECT doc_id, lang, nc, nt,
             (2 * na * 10000 + greatest(nc, 1)) // (2 * greatest(nc, 1)) AS alpha4,
             (2 * ns * 10000 + greatest(nt, 1)) // (2 * greatest(nt, 1)) AS stop4,
             -- quality = 0.5*alpha + 0.3*stop + 0.2*least(nt/100, 1)
             -- = num/den with num, den integers (den = 10*nc*nt*100)
             (2 * (5 * na * greatest(nt, 1) * 100
                   + 3 * ns * greatest(nc, 1) * 100
                   + 2 * least(nt, 100) * greatest(nc, 1) * greatest(nt, 1)) * 10000
              + 10 * greatest(nc, 1) * greatest(nt, 1) * 100)
             // (2 * 10 * greatest(nc, 1) * greatest(nt, 1) * 100) AS quality4
      FROM counted
    )
    SELECT doc_id, lang, nc AS n_chars_actual, nt AS n_tokens,
           alpha4 / 10000.0   AS alpha_ratio,
           stop4 / 10000.0    AS stopword_ratio,
           quality4 / 10000.0 AS quality
    FROM exact
    ORDER BY doc_id
    """,
    tags=("text", "quality"),
)
def q63_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality score: alphabetic ratio, stopword
    ratio, and a length term — the standard cheap pre-filter stage of a
    training-data pipeline (runs fully codegen'd at scan speed).

    Float discipline: every surfaced ratio is rounded in EXACT integer
    arithmetic (floor((2*num*10^4 + den)/(2*den)) / 10^4 ≡ HALF_UP) —
    the raw ratios are rationals whose rounded value can sit exactly on
    a decimal boundary (e.g. 63/128), where Spark's and DuckDB's float
    round() legitimately disagree."""
    d = t(spark, sf_dir, "documents")
    toks = tokens_col("text")
    sw = F.array(*[F.lit(w) for w in
                   ("the", "and", "of", "to", "a", "el", "la", "de", "le", "der", "die", "und")])
    nc = F.length("text").cast("long")
    na = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("long")
    nt = F.size(toks).cast("long")
    ns = F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast("long")
    counted = d.select(
        "doc_id", "lang", nc.alias("nc"), na.alias("na"), nt.alias("nt"), ns.alias("ns")
    )
    gnc = F.greatest(F.col("nc"), F.lit(1))
    gnt = F.greatest(F.col("nt"), F.lit(1))

    def half_up4(num, den):
        # floor((2*num*10^4 + den) / (2*den)) — HALF_UP at 4 decimals,
        # all-integer (Spark `div` is integer division on longs)
        return F.expr("(2 * (" + num + ") * 10000 + (" + den + ")) div (2 * (" + den + "))")

    qnum = (
        "5 * na * greatest(nt, 1L) * 100 + 3 * ns * greatest(nc, 1L) * 100"
        " + 2 * least(nt, 100L) * greatest(nc, 1L) * greatest(nt, 1L)"
    )
    qden = "10 * greatest(nc, 1L) * greatest(nt, 1L) * 100"
    exact = counted.select(
        "doc_id", "lang",
        F.col("nc").alias("n_chars_actual"),
        F.col("nt").alias("n_tokens"),
        half_up4("na", "greatest(nc, 1L)").alias("alpha4"),
        half_up4("ns", "greatest(nt, 1L)").alias("stop4"),
        half_up4(qnum, qden).alias("quality4"),
    )
    return exact.select(
        "doc_id", "lang", "n_chars_actual", "n_tokens",
        (F.col("alpha4") / 10000.0).alias("alpha_ratio"),
        (F.col("stop4") / 10000.0).alias("stopword_ratio"),
        (F.col("quality4") / 10000.0).alias("quality"),
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
           -- coalesce: DuckDB's array_to_string over an EMPTY list is
           -- NULL, Spark's array_join is '' — a token-less doc hashes
           -- the empty bag in both engines; NULL text stays NULL
           CASE WHEN text IS NULL THEN NULL
                ELSE md5(coalesce(array_to_string(list_sort(list_distinct({tokens_sql('text')})), ','), '')) END AS bow_hash,
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
    # Corpus size as a broadcast 1-row aggregate (the oracle's scalar
    # subquery) — NOT a driver-side d.count(), which would run an extra
    # full table pass at plan-build time.
    n = d.agg(F.count(F.lit(1)).alias("_n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
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


@register(
    "q67_bitmap_distinct",
    oracle=f"""
    SELECT word, count(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS word FROM documents)
    GROUP BY word
    ORDER BY n_docs DESC, word
    LIMIT 20
    """,
    tags=("text", "bitmap", "distinct"),
)
def q67_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-doc count per word via BLOCKED BITMAPS (roaring-bitmap
    pattern): doc_id maps to (block = doc_id div 64, bit = doc_id mod
    64); ``bit_or`` of the one-bit masks per (word, block) absorbs
    duplicate occurrences map-side with a fixed-width 8-byte state, and
    ``sum(bit_count(mask))`` over blocks yields the exact distinct
    count.

    This is the scale path for set-cardinality aggregation: the
    shuffle carries one long per (word, block) instead of expanding
    per-document rows the way ``count(DISTINCT)`` does (Spark's
    distinct agg rewrites to a two-phase expand whose first shuffle is
    proportional to the number of DISTINCT PAIRS). The oracle states
    the semantics (plain count DISTINCT); the plan is the mechanics."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("word"))
    masks = toks.select(
        "word",
        # all-integer floor division — double division then truncation
        # misassigns blocks for doc_id beyond 2^53, and `div` truncates
        # toward zero so negative ids would alias into block 0; with
        # pmod the (block, bit) pair is unique for every 64-bit doc_id
        F.expr("(doc_id - pmod(doc_id, 64)) div 64").alias("block"),
        F.expr("shiftleft(1L, CAST(pmod(doc_id, 64) AS INT))").alias("mask"),
    )
    return (
        masks.groupBy("word", "block")
        .agg(F.bit_or("mask").alias("mask"))
        .groupBy("word")
        .agg(F.sum(F.bit_count("mask")).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "word")
        .limit(20)
    )


# Count-min sketch geometry: d rows × w buckets. 4×256 = 1024 counters —
# small enough to broadcast, large enough that bucket collisions are rare
# but OBSERVABLE on the test vocabulary (the interesting case).
CMS_D = 4
CMS_W = 256


@register(
    "q04_countmin",
    oracle=f"""
    WITH words AS (
      SELECT unnest({tokens_sql('text')}) AS word FROM documents
    ),
    total AS (SELECT CAST(count(*) AS BIGINT) AS n FROM words),
    ds AS (SELECT * FROM (VALUES (0),(1),(2),(3)) v(d)),
    cells AS (
      SELECT d,
             ('0x' || substr(md5('s' || d || ':' || word), 1, 8))::BIGINT
               % {CMS_W} AS bucket
      FROM words, ds
    ),
    sketch AS (
      SELECT d, bucket, CAST(count(*) AS BIGINT) AS c
      FROM cells GROUP BY d, bucket
    ),
    truth AS (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM words GROUP BY word
    ),
    probes AS (
      SELECT word, cnt, d,
             ('0x' || substr(md5('s' || d || ':' || word), 1, 8))::BIGINT
               % {CMS_W} AS bucket
      FROM truth, ds
    ),
    est AS (
      SELECT word, min(cnt) AS cnt, min(c) AS est
      FROM probes JOIN sketch USING (d, bucket)
      GROUP BY word
    )
    SELECT word, cnt, est,
           (est >= cnt) AS never_underestimates,
           ((est - cnt) * {CMS_W} <= 3 * n) AS within_bound
    FROM est, total
    ORDER BY cnt DESC, word
    """,
    tags=("text", "sketch", "approx", "countmin"),
)
def q04_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus word stream, probed against
    exact counts (the falsifiable-sketch pattern of q16/q59/q69).

    Build: each word updates one counter per hash row — exploding d
    (row, bucket) pairs then aggregating collapses MAP-SIDE to at most
    d×w = 1024 cells per partition, so the shuffle moves sketch cells,
    never the word stream. Probe: the finished sketch broadcasts and
    est(word) = min over rows of its cell. In-band oracle-checked
    guarantees: est ≥ true count ALWAYS (CMS is one-sided), and the
    ε·N bound (ε = 3/w here, deterministic seeds) holds for every word.
    At 100 TB the exact-count side exists only for this verification;
    production probes skip it."""
    d = tw(spark, sf_dir, "documents")
    words = words_df(d.select("text"), "text", "word").select("word")

    def bucket(seed: int) -> Column:
        h = F.md5(F.concat(F.lit(f"s{seed}:"), F.col("word")))
        return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_W).alias(
            f"b{seed}"
        )

    cells = words.select(
        F.posexplode(F.array(*[bucket(s) for s in range(CMS_D)])).alias("d", "bucket")
    )
    sketch = cells.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))
    truth = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    probes = truth.select(
        "word",
        "cnt",
        F.posexplode(F.array(*[bucket(s) for s in range(CMS_D)])).alias("d", "bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("word")
        .agg(F.min("cnt").alias("cnt"), F.min("c").alias("est"))
    )
    n = words.agg(F.count(F.lit(1)).alias("n"))
    return (
        est.crossJoin(F.broadcast(n))
        .select(
            "word",
            "cnt",
            "est",
            (F.col("est") >= F.col("cnt")).alias("never_underestimates"),
            ((F.col("est") - F.col("cnt")) * CMS_W <= 3 * F.col("n")).alias(
                "within_bound"
            ),
        )
        .orderBy(F.col("cnt").desc(), "word")
    )
