"""Reference-parity queries in DataFrame form.

These re-express the reference's own test pipelines (SURVEY §5) on the
``documents`` table so the DuckDB oracle can hash-check them; the
byte-exact golden-corpus versions live in tests/test_golden_parity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import tokens_sql, words_df
from ..registry import register
from ._util import t, tw


@register(
    "q95_identity_distinct_sort",
    oracle=f"""
    SELECT DISTINCT unnest({tokens_sql('text')}) AS token
    FROM documents
    ORDER BY token
    """,
    tags=("mapreduce-parity", "distinct-sort"),
)
def q95_identity_distinct_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's unit-test pipeline (test_test.go:26-42): identity
    map + identity reduce ≡ distinct tokens in string sort order."""
    d = t(spark, sf_dir, "documents")
    return (
        words_df(d.select("text"), "text", "token")
        .select("token")
        .distinct()
        .orderBy("token")
    )


@register(
    "q96_wordcount_topk",
    oracle=f"""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest({tokens_sql('text')}) AS word FROM documents)
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 10
    """,
    tags=("mapreduce-parity", "topk"),
)
def q96_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wc golden check shape (test-wc.sh:3 `sort -n -k2 | tail -10`):
    global top-10 words by count — TakeOrderedAndProject, not a full sort."""
    d = t(spark, sf_dir, "documents")
    return (
        words_df(d.select("text"), "text", "word")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(10)
    )
