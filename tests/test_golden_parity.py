"""Golden-output parity with the reference (SURVEY §5.3 / FIXTURES A1).

Reproduces the reference's two end-to-end tests byte-for-byte:
- wc:  `sort -n -k2 mrtmp.wcseq | tail -10 | diff - mr-testout.txt`
  (test-wc.sh:3)
- ii:  `sort -k1,1 | sort -snk2,2 | grep -v '16' | tail -10 | diff -
  mr-challenge.txt` (test-ii.sh:3)

The shell post-processing is emulated exactly: GNU sort's last-resort
whole-line bytewise comparison on key ties, and -s (stable) for the ii
chain's second sort.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mapreduce_mit_spark.functions.textfns import words_df
from mapreduce_mit_spark.sources.io import read_corpus

from .conftest import REF_CORPUS

GOLDEN_WC = os.path.join(REF_CORPUS, "mr-testout.txt")
GOLDEN_II = os.path.join(REF_CORPUS, "mr-challenge.txt")
CORPUS_GLOB = os.path.join(REF_CORPUS, "pg-*.txt")

pytestmark = pytest.mark.skipif(
    not glob.glob(CORPUS_GLOB), reason="reference corpus not available"
)


def _read_golden(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        return f.read().splitlines()


def test_wordcount_golden(spark):
    corpus = read_corpus(spark, CORPUS_GLOB)
    counts = (
        words_df(corpus.select("text"), "text", "word")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    lines = [f"{r['word']}: {r['cnt']}" for r in counts]
    # sort -n -k2: numeric on field 2, last-resort bytewise whole line
    lines.sort(key=lambda l: (int(l.rsplit(": ", 1)[1]), l.encode()))
    assert lines[-10:] == _read_golden(GOLDEN_WC)


def test_inverted_index_golden(spark):
    corpus = read_corpus(spark, CORPUS_GLOB)
    rows = (
        words_df(corpus, "text", "word")
        .groupBy("word")
        .agg(
            F.countDistinct("doc_name").alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("doc_name")), ",").alias("docs"),
        )
        .collect()
    )
    lines = [f"{r['word']}: {r['n_docs']} {r['docs']}" for r in rows]
    # sort -k1,1 (ties → whole-line bytewise), then stable numeric by field 2
    lines.sort(key=lambda l: (l.split(" ", 1)[0].encode(), l.encode()))
    lines.sort(key=lambda l: int(l.split(" ")[1]))  # Python sort is stable (-s)
    lines = [l for l in lines if "16" not in l]  # grep -v '16'
    assert lines[-10:] == _read_golden(GOLDEN_II)


def test_corpus_token_totals(spark):
    """BASELINE.md rows 3-4: 2,935,308 tokens, 65,824 distinct words."""
    corpus = read_corpus(spark, CORPUS_GLOB)
    words = words_df(corpus.select("text"), "text", "word")
    assert words.count() == 2_935_308
    assert words.select("word").distinct().count() == 65_824
