"""Tokenization and text expressions.

The reference tokenizer splits on runs of non-letter characters
(`strings.FieldsFunc(value, unicode.IsLetter-complement)` —
/root/reference/src/main/wc.go:55-57, ii.go:64-66), case-sensitive, and
drops empty tokens. SURVEY.md §5.3 validated that the regex class
``[^\\p{L}]+`` reproduces both golden outputs byte-for-byte on the
Gutenberg corpus.

Both Spark (Java regex) and DuckDB (RE2) support ``\\p{L}``, so the same
pattern string drives implementation and oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Split on runs of non-letters (reference semantics, wc.go:55-57).
TOKEN_SPLIT_RE = r"[^\p{L}]+"


def tokens_col(text: Column | str) -> Column:
    """Array of non-empty letter-run tokens (Spark side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, TOKEN_SPLIT_RE), lambda t: F.length(t) > 0)


def tokens_sql(expr: str) -> str:
    """DuckDB expression producing the same token list."""
    return (
        f"list_filter(string_split_regex({expr}, '[^\\p{{L}}]+'), t -> length(t) > 0)"
    )


def words_df(df: DataFrame, text_col: str = "text", out: str = "word") -> DataFrame:
    """Explode a text column into one row per token.

    The reference's flatMap step (mapF emitting one KeyValue per word,
    wc.go:22-30) as a Catalyst-native generator: stays inside
    whole-stage codegen, no Python in the loop.
    """
    return df.select(
        *df.columns, F.explode(tokens_col(text_col)).alias(out)
    )
