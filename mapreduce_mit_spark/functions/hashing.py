"""Hashing helpers with cross-engine (Spark ⇄ DuckDB) parity.

Dedup/fingerprint operators need hash functions that produce IDENTICAL
values in the Spark implementation and the DuckDB oracle. Spark's
``xxhash64``/``hash`` and DuckDB's ``hash`` are different algorithms, so
every oracle-checked hash in this engine is built from ``md5`` (bit-exact
in both) — md5 of the same UTF-8 string is the same 32-char hex in both
engines. MinHash "permutations" are md5 with a seed prefix; taking the
lexicographic MIN of hex digests is a valid uniform min-hash.

(At 100 TB one would switch to xxhash64 for speed — the operators take
the hash expression as a parameter, md5 is just the parity-checkable
default.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text_col(text: Column | str) -> Column:
    """Normalized text for exact-dup hashing: lowercase, collapse
    whitespace, trim (Spark side).

    U+0130 (İ, capital I with dot above) is pre-folded to plain 'i'
    BEFORE lowercasing: it is the only codepoint whose lowercase
    EXPANDS under Unicode full case mapping (İ → U+0069 U+0307 in the
    JVM/ICU), while DuckDB's lower() applies the simple mapping
    (İ → i) — the one divergence an adversarial-Unicode sweep found
    between the two engines' lower(). Folding it identically on both
    sides keeps the exact-dedup key engine-independent (and matches
    the case-insensitivity intent: İstanbul ≡ istanbul)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, "İ", "i")
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def norm_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`norm_text_col`."""
    return f"trim(regexp_replace(lower(replace({expr}, 'İ', 'i')), '\\s+', ' ', 'g'))"


def seeded_md5_col(value: Column, seed: int) -> Column:
    return F.md5(F.concat(F.lit(f"s{seed}:"), value))


def seeded_md5_sql(expr: str, seed: int) -> str:
    return f"md5(concat('s{seed}:', {expr}))"


def minhash_cols(tokens: Column, n_hashes: int) -> list[Column]:
    """MinHash signature over an array<string> of shingles (Spark side).

    min over the array of seeded md5 hex digests; one Column per hash.
    ``array_min`` on strings is lexicographic min — identical to
    DuckDB's ``list_min`` on VARCHAR.

    NB: the per-seed lambda must take exactly ONE parameter —
    ``F.transform`` passes the element index to a second parameter
    (even a defaulted one), which would silently corrupt the seed.
    """

    def hasher(seed: int):
        return lambda t: seeded_md5_col(t, seed)

    return [
        F.array_min(F.transform(tokens, hasher(seed))).alias(f"mh{seed}")
        for seed in range(n_hashes)
    ]


def minhash_sql_exprs(tokens_expr: str, n_hashes: int) -> list[str]:
    """DuckDB twin of :func:`minhash_cols` (list of SQL select-exprs)."""
    return [
        f"list_min(list_transform({tokens_expr}, t -> {seeded_md5_sql('t', seed)})) AS mh{seed}"
        for seed in range(n_hashes)
    ]
