"""Quality-filter semantics: planted contamination/duplication must be
flagged (recall), planted PII must be counted and scrubbed — the same
inject-and-detect strategy as the dedup recall tests. The registered
queries load ``documents.parquet`` from a directory, so each test writes
a tiny synthetic table to tmp_path and runs the REAL catalog query on it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

from .conftest import SF_SMALL

load_all_plans()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, tmp_path, rows):
    full = [(i, txt, "en", "test", len(txt)) for i, txt in rows]
    spark.createDataFrame(full, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


BENCH_TEXT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


def test_decontaminate_flags_eval_overlap(spark, tmp_path):
    # doc 0 is eval (doc_id % 25 == 0); doc 1 copies half of it verbatim
    # (contaminated); doc 2 shares no 5-gram (clean).
    sf = _docs(
        spark,
        tmp_path,
        [
            (0, BENCH_TEXT),
            (1, BENCH_TEXT.split(" sigma")[0] + " unrelated tail words here"),
            (2, "one two three four five six seven eight nine ten eleven"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in REGISTRY["q06_decontaminate"].fn(spark, sf).collect()
    }
    assert 0 not in out  # eval docs are excluded from the train-side report
    assert out[1]["n_contaminated"] > 0 and out[1]["contaminated"]
    assert out[2]["n_contaminated"] == 0 and not out[2]["contaminated"]


def test_repetition_stats_exact_counts(spark, tmp_path):
    # "spam ham " * 4: 8 tokens, 2 distinct, 7 bigrams, and the top
    # bigram ("spam ham" x4) beats "ham spam" x3.
    sf = _docs(
        spark,
        tmp_path,
        [(1, "spam ham spam ham spam ham spam ham"), (2, "ab"), (3, "")],
    )
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["q07_repetition_stats"].fn(spark, sf).collect()
    }
    r = rows[1]
    assert (r["n_tokens"], r["n_distinct"], r["n_bigrams"]) == (8, 2, 7)
    assert r["top_bigram_count"] == 4
    assert r["dup_token_heavy"] and r["top_bigram_heavy"]
    # single-token and empty docs: no bigrams, nothing flagged
    assert rows[2]["n_bigrams"] == 0 and not rows[2]["top_bigram_heavy"]
    assert rows[3]["n_tokens"] == 0 and not rows[3]["dup_token_heavy"]


def test_pii_redact_finds_planted_pii(spark):
    # Every doc gets exactly one derived email/phone/IP; the corpus text
    # itself is letters-only so it cannot add matches.
    df = REGISTRY["q08_pii_redact"].fn(spark, SF_SMALL)
    bad = df.where(
        (F.col("n_emails") != 1) | (F.col("n_ips") != 1) | (F.col("n_phones") != 1)
    ).count()
    assert bad == 0


def test_span_dedup_flags_planted_duplicates(spark, tmp_path):
    shared = "red green blue cyan magenta yellow"  # 6 tokens = 2 spans
    sf = _docs(
        spark,
        tmp_path,
        [
            (1, shared),
            (2, shared),  # every span of doc 2 also in doc 1 -> dropped
            (3, "one two three four five six"),  # unique spans -> kept
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["q09_span_dedup"].fn(spark, sf).collect()
    }
    assert rows[1]["n_shared"] == 2 and not rows[1]["keep"]
    assert rows[2]["n_shared"] == 2 and not rows[2]["keep"]
    assert rows[3]["n_shared"] == 0 and rows[3]["keep"]


def test_fuzzy_decontamination_flags_near_verbatim(spark, tmp_path):
    """q158 recall injection: a train doc that lightly EDITS an eval
    item and one that EMBEDS it verbatim inside extra text must both be
    flagged (LSH candidate + containment >= threshold); unrelated train
    docs must not. Eval membership is the id protocol (doc_id % 25)."""
    from pyspark.sql import functions as F

    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()
    base = [f"tok{chr(97 + i // 4)}{chr(97 + i % 4)}x{i}" for i in range(40)]
    eval_text = " ".join(base)
    # edit the two TRAILING tokens: each changed token kills ~3 word
    # shingles, so edits must stay light/clustered for the shingle
    # Jaccard (what LSH bands see) to stay above the collision knee
    edited = list(base)
    for i in (38, 39):
        edited[i] = f"changed{i}"
    rows = [
        (25, eval_text),                                    # the eval item
        (3, " ".join(edited)),                              # near-verbatim edit
        (8, eval_text + " plus some extra trailing words here"),  # embeds it
        (7, "completely unrelated text about watermarks and shuffle "
            "partitioning strategies for large engines today"),
        (50, "another eval item with its own distinct vocabulary "
             "entirely separate from the first one indeed"),
    ]
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select(
            "doc_id", "text",
            F.lit("en").alias("lang"), F.lit("t").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .write.parquet(str(tmp_path / "documents.parquet"))
    )
    got = {
        r.doc_id: (r.n_flagged_evals, r.max_containment)
        for r in REGISTRY["q158_fuzzy_decontamination"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {3, 8}, got
    assert got[8][1] == 1.0          # verbatim embedding: full containment
    assert got[3][1] >= 0.9          # 38/40 tokens survive the edit


def test_fuzzy_decon_flags_buried_eval(spark, tmp_path):
    """q158's containment blind-spot fix, pinned: an eval item buried
    VERBATIM inside a much longer train document must be flagged.

    Plain whole-document MinHash bands provably miss this pair — the
    test computes them directly and asserts zero collisions (the train
    doc's 384 distinct tokens dilute whole-doc Jaccard to ~0.17, far
    below the band knee). The windowed train banding
    (_decon_train_bands_df) finds it DETERMINISTICALLY: the eval item
    is 64 = DECON_WINDOW tokens placed at offset 5 x DECON_STRIDE, so
    window cid=5 is the eval token sequence exactly — identical
    shingles, identical signature, all bands collide."""
    import itertools

    from pyspark.sql import functions as F

    from mapreduce_mit_spark.plans.dedup import (
        DECON_STRIDE,
        DECON_WINDOW,
        _lsh_bands_df,
    )
    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()
    filler = ["".join(p) for p in itertools.product("abcdef", repeat=4)]
    evaltoks = ["".join(p) for p in itertools.product("uvwxyz", repeat=3)][
        :DECON_WINDOW
    ]
    pre = 5 * DECON_STRIDE
    train_text = " ".join(filler[:pre] + evaltoks + filler[pre : pre + 160])
    rows = [
        (50, " ".join(evaltoks)),            # eval item (50 % 25 == 0)
        (7, train_text),                      # eval buried mid-document
        (8, " ".join(filler[400:700])),       # unrelated long train doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text",
        F.lit("en").alias("lang"), F.lit("t").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))

    # the regime premise: whole-document bands alone do NOT collide
    wb = _lsh_bands_df(df).select("doc_id", "band_idx", "band_key").collect()
    eval_bands = {(r.band_idx, r.band_key) for r in wb if r.doc_id == 50}
    train_bands = {(r.band_idx, r.band_key) for r in wb if r.doc_id == 7}
    assert not (eval_bands & train_bands), (
        "fixture invalid: whole-doc bands collide, buried regime not exercised"
    )

    got = {
        r.doc_id: r
        for r in REGISTRY["q158_fuzzy_decontamination"].fn(spark, str(tmp_path)).collect()
    }
    assert 7 in got, "buried eval item not flagged"
    assert got[7].max_containment == 1.0
    assert 8 not in got


def test_split_leakage_flags_straddling_near_dup(spark, tmp_path):
    """q159 recall injection: two near-identical documents whose ids
    hash into DIFFERENT splits (one train, one holdout) must be flagged
    with the holdout doc identified and jaccard >= 0.8; a same-split
    near-dup pair must NOT appear (that is q148's job, not leakage)."""
    import hashlib

    from pyspark.sql import functions as F

    from mapreduce_mit_spark.plans.dedup import SPLIT_TRAIN_HEX, SPLIT_VAL_HEX
    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()

    def split_of(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:4]
        return "train" if h < SPLIT_TRAIN_HEX else ("val" if h < SPLIT_VAL_HEX else "test")

    train_ids = [i for i in range(1000) if split_of(i) == "train"]
    test_ids = [i for i in range(1000) if split_of(i) == "test"]
    base = " ".join(f"w{chr(97 + i % 26)}q{i}" for i in range(40))
    near = base.rsplit(" ", 1)[0] + " changedtail"
    rows = [
        (train_ids[0], base),          # train member of the leaking pair
        (test_ids[0], near),           # its holdout near-twin → LEAK
        (train_ids[1], "completely unrelated words about stream state "
                       "checkpoints and watermark eviction semantics"),
        # same-split near-dups: must NOT be reported
        (train_ids[2], base.replace("q0", "zz")),
    ]
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .select(
            "doc_id", "text",
            F.lit("en").alias("lang"), F.lit("t").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .write.parquet(str(tmp_path / "documents.parquet"))
    )
    got = REGISTRY["q159_split_leakage"].fn(spark, str(tmp_path)).collect()
    pairs = {(r.holdout_doc_id, r.train_doc_id): (r.holdout_split, r.jaccard) for r in got}
    assert (test_ids[0], train_ids[0]) in pairs, pairs
    sp, j = pairs[(test_ids[0], train_ids[0])]
    assert sp == "test" and j >= 0.8
    # same-split pairs are never reported: every row pairs a TRAIN doc
    # with a HOLDOUT doc (train_ids[2] ≈ base legitimately leaks against
    # the holdout twin too — but never against its train sibling)
    for r in got:
        assert split_of(r.train_doc_id) == "train"
        assert split_of(r.holdout_doc_id) in ("val", "test")
    assert (train_ids[0], train_ids[2]) not in {
        (r.holdout_doc_id, r.train_doc_id) for r in got
    }


def test_unicode_cross_engine_parity(spark, tmp_path):
    """Adversarial-Unicode sweep: the text operators' Spark plans and
    their DuckDB oracles must agree on non-ASCII input — Turkish
    dotted/dotless I (U+0130 is the ONLY codepoint whose lowercase
    expands under full case mapping, and the one real divergence this
    sweep originally caught in norm_text), German ß/case-variant
    umlauts, Greek with a final-sigma context, CJK (no spaces —
    tokenizer must still split on the non-letter runs present),
    combining marks, and Cyrillic. Compares collected Spark rows to
    the registered oracle run directly in DuckDB on the same parquet."""
    import duckdb

    from pyspark.sql import functions as F

    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()
    docs = [
        (0, "Grüße aus Straße STRASSE straße"),
        (1, "İstanbul istanbul ISTANBUL ı I i"),
        (2, "Ωμέγα ωμέγα ΩΜΈΓΑ σίγμα Σίγμας"),
        (3, "日本語のテキスト 中文文本 한국어"),
        (4, "naïve naive café café"),
        (5, "АБВГД абвгд Ёлка ёлка"),
        (7, "Grüße aus Straße STRASSE straße"),   # exact dup of 0
        (8, "مرحبا بالعالم العربية نص"),            # RTL Arabic
        (9, "नमस्ते दुनिया हिन्दी पाठ"),               # Devanagari
        (10, "emoji 😀 mixed 🎉 text 🚀 here"),     # non-letters split
        (11, "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕊𝕥𝕪𝕝𝕖𝕕 math letters"),     # astral-plane letters
        (12, "ʼn ǅungle ǈjubljana mixed ǋew"),      # titlecase digraphs
        (13, "ẛ ẞ ſ long-s and sharp"),
    ]
    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .select(
            "doc_id", "text",
            F.lit("xx").alias("lang"), F.lit("t").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .coalesce(1)
        .write.parquet(str(tmp_path / "documents.parquet"))
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    for q in (
        "q60_wordcount",
        "q80_exact_dedup",
        "q81_minhash_lsh",
        "q62_token_stats",
    ):
        got = sorted(map(tuple, REGISTRY[q].fn(spark, str(tmp_path)).collect()))
        want = sorted(map(tuple, con.sql(REGISTRY[q].oracle).fetchall()))
        assert got == want, f"{q} diverges cross-engine on unicode input"
    # the İ fold specifically: doc 1's normalized hash must be the
    # same in both engines AND treat İstanbul/istanbul as one content
    from mapreduce_mit_spark.functions.hashing import norm_text_col

    n = (
        spark.createDataFrame([("İstanbul",), ("istanbul",)], "text string")
        .select(norm_text_col("text").alias("n"))
        .collect()
    )
    assert n[0].n == n[1].n == "istanbul"


def test_decon_window_banding_gated_by_doc_length(spark):
    """The per-doc length gate on q158's windowed banding: docs with
    <= DECON_WINDOW tokens must emit NO window bands (their one window
    would be byte-identical to the whole-doc chunk — the 3.7x band-row
    premium SCALING.md measured on short-doc corpora), while longer
    docs keep the full window union. Result-invisibility is free: only
    exact-duplicate band rows are skipped."""
    from pyspark.sql import functions as F

    from mapreduce_mit_spark.plans.dedup import (
        DECON_WINDOW,
        _decon_train_bands_df,
        _lsh_bands_df,
    )

    # pure-letter tokens: the tokenizer splits on non-letter runs, so a
    # digit inside a token would silently double the count
    import itertools

    letters = ["".join(p) for p in itertools.product("ghijkm", repeat=3)]
    short_tokens = " ".join(letters[:DECON_WINDOW])
    long_tokens = " ".join(letters[100 : 100 + DECON_WINDOW * 4])
    df = spark.createDataFrame(
        [(1, short_tokens), (2, long_tokens)], "doc_id long, text string"
    ).select("doc_id", "text")

    decon = _decon_train_bands_df(df).collect()
    plain = _lsh_bands_df(df).collect()
    d_short = [r for r in decon if r.doc_id == 1]
    p_short = [r for r in plain if r.doc_id == 1]
    # short doc: EXACTLY the plain banding — same rows, no premium
    assert sorted(map(tuple, d_short)) == sorted(map(tuple, p_short))
    # long doc: windows add band rows beyond plain banding, and every
    # plain band survives in the union (recall monotonicity)
    d_long = {tuple(r) for r in decon if r.doc_id == 2}
    p_long = {tuple(r) for r in plain if r.doc_id == 2}
    assert p_long <= d_long and len(d_long) > len(p_long)
