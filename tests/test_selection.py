"""Semantics tests for the selection/tokenizer-prep pack (q190-q193).

What the DuckDB oracles can't pin down, these do:
- DSIR weights actually SELECT the target: the mean weight of
  target-language documents exceeds the rest (the paper's premise,
  checked on the real fixture);
- q191's two-level shard refinement is EXACT against the brute-force
  single-window rank it replaces;
- q192's pair counts equal an independent pure-Python first BPE
  iteration over the same word-frequency table;
- q193's selected set equals a pure-Python Efraimidis-Spirakis
  max-of-w-hashes recompute, and higher weights are selected at a
  higher rate (weight-proportionality, directionally).
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_mit_spark.plans import selection as sel
from mapreduce_mit_spark.registry import REGISTRY, load_all_plans
from mapreduce_mit_spark.sources.io import load_table

from .conftest import SF_SMALL


def _tokens_py(text: str) -> list[str]:
    """The reference tokenizer in pure Python: split on runs of
    non-letters. ``[\\W\\d_]`` = not-word ∪ digit ∪ underscore =
    exactly the non-letter class under re.UNICODE."""
    return [t for t in re.split(r"[\W\d_]+", text, flags=re.UNICODE) if t]


def test_dsir_weights_prefer_target_language(spark):
    """The selection property: documents drawn from the target
    distribution (lang = 'en') must average a HIGHER importance weight
    than the rest — otherwise the llr table is inverted or the
    smoothing swamped the signal."""
    load_all_plans()
    rows = REGISTRY["q190_dsir_importance"].fn(spark, SF_SMALL).collect()
    en = [r.weight for r in rows if r.lang == sel.DSIR_TARGET_LANG and r.weight is not None]
    rest = [r.weight for r in rows if r.lang != sel.DSIR_TARGET_LANG and r.weight is not None]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)
    # and the sign gate tracks it: target docs select at a higher rate
    en_sel = sum(1 for r in rows if r.lang == sel.DSIR_TARGET_LANG and r.selected)
    rest_sel = sum(1 for r in rows if r.lang != sel.DSIR_TARGET_LANG and r.selected)
    assert en_sel / max(len(en), 1) > rest_sel / max(len(rest), 1)


def test_dsir_select_two_level_equals_brute_force(spark):
    """q191's shard-refined top-K must equal the single-window rank:
    the refinement is an optimization, never an approximation."""
    load_all_plans()
    got = [
        (r.lang, r.sel_rank, r.doc_id)
        for r in REGISTRY["q191_dsir_select"].fn(spark, SF_SMALL).collect()
    ]
    scored = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "lang")
        .join(sel._dsir_weights(spark, SF_SMALL), "doc_id")
        .where(F.col("weight").isNotNull())
    )
    w = Window.partitionBy("lang").orderBy(F.col("weight").desc(), F.col("doc_id"))
    want = [
        (r.lang, r.sel_rank, r.doc_id)
        for r in scored.withColumn("sel_rank", F.row_number().over(w))
        .where(F.col("sel_rank") <= sel.Q191_K)
        .orderBy("lang", "sel_rank")
        .collect()
    ]
    assert got == want and len(got) > 0


def test_bpe_pair_counts_match_python(spark):
    """q192 == an independent pure-Python first BPE iteration: build
    the word-frequency table, count adjacent character pairs weighted
    by word frequency, compare the full aggregate (not just top-20)."""
    load_all_plans()
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    wf: dict[str, int] = {}
    for r in docs:
        for tok in _tokens_py(r.text):
            wf[tok] = wf.get(tok, 0) + 1
    pairs: dict[str, list] = {}
    for word, c in wf.items():
        if len(word) < 2:
            continue
        for i in range(len(word) - 1):
            p = word[i : i + 2]
            ent = pairs.setdefault(p, [0, set()])
            ent[0] += c
            ent[1].add(word)
    got = {
        r.pair: (r.n_occurrences, r.n_words)
        for r in REGISTRY["q192_bpe_pair_merge"].fn(spark, SF_SMALL).collect()
    }
    want_full = {p: (n, len(ws)) for p, (n, ws) in pairs.items()}
    top = sorted(want_full.items(), key=lambda kv: (-kv[1][0], kv[0]))[: sel.Q192_TOP]
    assert got == dict(top)


def test_weighted_sample_matches_python_es(spark):
    """q193's selected set == a pure-Python recompute of the exact
    max-of-w-md5 priorities, and weight proportionality holds: the
    heaviest weight class is overrepresented relative to its share of
    the population."""
    load_all_plans()
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    pri = {}
    wts = {}
    for r in docs:
        w = 1 + min(r.n_chars // sel.Q193_W_DIV, sel.Q193_W_CAP)
        wts[r.doc_id] = w
        pri[r.doc_id] = max(
            hashlib.md5(f"samp1:{r.doc_id}:{i}".encode()).hexdigest()
            for i in range(w)
        )
    want = set(
        sorted(pri, key=lambda d: (pri[d], -d), reverse=True)[: sel.Q193_K]
    )
    rows = REGISTRY["q193_weighted_sample"].fn(spark, SF_SMALL).collect()
    got = {r.doc_id for r in rows}
    assert got == want
    # proportionality: selection rate of the top weight class beats the
    # bottom class (E-S guarantees inclusion prob monotone in weight)
    pop = {}
    selc = {}
    for d, w in wts.items():
        pop[w] = pop.get(w, 0) + 1
        if d in got:
            selc[w] = selc.get(w, 0) + 1
    lo, hi = min(pop), max(pop)
    assert hi > lo, "fixture should span several weight classes"
    assert selc.get(hi, 0) / pop[hi] > selc.get(lo, 0) / pop[lo]


def test_dsir_lm_family_attach_poisoned_fit(spark, tmp_path):
    """The twelfth family honors the lifecycle: save, attach in the
    same session with the fit core poisoned, serve q190 — identical
    rows, zero refit."""
    load_all_plans()
    out = str(tmp_path / "dsir_lm")
    sel.dsir_lm_save(spark, SF_SMALL, out)
    baseline = sorted(
        map(tuple, REGISTRY["q190_dsir_importance"].fn(spark, SF_SMALL).collect())
    )
    from mapreduce_mit_spark.plans._util import _session_cache, source_fingerprint
    import os

    key = ("dsir_lm",) + source_fingerprint(
        os.path.join(SF_SMALL, "documents.parquet")
    )
    cache = _session_cache(spark)
    prev = cache.pop(key, None)
    orig = sel._dsir_count_tables
    try:
        sel.dsir_lm_attach(spark, SF_SMALL, out)

        def _poisoned(*a, **kw):
            raise AssertionError("dsir_lm refit after attach")

        sel._dsir_count_tables = _poisoned
        served = sorted(
            map(tuple, REGISTRY["q190_dsir_importance"].fn(spark, SF_SMALL).collect())
        )
        assert served == baseline
    finally:
        sel._dsir_count_tables = orig
        if prev is not None:
            cache[key] = prev


def _py_bpe_train(wf: dict, n_merges: int):
    """Reference BPE trainer (Sennrich et al. 2016 semantics): count
    adjacent pairs weighted by word freq, take (count desc, pair asc)
    argmax, merge left-to-right non-overlapping, repeat."""
    syms = {w: list(w) for w in wf if len(w) >= 2}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, ss in syms.items():
            c = wf[w]
            for i in range(len(ss) - 1):
                p = (ss[i], ss[i + 1])
                counts[p] = counts.get(p, 0) + c
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((f"{l} {r}", l + r, n))
        for w, ss in syms.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    return merges, syms


def test_bpe_train_matches_python_reference(spark):
    """q196's full iterative loop — including the two-pass replace
    merge-application identity — equals a TRUE-GREEDY pure-Python BPE
    trainer on the real corpus, merge for merge; and q197's post-merge
    vocabulary equals the Python symbolization's weighted symbol
    counts. This holds because the fixture has no l == r chains of
    length >= 5, where the two-pass replace documentedly diverges from
    greedy (see _merge_apply_expr; the divergent regime is pinned
    against the two-pass mirror in
    test_bpe_self_overlap_chain_matches_oracle)."""
    load_all_plans()
    docs = load_table(spark, SF_SMALL, "documents").select("text").collect()
    wf: dict = {}
    for r in docs:
        for tok in _tokens_py(r.text):
            wf[tok] = wf.get(tok, 0) + 1
    merges, syms = _py_bpe_train(wf, sel.BPE_MERGES)

    got = [
        (r.merge_rank, r.pair, r.merged, r.n)
        for r in REGISTRY["q196_bpe_train"].fn(spark, SF_SMALL).collect()
    ]
    want = [(i, p, m, n) for i, (p, m, n) in enumerate(merges)]
    assert got == want

    # q197: apply the python merges to ALL words (len-1 included)
    vocab: dict = {}
    for w, c in wf.items():
        ss = syms.get(w, list(w))
        for s in ss:
            vocab[s] = vocab.get(s, 0) + c
    top = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[: sel.Q197_TOP]
    got_v = [
        (r.symbol, r.n)
        for r in REGISTRY["q197_bpe_vocab"].fn(spark, SF_SMALL).collect()
    ]
    assert got_v == top


def test_bpe_merges_family_attach_poisoned_fit(spark, tmp_path):
    """The thirteenth family's lifecycle: save, attach with the fit
    core poisoned, serve q197 — identical rows, zero refit; a doctored
    n_merges stamp refuses."""
    import json
    import os

    load_all_plans()
    out = str(tmp_path / "bpe_merges")
    sel.bpe_merges_save(spark, SF_SMALL, out)
    baseline = sorted(
        map(tuple, REGISTRY["q197_bpe_vocab"].fn(spark, SF_SMALL).collect())
    )
    from mapreduce_mit_spark.plans._util import _session_cache, source_fingerprint

    key = ("bpe_merges",) + source_fingerprint(
        os.path.join(SF_SMALL, "documents.parquet")
    )
    cache = _session_cache(spark)
    prev = cache.pop(key, None)
    orig = sel._bpe_merges_fit
    try:
        sel.bpe_merges_attach(spark, SF_SMALL, out)

        def _poisoned(*a, **kw):
            raise AssertionError("bpe_merges refit after attach")

        sel._bpe_merges_fit = _poisoned
        served = sorted(
            map(tuple, REGISTRY["q197_bpe_vocab"].fn(spark, SF_SMALL).collect())
        )
        assert served == baseline
    finally:
        sel._bpe_merges_fit = orig
        if prev is not None:
            cache[key] = prev
        else:
            cache.pop(key, None)
    meta_path = os.path.join(out, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    doctored = dict(meta, params={"n_merges": sel.BPE_MERGES + 1})
    with open(meta_path, "w") as f:
        json.dump(doctored, f)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="params"):
        sel.bpe_merges_attach(spark, SF_SMALL, out)


def test_dsir_drift_tv_matches_python(spark):
    """q199's total-variation statistic == a pure-Python recompute
    over the same md5 carve and md5 buckets (the alarm must be a real
    number, not plan luck)."""
    load_all_plans()
    rows = REGISTRY["q199_dsir_lm_drift"].fn(spark, SF_SMALL).collect()
    assert rows and len({r.tv_global for r in rows}) == 1
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text"
    ).collect()
    s_c: dict = {}
    i_c: dict = {}
    for r in docs:
        incr = (
            hashlib.md5(f"sel1:{r.doc_id}".encode()).hexdigest()[:4]
            >= sel.Q199_INCR_HEX
        )
        for tok in _tokens_py(r.text):
            b = hashlib.md5(tok.encode()).hexdigest()[:2]
            s_c[b] = s_c.get(b, 0) + 1
            if incr:
                i_c[b] = i_c.get(b, 0) + 1
    ts = sum(s_c.values())
    ti = sum(i_c.values())
    B = sel.DSIR_BUCKETS
    tv = (
        sum(
            abs(
                (i_c.get(b, 0) + 1.0) / (ti + B)
                - (s_c[b] + 1.0) / (ts + B)
            )
            for b in s_c
        )
        / 2
    )
    assert abs(rows[0].tv_global - round(tv, 4)) < 1e-9


def test_tokenizer_drift_coverage_sane(spark):
    """q200's invariants: coverage ratios live in (0, 1], per-merge
    shares are positive on the standing side (the merges were chosen
    BECAUSE they fire there), and the arrival window — drawn from the
    same synthetic distribution — must not trip the retrain alarm."""
    load_all_plans()
    rows = REGISTRY["q200_tokenizer_drift"].fn(spark, SF_SMALL).collect()
    assert len(rows) == sel.BPE_MERGES
    for r in rows:
        assert 0 < r.cov_standing <= 1 and 0 < r.cov_incr <= 1
        assert r.n_standing > 0 and r.share_standing > 0
    assert not rows[0].retrain_recommended
    assert abs(rows[0].cov_drop) < sel.Q200_COV_TAU


def _py_twopass_train(wf: dict, n_merges: int):
    """Pure-Python mirror of the engine's (and oracle's) two-pass
    padded-replace merge application — Python str.replace has the same
    non-overlapping left-to-right scan as SQL replace, so this IS the
    documented semantics, including the l == r chain divergence."""
    syms = {w: " ".join(w) for w in wf if len(w) >= 2}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, s in syms.items():
            parts = s.split(" ")
            for i in range(len(parts) - 1):
                p = parts[i] + " " + parts[i + 1]
                counts[p] = counts.get(p, 0) + wf[w]
        pair, n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = pair.replace(" ", "")
        merges.append((pair, merged, n))
        pat, rep = f" {pair} ", f" {merged} "
        syms = {
            w: (" " + s + " ").replace(pat, rep).replace(pat, rep).strip()
            for w, s in syms.items()
        }
    return merges, syms


def test_bpe_self_overlap_chain_matches_oracle(spark):
    """The two ADVICE-flagged BPE edge cases, pinned on a synthetic
    vocabulary the sf fixtures happen to lack:

    1. SINGLE-SYMBOL COLLAPSE (the crash): 'he' collapses to one
       symbol after the merge 'h e'; the next round's pair count must
       skip it, not index off the array (INVALID_ARRAY_INDEX under
       ANSI) or emit NULL pairs into the argmax.
    2. SELF-OVERLAPPING PAIR (l == r): a run of 5 'a' merges to
       'aa a aa' under the two-pass replace — NOT greedy's 'aa aa a' —
       and a run of 6 gets 2 merges vs greedy's 3. Engine, oracle, and
       this Python mirror share the semantics exactly.
    """
    load_all_plans()
    wf = {
        "aaaaa": 10,   # 'a a' x4 -> 40
        "aaaaaa": 5,   # 'a a' x5 -> 25 (total 65: merge 1 = 'a a')
        "he": 30,      # 'h e' -> 30
        "hehe": 2,     # 'h e' x2 -> +4 (total 34: merge 2 = 'h e')
        "hello": 7,
        "yellow": 4,
        "banana": 6,
        "bananas": 3,
    }
    wf_df = spark.createDataFrame(
        [(w, c) for w, c in wf.items()], "word string, wfreq long"
    )
    got = [
        (r.pair, r.merged, r.n)
        for r in sel._bpe_train_merges(wf_df).orderBy("merge_rank").collect()
    ]
    want, _ = _py_twopass_train(wf, sel.BPE_MERGES)
    assert got == want
    assert want[0][0] == "a a" and want[1][0] == "h e"
    # the documented divergence, stated positively, after merge 1:
    # two-pass gives 'aa a aa' / 'aa a aa a' (greedy: 'aa aa a' /
    # 'aa aa aa' — one MORE merge on the run of 6)
    _, syms1 = _py_twopass_train(wf, 1)
    assert syms1["aaaaa"] == "aa a aa"
    assert syms1["aaaaaa"] == "aa a aa a"
    # after merge 2 ('h e'): 'he' collapsed to ONE symbol — the row
    # the unfiltered pair count crashed on — and rounds 3..6 above
    # completed with it in the table (got == want covers them)
    _, syms2 = _py_twopass_train(wf, 2)
    assert syms2["he"] == "he"


def test_dsir_refresh_lifecycle(spark, tmp_path):
    """q208's contract beyond the shared oracle: the refreshed LM
    artifact attaches through the gate and serves q190 with the fit
    core POISONED (zero refit — the artifact is what serves), a
    doctored immutable param refuses, and a later q190 is untouched."""
    import json
    import os

    from mapreduce_mit_spark.plans._util import _session_cache, source_fingerprint

    load_all_plans()
    baseline = sorted(
        map(tuple, REGISTRY["q190_dsir_importance"].fn(spark, SF_SMALL).collect())
    )
    out = str(tmp_path / "dsir_refreshed")
    sel.dsir_lm_refresh(spark, SF_SMALL, out)

    key = ("dsir_lm",) + source_fingerprint(
        os.path.join(SF_SMALL, "documents.parquet")
    )
    cache = _session_cache(spark)
    prev = cache.pop(key, None)
    orig = sel._dsir_count_tables
    try:
        sel.dsir_lm_attach(spark, SF_SMALL, out)

        def _poisoned(*a, **kw):
            raise AssertionError("dsir_lm refit after refresh-attach")

        sel._dsir_count_tables = _poisoned
        served = sorted(
            map(tuple, REGISTRY["q190_dsir_importance"].fn(spark, SF_SMALL).collect())
        )
        assert served == baseline
    finally:
        sel._dsir_count_tables = orig
        if prev is not None:
            cache[key] = prev
        else:
            cache.pop(key, None)

    # q208 end to end restores the cache: q190 afterwards is untouched
    q208 = sorted(
        map(tuple, REGISTRY["q208_dsir_refresh_serve"].fn(spark, SF_SMALL).collect())
    )
    assert q208 == baseline
    after = sorted(
        map(tuple, REGISTRY["q190_dsir_importance"].fn(spark, SF_SMALL).collect())
    )
    assert after == baseline

    # the gate refuses a doctored immutable param
    meta_path = os.path.join(out, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    doctored = dict(meta, params=dict(meta["params"], target_lang="xx"))
    with open(meta_path, "w") as f:
        json.dump(doctored, f)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="params"):
        sel.dsir_lm_attach(spark, SF_SMALL, out)


def test_bpe_refresh_lifecycle(spark, tmp_path):
    """q209's contract beyond the shared oracle: the refreshed merge
    table attaches and serves q197 with the family fit core POISONED,
    q209 end to end equals q197 and restores the cache, and a doctored
    n_merges stamp refuses."""
    import json
    import os

    from mapreduce_mit_spark.plans._util import _session_cache, source_fingerprint

    load_all_plans()
    baseline = sorted(
        map(tuple, REGISTRY["q197_bpe_vocab"].fn(spark, SF_SMALL).collect())
    )
    out = str(tmp_path / "bpe_refreshed")
    sel.bpe_merges_refresh(spark, SF_SMALL, out)

    key = ("bpe_merges",) + source_fingerprint(
        os.path.join(SF_SMALL, "documents.parquet")
    )
    cache = _session_cache(spark)
    prev = cache.pop(key, None)
    orig = sel._bpe_merges_fit
    try:
        sel.bpe_merges_attach(spark, SF_SMALL, out)

        def _poisoned(*a, **kw):
            raise AssertionError("bpe_merges refit after refresh-attach")

        sel._bpe_merges_fit = _poisoned
        served = sorted(
            map(tuple, REGISTRY["q197_bpe_vocab"].fn(spark, SF_SMALL).collect())
        )
        assert served == baseline
    finally:
        sel._bpe_merges_fit = orig
        if prev is not None:
            cache[key] = prev
        else:
            cache.pop(key, None)

    q209 = sorted(
        map(tuple, REGISTRY["q209_bpe_refresh_serve"].fn(spark, SF_SMALL).collect())
    )
    assert q209 == baseline
    after = sorted(
        map(tuple, REGISTRY["q197_bpe_vocab"].fn(spark, SF_SMALL).collect())
    )
    assert after == baseline

    meta_path = os.path.join(out, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    doctored = dict(meta, params={"n_merges": 99})
    with open(meta_path, "w") as f:
        json.dump(doctored, f)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="params"):
        sel.bpe_merges_attach(spark, SF_SMALL, out)


def test_bpe_scan_tokenizer_equals_composed(spark):
    """The linear-scan tokenizer (bpe_apply_scan — the production path
    at 32k merges) must symbolize the real corpus IDENTICALLY to the
    composed replace-chain expression q197 serves with, word for word,
    on the fitted merge table."""
    load_all_plans()
    rows = sorted(
        (r.merge_rank, r.pair, r.merged)
        for r in sel.bpe_merges_for(spark, SF_SMALL).collect()
    )
    wf = sel._bpe_word_freq(spark, SF_SMALL)
    expr = sel._SYM0_SPARK
    for _rank, pair, merged in rows:
        expr = sel._merge_apply_expr(expr, f"'{pair}'", f"'{merged}'")
    composed = sorted(
        map(tuple, wf.select(F.expr(expr).alias("s"), "wfreq").collect())
    )
    scan = sorted(
        map(
            tuple,
            wf.select(
                sel.bpe_apply_scan(F.expr(sel._SYM0_SPARK), rows).alias("s"),
                "wfreq",
            ).collect(),
        )
    )
    assert scan == composed and composed


def test_bpe_tokenizer_paths_at_production_merge_counts(spark):
    """The bounded-N pin of the production-merge-count claim, with the
    MEASURED boundary: the composed replace-chain plans and executes
    at 40 synthetic merges (matching the pure-Python two-pass mirror
    exactly) but the SQL PARSER, not codegen, is its limit — roughly
    80-90 nested replaces stack-overflow ANTLR, the exact depth
    varying with the driver thread's free stack — so the linear-scan
    pandas UDF (bpe_apply_scan) is the production path, pinned here
    at 300 merges against the same mirror. Synthetic rank-ordered merges over
    a 12-letter alphabet exercise chained and self-overlapping
    applications alike."""

    def mk_merges(n):
        return [
            (i, p, p.replace(" ", ""))
            for i, p in (
                (i, f"{chr(97 + i % 12)} {chr(97 + (i * 7 + 3) % 12)}")
                for i in range(n)
            )
        ]

    words = ["abcabc", "aaaaaa", "hellohello", "dkjadcba", "llljjj"]
    df = spark.createDataFrame([(w,) for w in words], "word string")

    def py_apply(word, merges):
        s = " ".join(word)
        for _r, pair, merged in merges:
            pat, rep = f" {pair} ", f" {merged} "
            s = (" " + s + " ").replace(pat, rep).replace(pat, rep).strip()
        return s

    # composed path safely inside the parser limit (~80-90 nested
    # replaces on a default JVM stack — the docstrings cite this)
    merges40 = mk_merges(40)
    want40 = {w: py_apply(w, merges40) for w in words}
    expr = sel._SYM0_SPARK
    for _rank, pair, merged in merges40:
        expr = sel._merge_apply_expr(expr, f"'{pair}'", f"'{merged}'")
    got = {r.word: r.s for r in df.select("word", F.expr(expr).alias("s")).collect()}
    assert got == want40

    # scan path at production-ish merge count
    merges300 = mk_merges(300)
    want300 = {w: py_apply(w, merges300) for w in words}
    got_scan = {
        r.word: r.s
        for r in df.select(
            "word",
            sel.bpe_apply_scan(F.expr(sel._SYM0_SPARK), merges300).alias("s"),
        ).collect()
    }
    assert got_scan == want300


def test_bpe_training_survives_corpus_exhaustion(spark, tmp_path):
    """Cross-engine edge (the q204 NULL-guard class): a corpus whose
    vocabulary runs out of adjacent pairs before BPE_MERGES rounds.
    The Spark side gracefully yields fewer merges (empty winners
    contribute nothing); the oracle's unrolled chain used to NULL
    every row via replace(s, NULL, ...) on the exhausted levels — now
    COALESCEd to a chr(1) sentinel. Both engines must agree on q196's
    short merge table AND q197's induced vocabulary."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    # one repeated 2-letter word: merge 1 = 'a b', then the vocabulary
    # is single-symbol everywhere — 5 exhausted rounds follow
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["ab ab ab", "ab ab"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["t", "t"], pa.string()),
            "n_chars": pa.array([8, 5], pa.int64()),
        }
    )
    sf = str(tmp_path / "tiny")
    os.makedirs(sf)
    pq.write_table(docs, os.path.join(sf, "documents.parquet"))

    load_all_plans()
    got196 = [
        (r.merge_rank, r.pair, r.merged, r.n)
        for r in REGISTRY["q196_bpe_train"].fn(spark, sf).collect()
    ]
    assert got196 == [(0, "a b", "ab", 5)], got196
    got197 = sorted(
        (r.symbol, r.n)
        for r in REGISTRY["q197_bpe_vocab"].fn(spark, sf).collect()
    )
    assert got197 == [("ab", 5)], got197

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want196 = con.execute(REGISTRY["q196_bpe_train"].oracle).fetchall()
    assert [tuple(r) for r in want196] == got196
    want197 = sorted(
        tuple(r) for r in con.execute(REGISTRY["q197_bpe_vocab"].oracle).fetchall()
    )
    assert want197 == got197
