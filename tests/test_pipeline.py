"""Invariants for the training-data assembly operators (q36-q39).

The DuckDB oracles already pin Spark==DuckDB; these tests pin both
against a THIRD implementation (Python hashlib / arithmetic), so an
error shared by the two SQL engines' expressions — or a subtly wrong
packing/chunking formula — still gets caught.
"""

from __future__ import annotations

import hashlib
import math

from mapreduce_mit_spark import registry
from mapreduce_mit_spark.plans.pipeline import (
    CHUNK_STRIDE,
    CHUNK_WINDOW,
    MIX_DEFAULT,
    MIX_THRESHOLDS,
    PACK_BUDGET,
)
from mapreduce_mit_spark.sources.io import load_table

from .conftest import SF_SMALL

registry.load_all_plans()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_corpus_shuffle_matches_python_md5(spark):
    got = registry.REGISTRY["q36_corpus_shuffle"].fn(spark, SF_SMALL).collect()
    doc_ids = [r["doc_id"] for r in load_table(spark, SF_SMALL, "documents").select("doc_id").collect()]
    expected = sorted(((_md5(f"shuf1:{i}"), i) for i in doc_ids))[:100]
    assert [(r["shuffle_key"], r["doc_id"]) for r in got] == expected


def test_mixture_sample_matches_python_md5(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang").collect()
    expected = sorted(
        r["doc_id"]
        for r in docs
        if _md5(f"mix1:{r['doc_id']}") < MIX_THRESHOLDS.get(r["lang"], MIX_DEFAULT)
    )
    got = registry.REGISTRY["q39_mixture_sample"].fn(spark, SF_SMALL).collect()
    assert sorted(r["doc_id"] for r in got) == expected
    for r in got:  # every surfaced key actually clears its threshold
        assert r["mix_key"] < MIX_THRESHOLDS.get(r["lang"], MIX_DEFAULT)


def test_packing_invariants(spark):
    rows = registry.REGISTRY["q37_pack_sequences"].fn(spark, SF_SMALL).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    sized = (
        load_table(spark, SF_SMALL, "documents")
        .selectExpr(
            "lang",
            "size(filter(split(text, '[^\\\\p{L}]+'), t -> length(t) > 0)) AS n",
        )
        .collect()
    )
    max_doc = {}
    n_docs_per_lang = {}
    for r in sized:
        max_doc[r["lang"]] = max(max_doc.get(r["lang"], 0), r["n"])
        n_docs_per_lang[r["lang"]] = n_docs_per_lang.get(r["lang"], 0) + 1
    for lang, bins in by_lang.items():
        ids = sorted(b["bin"] for b in bins)
        assert ids == list(range(len(ids))), f"{lang}: bins not contiguous {ids}"
        assert sum(b["n_docs"] for b in bins) == n_docs_per_lang[lang]
        for b in bins:
            # streaming packer: a bin overruns by at most one document
            assert b["tokens_packed"] <= PACK_BUDGET + max_doc[lang], (lang, b)
        # every non-final bin is at least budget-full once its overflow
        # doc (counted in THIS bin's total) is included
        for b in bins:
            if b["bin"] < len(ids) - 1:
                assert b["tokens_packed"] + max_doc[lang] >= PACK_BUDGET, (lang, b)


def test_chunking_invariants(spark):
    rows = registry.REGISTRY["q38_doc_chunks"].fn(spark, SF_SMALL).collect()
    toks = (
        load_table(spark, SF_SMALL, "documents")
        .where("doc_id < 200")
        .selectExpr(
            "doc_id",
            "filter(split(text, '[^\\\\p{L}]+'), t -> length(t) > 0) AS tk",
        )
        .collect()
    )
    tokens = {r["doc_id"]: r["tk"] for r in toks}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(tokens)
    for doc_id, chunks in by_doc.items():
        tk = tokens[doc_id]
        n = len(tk)
        expected_chunks = 1 + math.ceil(max(n - CHUNK_WINDOW, 0) / CHUNK_STRIDE)
        assert len(chunks) == expected_chunks, (doc_id, n, len(chunks))
        chunks.sort(key=lambda r: r["chunk_id"])
        for k, c in enumerate(chunks):
            start = k * CHUNK_STRIDE  # 0-based
            body = tk[start : start + CHUNK_WINDOW]
            assert c["start_token"] == start + 1
            assert c["n_chunk_tokens"] == len(body)
            assert c["chunk_md5"] == _md5(" ".join(body)), (doc_id, k)
        # coverage: the final chunk reaches the last token
        last = chunks[-1]
        assert last["start_token"] - 1 + last["n_chunk_tokens"] >= n


def test_event_sequences_flood_stays_bounded(spark, tmp_path):
    """q154's flood guard: a single user emitting 100k events with no
    30-minute silence is ONE gap-session; the cap must split it into
    ceil(100k/256) chunk-sessions of <= MAX_SESSION_EVENTS each (so no
    collect_list group — and no task — is unbounded), renumbered
    densely, while a second user's small organic sessions keep the
    exact uncapped numbering."""
    from pyspark.sql import functions as F

    from mapreduce_mit_spark.plans.pipeline import MAX_SESSION_EVENTS

    n_flood = 100_000
    flood = [(1, i, i * 60, "click") for i in range(n_flood)]  # 1-min gaps
    organic = [
        (2, n_flood + 1, 0, "view"),
        (2, n_flood + 2, 60, "click"),
        (2, n_flood + 3, 10_000, "purchase"),  # >30 min later: session 2
    ]
    (
        spark.createDataFrame(
            flood + organic, "user_id long, event_id long, ts_s long, event_type string"
        )
        .select(
            "user_id",
            "event_id",
            F.timestamp_seconds("ts_s").alias("ts"),
            "event_type",
            F.lit(1.0).alias("value"),
        )
        .write.parquet(str(tmp_path / "events.parquet"))
    )
    rows = registry.REGISTRY["q154_event_sequences"].fn(spark, str(tmp_path)).collect()
    u1 = sorted((r for r in rows if r.user_id == 1), key=lambda r: r.session_id)
    expected_sessions = -(-n_flood // MAX_SESSION_EVENTS)
    assert len(u1) == expected_sessions
    assert [r.session_id for r in u1] == list(range(1, expected_sessions + 1))
    assert all(r.n_events <= MAX_SESSION_EVENTS for r in u1)
    assert sum(r.n_events for r in u1) == n_flood
    # chunk boundaries respect event order: session k covers events
    # [ (k-1)*CAP, k*CAP ) — spot-check via duration of the first chunk
    assert u1[0].n_events == MAX_SESSION_EVENTS
    assert u1[0].dur_secs == (MAX_SESSION_EVENTS - 1) * 60
    u2 = sorted((r for r in rows if r.user_id == 2), key=lambda r: r.session_id)
    assert [(r.session_id, r.n_events, r.seq) for r in u2] == [
        (1, 2, "view>click"),
        (2, 1, "purchase"),
    ]


def test_temperature_mix_matches_python_and_rebalances(spark, tmp_path):
    """q156 against a THIRD implementation on a skewed corpus: rates
    computed in pure Python (sqrt weights, 6-decimal round, hex
    threshold) must select exactly the same doc set, and the sampled
    shares must actually rebalance — the head source's share shrinks,
    the tail source keeps (nearly) everything (rate capped at 1)."""
    import math

    from pyspark.sql import functions as F

    from mapreduce_mit_spark.plans.pipeline import TEMP_TARGET_FRAC

    pops = {"head": 2000, "mid": 200, "tail": 20}
    rows = []
    i = 0
    for src, n in pops.items():
        for _ in range(n):
            rows.append((i, f"text {i}", "en", src, 10))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = registry.REGISTRY["q156_temperature_mix"].fn(spark, str(tmp_path)).collect()

    z = sum(math.sqrt(n) for n in pops.values())
    ntot = sum(pops.values())
    expect_ids = set()
    rates = {}
    for src, n in pops.items():
        rate = round(min(1.0, (math.sqrt(n) / z) * (TEMP_TARGET_FRAC * ntot) / n), 6)
        rates[src] = rate
        thr = "g" if rate >= 1.0 else format(int(rate * 65536), "04x")
    for doc_id, _t, _l, src, _c in rows:
        rate = rates[src]
        thr = "g" if rate >= 1.0 else format(int(rate * 65536), "04x")
        if _md5(f"tmix1:{doc_id}")[:4] < thr:
            expect_ids.add(doc_id)
    assert {r.doc_id for r in got} == expect_ids
    for r in got:
        assert abs(r.rate - rates[r.source]) < 1e-9

    # rebalancing property: tail keeps all (rate 1), head is cut hardest
    assert rates["tail"] >= 1.0 or rates["tail"] > rates["mid"] > rates["head"]
    from collections import Counter

    samp = Counter(r.source for r in got)
    head_share_before = pops["head"] / ntot
    head_share_after = samp["head"] / max(len(got), 1)
    assert head_share_after < head_share_before


def test_corpus_to_trainer_funnel_consistency(spark):
    """q170's funnel contract on the driver corpus: per language the
    doc and token counts are monotonically non-increasing through
    raw → curated → dedup → train → mixture; the packed stage covers
    exactly the mixture stage's docs; 'en' (threshold 'g') survives
    mixture untouched; and every packed language has 1..n_docs bins."""
    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()
    rows = REGISTRY["q170_corpus_to_trainer"].fn(spark, SF_SMALL).collect()
    by = {(r.stage, r.lang): r for r in rows}
    stages = sorted({s for s, _ in by})
    assert stages == [
        "1_raw", "2_curated", "3_dedup", "4_train", "5_mixture", "6_packed"
    ]
    langs = sorted({lang for s, lang in by if s == "1_raw"})
    assert len(langs) >= 2, "funnel needs a multilingual corpus"

    def g(stage, lang, field):
        r = by.get((stage, lang))
        return getattr(r, field) if r is not None else 0

    order = ["1_raw", "2_curated", "3_dedup", "4_train", "5_mixture"]
    for lang in langs:
        for field in ("n_docs", "n_tokens"):
            vals = [g(s, lang, field) for s in order]
            assert vals == sorted(vals, reverse=True), (
                f"{lang}/{field} not monotone through the funnel: {vals}"
            )
        # packed == mixture coverage
        assert g("6_packed", lang, "n_docs") == g("5_mixture", lang, "n_docs")
        assert g("6_packed", lang, "n_tokens") == g("5_mixture", lang, "n_tokens")
        nb = g("6_packed", lang, "n_bins")
        nd = g("6_packed", lang, "n_docs")
        assert (nd == 0 and nb == 0) or 1 <= nb <= nd
    # en keeps everything through mixture (threshold 'g')
    assert g("5_mixture", "en", "n_docs") == g("4_train", "en", "n_docs")
    # the funnel actually removes something somewhere (non-vacuous)
    assert sum(g("2_curated", lang, "n_docs") for lang in langs) < sum(
        g("1_raw", lang, "n_docs") for lang in langs
    )
