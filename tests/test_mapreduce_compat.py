"""MapReduce-compat API tests (SURVEY §5.4).

- the reference's identity/distinct-sort unit test (test_test.go:26-86,
  FIXTURES A2) ported against run_job;
- wc/ii compat apps vs an inline single-process reference
  implementation on a corpus subset (the full-corpus golden runs via
  the DataFrame path in test_golden_parity.py — the compat path is a
  Python-RDD fidelity surface, not the fast path).
"""

from __future__ import annotations

import glob
import os
import re
from collections import Counter

import pytest

from mapreduce_mit_spark.operators.mapreduce import (
    ii_map,
    ii_reduce,
    inverted_index,
    run_job,
    wc_map,
    wc_reduce,
    word_count,
)

from .conftest import REF_CORPUS

N_NUMBER = 20_000  # scaled from the reference's 100k (test_test.go:16)
N_FILES = 20


@pytest.fixture(scope="module")
def number_files(tmp_path_factory):
    """makeInputs (test_test.go:98-117): ints 0..N-1 round-robin across
    files, one per line."""
    d = tmp_path_factory.mktemp("mrinput")
    handles = [open(d / f"824-mrinput-{i}.txt", "w") for i in range(N_FILES)]
    for i in range(N_NUMBER):
        handles[i % N_FILES].write(f"{i}\n")
    for h in handles:
        h.close()
    return str(d)


def test_identity_distinct_sort(spark, number_files):
    """check() oracle (test_test.go:46-86): output = distinct input
    tokens in STRING sort order ('10' < '2'), exactly N lines."""
    result = run_job(
        spark,
        "test",
        os.path.join(number_files, "*.txt"),
        map_fn=lambda _f, contents: [(w, "") for w in contents.split()],
        reduce_fn=lambda _k, _vs: "",
        n_reduce=10,
    ).collect()
    keys = [r["key"] for r in result]
    assert len(keys) == N_NUMBER
    assert keys == sorted(str(i) for i in range(N_NUMBER))
    assert all(r["value"] == "" for r in result)


WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


@pytest.fixture(scope="module")
def small_corpus():
    files = sorted(glob.glob(os.path.join(REF_CORPUS, "pg-*.txt")))[:2]
    if not files:
        pytest.skip("reference corpus not available")
    return files


def test_word_count_compat(spark, small_corpus):
    expected = Counter()
    for path in small_corpus:
        with open(path, encoding="utf-8") as f:
            expected.update(WORD_RE.findall(f.read()))
    got = {r["key"]: r["value"] for r in word_count(spark, small_corpus).collect()}
    assert got == {w: str(c) for w, c in expected.items()}


def test_inverted_index_compat(spark, small_corpus):
    docs_by_word: dict[str, set] = {}
    for path in small_corpus:
        name = os.path.basename(path)
        with open(path, encoding="utf-8") as f:
            for w in WORD_RE.findall(f.read()):
                docs_by_word.setdefault(w, set()).add(name)
    got = {r["key"]: r["value"] for r in inverted_index(spark, small_corpus).collect()}
    expected = {
        w: f"{len(docs)} {','.join(sorted(docs))}" for w, docs in docs_by_word.items()
    }
    assert got == expected


def test_app_functions_match_reference_semantics():
    """Spot-check the ported mapF/reduceF against wc.go/ii.go semantics."""
    kvs = list(wc_map("f.txt", "Don't panic—42 times; DON'T"))
    assert kvs == [("Don", "1"), ("t", "1"), ("panic", "1"), ("times", "1"), ("DON", "1"), ("T", "1")]
    assert wc_reduce("w", ["1", "2", "3"]) == "6"
    assert ii_reduce("w", ["b.txt", "a.txt", "b.txt"]) == "2 a.txt,b.txt"
    assert list(ii_map("doc", "hi hi")) == [("hi", "doc"), ("hi", "doc")]


# --- property-based: shuffle integrity under arbitrary inputs ----------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:
    token = st.text(alphabet="abcxyz", min_size=1, max_size=4)

    @given(
        files=st.lists(st.lists(token, max_size=30), min_size=1, max_size=4),
        n_reduce=st.integers(min_value=1, max_value=7),
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_run_job_shuffle_integrity(spark, tmp_path_factory, files, n_reduce):
        """For ANY input and ANY R, reduce_fn must see every value of a
        key exactly once (the hash(key)%R routing contract,
        common_map.go:90-98) and output must be key-sorted."""
        d = tmp_path_factory.mktemp("prop")
        expected = Counter()
        for i, toks in enumerate(files):
            (d / f"in-{i}.txt").write_text(" ".join(toks))
            expected.update(toks)
        rows = run_job(
            spark,
            "prop",
            str(d / "*.txt"),
            map_fn=lambda _f, c: [(w, "1") for w in c.split()],
            reduce_fn=lambda _k, vs: str(len(vs)),
            n_reduce=n_reduce,
        ).collect()
        got = {r["key"]: int(r["value"]) for r in rows}
        assert got == dict(expected)
        assert [r["key"] for r in rows] == sorted(got)
