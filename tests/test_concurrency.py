"""Cross-PROCESS safety of the shared checkpoint/sink trees.

Round-8 finding (VERIFY_JUDGE_r08): a second Spark session on the box
made the crash-kill streaming suite fail — Structured Streaming's
local-FS checkpoint has no cross-process mutual exclusion, and the
fingerprint-keyed q152 tree under /tmp is deliberately SHARED across
processes (restart/recovery must find prior state). The fix is an
fcntl.flock lease per tree (stream_queries.tree_lock); these tests
prove the lease semantics with real second processes:

- mutual exclusion and release-on-exit across process boundaries,
- q152's run path actually honors a foreign holder (raises, not
  corrupts),
- the orphan-prune sweep never deletes a LOCKED sibling tree even when
  its mtimes look idle,
- and the end-to-end case: two whole processes driving q152 against
  the same fingerprint tree concurrently, both green, sink stable.

Reference analog: the shared-FS data plane (master.go:99) made spill
files collision-free BY NAMING (common.go:36-43); the streaming
checkpoint tree cannot be renamed per process (recovery is the point),
so the lease replaces naming.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
import time

import pytest

from mapreduce_mit_spark.streaming import stream_queries as sq

from .conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _hold_lock_child(tree: str) -> subprocess.Popen:
    """Spawn a (non-Spark, fast) child that takes tree_lock(tree) and
    holds it until a line arrives on stdin. Prints 'locked' once held."""
    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from mapreduce_mit_spark.streaming.stream_queries import tree_lock
        with tree_lock({tree!r}) as held:
            assert held
            print("locked", flush=True)
            sys.stdin.readline()
        """
    )
    p = subprocess.Popen(
        [sys.executable, "-c", code],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        text=True,
    )
    line = p.stdout.readline().strip()
    assert line == "locked", f"lock-holder child failed to start: {line!r}"
    return p


def _release(p: subprocess.Popen) -> None:
    p.stdin.write("\n")
    p.stdin.flush()
    p.wait(timeout=30)
    assert p.returncode == 0


def test_tree_lock_cross_process_mutual_exclusion(tmp_path):
    tree = str(tmp_path / "tree")
    child = _hold_lock_child(tree)
    try:
        # while the child holds it: non-blocking probe reports held-elsewhere
        with sq.tree_lock(tree, blocking=False) as held:
            assert held is False
        # and a blocking attempt times out rather than proceeding
        with pytest.raises(TimeoutError):
            with sq.tree_lock(tree, timeout_s=1.0):
                pass
    finally:
        _release(child)
    # child exited → kernel released the lease; we can take it now
    with sq.tree_lock(tree, timeout_s=10.0) as held:
        assert held is True


def test_tree_lock_released_on_process_kill(tmp_path):
    """A crash-killed holder must not wedge the tree — the crash-kill
    restart path depends on the kernel dropping the flock with the
    process."""
    tree = str(tmp_path / "tree")
    child = _hold_lock_child(tree)
    child.kill()
    child.wait(timeout=30)
    with sq.tree_lock(tree, timeout_s=10.0) as held:
        assert held is True


def test_q152_run_honors_foreign_lock(spark, monkeypatch):
    """While another PROCESS holds q152's tree lease, q152 must refuse
    to drive the checkpoint (TimeoutError), never interleave with it."""
    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()
    base = sq.q152_sink_base(SF_SMALL)
    child = _hold_lock_child(base)
    monkeypatch.setattr(sq, "TREE_LOCK_TIMEOUT_S", 2.0)
    try:
        with pytest.raises(TimeoutError):
            REGISTRY["q152_stream_file_sink"].fn(spark, SF_SMALL).collect()
    finally:
        _release(child)


def test_prune_skips_locked_sibling(monkeypatch):
    """The orphan sweep must not delete a sibling tree whose lease is
    held by a live process, even when every mtime in it looks idle —
    'one process's idle is another's between-micro-batches'."""
    base = sq.q152_sink_base(SF_SMALL)
    sf_root = os.path.dirname(base)
    sibling = os.path.join(sf_root, "9999_97970")
    os.makedirs(sibling, exist_ok=True)
    with open(os.path.join(sibling, "offsets"), "w") as f:
        f.write("x")
    # negative age → cutoff is in the future → everything looks idle
    monkeypatch.setattr(sq, "_SINK_PRUNE_AGE_S", -60)
    child = _hold_lock_child(sibling)
    try:
        sq.q152_sink_base(SF_SMALL)
        assert os.path.isdir(sibling), "prune deleted a LOCKED live tree"
    finally:
        _release(child)
    # lease gone → the same sweep removes the idle orphan
    sq.q152_sink_base(SF_SMALL)
    assert not os.path.isdir(sibling)


def test_q152_two_processes_concurrently(spark):
    """The end-to-end case the round-8 judge hit: two whole processes
    run q152 against the SAME fingerprint tree at the same time. The
    lease serializes them; whoever runs second drains zero new batches
    (exactly-once no-op). Both must succeed and agree with a rerun."""
    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()
    sq.q152_reset(SF_SMALL)
    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from mapreduce_mit_spark import registry
        from mapreduce_mit_spark.session import get_spark
        registry.load_all_plans()
        spark = get_spark("q152-concurrent-child", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        rows = registry.REGISTRY["q152_stream_file_sink"].fn(
            spark, {SF_SMALL!r}
        ).collect()
        print("ROWS", len(rows), flush=True)
        spark.stop()
        """
    )
    child = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    # run in THIS process while the child is coming up / running; the
    # lease decides the order, correctness must not depend on it
    mine = REGISTRY["q152_stream_file_sink"].fn(spark, SF_SMALL).collect()
    out, err = child.communicate(timeout=600)
    assert child.returncode == 0, f"child q152 failed:\n{err[-2000:]}"
    child_rows = int([ln for ln in out.splitlines() if ln.startswith("ROWS")][0].split()[1])
    assert child_rows == len(mine) > 0
    # and the tree is still a coherent exactly-once sink: a rerun is a
    # no-op returning identical rows
    again = REGISTRY["q152_stream_file_sink"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, mine)) == sorted(map(tuple, again))


def test_fp_stream_roots_disjoint_per_fixture(tmp_path):
    """fp_stream_root keys every stream-state tree by (family, fixture
    fingerprint): two different fixtures — or the same fixture after a
    regeneration — must map to DISJOINT roots, so logically independent
    runs never serialize on one lock (round-9 directive 8: the fixed
    /tmp/mms_admit and /tmp/mms_incr_stream roots made any two
    sessions' q162/q163 runs contend even across unrelated fixtures)."""
    import shutil

    a = tmp_path / "sfa"
    b = tmp_path / "sfb"
    for d in (a, b):
        os.makedirs(d)
        shutil.copyfile(
            os.path.join(SF_SMALL, "documents.parquet"),
            os.path.join(d, "documents.parquet"),
        )
    # different content sizes -> different fingerprints even if mtimes tie
    with open(os.path.join(b, "documents.parquet"), "ab") as f:
        f.write(b"\x00")

    ra = sq.fp_stream_root("mms_admit", str(a), "documents.parquet")
    rb = sq.fp_stream_root("mms_admit", str(b), "documents.parquet")
    assert ra != rb
    # regeneration of the SAME fixture (new mtime) re-keys the tree
    os.utime(os.path.join(a, "documents.parquet"),
             ns=(1_000_000_000_000_000_000, 1_000_000_000_000_000_000))
    assert sq.fp_stream_root("mms_admit", str(a), "documents.parquet") != ra
    # family keeps trees apart even for one fixture
    assert sq.fp_stream_root("mms_incr_stream", str(a), "documents.parquet") != \
        sq.fp_stream_root("mms_admit", str(a), "documents.parquet")
    # a missing source is a readable error, not a KeyError deep in Spark
    with pytest.raises(FileNotFoundError, match="mms_admit source file missing"):
        sq.fp_stream_root("mms_admit", str(tmp_path / "nope"), "documents.parquet")


def test_legacy_flat_layout_pruned(monkeypatch):
    """Pre-v1 revisions of q115/q162/q163 kept state DIRECTLY under
    /tmp/<label>/ with the lease at <label>.lock; fp_stream_root's
    legacy sweep must remove those trees once idle — but never while a
    live old-revision process holds the legacy lease, and never the
    new v1/ layout itself."""
    import shutil
    import tempfile

    label = "mms_test_legacy"
    label_root = os.path.join(tempfile.gettempdir(), label)
    shutil.rmtree(label_root, ignore_errors=True)
    try:
        os.makedirs(os.path.join(label_root, "src"))
        with open(os.path.join(label_root, "meta.json"), "w") as f:
            f.write("{}")
        monkeypatch.setattr(sq, "_SINK_PRUNE_AGE_S", -60)  # all idle
        child = _hold_lock_child(label_root)  # legacy <label>.lock held
        try:
            sq.fp_stream_root(label, SF_SMALL, "documents.parquet")
            assert os.path.isdir(os.path.join(label_root, "src")), (
                "sweep deleted legacy state while its lease was held"
            )
        finally:
            _release(child)
        root = sq.fp_stream_root(label, SF_SMALL, "documents.parquet")
        assert not os.path.exists(os.path.join(label_root, "src"))
        assert not os.path.exists(os.path.join(label_root, "meta.json"))
        assert root.startswith(os.path.join(label_root, "v1"))
    finally:
        shutil.rmtree(label_root, ignore_errors=True)


def test_q168_two_processes_concurrently(spark):
    """q152's two-process exactly-once property, applied to the
    streaming ANN serve tree: two processes run q168 against the SAME
    fingerprint tree at once. The lease serializes them (each run
    resets and re-streams its own tree epoch), and both must produce
    the identical per-query top-k as a fresh rerun."""
    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()
    code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from mapreduce_mit_spark import registry
        from mapreduce_mit_spark.session import get_spark
        registry.load_all_plans()
        spark = get_spark("q168-concurrent-child", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        rows = registry.REGISTRY["q168_stream_ann_serve"].fn(
            spark, {SF_SMALL!r}
        ).collect()
        print("ROWS", len(rows), flush=True)
        spark.stop()
        """
    )
    child = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    mine = REGISTRY["q168_stream_ann_serve"].fn(spark, SF_SMALL).collect()
    out, err = child.communicate(timeout=600)
    assert child.returncode == 0, f"child q168 failed:\n{err[-2000:]}"
    child_rows = int(
        [ln for ln in out.splitlines() if ln.startswith("ROWS")][0].split()[1]
    )
    assert child_rows == len(mine) > 0
    again = REGISTRY["q168_stream_ann_serve"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, mine)) == sorted(map(tuple, again))


def test_cold_start_attaches_all_fourteen_model_families(spark, tmp_path):
    """The production COLD START, end to end: one offline session saves
    all FOURTEEN persisted fitted artifacts (IVF, PQ, IVFADC, LSH bands,
    multi-table LSH keys, overlap sketches, the q149 unigram LM, the
    q166 classifier weights, the q175 STANDING-corpus IVF, the q178
    aggregate snapshot, the q187 histogram snapshot, the q190 DSIR
    bucket LMs, the q196 BPE merge table, the q202 bigram LM); a
    FRESH PROCESS
    then attaches all fourteen and serves one consumer per family —
    q68, q157, q160, q161, q165, q149, q166, q172, q175, q178, q187,
    q190, q197, q202 — with every fit core poisoned
    (ivf_codebook, pq_codebooks, _lsh_bands_df,
    lsh_multitable_keys_df, _overlap_sketches_df, _unigram_freq_df,
    _classifier_weights_df, _standing_lineitem, _standing_orders,
    _dsir_count_tables, _bpe_merges_fit, _bigram_counts_df raise;
    ivf_codebook
    also covers the standing fit), so any refit on any serve path
    fails the child loudly. The served rows must equal this session's
    fitted baselines. The per-family attach tests prove each path
    alone; this is the one-session-attaches-everything boot."""
    import json

    from mapreduce_mit_spark.plans import dedup as dd
    from mapreduce_mit_spark.plans import maintenance as mnt
    from mapreduce_mit_spark.plans import quality as ql
    from mapreduce_mit_spark.plans import selection as selp
    from mapreduce_mit_spark.plans import similarity as sim
    from mapreduce_mit_spark.registry import REGISTRY, load_all_plans

    load_all_plans()
    sf = SF_SMALL
    dirs = {
        f: str(tmp_path / f)
        for f in ("ivf", "pq", "ivfadc", "lsh", "lsh8", "overlap",
                  "unigram", "cls", "ivf_standing", "agg_snapshot",
                  "hist_snapshot", "dsir_lm", "bpe_merges", "bigram_lm")
    }
    sim.ivf_index_save(spark, sf, dirs["ivf"])
    sim.pq_index_save(spark, sf, dirs["pq"])
    sim.ivfadc_index_save(spark, sf, dirs["ivfadc"])
    dd.lsh_index_save(spark, sf, dirs["lsh"])
    sim.lsh8_index_save(spark, sf, dirs["lsh8"])
    ql.overlap_index_save(spark, sf, dirs["overlap"])
    ql.unigram_lm_save(spark, sf, dirs["unigram"])
    ql.classifier_weights_save(spark, sf, dirs["cls"])
    sim.ivf_standing_index_save(spark, sf, dirs["ivf_standing"])
    mnt.agg_snapshot_save(spark, sf, dirs["agg_snapshot"])
    mnt.hist_snapshot_save(spark, sf, dirs["hist_snapshot"])
    selp.dsir_lm_save(spark, sf, dirs["dsir_lm"])
    selp.bpe_merges_save(spark, sf, dirs["bpe_merges"])
    ql.bigram_lm_save(spark, sf, dirs["bigram_lm"])

    queries = [
        "q68_ivf_ann",
        "q157_pq_ann",
        "q160_ivfadc",
        "q161_incremental_dedup",
        "q165_sketch_overlap_triage",
        "q149_unigram_logprob",
        "q166_classifier_filter",
        "q172_ann_multitable_lsh",
        "q175_ivf_incremental_serve",
        "q178_incremental_agg_maintenance",
        "q187_histogram_quantile_maintenance",
        "q190_dsir_importance",
        "q197_bpe_vocab",
        "q202_bigram_logprob",
    ]
    # default=str + loads: timestamps (q178's min/max ship dates) compare
    # as their string forms on both sides of the process boundary.
    baselines = json.loads(
        json.dumps(
            {
                q: sorted([list(r) for r in REGISTRY[q].fn(spark, sf).collect()])
                for q in queries
            },
            default=str,
        )
    )

    code = textwrap.dedent(
        f"""
        import json, sys
        sys.path.insert(0, {REPO!r})
        from mapreduce_mit_spark.plans import dedup as dd
        from mapreduce_mit_spark.plans import maintenance as mnt
        from mapreduce_mit_spark.plans import quality as ql
        from mapreduce_mit_spark.plans import selection as selp
        from mapreduce_mit_spark.plans import similarity as sim
        from mapreduce_mit_spark.registry import REGISTRY, load_all_plans
        from mapreduce_mit_spark.session import get_spark

        load_all_plans()
        spark = get_spark("cold-start-attach-child", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")
        dirs = {dirs!r}
        sf = {sf!r}
        sim.ivf_index_attach(spark, sf, dirs["ivf"])
        sim.pq_index_attach(spark, sf, dirs["pq"])
        sim.ivfadc_index_attach(spark, sf, dirs["ivfadc"])
        dd.lsh_index_attach(spark, sf, dirs["lsh"])
        sim.lsh8_index_attach(spark, sf, dirs["lsh8"])
        ql.overlap_index_attach(spark, sf, dirs["overlap"])
        ql.unigram_lm_attach(spark, sf, dirs["unigram"])
        ql.classifier_weights_attach(spark, sf, dirs["cls"])
        sim.ivf_standing_index_attach(spark, sf, dirs["ivf_standing"])
        mnt.agg_snapshot_attach(spark, sf, dirs["agg_snapshot"])
        mnt.hist_snapshot_attach(spark, sf, dirs["hist_snapshot"])
        selp.dsir_lm_attach(spark, sf, dirs["dsir_lm"])
        selp.bpe_merges_attach(spark, sf, dirs["bpe_merges"])
        ql.bigram_lm_attach(spark, sf, dirs["bigram_lm"])

        def _poison(name):
            def _fn(*a, **kw):
                raise AssertionError(name + " refit after cold-start attach")
            return _fn

        sim.ivf_codebook = _poison("ivf_codebook")
        sim.pq_codebooks = _poison("pq_codebooks")
        dd._lsh_bands_df = _poison("_lsh_bands_df")
        sim.lsh_multitable_keys_df = _poison("lsh_multitable_keys_df")
        ql._overlap_sketches_df = _poison("_overlap_sketches_df")
        ql._unigram_freq_df = _poison("_unigram_freq_df")
        ql._classifier_weights_df = _poison("_classifier_weights_df")
        mnt._standing_lineitem = _poison("_standing_lineitem")
        mnt._standing_orders = _poison("_standing_orders")
        selp._dsir_count_tables = _poison("_dsir_count_tables")
        selp._bpe_merges_fit = _poison("_bpe_merges_fit")
        ql._bigram_counts_df = _poison("_bigram_counts_df")

        out = {{}}
        for q in {queries!r}:
            out[q] = sorted([list(r) for r in REGISTRY[q].fn(spark, sf).collect()])
        print("SERVED " + json.dumps(out, default=str), flush=True)
        spark.stop()
        """
    )
    child = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    out, err = child.communicate(timeout=900)
    assert child.returncode == 0, f"cold-start child failed:\n{err[-3000:]}"
    served = json.loads(
        [ln for ln in out.splitlines() if ln.startswith("SERVED ")][0][7:]
    )
    for q in queries:
        assert served[q] == baselines[q], f"{q}: cold-start serve diverges from fit"
