"""Multi-scale engine-side scaling study (the 100× evidence run).

Usage:
  python tools/scaleup.py 100 /tmp/mms_scale/sf10
  python tools/scale_study.py /root/testdata/sf0.1 /tmp/mms_scale/sf10

Runs the flat/sublinear headline subset (the queries whose 100 TB
design claims are "wall clock stays bounded as facts grow") at each
given sf_dir and prints one JSON line per scale plus a ratio table.

Metric: every query is materialized through the NOOP SINK
(``df.write.format("noop")``) instead of ``collect()`` — the study
measures ENGINE scaling (scan/shuffle/agg/join), deliberately excluding
driver-side result transfer, which bench.py showed dominates the
output-bound queries at 10× and would drown the signal at 100×. Both
scales use the same sink, so ratios are internally consistent (they are
NOT comparable to bench.py's collect-based numbers).

The OUTPUT_BOUND trio (q32/q17/q63 — per-row/window results that grow
with the data) is included under the same noop sink precisely to show
their engine-side cost without the harness transfer that dominated the
10× bench study.

Timing: one cold run then SPARK_GRAFT_BENCH_REPS (default 1 at 100× —
the runs are long) warm runs; warm median reported, cold preserved.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_mit_spark import registry
from mapreduce_mit_spark.session import get_spark

FLAT = [
    "q01_pricing_summary", "q18_salted_agg", "q20_broadcast_join",
    "q21_shuffle_join", "q30_window_rank", "q38_doc_chunks",
    "q40_global_topk", "q42_distinct", "q47_pivot", "q70_tumbling_window",
    "q72_session_window", "q84_edit_distance", "q90_stream_tumbling",
    "q135_rollup_ladder",
    # round-14 maintenance/ops pack: bounded outputs by design (merge of
    # group-sized partials; 64-file layout stats; per-key counts; an
    # 8-group epoch manifest)
    "q178_incremental_agg_maintenance", "q179_zorder_layout",
    "q180_skew_audit", "q183_epoch_repetition",
    # round-16 acts measured flat-class at 100x organic (SCALING.md):
    # tail-sized incremental OPTIMIZE; group-sized planning pass
    "q206_incremental_optimize", "q210_join_cardinality_plan",
]
SUBLINEAR = [
    "q02_filter_project", "q03_shipping_priority", "q05_local_supplier_volume",
    "q06_decontaminate", "q22_multiway_join", "q26_range_join",
    "q33_window_frames", "q46_hash_sample", "q61_inverted_index",
    "q80_exact_dedup", "q83_simhash", "q87_lsh_buckets", "q117_market_share",
    "q157_pq_ann", "q158_fuzzy_decontamination",
]
OUTPUT_BOUND = ["q32_window_running", "q17_percentiles", "q63_quality_score"]


def run_scale(spark, sf_dir: str, queries: list[str], reps: int) -> dict:
    timings, cold = {}, {}
    for name in queries:
        fn = registry.REGISTRY[name].fn

        def run() -> float:
            if name == "q152_stream_file_sink":
                # reset the persistent checkpoint so every rep measures
                # the stream, not a zero-batch read-back (see bench.py)
                from mapreduce_mit_spark.streaming.stream_queries import (
                    q152_reset,
                )

                q152_reset(sf_dir)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        cold[name] = round(run(), 3)
        warm = sorted(run() for _ in range(reps))
        timings[name] = round(warm[len(warm) // 2], 3)
        print(f"# {sf_dir} {name}: median {timings[name]:.3f}s "
              f"cold {cold[name]:.3f}s", file=sys.stderr)
    return {"sf_dir": sf_dir, "queries": timings, "queries_cold": cold,
            "total": round(sum(timings.values()), 3)}


FLAGSHIPS = [
    "q153_quantiles_giant_groups", "q149_unigram_logprob",
    "q152_stream_file_sink", "q148_dedup_pipeline",
]


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--flagships"]
    flagships = "--flagships" in sys.argv
    dirs = argv or ["/root/testdata/sf0.1", "/tmp/mms_scale/sf10"]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))
    if flagships:
        # Since the q148 exact-dedup pre-pass (round 6) the 100x
        # adversarial fixture runs in the default 8g single-JVM heap
        # (SCALING.md records the measured run), so this is advice, not
        # a refusal. Test for the variable being UNSET — a user who
        # deliberately exports 8g has made a choice and is not nagged.
        if os.environ.get("SPARK_GRAFT_DRIVER_MEM") is None:
            print(
                "note: flagships at 100x run in the default 8g heap since "
                "the q148 pre-pass; export SPARK_GRAFT_DRIVER_MEM to size "
                "the single JVM explicitly if your fixture is larger.",
                file=sys.stderr,
            )
        queries = FLAGSHIPS
    else:
        queries = FLAT + SUBLINEAR + OUTPUT_BOUND
    registry.load_all_plans()
    spark = get_spark("scale_study")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for d in dirs:
        results.append(run_scale(spark, d, queries, reps))
        print(json.dumps(results[-1]))
    if len(results) == 2:
        a, b = results
        print(f"\n{'query':34s} {'base':>8s} {'scaled':>8s} {'ratio':>7s}")
        for name in queries:
            r = b["queries"][name] / max(a["queries"][name], 1e-9)
            regime = ("flat" if name in FLAT
                      else "sublinear" if name in SUBLINEAR else "output")
            print(f"{name:34s} {a['queries'][name]:8.2f} "
                  f"{b['queries'][name]:8.2f} {r:6.1f}x  {regime}")
        print(f"{'TOTAL':34s} {a['total']:8.2f} {b['total']:8.2f} "
              f"{b['total'] / max(a['total'], 1e-9):6.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
