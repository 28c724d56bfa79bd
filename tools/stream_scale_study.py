"""Streaming-family scaling study (the 100x-organic evidence run the
round-15 verdict carried — r14 directive #7).

Usage:
  python tools/stream_scale_study.py [sf_dir ...]
  (default: /root/testdata/sf0.1 /tmp/mms_scale/sf10_organic)

Runs every streamed-ingest/serve query (q162 incremental dedup, q168
ANN serve, q176 index ingest, q181 agg maintenance, q185 state
compaction, q195 DSIR scoring, q198 BPE tokenize, q205 ANN ingest
compaction) at each scale and prints one JSON line per scale.

Per query it separates:
  - ``drain_s``: the per-batch streaming work — the sum of
    triggerExecution durations the sink's StreamingQueryProgress
    records across the availableNow drain. This is what a crawl-scale
    ingest pays PER BATCH, amortized forever.
  - ``per_batch_mean_s``: drain_s / n_batches — the steady-state unit
    cost the 100 TB design question is about.
  - ``outside_drain_s``: total − drain — the STAGING fixture cost
    (writing the source dir, checkpoint setup) plus the final serve.
    Staging exists only because the registered query must be
    self-contained and idempotent; production pays it once per stream,
    not per batch.

Metric: the registered query materializes through the NOOP SINK
(scale_study.py's discipline — engine scaling, not driver transfer).
Warm = second run (the first run is reported as cold; streamed trees
restage on every call, so "warm" here means warm JVM/code paths, not
cached state).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_mit_spark import registry
from mapreduce_mit_spark.session import get_spark

# (registered query, LAST_QUERY sink key)
STREAMING = [
    ("q162_stream_incremental_dedup", "q162_sink"),
    ("q168_stream_ann_serve", "q168_sink"),
    ("q176_stream_index_ingest", "q176_sink"),
    ("q181_stream_agg_maintenance", "q181_sink"),
    ("q185_stream_state_compaction", "q185_sink"),
    ("q195_stream_dsir_scoring", "q195_sink"),
    ("q198_stream_bpe_tokenize", "q198_sink"),
    ("q205_ann_ingest_compaction", "q205_sink"),
]


def _drain_seconds(sink_key: str) -> tuple[float, int]:
    from mapreduce_mit_spark.streaming.stream_queries import last_progress

    total_ms, n = 0.0, 0
    for p in last_progress(sink_key):
        dur = (p.get("durationMs") or {}).get("triggerExecution")
        if dur is not None:
            total_ms += float(dur)
            n += 1
    return total_ms / 1000.0, n


def run_scale(spark, sf_dir: str, reps: int) -> dict:
    out = {}
    for name, sink_key in STREAMING:
        fn = registry.REGISTRY[name].fn

        def run() -> tuple[float, float, int]:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            total = time.perf_counter() - t0
            drain, n = _drain_seconds(sink_key)
            return total, drain, n

        cold_total, cold_drain, _ = run()
        warm = sorted(run() for _ in range(reps))
        total, drain, n = warm[len(warm) // 2]
        out[name] = {
            "total_s": round(total, 3),
            "cold_s": round(cold_total, 3),
            "drain_s": round(drain, 3),
            "n_batches": n,
            "per_batch_mean_s": round(drain / n, 3) if n else None,
            "outside_drain_s": round(total - drain, 3),
        }
        print(
            f"# {sf_dir} {name}: total {total:.2f}s drain {drain:.2f}s "
            f"({n} batches, {drain / max(n, 1):.2f}s/batch) "
            f"outside {total - drain:.2f}s cold {cold_total:.2f}s",
            file=sys.stderr,
        )
    return {"sf_dir": sf_dir, "queries": out}


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/mms_scale/sf10_organic",
    ]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))
    registry.load_all_plans()
    spark = get_spark("stream_scale_study")
    spark.sparkContext.setLogLevel("ERROR")
    results = [run_scale(spark, d, reps) for d in dirs]
    for r in results:
        print(json.dumps(r))
    if len(results) == 2:
        a, b = results
        print("# ratio table (second / first):", file=sys.stderr)
        for name, _ in STREAMING:
            ta = a["queries"][name]
            tb = b["queries"][name]
            rt = tb["total_s"] / max(ta["total_s"], 1e-9)
            rb = (
                tb["per_batch_mean_s"] / max(ta["per_batch_mean_s"], 1e-9)
                if ta["per_batch_mean_s"] and tb["per_batch_mean_s"]
                else None
            )
            print(
                f"#   {name}: total {rt:.1f}x per-batch "
                f"{rb:.1f}x" if rb else f"#   {name}: total {rt:.1f}x",
                file=sys.stderr,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
