"""The bench's final stdout line is the DRIVER CONTRACT: one JSON
object whose `queries` dict carries per-query timings, and the driver's
wrapper tails only ~2,000 chars of stdout. From ~r13 the full-name keys
overflowed that and the emergency fallback emptied `queries`, leaving
PERF per-query-blind for five rounds (PERF_r17: n_common 0). r18 keys
the slim line by short query id; these tests pin that the mapping is
unambiguous and that the line fits the tail for the CURRENT bench set,
so growth that would re-blind the driver fails loudly here instead.
"""

import json

import bench


def _bench_names():
    names = list(bench.HEADLINE) + list(bench.FLAGSHIP)
    names += ["wc_corpus_16mb", "ii_corpus_16mb"]
    return names


def test_short_ids_unique_across_bench_set():
    names = _bench_names()
    shorts = [bench._short_id(n) for n in names]
    dups = sorted({s for s in shorts if shorts.count(s) > 1})
    assert not dups, f"ambiguous short ids in the slim contract: {dups}"


def test_short_id_forms():
    assert bench._short_id("q148_dedup_pipeline") == "q148"
    assert bench._short_id("wc_corpus_16mb") == "wc"
    assert bench._short_id("ii_corpus_16mb") == "ii"


def test_slim_line_fits_driver_tail():
    # Simulate the widest realistic line: every query at a 3-digit
    # seconds value (xx.xx), every scalar field populated.
    queries = {bench._short_id(n): 99.99 for n in _bench_names()}
    slim = {
        "metric": "headline_queries_total_wall_seconds",
        "value": 9999.999,
        "unit": "sec",
        "queries": queries,
        "value_cold": 9999.999,
        "reps": 3,
        "sf": 0.1,
        "calibration_s": 0.999,
        "flagships_normalized": 999.999,
        "fits_total": 999.999,
        "staging_total": 99.999,
        "flagships_isolated_total": 999.999,
        "flagship_calibrations": [0.999, 0.999],
    }
    line = json.dumps(slim)
    assert len(line) <= 1900, (
        f"slim contract line is {len(line)} chars — would overflow the "
        "driver's ~2,000-char stdout tail and re-blind PERF; shorten "
        "keys or move a field to BENCH_DETAIL.json"
    )


def test_retrain_acts_are_flagship_isolated():
    # VERDICT r17 item 7: q213/q216 quote the isolated two-child series.
    assert "q213_ivfadc_refresh_serve" in bench.FLAGSHIP
    assert "q216_pq_refresh_serve" in bench.FLAGSHIP
    assert "q213_ivfadc_refresh_serve" not in bench.HEADLINE
    assert "q216_pq_refresh_serve" not in bench.HEADLINE
