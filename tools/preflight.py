"""One-command round-close gate: `python tools/preflight.py [--full]`.

The driver samples ~50 of the catalog's queries per round, so any round's
sample must be survivable for ALL of them. This runs, in order:

1. Bench-record drift — every bolded raw/normalized total in
   SCALING.md's per-round sections must match the committed
   BENCH_r{N}.json (the r11 double-record class).
2. Oracle hazard sweep — every oracle bound under DuckDB, zero
   HUGEINT/DECIMAL output columns (the r2 failure class), seconds.
3. `tools/verify_local.py --bare --types` at sf0.01 — every catalog
   query on a driver-like bare session, value compare PLUS the
   cross-engine type contract (column types and Python cell types).
4. (`--full` only) the whole pytest suite.

Exit 0 ⇒ green output implies any driver sample passes. Any step
failing stops the run with a loud FAIL and a nonzero exit.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def hazard_sweep(sf_dir: str) -> int:
    import duckdb

    from mapreduce_mit_spark import registry
    from mapreduce_mit_spark.sources.io import TABLE_NAMES
    from mapreduce_mit_spark.typemap import HAZARD_TYPES

    registry.load_all_plans()
    con = duckdb.connect()
    for n in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{sf_dir}/{n}.parquet')"
        )
    bad = 0
    for name, q in sorted(registry.REGISTRY.items()):
        if q.oracle is None:
            continue
        try:
            rel = con.sql(q.oracle)
        except Exception as e:
            print(f"FAIL  {name}: oracle does not bind: {e}")
            bad += 1
            continue
        hazards = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if any(h in str(t).upper() for h in HAZARD_TYPES)
        ]
        if hazards:
            print(f"FAIL  {name}: hazard oracle types {hazards}")
            bad += 1
    return bad


def check_summary_coverage(summary_path: str) -> str | None:
    """The coverage artifact must record the WHOLE registry: a silently-
    shrunk catalog (an import error dropping a plans module, a deleted
    @register) must fail the round-close loudly, not produce a
    smaller-but-all-green summary. Returns an error string, or None."""
    import json

    from mapreduce_mit_spark import registry

    registry.load_all_plans()
    with open(summary_path) as f:
        recorded = json.load(f)["queries"]
    missing = sorted(set(registry.REGISTRY) - set(recorded))
    extra = sorted(set(recorded) - set(registry.REGISTRY))
    if len(recorded) != len(registry.REGISTRY) or missing or extra:
        return (
            f"summary covers {len(recorded)} queries, registry has "
            f"{len(registry.REGISTRY)} (missing={missing[:5]}, extra={extra[:5]})"
        )
    return None


def check_bench_scaling_drift() -> list[str]:
    """SCALING.md's 'Round N close' paragraphs must quote the COMMITTED
    BENCH_r{N}.json (the r11 defect: two honest runs, two different
    normalized totals stated for the same round). For every round that
    has both the artifact and a close paragraph with the bolded
    'raw headline total **A s / normalized B s**' pattern, the quoted
    numbers must match the artifact to ±0.05 s (one rounding step at
    one decimal). Returns error strings."""
    import glob as _g
    import json
    import re

    errs: list[str] = []
    scaling = open(os.path.join(REPO, "SCALING.md")).read()
    for path in sorted(_g.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json", path)
        if not m:
            # driver side-artifacts like BENCH_r17_c8.json (low-core
            # scaling run) are not round-close records
            continue
        n = int(m.group(1))
        # EVERY section whose heading names this round, and EVERY
        # bolded total inside each — the r11 defect was precisely a
        # second conflicting total for the same round, so first-match-
        # only would re-admit the class this check exists to close
        secs = re.findall(
            rf"###[^\n]*Round {n}\b.*?(?=\n### |\Z)", scaling, re.DOTALL
        )
        # r≤14 sections quote "raw X s / normalized Y s"; r15+ quote
        # raw-only (value_normalized retired — see bench.py). Both
        # forms stay checkable against the committed artifact.
        quotes = [
            (q.group(1), q.group(2))
            for sec in secs
            for q in re.finditer(
                r"raw headline total \*\*([\d.]+)\s*s / normalized ([\d.]+)\s*s\*\*",
                sec,
            )
        ] + [
            (q.group(1), None)
            for sec in secs
            for q in re.finditer(
                r"raw headline total \*\*([\d.]+)\s*s\*\*(?! */)", sec
            )
        ]
        if not quotes:
            continue
        with open(path) as f:
            art = json.load(f).get("parsed") or {}
        for raw_q, norm_q in quotes:
            checks = [("raw", float(raw_q), art.get("value"))]
            if norm_q is not None:
                checks.append(
                    ("normalized", float(norm_q), art.get("value_normalized"))
                )
            for label, got, want in checks:
                if want is None:
                    # a malformed/unparsed artifact must fail the gate,
                    # not silently pass it: SCALING.md is quoting a
                    # number the committed artifact cannot corroborate
                    errs.append(
                        f"SCALING.md round-{n} section quotes {label} {got} but "
                        f"BENCH_r{n:02d}.json has no parsed '{label}' total "
                        "(malformed or unparsed artifact)"
                    )
                elif abs(got - want) > 0.051:
                    errs.append(
                        f"SCALING.md round-{n} section quotes {label} {got} but "
                        f"BENCH_r{n:02d}.json records {round(want, 1)}"
                    )
    return errs


def check_bench_contention_trust() -> tuple[list[str], list[str]]:
    """Contention-robustness gate over the committed BENCH_DETAIL.json
    (r13): the flagship set runs in TWO fresh isolated subprocesses —
    run A's medians land in ``queries`` (the headline numbers), and
    ``flagships_isolated`` records min(A, B) per query. Returns
    (errors, warnings):

    - ERROR when run A's flagship subtotal disagrees with the min-of-
      A/B total by >1.5× — the two isolated windows saw wildly
      different boxes, so the quoted medians were contention-inflated
      (the round-12 class: committed normalized total 17.9 s vs ≈40 s
      on a calm box); rerun the bench or quote the A/B-min series.
    - WARNING when the box calibration sits >2× off the pinned
      normalization ruler — the linear correction is outside its trust
      region (fixed JVM/compile costs don't scale with contention), so
      SCALING.md round-over-round claims must quote isolated raw
      medians, not value_normalized.
    """
    import json

    errs: list[str] = []
    warns: list[str] = []
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    if not os.path.exists(path):
        return errs, warns
    with open(path) as f:
        detail = json.load(f)
    iso = detail.get("flagships_isolated")
    if not iso:
        warns.append(
            "BENCH_DETAIL.json predates the isolated flagship A/B series — "
            "rerun bench.py before quoting flagship numbers"
        )
        return errs, warns
    in_run = sum(detail["queries"][q] for q in iso if q in detail["queries"])
    iso_total = sum(iso.values())
    if iso_total > 0 and in_run / iso_total > 1.5:
        errs.append(
            f"flagship run-A subtotal {in_run:.1f}s vs min-of-A/B total "
            f"{iso_total:.1f}s (>1.5x): the two isolated windows disagree — "
            "run A's quoted medians were contention-inflated; rerun, and "
            "quote the A/B-min series"
        )
    import bench as _bench

    cal = detail.get("calibration_s")
    if cal and cal > 2.0 * _bench.REF_CALIBRATION_S:
        warns.append(
            f"calibration {cal:.3f}s is >2x the pinned ruler "
            f"({_bench.REF_CALIBRATION_S}s): any linear normalization is "
            "outside its trust region — quote isolated raw medians in "
            "SCALING.md"
        )
    return errs, warns


def check_opmap_fresh() -> str | None:
    """README's generated query map must match the registry at HEAD.
    Rounds 16 AND 17 both shipped red on tests/test_docs.py because
    code commits landed after the last `gen_opmap --write`; this makes
    staleness a preflight failure so it cannot recur. Returns an error
    string, or None."""
    import re

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_opmap

    expected = gen_opmap.generate()
    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(
        re.escape(gen_opmap.BEGIN) + r".*?" + re.escape(gen_opmap.END),
        readme,
        re.DOTALL,
    )
    if not m or m.group(0) != expected:
        return (
            "README query map is stale vs the registry at HEAD — run "
            "`python tools/gen_opmap.py --write` AFTER the round's last "
            "code commit, then commit README.md"
        )
    return None


def main() -> int:
    full = "--full" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")

    t0 = time.time()
    print("== preflight 0/4: README opmap freshness ==")
    stale = check_opmap_fresh()
    if stale:
        print(f"FAIL  {stale}")
        print("\nPREFLIGHT FAIL: stale README opmap (the r16/r17 repeat class)")
        return 1
    print("ok\n")

    print("== preflight 1/4: bench-record drift ==")
    drift = check_bench_scaling_drift()
    if drift:
        for e in drift:
            print(f"FAIL  {e}")
        print("\nPREFLIGHT FAIL: SCALING.md disagrees with committed BENCH artifacts")
        return 1
    cerrs, cwarns = check_bench_contention_trust()
    for w in cwarns:
        print(f"WARN  {w}")
    if cerrs:
        for e in cerrs:
            print(f"FAIL  {e}")
        print("\nPREFLIGHT FAIL: bench series contention-corrupted")
        return 1
    print("ok\n")

    print(f"== preflight 2/4: oracle hazard sweep ({sf_dir}) ==")
    bad = hazard_sweep(sf_dir)
    if bad:
        print(f"\nPREFLIGHT FAIL: {bad} oracles with hazard types")
        return 1
    print(f"ok ({time.time()-t0:.0f}s)\n")

    print("== preflight 3/4: verify_local --bare --types (all queries) ==")
    cmd = [sys.executable, os.path.join(REPO, "tools", "verify_local.py"),
           "--bare", "--types"]
    summary = os.environ.get("SPARK_GRAFT_SUMMARY")  # e.g. VERIFY_SUMMARY_r04.json
    if not summary and full:
        # a --full round-close MUST leave the coverage artifact behind
        summary = "VERIFY_SUMMARY_latest.json"
    if summary:
        cmd += ["--summary", summary]
    rc = subprocess.call(cmd + [sf_dir], cwd=REPO)
    if rc != 0:
        print("\nPREFLIGHT FAIL: verify_local --bare --types")
        return rc

    if summary:
        err = check_summary_coverage(os.path.join(REPO, summary))
        if err:
            print(f"\nPREFLIGHT FAIL: {err}")
            return 1
        print(f"coverage artifact {summary}: full registry recorded")

    if full:
        print("\n== preflight 4/4: pytest ==")
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q"], cwd=REPO
        )
        if rc != 0:
            print("\nPREFLIGHT FAIL: pytest")
            return rc
    else:
        print("\n(4/4 pytest skipped — pass --full to include)")

    print(f"\nPREFLIGHT PASS ({time.time()-t0:.0f}s total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
