"""Dump `.explain("formatted")` for named catalog queries to files.

Usage: python tools/plan_snapshot.py --root REPO_ROOT --out DIR \
           --suffix _after [--sf SF_DIR] q68_ivf_ann [q175_... ...]

Writes DIR/<query><suffix>.txt for each query. ``--root`` lets the
same script snapshot an older checkout (a git worktree) for the
``_before`` half of the round's plan evidence.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, os.path.abspath(args.root))
    from mapreduce_mit_spark import registry
    from mapreduce_mit_spark.session import get_spark

    registry.load_all_plans()
    spark = get_spark("plan_snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for name in args.queries:
        if name not in registry.REGISTRY:
            print(f"SKIP {name}: not registered in {args.root}", file=sys.stderr)
            continue
        df = registry.REGISTRY[name].fn(spark, args.sf)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
