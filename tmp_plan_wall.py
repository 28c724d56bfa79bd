"""Scratch: planning wall at ~1e5 small files — scandir fast path vs
glob+stat fallback, plus full partitions() through the reader."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

ROOT = "/tmp/mms_crawl/flat"
N = 100_000

if not os.path.isdir(ROOT) or len(os.listdir(ROOT)) < N:
    os.makedirs(ROOT, exist_ok=True)
    t0 = time.time()
    for i in range(N):
        p = os.path.join(ROOT, f"shard-{i:06d}.txt")
        if not os.path.exists(p):
            with open(p, "w") as f:
                f.write(f"doc {i}\n")
    print(f"fixture: {N} files in {time.time()-t0:.1f}s")

from mapreduce_mit_spark.sources.pydatasource import (
    WholeFileTextReader,
    _list_corpus,
)

flat_pat = os.path.join(ROOT, "*.txt")
deep_pat = os.path.join("/tmp/mms_crawl", "**", "*.txt")

for label, pat in [("scandir-flat", flat_pat), ("glob+stat-fallback", deep_pat)]:
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        listed = _list_corpus(pat, with_sizes=True)
        walls.append(time.perf_counter() - t0)
    print(f"{label}: {len(listed)} files, listing median "
          f"{sorted(walls)[1]:.3f}s (all {['%.3f' % w for w in walls]})")

# full partitions() planning: binpack at 1 MiB
r = WholeFileTextReader({"path": flat_pat, "maxbytesperpartition": str(1 << 20)})
walls = []
for _ in range(3):
    t0 = time.perf_counter()
    parts = r.partitions()
    walls.append(time.perf_counter() - t0)
print(f"partitions() binpack 1MiB: {len(parts)} packs from {N} files, "
      f"median {sorted(walls)[1]:.3f}s")
r2 = WholeFileTextReader({"path": flat_pat})
t0 = time.perf_counter()
parts2 = r2.partitions()
print(f"partitions() per-file: {len(parts2)} parts, {time.perf_counter()-t0:.3f}s")
