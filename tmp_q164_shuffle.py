"""Scratch: q164 shuffle mode at the 10x fixture — broadcast gate
forced OFF (broadcast_max_rows=0) vs default broadcast mode, value
equality + walls."""
import sys
import time

sys.path.insert(0, "/root/repo")
from mapreduce_mit_spark.session import get_spark
from mapreduce_mit_spark.plans.similarity import (
    ivf_index_for,
    semantic_dedup_df,
)

SF10 = "/tmp/mms_scale/sf1.0"
spark = get_spark("q164-shuffle-10x", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

# warm codegen on sf0.01 (the bench discipline)
c0, a0 = ivf_index_for(spark, "/root/testdata/sf0.01")
semantic_dedup_df(a0).collect()
semantic_dedup_df(a0, broadcast_max_rows=0).collect()

cent, assign = ivf_index_for(spark, SF10)
n = assign.count()
print(f"assign rows at 10x: {n}")

results = {}
for label, gate in [("broadcast", None), ("shuffle", 0)]:
    kw = {} if gate is None else {"broadcast_max_rows": gate}
    walls = []
    rows = None
    for _ in range(3):
        t0 = time.perf_counter()
        rows = semantic_dedup_df(assign, assign_rows=n, **kw).collect()
        walls.append(time.perf_counter() - t0)
    results[label] = sorted(map(tuple, rows))
    print(f"{label}: median {sorted(walls)[1]:.2f}s "
          f"(all {['%.2f' % w for w in walls]}), {len(rows)} rows")

assert results["broadcast"] == results["shuffle"], "mode results diverge!"
print("broadcast == shuffle results: OK")

# plan pin: shuffle mode must not broadcast the build side
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    semantic_dedup_df(assign, assign_rows=n, broadcast_max_rows=0).explain("formatted")
p = buf.getvalue()
pair_join_broadcast = "BroadcastHashJoin" in p and "a_cluster" in p
print("shuffle-mode plan contains SortMergeJoin/ShuffledHashJoin on pair join:",
      ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p))
