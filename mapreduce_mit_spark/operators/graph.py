"""Connected components via iterative min-label propagation.

The missing last step of every near-dup pipeline: MinHash/Jaccard
produce candidate PAIRS (q81/q82), but dedup needs CLUSTERS — the
transitive closure of pairs — so each group keeps one representative.

Algorithm (the standard Spark formulation): every node starts labeled
with its own id; each round, every node takes the min of its own label
and its neighbors' labels; stop when no label changes. Rounds needed =
graph diameter (near-dup clusters are shallow — a handful of rounds).

Scale posture: each round is one join + one aggregation, all
DataFrame-native (shuffles keyed by node id). Labels are persisted per
round and unpersisted after the next round materializes, so lineage
does not grow unboundedly. The per-round driver action (a changed-count)
is a scalar, not data. For web-scale graphs swap in the large-star/
small-star variant (same primitive ops, fewer rounds); the convergence
loop is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Return (``node_col``, cluster) — cluster = min node id reachable.

    ``edges`` may be directed pairs; they are symmetrized here. Isolated
    nodes keep their own id as cluster.

    ``shuffle_partitions``: sizes the per-round label shuffles to the
    LABEL table (n_nodes), not to whatever the session's batch workload
    wanted — size it like n_nodes / rows-per-task on a real cluster.
    Applied as an explicit ``repartition(n, "node")`` inside the loop
    (hash-partitioning by the grouping key, which the downstream
    groupBy reuses — no extra exchange), NEVER by mutating the shared
    session's ``spark.sql.shuffle.partitions``, so concurrent queries
    in the same session are unaffected.
    """
    # persist the raw edges BEFORE symmetrizing: the union scans its
    # input twice, which would run an expensive upstream (e.g. the
    # Jaccard candidate-pair computation) twice
    edges_p = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    sym = edges_p.union(edges_p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym.persist()

    def _sized(df: DataFrame) -> DataFrame:
        if shuffle_partitions is not None:
            return df.repartition(shuffle_partitions, "node")
        return df

    labels = _sized(
        nodes.select(F.col(node_col).alias("node")).withColumn("label", F.col("node"))
    )
    labels.persist()
    labels.count()

    for _ in range(max_iterations):
        neighbor_labels = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            _sized(labels.select("node", "label").union(neighbor_labels))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    # truncate lineage: the result otherwise re-runs every round (on
    # now-unpersisted inputs) when the caller executes it
    out = labels.select("node", "label").localCheckpoint(eager=True)
    sym.unpersist()
    edges_p.unpersist()
    labels.unpersist()
    return out
