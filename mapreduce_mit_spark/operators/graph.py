"""Connected components via iterative min-label propagation.

The missing last step of every near-dup pipeline: MinHash/Jaccard
produce candidate PAIRS (q81/q82), but dedup needs CLUSTERS — the
transitive closure of pairs — so each group keeps one representative.

Algorithm (the standard Spark formulation, accelerated): every node
starts labeled with its own id; each round, every node takes the min
of its own label and its neighbors' labels; stop when no label
changes. Pure propagation needs `diameter` rounds (near-dup clusters
are shallow — a handful); from round 3 on the loop adds POINTER
JUMPING (label(u) ← label(label(u)), one self-join of the label
table), which halves every label path per round, so deep graphs
converge in O(log diameter) rounds instead — the same acceleration
the large-star/small-star family buys, obtained without changing the
edge set or the convergence proof.

Scale posture: each round is one join + one aggregation (+ the
label-table self-join once jumping engages), all DataFrame-native
(shuffles keyed by node id). Labels are persisted per round and
unpersisted after the next round materializes, so lineage does not
grow unboundedly. The per-round driver action (the convergence
aggregate) is a scalar, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration (weighted) PageRank. Returns (``node_col``, pr).

    pr_{k+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} pr_k(u) · w(u,v) / out_w(u),
    starting from the uniform vector 1/N (simplified formulation: mass
    from dangling nodes is dropped, as both engines must agree on ONE
    formula for the cross-engine oracle).

    Unlike ``connected_components`` this runs a FIXED number of rounds,
    so building the result triggers no driver action at all — the whole
    iteration unrolls into one lazy plan (iterations are typically ≤5
    for ranking features; for convergence-driven runs wrap this in a
    delta-check loop like connected_components). Each round is one
    edges⋈ranks join (keyed by src) plus one groupBy(dst) sum — both
    shuffles keyed by node id, never materializing anything driver-side.
    N enters as a broadcast 1-row aggregate, not a ``.count()``.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    # out-weight per source; broadcast-joined back onto edges once, then
    # the weighted edge list (src, dst, share) is reused every round
    out_w = e.groupBy("src").agg(F.sum("w").alias("tw"))
    shares = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("tw")).alias("share")
    )
    shares.persist()

    n_nodes = nodes.agg(F.count("*").alias("n_nodes"))
    base = nodes.select(F.col(node_col).alias("node")).crossJoin(
        F.broadcast(n_nodes)
    )
    base.persist()

    ranks = base.select("node", (F.lit(1.0) / F.col("n_nodes")).alias("pr"))
    for _ in range(iterations):
        contribs = (
            shares.join(ranks, shares.src == ranks.node)
            .select(F.col("dst").alias("node"), (F.col("pr") * F.col("share")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = base.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping) / F.col("n_nodes")
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Return (``node_col``, cluster) — one row per CALLER node,
    cluster = min reachable id among the caller's nodes.

    ``edges`` may be directed pairs; they are symmetrized here. Isolated
    nodes keep their own id as cluster. Edges may reference endpoints
    absent from ``nodes``: those ids RELAY connectivity (two caller
    nodes joined through a foreign endpoint land in one cluster) but
    never appear in the result and never become cluster labels.

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

    # persist only — no eager count: the first round's convergence
    # action materializes labels (and the symmetrized edges) in the
    # same job, so a separate warm-up count is one whole scheduled job
    # of pure overhead per call (measured ~0.3 s at sf0.1 in q148's
    # chain)
    #
    # Seed the label table from ``nodes`` ALONE — no union with edge
    # endpoints, no distinct: that union-support seed was a shuffle
    # over nodes + 2·edges paid on EVERY call (q148 4.5→7.3 s at
    # sf0.1 across rounds 9-10) to guard a hazard no in-repo caller
    # triggers. The hazard (edges referencing endpoints absent from
    # ``nodes`` grow the label table's support over the first rounds,
    # so equal consecutive SUMS no longer imply a fixed point) is
    # closed by the convergence test instead: track (count, sum) —
    # support only grows, so equal counts pin the support and equal
    # sums then pin the labels. Foreign endpoints enter the table via
    # neighbor rows (never with their own id, so they can't become
    # cluster labels) and still RELAY labels between caller nodes; the
    # final semi-join below trims them from the result.
    nodes_p = nodes.select(F.col(node_col).alias("node")).persist()
    labels = _sized(nodes_p.withColumn("label", F.col("node")))
    labels.persist()

    # Convergence detection WITHOUT a join: min-label propagation is
    # MONOTONE — the support only grows (every labeled node re-enters
    # via the union) and, for a FIXED support, a node's label can only
    # decrease round over round. So (count, sum) repeating between two
    # consecutive rounds ⇒ same support (counts equal) AND elementwise
    # equal labels (elementwise ≤ plus equal sums) ⇒ fixed point. One
    # narrow aggregate per round both materializes the persisted label
    # table and yields the convergence signal; the old new-vs-old
    # join+count paid a whole extra join (3 more stages) per round for
    # the same bit (measured ~2.1 s/round vs ~0.9 at sf0.1 in q148's
    # chain).
    # decimal(38,0): the sum of n node ids can overflow long at
    # cluster scale (1e9 rows × 1e12 ids); decimal keeps it exact,
    # and the cast costs one narrow pass over an already-tiny table.
    # Lineage bound: each round references `labels` TWICE (the union
    # and the neighbor join), so the un-truncated logical plan DOUBLES
    # per round — a high-diameter graph (a 20+-round chain) OOMs the
    # JVM merely stringifying the plan, long before any data pressure.
    # Near-dup graphs converge in 2-3 rounds and never hit this; the
    # periodic eager localCheckpoint bounds plan size to 2^K nodes for
    # ANY diameter at the cost of one checkpoint action per K rounds
    # (pinned by test_connected_components_random_vs_union_find's
    # long-chain case).
    # Pointer jumping from round `shortcut_from` on: after the
    # neighbor-propagate step, re-point every label at ITS OWN label
    # (label(u) ← label(label(u)) — one self-join of the 2-column label
    # table). Plain min-label needs `diameter` rounds — a chain of
    # 100k nodes at 100 TB is 100k shuffles — while propagate+shortcut
    # halves every label path per round, so convergence is
    # O(log diameter). Correctness is unchanged: label values are ids
    # of same-component nodes and label(l) ≤ l, so the composite step
    # is still elementwise non-increasing and component-internal, and
    # the (count, sum) stop stays sound — the composite leaving the
    # vector unchanged forces the propagate half alone to have left it
    # unchanged (both halves are non-increasing), which is the
    # propagation fixed point. Deferred to round 3 because near-dup
    # graphs (diameter 2-3, every in-repo caller) converge before it
    # would fire — the common case pays zero extra joins; only a
    # genuinely deep graph buys the extra label-table shuffle, and it
    # buys exponential round savings with it (pinned by
    # test_connected_components_deep_chain: a 300-link chain converges
    # inside a 25-round budget that pure min-label would blow by 12×).
    shortcut_from = 3
    checkpoint_every = 6
    prev = None
    grew = False
    for i in range(max_iterations):
        neighbor_labels = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels = (
            _sized(labels.select("node", "label").union(neighbor_labels))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if i + 1 >= shortcut_from:
            lut = new_labels.select(
                F.col("node").alias("_l"), F.col("label").alias("_ll")
            )
            new_labels = (
                new_labels.join(lut, new_labels.label == lut._l, "left")
                .select("node", F.coalesce("_ll", "label").alias("label"))
            )
        new_labels.persist()
        row = new_labels.agg(
            F.count("*").alias("n"),
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
        ).first()
        cur = (row["n"], row["s"])
        labels.unpersist()
        labels = new_labels
        if prev is not None and cur[0] != prev[0]:
            grew = True  # support grew past round 1: foreign endpoints
        # n == 0 iff the node set is EMPTY — trivially converged;
        # without this an empty input would run all max_iterations
        # rounds of empty-data jobs
        if cur[0] == 0 or cur == prev:
            break
        prev = cur
        if (i + 1) % checkpoint_every == 0:
            ck = labels.localCheckpoint(eager=True)
            labels.unpersist()
            labels = ck

    out = labels.select("node", "label")
    # Contract: one row per CALLER node, exactly. Foreign endpoints
    # (edges naming ids absent from ``nodes``) relay labels during the
    # rounds but must not appear in the result; the semi-join below
    # runs only when the support actually grew, so the common
    # complete-node case (every in-repo caller) never pays it.
    # Round-1 growth is invisible to the loop's round-over-round count
    # comparison (prev starts at round 1, AFTER neighbors joined), so
    # close it here by comparing the final support against the DISTINCT
    # caller-node count — distinct, because the seed is no longer
    # de-duplicated and raw row multiplicity would both mask real
    # growth (2 dup rows + 1 foreign endpoint looks like no growth) and
    # fake it (dup rows with no foreign endpoints). One aggregate-only
    # job over the cached node table per call — a partial-agg scan of
    # already-materialized partitions, not the whole-table warm-up
    # count priced at ~0.3 s in the loop comment above.
    if not grew and prev is not None:
        n_nodes = nodes_p.agg(
            F.count_distinct(F.col("node")).alias("n")
        ).first()["n"]
        if prev[0] != n_nodes:
            grew = True
    if grew:
        # left_semi keeps `out`'s rows (already one per node from the
        # groupBy) — duplicate caller rows cannot re-expand the result
        out = out.join(nodes_p, "node", "left_semi")
    # truncate lineage: the result otherwise re-runs every round (on
    # now-unpersisted inputs) when the caller executes it
    out = out.localCheckpoint(eager=True)
    sym.unpersist()
    edges_p.unpersist()
    nodes_p.unpersist()
    labels.unpersist()
    return out
