"""Distributed connected components — dup-pair graphs → clusters.

The dedup operators (exact / n-gram Jaccard / MinHash-LSH / SimHash /
embedding-cosine, operators/dedup.py) emit near-duplicate PAIRS; a real
training-data pipeline must then group pairs into clusters and keep one
survivor per cluster (the reference's first-seen-wins key dedup,
knowledge_model/main.py:283-291 + inference/postprocess.py:75-112, is
the 2-node special case of this).  Connected components is the standard
formulation; at 100 TB the dup graph has billions of edges, so this is
an iterative DataFrame algorithm, not a driver-side union-find.

Algorithm: min-label propagation with pointer jumping —
each round every node takes the smallest label among itself and its
neighbors (one shuffle), then labels chase their own label's label
(path halving, one more shuffle).  Pointer jumping makes convergence
O(log diameter) rounds instead of O(diameter); near-dup clusters are
near-cliques, so 2-3 rounds typically suffice.  Lineage is truncated
every round with localCheckpoint — on a cluster with a configured
checkpoint dir, swap for ``checkpoint()`` to also survive executor
loss.  Labels only ever decrease, so the sum of labels is a monotone
convergence witness: when it stops changing, the fixpoint is reached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``.

    ``component`` is the minimum node id reachable from the node —
    deterministic across runs, partitionings, and cluster sizes.
    Raises if ``max_iter`` rounds don't reach the fixpoint (pointer
    jumping needs ~log2(longest path) rounds; 30 covers any graph whose
    diameter fits in an int).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iter):
        # 1. neighbor propagation: label(v) <- min(label(v), label(u) for u~v)
        nbr = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), "label"
        )
        labels = (
            labels.unionByName(nbr).groupBy("node").agg(F.min("label").alias("label"))
        )
        # 2. pointer jumping: label(v) <- label(label(v)) — halves chain depth
        hop = labels.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        labels = (
            labels.join(hop, labels["label"] == hop["l_node"], "left")
            .select("node", F.coalesce("l_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # labels are positive and only decrease → sum is a monotone
        # witness; decimal(38,0) accumulation cannot overflow for any
        # realistic graph (int64 sums would wrap silently — or throw
        # under ANSI — for billions of hash-derived ids)
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_cluster_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Drop every non-minimal member of each near-dup cluster.

    ``pairs`` is any (id_a, id_b) output of the dedup ladder; rows of
    ``df`` whose id is a cluster member with a smaller-id representative
    are removed (first-seen-wins, matching the pairwise operators'
    keep-min convention).  The doomed-id set is tiny relative to the
    corpus (it IS the duplicates), so the anti-join broadcasts.
    """
    doomed = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(doomed, id_col, "left_anti")
