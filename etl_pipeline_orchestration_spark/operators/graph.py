"""Distributed connected components — duplicate-cluster assignment.

The last stage of corpus dedup: near-dup PAIRS (from MinHash/SimHash/
gram-share joins) must become CLUSTERS so one canonical doc per cluster
survives. Components = min reachable doc_id, via min-label propagation
with POINTER JUMPING: each round a node takes the min of (its label,
its neighbors' labels, its label's label). The label-of-label jump
halves path lengths, so convergence is O(log diameter) rounds instead
of O(diameter) — at 10⁹ nodes with chain-shaped boilerplate clusters
that is the difference between ~30 and ~1000 shuffle rounds.

Each round is two hash joins + one aggregate on uniformly-hashed node
ids; ``localCheckpoint`` truncates lineage so plans don't grow with the
iteration count. Convergence detection is one tiny agg action per round
(sum of labels is monotone non-increasing; fixpoint ⇔ unchanged sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component is the
    minimum node id reachable. Edges are treated as undirected."""
    both = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).union(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    both = both.distinct().localCheckpoint(eager=True)
    labels = (
        both.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iter):
        # neighbor min: node <- min(component over neighbors)
        nbr = both.join(
            labels.withColumnRenamed("node", "d2"),
            F.col("d") == F.col("d2"),
        ).select(F.col("s").alias("node"), "component")
        # pointer jump: node <- component(component(node))
        l2 = labels.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        jump = labels.join(
            l2, F.col("component") == F.col("c_node")
        ).select("node", F.col("c_comp").alias("component"))
        labels = (
            labels.union(nbr)
            .union(jump)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).head()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
