"""Distributed connected components over an edge DataFrame.

The engine already does cross-tile connected-component merging for
polygonize (raster/polygonize_ops.py: per-tile union-find + label
propagation across tile seams, after alg/gdalrasterpolygonenumerator.cpp).
This is the same fixpoint restated for an arbitrary edge list — the
missing last stage of a near-duplicate pipeline: LSH/Jaccard emits PAIRS,
but dedup acts on CLUSTERS (keep one canonical doc per component).

Algorithm: min-label propagation. labels(node) starts at node; each round
every edge offers its endpoint's label to the other side and each node
keeps the min. Labels are non-increasing and bounded below, so the
aggregate label sum is a strictly decreasing convergence witness; rounds
needed = graph diameter (near-dup clusters are shallow — a handful).
Each round is one shuffle (join) + one shuffle (groupBy-min) with
map-side partial min; lineage is truncated with localCheckpoint so the
plan stays O(1) per round instead of O(rounds). For adversarial
high-diameter graphs the two-phase large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce") drops rounds to
O(log n); near-dup graphs don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """-> (node, component) where component = min node id in the node's
    connected component. Nodes are whatever appears in the edge list."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint()

    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(max_iter):
        msgs = e.join(labels, e["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("lbl")
        )
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:  # fixpoint: labels are monotone non-increasing
            return labels.select("node", F.col("lbl").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the bound — use more rounds or the "
        "large-star/small-star variant)"
    )
