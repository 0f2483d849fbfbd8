"""Iterative graph operators: connected components.

The engine's iterative-algorithm shape (driver-controlled loop of
distributed joins/aggregations). Used by the dedup family to turn
pairwise near-dup matches into clusters; exposed as a library
operator because any entity-resolution pipeline needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components of an undirected pair graph by min-label
    propagation; returns ``(node, component)`` with component = min
    node id in the component.

    Each round: pull every neighbor's current label across the edges,
    keep the per-node minimum, stop when no label changed.
    Convergence takes O(component diameter) rounds. localCheckpoint
    truncates per-round lineage — without it, round i re-plans and
    re-executes rounds 1..i-1 (the classic iterative-DataFrame trap).

    Scale: each round shuffles |edges| on the join key and |nodes|
    for the min-aggregate; for planet-scale graphs switch to the
    large-star/small-star variant — same loop skeleton.
    """
    edges = (
        pairs.select(col(src).alias("a"), col(dst).alias("b"))
        .union(pairs.select(col(dst).alias("a"), col(src).alias("b")))
    )
    labels = (
        edges.select(col("a").alias("node")).distinct().withColumn("comp", col("node"))
    )
    for _ in range(max_iterations):
        candidate = edges.join(labels, edges.b == labels.node).select(
            col("a").alias("node"), col("comp")
        )
        new_labels = (
            labels.unionByName(candidate)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"), "node")
            .filter(col("comp") != col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", col("comp").alias("component"))
    raise RuntimeError(f"did not converge in {max_iterations} iterations")
