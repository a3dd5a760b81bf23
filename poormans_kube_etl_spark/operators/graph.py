"""Iterative graph operators: connected components for dedup clustering.

Near-duplicate PAIRS (MinHash/SimHash output) only become a dedup
DECISION once transitively closed: if a~b and b~c, one canonical doc
must represent {a,b,c}. That closure is connected components — the
canonical example of an iterative algorithm no single SQL query
expresses (the driver's rows-only class).

Algorithm: label propagation to fixpoint. Every vertex starts labeled
with itself; each round, every vertex adopts the min label among itself
and its neighbors; stop when no label changed. Rounds = graph diameter
(near-dup clusters are shallow — a handful of rounds). Each round is
one shuffle (groupBy vertex); lineage is cut with localCheckpoint every
round so the plan doesn't grow exponentially across iterations — the
standard Spark iterative-algorithm discipline (GraphX/GraphFrames do
the same internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """DataFrame[node, component] from an undirected edge list.

    ``component`` is the minimum node id reachable from ``node`` —
    deterministic, so the min-id member is the canonical keeper."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # neighbor labels: for each node, the labels of everyone it touches
        neighbor_min = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("src", "node")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .localCheckpoint()  # cut lineage: constant-depth plan per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Near-dup pairs → (node, keeper): every clustered doc mapped to
    its cluster's min-id canonical representative. Docs in no pair are
    absent (they keep themselves)."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.select(
        F.col("node").alias("doc"), F.col("component").alias("keeper")
    )
