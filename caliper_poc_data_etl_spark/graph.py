"""Distributed connected components (min-label propagation).

The engine's global fuzzy-dedup path needs *transitive* duplicate
groups: if A~B and B~C then {A,B,C} must collapse to one keeper even
when A~C was never emitted as a pair. That is connected components
over the candidate-pair graph — the standard final stage of a
large-scale MinHash dedup pipeline.

Implementation: iterative min-label propagation (each node adopts the
smallest component id among itself and its neighbors, repeated to a
fixed point). Per iteration: one equi-join edges⋈labels + one
group-by — both hash-shuffles on node id, no quadratic work. The
iteration count is bounded by the graph diameter, which for near-dup
clusters is tiny (dup groups are near-cliques); a `max_iter` guard
caps pathological chains. Convergence is detected with a cheap
`sum(comp)` action (the label vector is monotonically non-increasing,
so an unchanged sum means a fixed point).

`localCheckpoint` truncates lineage each round so the plan does not
grow with iterations (Spark's iterative-algorithm idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, comp) — comp is the minimum node id in the component.

    ``nodes``: one row per node (singletons keep comp = self).
    ``edges``: undirected edge list; either orientation is fine.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("comp")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]

    for _ in range(max_iter):
        # Neighbor labels: for edge (src, dst), dst's current comp is a
        # candidate label for src.
        neighbor = sym.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "comp")
        labels = (
            labels.union(neighbor)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels
