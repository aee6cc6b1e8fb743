"""Distributed graph primitives: connected components and PageRank.

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
    # Driver-action discipline, CC carve-out: unlike pagerank (fixed
    # iteration count — zero driver scalars, see its docstring), a
    # FIXED-POINT loop must observe convergence somewhere, and that
    # observation is inherently a driver decision. The payload is one
    # aggregated row (sum of labels) per iteration — a control-flow
    # scalar, not a data collect; tools/plan_audit.py whitelists
    # exactly this pattern.
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


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """(node, rank) — PageRank with a FIXED iteration count, the
    second iterative-algorithm shape next to connected components
    (fixed-point). The corpus-curation use: link-derived document
    authority as a quality prior (seed selection, crawl weighting).

    Per iteration: one equi-join (ranks⋈edges on src) + one group-by
    on dst + a left join back to nodes for dangling mass — all
    hash-shuffles on node id, each reusing the same partitioning.
    Dangling nodes (no out-links) redistribute their mass uniformly,
    so total rank stays 1 (asserted in tests). ``localCheckpoint``
    truncates lineage per round.

    Driver-action discipline: the node count and per-iteration
    dangling mass are 1-row aggregates folded into the plan as
    broadcast crossJoins — ONE job per iteration (the eager
    ``localCheckpoint``), no ``collect()``/``count()`` scalars pulled
    to the driver. At cluster scale an extra driver action per
    iteration doubles the iteration latency and serializes on the
    driver; the broadcast-scalar form keeps the whole update
    pipelined inside one DAG.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e = e.join(out_deg, "src").localCheckpoint(eager=True)

    # Node count as a broadcast 1-row frame, not a driver scalar.
    n_df = nodes.agg(
        F.count("*").cast("double").alias("n_nodes")
    ).localCheckpoint(eager=True)
    ranks = (
        nodes.select(F.col(node_col).alias("node"))
        .crossJoin(F.broadcast(n_df))
        .select("node", (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
        .localCheckpoint(eager=True)
    )
    # Nodes with no out-edges — their rank is the dangling mass.
    dangling_nodes = (
        nodes.select(F.col(node_col).alias("node"))
        .join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti")
        .localCheckpoint(eager=True)
    )

    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        # Dangling mass as a broadcast 1-row aggregate inside the same
        # job — not a collect().
        dang = ranks.join(dangling_nodes, "node", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
        )
        ranks = (
            ranks.select("node")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("dangling_mass") / F.col("n_nodes")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
