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

Fault-tolerance posture (:func:`truncate_lineage`): localCheckpoint
stores the per-round blocks in EXECUTOR storage only — fast (no
distributed filesystem round-trip), but an executor loss drops those
partitions and fails the job, because the lineage needed to recompute
them was just truncated. That is the right trade on local[N] and for
latency-critical iterative jobs on stable clusters; a 100 TB run on
preemptible/spot executors should flip
``spark.graft.checkpoint.reliable=true`` (and call
``sc.setCheckpointDir``) so each round persists to the reliable store
instead — same values, one extra write barrier per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def truncate_lineage(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Per-round lineage truncation with a documented posture switch.

    Default (``spark.graft.checkpoint.reliable`` unset/false):
    ``localCheckpoint(eager)`` — executor-storage blocks, no fault
    tolerance for the checkpointed partitions (module docstring).
    Reliable mode: ``checkpoint(eager)`` to the configured checkpoint
    dir — survives executor loss at the cost of a distributed write
    per round. Values are identical either way; tests pin both modes
    and the once-per-round execution of lazy local checkpoints."""
    try:
        reliable = (
            df.sparkSession.conf.get("spark.graft.checkpoint.reliable", "false")
            or "false"
        )
    except Exception:  # pragma: no cover - conf lookup must never fail a job
        reliable = "false"
    if str(reliable).lower() == "true":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


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
    sym = truncate_lineage(sym.distinct())

    labels = truncate_lineage(
        nodes.select(F.col(node_col).alias("node"), F.col(node_col).alias("comp"))
    )
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
        labels = truncate_lineage(
            labels.union(neighbor)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
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
    e = truncate_lineage(e.join(out_deg, "src"))

    # Node count as a broadcast 1-row frame, not a driver scalar.
    n_df = truncate_lineage(
        nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    )
    ranks = truncate_lineage(
        nodes.select(F.col(node_col).alias("node"))
        .crossJoin(F.broadcast(n_df))
        .select("node", (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
    )
    # Nodes with no out-edges — their rank is the dangling mass.
    dangling_nodes = truncate_lineage(
        nodes.select(F.col(node_col).alias("node"))
        .join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti")
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
        )
        ranks = truncate_lineage(ranks)
    return ranks
