"""Connected components over candidate-pair edges (dedup clustering).

The last stage of a near-duplicate pipeline: LSH banding emits
candidate *pairs* (`dedupe.near_dup_candidates`), but a corpus
cleaner needs *clusters* — the transitive closure of the pair
relation — so it can keep one canonical document per cluster.
That is connected components on the pair graph.

Algorithm: iterative min-label propagation (the "hash-to-min" /
large-star family used by GraphX and map-reduce CC literature).
Each round every node adopts the minimum label in its closed
neighborhood; rounds repeat until a fixpoint.  Convergence takes
O(diameter) rounds — near-dup graphs are unions of small
quasi-cliques, so the diameter is tiny (2-4) even at corpus scale.

Scale shape per round: one shuffle (groupBy node) over the edge
list; labels are re-derived, never collected.  The driver-side loop
only ever pulls back a single aggregate (the number of labels that
changed), and `localCheckpoint` truncates the growing lineage so
round N's plan does not replay rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Component label per node of the undirected edge list.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id reachable from ``node`` (a canonical, deterministic
    representative — the property the DuckDB recursive-CTE oracle
    recomputes).  Nodes only appear if they occur in ``edges``;
    callers union in singletons if isolated ids must be kept.

    Raises if ``max_iter`` rounds don't reach a fixpoint (pathological
    diameter — for near-dup graphs that indicates a bug upstream, not
    a bigger graph).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # truncate the (possibly expensive) edge-producing lineage ONCE;
        # nodes/labels below must derive from the checkpointed plan or
        # their own checkpoints would recompute it
        .localCheckpoint(eager=True)
    )
    # closed neighborhood: every node is its own neighbor, so labels
    # can only decrease and a fixpoint is well defined
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for i in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
                (F.coalesce("nbr_min", "component") < F.col("component")).alias(
                    "__changed"
                ),
            )
        ).localCheckpoint(eager=True)
        labels = updated.drop("__changed")
        # fixpoint probe every 2nd round only: propagation is
        # idempotent past convergence, so skipping a probe risks at
        # most one redundant (cheap) round, while probing costs a
        # driver-visible collect job each time — at near-dup graph
        # diameters (2-4) this halves the scheduling overhead
        if i % 2 == 1 or i == max_iter - 1:
            n_changed = updated.agg(
                F.sum(F.col("__changed").cast("long")).alias("c")
            ).collect()[0]["c"]
            if not n_changed:
                return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def cluster_stats(labels: DataFrame) -> DataFrame:
    """Per-component size summary: ``(component, n_members)``."""
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
