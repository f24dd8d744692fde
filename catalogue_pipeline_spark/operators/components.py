"""Connected components + stable component digests (G1/G2).

The reference's matcher maintains an incremental works graph and recomputes
affected components per batch (WorkGraphUpdater.scala:98-193, scalax
componentTraverser). The Spark-native equivalent is iterative min-label
propagation over the edge DataFrame — each iteration is a join+groupBy (both
map-side combinable), converging in O(log(diameter)) rounds with the
large-star optimization of propagating through both edge directions.

``component_digest`` reproduces SubgraphId.scala:8-23: sha256 over the
'+'-joined sorted member ids — stable across versions and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


class ComponentConvergenceError(RuntimeError):
    """Raised when min-label propagation exhausts max_iterations with labels
    still changing — returning the partial labels would silently mislabel
    long-diameter components (the G1 correctness hazard at scale)."""


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(id, component) where component = min node id in the component.

    Each round does (1) a neighbour-min propagation and (2) a pointer-jump
    (comp := comp(comp)) — the label graph's diameter halves per round, so a
    path of diameter d converges in O(log d) rounds (hash-to-min family,
    Rastogi et al. "Finding Connected Components in Map-Reduce"), not the
    O(d) of plain propagation. Invariant: comp(id) is always a node id inside
    id's component, so the fixpoint (no change in either step) is exactly the
    min-label assignment.

    Raises ComponentConvergenceError instead of returning unconverged labels;
    at the default 50 rounds that would need diameter > ~2^49.

    Handles isolated self-edges naturally; suppressed nodes should be
    filtered from ``edges`` beforehand (F6 semantics).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .union(edges.select(F.col(src).alias("a"), F.col(src).alias("b")))
        .union(edges.select(F.col(dst).alias("a"), F.col(dst).alias("b")))
        .distinct()
    )
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    labels = sym.groupBy("a").agg(F.min("b").alias("comp")).withColumnRenamed("a", "id")
    # localCheckpoint (not just persist): each round references labels four
    # times (neighbour join + jump + jump join + change check), so without
    # lineage truncation the Catalyst plan quadruples per round and the
    # driver OOMs on plan analysis long before data size matters.
    labels = labels.localCheckpoint()
    converged = False
    for _ in range(max_iterations):
        # step 1: neighbour-min — new = min(own, min over neighbours' labels)
        prop = (
            sym.join(labels.withColumnsRenamed({"id": "b", "comp": "nbr_comp"}), on="b")
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("min_nbr"))
            .withColumnRenamed("a", "id")
        )
        stepped = (
            labels.join(prop, on="id", how="left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("min_nbr"), F.col("comp"))).alias("comp"),
            )
        )
        # step 2: pointer jump — comp := comp(comp). comp is always a node id
        # in the same component, so its label exists and stays in-component.
        jump = stepped.select(F.col("id").alias("comp"), F.col("comp").alias("comp2"))
        new_labels = (
            stepped.join(jump, on="comp", how="left")
            .select("id", F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp"))
        )
        new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise ComponentConvergenceError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    return labels.withColumnRenamed("comp", "component")


def component_digest(labels: DataFrame, id_col: str = "id", comp_col: str = "component") -> DataFrame:
    """(component, subgraph_id, members) — sha256 of '+'-joined sorted member
    ids (SubgraphId.scala:14-23), plus the sorted member list (A3/O2)."""
    return labels.groupBy(comp_col).agg(
        F.sha2(F.concat_ws("+", F.array_sort(F.collect_set(id_col))), 256).alias("subgraph_id"),
        F.array_sort(F.collect_list(id_col)).alias("members"),
    )
