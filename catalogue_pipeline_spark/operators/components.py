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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) where component = min node id in the component.

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
    labels = sym.groupBy("a").agg(F.min("b").alias("comp")).withColumnRenamed("a", "id")
    labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    for _ in range(max_iterations):
        # propagate the neighbour's label: new = min(own, min over neighbours)
        prop = (
            sym.join(labels.withColumnsRenamed({"id": "b", "comp": "nbr_comp"}), on="b")
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("min_nbr"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(prop, on="id", how="left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("min_nbr"), F.col("comp"))).alias("comp"),
            )
        )
        new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.withColumnRenamed("comp", "component")


def component_digest(labels: DataFrame, id_col: str = "id", comp_col: str = "component") -> DataFrame:
    """(component, subgraph_id, members) — sha256 of '+'-joined sorted member
    ids (SubgraphId.scala:14-23), plus the sorted member list (A3/O2)."""
    return labels.groupBy(comp_col).agg(
        F.sha2(F.concat_ws("+", F.array_sort(F.collect_set(id_col))), 256).alias("subgraph_id"),
        F.array_sort(F.collect_list(id_col)).alias("members"),
    )
