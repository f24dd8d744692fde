"""Path-hierarchy graph queries (the catalogue_graph ingestor slice).

The reference stores works in a property graph where each work links to a
path identifier and identifiers form a HAS_PARENT tree, then answers
ancestor/children/descendant queries in openCypher
(catalogue_graph/src/ingestor/queries/work_queries.py:1-39). The relational
re-expression: a work's path ("PP/CRI/J/2") encodes the whole identifier
chain, so

  * ancestor works  = works whose path is a '/'-boundary PREFIX
  * children works  = works exactly one segment below
  * ``parts`` of a node = its direct child count in the path tree

Spark-first scale shape: prefix matching is NOT a string-prefix theta-join
(quadratic) — each work explodes its ≤ depth proper prefixes and the match
is an EQUI-join on the prefix string, so Catalyst plans a hash join keyed
on path. Depth is bounded (archival hierarchies are shallow), so the
explode factor is small and constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segs(col):
    return F.split(col, "/")


def with_parent_path(works: DataFrame, path_col: str = "path") -> DataFrame:
    """Adds parent_path (path minus last segment; null for roots) and depth."""
    segs = _segs(F.col(path_col))
    depth = F.size(segs)
    return works.withColumn("depth", depth).withColumn(
        "parent_path",
        F.when(depth > 1, F.concat_ws("/", F.slice(segs, 1, depth - 1))),
    )


def path_tree_parts(works: DataFrame, path_col: str = "path") -> DataFrame:
    """(path, parts): direct-child count of every node in the path tree —
    children are DISTINCT identifiers one segment below, counting identifier
    nodes implied by deeper works too (the HAS_PARENT tree contains every
    prefix, not just work-bearing paths)."""
    segs = _segs(F.col(path_col))
    depth = F.size(segs)
    # every proper-or-full prefix of every work path is an identifier node
    prefixes = works.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), depth),
                lambda d: F.concat_ws("/", F.slice(segs, 1, d)),
            )
        ).alias("node_path")
    ).distinct()
    kids = with_parent_path(prefixes.withColumnRenamed("node_path", "path"))
    return (
        kids.filter(F.col("parent_path").isNotNull())
        .groupBy(F.col("parent_path").alias("path"))
        .agg(F.count(F.lit(1)).alias("parts"))
    )


def work_ancestors(
    works: DataFrame, id_col: str = "work_id", path_col: str = "path"
) -> DataFrame:
    """(id, ancestor_id, hops, ancestor_parts) — every ancestor WORK of each
    work, hops = path-depth difference, ancestor_parts = the ancestor
    identifier's direct-child count (WORK_ANCESTORS_QUERY semantics:
    ancestors ordered by hops carry COUNT(ancestor_tree_identifier))."""
    segs = _segs(F.col(path_col))
    depth = F.size(segs)
    pref = works.select(
        F.col(id_col).alias("id"),
        depth.alias("_d"),
        F.explode(
            F.when(
                depth > 1,
                F.transform(
                    F.sequence(F.lit(1), depth - 1),
                    lambda d: F.concat_ws("/", F.slice(segs, 1, d)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("anc_path"),
    )
    anc_works = works.select(
        F.col(path_col).alias("anc_path"),
        F.col(id_col).alias("ancestor_id"),
        F.size(_segs(F.col(path_col))).alias("_ad"),
    )
    parts = path_tree_parts(works, path_col).withColumnsRenamed({"path": "anc_path"})
    return (
        pref.join(anc_works, "anc_path")
        .join(parts, "anc_path", "left")
        .select(
            "id",
            "ancestor_id",
            (F.col("_d") - F.col("_ad")).cast("long").alias("hops"),
            F.coalesce("parts", F.lit(0)).cast("long").alias("ancestor_parts"),
        )
    )


def work_children(
    works: DataFrame, id_col: str = "work_id", path_col: str = "path"
) -> DataFrame:
    """(id, child_id, child_parts) — works exactly one segment below, each
    with its own direct-child count (WORK_CHILDREN_QUERY semantics)."""
    wp = with_parent_path(works, path_col)
    parts = path_tree_parts(works, path_col)
    parents = works.select(F.col(path_col).alias("parent_path"), F.col(id_col).alias("id"))
    return (
        wp.filter(F.col("parent_path").isNotNull())
        .join(parents, "parent_path")
        .join(parts.withColumnsRenamed({"path": path_col}), path_col, "left")
        .select(
            "id",
            F.col(id_col).alias("child_id"),
            F.coalesce("parts", F.lit(0)).cast("long").alias("child_parts"),
        )
    )


def work_descendants(
    works: DataFrame, id_col: str = "work_id", path_col: str = "path"
) -> DataFrame:
    """(id, descendant_id, hops) — inverse of work_ancestors."""
    return work_ancestors(works, id_col, path_col).select(
        F.col("ancestor_id").alias("id"),
        F.col("id").alias("descendant_id"),
        "hops",
    )
