"""Data-quality operators (SURVEY.md §2.7 V6, §2.8 G3).

``detect_unresolvable_conflicts`` — the CalmStore rule (CalmStore.scala:54-66):
two records for one key with the SAME timestamp but DIFFERENT content is an
unresolvable conflict (the LWW tie-break will pick one deterministically, but
the reference treats it as a hard data error worth surfacing).

``traverse_hierarchy`` — ancestors/descendants over parent edges
(work_queries.py:1-39 HAS_PARENT*) via iterative self-joins, bounded depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_unresolvable_conflicts(
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Keys whose MAX-timestamp rows disagree on content:
    (key..., ts, n_variants). Empty result = batch is conflict-free."""
    content = content_cols or ["text"]
    mx = batch.groupBy(*key_cols).agg(F.max(ts_col).alias("_max_ts"))
    at_max = batch.join(mx, on=key_cols).filter(F.col(ts_col) == F.col("_max_ts"))
    return (
        at_max.groupBy(*key_cols, "_max_ts")
        .agg(F.countDistinct(*content).alias("n_variants"))
        .filter(F.col("n_variants") > 1)
        .withColumnRenamed("_max_ts", ts_col)
    )


def traverse_hierarchy(
    edges: DataFrame,
    start: DataFrame,
    direction: str = "up",
    max_depth: int = 10,
    child_col: str = "child",
    parent_col: str = "parent",
    id_col: str = "id",
) -> DataFrame:
    """All ancestors (direction="up") or descendants ("down") reachable from
    ``start`` ids within max_depth hops: (id, node, depth). Iterative
    self-joins — each round one join+distinct; converges early when a
    frontier empties (G3)."""
    hop_from, hop_to = (child_col, parent_col) if direction == "up" else (parent_col, child_col)
    frontier = start.select(F.col(id_col).alias("id"), F.col(id_col).alias("node"))
    # each round references the previous frontier/seen several times (join +
    # anti-join + isEmpty probe) — localCheckpoint truncates the lineage so
    # round N costs O(frontier), not O(replay rounds 1..N)
    frontier = frontier.localCheckpoint()
    seen = frontier.withColumn("depth", F.lit(0)).localCheckpoint()
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[hop_from])
            .select("id", F.col(hop_to).alias("node"))
            .distinct()
        )
        nxt = nxt.join(seen.select("id", "node"), on=["id", "node"], how="left_anti")
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt.withColumn("depth", F.lit(depth))).localCheckpoint()
        frontier = nxt
    return seen.filter(F.col("depth") > 0)
