"""Incremental catalogue-graph removers for works / images / path
identifiers — the per-entity counterparts of the concepts remover already
in plans/concepts.py.

The reference (catalogue_graph/src/graph/removers/) keeps the Neptune
graph in sync with the merged index by computing, per 40k-node batch, the
entities present in the graph but no longer justified by the index, then
deleting them behind a fractional-change safety valve
(base_graph_remover_incremental.py):

  * edge sync      — for each node streamed from the index, the set of
                     edge ids the index implies; graph edges incident to
                     THOSE nodes that the index set lacks are removed
                     (BaseGraphEdgeRemover.get_edge_ids_to_remove — a
                     per-key set difference, batched)
  * works nodes    — every work whose merged type is not 'Visible'
                     (catalogue_works_remover.py ES_QUERY_NON_VISIBLE)
  * image nodes    — Image nodes with no incident HAS_IMAGE edge
                     (catalogue_images_remover.py get_disconnected_node_ids)
  * path-id nodes  — PathIdentifier nodes with no incident
                     HAS_PATH_IDENTIFIER edge
                     (catalogue_work_identifiers_remover.py)
  * existence gate — candidate ids are filtered to those actually in the
                     graph before counting (get_existing_ids)
  * safety valve   — abort when removals exceed 20% of the entity's total
                     (utils/safety.validate_fractional_change), force_pass
                     to override

Spark-first: the Neptune node/edge stores and the merged index are both
DataFrames here (the graph side is exactly what plans/graph_works.py
emits), so every rule above is a join:

  * per-key set difference  → semi-join graph edges to the index's node
                              worklist, then LEFT ANTI join on
                              (node_id, edge_id) — no per-node sets ever
                              materialise on a driver, no 40k batching
  * disconnected nodes      → LEFT ANTI join of nodes against the union
                              of the edge endpoints
  * existence gate          → LEFT SEMI join against the graph ids
  * safety valve            → one count() pair through the repo's A8 gate
                              (operators/precedence.fractional_change_gate,
                              threshold 0.2 here as in utils/safety.py)

All shuffles key on node/edge id; at 100 TB each is one hash exchange and
the worklist side is the (small) changed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.precedence import fractional_change_gate

# utils/safety.py DEFAULT_THRESHOLD for the graph removers
REMOVER_THRESHOLD = 0.2


def edges_to_remove(
    index_nodes: DataFrame, index_edges: DataFrame, graph_edges: DataFrame
) -> DataFrame:
    """BaseGraphEdgeRemover.get_edge_ids_to_remove as joins.

    ``index_nodes(node_id)`` — every node the index streamed this window
    (including ones with NO edges: their graph edges must all go);
    ``index_edges(node_id, edge_id)`` — the edges the index implies;
    ``graph_edges(node_id, edge_id)`` — the graph's current incident
    edges.  Returns graph edges on a streamed node that the index lacks."""
    consulted = graph_edges.join(
        index_nodes.select("node_id").distinct(), "node_id", "left_semi"
    )
    return consulted.join(
        index_edges.select("node_id", "edge_id"),
        ["node_id", "edge_id"],
        "left_anti",
    )


def disconnected_node_ids(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """NeptuneClient.get_disconnected_node_ids: nodes(node_id) with no
    incident edge in edges(from_id, to_id) — an anti-join against the
    union of both endpoints."""
    endpoints = (
        edges.select(F.col("from_id").alias("node_id"))
        .unionByName(edges.select(F.col("to_id").alias("node_id")))
        .distinct()
    )
    return nodes.select("node_id").distinct().join(endpoints, "node_id", "left_anti")


def _existing(candidates: DataFrame, graph_ids: DataFrame, key: str) -> DataFrame:
    """get_existing_ids: keep candidates actually present in the graph."""
    return candidates.join(
        graph_ids.select(key).distinct(), key, "left_semi"
    )


def _gated_count(existing: DataFrame, total: int, force_pass: bool) -> int:
    n = existing.count()
    fractional_change_gate(
        n, total, threshold=REMOVER_THRESHOLD, force=force_pass
    )
    return n


def remove_works_nodes(
    merged_works: DataFrame, graph_work_nodes: DataFrame, force_pass: bool = False
) -> DataFrame:
    """catalogue_works_remover.get_node_ids_to_remove: every merged work
    whose type is not 'Visible', filtered to nodes the graph holds, behind
    the 20% valve.  merged_works needs (work_id, type); graph_work_nodes
    is plans/graph_works.work_nodes output (node_id = work id)."""
    candidates = (
        merged_works.filter(F.col("type") != "Visible")
        .select(F.col("work_id").alias("node_id"))
        .distinct()
    )
    existing = _existing(
        candidates, graph_work_nodes.select("node_id"), "node_id"
    )
    _gated_count(existing, graph_work_nodes.count(), force_pass)
    return existing


def remove_works_edges(
    merged_works_concepts: DataFrame,
    merged_work_ids: DataFrame,
    graph_concept_edges: DataFrame,
    force_pass: bool = False,
) -> DataFrame:
    """catalogue_works_remover edge pass: HAS_CONCEPT edges present in the
    graph but absent from the merged works' concept sets.

    ``merged_works_concepts(work_id, concept_id)``; ``merged_work_ids``
    the streamed worklist; ``graph_concept_edges(from_id, to_id)`` —
    plans/graph_works.work_concept_edges output."""
    index_nodes = merged_work_ids.select(F.col("work_id").alias("node_id"))
    index_edges = merged_works_concepts.select(
        F.col("work_id").alias("node_id"),
        F.concat_ws("--", "work_id", "concept_id").alias("edge_id"),
    )
    graph = graph_concept_edges.select(
        F.col("from_id").alias("node_id"),
        F.concat_ws("--", "from_id", "to_id").alias("edge_id"),
    )
    out = edges_to_remove(index_nodes, index_edges, graph)
    _gated_count(out, graph.count(), force_pass)
    return out


def remove_disconnected_images(
    image_nodes: DataFrame, work_image_edges: DataFrame, force_pass: bool = False
) -> DataFrame:
    """catalogue_images_remover: Image nodes with no HAS_IMAGE edge (no
    edge pass for images).  Inputs are plans/graph_works.
    image_nodes_and_edges outputs (node_id / from_id,to_id)."""
    out = disconnected_node_ids(image_nodes, work_image_edges)
    _gated_count(out, image_nodes.count(), force_pass)
    return out


def remove_path_identifier_entities(
    merged_path_ids: DataFrame,
    pid_nodes: DataFrame,
    pid_edges: DataFrame,
    force_pass: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """catalogue_work_identifiers_remover, both passes.

    ``merged_path_ids(work_id, path_identifier)`` — the merged index's
    per-work path identifier (NULL → the work implies no edge);
    ``pid_nodes(node_id)`` / ``pid_edges(from_id, to_id)`` — the graph's
    PathIdentifier nodes and HAS_PATH_IDENTIFIER edges
    (plans/graph_works.path_identifier_graph output shape).

    Returns (edge_ids_to_remove, node_ids_to_remove): stale edges by the
    per-work set difference, then nodes left with no incident edge AFTER
    those removals (the reference runs edges before nodes, so the
    disconnected check sees the post-removal graph)."""
    index_nodes = merged_path_ids.select(F.col("work_id").alias("node_id"))
    index_edges = merged_path_ids.filter(
        F.col("path_identifier").isNotNull()
    ).select(
        F.col("work_id").alias("node_id"),
        F.concat_ws("--", "work_id", "path_identifier").alias("edge_id"),
    )
    graph = pid_edges.select(
        F.col("from_id").alias("node_id"),
        F.concat_ws("--", "from_id", "to_id").alias("edge_id"),
        "from_id",
        "to_id",
    )
    stale = edges_to_remove(
        index_nodes, index_edges, graph.select("node_id", "edge_id")
    )
    _gated_count(stale, graph.count(), force_pass)

    surviving = graph.join(stale, ["node_id", "edge_id"], "left_anti").select(
        "from_id", "to_id"
    )
    orphans = disconnected_node_ids(pid_nodes, surviving)
    _gated_count(orphans, pid_nodes.count(), force_pass)
    return stale.select("edge_id"), orphans

# utils/safety.py DEFAULT_THRESHOLD for the index-deletions step
INDEX_DELETIONS_THRESHOLD = 0.05


def index_deletions(
    deleted_ids_log: DataFrame, index_ids: DataFrame, force_pass: bool = False
) -> DataFrame:
    """ingestor/steps/ingestor_deletions.py: the node ids the graph remover
    logged as deleted (its parquet deleted_ids artifact — here the repo's
    remover delete-log table) become search-index deletions, gated at 5% of
    the index's current document count (a tighter valve than the graph's
    20%).  Returns the ids to delete that the index actually holds."""
    ids = deleted_ids_log.select("node_id").distinct()
    existing = ids.join(index_ids.select("node_id").distinct(), "node_id", "left_semi")
    n = existing.count()
    fractional_change_gate(
        n, index_ids.count(), threshold=INDEX_DELETIONS_THRESHOLD, force=force_pass
    )
    return existing


# --------------------------------------------------------------- full mode
#
# graph/steps/graph_remover.py:1-188 — the snapshot-diff recovery path.
# Where the incremental removers above trust per-window worklists, the
# full remover diffs the ENTIRE previous bulk-load id snapshot against the
# current one: ids that disappeared are deleted (behind the same 20%
# valve), ids that appeared are logged, both logs are pruned to a one-year
# horizon, and the current ids become the next run's snapshot.

IDS_LOG_SCHEMA = "timestamp date, node_id string"


def full_graph_remover(
    previous_ids: DataFrame | None,
    current_ids: DataFrame,
    deleted_log: DataFrame | None,
    added_log: DataFrame | None,
    *,
    now,
    force_pass: bool = False,
) -> dict[str, DataFrame]:
    """``graph_remover.handler`` (graph_remover.py:87-137) as one plan.

    Inputs: ``previous_ids`` / ``current_ids`` — single-column
    ``node_id`` frames (the archived parquet snapshot and the current
    bulk-load file; ``previous_ids=None`` is the first-run arm,
    :95-103); ``deleted_log`` / ``added_log`` — ``(timestamp date,
    node_id)`` append-logs (``None`` = not found, first run, :66-72).

    Returns a dict of frames:

    * ``deleted_ids`` / ``added_ids`` — the snapshot diff (:110-113;
      both EMPTY on the first run — the reference never mass-adds on
      bootstrap);
    * ``deleted_log`` / ``added_log`` — this run's ids appended with
      ``now``'s date and entries older than one year pruned
      (log_ids, :60-84);
    * ``snapshot`` — ``current_ids``, the next run's previous
      (update_node_ids_snapshot, :52-57).

    The 20% fractional valve (validate_fractional_change, safety.py:8-46)
    measures deletions against the PREVIOUS snapshot size and passes
    trivially when that is zero."""
    spark = current_ids.sparkSession
    cur = current_ids.select("node_id").distinct()
    if previous_ids is None:
        prev = spark.createDataFrame([], "node_id string")
        deleted = prev
        added = prev
        prev_total = 0
    else:
        prev = previous_ids.select("node_id").distinct()
        deleted = prev.join(cur, "node_id", "left_anti")
        added = cur.join(prev, "node_id", "left_anti")
        prev_total = prev.count()
    fractional_change_gate(
        deleted.count(), prev_total, threshold=REMOVER_THRESHOLD, force=force_pass
    )

    def _log(log: DataFrame | None, ids: DataFrame) -> DataFrame:
        base = (
            log.select("timestamp", "node_id")
            if log is not None
            else spark.createDataFrame([], IDS_LOG_SCHEMA)
        )
        stamped = ids.select(
            F.lit(now.date().isoformat()).cast("date").alias("timestamp"),
            "node_id",
        )
        # the reference compares the Date column against datetime.now()-365d
        # (graph_remover.py:79-81), so an entry aged exactly 365 days
        # (midnight) falls BEFORE the cutoff and is pruned while a
        # 364-day-old one survives (test_graph_remover_old_id_removal vs
        # test_graph_remover_next_run)
        horizon = F.lit(now.date().isoformat()).cast("date")
        return base.unionByName(stamped).filter(
            F.col("timestamp") >= F.date_sub(horizon, 364)
        )

    return {
        "deleted_ids": deleted,
        "added_ids": added,
        "deleted_log": _log(deleted_log, deleted),
        "added_log": _log(added_log, added),
        "snapshot": cur,
    }
