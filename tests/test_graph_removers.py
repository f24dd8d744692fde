"""Parity tests for the per-entity incremental graph removers
(graph/removers/catalogue_works_remover.py, catalogue_images_remover.py,
catalogue_work_identifiers_remover.py, base_graph_remover_incremental.py)."""

import pytest

from catalogue_pipeline_spark.plans.graph_removers import (
    disconnected_node_ids,
    edges_to_remove,
    remove_disconnected_images,
    remove_path_identifier_entities,
    remove_works_edges,
    remove_works_nodes,
)


def test_edge_set_difference_only_consults_streamed_nodes(spark):
    """get_edge_ids_to_remove: graph edges on a streamed node not implied
    by the index go; nodes the index did not stream are untouched; a
    streamed node with NO index edges loses all its graph edges."""
    index_nodes = spark.createDataFrame([("w1",), ("w2",)], "node_id string")
    index_edges = spark.createDataFrame([("w1", "e1")], "node_id string, edge_id string")
    graph_edges = spark.createDataFrame(
        [("w1", "e1"), ("w1", "e2"), ("w2", "e3"), ("w3", "e4")],
        "node_id string, edge_id string",
    )
    out = {r["edge_id"] for r in
           edges_to_remove(index_nodes, index_edges, graph_edges).collect()}
    assert out == {"e2", "e3"}  # e1 kept (implied), e4 kept (w3 not streamed)


def test_disconnected_nodes_checks_both_endpoints(spark):
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "node_id string")
    edges = spark.createDataFrame([("a", "b")], "from_id string, to_id string")
    out = {r["node_id"] for r in disconnected_node_ids(nodes, edges).collect()}
    assert out == {"c", "d"}


def test_works_node_remover_non_visible_with_existence_gate(spark):
    """Non-Visible merged works, but only ones the graph actually holds."""
    merged = spark.createDataFrame(
        [("w1", "Visible"), ("w2", "Redirected"), ("w3", "Deleted"),
         ("w4", "Invisible")] + [(f"k{i}", "Visible") for i in range(40)],
        "work_id string, type string",
    )
    graph_nodes = spark.createDataFrame(
        [("w1",), ("w2",), ("w3",)] + [(f"k{i}",) for i in range(40)],
        "node_id string",
    )
    out = {r["node_id"]
           for r in remove_works_nodes(merged, graph_nodes).collect()}
    assert out == {"w2", "w3"}  # w4 not in graph → filtered by existence


def test_works_edge_remover_has_concept_diff(spark):
    merged_ids = spark.createDataFrame([("w1",), ("w2",)], "work_id string")
    merged_concepts = spark.createDataFrame(
        [("w1", "c1"), ("w1", "c2")], "work_id string, concept_id string"
    )
    graph_edges = spark.createDataFrame(
        [("w1", "c1"), ("w1", "c9"), ("w2", "c3")]
        + [(f"k{i}", f"c{i}") for i in range(40)],
        "from_id string, to_id string",
    )
    out = {r["edge_id"] for r in remove_works_edges(
        merged_concepts, merged_ids, graph_edges).collect()}
    assert out == {"w1--c9", "w2--c3"}


def test_images_remover_disconnected_only(spark):
    image_nodes = spark.createDataFrame(
        [(f"i{n}",) for n in range(10)], "node_id string"
    )
    edges = spark.createDataFrame(
        [(f"w{n}", f"i{n}") for n in range(9)], "from_id string, to_id string"
    )
    out = {r["node_id"]
           for r in remove_disconnected_images(image_nodes, edges).collect()}
    assert out == {"i9"}


def test_path_identifier_remover_edges_then_orphans(spark):
    """Stale HAS_PATH_IDENTIFIER edges removed per-work; PathIdentifier
    nodes disconnected AFTER the removals are orphaned."""
    merged = spark.createDataFrame(
        [("w1", "PP/A"), ("w2", None)] + [(f"k{i}", f"P{i}") for i in range(40)],
        "work_id string, path_identifier string",
    )
    pid_nodes = spark.createDataFrame(
        [("PP/A",), ("PP/B",), ("PP/C",)] + [(f"P{i}",) for i in range(40)],
        "node_id string",
    )
    pid_edges = spark.createDataFrame(
        # w1 correctly points at PP/A plus a stale edge to PP/B;
        # w2 (no path id in the index) still holds an edge to PP/C
        [("w1", "PP/A"), ("w1", "PP/B"), ("w2", "PP/C")]
        + [(f"k{i}", f"P{i}") for i in range(40)],
        "from_id string, to_id string",
    )
    stale, orphans = remove_path_identifier_entities(merged, pid_nodes, pid_edges)
    assert {r["edge_id"] for r in stale.collect()} == {
        "w1--PP/B", "w2--PP/C"
    }
    assert {r["node_id"] for r in orphans.collect()} == {"PP/B", "PP/C"}


def test_safety_valve_trips_over_20_percent(spark):
    """validate_fractional_change: removing more than 20% of the entity's
    total raises; force_pass overrides."""
    merged = spark.createDataFrame(
        [("w1", "Deleted"), ("w2", "Deleted"), ("w3", "Visible")],
        "work_id string, type string",
    )
    graph_nodes = spark.createDataFrame(
        [("w1",), ("w2",), ("w3",)], "node_id string"
    )
    with pytest.raises(ValueError, match="safety gate"):
        remove_works_nodes(merged, graph_nodes)
    out = remove_works_nodes(merged, graph_nodes, force_pass=True)
    assert out.count() == 2


def test_index_deletions_consume_remover_log_with_5pct_valve(spark):
    """ingestor_deletions.py: the remover's deleted-ids log drives index
    deletions, gated at 5% of the index size."""
    from catalogue_pipeline_spark.plans.graph_removers import index_deletions

    log = spark.createDataFrame([("c1",), ("c2",), ("gone",)], "node_id string")
    index_ids = spark.createDataFrame(
        [(f"c{i}",) for i in range(1, 60)], "node_id string"
    )
    out = {r["node_id"] for r in index_deletions(log, index_ids).collect()}
    assert out == {"c1", "c2"}  # 'gone' absent from the index

    small_index = spark.createDataFrame(
        [(f"c{i}",) for i in range(1, 10)], "node_id string"
    )
    with pytest.raises(ValueError, match="safety gate"):
        index_deletions(log, small_index)
    assert index_deletions(log, small_index, force_pass=True).count() == 2


# ----------------------------------------------------- full (snapshot-diff)


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node_id string")


def _log(spark, rows):
    from catalogue_pipeline_spark.plans.graph_removers import IDS_LOG_SCHEMA
    from datetime import date

    return spark.createDataFrame(
        [(date.fromisoformat(d), i) for d, i in rows], IDS_LOG_SCHEMA
    )


def test_full_remover_first_run_bootstraps_snapshot_only(spark):
    # test_graph_remover_first_run — no previous snapshot: nothing deleted,
    # nothing logged as added, the current ids become the snapshot
    from datetime import datetime

    from catalogue_pipeline_spark.plans.graph_removers import full_graph_remover

    out = full_graph_remover(
        None,
        _ids(spark, ["sh1", "sh2", "sh3"]),
        None,
        None,
        now=datetime(2024, 6, 1, 10, 0),
    )
    assert out["deleted_ids"].count() == 0
    assert out["added_ids"].count() == 0
    assert out["deleted_log"].count() == 0
    assert sorted(r.node_id for r in out["snapshot"].collect()) == [
        "sh1",
        "sh2",
        "sh3",
    ]


def test_full_remover_next_run_diff_and_logs(spark):
    # test_graph_remover_next_run — prev omits sh1-3 (added) and holds
    # sh4-6 (deleted); the 364-day-old log entries survive the prune
    from datetime import date, datetime, timedelta

    from catalogue_pipeline_spark.plans.graph_removers import full_graph_remover

    now = datetime(2024, 6, 1, 10, 0)
    prev = _ids(spark, [f"sh{i}" for i in range(4, 34)])  # 30 ids incl 4-6
    cur = _ids(spark, [f"sh{i}" for i in range(1, 4)] + [f"sh{i}" for i in range(7, 34)])
    almost_year = (now.date() - timedelta(days=364)).isoformat()
    dlog = _log(spark, [(almost_year, "sh4"), (almost_year, "sh5")])
    out = full_graph_remover(prev, cur, dlog, None, now=now, force_pass=True)
    assert sorted(r.node_id for r in out["deleted_ids"].collect()) == [
        "sh4",
        "sh5",
        "sh6",
    ]
    assert sorted(r.node_id for r in out["added_ids"].collect()) == [
        "sh1",
        "sh2",
        "sh3",
    ]
    dl = out["deleted_log"].collect()
    assert {r.node_id for r in dl} == {"sh4", "sh5", "sh6"}
    assert {r.timestamp for r in dl} == {now.date(), date.fromisoformat(almost_year)}
    al = out["added_log"].collect()
    assert {r.node_id for r in al} == {"sh1", "sh2", "sh3"}
    assert {r.timestamp for r in al} == {now.date()}
    snap = {r.node_id for r in out["snapshot"].collect()}
    assert {"sh1", "sh2", "sh3"} <= snap and "sh6" not in snap


def test_full_remover_prunes_year_old_log_entries(spark):
    # test_graph_remover_old_id_removal — entries aged exactly 365 days
    # are dropped (the reference's datetime-vs-date comparison)
    from datetime import datetime, timedelta

    from catalogue_pipeline_spark.plans.graph_removers import full_graph_remover

    now = datetime(2024, 6, 1, 10, 0)
    year_old = (now.date() - timedelta(days=365)).isoformat()
    prev = _ids(spark, [f"sh{i}" for i in range(4, 34)])
    cur = _ids(spark, [f"sh{i}" for i in range(4, 33)])  # sh33 deleted
    dlog = _log(spark, [(year_old, "sh4"), (year_old, "sh5")])
    out = full_graph_remover(prev, cur, dlog, None, now=now)
    dl = out["deleted_log"].collect()
    assert {r.node_id for r in dl} == {"sh33"}
    assert {r.timestamp for r in dl} == {now.date()}


def test_full_remover_safety_check(spark):
    # test_graph_remover_safety_check — mass deletion trips the 20% valve;
    # force_pass overrides
    from datetime import datetime

    from catalogue_pipeline_spark.plans.graph_removers import full_graph_remover

    now = datetime(2024, 6, 1, 10, 0)
    prev = _ids(spark, [f"n{i}" for i in range(100)])
    cur = _ids(spark, [f"n{i}" for i in range(50)])
    with pytest.raises(ValueError, match="safety gate"):
        full_graph_remover(prev, cur, None, None, now=now)
    out = full_graph_remover(prev, cur, None, None, now=now, force_pass=True)
    assert out["deleted_ids"].count() == 50
