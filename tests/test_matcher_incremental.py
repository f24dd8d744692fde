"""Incremental matcher: scenarios mirrored from WorkGraphUpdaterTest
(matcher/src/test/.../WorkGraphUpdaterTest.scala:18-516) as DataFrame-level
equivalence checks over the persistent graph table."""

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.matcher import create_matcher_table, update_graph

UP_SCHEMA = "work_id string, version int, candidates array<string>, suppressed boolean"


@pytest.fixture()
def table(tmp_path):
    return create_matcher_table(str(tmp_path / "graph"), num_buckets=4)


def send(spark, table, rows, seq):
    df = spark.createDataFrame(rows, UP_SCHEMA)
    return update_graph(spark, table, df, batch_seq=seq, changeset_id=f"b{seq}")


def comps(spark, table):
    out = {}
    for r in table.read(spark).collect():
        if r["version"] >= 0:  # drop placeholder nodes (A3)
            out.setdefault(r["component"], set()).add(r["work_id"])
    return {frozenset(v) for v in out.values()}


def test_incremental_chain_merge(spark, table):
    """'updating A->B with B->[C,D] gives A+B+C+D' — across two batches."""
    send(spark, table, [("A", 1, ["B"], False), ("B", 1, [], False)], 1)
    assert comps(spark, table) == {frozenset({"A", "B"})}
    send(spark, table, [("B", 2, ["C", "D"], False), ("C", 1, [], False), ("D", 1, [], False)], 2)
    assert comps(spark, table) == {frozenset({"A", "B", "C", "D"})}
    st = {r["work_id"]: r for r in table.read(spark).collect()}
    assert len({st[w]["subgraph_id"] for w in "ABCD"}) == 1


def test_link_removal_splits_component(spark, table):
    send(spark, table, [("A", 1, ["B"], False), ("B", 1, [], False)], 1)
    send(spark, table, [("A", 2, [], False)], 2)
    assert comps(spark, table) == {frozenset({"A"}), frozenset({"B"})}


def test_version_conflict_rejected(spark, table):
    send(spark, table, [("A", 2, ["B"], False), ("B", 1, [], False)], 1)
    snap, _ = send(spark, table, [("A", 1, [], False)], 2)  # older version
    assert snap is None  # rejected + V3 no-op
    assert comps(spark, table) == {frozenset({"A", "B"})}


def test_same_version_reaccepted(spark, table):
    """Same version, different links: accepted so the graph can re-form
    (WorkGraphUpdater.scala:44-78)."""
    send(spark, table, [("A", 1, ["B"], False), ("B", 1, [], False)], 1)
    send(spark, table, [("A", 1, [], False)], 2)
    assert comps(spark, table) == {frozenset({"A"}), frozenset({"B"})}


def test_suppression_breaks_chain(spark, table):
    send(
        spark,
        table,
        [("A", 1, ["B"], False), ("B", 1, ["C"], False), ("C", 1, [], False)],
        1,
    )
    assert comps(spark, table) == {frozenset({"A", "B", "C"})}
    send(spark, table, [("B", 2, ["C"], True)], 2)  # suppress the bridge
    assert comps(spark, table) == {frozenset({"A"}), frozenset({"B"}), frozenset({"C"})}
    # un-suppress: component re-forms
    send(spark, table, [("B", 3, ["C"], False)], 3)
    got = comps(spark, table)
    assert frozenset({"A", "B", "C"}) in got


def test_skip_write_when_unchanged(spark, table):
    send(spark, table, [("A", 1, ["B"], False), ("B", 1, [], False)], 1)
    before = table.current_snapshot_id()
    snap, result = send(spark, table, [("A", 1, ["B"], False)], 1)  # identical
    assert snap is None and table.current_snapshot_id() == before
    # the matcher result is still produced for downstream (idempotent resend)
    assert result.count() == 1


def test_untouched_components_not_rewritten(spark, table):
    rows = [(f"w{i}", 1, [], False) for i in range(40)]
    send(spark, table, rows, 1)
    files_before = {f["path"] for f in table.snapshot().files}
    snap, _ = send(spark, table, [("w3", 2, ["w7"], False)], 2)
    assert snap is not None
    files_after = {f["path"] for f in table.snapshot().files}
    assert files_before & files_after  # some buckets untouched
    st = {r["work_id"]: r for r in table.read(spark).collect()}
    assert st["w3"]["component"] == st["w7"]["component"]
    assert len(st) == 40


def test_distributed_fallback_matches_driver_path(spark, tmp_path):
    """Force the region past driver_region_max so the distributed CC fallback
    engages (no unconditional region collect — VERDICT r1 #3), and check it
    produces the same components/subgraphs as the driver union-find."""
    rows = [
        ("A", 1, ["B"], False),
        ("B", 1, ["C"], False),
        ("C", 1, [], False),
        ("X", 1, ["Y"], True),  # suppressed: breaks component, not subgraph
        ("Y", 1, [], False),
        ("Z", 1, [], False),
    ]
    t_drv = create_matcher_table(str(tmp_path / "drv"), num_buckets=4)
    t_dist = create_matcher_table(str(tmp_path / "dist"), num_buckets=4)
    df = spark.createDataFrame(rows, UP_SCHEMA)
    update_graph(spark, t_drv, df, batch_seq=1, changeset_id="b1")
    update_graph(spark, t_dist, df, batch_seq=1, changeset_id="b1", driver_region_max=2)

    def state(t):
        return {
            r["work_id"]: (r["component"], r["subgraph_id"])
            for r in t.read(spark).collect()
        }

    s_drv, s_dist = state(t_drv), state(t_dist)
    assert set(s_drv) == set(s_dist)
    # component/subgraph label VALUES may differ between paths (min-id vs
    # digest); the PARTITIONS must be identical
    def parts(s, i):
        by = {}
        for w, v in s.items():
            by.setdefault(v[i], set()).add(w)
        return {frozenset(v) for v in by.values()}

    assert parts(s_drv, 0) == parts(s_dist, 0)
    assert parts(s_drv, 1) == parts(s_dist, 1)
