"""Matcher+merger plan: component semantics mirrored from
WorkGraphUpdaterTest.scala:18-516 and MergerIntegrationTest scenarios."""

import datetime as dt

from catalogue_pipeline_spark.plans import match_and_merge

BATCH_TS = dt.datetime(2024, 6, 1, 12, 0, 0)
SCHEMA = (
    "work_id string, source_type string, merge_candidate_ids array<string>, "
    "suppressed boolean, items array<string>, identifiers array<string>, thumbnail string"
)


def run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = match_and_merge(df, BATCH_TS)
    return {r["work_id"]: r for r in out.collect()}


def test_transitive_component_merges(spark):
    """'updating A->B with B->[C,D] gives A+B+C+D' (WorkGraphUpdaterTest)."""
    rows = [
        ("A", "sierra", ["B"], False, ["iA"], ["idA"], None),
        ("B", "tei", ["C", "D"], False, ["iB"], ["idB"], "thumbB"),
        ("C", "sierra", [], False, ["iC"], ["idC"], None),
        ("D", "sierra", [], False, ["iD"], ["idD"], None),
        ("E", "sierra", [], False, ["iE"], ["idE"], None),
    ]
    got = run(spark, rows)
    comp = {w: got[w]["component"] for w in "ABCD"}
    assert len(set(comp.values())) == 1
    assert got["E"]["component"] != got["A"]["component"]
    # tei outranks sierra → B is the target
    assert got["B"]["type"] == "Visible"
    for w in "ACD":
        assert got[w]["type"] == "Redirected" and got[w]["redirect_target"] == "B"
    # target folds all members' items in (precedence, id) order
    assert got["B"]["items"] == ["iB", "iA", "iC", "iD"]
    assert sorted(got["B"]["identifiers"]) == ["idA", "idB", "idC", "idD"]
    assert got["B"]["thumbnail"] == "thumbB"
    # all works in one component share the digest; E differs
    assert got["A"]["subgraph_id"] == got["B"]["subgraph_id"]
    assert got["E"]["subgraph_id"] != got["A"]["subgraph_id"]
    # G5: derived rows stamped with the batch time
    assert got["B"]["batch_ts"] == BATCH_TS


def test_suppressed_work_breaks_edges(spark):
    """Suppression removes the node's edges; components re-form without it
    (WorkGraphUpdater.scala:117-134)."""
    rows = [
        ("A", "sierra", ["B"], False, ["iA"], ["idA"], None),
        ("B", "sierra", ["C"], True, ["iB"], ["idB"], None),  # suppressed bridge
        ("C", "sierra", [], False, ["iC"], ["idC"], None),
    ]
    got = run(spark, rows)
    assert got["A"]["component"] != got["C"]["component"]
    # suppressed work is never a target but still emitted (singleton)
    assert got["B"]["type"] == "Visible" and got["B"]["component"] == "B"


def test_singletons_pass_through(spark):
    rows = [("A", "sierra", [], False, ["iA"], ["idA"], "tA")]
    got = run(spark, rows)
    assert got["A"]["type"] == "Visible"
    assert got["A"]["items"] == ["iA"] and got["A"]["thumbnail"] == "tA"


def test_thumbnail_falls_back_by_precedence(spark):
    rows = [
        ("A", "ebsco", ["B"], False, [], ["idA"], None),     # target, no thumb
        ("B", "sierra", [], False, [], ["idB"], "thumbB"),
        ("C", "calm", ["B"], False, [], ["idC"], "thumbC"),  # higher precedence than sierra
    ]
    got = run(spark, rows)
    assert got["A"]["type"] == "Visible"
    assert got["A"]["thumbnail"] == "thumbC"  # best-precedence source's thumb
