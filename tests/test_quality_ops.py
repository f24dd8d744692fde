import datetime as dt

from catalogue_pipeline_spark.operators.quality import (
    detect_unresolvable_conflicts,
    traverse_hierarchy,
)

T0 = dt.datetime(2024, 1, 1)


def test_detect_unresolvable_conflicts(spark):
    rows = [
        ("a", 1, T0, "x"),
        ("a", 1, T0, "y"),        # same ts, different content → conflict
        ("b", 1, T0, "same"),
        ("b", 1, T0, "same"),     # same ts, same content → fine
        ("c", 1, T0, "old"),
        ("c", 1, dt.datetime(2024, 1, 2), "new"),  # different ts → fine
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx long, ts timestamp, text string")
    got = detect_unresolvable_conflicts(df, ["conv_id", "turn_idx"]).collect()
    assert len(got) == 1 and got[0]["conv_id"] == "a" and got[0]["n_variants"] == 2


def test_traverse_hierarchy(spark):
    edges = spark.createDataFrame(
        [("c1", "p1"), ("p1", "g1"), ("c2", "p1"), ("x", "y")],
        "child string, parent string",
    )
    start = spark.createDataFrame([("c1",)], "id string")
    up = {(r["node"], r["depth"]) for r in traverse_hierarchy(edges, start, "up").collect()}
    assert up == {("p1", 1), ("g1", 2)}
    start2 = spark.createDataFrame([("p1",)], "id string")
    down = {(r["node"], r["depth"]) for r in traverse_hierarchy(edges, start2, "down").collect()}
    assert down == {("c1", 1), ("c2", 1)}


def test_path_graph_queries(spark):
    """Path-hierarchy graph slice (work_queries.py semantics): ancestors
    with hops + parts, children with child_parts, descendants inverse."""
    from catalogue_pipeline_spark.plans.graph import (
        work_ancestors,
        work_children,
        work_descendants,
    )

    works = spark.createDataFrame(
        [
            ("root", "PP"),
            ("mid", "PP/CRI"),
            ("leaf1", "PP/CRI/J"),
            ("leaf2", "PP/CRI/K"),
            ("lone", "ZZ/Q"),  # parent ZZ exists only as an identifier node
        ],
        "work_id string, path string",
    )
    anc = {(r["id"], r["ancestor_id"]): r for r in work_ancestors(works).collect()}
    assert anc[("leaf1", "mid")]["hops"] == 1
    assert anc[("leaf1", "root")]["hops"] == 2
    # parts of PP/CRI = its direct identifier children (J and K) = 2
    assert anc[("leaf1", "mid")]["ancestor_parts"] == 2
    # parts of PP = 1 (only CRI below it)
    assert anc[("leaf1", "root")]["ancestor_parts"] == 1
    assert ("lone", "root") not in anc  # ZZ identifier has no work
    assert len([k for k in anc if k[0] == "mid"]) == 1  # mid -> root only

    ch = {(r["id"], r["child_id"]): r for r in work_children(works).collect()}
    assert set(ch) == {("root", "mid"), ("mid", "leaf1"), ("mid", "leaf2")}
    assert ch[("root", "mid")]["child_parts"] == 2  # J and K under CRI
    assert ch[("mid", "leaf1")]["child_parts"] == 0

    desc = {(r["id"], r["descendant_id"]) for r in work_descendants(works).collect()}
    assert desc == {("root", "mid"), ("root", "leaf1"), ("root", "leaf2"),
                    ("mid", "leaf1"), ("mid", "leaf2")}
