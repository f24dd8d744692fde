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
