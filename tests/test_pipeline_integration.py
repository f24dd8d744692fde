"""Matcher → merger integration (MergerIntegrationTest.scala:21-60 shape):
'One Sierra and multiple Miro works are matched' — updates flow through the
persistent graph, the MatcherResult's components feed the merger, redirects
point at the precedence target."""

import datetime as dt

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans import (
    create_matcher_table,
    match_and_merge,
    update_graph,
)

UP = "work_id string, version int, candidates array<string>, suppressed boolean"
BATCH_TS = dt.datetime(2024, 7, 1, 9, 0, 0)


def test_matcher_feeds_merger(spark, tmp_path):
    table = create_matcher_table(str(tmp_path / "graph"), num_buckets=4)
    # a sierra work linked to two "miro-style" works, plus an unrelated work
    _, result = update_graph(
        spark,
        table,
        spark.createDataFrame(
            [
                ("sierra1", 1, ["miro1", "miro2"], False),
                ("miro1", 1, [], False),
                ("miro2", 1, [], False),
                ("lonely", 1, [], False),
            ],
            UP,
        ),
        batch_seq=1,
        changeset_id="b1",
    )
    comps = {tuple(sorted(w["work_id"] for w in r["works"])) for r in result.collect()}
    assert ("miro1", "miro2", "sierra1") in comps

    # merger input: component assignment from the graph + per-work payloads
    state = table.read(spark).filter(F.col("version") >= 0)
    payloads = spark.createDataFrame(
        [
            ("sierra1", "sierra", ["item-s"], ["id-s"], None),
            ("miro1", "miro", ["item-m1"], ["id-m1"], "thumb-m1"),
            ("miro2", "miro", ["item-m2"], ["id-m2"], None),
            ("lonely", "sierra", ["item-l"], ["id-l"], None),
        ],
        "work_id string, source_type string, items array<string>, "
        "identifiers array<string>, thumbnail string",
    )
    works = (
        state.select("work_id")
        .join(payloads, "work_id")
        .join(
            state.select(
                "work_id", F.col("candidates").alias("merge_candidate_ids"),
                (F.col("suppressed") == "true").alias("suppressed"),
            ),
            "work_id",
        )
    )
    merged = {r["work_id"]: r for r in match_and_merge(works, BATCH_TS,
              precedence=["sierra", "miro"]).collect()}

    assert merged["sierra1"]["type"] == "Visible"
    # two Miro sources: the ambiguous-association ItemsRule branch leaves the
    # Sierra items alone; ThumbnailRule picks the min-id Miro and counts both
    # Miros as merged ('One Sierra and multiple Miro works are matched',
    # MergerIntegrationTest.scala:58)
    assert merged["sierra1"]["items"] == ["item-s"]
    assert merged["sierra1"]["thumbnail"] == "thumb-m1"  # min-id miro's thumb
    for m in ("miro1", "miro2"):
        assert merged[m]["type"] == "Redirected"
        assert merged[m]["redirect_target"] == "sierra1"
    assert merged["lonely"]["type"] == "Visible" and merged["lonely"]["items"] == ["item-l"]
    # G5: everything stamped with the batch time
    assert merged["sierra1"]["batch_ts"] == BATCH_TS
