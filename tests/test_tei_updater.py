"""TEI updater tree-diff parity — scenarios from
tei_adapter/tei_updater/src/test_tei_updater.py."""

import pytest

from catalogue_pipeline_spark.plans.tei_updater import (
    GITHUB_ENTRY_SCHEMA,
    TREE_SCHEMA,
    diff_tei_trees,
    parse_github_tree,
)

T = "2021-06-11T15:34:45Z"


def _tree(spark, rows):
    return spark.createDataFrame(rows, TREE_SCHEMA)


def _msgs(df):
    return sorted(
        (m.path, m.uri, m.time_modified, m.time_deleted) for m in df.collect()
    )


def test_elements_added_changed_deleted_are_returned(spark):
    # test_tei_updater.py:124-151 — one changed, one added, one deleted,
    # one untouched
    old = _tree(
        spark,
        [
            ("filea", "ababababa", "http://filea"),
            ("fileb", "bfvnwhgvdf", "http://fileb"),
            ("filec", "bgfbhsg", "http://filec"),
        ],
    )
    new = _tree(
        spark,
        [
            ("fileb", "dgfhkjgew", "http://filebb"),
            ("filec", "bgfbhsg", "http://filec"),
            ("filed", "dkgef", "http://filed"),
        ],
    )
    messages, state = diff_tei_trees(old, new, time=T)
    assert _msgs(messages) == [
        ("filea", None, None, T),
        ("fileb", "http://filebb", T, None),
        ("filed", "http://filed", T, None),
    ]
    assert state.count() == 3


def test_sha_and_uri_both_changed_is_one_message(spark):
    # diff_trees collapses values_changed to the parent path with a set
    # (tei_updater.py:69-71)
    old = _tree(spark, [("f", "s1", "http://u1")])
    new = _tree(spark, [("f", "s2", "http://u2")])
    messages, _ = diff_tei_trees(old, new, time=T)
    assert _msgs(messages) == [("f", "http://u2", T, None)]


def test_no_stored_tree_bootstraps_every_blob(spark):
    # test_tree_does_not_exist (:30-58) — every blob is a changed message
    # and the new tree becomes the stored state
    new = _tree(spark, [("a", "s1", "u1"), ("b", "s2", "u2")])
    messages, state = diff_tei_trees(None, new, time=T)
    assert _msgs(messages) == [("a", "u1", T, None), ("b", "u2", T, None)]
    assert state.count() == 2


def test_identical_trees_emit_nothing(spark):
    t = [("a", "s1", "u1"), ("b", "s2", "u2")]
    messages, _ = diff_tei_trees(_tree(spark, t), _tree(spark, t), time=T)
    assert messages.count() == 0


def test_parse_github_tree_keeps_blobs_only(spark):
    entries = spark.createDataFrame(
        [
            ("dir/a.xml", "blob", "s1", "u1"),
            ("dir", "tree", "s9", "u9"),
            ("dir/b.xml", "blob", "s2", "u2"),
        ],
        GITHUB_ENTRY_SCHEMA,
    )
    got = parse_github_tree(entries, truncated=False)
    assert sorted(r.path for r in got.collect()) == ["dir/a.xml", "dir/b.xml"]


def test_truncated_tree_is_error_before_any_diff(spark):
    # test_truncated_tree_results_in_error (:95-121)
    entries = spark.createDataFrame([], GITHUB_ENTRY_SCHEMA)
    with pytest.raises(ValueError, match="truncated"):
        parse_github_tree(entries, truncated=True)


def test_diff_messages_feed_the_path_id_fold(spark):
    # integration with W24 (plans/tei_paths.py): the updater's message
    # stream is exactly the fold's event feed — changed messages carry the
    # path (id extracted downstream from file content), deleted messages
    # tombstone the path
    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.plans.tei_paths import (
        STATE_SCHEMA,
        fold_path_ids,
    )

    old = _tree(spark, [("P/a.xml", "s1", "u1"), ("P/b.xml", "s2", "u2")])
    new = _tree(spark, [("P/a.xml", "s1x", "u1")])  # a changed, b deleted
    messages, _ = diff_tei_trees(old, new, time="2024-03-02T12:00:00Z")
    events = messages.select(
        F.when(F.col("time_deleted").isNotNull(), F.lit("deleted"))
        .otherwise(F.lit("changed"))
        .alias("kind"),
        F.col("path"),
        # the id extractor parses the TEI content; stub: id = basename
        F.when(
            F.col("time_deleted").isNull(),
            F.concat(F.lit("MS_"), F.regexp_extract("path", r"/(\w+)\.xml$", 1)),
        ).alias("id"),
        F.coalesce(F.col("time_modified"), F.col("time_deleted"))
        .cast("timestamp")
        .alias("time_modified"),
        F.lit(0).alias("seq"),
    )
    state = spark.createDataFrame(
        [
            ("MS_a", "P/a.xml", __import__("datetime").datetime(2024, 3, 1, 12)),
            ("MS_b", "P/b.xml", __import__("datetime").datetime(2024, 3, 1, 12)),
        ],
        STATE_SCHEMA,
    )
    new_state, msgs = fold_path_ids(state, events)
    st = {r.id: r.path for r in new_state.collect()}
    assert st == {"MS_a": "P/a.xml"}  # b tombstoned, a updated
    kinds = sorted((m.kind, m.id) for m in msgs.collect())
    assert kinds == [("changed", "MS_a"), ("deleted", "MS_b")]
