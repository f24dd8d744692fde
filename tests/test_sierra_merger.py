"""Sierra merger transformable-fold parity — scenarios from
sierra_adapter/sierra_merger TransformableOpsTest / UpdaterTest."""

from datetime import datetime

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.sierra_merger import (
    RECORDS_SCHEMA,
    TIMES_SCHEMA,
    empty_state,
    merge_sierra_records,
    transformables,
)

UPDATES_SCHEMA = (
    "record_type string, record_id string, modified timestamp, data string, "
    "bib_ids array<string>, unlinked_bib_ids array<string>, seq int"
)

T1 = datetime(2024, 1, 1, 12, 0)
T2 = datetime(2024, 1, 2, 12, 0)
T3 = datetime(2024, 1, 3, 12, 0)


def _updates(spark, rows):
    return spark.createDataFrame(rows, UPDATES_SCHEMA)


def _state(spark, recs, times):
    return (
        spark.createDataFrame(recs, RECORDS_SCHEMA),
        spark.createDataFrame(times, TIMES_SCHEMA),
    )


def _run(spark, recs, times, rows):
    r, t, rep = merge_sierra_records(*_state(spark, recs, times), _updates(spark, rows))
    return (
        {(x.bib_id, x.record_type, x.record_id): x for x in r.collect()},
        {x.bib_id: x.modified_time for x in t.collect()},
        {(x.bib_id, x.record_type, x.record_id): x.action for x in rep.collect()},
    )


def test_bib_create_and_newer_replace(spark):
    # 'merges data from a bibRecord when empty' + 'updates bibData ... newer'
    recs, times, rep = _run(
        spark,
        [],
        [],
        [("bibs", "1000001", T1, "bib-v1", ["1000001"], [], 0)],
    )
    assert rep[("1000001", "bibs", "1000001")] == "created"
    assert recs[("1000001", "bibs", "1000001")].data == "bib-v1"
    assert times["1000001"] == T1


def test_stale_bib_update_is_noop(spark):
    # 'returns None when merging a stale update'
    recs, times, rep = _run(
        spark,
        [("1000001", "bibs", "1000001", T2, "bib-v2")],
        [("1000001", T2)],
        [("bibs", "1000001", T1, "bib-v0", ["1000001"], [], 0)],
    )
    assert rep[("1000001", "bibs", "1000001")] == "noop"
    assert recs[("1000001", "bibs", "1000001")].data == "bib-v2"
    assert times["1000001"] == T2  # no bump on a no-op


def test_equal_timestamp_replaces(spark):
    # TransformableOps :140-152 — the deliberate >= ('latest to the
    # merger wins'): an edit and a deletion with the SAME updatedDate
    # must both apply
    recs, _, rep = _run(
        spark,
        [("1000001", "items", "7000001", T2, "item-old")],
        [("1000001", T2)],
        [("items", "7000001", T2, "item-same-ts", ["1000001"], [], 0)],
    )
    assert rep[("1000001", "items", "7000001")] == "replaced"
    assert recs[("1000001", "items", "7000001")].data == "item-same-ts"


def test_item_add_and_multiple_items(spark):
    # 'adds the item if it doesn't exist already' + 'supports adding
    # multiple items to a merged record'
    recs, times, rep = _run(
        spark,
        [("1000001", "bibs", "1000001", T1, "bib")],
        [("1000001", T1)],
        [
            ("items", "7000001", T2, "i1", ["1000001"], [], 0),
            ("items", "7000002", T3, "i2", ["1000001"], [], 1),
        ],
    )
    assert rep[("1000001", "items", "7000001")] == "added"
    assert rep[("1000001", "items", "7000002")] == "added"
    assert len([k for k in recs if k[1] == "items"]) == 2
    assert times["1000001"] == T3  # bumped to the max applied modifiedDate


def test_item_fans_out_to_every_linked_bib(spark):
    # Updater :27-30 — one record updates every linked bib's transformable
    recs, _, rep = _run(
        spark,
        [
            ("1000001", "bibs", "1000001", T1, "b1"),
            ("1000002", "bibs", "1000002", T1, "b2"),
        ],
        [("1000001", T1), ("1000002", T1)],
        [("items", "7000001", T2, "i", ["1000001", "1000002"], [], 0)],
    )
    assert rep[("1000001", "items", "7000001")] == "added"
    assert rep[("1000002", "items", "7000001")] == "added"


def test_unlink_removes_and_bumps_time(spark):
    # 'removes the item if it already exists' + the remove-side time bump
    recs, times, rep = _run(
        spark,
        [
            ("1000001", "bibs", "1000001", T1, "b"),
            ("1000001", "items", "7000001", T1, "i"),
        ],
        [("1000001", T1)],
        [("items", "7000001", T2, "i-moved", ["1000002"], ["1000001"], 0)],
    )
    assert rep[("1000001", "items", "7000001")] == "removed"
    assert ("1000001", "items", "7000001") not in recs
    assert times["1000001"] == T2
    # ...and the record landed on its new bib (created transformable)
    assert rep[("1000002", "items", "7000001")] == "created"
    assert recs[("1000002", "items", "7000001")].data == "i-moved"


def test_stale_unlink_is_noop(spark):
    recs, _, rep = _run(
        spark,
        [
            ("1000001", "bibs", "1000001", T2, "b"),
            ("1000001", "items", "7000001", T3, "i-new"),
        ],
        [("1000001", T3)],
        [("items", "7000001", T1, "i-old", [], ["1000001"], 0)],
    )
    assert rep[("1000001", "items", "7000001")] == "noop"
    assert ("1000001", "items", "7000001") in recs


def test_unlink_missing_transformable_is_error(spark):
    # Updater :59-76 — update (not upsert): a missing transformable is a
    # storage error, not a benign no-op
    _, _, rep = _run(
        spark,
        [],
        [],
        [("items", "7000001", T1, "i", [], ["1000009"], 0)],
    )
    assert rep[("1000009", "items", "7000001")] == "error_missing"


def test_unlink_gone_record_is_benign_noop(spark):
    _, _, rep = _run(
        spark,
        [("1000001", "bibs", "1000001", T1, "b")],
        [("1000001", T1)],
        [("items", "7000001", T2, "i", [], ["1000001"], 0)],
    )
    assert rep[("1000001", "items", "7000001")] == "noop"


def test_bib_unlink_errors(spark):
    _, _, rep = _run(
        spark,
        [("1000001", "bibs", "1000001", T1, "b")],
        [("1000001", T1)],
        [("bibs", "1000001", T2, "b2", [], ["1000001"], 0)],
    )
    assert rep[("1000001", "bibs", "1000001")] == "error_bib_unlink"


def test_batch_latest_mention_wins(spark):
    # batch collapse: a later update that unlinks supersedes the earlier
    # add within the same batch
    recs, _, rep = _run(
        spark,
        [("1000001", "bibs", "1000001", T1, "b")],
        [("1000001", T1)],
        [
            ("items", "7000001", T2, "i", ["1000001"], [], 0),
            ("items", "7000001", T3, "i", [], ["1000001"], 1),
        ],
    )
    assert rep[("1000001", "items", "7000001")] == "noop"  # nothing to remove
    assert ("1000001", "items", "7000001") not in recs


def test_transformables_view(spark):
    records, times = _state(
        spark,
        [
            ("1000001", "bibs", "1000001", T1, "bib-data"),
            ("1000001", "items", "7000002", T2, "i2"),
            ("1000001", "items", "7000001", T2, "i1"),
            ("1000001", "holdings", "3000001", T2, "h1"),
        ],
        [("1000001", T2)],
    )
    row = transformables(records, times).collect()[0]
    assert row.bib_data == "bib-data"
    assert [i.record_id for i in row.items] == ["7000001", "7000002"]
    assert [h.record_id for h in row.holdings] == ["3000001"]
    assert row.orders == []
    assert row.modified_time == T2


def test_unlink_racing_sibling_add_in_same_batch_is_noop_not_error(spark):
    # an unlink targeting a bib that another mention in the SAME batch
    # creates: sequential replay would find the bib (created first) and
    # report the gone-record benign noop, not a storage error
    _, times, rep = _run(
        spark,
        [],
        [],
        [
            ("bibs", "1000001", T1, "b", ["1000001"], [], 0),
            ("items", "7000001", T2, "i", [], ["1000001"], 1),
        ],
    )
    assert rep[("1000001", "bibs", "1000001")] == "created"
    assert rep[("1000001", "items", "7000001")] == "noop"
    # unlink of a truly absent bib in the same batch still errors
    _, _, rep2 = _run(
        spark,
        [],
        [],
        [
            ("bibs", "1000001", T1, "b", ["1000001"], [], 0),
            ("items", "7000001", T2, "i", [], ["9999999"], 1),
        ],
    )
    assert rep2[("9999999", "items", "7000001")] == "error_missing"
