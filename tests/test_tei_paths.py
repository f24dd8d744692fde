"""TEI path↔id fold parity — scenarios from
tei_id_extractor PathIdManagerTest."""

from datetime import datetime

from catalogue_pipeline_spark.plans.tei_paths import (
    EVENTS_SCHEMA,
    STATE_SCHEMA,
    fold_path_ids,
)

T1 = datetime(2024, 3, 1, 12, 0)
T2 = datetime(2024, 3, 2, 12, 0)
T3 = datetime(2024, 3, 3, 12, 0)


def _run(spark, state_rows, event_rows):
    state = spark.createDataFrame(state_rows, STATE_SCHEMA)
    events = spark.createDataFrame(event_rows, EVENTS_SCHEMA)
    new_state, messages = fold_path_ids(state, events)
    return (
        {r.id: r for r in new_state.collect()},
        sorted(
            (m.kind, m.id, m.time_modified, m.store_key)
            for m in messages.collect()
        ),
    )


def test_stores_unseen_path_and_id(spark):
    # 'stores a previously unseen path & id'
    state, msgs = _run(
        spark, [], [("changed", "P/a.xml", "MS_A", T1, 0)]
    )
    assert state["MS_A"].path == "P/a.xml"
    assert msgs == [
        ("changed", "MS_A", T1, f"tei_files/MS_A/{int(T1.timestamp())}.xml")
    ]


def test_records_change_to_seen_id_and_path(spark):
    # 'records a change to previously seen id & path' + stale no-op
    state, msgs = _run(
        spark,
        [("MS_A", "P/a.xml", T1)],
        [
            ("changed", "P/a.xml", "MS_A", T2, 0),
            ("changed", "P/a.xml", "MS_A", T1, 1),  # not strictly newer: drop
        ],
    )
    assert state["MS_A"].time_modified == T2
    assert len(msgs) == 1 and msgs[0][0] == "changed"


def test_records_id_moved(spark):
    # 'record that a previously seen id has moved'
    state, msgs = _run(
        spark,
        [("MS_A", "P/old.xml", T1)],
        [("changed", "P/new.xml", "MS_A", T2, 0)],
    )
    assert state["MS_A"].path == "P/new.xml"
    assert len(state) == 1  # the old path binding is gone
    assert msgs == [
        ("changed", "MS_A", T2, f"tei_files/MS_A/{int(T2.timestamp())}.xml")
    ]


def test_new_id_moves_into_seen_path(spark):
    # 'records that a new id has moved into a previously seen path' —
    # the displaced id gets a deleted message stamped with the new time
    state, msgs = _run(
        spark,
        [("MS_OLD", "P/a.xml", T1)],
        [("changed", "P/a.xml", "MS_NEW", T2, 0)],
    )
    assert set(state) == {"MS_NEW"}
    assert ("deleted", "MS_OLD", T2, None) in msgs
    assert any(m[0] == "changed" and m[1] == "MS_NEW" for m in msgs)


def test_id_moves_onto_occupied_path(spark):
    # PathIdManager :63-80 — both rows must be strictly older; the path
    # row's id is deleted and the id row follows the move
    state, msgs = _run(
        spark,
        [("MS_A", "P/a.xml", T1), ("MS_B", "P/b.xml", T1)],
        [("changed", "P/b.xml", "MS_A", T2, 0)],
    )
    assert set(state) == {"MS_A"}
    assert state["MS_A"].path == "P/b.xml"
    assert ("deleted", "MS_B", T2, None) in msgs


def test_deletes_a_path_and_ignores_unknown(spark):
    # 'deletes a path' + 'ignores if the pathId does not exist' + stale
    state, msgs = _run(
        spark,
        [("MS_A", "P/a.xml", T2)],
        [
            ("deleted", "P/a.xml", None, T3, 0),
            ("deleted", "P/unknown.xml", None, T3, 1),
            ("deleted", "P/a.xml", None, T1, 2),  # stale: ignored
        ],
    )
    assert state == {}
    assert msgs == [("deleted", "MS_A", T3, None)]


def test_batch_sequential_order(spark):
    # events in one batch replay in (time, seq) order: create then move
    state, msgs = _run(
        spark,
        [],
        [
            ("changed", "P/new.xml", "MS_A", T2, 1),
            ("changed", "P/old.xml", "MS_A", T1, 0),
        ],
    )
    assert state["MS_A"].path == "P/new.xml"
    assert [m[0] for m in msgs] == ["changed", "changed"]


def test_non_utc_session_timezone_rejected(spark):
    # store-key epochs come from naive session-local timestamps, so a
    # session not pinned to UTC must fail loudly rather than mint
    # shifted tei_files/{id}/{epoch}.xml keys
    import pytest

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="session.timeZone"):
            _run(spark, [], [("changed", "P/a.xml", "MS_A", T1, 0)])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
