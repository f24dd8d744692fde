"""Golden replay scenarios — FIXTURES.md §4, mirrored 1:1 from the
reference's store tests (test_pipeline_store_incremental_update.py,
test_adapter_store_snapshot_sync.py) at DataFrame level."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.cdc import (
    BINLOG_SCHEMA,
    STATE_SCHEMA,
    SchemaRegistry,
    merge_into_state,
    resolve_lww,
)
from catalogue_pipeline_spark.cdc.merge import visible_transcripts
from catalogue_pipeline_spark.lake import LakeTable

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(s):
    return T0 + dt.timedelta(seconds=s)


def ev(offset, op, conv, turn, text=None, t=0, role="user", tool=None, ver=3):
    return (offset, op, conv, turn, None if op == "delete" else role, text, tool, ts(t), ver)


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(
        str(tmp_path / "transcripts"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=4
    )


def apply(spark, table, events, changeset="cs"):
    df = spark.createDataFrame(events, BINLOG_SCHEMA)
    resolved = resolve_lww(SchemaRegistry().normalize(df))
    return merge_into_state(spark, table, resolved, changeset_id=changeset)


def visible(spark, table):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"], r["ts"])
        for r in visible_transcripts(table.read(spark)).collect()
    }


def test_1_insert_only(spark, table):
    snap, m = apply(spark, table, [
        ev(0, "insert", "a", 0, "hello", t=0),
        ev(1, "insert", "a", 1, "world", t=1),
        ev(2, "insert", "b", 0, "other", t=1),
    ])
    v = visible(spark, table)
    assert v[("a", 0)][1] == "hello" and v[("a", 1)][1] == "world" and v[("b", 0)][1] == "other"
    assert m.inserts == 3 and m.events_applied == 3 and m.dedup_drops == 0


def test_2_update_newer_wins(spark, table):
    apply(spark, table, [ev(0, "insert", "a", 0, "v1", t=0)])
    snap, m = apply(spark, table, [ev(1, "update", "a", 0, "v2", t=10)], "cs2")
    assert visible(spark, table)[("a", 0)][1] == "v2"
    assert m.updates == 1


def test_3_stale_update_dropped(spark, table):
    apply(spark, table, [ev(0, "insert", "a", 0, "v1", t=10)])
    snap, m = apply(spark, table, [ev(1, "update", "a", 0, "old", t=5)], "cs2")
    assert visible(spark, table)[("a", 0)][1] == "v1"
    assert m.dedup_drops == 1 and m.late_arrivals == 1 and m.events_applied == 0
    assert snap is None  # V3: stale batch commits nothing


def test_4_equal_ts_replace(spark, table):
    """`>=` rule: same ts replaces (TransformableOps.scala:145-150)."""
    apply(spark, table, [ev(0, "insert", "a", 0, "v1", t=10)])
    snap, m = apply(spark, table, [ev(1, "update", "a", 0, "v2", t=10)], "cs2")
    assert visible(spark, table)[("a", 0)][1] == "v2"


def test_5_equal_ts_delete_wins_either_order(spark, table):
    """Delete dominates at equal ts regardless of offset order (X6)."""
    apply(spark, table, [
        ev(0, "update", "a", 0, "upd", t=10),
        ev(1, "delete", "a", 0, t=10),
    ])
    assert ("a", 0) not in visible(spark, table)
    # other arrival order, fresh key
    apply(spark, table, [
        ev(2, "delete", "a", 1, t=10),
        ev(3, "update", "a", 1, "upd", t=10),
    ], "cs2")
    assert ("a", 1) not in visible(spark, table)


def test_6_delete_then_late_update_dropped(spark, table):
    apply(spark, table, [ev(0, "insert", "a", 0, "v1", t=0)])
    apply(spark, table, [ev(1, "delete", "a", 0, t=20)], "cs2")
    snap, m = apply(spark, table, [ev(2, "update", "a", 0, "late", t=10)], "cs3")
    assert ("a", 0) not in visible(spark, table)
    assert m.events_applied == 0 and m.dedup_drops == 1
    # tombstone retains replayable payload (J5 via nd register)... but the
    # late update DID advance the nd register (it is the newest non-delete)
    st = {(r["conv_id"], r["turn_idx"]): r for r in table.read(spark).collect()}
    assert st[("a", 0)]["deleted"] == "true"


def test_6b_newer_update_revives(spark, table):
    apply(spark, table, [ev(0, "delete", "a", 0, t=10)])
    snap, m = apply(spark, table, [ev(1, "update", "a", 0, "new", t=20)], "cs2")
    assert visible(spark, table)[("a", 0)][1] == "new"


def test_7_duplicate_delivery_noop(spark, table):
    events = [
        ev(0, "insert", "a", 0, "x", t=0),
        ev(1, "update", "a", 0, "y", t=5),
        ev(2, "insert", "b", 3, "z", t=5),
    ]
    apply(spark, table, events)
    before = table.current_snapshot_id()
    snap, m = apply(spark, table, events, "cs2")  # exact replay
    assert snap is None  # no new snapshot — second apply is a pure no-op
    assert table.current_snapshot_id() == before
    assert m.events_applied == 0 and m.noop_updates == 2
    assert visible(spark, table)[("a", 0)][1] == "y"


def test_8_noop_update_content_equal(spark, table):
    """Newer ts, identical visible content → row changes only in registers;
    counted, and it must not count as an insert/delete."""
    apply(spark, table, [ev(0, "insert", "a", 0, "same", t=0)])
    snap, m = apply(spark, table, [ev(1, "update", "a", 0, "same", t=10)], "cs2")
    assert visible(spark, table)[("a", 0)][1] == "same"
    assert m.inserts == 0 and m.deletes == 0


def test_j5_delete_preserves_content_in_tombstone(spark, table):
    apply(spark, table, [ev(0, "insert", "a", 0, "keepme", t=0)])
    apply(spark, table, [ev(1, "delete", "a", 0, t=10)], "cs2")
    st = {(r["conv_id"], r["turn_idx"]): r for r in table.read(spark).collect()}
    row = st[("a", 0)]
    assert row["deleted"] == "true" and row["text"] == "keepme" and row["role"] == "user"


def test_in_batch_lww_collapses(spark, table):
    """Many events for one key in one batch → single winner by
    (ts, op_pri, offset); in-batch losers counted as dedup_drops."""
    snap, m = apply(spark, table, [
        ev(0, "insert", "a", 0, "v0", t=0),
        ev(1, "update", "a", 0, "v1", t=5),
        ev(2, "update", "a", 0, "v2", t=5),   # equal ts: higher offset wins
        ev(3, "update", "a", 0, "stale", t=1),
    ])
    assert visible(spark, table)[("a", 0)][1] == "v2"
    assert m.dedup_drops == 3 and m.keys_in == 1 and m.events_in == 4


def test_delete_of_absent_key_is_idempotent_tombstone(spark, table):
    snap, m = apply(spark, table, [ev(0, "delete", "a", 0, t=5)])
    assert ("a", 0) not in visible(spark, table)
    st = table.read(spark).collect()
    assert len(st) == 1 and st[0]["deleted"] == "true" and st[0]["text"] is None
    # late update older than the delete still loses
    snap, m = apply(spark, table, [ev(1, "update", "a", 0, "late", t=1)], "cs2")
    assert ("a", 0) not in visible(spark, table)


def test_namespace_isolation_across_convs(spark, table):
    """Updates to one conversation never touch others (the reference's
    namespace isolation test) — including rows in the same bucket."""
    apply(spark, table, [ev(i, "insert", f"c{i}", 0, f"t{i}", t=i) for i in range(10)])
    apply(spark, table, [ev(100, "update", "c3", 0, "changed", t=100)], "cs2")
    v = visible(spark, table)
    assert v[("c3", 0)][1] == "changed"
    for i in [0, 1, 2, 4, 5, 6, 7, 8, 9]:
        assert v[(f"c{i}", 0)][1] == f"t{i}"


def test_bucket_skip_write(spark, table):
    """A batch touching only one conversation rewrites only that bucket."""
    apply(spark, table, [ev(i, "insert", f"c{i}", 0, f"t{i}", t=i) for i in range(32)])
    snap, m = apply(spark, table, [ev(100, "update", "c5", 0, "new", t=100)], "cs2")
    assert m.buckets_rewritten == 1
    # files from untouched buckets survive from the prior snapshot
    prev_files = {f["path"] for f in table.snapshot(table.current_snapshot_id() - 1).files}
    cur_files = {f["path"] for f in table.snapshot().files}
    assert prev_files & cur_files  # untouched buckets not rewritten
