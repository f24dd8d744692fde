"""Snapshot-sync source: mirrors the reference's
test_adapter_store_snapshot_sync.py scenarios at DataFrame level."""

import datetime as dt

from pyspark.sql import functions as F

from catalogue_pipeline_spark.cdc import STATE_SCHEMA
from catalogue_pipeline_spark.cdc.merge import visible_transcripts
from catalogue_pipeline_spark.lake import LakeTable
from catalogue_pipeline_spark.sources import snapshot_sync

T0 = dt.datetime(2024, 1, 1)
SNAP_SCHEMA = "conv_id string, turn_idx long, role string, text string, tool string"


def mk(spark, rows):
    return spark.createDataFrame(rows, SNAP_SCHEMA)


def sync(spark, table, rows, ts, cs, base=0):
    return snapshot_sync(spark, table, mk(spark, rows), ts, cs, offset_base=base)


def vis(spark, table):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in visible_transcripts(table.read(spark)).collect()
    }


def test_snapshot_lifecycle(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "t"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=4
    )
    # initial snapshot: all inserts
    snap1 = [("a", 0, "user", "hello", None), ("a", 1, "assistant", "hi", None),
             ("b", 0, "user", "other", None)]
    _, m1 = sync(spark, table, snap1, T0, "s1", base=0)
    assert m1.inserts == 3
    assert vis(spark, table) == {("a", 0): "hello", ("a", 1): "hi", ("b", 0): "other"}

    # second snapshot: one changed, one missing (soft delete), one new
    snap2 = [("a", 0, "user", "hello v2", None), ("a", 1, "assistant", "hi", None),
             ("c", 0, "user", "new", None)]
    _, m2 = sync(spark, table, snap2, T0 + dt.timedelta(hours=1), "s2", base=1 << 41)
    assert m2.updates == 1 and m2.deletes == 1 and m2.inserts == 1
    # unchanged ("a",1) produced NO event at all (J2)
    assert m2.noop_updates == 0 and m2.events_in == 3
    assert vis(spark, table) == {("a", 0): "hello v2", ("a", 1): "hi", ("c", 0): "new"}

    # soft-deleted row keeps its content (J5) for replayability
    st = {(r["conv_id"], r["turn_idx"]): r for r in table.read(spark).collect()}
    assert st[("b", 0)]["deleted"] == "true" and st[("b", 0)]["text"] == "other"

    # identical snapshot re-applied → nothing committed (V3)
    before = table.current_snapshot_id()
    snap_id, m3 = sync(spark, table, snap2, T0 + dt.timedelta(hours=2), "s3", base=1 << 42)
    assert snap_id is None and table.current_snapshot_id() == before

    # re-appearing id is un-deleted with new content
    snap3 = snap2 + [("b", 0, "user", "returned", None)]
    _, m4 = sync(spark, table, snap3, T0 + dt.timedelta(hours=3), "s4", base=1 << 43)
    assert vis(spark, table)[("b", 0)] == "returned"

    # STALE snapshot (older ts than current state) loses everywhere
    _, m5 = sync(spark, table, snap1, T0 - dt.timedelta(hours=1), "s5", base=1 << 44)
    assert m5.events_applied == 0
    assert vis(spark, table)[("a", 0)] == "hello v2"
