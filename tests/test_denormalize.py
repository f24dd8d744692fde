"""Incremental denormalizer: transcripts → conversation documents, refreshed
only for touched conversations, no-op suppressed, delete-aware."""

import datetime as dt

from pyspark.sql import functions as F

from catalogue_pipeline_spark.cdc import (
    BINLOG_SCHEMA,
    STATE_SCHEMA,
    SchemaRegistry,
    merge_into_state,
    resolve_lww,
)
from catalogue_pipeline_spark.lake import LakeTable
from catalogue_pipeline_spark.lake.table import read_changesets
from catalogue_pipeline_spark.plans.denormalize import create_docs_table, refresh_documents

T0 = dt.datetime(2024, 1, 1)


def ev(offset, op, conv, turn, text=None, t=0, role="user"):
    return (offset, op, conv, turn, None if op == "delete" else role,
            text, None, T0 + dt.timedelta(seconds=t), 3)


def apply(spark, table, events, cs):
    df = spark.createDataFrame(events, BINLOG_SCHEMA)
    return merge_into_state(spark, table, resolve_lww(SchemaRegistry().normalize(df)), cs)


def docs_map(spark, docs):
    return {r["conv_id"]: r for r in docs.read(spark).collect()}


def test_incremental_docs_refresh(spark, tmp_path):
    tr = LakeTable.create(str(tmp_path / "tr"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=4)
    docs = create_docs_table(str(tmp_path / "docs"), num_buckets=4)

    apply(spark, tr, [
        ev(0, "insert", "a", 0, "hello", 0),
        ev(1, "insert", "a", 1, "world", 1, role="assistant"),
        ev(2, "insert", "b", 0, "solo", 2),
    ], "cs1")
    snap, n = refresh_documents(spark, tr, docs, "d1")
    assert snap is not None and n == 2
    d = docs_map(spark, docs)
    assert d["a"]["n_turns"] == 2 and d["a"]["text_concat"] == "hello\nworld"
    assert d["a"]["roles"] == "assistant+user"

    # refresh again with no upstream change → fast no-op, progress recorded
    snap2, n2 = refresh_documents(spark, tr, docs, "d2")
    assert snap2 is None and n2 == 0

    # touch only conversation b → only its doc recomputed
    apply(spark, tr, [ev(3, "update", "b", 0, "solo v2", 10)], "cs2")
    snap3, n3 = refresh_documents(spark, tr, docs, "d3")
    assert snap3 is not None
    d = docs_map(spark, docs)
    assert d["b"]["text_concat"] == "solo v2"
    assert d["a"]["text_concat"] == "hello\nworld"  # untouched

    # delete ALL of b → its document disappears
    apply(spark, tr, [ev(4, "delete", "b", 0, None, 20)], "cs3")
    refresh_documents(spark, tr, docs, "d4")
    d = docs_map(spark, docs)
    assert "b" not in d and "a" in d


def test_read_changesets_manifest_pruning(spark, tmp_path):
    tr = LakeTable.create(str(tmp_path / "tr"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=2)
    apply(spark, tr, [ev(0, "insert", "a", 0, "one", 0)], "csA")
    apply(spark, tr, [ev(1, "insert", "b", 0, "two", 1)], "csB")
    got = read_changesets(spark, tr, ["csB"])
    rows = got.collect()
    # csB rewrote b's bucket: it contains b's row (and any co-bucketed rows),
    # but never rows from files written by csA-only buckets
    assert any(r["conv_id"] == "b" for r in rows)
    all_csB_paths = [f["path"] for f in tr.snapshot().files if f["path"].startswith("cs-csB/")]
    assert len(all_csB_paths) >= 1
    none = read_changesets(spark, tr, ["nope"])
    assert none.count() == 0 and none.schema == tr.snapshot().schema
