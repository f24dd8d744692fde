"""Lake table format: atomic commits, snapshot isolation, time travel,
bucket pruning, schema widening on read, snapshot expiry."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from catalogue_pipeline_spark.lake import CommitConflict, LakeTable

SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def make_table(tmp_path, nb=4):
    return LakeTable.create(
        str(tmp_path / "t"), SCHEMA, bucket_key="conv_id", num_buckets=nb
    )


def test_create_and_empty_read(spark, tmp_path):
    t = make_table(tmp_path)
    df = t.read(spark)
    assert df.count() == 0
    assert df.schema == SCHEMA
    assert t.current_snapshot_id() == 0


def test_append_read_time_travel(spark, tmp_path):
    t = make_table(tmp_path)
    d1 = spark.createDataFrame([("a", 1, "x")], SCHEMA)
    t.append(d1, changeset_id="cs1", sort_cols=["conv_id", "turn_idx"])
    d2 = spark.createDataFrame([("b", 2, "y")], SCHEMA)
    t.append(d2, changeset_id="cs2", sort_cols=["conv_id", "turn_idx"])
    assert t.read(spark).count() == 2
    # pinned snapshot read (V7 fencing)
    assert t.read(spark, snapshot_id=1).count() == 1
    assert [s.summary["changeset_id"] for s in t.history()[1:]] == ["cs1", "cs2"]


def test_bucket_pruned_read(spark, tmp_path):
    t = make_table(tmp_path, nb=8)
    rows = [(f"c{i}", i, f"t{i}") for i in range(100)]
    t.append(spark.createDataFrame(rows, SCHEMA), changeset_id="cs1")
    snap = t.snapshot()
    some_bucket = snap.files[0]["bucket"]
    pruned = t.read(spark, buckets=[some_bucket])
    full = t.read(spark, with_bucket_col=True)
    expect = full.filter(F.col("__bucket") == some_bucket).count()
    assert pruned.count() == expect > 0
    # pruned read touches strictly fewer files
    assert len([f for f in snap.files if f["bucket"] == some_bucket]) < len(snap.files)


def test_overwrite_buckets_is_atomic_single_snapshot(spark, tmp_path):
    t = make_table(tmp_path, nb=4)
    rows = [(f"c{i}", i, "old") for i in range(20)]
    t.append(spark.createDataFrame(rows, SCHEMA), changeset_id="cs1")
    before = t.current_snapshot_id()
    df = t.read(spark, with_bucket_col=True)
    target_buckets = [r["__bucket"] for r in df.select("__bucket").distinct().collect()][:2]
    new = (
        t.read(spark, buckets=target_buckets)
        .withColumn("text", F.lit("new"))
    )
    t.overwrite_buckets(new, buckets=target_buckets, changeset_id="cs2")
    assert t.current_snapshot_id() == before + 1  # exactly one commit
    got = t.read(spark)
    assert got.count() == 20
    n_new = got.filter(F.col("text") == "new").count()
    assert n_new == t.read(spark, buckets=target_buckets).count()


def test_commit_conflict_on_expected_parent(spark, tmp_path):
    t = make_table(tmp_path)
    d = spark.createDataFrame([("a", 1, "x")], SCHEMA)
    t.append(d, changeset_id="cs1")
    with pytest.raises(CommitConflict):
        t.commit([], set(), {"operation": "noop"}, expected_parent=0)


def test_metadata_count(spark, tmp_path):
    t = make_table(tmp_path)
    t.append(spark.createDataFrame([("a", 1, "x"), ("b", 2, "y")], SCHEMA), "cs1")
    assert t.metadata_count() == 2


def test_schema_widening_read(spark, tmp_path):
    """Old files written with int32 read back under the widened int64 schema
    (parquet type promotion) — scenario 10 plumbing."""
    narrow = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", IntegerType(), False),
            StructField("text", StringType(), True),
        ]
    )
    t = LakeTable.create(str(tmp_path / "t"), narrow, bucket_key="conv_id", num_buckets=2)
    t.append(spark.createDataFrame([("a", 1, "x")], narrow), "cs1")
    # widen table schema via a metadata-only commit
    t.commit([], set(), {"operation": "widen"}, schema=SCHEMA)
    got = t.read(spark)
    assert got.schema["turn_idx"].dataType == LongType()
    assert got.collect()[0]["turn_idx"] == 1


def test_expire_snapshots_gc(spark, tmp_path):
    t = make_table(tmp_path, nb=2)
    for i in range(5):
        t.append(spark.createDataFrame([(f"c{i}", i, "x")], SCHEMA), f"cs{i}")
    # rewrite everything so old files become unreferenced
    all_buckets = sorted({f["bucket"] for f in t.snapshot().files})
    t.overwrite_buckets(t.read(spark), buckets=all_buckets, changeset_id="rw")
    deleted = t.expire_snapshots(keep_last=1)
    assert deleted > 0
    assert t.read(spark).count() == 5  # current snapshot intact


def test_summary_fencing_roundtrip(spark, tmp_path):
    t = make_table(tmp_path)
    t.append(
        spark.createDataFrame([("a", 1, "x")], SCHEMA),
        changeset_id="cs1",
        summary={"range": {"range_id": "000000001"}},
    )
    assert any(
        json.dumps(s).find("000000001") >= 0 for s in t.summaries()
    )


def test_orphan_files_ignored_and_gc(spark, tmp_path):
    """A crash between write_data_files and commit leaves orphan parquet
    files: reads never see them (manifest-driven). expire_snapshots only
    removes them past the orphan grace period — younger files could belong
    to an IN-FLIGHT writer between write_data_files and commit."""
    import os

    t = make_table(tmp_path)
    t.append(spark.createDataFrame([("a", 1, "x")], SCHEMA), "cs1")
    # simulate the crash: files written, no commit
    t.write_data_files(spark.createDataFrame([("zz", 9, "orphan")], SCHEMA), "crashed")
    assert t.read(spark).count() == 1  # orphan invisible
    assert t.expire_snapshots(keep_last=10) == 0  # within grace: kept
    deleted = t.expire_snapshots(keep_last=10, orphan_grace_s=0.0)
    assert deleted >= 1  # past grace: orphan files GC'd
    assert t.read(spark).count() == 1
    data_files = [
        f for _r, _d, fs in os.walk(t.data_dir) for f in fs if f.endswith(".parquet")
    ]
    live = {f["path"].split("/")[-1] for f in t.snapshot().files}
    assert set(data_files) == live


def test_concurrent_commit_race_single_winner(spark, tmp_path):
    """Two writers racing to the same parent: exactly one wins, the loser
    gets CommitConflict (the optimistic lock, V4 analog)."""
    import threading

    t = make_table(tmp_path)
    results = []
    barrier = threading.Barrier(2)

    def committer(tag):
        try:
            barrier.wait()
            t.commit([], set(), {"operation": f"race-{tag}"}, expected_parent=0)
            results.append(("ok", tag))
        except CommitConflict:
            results.append(("conflict", tag))

    threads = [threading.Thread(target=committer, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    outcomes = sorted(r[0] for r in results)
    assert outcomes == ["conflict", "ok"]
    assert t.current_snapshot_id() == 1


def test_crashed_commit_heals_instead_of_wedging(spark, tmp_path):
    """A crash between _write_snapshot and _publish leaves an orphan
    v{N}.json while CURRENT points at N-1. Within the grace period commits
    conflict (an in-flight writer may be about to publish); past it, the next
    commit adopts the slot — the table must never wedge permanently."""
    import os
    import time

    import pytest as _pytest

    from catalogue_pipeline_spark.lake.table import CommitConflict

    t = make_table(tmp_path)
    t.append(spark.createDataFrame([("a", 1, "x")], SCHEMA), "cs1")
    cur = t.current_snapshot_id()
    # simulate the crashed writer: v{N+1}.json exists, CURRENT not advanced
    orphan = os.path.join(t.meta_dir, f"v{cur + 1}.json")
    snap = t.snapshot()
    snap.snapshot_id, snap.parent_id = cur + 1, cur
    with open(orphan, "w") as f:
        f.write(snap.to_json())
    with _pytest.raises(CommitConflict):  # young orphan: treated as in-flight
        t.commit([], set(), {"operation": "noop"})
    old = time.time() - 10_000
    os.utime(orphan, (old, old))
    got = t.commit([], set(), {"operation": "noop"})  # heals and commits
    assert got.snapshot_id == cur + 1
    assert t.current_snapshot_id() == cur + 1
    assert t.read(spark).count() == 1
    # healing QUARANTINES the orphan (atomic rename) rather than unlinking —
    # a second healer racing on the same slot loses the rename, so it can
    # never delete the winner's freshly-written replacement snapshot
    qs = [f for f in os.listdir(t.meta_dir) if f.startswith(f".orphan-v{cur + 1}.")]
    assert len(qs) == 1
    # aged quarantine files are GC'd with the snapshots
    os.utime(os.path.join(t.meta_dir, qs[0]), (old, old))
    t.expire_snapshots(keep_last=10, orphan_grace_s=1.0)
    assert not [f for f in os.listdir(t.meta_dir) if f.startswith(".orphan-")]


def test_stalled_writer_cannot_regress_current(spark, tmp_path):
    """A writer stalled past the grace period whose v{N} slot was healed (and
    built on by later commits) must not move CURRENT backwards when it wakes
    up and publishes: _publish is CAS-like on the snapshot's parent."""
    import os
    import time

    import pytest as _pytest

    from catalogue_pipeline_spark.lake.table import CommitConflict

    t = make_table(tmp_path)
    cur = t.current_snapshot_id()  # 0
    # stalled writer wrote v1 but paused before _publish
    orphan = os.path.join(t.meta_dir, f"v{cur + 1}.json")
    snap = t.snapshot()
    snap.snapshot_id, snap.parent_id = cur + 1, cur
    with open(orphan, "w") as f:
        f.write(snap.to_json())
    old = time.time() - 10_000
    os.utime(orphan, (old, old))
    # another committer heals the slot and advances the table twice
    t.commit([], set(), {"operation": "heal"})
    t.commit([], set(), {"operation": "next"})
    assert t.current_snapshot_id() == cur + 2
    # the stalled writer wakes and tries to publish its long-dead commit
    with _pytest.raises(CommitConflict):
        t._publish(cur + 1, expected_current=cur)
    assert t.current_snapshot_id() == cur + 2  # no regression
