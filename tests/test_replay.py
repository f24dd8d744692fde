"""Replay driver: checkpointing, idempotent resume, crash fencing, overlap,
gap detection, and end-to-end parity vs the naive single-threaded oracle."""

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.cdc import (
    STATE_SCHEMA,
    NaiveApplier,
    ReplayDriver,
    generate_binlog,
    plan_ranges,
)
from catalogue_pipeline_spark.cdc.checkpoints import CheckpointStore
from catalogue_pipeline_spark.cdc.generator import write_binlog
from catalogue_pipeline_spark.cdc.merge import visible_transcripts
from catalogue_pipeline_spark.cdc.replay import CrashInjected
from catalogue_pipeline_spark.lake import LakeTable

N_EVENTS = 2000


@pytest.fixture(scope="module")
def binlog_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("binlog") / "log")
    df = generate_binlog(spark, N_EVENTS, n_convs=60, turns_per_conv=8, seed=7)
    write_binlog(df, p, ranges=8)
    return p


@pytest.fixture(scope="module")
def oracle_state(spark, binlog_path):
    events = [r.asDict() for r in spark.read.parquet(binlog_path).collect()]
    o = NaiveApplier()
    o.apply_all(events)
    return o


def make_driver(spark, tmp_path, binlog_path, nb=8):
    table = LakeTable.create(
        str(tmp_path / "transcripts"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=nb
    )
    ck = CheckpointStore(str(tmp_path / "ck"))
    return ReplayDriver(spark, binlog_path, table, ck)


def assert_state_equals_oracle(spark, table, oracle):
    got = sorted(
        tuple(r) for r in table.read(spark).select(*[f.name for f in STATE_SCHEMA.fields]).collect()
    )
    want = sorted(oracle.state_rows())
    assert got == want


def test_full_replay_matches_oracle(spark, tmp_path, binlog_path, oracle_state):
    d = make_driver(spark, tmp_path, binlog_path)
    ranges = plan_ranges(0, N_EVENTS, range_size=500)
    rep = d.run(ranges)
    assert rep.ranges_applied == 4
    assert_state_equals_oracle(spark, d.table, oracle_state)
    # second run: everything fenced out, zero work
    rep2 = d.run(ranges)
    assert rep2.ranges_applied == 0 and rep2.ranges_skipped == 4
    assert_state_equals_oracle(spark, d.table, oracle_state)


def test_overlapping_ranges_same_result(spark, tmp_path, binlog_path, oracle_state):
    """S2: consecutive ranges overlap — idempotent apply absorbs it."""
    d = make_driver(spark, tmp_path, binlog_path)
    ranges = plan_ranges(0, N_EVENTS, range_size=450, overlap=50)
    d.run(ranges)
    assert_state_equals_oracle(spark, d.table, oracle_state)


def test_different_range_sizes_same_bytes(spark, tmp_path, binlog_path):
    """Associativity: any partitioning of the log yields identical state."""
    d1 = make_driver(spark, tmp_path / "a", binlog_path)
    d1.run(plan_ranges(0, N_EVENTS, 2000))  # one giant range
    d2 = make_driver(spark, tmp_path / "b", binlog_path)
    d2.run(plan_ranges(0, N_EVENTS, 137))   # many awkward ranges
    s1 = sorted(tuple(r) for r in d1.table.read(spark).collect())
    s2 = sorted(tuple(r) for r in d2.table.read(spark).collect())
    assert s1 == s2


def test_crash_between_commit_and_checkpoint(spark, tmp_path, binlog_path, oracle_state):
    """Scenario 11: crash AFTER range K's data commit, BEFORE its checkpoint
    row — resume must fence on the snapshot summary and not re-apply."""
    d = make_driver(spark, tmp_path, binlog_path)
    ranges = plan_ranges(0, N_EVENTS, range_size=500)
    with pytest.raises(CrashInjected):
        d.run(ranges, crash_after_commit_of=ranges[1].range_id)
    # checkpoint thinks range 1 unfinished; table knows better
    assert ranges[1].range_id not in d.checkpoints.successful_range_ids()
    snap_before_resume = d.table.current_snapshot_id()

    d2 = ReplayDriver(spark, binlog_path, d.table, d.checkpoints)
    repaired = d2.reconcile()
    assert repaired == 1
    rep = d2.run(ranges)
    assert rep.ranges_skipped == 2 and rep.ranges_applied == 2
    assert_state_equals_oracle(spark, d2.table, oracle_state)
    # resume did not double-apply range 1
    applied_ids = [
        s.summary["range"]["range_id"]
        for s in d2.table.history()
        if s.summary.get("range")
    ]
    assert len(applied_ids) == len(set(applied_ids))
    assert d.table.current_snapshot_id() >= snap_before_resume


def test_failed_range_retries_and_records(spark, tmp_path, binlog_path):
    d = make_driver(spark, tmp_path, binlog_path)
    ranges = plan_ranges(0, N_EVENTS, range_size=1000)
    broken = ReplayDriver(spark, binlog_path + "-missing", d.table, d.checkpoints)
    with pytest.raises(Exception):
        broken.run(ranges)
    row = d.checkpoints.get(ranges[0].range_id)
    assert row["state"] == "failed" and row["last_error"]
    # healthy driver resumes; attempts incremented
    d.run(ranges)
    row = d.checkpoints.get(ranges[0].range_id)
    assert row["state"] == "success" and row["attempts"] >= 2


def test_gap_detection(spark, tmp_path, binlog_path):
    d = make_driver(spark, tmp_path, binlog_path)
    ranges = plan_ranges(0, N_EVENTS, range_size=500)
    d.run([ranges[0], ranges[2]])  # leave holes
    gaps = d.coverage_gaps(N_EVENTS)
    assert gaps == [(500, 1000), (1500, 2000)]
    d.run(ranges)
    assert d.coverage_gaps(N_EVENTS) == []


def test_metrics_lineage(spark, tmp_path, binlog_path):
    d = make_driver(spark, tmp_path, binlog_path)
    rep = d.run(plan_ranges(0, N_EVENTS, range_size=500))
    m = rep.metrics
    assert m.events_in == N_EVENTS
    assert m.events_applied > 0 and m.dedup_drops > 0
    # checkpoint rows carry per-range metrics maps
    row = d.checkpoints.get("000000000")
    assert int(row["metrics"]["events_in"]) == 500
    # and the checkpoint table is queryable as a DataFrame
    ckdf = d.checkpoints.to_spark(spark)
    assert ckdf.filter(F.col("state") == "success").count() == 4


def test_late_arrivals_counted_across_ranges(spark, tmp_path):
    """Scenario 12: an event whose ts is older than the current per-key max
    (state from an earlier range) is LWW-dropped AND counted — never
    watermark-discarded (the reference has no watermark)."""
    p = str(tmp_path / "latelog")
    df = generate_binlog(
        spark, 1000, n_convs=10, turns_per_conv=4, seed=11,
        events_per_second=50, jitter_seconds=120,
    )
    write_binlog(df, p, ranges=4)
    d = make_driver(spark, tmp_path, p)
    rep = d.run(plan_ranges(0, 1000, range_size=100))
    assert rep.metrics.late_arrivals > 0
    # and parity still holds under heavy lateness
    events = [r.asDict() for r in spark.read.parquet(p).collect()]
    o = NaiveApplier()
    o.apply_all(events)
    assert_state_equals_oracle(spark, d.table, o)


def test_visible_invariant_per_turn_text_equality(spark, tmp_path, binlog_path, oracle_state):
    """The BASELINE.json per-row invariant: per-turn text equality under
    stable (conv_id, turn_idx) ordering."""
    d = make_driver(spark, tmp_path, binlog_path)
    d.run(plan_ranges(0, N_EVENTS, range_size=500))
    got = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in visible_transcripts(d.table.read(spark))
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]
    want = [(r[0], r[1], r[3]) for r in oracle_state.visible_rows()]
    assert got == want


def test_per_bucket_lineage_in_summary(spark, tmp_path, binlog_path):
    """A7 per-partition lineage: each COW commit records per-bucket
    applied/dropped/event counts in its snapshot summary."""
    d = make_driver(spark, tmp_path, binlog_path)
    d.run(plan_ranges(0, N_EVENTS, range_size=N_EVENTS))
    summaries = [s for s in d.table.summaries() if s.get("bucket_lineage")]
    assert summaries
    bl = summaries[-1]["bucket_lineage"]
    assert len(bl) >= 1
    assert all("applied=" in v and "events=" in v for v in bl.values())
