"""Merge-on-read delta mode: append-only ingest + read-time register reduce
+ compaction must be byte-identical to copy-on-write mode and the oracle."""

from catalogue_pipeline_spark.cdc import (
    STATE_SCHEMA,
    NaiveApplier,
    ReplayDriver,
    generate_binlog,
    plan_ranges,
)
from catalogue_pipeline_spark.cdc.checkpoints import CheckpointStore
from catalogue_pipeline_spark.cdc.generator import write_binlog
from catalogue_pipeline_spark.cdc.merge import compact, read_state, visible_transcripts
from catalogue_pipeline_spark.lake import LakeTable

N = 2000


def _mk(spark, tmp_path, name, mode):
    table = LakeTable.create(
        str(tmp_path / name), STATE_SCHEMA, bucket_key="conv_id", num_buckets=4
    )
    return ReplayDriver(
        spark,
        str(tmp_path / "binlog"),
        table,
        CheckpointStore(str(tmp_path / f"ck-{name}")),
        mode=mode,
    )


def test_delta_equals_cow_equals_oracle(spark, tmp_path):
    binlog = str(tmp_path / "binlog")
    write_binlog(generate_binlog(spark, N, n_convs=50, turns_per_conv=6, seed=9), binlog, 4)
    ranges = plan_ranges(0, N, range_size=400)

    cow = _mk(spark, tmp_path, "cow", "cow")
    cow.run(ranges)
    cow_state = sorted(tuple(r) for r in cow.table.read(spark).collect())

    dl = _mk(spark, tmp_path, "delta", "delta")
    dl.run(ranges)
    # uncompacted reduced view already equals COW state
    dl_state = sorted(tuple(r) for r in read_state(spark, dl.table).collect())
    assert dl_state == cow_state
    # delta files present before compaction, none after
    assert dl.table.delta_buckets()
    compact(spark, dl.table, changeset_id="compact-1")
    assert dl.table.delta_buckets() == []
    dl_compacted = sorted(tuple(r) for r in dl.table.read(spark).collect())
    assert dl_compacted == cow_state

    oracle = NaiveApplier()
    oracle.apply_all([r.asDict() for r in spark.read.parquet(binlog).collect()])
    assert dl_compacted == sorted(oracle.state_rows())


def test_delta_resume_fencing(spark, tmp_path):
    binlog = str(tmp_path / "binlog")
    write_binlog(generate_binlog(spark, N, n_convs=50, turns_per_conv=6, seed=9), binlog, 4)
    ranges = plan_ranges(0, N, range_size=500)
    dl = _mk(spark, tmp_path, "d2", "delta")
    dl.run(ranges, max_ranges=2)
    rep = dl.run(ranges)  # resumes
    assert rep.ranges_skipped == 2 and rep.ranges_applied == 2
    # re-run: fully fenced
    rep2 = dl.run(ranges)
    assert rep2.ranges_applied == 0


def test_cow_after_delta_sees_reduced_target(spark, tmp_path):
    """A COW merge on a table carrying deltas must join against the REDUCED
    state, not raw multi-version rows."""
    binlog = str(tmp_path / "binlog")
    write_binlog(generate_binlog(spark, N, n_convs=50, turns_per_conv=6, seed=9), binlog, 4)
    ranges = plan_ranges(0, N, range_size=500)
    dl = _mk(spark, tmp_path, "d3", "delta")
    dl.run(ranges, max_ranges=3)
    # switch the same table to cow mode for the final range
    cow_tail = ReplayDriver(spark, binlog, dl.table, dl.checkpoints, mode="cow")
    cow_tail.run(ranges)
    got = sorted(tuple(r) for r in read_state(spark, dl.table).collect())
    oracle = NaiveApplier()
    oracle.apply_all([r.asDict() for r in spark.read.parquet(binlog).collect()])
    assert got == sorted(oracle.state_rows())
    assert visible_transcripts(read_state(spark, dl.table)).count() > 0


def test_auto_compaction_cadence(spark, tmp_path):
    """compact_every folds deltas mid-replay; expire_keep_last GCs old
    snapshots; final state unchanged."""
    binlog = str(tmp_path / "binlog")
    write_binlog(generate_binlog(spark, N, n_convs=50, turns_per_conv=6, seed=9), binlog, 4)
    ranges = plan_ranges(0, N, range_size=500)
    dl = _mk(spark, tmp_path, "auto", "delta")
    dl.run(ranges, compact_every=2, expire_keep_last=3)
    # after 4 ranges with compact_every=2 the last op was a compaction
    assert dl.table.delta_buckets() == []
    # expiry actually dropped old snapshot metadata
    assert len(dl.table.history()) <= 4
    oracle = NaiveApplier()
    oracle.apply_all([r.asDict() for r in spark.read.parquet(binlog).collect()])
    got = sorted(tuple(r) for r in read_state(spark, dl.table).collect())
    assert got == sorted(oracle.state_rows())


def test_read_state_split_read_reduces_only_delta_buckets(spark, tmp_path):
    """Round-8 split-read: with deltas confined to a strict bucket subset,
    read_state must equal the full reduce row-for-row while its plan carries
    exactly ONE exchange (the reduce over delta buckets); clean base buckets
    union through with no shuffle."""
    from catalogue_pipeline_spark.cdc.merge import reduce_state

    binlog = str(tmp_path / "binlog")
    write_binlog(generate_binlog(spark, N, n_convs=50, turns_per_conv=6, seed=9), binlog, 4)
    dl = _mk(spark, tmp_path, "delta", "delta")
    dl.run(plan_ranges(0, N, range_size=400))
    compact(spark, dl.table, changeset_id="c-all")
    assert dl.table.delta_buckets() == []
    # one surgical delta append: a single conversation → one bucket
    dl.replay_selective(conv_ids=["c1"], changeset_id="touch-one")
    dbuckets = set(dl.table.delta_buckets())
    all_buckets = {f["bucket"] for f in dl.table.snapshot().files}
    assert dbuckets and dbuckets < all_buckets

    out = read_state(spark, dl.table)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    full = reduce_state(dl.table.read(spark))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, full.collect()))
