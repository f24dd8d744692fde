"""Selective replay (the reindexer's partial/specific modes,
reindexer/README.md:47-55): re-drive chosen conversations through the same
apply path — targeted keys converge to the full-replay state, everything else
untouched, and re-driving an already-current key is a no-op."""

import os

from pyspark.sql import functions as F

from catalogue_pipeline_spark.cdc import STATE_SCHEMA, plan_ranges
from catalogue_pipeline_spark.cdc.checkpoints import CheckpointStore
from catalogue_pipeline_spark.cdc.generator import generate_binlog, write_binlog
from catalogue_pipeline_spark.cdc.replay import ReplayDriver
from catalogue_pipeline_spark.lake import LakeTable

N_EVENTS = 4000


def make_driver(spark, tmp_path, name, binlog):
    table = LakeTable.create(
        os.path.join(str(tmp_path), name), STATE_SCHEMA, bucket_key="conv_id", num_buckets=4
    )
    return ReplayDriver(
        spark, binlog, table, CheckpointStore(os.path.join(str(tmp_path), f"{name}-ck"))
    )


def rows_of(spark, table, pred=None):
    df = table.read(spark)
    if pred is not None:
        df = df.filter(pred)
    return sorted(tuple(r) for r in df.collect())


def test_selective_replay_specific_and_partial(spark, tmp_path):
    binlog = os.path.join(str(tmp_path), "binlog")
    write_binlog(
        generate_binlog(spark, N_EVENTS, n_convs=40, turns_per_conv=6, seed=9),
        binlog,
        ranges=8,
    )
    ranges = plan_ranges(0, N_EVENTS, range_size=1000)

    # reference: full replay
    full = make_driver(spark, tmp_path, "full", binlog)
    full.run(ranges)

    # stale table: only the first half of the binlog applied
    stale = make_driver(spark, tmp_path, "stale", binlog)
    stale.run(ranges[:2])

    targets = ["c1", "c7", "hot_0"]
    sel = F.col("conv_id").isin(targets)
    present = [
        r["conv_id"]
        for r in spark.read.parquet(binlog)
        .filter(sel)
        .select("conv_id")
        .distinct()
        .collect()
    ]
    assert present  # the chosen ids actually occur in this binlog

    # specific mode: re-drive ONLY those conversations over the full binlog
    sid, m = stale.replay_selective(conv_ids=targets, changeset_id="rx1")
    assert m.events_in > 0
    # targeted keys now equal the full-replay state…
    assert rows_of(spark, stale.table, sel) == rows_of(spark, full.table, sel)
    # …and non-targeted keys still hold the stale (half-replay) values
    half = make_driver(spark, tmp_path, "half", binlog)
    half.run(ranges[:2])
    assert rows_of(spark, stale.table, ~sel) == rows_of(spark, half.table, ~sel)

    # re-driving the same ids again is a complete no-op (V3: no commit)
    before = stale.table.current_snapshot_id()
    sid2, m2 = stale.replay_selective(conv_ids=targets, changeset_id="rx2")
    assert sid2 is None and m2.events_applied == 0
    assert stale.table.current_snapshot_id() == before

    # partial mode: a predicate re-drive (all hot_* convs) converges those too
    stale.replay_selective(
        conv_filter=F.col("conv_id").startswith("hot_"), changeset_id="rx3"
    )
    hot = F.col("conv_id").startswith("hot_")
    assert rows_of(spark, stale.table, hot) == rows_of(spark, full.table, hot)


def test_selective_replay_requires_a_selection(spark, tmp_path):
    import pytest as _pytest

    binlog = os.path.join(str(tmp_path), "binlog")
    write_binlog(generate_binlog(spark, 200, n_convs=5, turns_per_conv=3, seed=1), binlog, ranges=2)
    d = make_driver(spark, tmp_path, "t", binlog)
    with _pytest.raises(ValueError, match="selective replay"):
        d.replay_selective()
