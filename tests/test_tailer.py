"""Continuous binlog tailing: new files appear, the tailer picks up exactly
the new offsets, overlap absorbed, state stays oracle-equal."""

from catalogue_pipeline_spark.cdc import (
    STATE_SCHEMA,
    NaiveApplier,
    ReplayDriver,
    generate_binlog,
)
from catalogue_pipeline_spark.cdc.checkpoints import CheckpointStore
from catalogue_pipeline_spark.cdc.replay import BinlogTailer
from catalogue_pipeline_spark.lake import LakeTable


def test_tailer_picks_up_new_segments(spark, tmp_path):
    binlog = str(tmp_path / "binlog")
    full = generate_binlog(spark, 1200, n_convs=30, turns_per_conv=5, seed=13)
    # segment 1 lands
    full.filter("offset < 400").repartition(2).write.parquet(binlog)
    table = LakeTable.create(str(tmp_path / "t"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=4)
    driver = ReplayDriver(spark, binlog, table, CheckpointStore(str(tmp_path / "ck")), mode="delta")
    tailer = BinlogTailer(driver, range_size=150, overlap=10, compact_every=4)

    rep1 = tailer.poll_once()
    assert rep1.ranges_applied >= 3
    # idle poll: nothing new
    assert tailer.poll_once() is None or tailer.poll_once().ranges_applied == 0

    # segments 2+3 arrive
    full.filter("offset >= 400").repartition(3).write.mode("append").parquet(binlog)
    rep2 = tailer.poll_once()
    assert rep2.ranges_applied >= 1

    oracle = NaiveApplier()
    oracle.apply_all([r.asDict() for r in full.collect()])
    from catalogue_pipeline_spark.cdc.merge import read_state

    got = sorted(tuple(r) for r in read_state(spark, table).collect())
    assert got == sorted(oracle.state_rows())
