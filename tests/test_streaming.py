"""Structured Streaming front-end: micro-batched apply over the same core,
late data LWW'd (not dropped), restart-safe via batch-id fencing."""

import os

from catalogue_pipeline_spark.cdc import STATE_SCHEMA, NaiveApplier, generate_binlog
from catalogue_pipeline_spark.cdc.generator import write_binlog
from catalogue_pipeline_spark.lake import LakeTable
from catalogue_pipeline_spark.streaming import stream_apply_forever


def test_stream_apply_matches_oracle(spark, tmp_path):
    binlog = str(tmp_path / "binlog")
    df = generate_binlog(spark, 1500, n_convs=30, turns_per_conv=6, seed=5)
    write_binlog(df, binlog, ranges=6)

    table = LakeTable.create(
        str(tmp_path / "t"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=4
    )
    q = stream_apply_forever(
        spark,
        binlog,
        table,
        checkpoint_dir=str(tmp_path / "sck"),
        max_files_per_trigger=2,
        await_termination=True,
        timeout_sec=120,
    )
    q.stop()

    oracle = NaiveApplier()
    oracle.apply_all([r.asDict() for r in spark.read.parquet(binlog).collect()])
    got = sorted(tuple(r) for r in table.read(spark).collect())
    assert got == sorted(oracle.state_rows())

    # restart with the same checkpoint: no new data → no new commits
    snap_before = table.current_snapshot_id()
    q2 = stream_apply_forever(
        spark,
        binlog,
        table,
        checkpoint_dir=str(tmp_path / "sck"),
        await_termination=True,
        timeout_sec=60,
    )
    q2.stop()
    assert table.current_snapshot_id() == snap_before

    # fresh stream checkpoint (simulated redelivery of everything): fencing +
    # idempotent merge keep state identical
    q3 = stream_apply_forever(
        spark,
        binlog,
        table,
        checkpoint_dir=str(tmp_path / "sck2"),
        await_termination=True,
        timeout_sec=120,
    )
    q3.stop()
    got2 = sorted(tuple(r) for r in table.read(spark).collect())
    assert got2 == got
    assert os.path.isdir(str(tmp_path / "sck2"))
