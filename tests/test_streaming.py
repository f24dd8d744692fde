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


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: state (session_end, count)
    carried across micro-batches equals the batch analytic-window answer
    (the q12 semantics) when per-user arrival is ts-ordered."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.streaming.sessionize import sessionize_stream

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(6):
        offs = [0, 100, 250, 900, 1000, 2000, 2100, 2200, 9000]
        for o in offs:
            rows.append((u, eid, base + dt.timedelta(seconds=o + u)))
            eid += 1
    schema = "user_id long, event_id long, ts timestamp"
    # two ts-ordered file batches (arrival order respects per-user ts order)
    half = len(rows) // 2
    src = tmp_path / "events"
    src.mkdir()
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(str(src / "b0"))
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        sessionize_stream(stream, gap_seconds=300.0)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per user per micro-batch; the LAST one per
    # user is the final state
    mem = spark.sql("SELECT * FROM sessions")
    got = {
        r["user_id"]: r["n_sessions"]
        for r in mem.groupBy("user_id")
        .agg(F.max(F.struct("session_end", "n_sessions")).alias("w"))
        .select("user_id", "w.n_sessions")
        .collect()
    }

    # batch reference: the q12 analytic-window sessionizer
    ev = spark.createDataFrame(rows, schema)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        ev.withColumn("s", F.unix_micros(F.col("ts").cast("timestamp_ltz")))
        .withColumn("e", F.col("s") + 300_000_000)
        .withColumn("pm", F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new", F.when(F.col("pm").isNull() | (F.col("s") > F.col("pm")), 1).otherwise(0))
    )
    want = {
        r["user_id"]: r["n"]
        for r in marked.groupBy("user_id").agg(F.sum("new").alias("n")).collect()
    }
    assert got == want and len(got) == 6


def test_sessionize_multichunk_disorder(spark, tmp_path):
    """A high-volume user whose micro-batch spans MULTIPLE Arrow chunks
    (arrow.maxRecordsPerBatch below the group size) with scrambled intra-batch
    order still sessionizes correctly: the fold concatenates all chunks and
    sorts ONCE — per-chunk sorting would inflate the session count because
    chunk boundaries carry no ordering guarantee."""
    import datetime as dt

    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.streaming.sessionize import sessionize_stream

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "7")
    try:
        base = dt.datetime(2024, 1, 1)
        # 60 events, sessions split at gap > 60s: offsets 0..29 (1 session),
        # 1000..1029 (next), scrambled deterministically
        offs = list(range(0, 30)) + list(range(1000, 1030))
        scrambled = sorted(range(len(offs)), key=lambda i: (i * 37) % 60)
        rows = [
            (1, i, base + dt.timedelta(seconds=offs[j]))
            for i, j in enumerate(scrambled)
        ]
        schema = "user_id long, event_id long, ts timestamp"
        src = tmp_path / "mc"
        src.mkdir()
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src / "b0"))
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = (
            sessionize_stream(stream, gap_seconds=60.0)
            .writeStream.format("memory")
            .queryName("sessions_mc")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck_mc"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.sql("SELECT * FROM sessions_mc")
            .groupBy("user_id")
            .agg(F.max(F.struct("session_end", "n_sessions")).alias("w"))
            .select("w.n_sessions")
            .collect()
        )
        assert [r["n_sessions"] for r in got] == [2]
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
