"""Structured Streaming front-end over the same apply core.

The reference is a micro-batch streaming system without watermarks
(SURVEY.md §2.10): SQS hops + batch/flush micro-batching, late data never
dropped — it simply wins or loses LWW. The exact Spark analog is
``readStream`` (file source tailing the binlog directory) →
``foreachBatch`` running the SAME resolve+merge core per micro-batch:

  * late data: no watermark; LWW gates it (counted via ApplyMetrics)
  * exactly-once: Spark's checkpointed source offsets give at-least-once
    delivery of files; the max-register merge is idempotent, and the commit
    fence (batch id in the snapshot summary) suppresses duplicate commits —
    the same two-layer story as the reference (idempotent external-version
    writes + SQS redelivery, ElasticIndexer.scala:60-67).
  * batching knob: ``maxFilesPerTrigger`` is the reference's
    ``groupedWeightedWithin`` batch/flush control
    (PipelineStorageStream.scala:17-62).

A custom stateful operator (applyInPandasWithState) is deliberately NOT used
for the core: keeping state in the lake table (not executor memory) is what
lets a 10^10-event backlog replay with bounded memory and lets batch and
streaming share one code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..cdc.merge import merge_into_state
from ..cdc.resolve import resolve_lww
from ..cdc.schema import BINLOG_SCHEMA, SchemaRegistry
from ..lake.table import LakeTable


def start_binlog_stream(
    spark: SparkSession,
    binlog_dir: str,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Tail a binlog directory of parquet files as a stream."""
    return (
        spark.readStream.schema(BINLOG_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(binlog_dir)
    )


def stream_apply_forever(
    spark: SparkSession,
    binlog_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    registry: SchemaRegistry | None = None,
    max_files_per_trigger: int = 4,
    await_termination: bool = False,
    timeout_sec: float | None = None,
):
    """Continuous apply: each micro-batch goes through the identical
    resolve→merge core as batch replay; the micro-batch id is the fence."""
    reg = registry or SchemaRegistry()
    applied_batches = {
        s.get("range", {}).get("stream_batch_id")
        for s in table.summaries()
        if s.get("range")
    }

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if str(batch_id) in applied_batches:
            return  # duplicate redelivery after restart — fenced out
        resolved = resolve_lww(reg.normalize(batch_df))
        merge_into_state(
            spark,
            table,
            resolved,
            changeset_id=f"stream-{batch_id}",
            range_summary={"stream_batch_id": str(batch_id)},
        )

    q = (
        start_binlog_stream(spark, binlog_dir, max_files_per_trigger)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination(timeout_sec)
    return q
