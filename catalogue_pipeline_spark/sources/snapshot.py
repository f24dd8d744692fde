"""Snapshot-sync ingest: reconcile a FULL new snapshot against the current
table state — the reference's EBSCO adapter path (snapshot_sync,
adapter_store.py:32-66; SURVEY.md §3.2), as opposed to the incremental
binlog path (cdc/replay.py).

Semantics reproduced 1:1 (tests mirror
test_adapter_store_snapshot_sync.py scenarios):

  * new ids            → inserts                           (J1)
  * changed content    → updates; equal content → no-op    (J2 — "timestamp
                         alone never triggers an update")
  * ids missing from the snapshot → SOFT delete            (J4)
  * soft-deleted rows keep their last content so deletions
    stay replayable downstream                             (J5)
  * re-appearing ids   → un-deleted with new content

Implementation: the snapshot is translated into a synthetic change batch
(upserts for new/changed, deletes for missing) stamped with the snapshot's
``ts`` and a synthetic offset range, then applied through the SAME
resolve→merge core — one code path for both ingest styles, which is the
whole point of the engine.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.merge import ApplyMetrics, merge_into_state, read_state, visible_transcripts
from ..cdc.resolve import resolve_lww
from ..lake.table import LakeTable


def snapshot_sync(
    spark: SparkSession,
    table: LakeTable,
    snapshot: DataFrame,
    snapshot_ts: dt.datetime,
    changeset_id: str,
    offset_base: int = 0,
) -> tuple[int | None, ApplyMetrics]:
    """Apply a full snapshot (columns: conv_id, turn_idx, role, text, tool)
    to the transcripts table.

    ``snapshot_ts`` stamps every derived change (G5 semantics: group-derived
    rows take the batch time, not per-row times — MergeProcessor.scala:41-65),
    so reapplying an old snapshot after a newer one is a no-op (LWW gate).
    ``offset_base`` must be unique per sync run (e.g. a run counter << 32) to
    keep the arrival-order register deterministic.
    """
    snap = snapshot.select("conv_id", "turn_idx", "role", "text", "tool")

    # Diff against the REDUCED view (read_state), not raw files: with
    # merge-on-read deltas present, raw rows contain superseded versions — a
    # key deleted in a delta but alive in base would look visible, making an
    # identical snapshot row a no-op and wrongly keeping the key deleted.
    current = visible_transcripts(read_state(spark, table)).select(
        "conv_id", "turn_idx",
        F.col("role").alias("_role"), F.col("text").alias("_text"), F.col("tool").alias("_tool"),
    )

    # presence markers survive the full-outer join even when all payload
    # columns are null on one side
    snap_marked = snap.withColumn("_in_snap", F.lit(1))
    cur_marked = current.withColumn("_in_cur", F.lit(1))
    joined = snap_marked.join(cur_marked, on=["conv_id", "turn_idx"], how="full_outer")
    in_snap = F.col("_in_snap").isNotNull()
    in_cur = F.col("_in_cur").isNotNull()

    same = (
        F.col("role").eqNullSafe(F.col("_role"))
        & F.col("text").eqNullSafe(F.col("_text"))
        & F.col("tool").eqNullSafe(F.col("_tool"))
    )

    changes = joined.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.when(~in_snap, F.lit("delete"))
        .when(~in_cur, F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
        same.alias("_same"),
        in_snap.alias("_in_snap2"),
        in_cur.alias("_in_cur"),
    ).filter(
        # J2: equal content produces NO change event at all
        ~(F.col("_in_snap2") & F.col("_in_cur") & F.col("_same"))
    )

    # deterministic synthetic offsets: dense per-key hash order (exact values
    # are irrelevant — every event in this batch shares snapshot_ts, and keys
    # are unique within the batch, so the LWW order never consults offsets
    # across distinct events of one key)
    ev = changes.select(
        (F.lit(offset_base) + F.abs(F.xxhash64("conv_id", "turn_idx")) % F.lit(1 << 40)).alias("offset"),
        "op",
        "conv_id",
        "turn_idx",
        F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(F.col("role")).alias("role"),
        F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(F.col("text")).alias("text"),
        F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(F.col("tool")).alias("tool"),
        F.lit(snapshot_ts).alias("ts"),
        F.lit(3).alias("schema_ver"),
    )

    resolved = resolve_lww(ev)
    return merge_into_state(
        spark,
        table,
        resolved,
        changeset_id=changeset_id,
        range_summary={"range_id": f"snapshot-{changeset_id}"},
    )
