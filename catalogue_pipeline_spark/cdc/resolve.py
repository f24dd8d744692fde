"""Per-key last-writer-wins resolution with the reference's exact tie-breaks.

The reference's conflict rules (SURVEY.md §1.3, §2.7):
  * replace iff ``new.ts >= old.ts`` — ``>=``, not ``>`` ("latest to the
    merger wins", TransformableOps.scala:135-150)
  * at equal ts, a delete beats an update (delete-date coercion to 23:59:59,
    sierra_reader.py:79-113) — encoded here as an op-priority column instead
    of mutating timestamps
  * remaining ties go to the newest arrival (offset order), which also makes
    same-version-different-content corrections deterministic
    (WorkGraphUpdater.scala:44-78 "last write wins… so the graph can re-form")

All of this collapses into TWO max-registers per key (see schema.py):

  winner   = max over (ts, op_pri, offset)  — gate + deleted flag
  nd       = max over (ts, offset) of NON-delete events — the payload

``max(struct(...))`` is an ordinary aggregate, so Spark executes it with
map-side partial aggregation (PARTIAL maxes → ONE shuffle of pre-reduced
rows → final). That is the engine's built-in skew armor: a hot
conversation's millions of duplicate events reduce to one row per map
partition BEFORE the shuffle, unlike a ``row_number`` window which must
shuffle and sort every raw event.

Physical note: struct-typed max buffers force SortAggregate (hash agg only
takes primitive buffers). The partial/final split and single exchange are
preserved (asserted in tests/test_plans.py); the alternative — hash-agg on a
packed primitive order key, then a second join pass to retrieve the winning
payload — shuffles the raw batch twice and loses at scale, so the
single-pass SortAggregate is the deliberate choice. This is why the core dedup needs no explicit salting; an explicit
salted two-phase variant lives in operators/skew.py for genuinely
window-shaped operators.

Max-registers are associative/commutative/idempotent, so resolve-then-merge
over ANY partitioning of the binlog (overlapping ranges, duplicate delivery,
crash/resume) converges to the same state — the engine's exactly-once story
reduces to commit fencing only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the LWW total order, shared by resolve (in-batch) and merge (vs state)
ORDER_COLS = ["ts", "op_pri", "offset"]

RESOLVED_COLS = [
    "conv_id",
    "turn_idx",
    "role",
    "text",
    "tool",
    "ts",
    "op_pri",
    "offset",
    "nd_ts",
    "nd_offset",
    "deleted",
    "n_events",
]


def with_op_pri(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "op_pri", F.when(F.col("op") == "delete", F.lit(1)).otherwise(F.lit(0))
    )


def resolve_lww(batch: DataFrame, extra_group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Reduce a normalized binlog batch to one row per ``(conv_id, turn_idx)``
    holding both max-registers.

    Output columns: RESOLVED_COLS (state columns + ``n_events``, the number of
    raw events folded into the key — feeds the dedup_drops metric).

    ``extra_group_cols``: additional leading group columns that are
    FUNCTIONALLY DEPENDENT on ``conv_id`` (e.g. the table bucket) — the
    grouping is then identical, but a pre-established hash partitioning on
    those columns is reused by the aggregate (guide §2.4). The extra columns
    ride through to the output.
    """
    ev = with_op_pri(batch)
    # The winner struct carries op_pri, NOT the op string: op_pri == 1 iff
    # op == 'delete' by construction, so ``deleted`` is recoverable after the
    # aggregate and the ~6-byte op string never rides the shuffle or the
    # sort-aggregate buffers. Measured on this box (24M events,
    # tools/probe_resolve_variants.py): local[16] resolve 4.0 s → 3.0 s and
    # 4→16-core scaling efficiency 0.54 → 0.73 — bytes-per-row through the
    # exchange is the scaling limiter for this string-heavy workload.
    agg = ev.groupBy(*extra_group_cols, "conv_id", "turn_idx").agg(
        F.max(F.struct("ts", "op_pri", "offset")).alias("w"),
        # max ignores nulls ⇒ null register when the key only ever saw deletes
        F.max(
            F.when(
                F.col("op") != "delete",
                F.struct("ts", "offset", "role", "text", "tool"),
            )
        ).alias("nd"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        *extra_group_cols,
        "conv_id",
        "turn_idx",
        F.col("nd.role").alias("role"),
        F.col("nd.text").alias("text"),
        F.col("nd.tool").alias("tool"),
        F.col("w.ts").alias("ts"),
        F.col("w.op_pri").alias("op_pri"),
        F.col("w.offset").alias("offset"),
        F.col("nd.ts").alias("nd_ts"),
        F.col("nd.offset").alias("nd_offset"),
        F.when(F.col("w.op_pri") == 1, F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("deleted"),
        "n_events",
    )


def resolve_lww_bucketed(batch: DataFrame, num_buckets: int) -> DataFrame:
    """resolve_lww with its shuffle keyed by the TARGET TABLE's bucket — the
    delta-ingest fast path (guide §2.4: two operations keyed the same way
    share one exchange).

    The plan becomes: scan → exchange(bucket) → complete sort-aggregate on
    (bucket, conv_id, turn_idx) → bucketed write, i.e. ONE exchange and ONE
    sort serve both the LWW reduce and the per-bucket file layout
    (``append_delta(pre_bucketed=True)`` skips its own repartition, and the
    sort-aggregate's output ordering satisfies the writer's sort). The
    two-exchange shape it replaces shuffled the partially-aggregated batch
    on (conv_id, turn_idx) and then re-shuffled the resolved rows on the
    bucket — and on this workload map-side combine shrank almost nothing
    (keys are spread across input files), so dropping the partial aggregate
    costs ~no extra shuffle bytes while removing a stage barrier and a sort.

    The explicit partition count (session shuffle partitions) keeps AQE from
    coalescing the exchange below core count: the downstream sort + parquet
    encode is CPU-bound, and 64 MB-advisory coalescing would serialize it.

    Identical output to resolve_lww plus the leading bucket column
    (bucket = f(conv_id), so the grouping is the same grouping).
    """
    from ..lake.table import _BUCKET_COL, bucket_expr

    n = int(batch.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ev = batch.withColumn(_BUCKET_COL, bucket_expr("conv_id", num_buckets))
    ev = ev.repartition(n, F.col(_BUCKET_COL))
    return resolve_lww(ev, extra_group_cols=(_BUCKET_COL,))
