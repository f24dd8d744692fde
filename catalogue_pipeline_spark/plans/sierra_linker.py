"""Sierra linker: the bib⇄record link-maintenance fold, Spark-first.

The reference runs a dedicated service (sierra_adapter/sierra_linker) whose
whole job is maintaining, per item/holdings/order record, a ``Link``:

    Link(bibIds, unlinkedBibIds, modifiedDate)

with the fold rule (models/LinkOps.scala:17-58):

  * an update with ``modifiedDate >= stored.modifiedDate`` is applied:
      - ``bibIds``        ← the update's bibIds
      - ``unlinkedBibIds`` ← (stored.bibIds ∪ stored.unlinkedBibIds)
                             − update.bibIds
    i.e. every bib the record was EVER attached to, minus the ones it's
    attached to now — this is what tells the downstream merger to REMOVE
    the item from bibs it has moved away from
    (sierra_merger/services/Updater.scala:64).
  * a STRICTLY older update is discarded entirely (idempotent re-delivery).

One ``LinkOps`` covers items, holdings and orders in the reference; here one
DataFrame operator does, because the fold only touches (record_id, bib_ids,
ts).

Batch semantics: the service applies updates one at a time in arrival
order; a batch engine must pick a deterministic equivalent, and we use
**modifiedDate order (ties by ``seq``)** — the result of replaying the
batch ascending from the stored state.  Folding the rule above over a
sorted run collapses to ONE aggregate per key:

    survivors = updates with ts >= stored.ts          (stale ⇒ discarded)
    winner    = max_by(bib_ids, (ts, seq))
    unlinked  = (stored.bibIds ∪ stored.unlinked ∪ ⋃ survivors.bib_ids)
                − winner.bib_ids

so the whole operator is a filter + groupBy + full-outer join — no
iteration, map-side partial aggregation available, and the shuffled payload
is just id arrays.  Out-of-order *across* batches behaves exactly like the
reference: a batch consisting only of stale updates leaves the link
untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _empty_arr():
    return F.array().cast("array<string>")


def empty_links(spark) -> DataFrame:
    return spark.createDataFrame(
        [],
        "record_id string, bib_ids array<string>, "
        "unlinked_bib_ids array<string>, ts timestamp",
    )


def update_links(state: DataFrame, updates: DataFrame) -> DataFrame:
    """Fold ``updates(record_id, bib_ids, ts[, seq])`` into
    ``state(record_id, bib_ids, unlinked_bib_ids, ts)`` under the LinkOps
    rule; returns the new state (same schema, plus nothing else).

    ``seq`` breaks modifiedDate ties deterministically (the reference
    applies ties in arrival order; LinkOps.scala:17-19 accepts equal
    dates).  Callers replaying a binlog pass the offset.
    """
    if "seq" not in updates.columns:
        updates = updates.withColumn("seq", F.lit(0).cast("long"))

    st = state.select(
        "record_id",
        F.col("bib_ids").alias("_st_bib"),
        F.col("unlinked_bib_ids").alias("_st_unl"),
        F.col("ts").alias("_st_ts"),
    )
    # stale updates are discarded against the CURRENT state, exactly like
    # the service's per-message check
    live = updates.join(st.select("record_id", "_st_ts"), "record_id", "left").filter(
        F.col("_st_ts").isNull() | (F.col("ts") >= F.col("_st_ts"))
    )
    agg = live.groupBy("record_id").agg(
        F.max_by("bib_ids", F.struct("ts", "seq")).alias("_win_bib"),
        F.array_distinct(F.flatten(F.collect_list("bib_ids"))).alias("_seen"),
        F.max("ts").alias("_win_ts"),
    )
    merged = st.join(agg, "record_id", "full")
    applied = F.col("_win_ts").isNotNull()
    return merged.select(
        "record_id",
        F.when(applied, F.col("_win_bib"))
        .otherwise(F.col("_st_bib"))
        .alias("bib_ids"),
        F.when(
            applied,
            F.array_except(
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("_st_bib"), _empty_arr()),
                        F.coalesce(F.col("_st_unl"), _empty_arr()),
                        F.col("_seen"),
                    )
                ),
                F.col("_win_bib"),
            ),
        )
        .otherwise(F.col("_st_unl"))
        .alias("unlinked_bib_ids"),
        F.coalesce(F.col("_win_ts"), F.col("_st_ts")).alias("ts"),
    )


def unlink_instructions(state: DataFrame) -> DataFrame:
    """The merger-facing view: one (bib_id, record_id) row per unlink the
    downstream transformable store must apply (Updater.scala:59-71)."""
    return state.select(
        "record_id", F.explode("unlinked_bib_ids").alias("bib_id")
    ).select("bib_id", "record_id")
