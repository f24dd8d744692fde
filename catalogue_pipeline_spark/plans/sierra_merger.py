"""Sierra merger — the transformable-store fold that turns the linker's
per-record link/unlink decisions into per-bib record bundles.

Reference: ``sierra_adapter/sierra_merger/models/TransformableOps.scala``
(:61-99 bib replace-if-newer-or-equal and never-remove; :140-209 the
sub-record add/remove with the deliberate **>=** — 'latest to the merger
wins', so a deletion carrying the same updatedDate as the edit it follows
is processed; :30-58,225-233 the monotone ``modifiedTime`` bump on both
add and remove), ``models/RecordOps.scala`` (bibs link only themselves;
items/holdings/orders fan out to ``bibIds`` and ``unlinkedBibIds``) and
``services/Updater.scala:23-76`` (link = upsert, creating the
transformable when absent; unlink of a *missing transformable* is a
storage error while an already-gone record is the benign
``UpdateNotApplied``).

State model: two frames —

* ``records(bib_id, record_type, record_id, modified, data)`` — the
  bundle contents, one row per (bib, record); bib records use
  ``record_type='bibs'`` with ``record_id == bib_id``;
* ``times(bib_id, modified_time)`` — the transformable's monotone
  modifiedTime, tracked separately because removals bump it past the max
  of the surviving rows (TransformableOps.scala:46-58).

Batch semantics: the reference applies one record at a time; the batch
collapse picks, per ``(bib, record)``, the latest *mention* by
``(modified, seq)`` — exact against sequential replay because the linker
guarantees every update's ``unlinked_bib_ids`` carries every bib the
record ever linked minus its current ones (sierra_linker fold), so no
intermediate link survives past a later update that drops it.

Scale shape: one explode, one per-(bib,record) window on the batch (small:
the update stream), one full-outer join against state keyed on
``(bib_id, record_type, record_id)`` — the state's natural bucketing —
and one groupBy(bib_id) for the time bump.  No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RECORDS_SCHEMA = (
    "bib_id string, record_type string, record_id string, "
    "modified timestamp, data string"
)
TIMES_SCHEMA = "bib_id string, modified_time timestamp"


def empty_state(spark) -> tuple[DataFrame, DataFrame]:
    return (
        spark.createDataFrame([], RECORDS_SCHEMA),
        spark.createDataFrame([], TIMES_SCHEMA),
    )


def merge_sierra_records(
    records: DataFrame,
    times: DataFrame,
    updates: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold one batch of linker-processed Sierra records into the
    transformable store.  ``updates``: ``(record_type, record_id,
    modified, data, bib_ids array<string>, unlinked_bib_ids
    array<string>, seq)`` — bib records carry ``bib_ids=[own id]`` and no
    unlinks (an unlink row for a bib is the reference's 'We should never
    be removing a bib record' throw, reported here as
    ``error_bib_unlink``).

    Returns ``(records', times', report)``; the report carries one row
    per (bib, record) mention with ``action`` ∈

    * ``created`` — the link created a fresh transformable (Updater's
      upsert-create arm);
    * ``added`` — the record is new to an existing transformable;
    * ``replaced`` — add over an equal-or-older existing record (the
      deliberate >=);
    * ``removed`` — unlink dropped an equal-or-older existing record;
    * ``noop`` — UpdateNotApplied: a strictly-newer record already held,
      or the unlink's target record already gone;
    * ``error_missing`` — unlink addressed to a bib with no transformable
      at all (the reference's non-benign storage error); a bib that some
      mention in the same batch *adds to* counts as existing (the unlink
      races a sibling add — sequential replay would find the bib);
    * ``error_bib_unlink`` — an unlink row for a bib record.
    """
    u = updates.select(
        "record_type",
        "record_id",
        "modified",
        "data",
        "seq",
        F.explode(
            F.concat(
                F.transform(
                    F.coalesce(F.col("bib_ids"), F.array().cast("array<string>")),
                    lambda b: F.struct(b.alias("bib_id"), F.lit("add").alias("op")),
                ),
                F.transform(
                    F.coalesce(
                        F.col("unlinked_bib_ids"), F.array().cast("array<string>")
                    ),
                    lambda b: F.struct(
                        b.alias("bib_id"), F.lit("remove").alias("op")
                    ),
                ),
            )
        ).alias("m"),
    ).select(
        F.col("m.bib_id").alias("bib_id"),
        "record_type",
        "record_id",
        F.col("m.op").alias("op"),
        "modified",
        "data",
        "seq",
    )
    # latest mention wins per (bib, record) — exact vs sequential replay
    # given linker-shaped inputs (see module doc)
    w = Window.partitionBy("bib_id", "record_type", "record_id").orderBy(
        F.col("modified").desc(), F.col("seq").desc()
    )
    winners = u.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") == 1
    ).drop("_rk", "seq")

    ex = records.select(
        "bib_id",
        "record_type",
        "record_id",
        F.col("modified").alias("_ex_modified"),
        F.col("data").alias("_ex_data"),
    )
    # two presence flags: _bib_exists = bib held pre-batch state (drives
    # created-vs-added labels, exactly the pre-batch view); _bib_add =
    # some mention in THIS batch adds to the bib, so an unlink targeting
    # it is racing a sibling add, not addressing a missing bib.  Known
    # residual label divergence vs sequential replay: every fresh record
    # on a batch-created bib reports 'created' (sequential replay labels
    # the second and later ones 'added'); state is identical either way.
    bib_exists = (
        records.select("bib_id")
        .union(times.select("bib_id"))
        .distinct()
        .withColumn("_bib_exists", F.lit(True))
    )
    bib_batch_add = (
        winners.filter(F.col("op") == "add")
        .select("bib_id")
        .distinct()
        .withColumn("_bib_add", F.lit(True))
    )
    j = (
        winners.join(ex, ["bib_id", "record_type", "record_id"], "full_outer")
        .join(bib_exists, "bib_id", "left")
        .join(bib_batch_add, "bib_id", "left")
    )

    is_update = F.col("op").isNotNull()
    has_existing = F.col("_ex_modified").isNotNull()
    newer_or_eq = F.col("modified") >= F.col("_ex_modified")
    is_bib = F.col("record_type") == "bibs"

    action = (
        F.when(~is_update, F.lit(None))  # untouched state row
        .when(is_bib & (F.col("op") == "remove"), F.lit("error_bib_unlink"))
        .when(
            (F.col("op") == "remove")
            & F.col("_bib_exists").isNull()
            & F.col("_bib_add").isNull(),
            F.lit("error_missing"),
        )
        .when(
            (F.col("op") == "add") & (~has_existing),
            F.when(F.col("_bib_exists").isNull(), F.lit("created")).otherwise(
                F.lit("added")
            ),
        )
        .when((F.col("op") == "add") & newer_or_eq, F.lit("replaced"))
        .when((F.col("op") == "remove") & has_existing & newer_or_eq, F.lit("removed"))
        .otherwise(F.lit("noop"))
    )
    j = j.withColumn("_action", action)

    report = j.filter(is_update).select(
        "bib_id",
        "record_type",
        "record_id",
        F.col("_action").alias("action"),
        "modified",
    )

    survivors = j.filter(
        # keep untouched rows; keep existing rows whose update was a noop
        # or an error; drop removed/replaced originals
        (~is_update & has_existing)
        | (
            is_update
            & has_existing
            & ~F.col("_action").isin("replaced", "removed")
        )
    ).select(
        "bib_id",
        "record_type",
        "record_id",
        F.col("_ex_modified").alias("modified"),
        F.col("_ex_data").alias("data"),
    )
    applied_adds = j.filter(
        F.col("_action").isin("created", "added", "replaced")
    ).select("bib_id", "record_type", "record_id", "modified", "data")
    new_records = survivors.unionByName(applied_adds)

    # monotone time bump: every APPLIED mention (created/replaced/removed)
    # raises the transformable's modifiedTime to at least its modifiedDate
    bumps = (
        j.filter(F.col("_action").isin("created", "added", "replaced", "removed"))
        .groupBy("bib_id")
        .agg(F.max("modified").alias("_bump"))
    )
    new_times = (
        times.join(bumps, "bib_id", "full_outer")
        .select(
            "bib_id",
            F.greatest(
                F.coalesce(F.col("modified_time"), F.col("_bump")),
                F.coalesce(F.col("_bump"), F.col("modified_time")),
            ).alias("modified_time"),
        )
    )
    return new_records, new_times, report


def transformables(records: DataFrame, times: DataFrame) -> DataFrame:
    """The per-bib bundle view the downstream transformer consumes — the
    SierraTransformable shape (bib + sub-record lists + modifiedTime),
    ready for ``plans.sierra_indexer.sierra_api_data`` or
    ``transform_sierra``."""
    recs = lambda t: F.sort_array(  # noqa: E731
        F.collect_list(
            F.when(
                F.col("record_type") == t,
                F.struct("record_id", "modified", "data"),
            )
        )
    )
    agg = records.groupBy("bib_id").agg(
        F.max(F.when(F.col("record_type") == "bibs", F.col("data"))).alias(
            "bib_data"
        ),
        recs("items").alias("items"),
        recs("holdings").alias("holdings"),
        recs("orders").alias("orders"),
    )
    return agg.join(times, "bib_id", "left").select(
        "bib_id", "bib_data", "items", "holdings", "orders", "modified_time"
    )
