"""CALM indexer — the Calm→reporting-index record reshape
(calm_adapter/calm_indexer/src/main/scala/weco/pipeline/calm_indexer/
services/Worker.scala:40-95).

The reference worker consumes CalmSourcePayload messages and keeps a
reporting index in sync:

* a deleted payload deletes the document by id (:54-62,
  CalmIndexerFeatureTest "removes a deleted Calm record");
* otherwise the stored CalmRecord's ``data`` (field → list-of-strings)
  is tweaked two ways before indexing (:73-86):

  - a field whose value is ``[""]`` — Calm's encoding of an EMPTY field —
    is dropped entirely, so the reporting cluster can filter on field
    presence ("indexes Calm records": the ``Document -> ""`` field
    vanishes);
  - a single-value list unwraps to a scalar; multi-value lists stay
    arrays.

Spark shape: one ``transform``+``filter`` over the map entries — no
explode, no shuffle; the index sync itself is the engine's idempotent
upsert/delete path (S11/J4), so this plan only owns the reshape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RECORDS_SCHEMA = (
    "id string, data map<string,array<string>>, is_deleted boolean"
)


def calm_index_actions(records: DataFrame) -> DataFrame:
    """One action row per payload: ``(id, op ∈ index|delete, fields)``
    where ``fields`` is the reshaped document as an array of
    ``(key, scalar, list)`` structs — ``scalar`` set iff the field
    unwrapped (exactly one value), ``list`` set otherwise; ``[""]``
    fields are absent.  ``fields`` is NULL for deletes."""
    entries = F.map_entries(F.col("data"))
    kept = F.filter(
        entries, lambda e: e.getField("value") != F.array(F.lit(""))
    )
    fields = F.transform(
        kept,
        lambda e: F.struct(
            e.getField("key").alias("key"),
            F.when(
                F.size(e.getField("value")) == 1,
                F.element_at(e.getField("value"), 1),
            ).alias("scalar"),
            F.when(
                F.size(e.getField("value")) != 1, e.getField("value")
            ).alias("list"),
        ),
    )
    deleted = F.coalesce(F.col("is_deleted"), F.lit(False))
    return records.select(
        "id",
        F.when(deleted, F.lit("delete")).otherwise(F.lit("index")).alias("op"),
        F.when(~deleted, fields).alias("fields"),
    )
