"""Per-source transformer slice: FOLIO OAI-PMH MARCXML → work fields.

FOLIO is the reference's library-management source read back into the
pipeline over OAI-PMH (distinct from the *outbound* Axiell→FOLIO sync in
plans/folio_sync.py).  Its work builder is the deliberately-thin shared
MARC-XML base plus four FOLIO deltas (catalogue_graph/src/adapters/
transformers/builders/folio_work_builder.py, marc_xml_work_builder.py):

  * base rules    — title 245, alternative titles 246, description 520,
                    035 origin-code other-identifiers, 440/490/773/830
                    series parents, work type 'Standard' — all reused from
                    the EBSCO/Axiell slices (marc_transform.py /
                    axiell_transform.py expressions)
  * suppression   — a 999 field with any $t == '1' (FOLIO's discovery-flag
                    transfer marker) → Deleted 'suppressed: Folio'
                    (folio_work_builder._is_suppressed)
  * predecessor   — 907 $a distinct dot-stripped values; exactly one, and
                    it must be a Sierra system number (b + 7 digits +
                    check digit/x) → sierra-system-number; >1 or a
                    non-matching value = record error
                    (marc/predecessor_identifier.py
                    extract_sierra_predecessor_id)
  * items         — joined from the ENRICHMENT store, not guessed from
                    MARC 952: the folio_enrich step (steps/oai_pmh/
                    folio_enrich.py) fetches items for the changed
                    instance ids and upserts them keyed by the bib row id,
                    so transform time is a pure LEFT JOIN — a full reindex
                    never calls FOLIO.  Each item carries a 'folio-item'
                    identifier (its inventory UUID) and title =
                    enumeration or volume (folio_work_builder.items,
                    enrichment/models.py FolioEnrichedInstance)

Spark-first: the enrichment join is records ⟕ enriched_items on the
instance id — broadcast when the changed window is small, shuffle-on-id
otherwise (both narrow per-record afterwards); everything else is the same
single-Project-chain codegen as the sibling slices.  The enrichment STEP
itself (changed ids → item rows upsert) is the repo's existing changeset
scan (S8) + idempotent merge (S11) machinery — ``enrich_instance_ids``
below derives the id worklist the way collect_instance_ids does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .axiell_transform import _other_identifiers, _predecessor_raw
from .marc_transform import (
    _CONTROL_001_RE,
    _SUBFIELD_RE,
    _all_datafield_blocks,
    _alternative_titles_expr,
    _description_expr,
    _parents_expr,
    _sub_code,
    _sub_value,
    _title_expr,
)

_SIERRA_BNUMBER_RE = "^b[0-9]{7}[0-9x]$"


def _is_suppressed(content: Column) -> Column:
    """Any 999 field with a $t subfield equal to '1'."""
    blocks = _all_datafield_blocks(content, ["999"])
    return F.exists(
        blocks,
        lambda b: F.exists(
            F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0),
            lambda el: (_sub_code(el) == "t") & (F.trim(_sub_value(el)) == "1"),
        ),
    )


def _sierra_predecessor(content: Column) -> Column:
    """907 $a → struct(value, error) under the SIERRA b-number format
    (the Axiell slice applies the same walk with the CALM UUID format)."""
    raw = _predecessor_raw(content)
    vals, one = raw["vals"], raw["one"]
    ok = one.rlike(_SIERRA_BNUMBER_RE)
    return F.struct(
        F.when((F.size(vals) == 1) & ok, one).alias("value"),
        F.when(
            F.size(vals) > 1,
            F.lit("Multiple distinct instances of varfield with tag 907"),
        )
        .when(
            (F.size(vals) == 1) & ~ok,
            F.lit(
                "Predecessor identifier does not match Sierra system number format"
            ),
        )
        .alias("error"),
    )


def transform_folio(
    records: DataFrame,
    enriched_items: DataFrame | None = None,
    broadcast_items: bool = False,
) -> DataFrame:
    """records(id, content[, deleted]) [⟕ enriched_items(instance_id,
    items array<struct<id,enumeration,volume>>)] → one work row per record:

    (id, type ∈ Visible|Deleted|Error, deleted_reason, error, title,
     alternative_titles, description, other_identifiers
     array<'scheme:value'>, predecessor_id, parents, work_type,
     items array<'folio-item:uuid~title'>)
    """
    if "deleted" not in records.columns:
        records = records.withColumn("deleted", F.lit(False))

    content = F.col("content")
    marc_id = F.nullif(
        F.trim(F.regexp_extract(content, _CONTROL_001_RE, 1)), F.lit("")
    )

    s1 = records.select(
        "id",
        "deleted",
        marc_id.alias("_marc_id"),
        _is_suppressed(content).alias("_suppressed"),
        _title_expr(content).alias("_title"),
        _alternative_titles_expr(content).alias("_alt_titles"),
        _description_expr(content).alias("_description"),
        _other_identifiers(content).alias("_ids"),
        _sierra_predecessor(content).alias("_pred"),
        _parents_expr(content).alias("_parents"),
    )

    error = (
        F.when(F.col("_marc_id").isNull(), F.lit("missing mandatory field 001 (id)"))
        .when(F.col("deleted") | F.col("_suppressed"), F.lit(None).cast("string"))
        .when(
            F.col("_title").isNull(), F.lit("missing mandatory field 245 (title)")
        )
        .when(F.col("_pred")["error"].isNotNull(), F.col("_pred")["error"])
    )
    s2 = s1.select("*", error.alias("_error"))
    err = F.col("_error")
    typ = (
        F.when(err.isNotNull(), F.lit("Error"))
        .when(F.col("deleted") | F.col("_suppressed"), F.lit("Deleted"))
        .otherwise(F.lit("Visible"))
    )
    s3 = s2.select(
        "*", typ.alias("_type"), (err.isNull() & (typ == "Visible")).alias("_vis")
    )

    vis = F.col("_vis")
    mk_arr = lambda c: F.when(vis, c).otherwise(  # noqa: E731
        F.array().cast("array<string>")
    )
    out = s3.select(
        F.coalesce(F.col("_marc_id"), F.col("id")).alias("id"),
        F.col("_type").alias("type"),
        F.when(F.col("deleted") & err.isNull(), F.lit("deleted-from-source"))
        .when(F.col("_suppressed") & err.isNull(), F.lit("suppressed: Folio"))
        .alias("deleted_reason"),
        err.alias("error"),
        F.when(vis, F.col("_title")).alias("title"),
        mk_arr(F.col("_alt_titles")).alias("alternative_titles"),
        F.when(vis, F.col("_description")).alias("description"),
        mk_arr(
            F.transform(
                F.col("_ids"),
                lambda s: F.concat(s["scheme"], F.lit(":"), s["value"]),
            )
        ).alias("other_identifiers"),
        F.when(vis, F.col("_pred")["value"]).alias("predecessor_id"),
        mk_arr(F.col("_parents")).alias("parents"),
        F.when(vis, F.lit("Standard")).alias("work_type"),
    )

    # items: a pure left join onto the enrichment store — no FOLIO call at
    # transform time (transformer purity; a full reindex joins whatever is
    # already stored)
    if enriched_items is not None:
        items_df = enriched_items.select(
            F.col("instance_id").alias("_inst_id"),
            F.transform(
                F.col("items"),
                lambda it: F.concat(
                    F.lit("folio-item:"),
                    it["id"],
                    F.lit("~"),
                    F.coalesce(it["enumeration"], it["volume"], F.lit("")),
                ),
            ).alias("_items"),
        )
        if broadcast_items:
            items_df = F.broadcast(items_df)
        out = (
            out.join(items_df, out["id"] == items_df["_inst_id"], "left")
            .withColumn(
                "items",
                F.when(
                    F.col("type") == "Visible",
                    F.coalesce(F.col("_items"), F.array().cast("array<string>")),
                ).otherwise(F.array().cast("array<string>")),
            )
            .drop("_inst_id", "_items")
        )
    else:
        out = out.withColumn("items", F.array().cast("array<string>"))
    return out


def enrich_instance_ids(records: DataFrame) -> DataFrame:
    """folio_enrich.collect_instance_ids: the de-duplicated instance ids
    that changed across the window's changesets — the worklist the item
    enricher fetches.  (The changeset-bounded scan itself is the lake
    table's read_changesets / S8 path; stats-pruning by the changesets'
    minimum last_modified is the same file-skipping that read documents.)"""
    return records.select("id").distinct()
