"""Axiell → FOLIO Inventory sync, re-expressed as a relational sync PLAN.

The reference (catalogue_graph/src/adapters/steps/axiell_folio_sync/) is a
per-record select → map → upsert loop against the OKAPI REST API:

  * selection     — harvest flag (980 $a present) AND item-level
                    (351 $c == 'ITEM', case-insensitive); everything else is
                    skipped, never created/updated/suppressed
                    (mapping.py is_selected_for_sync / select_and_build)
  * extraction    — the MARC_SOURCE spec table (001 GUID, 245$a title,
                    852$b/h/c/j location/call-number family, 949$a/c/l
                    barcode/material/loan, 876$p/t copy/volume, 856$u)
                    via first-non-empty-subfield (mapper.py extract)
  * mapping       — Instance (hrid AxC-instance-<id>, title required,
                    source FOLIO, instanceTypeId) / Holdings (AxC-holding-,
                    sourceId 'MARC', permanentLocationId) / Item (AxC-item-,
                    material-type normalisation table + defaults, loan type,
                    location, electronicAccess, 'Axiell location: <code>'
                    note with resolved itemNoteTypeId); reference-data
                    names resolve to tenant UUIDs through RefCache — here a
                    broadcast-joined (kind, name, uuid) dim; an unresolved
                    name is a per-record MappingError (mapping.py _resolve)
  * upsert        — hrid-keyed create-vs-update (upsert.py _upsert_entity
                    _find_by_hrid), write order Instance → Holdings → Item;
                    here the FOLIO inventory state is an optional
                    ``existing(hrid, folio_id)`` frame, so the decision is a
                    broadcast join: matched → update, else create
  * tombstones    — loader deleted=true is ADVISORY ONLY: counted, never
                    actioned (sync_to_folio.py pass-1 'tombstone_advisory',
                    RFC 090)
  * reconcile     — authoritative deletes are the reconciler's superseded-
                    GUID facts; each fact is re-checked against the live
                    reconciler mappings (a GUID reclaimed by a live record
                    is dropped — an anti-join) and actioned CHILD-FIRST
                    item → holdings → instance: soft-suppress by default
                    (discoverySuppress everywhere + staffSuppress on the
                    instance only), hard-delete opt-in; not-found → skip
                    (upsert.py suppress_by_guid / delete_by_guid,
                    sync_to_folio.py _run_reconcile_deletions)
  * report        — per-action counts + per-record success/failure
                    (report.py PipelineReport)

Spark-first shape: ONE action-plan DataFrame — a row per (record × entity)
upsert plus a row per (fact × entity) cascade — ordered by an explicit
(pass, source, seq) apply key.  All selection/mapping/resolution is
whole-stage-codegen column work + broadcast joins; the only external I/O
(the OKAPI client) is out of scope for this engine and consumed from the
plan by a writer that replays rows in apply-key order (the same separation
the reference draws with FolioInventoryOps — folio_callables.py).  The
plan itself is deterministic and oracle-checkable; dry_run in the
reference corresponds to simply not applying the plan.

SCALE: selection+extraction is a narrow per-record map; the three
reference-data resolutions and the existing-hrid decision are broadcast
joins (ref data and the changed-window's hrid set are tiny vs the record
stream); the cascade anti-join shuffles only the deletion facts.  No
per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .axiell_transform import _first_nonempty_sub
from .marc_transform import _CONTROL_001_RE

# mapping.py VERSION — stamped into every payload's meta
MAPPING_VERSION = "2.1.0"

# mapping.py MARC_SOURCE (the single source of truth for the MARC side)
MARC_SOURCE = {
    "title": ("245", "a"),
    "location_code": ("852", "b"),
    "call_number": ("852", "h"),
    "call_number_prefix": ("852", "c"),
    "shelving_order": ("852", "j"),
    "barcode": ("949", "a"),
    "material_type_code": ("949", "c"),
    "loan_type_code": ("949", "l"),
    "copy_number": ("876", "p"),
    "volume": ("876", "t"),
    "electronic_access_uri": ("856", "u"),
}

# mapping.py MATERIAL_TYPE (case-insensitive) + defaults
MATERIAL_TYPE = {
    "sound only": "sound recording",
    "audio-visual material - visual": "video recording",
    "audio-visual material - e-sound only": "sound recording",
    "audio-visual material - e-visual only": "video recording",
    "published material": "book",
    "archives": "unspecified",
}
DEFAULT_MATERIAL_TYPE = "book"
DEFAULT_LOAN_TYPE = "Can Circulate"
DEFAULT_LOCATION = "History of Medicine"
DEFAULT_HOLDINGS_SOURCE = "MARC"
AXIELL_LOCATION_NOTE_TYPE = "Axiell location"
INSTANCE_TYPE_NAME = "unspecified"  # ref_cache.instance_type_id()

_ENTITY_HRID = {"instance": "AxC-instance-", "holdings": "AxC-holding-", "item": "AxC-item-"}


def default_ref_data(spark: SparkSession) -> DataFrame:
    """A deterministic stand-in for the FOLIO tenant's reference data
    (ref_cache.py loads these once per invocation from OKAPI): one
    (kind, name, uuid) row per resolvable name.  Tests and oracles build
    their own; this default carries every name the mapping can emit."""
    names = (
        [("instance_type", INSTANCE_TYPE_NAME)]
        + [("holdings_source", DEFAULT_HOLDINGS_SOURCE)]
        + [("location", n) for n in (DEFAULT_LOCATION, "Closed stores", "Open shelves")]
        + [("material_type", n) for n in
           ("book", "sound recording", "video recording", "unspecified")]
        + [("loan_type", n) for n in (DEFAULT_LOAN_TYPE, "Non-Circulating")]
        + [("item_note_type", AXIELL_LOCATION_NOTE_TYPE)]
    )
    rows = [(k, n, f"uuid-{k}-{n.lower().replace(' ', '-')}") for k, n in names]
    return spark.createDataFrame(rows, "kind string, name string, uuid string")


def _resolve_name(raw: Column, default: str, table: dict[str, str] | None = None) -> Column:
    """mapping.py _resolve's normalisation half: trim → (material) table by
    lowercase → default when empty.  The UUID half is the broadcast join."""
    v = F.trim(F.coalesce(raw, F.lit("")))
    if table:
        m = F.create_map(*[F.lit(x) for kv in table.items() for x in kv])
        v = F.coalesce(F.try_element_at(m, F.lower(v)), v)
    return F.when(v == "", F.lit(default)).otherwise(v)


def _ref_join(df: DataFrame, ref: DataFrame, kind: str, name_col: str, out_col: str) -> DataFrame:
    dim = ref.filter(F.col("kind") == kind).select(
        F.col("name").alias(f"_{out_col}_name"), F.col("uuid").alias(out_col)
    )
    return df.join(
        F.broadcast(dim), df[name_col] == dim[f"_{out_col}_name"], "left"
    ).drop(f"_{out_col}_name")


def folio_upsert_plan(
    records: DataFrame,
    ref: DataFrame,
    existing: DataFrame | None = None,
) -> DataFrame:
    """Pass 1: records(id, content[, deleted]) → one plan row per record ×
    entity (plus one accounting row for tombstone/skip/error records).

    Output: (source_id, pass='upsert', entity, seq, hrid, action,
    payload_json, folio_id, error) where action ∈ create|update|upsert|
    tombstone|skip|error.  ``existing(hrid, folio_id)`` is the FOLIO
    inventory state; when provided the create-vs-update decision is made
    here (matched hrid → update), otherwise rows carry 'upsert' and the
    writer decides at apply time (the reference's non-dry-run lookup)."""
    cols = records.columns
    if "deleted" not in cols:
        records = records.withColumn("deleted", F.lit(False))

    content = F.col("content")
    marc_id = F.nullif(F.trim(F.regexp_extract(content, _CONTROL_001_RE, 1)), F.lit(""))

    # ---- stage 1: selection + the MARC_SOURCE extraction, one scan ----
    ext = [
        _first_nonempty_sub(content, tag, code).alias(name)
        for name, (tag, code) in MARC_SOURCE.items()
    ]
    s1 = records.select(
        F.col("id").alias("row_id"),
        F.col("deleted"),
        (content.isNull() | (F.trim(content) == "")).alias("empty_content"),
        marc_id.alias("source_id"),
        _first_nonempty_sub(content, "980", "a").isNotNull().alias("harvest_flag"),
        (F.upper(F.trim(F.coalesce(_first_nonempty_sub(content, "351", "c"), F.lit("")))) == "ITEM")
        .alias("item_level"),
        *ext,
    )

    # ---- stage 2: normalise lookup names ----
    s2 = s1.select(
        "*",
        _resolve_name(F.col("location_code"), DEFAULT_LOCATION).alias("_loc_name"),
        _resolve_name(
            F.col("material_type_code"), DEFAULT_MATERIAL_TYPE, MATERIAL_TYPE
        ).alias("_mat_name"),
        _resolve_name(F.col("loan_type_code"), DEFAULT_LOAN_TYPE).alias("_loan_name"),
    )
    s2 = _ref_join(s2, ref, "location", "_loc_name", "_loc_uuid")
    s2 = _ref_join(s2, ref, "material_type", "_mat_name", "_mat_uuid")
    s2 = _ref_join(s2, ref, "loan_type", "_loan_name", "_loan_uuid")
    # left joins on TRUE (not crossJoin) so an empty dim NULLs the uuid
    # instead of silently dropping every record
    s2 = s2.join(
        F.broadcast(
            ref.filter(F.col("kind") == "instance_type")
            .select(F.col("uuid").alias("_inst_type_uuid"))
            .limit(1)
        ),
        F.lit(True),
        "left",
    )
    s2 = s2.join(
        F.broadcast(
            ref.filter(
                (F.col("kind") == "holdings_source")
                & (F.col("name") == DEFAULT_HOLDINGS_SOURCE)
            )
            .select(F.col("uuid").alias("_hsrc_uuid"))
            .limit(1)
        ),
        F.lit(True),
        "left",
    )
    note_dim = ref.filter(
        (F.col("kind") == "item_note_type") & (F.col("name") == AXIELL_LOCATION_NOTE_TYPE)
    ).select(F.col("uuid").alias("_note_uuid"))
    s2 = s2.join(F.broadcast(note_dim), F.lit(True), "left")

    # ---- stage 3: per-record disposition (sync_to_folio.py pass-1 order:
    # tombstone → empty content → selection → mapping errors) ----
    err = (
        F.when(F.col("empty_content"), F.lit("empty_content"))
        .when(F.col("deleted") | ~F.col("harvest_flag") | ~F.col("item_level"), F.lit(None))
        .when(
            F.col("source_id").isNull(),
            F.lit("Missing MARC 001 — cannot identify record"),
        )
        .when(
            F.col("title").isNull(),
            F.concat(
                F.lit("Missing 245$a (title) for source_id="), F.col("source_id")
            ),
        )
        .when(
            F.col("_loc_uuid").isNull(),
            F.concat(
                F.lit("Unresolved location '"), F.col("_loc_name"),
                F.lit("' — add it to the FOLIO tenant or fix the MARC"),
            ),
        )
        .when(
            F.col("_mat_uuid").isNull(),
            F.concat(
                F.lit("Unresolved material type '"), F.col("_mat_name"),
                F.lit("' — add it to the FOLIO tenant or fix the MARC"),
            ),
        )
        .when(
            F.col("_loan_uuid").isNull(),
            F.concat(
                F.lit("Unresolved loan type '"), F.col("_loan_name"),
                F.lit("' — add it to the FOLIO tenant or fix the MARC"),
            ),
        )
    )
    disp = (
        F.when(F.col("empty_content"), F.lit("error"))
        .when(F.col("deleted"), F.lit("tombstone"))  # advisory only, never actioned
        .when(~F.col("harvest_flag") | ~F.col("item_level"), F.lit("skip"))
        .when(err.isNotNull(), F.lit("error"))
        .otherwise(F.lit("mapped"))
    )
    s3 = s2.select("*", err.alias("_err"), disp.alias("_disp"))

    # ---- stage 4: payloads (to_json of the typed contracts) ----
    sid = F.col("source_id")
    instance_payload = F.to_json(
        F.struct(
            F.concat(F.lit(_ENTITY_HRID["instance"]), sid).alias("hrid"),
            F.trim(F.col("title")).alias("title"),
            F.lit("FOLIO").alias("source"),
            F.col("_inst_type_uuid").alias("instanceTypeId"),
        )
    )
    holdings_payload = F.to_json(
        F.struct(
            F.concat(F.lit(_ENTITY_HRID["holdings"]), sid).alias("hrid"),
            F.col("_hsrc_uuid").alias("sourceId"),
            F.col("_loc_uuid").alias("permanentLocationId"),
            F.col("call_number").alias("callNumber"),
            F.col("call_number_prefix").alias("callNumberPrefix"),
            F.col("shelving_order").alias("shelvingOrder"),
        )
    )
    # the 'Axiell location: <code>' note; noteType resolves to
    # itemNoteTypeId when the tenant knows it (upsert._resolve_item_note_types)
    note = F.struct(
        F.concat(
            F.lit("Axiell location: "),
            F.coalesce(F.col("location_code"), F.lit("unknown")),
        ).alias("note"),
        F.col("_note_uuid").alias("itemNoteTypeId"),
        F.lit(False).alias("staffOnly"),
    )
    item_payload = F.to_json(
        F.struct(
            F.concat(F.lit(_ENTITY_HRID["item"]), sid).alias("hrid"),
            F.struct(F.lit("Available").alias("name")).alias("status"),
            F.struct(F.col("_mat_uuid").alias("id")).alias("materialType"),
            F.struct(F.col("_loan_uuid").alias("id")).alias("permanentLoanType"),
            F.struct(F.col("_loc_uuid").alias("id")).alias("permanentLocation"),
            F.col("barcode").alias("barcode"),
            F.col("copy_number").alias("copyNumber"),
            F.col("volume").alias("volume"),
            F.when(
                F.col("electronic_access_uri").isNotNull(),
                F.array(F.struct(F.col("electronic_access_uri").alias("uri"))),
            ).alias("electronicAccess"),
            F.array(note).alias("notes"),
        )
    )
    entities = F.when(
        F.col("_disp") == "mapped",
        F.array(
            F.struct(
                F.lit("instance").alias("entity"), F.lit(1).alias("seq"),
                instance_payload.alias("payload_json"),
            ),
            F.struct(
                F.lit("holdings").alias("entity"), F.lit(2).alias("seq"),
                holdings_payload.alias("payload_json"),
            ),
            F.struct(
                F.lit("item").alias("entity"), F.lit(3).alias("seq"),
                item_payload.alias("payload_json"),
            ),
        ),
    ).otherwise(
        # one accounting row for tombstone / skip / error records
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("entity"), F.lit(0).alias("seq"),
                F.lit(None).cast("string").alias("payload_json"),
            )
        )
    )
    plan = s3.select(
        F.coalesce(sid, F.col("row_id")).alias("source_id"),
        F.lit("upsert").alias("pass"),
        F.col("_disp").alias("_disp"),
        F.col("_err").alias("error"),
        F.explode(entities).alias("e"),
    ).select(
        "source_id",
        "pass",
        F.col("e.entity").alias("entity"),
        F.col("e.seq").alias("seq"),
        F.when(
            F.col("e.entity").isNotNull(),
            F.concat(
                F.element_at(
                    F.create_map(
                        *[F.lit(x) for kv in _ENTITY_HRID.items() for x in kv]
                    ),
                    F.col("e.entity"),
                ),
                F.col("source_id"),
            ),
        ).alias("hrid"),
        F.when(F.col("_disp") != "mapped", F.col("_disp"))
        .otherwise(F.lit("upsert"))
        .alias("action"),
        F.col("e.payload_json").alias("payload_json"),
        F.col("error"),
    )
    if existing is not None:
        ex = existing.select(
            F.col("hrid").alias("_ex_hrid"), F.col("folio_id").alias("folio_id")
        )
        plan = plan.join(
            F.broadcast(ex), plan["hrid"] == ex["_ex_hrid"], "left"
        ).drop("_ex_hrid")
        plan = plan.withColumn(
            "action",
            F.when(
                F.col("action") == "upsert",
                F.when(F.col("folio_id").isNotNull(), F.lit("update")).otherwise(
                    F.lit("create")
                ),
            ).otherwise(F.col("action")),
        )
    else:
        plan = plan.withColumn("folio_id", F.lit(None).cast("string"))
    return plan


def folio_reconcile_plan(
    deletion_facts: DataFrame,
    live_mappings: DataFrame | None = None,
    existing: DataFrame | None = None,
    hard_delete: bool = False,
) -> DataFrame:
    """Pass 2: the reconciler's superseded-GUID facts → cascade rows,
    CHILD-FIRST item(1) → holdings(2) → instance(3).

    ``live_mappings(guid)`` drops any fact whose GUID is again mapped by a
    live record (iter_deletions' re-check — an anti-join, so a revert or
    handoff never suppresses the wrong record).  Soft-suppress rows carry
    discovery_suppress on every entity and staff_suppress ONLY on the
    instance (the sole FOLIO entity with that field — holdings-storage 422s
    on it, items drop it silently).  With ``existing``, not-found hrids
    become idempotent 'skip' rows (redelivered facts and races are safe)."""
    facts = deletion_facts.select(F.col("guid").cast("string").alias("guid")).distinct()
    if live_mappings is not None:
        live = live_mappings.select(F.col("guid").cast("string").alias("guid"))
        facts = facts.join(live, "guid", "left_anti")

    base_action = "delete" if hard_delete else "suppress"
    cascade = F.array(
        *[
            F.struct(F.lit(e).alias("entity"), F.lit(i + 1).alias("seq"))
            for i, e in enumerate(["item", "holdings", "instance"])
        ]
    )
    plan = facts.select(
        F.col("guid").alias("source_id"),
        F.lit("reconcile").alias("pass"),
        F.explode(cascade).alias("e"),
    ).select(
        "source_id",
        "pass",
        F.col("e.entity").alias("entity"),
        F.col("e.seq").alias("seq"),
        F.concat(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in _ENTITY_HRID.items() for x in kv]),
                F.col("e.entity"),
            ),
            F.col("source_id"),
        ).alias("hrid"),
        F.lit(base_action).alias("action"),
        F.to_json(
            F.struct(
                F.lit(True).alias("discoverySuppress"),
                F.when(F.col("e.entity") == "instance", F.lit(True)).alias(
                    "staffSuppress"
                ),
            )
        ).alias("payload_json"),
        F.lit(None).cast("string").alias("error"),
    )
    if not hard_delete:
        plan = plan.withColumn(
            "payload_json",
            F.when(F.col("action") == "suppress", F.col("payload_json")),
        )
    else:
        plan = plan.withColumn("payload_json", F.lit(None).cast("string"))
    if existing is not None:
        ex = existing.select(
            F.col("hrid").alias("_ex_hrid"), F.col("folio_id").alias("folio_id")
        )
        plan = plan.join(
            F.broadcast(ex), plan["hrid"] == ex["_ex_hrid"], "left"
        ).drop("_ex_hrid")
        plan = plan.withColumn(
            "action",
            F.when(F.col("folio_id").isNull(), F.lit("skip")).otherwise(
                F.col("action")
            ),
        )
    else:
        plan = plan.withColumn("folio_id", F.lit(None).cast("string"))
    return plan


def folio_sync_plan(
    records: DataFrame,
    ref: DataFrame,
    deletion_facts: DataFrame | None = None,
    live_mappings: DataFrame | None = None,
    existing: DataFrame | None = None,
    hard_delete: bool = False,
) -> DataFrame:
    """Both passes as ONE ordered action plan (sync_to_folio.py run_sync):
    upserts first (pass rank 1, Instance→Holdings→Item per record), then
    the reconciler cascades (rank 2, item→holdings→instance per GUID).
    The writer replays rows ordered by (pass_rank, source_id, seq)."""
    plan = folio_upsert_plan(records, ref, existing=existing)
    if deletion_facts is not None:
        plan = plan.unionByName(
            folio_reconcile_plan(
                deletion_facts,
                live_mappings=live_mappings,
                existing=existing,
                hard_delete=hard_delete,
            )
        )
    return plan.withColumn(
        "pass_rank", F.when(F.col("pass") == "upsert", F.lit(1)).otherwise(F.lit(2))
    )


def folio_sync_report(plan: DataFrame) -> DataFrame:
    """report.py PipelineReport counts: per-record disposition rollup
    (created/updated/upsert/suppressed/deleted/skipped/tombstone/failed
    /total + deletions) as (metric, n) rows — one map-side-combining
    groupBy over the plan."""
    # entity-level action tallies (reference _tally_entity_actions) ...
    entity_counts = (
        plan.filter(
            F.col("error").isNull()
            & F.col("action").isin("create", "update", "suppress", "delete")
        )
        .select(
            F.when(F.col("action") == "create", F.lit("created"))
            .when(F.col("action") == "update", F.lit("updated"))
            .when(F.col("action") == "suppress", F.lit("suppressed"))
            .otherwise(F.lit("deleted"))
            .alias("metric")
        )
        .groupBy("metric")
        .agg(F.count("*").alias("n"))
    )
    # ... plus record-level dispositions
    per_record = plan.groupBy("pass", "source_id").agg(
        F.max(F.col("error").isNotNull().cast("int")).alias("failed"),
        F.max("action").alias("any_action"),
    )
    metric = F.when(F.col("pass") == "reconcile", F.lit("deletions")).otherwise(
        F.when(F.col("failed") == 1, F.lit("failed"))
        .when(F.col("any_action") == "tombstone", F.lit("tombstone"))
        .when(F.col("any_action") == "skip", F.lit("skipped"))
        .otherwise(F.lit("synced"))
    )
    counts = per_record.select(metric.alias("metric")).groupBy("metric").agg(
        F.count("*").alias("n")
    )
    total = (
        per_record.filter(F.col("pass") == "upsert")
        .agg(F.count("*").alias("n"))
        .select(F.lit("total").alias("metric"), "n")
    )
    return counts.unionByName(entity_counts).unionByName(total)
