"""Matcher + merger as one declarative plan (SURVEY.md §2.8 G1–G5).

The reference splits this across two services: the matcher maintains an
incremental connected-components graph of works that should merge
(WorkGraphUpdater.scala:98-193) and the merger folds each component into a
single target work by a *rule family* — per-field rules with predicate
guards (FieldMergeRule.scala, ItemsRule.scala:25-57, ThumbnailRule.scala,
OtherIdentifiersRule.scala, WorkPredicates.scala), emitting Redirected stubs
only for the sources a rule actually merged (Merger.scala:72-161,
MergerManager.scala:15-26 — untouched works pass through Visible).
Spark-first, that's:

    works(id, source_type, merge_candidate_ids, suppressed, items,
          identifiers, thumbnail[, format, restricted])
      → edges from candidate lists, suppressed endpoints dropped      (F6)
      → connected components (min-label + pointer jumping)            (G1)
      → stable component digest over sorted member ids                (G2)
      → target per component = precedence top-1                       (O3)
      → per-field rule family over (target predicate, source
        predicate) guards — all groupBy/window expressions, no UDF    (G4/F4)
      → emit Visible merged target + Redirected stubs for MERGED
        sources; unmerged sources and singletons pass through;
        everything stamped with the BATCH time                        (G5)

Field rules reproduced (adapted to this engine's flat work model — items and
identifiers are opaque string arrays, ``format`` and ``restricted`` are
optional scalar columns):

  ItemsRule (ItemsRule.scala:25-57):
    * tei target            → items come from eligible sources (mets/miro
                              single-digital, sierra), replacing the tei stubs
    * calm single-physical  → keep every item EXCEPT the calm stub (the
      target                  Sierra/METS/Miro items carry the real data)
    * sierra target + METS single-digital source:
        - exactly 1 sierra item → locations fold INTO that item (item count
          unchanged — modelled as keeping the sierra item)
        - else → sierra items ++ METS items
    * sierra picture/digital-image/3d-object target + EXACTLY ONE Miro
      single-digital source:
        - 1 sierra item  → fold into it (count unchanged)
        - 0 sierra items → the Miro item
        - multi-item     → DON'T merge (ambiguous association; the Miro work
          stays Visible — the "leave the works unmerged" branch)

  ThumbnailRule (ThumbnailRule.scala): METS thumbnail preferred, else the
    Miro source with the minimal work id, else the target's own; suppressed
    entirely when any member is ``restricted`` (digital-location restriction).

  OtherIdentifiersRule (OtherIdentifiersRule.scala): target identifiers ++
    identifiers of MERGED sources only, distinct.

  ImageDataRule / ImagesRule (ImageDataRule.scala:28-123, round-5): images
    merge into an elected *sierra image target* — the first participant
    (target-first, then sources in deterministic (score, id) order)
    satisfying ``sierraDigitisedMiro`` (a sierra work carrying the digaids /
    digmiro digcode, WorkPredicates.scala:113-121), else the first plain
    sierra work — "regardless of whether this is the principal target",
    though the result is applied to the ACTUAL target.
      * target ``image_data`` (ImageDataRule): Miro images ONLY — elected's
        own images ++ single-digital-item Miro sources' images, and only
        when the elected work is NOT digitised-miro (re-digitised Miro
        content is superseded by METS); empty on every other merged target.
      * emitted images (ImagesRule, the separate ImageDataWithSource stream
        feeding the image pipeline): METS images when the elected work is a
        sierra picture/ephemera ++ the Miro images with the METS licence
        COPIED into them when the METS side carries exactly ONE distinct
        licence (ImageDataOps.scala:10-42); parent = the actual target.
      * standalone images (TargetOnlyMergeResult, MergeResult.scala:18-37):
        an UNMATCHED single-digital-item Miro work emits its own images
        with itself as parent; matched-but-unmerged works emit nothing.
      * sources matched by either image rule join the redirect set
        (PlatformMerger redirectSources, Merger.scala:217-224) — so a
        single-digital Miro source under ANY non-digitised-miro sierra
        target redirects even when ItemsRule left its items alone.

  withItemsInInternalWorks (WorkMergingOps.scala:23-40): the merged target's
    items are copied into every internal (TEI nested) work stub, which also
    inherit the wrapper's merged thumbnail — exposed as
    ``propagate_to_internal_works``.

G5 matters: "we cannot rely on the modified times of the individual works —
this may cause us to drop updates if works get unlinked" (RFC 038 via
MergeProcessor.scala:41-65) — so all derived rows carry ``batch_ts``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.components import component_digest, connected_components
from ..operators.precedence import precedence_score

DEFAULT_PRECEDENCE = ["ebsco", "tei", "calm", "sierra-digital", "sierra-physical", "sierra"]

# Flat image model: one struct per image; ``licence`` rides along so the
# ImagesRule METS-licence copy (ImageDataOps.scala:10-42) is expressible.
IMAGE_ARRAY_T = "array<struct<image_id:string,licence:string>>"

_OPTIONAL_COLS = {
    "format": "string",
    "restricted": "boolean",
    "digcodes": "array<string>",
    "images": IMAGE_ARRAY_T,
}


def _with_optional_cols(works: DataFrame) -> DataFrame:
    for c, t in _OPTIONAL_COLS.items():
        if c not in works.columns:
            works = works.withColumn(c, F.lit(None).cast(t))
    return works


# ----------------------------------------------------------- work predicates
# WorkPredicates.scala as boolean Column factories (F4).
def _is_sierra(t):
    return t.startswith("sierra")


def _single_digital_mets(t, n_items):
    return (t == "mets") & (n_items == 1)


def _single_digital_miro(t, n_items):
    return (t == "miro") & (n_items == 1)


_PICTUREISH = ["picture", "digital-image", "3d-object"]


def match_and_merge(
    works: DataFrame,
    batch_ts: dt.datetime,
    precedence: list[str] | None = None,
) -> DataFrame:
    """Full plan: components (G1/G2) + per-field fold (G4) + stamping (G5).

    Returns one row per input work:
    (work_id, component, subgraph_id, type ∈ Visible|Redirected,
     redirect_target, source_type, items, identifiers, thumbnail, batch_ts).
    """
    works = _with_optional_cols(works)
    # G1: edges from candidate lists; suppression breaks edges at either
    # endpoint (WorkGraphUpdater.scala:117-134) but every work self-links so
    # isolated/suppressed works still form singleton components
    sup = works.select("work_id", "suppressed")
    cand_edges = (
        works.select(
            F.col("work_id").alias("src"),
            F.explode("merge_candidate_ids").alias("dst"),
            F.col("suppressed").alias("src_sup"),
        )
        .join(sup.withColumnsRenamed({"work_id": "dst", "suppressed": "dst_sup"}), "dst", "left")
        .filter(~F.col("src_sup") & ~F.coalesce(F.col("dst_sup"), F.lit(True)))
        .select("src", "dst")
    )
    self_edges = works.select(
        F.col("work_id").alias("src"), F.col("work_id").alias("dst")
    )
    edges = cand_edges.unionByName(self_edges)
    labels = connected_components(edges)
    digests = component_digest(labels)

    w = works.join(labels.withColumnRenamed("id", "work_id"), "work_id", "left")
    w = w.withColumn("component", F.coalesce("component", "work_id"))
    out = fold_components(w, batch_ts, precedence)
    return out.join(digests.select("component", "subgraph_id"), "component", "left").select(
        "work_id",
        "component",
        F.coalesce("subgraph_id", F.sha2(F.col("component"), 256)).alias("subgraph_id"),
        "type",
        "redirect_target",
        "source_type",
        "items",
        "identifiers",
        "thumbnail",
        "is_target",
        "image_data",
        "emitted_images",
        "batch_ts",
    )


def fold_components(
    w: DataFrame,
    batch_ts: dt.datetime,
    precedence: list[str] | None = None,
) -> DataFrame:
    """The merger fold alone (G4/O3/G5): ``w`` must carry a ``component``
    column in addition to the work columns. Exposed separately so the rule
    family is oracle-testable without the CC step (q43).

    Scale note: ``w`` feeds several consumers (target extraction, the
    per-source join, the component aggregate) — when it is an expensive
    derivation rather than a table scan, localCheckpoint it first; plain
    scans re-read cheaply with column pruning."""
    order = precedence or DEFAULT_PRECEDENCE
    w = _with_optional_cols(w)

    # O3: target per component (suppressed works can never be targets)
    score = precedence_score(F.col("source_type"), order)
    w = w.withColumn("_score", F.when(F.col("suppressed"), F.lit(10_000)).otherwise(score))
    rank_w = Window.partitionBy("component").orderBy(F.asc("_score"), F.asc("work_id"))
    w = w.withColumn("_rn", F.row_number().over(rank_w))
    w = w.withColumn("_n_items", F.size(F.coalesce("items", F.array().cast("array<string>"))))

    tgt = w.filter(F.col("_rn") == 1).select(
        "component",
        F.col("work_id").alias("_t_id"),
        F.col("source_type").alias("_t_type"),
        F.col("items").alias("_t_items"),
        F.col("_n_items").alias("_t_n_items"),
        F.col("identifiers").alias("_t_ids"),
        F.col("thumbnail").alias("_t_thumb"),
        F.col("format").alias("_t_format"),
    )

    # -------- per-source rule eligibility (the PartialRule guards) ----------
    s = w.join(tgt, "component")
    t_type, t_n = F.col("_t_type"), F.col("_t_n_items")
    is_src = F.col("_rn") > 1
    src_mets = _single_digital_mets(F.col("source_type"), F.col("_n_items"))
    src_miro = _single_digital_miro(F.col("source_type"), F.col("_n_items"))
    src_sierra = _is_sierra(F.col("source_type"))
    t_tei = t_type == "tei"
    t_calm_spi = (t_type == "calm") & (t_n == 1)
    t_sierra = _is_sierra(t_type)
    t_pictureish = t_sierra & F.col("_t_format").isin(_PICTUREISH)

    comp_w = Window.partitionBy("component")
    n_miro = F.sum(F.when(is_src & src_miro, 1).otherwise(0)).over(comp_w)
    n_mets = F.sum(F.when(is_src & src_mets, 1).otherwise(0)).over(comp_w)
    miro_rule_applies = t_pictureish & (t_n <= 1) & (n_miro == 1)

    items_merged = is_src & (
        ((t_tei | t_calm_spi) & (src_mets | src_miro | src_sierra))
        | (t_sierra & ~t_tei & src_mets)
        | (miro_rule_applies & src_miro)
    )
    s = s.withColumn("_items_merged", items_merged)
    # items a merged source CONTRIBUTES to the fold: under a single-item
    # sierra target, METS/Miro locations fold INTO the existing item (count
    # unchanged → contributes nothing); everywhere else its own items
    contributes = (
        F.when(
            F.col("_items_merged")
            & t_sierra & ~t_tei & (t_n == 1) & (src_mets | (miro_rule_applies & src_miro)),
            F.array().cast("array<string>"),
        )
        # orElse exclusivity (ItemsRule.scala:25-57): when any METS source is
        # items-merged into the same sierra target, mergeMetsIntoSierraTarget
        # wins the chain and the single-digital Miro item is EXCLUDED (the
        # re-digitised-Miro duplicate case) — but the Miro source still
        # redirects (knownDuplicateSources), so _items_merged stays true.
        .when(
            F.col("_items_merged") & miro_rule_applies & src_miro & (n_mets > 0),
            F.array().cast("array<string>"),
        )
        .otherwise(F.when(F.col("_items_merged"), F.col("items")))
    )
    s = s.withColumn("_contrib_items", contributes)

    # ThumbnailRule guards. Reference semantics (ThumbnailRule.scala): a
    # DEFINED mets rule wins outright — even if the picked mets work has no
    # thumbnail there is NO fallback to miro or the target (orElse chains on
    # rule definedness, not on the inner Option); every source matching a
    # defined rule's source predicate counts as merged (FieldMergeRule
    # mergedSources), not just the one whose thumbnail was used.
    thumb_mets_ok = (t_sierra | t_calm_spi | t_tei) & is_src & src_mets
    thumb_miro_ok = ((t_sierra & (t_n <= 1)) | t_calm_spi | t_tei) & is_src & src_miro
    s = s.withColumn(
        "_thumb_pick",
        F.when(
            thumb_mets_ok,
            F.struct(F.lit(0).alias("pri"), F.col("work_id").alias("id"), F.col("thumbnail").alias("thumb")),
        ).when(
            thumb_miro_ok,
            F.struct(F.lit(1).alias("pri"), F.col("work_id").alias("id"), F.col("thumbnail").alias("thumb")),
        ),
    )
    s = s.withColumn("_thumb_merged", F.col("_thumb_pick").isNotNull())

    # ---------------- image rules (ImageDataRule.scala:28-123) --------------
    # Elect the *sierra image target* over all visible participants in
    # (target-first, score, id) order: first satisfying sierraDigitisedMiro
    # (digaids/digmiro digcode, WorkPredicates.scala:113-121), else the first
    # plain sierra work. One window min over an ordered struct — the elected
    # work's predicate flags and images ride along in the struct's tail.
    empty_imgs = F.array().cast(IMAGE_ARRAY_T)
    imgs = F.coalesce(F.col("images"), empty_imgs)
    digs = F.coalesce(F.col("digcodes"), F.array().cast("array<string>"))
    row_sierra = _is_sierra(F.col("source_type"))
    row_digmiro = row_sierra & F.arrays_overlap(
        digs, F.array(F.lit("digaids"), F.lit("digmiro"))
    )
    row_pic_eph = row_sierra & F.col("format").isin("picture", "ephemera")
    elkey = F.struct(
        (F.col("_rn") != 1).cast("int").alias("o_src"),
        F.col("_score").alias("o_score"),
        F.col("work_id").alias("o_id"),
        row_digmiro.alias("digmiro"),
        row_pic_eph.alias("pic_eph"),
        imgs.alias("images"),
    )
    electable = ~F.col("suppressed")
    el = F.coalesce(
        F.min(F.when(row_digmiro & electable, elkey)).over(comp_w),
        F.min(F.when(row_sierra & electable, elkey)).over(comp_w),
    )
    s = s.withColumn("_el", el)
    # PartialRule source matches: getPairedMiroImages (elected sierra-and-NOT-
    # digitised-miro × single-digital Miro) and getMetsPictureAndEphemera
    # (elected sierra picture/ephemera × single-digital METS).
    s = s.withColumn(
        "_img_miro_src",
        is_src & src_miro & F.col("_el").isNotNull() & ~F.col("_el.digmiro"),
    )
    s = s.withColumn(
        "_img_mets_src",
        is_src & src_mets & F.col("_el").isNotNull() & F.col("_el.pic_eph"),
    )
    s = s.withColumn(
        "_miro_src_imgs",
        F.when(F.col("_img_miro_src"), F.struct("_score", "work_id", imgs.alias("images"))),
    )
    s = s.withColumn(
        "_mets_src_imgs",
        F.when(F.col("_img_mets_src"), F.struct("_score", "work_id", imgs.alias("images"))),
    )
    # Sources matched by either image rule join the redirect set
    # (PlatformMerger redirectSources, Merger.scala:217-224).
    s = s.withColumn(
        "_merged",
        F.col("_items_merged")
        | F.col("_thumb_merged")
        | F.col("_img_miro_src")
        | F.col("_img_mets_src"),
    )

    folded = s.groupBy("component").agg(
        # items the rules pull from sources, in deterministic (score, id) order
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_contrib_items").isNotNull(),
                            F.struct("_score", "work_id", F.col("_contrib_items").alias("items")),
                        )
                    )
                ),
                lambda st: st["items"],
            )
        ).alias("_src_items"),
        F.max(F.col("_items_merged") & (t_tei | t_calm_spi)).alias("_replace_target_items"),
        F.max(F.col("_items_merged")).alias("_any_items_rule"),
        # identifiers: MERGED sources only (OtherIdentifiersRule)
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_merged"), F.struct("_score", "work_id", "identifiers"))
                        )
                    ),
                    lambda st: st["identifiers"],
                )
            )
        ).alias("_merged_src_ids"),
        F.min("_thumb_pick").alias("_thumb_struct"),
        F.max(F.coalesce(F.col("restricted"), F.lit(False))).alias("_any_restricted"),
        F.count(F.lit(1)).alias("n_members"),
        # image rules: elected participant (constant per component) + the
        # matched sources' images in deterministic (score, id) order
        F.min("_el").alias("_el_c"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list("_miro_src_imgs")), lambda st: st["images"]
            )
        ).alias("_miro_imgs"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list("_mets_src_imgs")), lambda st: st["images"]
            )
        ).alias("_mets_imgs"),
        F.max("_img_miro_src").alias("_any_miro_img"),
        F.max("_img_mets_src").alias("_any_mets_img"),
    )

    # -------- post-agg image expressions (target-row semantics) -------------
    # FlatImageMergeRule result = (elected :: matched sources).flatMap(images)
    # — the elected's own images lead both lists when the rule is defined.
    el_imgs = F.coalesce(F.col("_el_c.images"), empty_imgs)
    miro_flat = F.when(
        F.col("_any_miro_img"), F.concat(el_imgs, F.col("_miro_imgs"))
    ).otherwise(empty_imgs)
    mets_flat = F.when(
        F.col("_any_mets_img"), F.concat(el_imgs, F.col("_mets_imgs"))
    ).otherwise(empty_imgs)
    # ImagesRule licence copy: exactly ONE distinct METS licence → overwrite
    # every Miro image's licence; ambiguity or none → leave untouched.
    licences = F.array_distinct(
        F.filter(
            F.transform(mets_flat, lambda x: x["licence"]), lambda l: l.isNotNull()
        )
    )
    adj_miro = F.when(
        F.size(licences) == 1,
        F.transform(
            miro_flat,
            lambda x: F.struct(
                x["image_id"].alias("image_id"),
                F.element_at(licences, 1).alias("licence"),
            ),
        ),
    ).otherwise(miro_flat)
    own_imgs = F.coalesce(F.col("images"), empty_imgs)
    # TargetOnlyMergeResult (MergeResult.scala:18-37): an unmatched
    # single-digital-item Miro work emits its own images with itself as
    # parent; everything else standalone emits nothing.
    standalone = F.when(
        (F.col("source_type") == "miro") & (F.col("_n_items") == 1) & ~F.col("suppressed"),
        own_imgs,
    ).otherwise(empty_imgs)

    out = (
        s.join(folded, "component")
        .select(
            "component",
            "work_id",
            F.when(F.col("_rn") == 1, F.lit("Visible"))
            .when(F.col("_merged"), F.lit("Redirected"))
            .otherwise(F.lit("Visible"))  # unmerged sources pass through
            .alias("type"),
            F.when((F.col("_rn") != 1) & F.col("_merged"), F.col("_t_id")).alias(
                "redirect_target"
            ),
            "source_type",
            F.when(
                F.col("_rn") == 1,
                F.when(F.col("_replace_target_items"), F.col("_src_items")).otherwise(
                    F.concat(
                        F.coalesce(F.col("items"), F.array().cast("array<string>")),
                        F.col("_src_items"),
                    )
                ),
            )
            .when(F.col("_merged"), F.array().cast("array<string>"))
            .otherwise(F.col("items"))  # pass-through keeps its items
            .alias("items"),
            F.when(
                F.col("_rn") == 1,
                F.array_distinct(F.concat(F.col("identifiers"), F.col("_merged_src_ids"))),
            )
            .when(F.col("_merged"), F.array().cast("array<string>"))
            .otherwise(F.col("identifiers"))
            .alias("identifiers"),
            F.when(
                (F.col("_rn") == 1) & ~F.col("_any_restricted"),
                F.when(F.col("_thumb_struct").isNotNull(), F.col("_thumb_struct.thumb")).otherwise(
                    F.col("thumbnail")
                ),
            )
            .when((F.col("_rn") != 1) & ~F.col("_merged"), F.col("thumbnail"))
            .alias("thumbnail"),
            (F.col("_rn") == 1).alias("is_target"),
            # ImageDataRule: the merged target's imageData is REPLACED by the
            # rule result (Miro images only; Nil when no elected sierra or
            # digitised-miro) — PlatformMerger data.copy(imageData = ...).
            # Singleton targets and pass-through works keep their own images;
            # redirect stubs carry none.
            F.when((F.col("_rn") == 1) & (F.col("n_members") > 1), miro_flat)
            .when(F.col("_rn") == 1, own_imgs)
            .when(F.col("_merged"), empty_imgs)
            .otherwise(own_imgs)
            .alias("image_data"),
            # ImagesRule: the ImageDataWithSource stream rows, parented by the
            # ACTUAL target — METS picture/ephemera images ++ licence-adjusted
            # Miro images; standalone Miro singletons emit their own.
            F.when(
                (F.col("_rn") == 1) & (F.col("n_members") > 1),
                F.concat(mets_flat, adj_miro),
            )
            .when(F.col("_rn") == 1, standalone)
            .otherwise(empty_imgs)
            .alias("emitted_images"),
            F.lit(batch_ts).alias("batch_ts"),
        )
    )
    return out


def merged_image_stream(merged: DataFrame) -> DataFrame:
    """The ImageDataWithSource stream (ImageDataWithSource.scala,
    MergerOutcome.imagesWithSources): one row per emitted image, parented by
    the work that emitted it. Narrow explode over the fold output — no extra
    shuffle; at scale this is the frame the image pipeline ingests."""
    return (
        merged.filter(F.size("emitted_images") > 0)
        .select(
            F.col("work_id").alias("parent_work_id"),
            F.explode("emitted_images").alias("img"),
            "batch_ts",
        )
        .select(
            "parent_work_id",
            F.col("img.image_id").alias("image_id"),
            F.col("img.licence").alias("licence"),
            "batch_ts",
        )
    )


def propagate_to_internal_works(merged: DataFrame, stubs: DataFrame) -> DataFrame:
    """withItemsInInternalWorks (WorkMergingOps.scala:23-40) + the internal-
    works emission (Merger.scala:126-146): every internal (TEI nested) work
    stub of a merge TARGET becomes a full Visible work carrying the wrapper's
    MERGED items and MERGED thumbnail. Redirected sources drop their stubs
    (redirectSourceToTarget sets internalWorkStubs = Nil) and pass-through
    sources never expand theirs — both fall out of the is_target filter.

    ``stubs``: (work_id = wrapper, stub_work_id, ...passthrough cols).
    Broadcast-friendly: stubs are tiny relative to works; the join key is the
    wrapper id so no wide shuffle of the merged frame is needed beyond the
    existing component partitioning."""
    targets = merged.filter(F.col("is_target") & (F.col("type") == "Visible")).select(
        "work_id", "items", "thumbnail", "batch_ts"
    )
    passthrough = [c for c in stubs.columns if c not in ("work_id", "stub_work_id")]
    return stubs.join(targets, "work_id").select(
        F.col("stub_work_id").alias("work_id"),
        F.col("work_id").alias("wrapper_work_id"),
        F.lit("Visible").alias("type"),
        "items",
        "thumbnail",
        "batch_ts",
        *passthrough,
    )
