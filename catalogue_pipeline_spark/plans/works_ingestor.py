"""The works-ingestor document builder — the final, user-visible stage of
the pipeline (SURVEY §3.3): merged works → the four-section indexable
documents a search front-end serves.

Reference behavior reproduced (catalogue_graph/src/ingestor/…):

* ``works_transformer.py:26-48`` — type dispatch: Visible works get the
  full display/query/aggregatable/filterable sections; Redirected works
  carry only their redirect target; Deleted/Invisible carry type only.
* ``extractors/works/base_works_extractor.py:118-155`` — the extractor
  composition: each VISIBLE work is enriched with its hierarchy
  (ancestors + children from the path graph) and the graph-elected
  standard labels of every concept it references.
* ``transformers/work_display_transformer.py:1-220`` — the display
  section: identifiers with type labels, thumbnail, grouped notes,
  subject/contributor dedup by standard label, production events,
  partOf/parts relations (series filtered against ancestor titles,
  children in natural sort order).
* ``transformers/work_query_transformer.py:1-249`` — the query section:
  free-text search fields, collection-path expansion from ancestor
  paths, order-preserving get_unique semantics.
* ``models/filter/work.py:1-120`` — the filterable values (ids the API
  filters on), including production.dates.range.from as epoch millis
  with the Scala pipeline's -9999 'negative infinity' sentinel
  (work_query_transformer.py:15-19).
* ``transformers/work_aggregate_transformer.py:1-127`` — the
  aggregatable values: id+label pairs deduplicated by label, MARC
  canonical language labels (lookups/languages.py), license display
  lookup, production decade→from-year.
* ``internal_model/work/Availability.scala:48-102`` — availability
  derivation from item+holdings locations, with the "held in another
  institution" terms-of-use suppression of closed-stores.

Engine model: one row per work with nested arrays (items carry location
structs, subjects/genres/contributors carry concept structs) — see
``WORK_SCHEMA``.  Everything below is per-row higher-order-function
column expressions (F.transform/F.filter/F.aggregate): zero shuffles and
zero Python on the bulk path.  The only wide stages are the two
extractor joins (hierarchy by work id, concept-label map by concept id),
both plain equi-joins AQE can broadcast when the dimension side is
small.  That is the 100 TB shape: the section builders scale strictly
with input rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph_works import work_hierarchy
from .sierra_fields import _LANGUAGE_CODES

# --------------------------------------------------------------- lookups
# display/availability.py:5-9
AVAILABILITY_LABELS = {
    "online": "Online",
    "closed-stores": "Closed stores",
    "open-shelves": "Open shelves",
}
# canonical emission order for the derived set (the reference builds a
# Scala Set — order there is incidental; this engine fixes it)
AVAILABILITY_ORDER = ["online", "closed-stores", "open-shelves"]

# display/access_status.py:7-31
ACCESS_STATUS_IDS = {
    "Open": "open",
    "OpenWithAdvisory": "open-with-advisory",
    "Restricted": "restricted",
    "Safeguarded": "safeguarded",
    "ByAppointment": "by-appointment",
    "TemporarilyUnavailable": "temporarily-unavailable",
    "Unavailable": "unavailable",
    "Closed": "closed",
    "LicensedResources": "licensed-resources",
    "PermissionRequired": "permission-required",
}

# display/license.py:7-35
LICENSE_LABELS = {
    "cc-by": "Attribution 4.0 International (CC BY 4.0)",
    "cc-by-nc": "Attribution-NonCommercial 4.0 International (CC BY-NC 4.0)",
    "cc-by-nc-nd": (
        "Attribution-NonCommercial-NoDerivatives 4.0 International (CC BY-NC-ND 4.0)"
    ),
    "cc-0": "CC0 1.0 Universal",
    "pdm": "Public Domain Mark",
    "cc-by-nd": "Attribution-NoDerivatives 4.0 International (CC BY-ND 4.0)",
    "cc-by-sa": "Attribution-ShareAlike 4.0 International (CC BY-SA 4.0)",
    "cc-by-nc-sa": (
        "Attribution-NonCommercial-ShareAlike 4.0 International (CC BY-NC-SA 4.0)"
    ),
    "ogl": "Open Government Licence",
    "opl": "Open Parliament Licence",
    "inc": "In copyright",
}
LICENSE_URLS = {
    "cc-by": "http://creativecommons.org/licenses/by/4.0/",
    "cc-by-nc": "https://creativecommons.org/licenses/by-nc/4.0/",
    "cc-by-nc-nd": "https://creativecommons.org/licenses/by-nc-nd/4.0/",
    "cc-0": "https://creativecommons.org/publicdomain/zero/1.0/legalcode",
    "pdm": "https://creativecommons.org/share-your-work/public-domain/pdm/",
    "cc-by-nd": "https://creativecommons.org/licenses/by-nd/4.0/",
    "cc-by-sa": "https://creativecommons.org/licenses/by-sa/4.0/",
    "cc-by-nc-sa": "https://creativecommons.org/licenses/by-nc-sa/4.0/",
    "ogl": "http://www.nationalarchives.gov.uk/doc/open-government-licence/version/3/",
    "opl": (
        "https://www.parliament.uk/site-information/copyright-parliament/"
        "open-parliament-licence/"
    ),
    "inc": "http://rightsstatements.org/vocab/InC/1.0/",
}

# display/identifier.py:14-45 (public scheme→label lookup)
IDENTIFIER_LABELS = {
    "tei-manuscript-id": "Tei manuscript id",
    "miro-image-number": "Miro image number",
    "miro-library-reference": "Miro library reference",
    "sierra-system-number": "Sierra system number",
    "sierra-identifier": "Sierra identifier",
    "ebsco-alt-lookup": "EBSCO lookup identifier",
    "lc-gmgpc": "Library of Congress Thesaurus for Graphic Materials",
    "lc-subjects": "Library of Congress Subject Headings (LCSH)",
    "lc-names": "Library of Congress Name authority records",
    "nlm-mesh": "Medical Subject Headings (MeSH) identifier",
    "calm-ref-no": "Calm RefNo",
    "calm-altref-no": "Calm AltRefNo",
    "calm-record-id": "Calm RecordIdentifier",
    "isbn": "International Standard Book Number",
    "issn": "ISSN",
    "mets": "METS",
    "mets-image": "METS image",
    "wellcome-digcode": "Wellcome digcode",
    "iconographic-number": "Iconographic number",
    "viaf": "VIAF: The Virtual International Authority File",
    "fihrist": "Fihrist Authority",
    "bl-estc-citation-no": "British Library English Short Title Catalogue",
    "label-derived": "Identifier derived from the label of the referent",
    "wellcome-accession-number": "Accession number",
    "wikidata": "Wikidata",
    "weco-authority": "Wellcome Concepts",
    "axiell-guid": "Axiell GUID",
}

# MARC canonical language names for aggregation (lookups/languages.py
# from_code; the engine carries the sierra_fields representative subset
# plus the codes the reference ingestor tests exercise)
MARC_LANGUAGE_NAMES = dict(_LANGUAGE_CODES)
MARC_LANGUAGE_NAMES.update({"egy": "Egyptian", "ice": "Icelandic", "san": "Sanskrit"})

# work_query_transformer.py:15-19 — Scala's -9999-01-01T00:00:00Z sentinel
NEGATIVE_INFINITY_DATE = "-9999-01-01T00:00:00Z"
NEGATIVE_INFINITY_MILLIS = -377705116800000

# Availability.scala:84-100 — exact-substring institution markers
OTHER_INSTITUTION_MARKERS = [
    "Churchill Archives Centre",
    "UCL Special Collections and Archives",
    "at King's College London",
    "at the Army Medical Services Museum",
    "currently remains with the Martin Leake family",
]

_ID_T = "array<struct<scheme:string,value:string>>"
_CONCEPT_T = (
    "struct<concept_id:string,label:string,"
    f"identifiers:{_ID_T},concept_type:string>"
)
_LOC_T = (
    "struct<kind:string,location_type_id:string,location_type_label:string,"
    "label:string,shelfmark:string,url:string,link_text:string,credit:string,"
    "created_date:string,license_id:string,access_status:string,"
    "access_relationship:string>"
)

# The engine's flat merged-work row (models/merged/work.py +
# models/pipeline/work_data.py re-expressed relationally; locations carry
# ONE access condition — the elected one from the item-access rules engine,
# plans/sierra_item_access.py).
WORK_SCHEMA = f"""
    work_id string, type string, work_type string,
    source_scheme string, source_value string,
    other_identifiers {_ID_T},
    title string, alternative_titles array<string>,
    reference_number string, description string,
    physical_description string, lettering string, edition string,
    duration int, current_frequency string,
    former_frequency array<string>, designation array<string>,
    format struct<id:string,label:string>,
    created_date_label string,
    thumbnail {_LOC_T},
    languages array<struct<id:string,label:string>>,
    notes array<struct<note_type_id:string,note_type_label:string,contents:string>>,
    items array<struct<id:string,identifiers:{_ID_T},title:string,note:string,
                       locations:array<{_LOC_T}>>>,
    holdings array<struct<note:string,enumeration:array<string>,location:{_LOC_T}>>,
    image_data array<struct<id:string,identifiers:{_ID_T}>>,
    subjects array<struct<concept_id:string,label:string,identifiers:{_ID_T},
                          concept_type:string,concepts:array<{_CONCEPT_T}>>>,
    genres array<struct<label:string,concepts:array<{_CONCEPT_T}>>>,
    contributors array<struct<agent:{_CONCEPT_T},roles:array<string>,primary:boolean>>,
    production array<struct<label:string,places:array<string>,agents:array<string>,
                            dates:array<struct<label:string,range_from:string>>,
                            function:string>>,
    collection_path struct<path:string,label:string>,
    series_ancestors array<struct<title:string,work_type:string,num_children:int>>,
    redirect_target string
"""


# ------------------------------------------------------------ primitives
def _lit_map(d: dict) -> Column:
    return F.create_map(*[x for kv in d.items() for x in (F.lit(kv[0]), F.lit(kv[1]))])


def _empty(t: str) -> Column:
    return F.array().cast(f"array<{t}>")


def unique_preserving(arr: Column) -> Column:
    """Order-preserving distinct over a string array (the reference's
    ``get_unique`` = dict.fromkeys, work_query_transformer.py:22-24)."""
    return F.aggregate(
        arr,
        F.slice(arr, 1, 0),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )


def dedup_by_key(arr: Column, key) -> Column:
    """Keep the FIRST element for each key (the seen-labels loops in
    work_display_transformer.py:123-136,180-193 and the aggregate
    get_unique, work_aggregate_transformer.py:35-41)."""
    acc0 = F.struct(
        F.slice(arr, 1, 0).alias("out"), F.array().cast("array<string>").alias("seen")
    )
    return F.aggregate(
        arr,
        acc0,
        lambda a, x: F.when(F.array_contains(a.getField("seen"), key(x)), a).otherwise(
            F.struct(
                F.concat(a.getField("out"), F.array(x)).alias("out"),
                F.concat(a.getField("seen"), F.array(key(x))).alias("seen"),
            )
        ),
        lambda a: a.getField("out"),
    )


def natural_sort_key_expr(col: Column, width: int = 12) -> Column:
    """Sortable encoding of utils/sort.py natural_sort_key: every digit
    run zero-padded to fixed width, so 'A/9/B' < 'A/10/B' under plain
    string comparison."""
    toks = F.split(
        F.regexp_replace(F.coalesce(col, F.lit("")), "(\\d+)", "\x01$1\x01"),
        "\x01",
    )
    return F.concat_ws(
        "",
        F.transform(
            toks,
            lambda t: F.when(t.rlike("^\\d+$"), F.lpad(t, width, "0")).otherwise(t),
        ),
    )


def _std_title(t: Column) -> Column:
    # query_result.py:10-11 — rstrip(".")
    return F.regexp_replace(t, "\\.+$", "")


def _ids_values(ids: Column) -> Column:
    return F.transform(ids, lambda i: i.getField("value"))


def _display_identifiers(ids: Column) -> Column:
    """display/identifier.py:56-63 — value + typed identifierType."""
    lm = _lit_map(IDENTIFIER_LABELS)
    return F.transform(
        ids,
        lambda i: F.struct(
            i.getField("value").alias("value"),
            i.getField("scheme").alias("identifier_type_id"),
            F.coalesce(
                F.try_element_at(lm, i.getField("scheme")), i.getField("scheme")
            ).alias("identifier_type_label"),
        ),
    )


def _display_location(loc: Column) -> Column:
    """display/location.py flattened: physical keeps label+shelfmark,
    digital keeps url/linkText/credit/createdDate; both carry the
    location type, license (id+label+url) and elected access status."""
    lic_l, lic_u = _lit_map(LICENSE_LABELS), _lit_map(LICENSE_URLS)
    st = _lit_map(ACCESS_STATUS_IDS)
    return F.when(
        loc.isNotNull(),
        F.struct(
            loc.getField("kind").alias("kind"),
            loc.getField("location_type_id").alias("location_type_id"),
            loc.getField("location_type_label").alias("location_type_label"),
            loc.getField("label").alias("label"),
            loc.getField("shelfmark").alias("shelfmark"),
            loc.getField("url").alias("url"),
            loc.getField("link_text").alias("link_text"),
            loc.getField("credit").alias("credit"),
            loc.getField("created_date").alias("created_date"),
            loc.getField("license_id").alias("license_id"),
            F.try_element_at(lic_l, loc.getField("license_id")).alias("license_label"),
            F.try_element_at(lic_u, loc.getField("license_id")).alias("license_url"),
            F.try_element_at(st, loc.getField("access_status")).alias(
                "access_status_id"
            ),
        ),
    )


# --------------------------------------------------------- availability
def _terms_other_institution(terms: Column) -> Column:
    """Availability.scala:84-100 (TermsOfUse crude string matching)."""
    low = F.lower(terms)
    out = low.contains("available at") | low.contains("available by appointment at")
    for marker in OTHER_INSTITUTION_MARKERS:
        out = out | terms.contains(marker)
    return out


def _loc_is_available(loc: Column) -> Column:
    """AccessStatus.isAvailable (AccessStatus.scala:12-27): Open,
    OpenWithAdvisory, LicensedResources(Resource) — RelatedResource is
    excluded from the 'available online' filter."""
    st = loc.getField("access_status")
    return (
        st.isin("Open", "OpenWithAdvisory")
        | (
            (st == "LicensedResources")
            & (F.coalesce(loc.getField("access_relationship"), F.lit("resource"))
               != "related")
        )
    )


def availabilities_expr(items: Column, holdings: Column, notes: Column) -> Column:
    """Availabilities.forWorkData (Availability.scala:48-66): sweep every
    item location ++ holdings location; open-shelves / closed-stores (the
    latter suppressed when a terms-of-use note says the item lives in
    another institution) / online when a digital location is available."""
    other_lib = F.exists(
        F.coalesce(notes, _empty("struct<note_type_id:string,note_type_label:string,contents:string>")),
        lambda n: (n.getField("note_type_id") == "terms-of-use")
        & _terms_other_institution(n.getField("contents")),
    )
    locs = F.concat(
        F.flatten(
            F.transform(
                F.coalesce(items, _empty(f"struct<id:string,identifiers:{_ID_T},title:string,note:string,locations:array<{_LOC_T}>>")),
                lambda i: i.getField("locations"),
            )
        ),
        F.filter(
            F.transform(
                F.coalesce(holdings, _empty(f"struct<note:string,enumeration:array<string>,location:{_LOC_T}>")),
                lambda h: h.getField("location"),
            ),
            lambda loc: loc.isNotNull(),
        ),
    )

    def has(pred):
        return F.exists(locs, pred)

    online = has(
        lambda loc: (loc.getField("kind") == "digital") & _loc_is_available(loc)
    )
    closed = has(
        lambda loc: (loc.getField("kind") == "physical")
        & (loc.getField("location_type_id") == "closed-stores")
    ) & ~other_lib
    open_sh = has(
        lambda loc: (loc.getField("kind") == "physical")
        & (loc.getField("location_type_id") == "open-shelves")
    )
    flags = {"online": online, "closed-stores": closed, "open-shelves": open_sh}
    return F.filter(
        F.array(*[F.when(flags[a], F.lit(a)) for a in AVAILABILITY_ORDER]),
        lambda x: x.isNotNull(),
    )


# ----------------------------------------------------------- extraction
_HIER_T = (
    "struct<id:string,label:string,collection_path:string,"
    "collection_path_label:string,work_type:string,parts:bigint>"
)


def extract_works(
    works: DataFrame, concept_labels: DataFrame | None = None
) -> DataFrame:
    """base_works_extractor.py:118-155 as joins: enrich every VISIBLE work
    with (a) ``hierarchy_ancestors`` (closest parent first) and
    ``hierarchy_children`` (collection order) from the collection-path
    graph, (b) a ``concept_labels`` map canonical-id → graph-elected
    standard label (WorkConceptsExtractor + work_base_transformer.py:14-20),
    and (c) derived ``availabilities`` (Availability.scala:48-66).

    ``concept_labels``: (concept_id, display_label) — e.g. the output of
    plans/concept_graph.indexable_concepts.  Non-visible works pass
    through with empty enrichment (the extractor yields them bare)."""
    anc, chi = work_hierarchy(works)
    out = works.join(anc, "work_id", "left").join(chi, "work_id", "left")
    out = out.withColumn(
        "hierarchy_ancestors",
        F.coalesce("hierarchy_ancestors", _empty(_HIER_T)),
    ).withColumn(
        "hierarchy_children",
        F.coalesce("hierarchy_children", _empty(_HIER_T)),
    )

    if concept_labels is not None:
        refs = out.select(
            "work_id",
            F.explode(
                F.concat(
                    F.transform(F.col("subjects"), lambda s: s.getField("concept_id")),
                    F.flatten(
                        F.transform(
                            F.col("subjects"),
                            lambda s: F.transform(
                                s.getField("concepts"),
                                lambda c: c.getField("concept_id"),
                            ),
                        )
                    ),
                    F.flatten(
                        F.transform(
                            F.col("genres"),
                            lambda g: F.transform(
                                g.getField("concepts"),
                                lambda c: c.getField("concept_id"),
                            ),
                        )
                    ),
                    F.transform(
                        F.col("contributors"),
                        lambda c: c.getField("agent").getField("concept_id"),
                    ),
                )
            ).alias("concept_id"),
        ).filter(F.col("concept_id").isNotNull()).distinct()
        lm = (
            refs.join(concept_labels.select("concept_id", "display_label"), "concept_id")
            .groupBy("work_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("concept_id", "display_label"))
                ).alias("concept_labels")
            )
        )
        out = out.join(lm, "work_id", "left")
    else:
        out = out.withColumn("concept_labels", F.lit(None).cast("map<string,string>"))

    return out.withColumn(
        "availabilities",
        F.when(
            F.col("type") == "Visible",
            availabilities_expr(F.col("items"), F.col("holdings"), F.col("notes")),
        ).otherwise(_empty("string")),
    )


# -------------------------------------------------------- section builders
def _std_label(c: Column, label_map: Column) -> Column:
    """work_base_transformer.py:14-20 — graph-elected display label when
    the concept is in the graph, else the work's own label."""
    return F.coalesce(
        F.try_element_at(label_map, c.getField("concept_id")), c.getField("label")
    )


def _display_concept(c: Column, label_map: Column) -> Column:
    """work_display_transformer.py:166-173 — identifiers None when empty."""
    ids = _display_identifiers(c.getField("identifiers"))
    return F.struct(
        c.getField("concept_id").alias("id"),
        _std_label(c, label_map).alias("label"),
        F.when(F.size(ids) > 0, ids).alias("identifiers"),
        c.getField("concept_type").alias("type"),
    )


def _series_part_of(series: Column, anc_titles: Column) -> Column:
    """Series relations, reversed, minus those whose (dot-stripped) title
    an ancestor already uses (work_display_transformer.py:146-152)."""
    return F.filter(
        F.reverse(series),
        lambda s: ~F.coalesce(
            F.array_contains(anc_titles, _std_title(s.getField("title"))), F.lit(False)
        ),
    )


def _relation(node: Column) -> Column:
    """display/relation.py:16-24 — from a hierarchy node."""
    return F.struct(
        node.getField("id").alias("id"),
        node.getField("label").alias("title"),
        node.getField("collection_path_label").alias("reference_number"),
        node.getField("parts").alias("total_parts"),
        node.getField("work_type").alias("type"),
    )


def _series_relation(s: Column) -> Column:
    """display/relation.py:26-34 — from a series ancestor (no id)."""
    return F.struct(
        F.lit(None).cast("string").alias("id"),
        s.getField("title").alias("title"),
        F.lit(None).cast("string").alias("reference_number"),
        s.getField("num_children").cast("bigint").alias("total_parts"),
        s.getField("work_type").alias("type"),
    )


def _expanded_collection_path(path: Column, ancestors: Column) -> Column:
    """work_query_transformer.py:108-126 — stitch incomplete paths using
    ancestor collection paths: given 'C/D' and an ancestor path 'A/B/C',
    return 'A/B/C/D' (matched on the ancestor path's LAST segment)."""
    frags0 = F.split(path, "/")
    stitched = F.aggregate(
        ancestors,
        frags0,
        lambda acc, a: F.when(
            a.getField("collection_path").isNotNull()
            & (
                F.element_at(F.split(a.getField("collection_path"), "/"), -1)
                == acc[0]
            ),
            F.concat(
                F.slice(
                    F.split(a.getField("collection_path"), "/"),
                    1,
                    F.size(F.split(a.getField("collection_path"), "/")) - 1,
                ),
                acc,
            ),
        ).otherwise(acc),
    )
    return F.when(path.isNotNull(), F.concat_ws("/", stitched))


def _production_from_millis(d: Column) -> Column:
    """range.from → epoch millis with the -9999 sentinel
    (work_query_transformer.py:160-177)."""
    rf = d.getField("range_from")
    return F.when(rf == NEGATIVE_INFINITY_DATE, F.lit(NEGATIVE_INFINITY_MILLIS)).otherwise(
        F.unix_millis(F.try_to_timestamp(rf))
    )


def _agg_field(id_col: Column, label: Column) -> Column:
    """get_aggregatable (work_aggregate_transformer.py:26-32): fall back
    to the label when there is no canonical id."""
    return F.struct(
        F.coalesce(id_col, label).alias("id"), label.alias("label")
    )


# ---------------------------------------------------------------- plan cache
#
# Constructing the document builder's Column tree costs ~27k py4j
# round-trips (~10 s of driver serial time, measured in BENCH/BASELINE.md)
# while EXECUTING it costs ~0.2 s.  The tree is pure F.col expressions —
# input-DataFrame-independent — so a 15-minute incremental driver loop
# must build it once per process, not once per window.  Cache keyed by
# applicationId so a fresh JVM (new SparkContext) rebuilds rather than
# holding dead JVM refs.
_PLAN_CACHE: dict[str, tuple[dict, dict, list]] = {}
# test/bench hook: how many times the tree has actually been constructed
_PLAN_BUILDS = 0


def indexable_works(extracted: DataFrame) -> DataFrame:
    """works_transformer.py:26-48 + the three section transformers: one
    document per work.  Visible works carry the display / query /
    aggregatable / filterable structs; Redirected works carry
    ``redirect_target``; Deleted and Invisible carry type only.  Pure
    per-row expressions over the extracted rows.

    The Column tree is built once per SparkContext and re-bound to each
    input frame (see _PLAN_CACHE above): repeated windows pay only the
    three plan-application calls, not the ~27k-call tree construction."""
    key = extracted.sparkSession.sparkContext.applicationId
    if key not in _PLAN_CACHE:
        _PLAN_CACHE.clear()  # a new context invalidates old JVM column refs
        _PLAN_CACHE[key] = _build_indexable_columns()
    staged_cols, section_cols, final_cols = _PLAN_CACHE[key]
    return (
        extracted.withColumns(staged_cols)
        .withColumns(section_cols)
        .select(*final_cols)
    )


def _build_indexable_columns() -> tuple[dict, dict, list]:
    """Construct the (staged, sectioned, final-select) column trees —
    the expensive, input-independent part of indexable_works."""
    global _PLAN_BUILDS
    _PLAN_BUILDS += 1
    lm = F.col("concept_labels")
    anc = F.col("hierarchy_ancestors")
    anc_titles = F.transform(
        F.filter(anc, lambda a: a.getField("label").isNotNull()),
        lambda a: _std_title(a.getField("label")),
    )
    series = F.coalesce(
        F.col("series_ancestors"),
        _empty("struct<title:string,work_type:string,num_children:int>"),
    )
    series_kept = _series_part_of(series, anc_titles)

    # ---- staged helper columns (one projection barrier keeps the final
    # section select's expression tree shallow — the documented
    # plan-compile hygiene from plans/sierra_concepts.py)
    all_locs = F.flatten(F.transform(F.col("items"), lambda i: i.getField("locations")))
    staged_cols = {
            "_anc_titles": anc_titles,
            "_series_kept": series_kept,
            "_all_locs": all_locs,
            "_identifier_values": F.concat(
                F.array(F.col("source_value")),
                _ids_values(F.col("other_identifiers")),
            ),
            "_subj_std": F.transform(
                F.col("subjects"),
                lambda s, i: F.struct(
                    s.getField("concept_id").alias("concept_id"),
                    _std_label(s, lm).alias("std_label"),
                    s.getField("identifiers").alias("identifiers"),
                    s.getField("concept_type").alias("concept_type"),
                    s.getField("concepts").alias("concepts"),
                    i.alias("pos"),
                ),
            ),
            "_contrib_std": F.transform(
                F.col("contributors"),
                lambda c: F.struct(
                    c.getField("agent").alias("agent"),
                    _std_label(c.getField("agent"), lm).alias("std_label"),
                    c.getField("roles").alias("roles"),
                    c.getField("primary").alias("primary"),
                ),
            ),
            "_genre_first": F.transform(
                F.col("genres"),
                lambda g: F.struct(
                    g.getField("label").alias("label"),
                    F.element_at(g.getField("concepts"), 1).alias("first"),
                    _std_label(F.element_at(g.getField("concepts"), 1), lm).alias(
                        "first_std_label"
                    ),
                ),
            ),
    }

    # ------------------------------------------------------------ display
    display = F.struct(
        F.col("work_id").alias("id"),
        F.col("title").alias("title"),
        F.col("alternative_titles").alias("alternative_titles"),
        F.col("reference_number").alias("reference_number"),
        F.col("description").alias("description"),
        F.col("physical_description").alias("physical_description"),
        F.when(
            F.col("format").isNotNull(),
            F.struct(
                F.col("format.id").alias("id"),
                F.col("format.label").alias("label"),
                F.lit("Format").alias("type"),
            ),
        ).alias("work_type"),
        F.col("lettering").alias("lettering"),
        F.when(
            F.col("created_date_label").isNotNull(),
            F.struct(
                F.col("created_date_label").alias("label"), F.lit("Period").alias("type")
            ),
        ).alias("created_date"),
        # contributors: dedup on the agent's standard label (:180-193)
        F.transform(
            dedup_by_key(F.col("_contrib_std"), lambda c: c.getField("std_label")),
            lambda c: F.struct(
                _display_concept(c.getField("agent"), lm).alias("agent"),
                c.getField("roles").alias("roles"),
                c.getField("primary").alias("primary"),
            ),
        ).alias("contributors"),
        _display_identifiers(
            F.concat(
                F.array(
                    F.struct(
                        F.col("source_scheme").alias("scheme"),
                        F.col("source_value").alias("value"),
                    )
                ),
                F.col("other_identifiers"),
            )
        ).alias("identifiers"),
        # subjects: single-concept subjects dedup by standard label; a
        # COMPOSITE subject neither collides nor claims the label (:119-136)
        F.transform(
            dedup_by_key(
                F.col("_subj_std"),
                lambda s: F.when(
                    F.size(s.getField("concepts")) == 1, s.getField("std_label")
                ).otherwise(
                    F.concat(F.lit("\\x01pos\\x01"), s.getField("pos").cast("string"))
                ),
            ),
            lambda s: F.struct(
                s.getField("concept_id").alias("id"),
                s.getField("std_label").alias("label"),
                F.when(
                    F.size(_display_identifiers(s.getField("identifiers"))) > 0,
                    _display_identifiers(s.getField("identifiers")),
                ).alias("identifiers"),
                s.getField("concept_type").alias("type"),
                F.transform(
                    s.getField("concepts"), lambda c: _display_concept(c, lm)
                ).alias("concepts"),
            ),
        ).alias("subjects"),
        F.transform(
            F.col("genres"),
            lambda g: F.struct(
                g.getField("label").alias("label"),
                F.transform(
                    g.getField("concepts"), lambda c: _display_concept(c, lm)
                ).alias("concepts"),
            ),
        ).alias("genres"),
        _display_location(F.col("thumbnail")).alias("thumbnail"),
        F.transform(
            F.col("items"),
            lambda i: F.struct(
                i.getField("id").alias("id"),
                _display_identifiers(i.getField("identifiers")).alias("identifiers"),
                i.getField("title").alias("title"),
                i.getField("note").alias("note"),
                F.transform(i.getField("locations"), _display_location).alias(
                    "locations"
                ),
            ),
        ).alias("items"),
        F.transform(
            F.col("holdings"),
            lambda h: F.struct(
                h.getField("note").alias("note"),
                h.getField("enumeration").alias("enumeration"),
                _display_location(h.getField("location")).alias("location"),
            ),
        ).alias("holdings"),
        F.transform(
            F.col("availabilities"),
            lambda a: F.struct(
                a.alias("id"),
                F.try_element_at(_lit_map(AVAILABILITY_LABELS), a).alias("label"),
                F.lit("Availability").alias("type"),
            ),
        ).alias("availabilities"),
        F.transform(
            F.col("production"),
            lambda e: F.struct(
                e.getField("label").alias("label"),
                F.transform(
                    e.getField("places"),
                    lambda p: F.struct(p.alias("label"), F.lit("Place").alias("type")),
                ).alias("places"),
                F.transform(
                    e.getField("agents"),
                    lambda a: F.struct(a.alias("label"), F.lit("Agent").alias("type")),
                ).alias("agents"),
                F.transform(
                    e.getField("dates"),
                    lambda d: F.struct(
                        d.getField("label").alias("label"), F.lit("Period").alias("type")
                    ),
                ).alias("dates"),
                e.getField("function").alias("function"),
            ),
        ).alias("production"),
        F.transform(
            F.col("languages"),
            lambda lang: F.struct(
                lang.getField("id").alias("id"),
                lang.getField("label").alias("label"),
                F.lit("Language").alias("type"),
            ),
        ).alias("languages"),
        F.col("edition").alias("edition"),
        # notes: grouped by note type, first-seen group order (:66-77)
        F.aggregate(
            F.col("notes"),
            _empty(
                "struct<note_type_id:string,note_type_label:string,contents:array<string>>"
            ),
            lambda acc, n: F.when(
                F.exists(
                    acc, lambda e: e.getField("note_type_id") == n.getField("note_type_id")
                ),
                F.transform(
                    acc,
                    lambda e: F.when(
                        e.getField("note_type_id") == n.getField("note_type_id"),
                        F.struct(
                            e.getField("note_type_id").alias("note_type_id"),
                            e.getField("note_type_label").alias("note_type_label"),
                            F.concat(
                                e.getField("contents"), F.array(n.getField("contents"))
                            ).alias("contents"),
                        ),
                    ).otherwise(e),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(
                            n.getField("note_type_id").alias("note_type_id"),
                            n.getField("note_type_label").alias("note_type_label"),
                            F.array(n.getField("contents")).alias("contents"),
                        )
                    ),
                )
            ),
        ).alias("notes"),
        F.col("duration").alias("duration"),
        F.col("current_frequency").alias("current_frequency"),
        F.col("former_frequency").alias("former_frequency"),
        F.col("designation").alias("designation"),
        F.transform(
            F.col("image_data"),
            lambda i: F.struct(i.getField("id").alias("id"), F.lit("Image").alias("type")),
        ).alias("images"),
        # parts: children already in natural collection order (:155-162)
        F.transform(F.col("hierarchy_children"), _relation).alias("parts"),
        # partOf: kept series relations first, then graph ancestors (:141-153)
        F.concat(
            F.transform(F.col("_series_kept"), _series_relation),
            F.transform(anc, _relation),
        ).alias("part_of"),
        # works_transformer dispatch renders 'Standard' as 'Work' (work.py:55-59)
        F.when(F.col("work_type") == "Standard", F.lit("Work"))
        .otherwise(F.col("work_type"))
        .alias("type"),
    )

    # -------------------------------------------------------------- query
    all_concept_labels = lambda concepts: F.transform(  # noqa: E731
        concepts, lambda c: _std_label(c, lm)
    )
    query = F.struct(
        F.col("work_id").alias("id"),
        F.col("title").alias("title"),
        F.col("reference_number").alias("reference_number"),
        F.col("physical_description").alias("physical_description"),
        F.col("lettering").alias("lettering"),
        F.col("edition").alias("edition"),
        F.col("description").alias("description"),
        F.col("alternative_titles").alias("alternative_titles"),
        F.transform(F.col("languages"), lambda x: x.getField("label")).alias(
            "languages_label"
        ),
        F.col("source_value").alias("source_identifier_value"),
        # canonical id + source identifier + other identifiers (:36-41)
        F.concat(F.array(F.col("work_id")), F.col("_identifier_values")).alias(
            "identifiers_value"
        ),
        F.transform(F.col("image_data"), lambda i: i.getField("id")).alias("images_id"),
        F.flatten(
            F.transform(F.col("image_data"), lambda i: _ids_values(i.getField("identifiers")))
        ).alias("images_identifiers_value"),
        F.flatten(
            F.transform(F.col("items"), lambda i: _ids_values(i.getField("identifiers")))
        ).alias("items_identifiers_value"),
        F.filter(
            F.transform(F.col("items"), lambda i: i.getField("id")),
            lambda x: x.isNotNull(),
        ).alias("items_id"),
        F.filter(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda i: F.transform(
                        F.filter(
                            i.getField("locations"),
                            lambda loc: loc.getField("kind") == "physical",
                        ),
                        lambda loc: loc.getField("shelfmark"),
                    ),
                )
            ),
            lambda x: x.isNotNull(),
        ).alias("items_shelfmarks_value"),
        F.transform(F.col("notes"), lambda n: n.getField("contents")).alias(
            "notes_contents"
        ),
        # series titles (document order) then ancestors root-first (:72-80)
        F.concat(
            F.transform(F.reverse(F.col("_series_kept")), lambda s: s.getField("title")),
            F.filter(
                F.transform(F.reverse(anc), lambda a: a.getField("label")),
                lambda x: x.isNotNull(),
            ),
        ).alias("part_of_title"),
        F.flatten(
            F.transform(
                F.col("production"),
                lambda e: F.concat(
                    e.getField("places"),
                    e.getField("agents"),
                    F.transform(e.getField("dates"), lambda d: d.getField("label")),
                ),
            )
        ).alias("production_label"),
        unique_preserving(
            F.flatten(
                F.transform(
                    F.col("subjects"),
                    lambda s: all_concept_labels(s.getField("concepts")),
                )
            )
        ).alias("subjects_concepts_label"),
        unique_preserving(
            F.transform(F.col("_contrib_std"), lambda c: c.getField("std_label"))
        ).alias("contributors_agent_label"),
        unique_preserving(
            F.flatten(
                F.transform(
                    F.col("genres"), lambda g: all_concept_labels(g.getField("concepts"))
                )
            )
        ).alias("genres_concepts_label"),
        F.col("collection_path.label").alias("collection_path_label"),
        _expanded_collection_path(F.col("collection_path.path"), anc).alias(
            "collection_path_path"
        ),
    )

    # --------------------------------------------------------- filterable
    filterable = F.struct(
        F.col("format.id").alias("format_id"),
        F.col("work_type").alias("work_type"),
        F.filter(
            F.flatten(
                F.transform(
                    F.col("production"),
                    lambda e: F.transform(
                        F.filter(
                            e.getField("dates"),
                            lambda d: d.getField("range_from").isNotNull(),
                        ),
                        _production_from_millis,
                    ),
                )
            ),
            lambda x: x.isNotNull(),
        ).alias("production_dates_range_from"),
        F.transform(F.col("languages"), lambda x: x.getField("id")).alias("languages_id"),
        F.transform(F.col("_genre_first"), lambda g: g.getField("first_std_label")).alias(
            "genres_label"
        ),
        F.filter(
            F.transform(
                F.col("_genre_first"),
                lambda g: g.getField("first").getField("concept_id"),
            ),
            lambda x: x.isNotNull(),
        ).alias("genres_concepts_id"),
        F.flatten(
            F.transform(
                F.col("_genre_first"),
                lambda g: _ids_values(g.getField("first").getField("identifiers")),
            )
        ).alias("genres_concepts_source_identifier"),
        unique_preserving(
            F.transform(F.col("_subj_std"), lambda s: s.getField("std_label"))
        ).alias("subjects_label"),
        F.filter(
            F.transform(F.col("subjects"), lambda s: s.getField("concept_id")),
            lambda x: x.isNotNull(),
        ).alias("subjects_concepts_id"),
        F.flatten(
            F.transform(F.col("subjects"), lambda s: _ids_values(s.getField("identifiers")))
        ).alias("subjects_concepts_source_identifier"),
        unique_preserving(
            F.transform(F.col("_contrib_std"), lambda c: c.getField("std_label"))
        ).alias("contributors_agent_label"),
        F.filter(
            F.transform(
                F.col("contributors"),
                lambda c: c.getField("agent").getField("concept_id"),
            ),
            lambda x: x.isNotNull(),
        ).alias("contributors_agent_id"),
        F.flatten(
            F.transform(
                F.col("contributors"),
                lambda c: _ids_values(c.getField("agent").getField("identifiers")),
            )
        ).alias("contributors_agent_source_identifier"),
        F.concat(F.array(F.col("work_id")), F.col("_identifier_values")).alias(
            "identifiers_value"
        ),
        F.filter(
            F.transform(F.col("_all_locs"), lambda loc: loc.getField("license_id")),
            lambda x: x.isNotNull(),
        ).alias("items_locations_license_id"),
        F.filter(
            F.transform(
                F.col("_all_locs"),
                lambda loc: F.try_element_at(
                    _lit_map(ACCESS_STATUS_IDS), loc.getField("access_status")
                ),
            ),
            lambda x: x.isNotNull(),
        ).alias("items_locations_access_conditions_status_id"),
        F.filter(
            F.transform(F.col("items"), lambda i: i.getField("id")),
            lambda x: x.isNotNull(),
        ).alias("items_id"),
        F.flatten(
            F.transform(F.col("items"), lambda i: _ids_values(i.getField("identifiers")))
        ).alias("items_identifiers_value"),
        F.transform(F.col("_all_locs"), lambda loc: loc.getField("location_type_id")).alias(
            "items_locations_location_type_id"
        ),
        F.filter(
            F.transform(
                F.filter(F.col("_all_locs"), lambda loc: loc.getField("kind") == "digital"),
                lambda loc: loc.getField("created_date"),
            ),
            lambda x: x.isNotNull(),
        ).alias("items_locations_created_date"),
        F.transform(F.reverse(anc), lambda a: a.getField("id")).alias("part_of_id"),
        F.concat(
            F.transform(F.reverse(F.col("_series_kept")), lambda s: s.getField("title")),
            F.filter(
                F.transform(F.reverse(anc), lambda a: a.getField("label")),
                lambda x: x.isNotNull(),
            ),
        ).alias("part_of_title"),
        F.col("availabilities").alias("availabilities_id"),
    )

    # -------------------------------------------------------- aggregatable
    lang_map = _lit_map(MARC_LANGUAGE_NAMES)
    agg_t = "struct<id:string,label:string>"
    aggregatable = F.struct(
        F.when(
            F.col("format").isNotNull(),
            F.array(
                F.struct(F.col("format.id").alias("id"), F.col("format.label").alias("label"))
            ),
        )
        .otherwise(_empty(agg_t))
        .alias("work_type"),
        dedup_by_key(
            F.transform(
                F.col("_genre_first"),
                lambda g: _agg_field(
                    g.getField("first").getField("concept_id"),
                    g.getField("first_std_label"),
                ),
            ),
            lambda x: x.getField("label"),
        ).alias("genres"),
        dedup_by_key(
            F.transform(
                F.col("_subj_std"),
                lambda s: _agg_field(s.getField("concept_id"), s.getField("std_label")),
            ),
            lambda x: x.getField("label"),
        ).alias("subjects"),
        F.transform(
            F.col("languages"),
            lambda lang: F.struct(
                lang.getField("id").alias("id"),
                F.coalesce(
                    F.try_element_at(lang_map, lang.getField("id")),
                    lang.getField("label"),
                ).alias("label"),
            ),
        ).alias("languages"),
        # from-year, leading zeros stripped (the reference RAISES on a
        # from_time with no leading int; the engine drops the date)
        F.transform(
            F.col("production"),
            lambda e: F.transform(
                F.filter(
                    e.getField("dates"),
                    lambda d: F.regexp_extract(
                        F.coalesce(d.getField("range_from"), F.lit("")), "^-?\\d+", 0
                    )
                    != "",
                ),
                lambda d: F.struct(
                    F.regexp_extract(d.getField("range_from"), "^-?\\d+", 0)
                    .cast("bigint")
                    .cast("string")
                    .alias("id"),
                    F.regexp_extract(d.getField("range_from"), "^-?\\d+", 0)
                    .cast("bigint")
                    .cast("string")
                    .alias("label"),
                ),
            ),
        ).alias("_prod_nested"),
        dedup_by_key(
            F.transform(
                F.col("_contrib_std"),
                lambda c: _agg_field(
                    c.getField("agent").getField("concept_id"), c.getField("std_label")
                ),
            ),
            lambda x: x.getField("label"),
        ).alias("contributors"),
        dedup_by_key(
            F.transform(
                F.filter(
                    F.col("_all_locs"), lambda loc: loc.getField("license_id").isNotNull()
                ),
                lambda loc: F.struct(
                    loc.getField("license_id").alias("id"),
                    F.try_element_at(
                        _lit_map(LICENSE_LABELS), loc.getField("license_id")
                    ).alias("label"),
                ),
            ),
            lambda x: x.getField("label"),
        ).alias("item_licenses"),
        F.transform(
            F.col("availabilities"),
            lambda a: F.struct(
                a.alias("id"),
                F.try_element_at(_lit_map(AVAILABILITY_LABELS), a).alias("label"),
            ),
        ).alias("availabilities"),
    )

    section_cols = {
        "_display": display,
        "_query": query,
        "_aggregatable": aggregatable,
        "_filterable": filterable,
    }
    # production_dates needs the flatten of a nested transform; finish it
    # outside the struct literal to keep the tree shallow
    vis = F.col("type") == "Visible"
    final_cols = [
        F.col("work_id"),
        F.col("type"),
        F.when(vis, F.col("_display")).alias("display"),
        F.when(vis, F.col("_query")).alias("query"),
        F.when(
            vis,
            F.col("_aggregatable").withField(
                "production_dates",
                F.flatten(F.col("_aggregatable").getField("_prod_nested")),
            ).dropFields("_prod_nested"),
        ).alias("aggregatable"),
        F.when(vis, F.col("_filterable")).alias("filterable"),
        F.when(F.col("type") == "Redirected", F.col("redirect_target")).alias(
            "redirect_target"
        ),
    ]
    return staged_cols, section_cols, final_cols


def works_for_ingest(spark, rows, schema: str = WORK_SCHEMA):
    """Test/driver helper: build a works DataFrame with the full nested
    schema from plain python rows (dicts matching WORK_SCHEMA)."""
    return spark.createDataFrame(rows, schema)
