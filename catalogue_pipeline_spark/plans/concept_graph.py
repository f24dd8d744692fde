"""Concept-graph ingestor queries: bounded SAME_AS closures, source-concept
expansion, concept types and the related-source-concepts traversal.

The reference's concepts ingestor enriches every Wellcome concept from a
Neptune property graph with openCypher
(catalogue_graph/src/ingestor/queries/concept_queries.py):

* ``SOURCE_CONCEPT_QUERY``  — concept -[:HAS_SOURCE_CONCEPT]-> linked
  source -[:SAME_AS*0..8]-> source (the hop bound is deliberate: unbounded
  traversal explodes in dense clusters, 8 is lossless with headroom —
  concept_queries.py:18-31).
* ``SAME_AS_CONCEPT_QUERY`` — concepts sharing any source concept
  (:33-45).
* ``CONCEPT_TYPE_QUERY``    — distinct referenced types over incoming
  HAS_CONCEPT edges (:9-16).
* ``get_related_query``     — typed relationship edges between SOURCE
  concepts (RELATED_TO / HAS_FIELD_OF_WORK / NARROWER_THAN|HAS_PARENT /
  HAS_FOUNDER, either direction) mapped back to Wellcome concepts and
  ranked by how many works reference them (:48-105).

Spark-first re-expression: the graph lives in three edge DataFrames —
``has_source(concept_id, source_id)``, ``same_as(src, dst)``,
``rel_edges(src, dst, relationship_type)`` — plus the
``has_concept(work_id, concept_id, referenced_type, field)`` table the
concepts extractor already produces (plans/concepts.py).  Bounded closure
is iterated hash-join DOUBLING (k joins give 2^k hops, so the 0..8 bound
costs 3 self-joins), every step an equi-join Catalyst plans as a shuffled
hash join on the concept id; nothing is ever collected to the driver, and
the per-concept result lists are bounded by the reference's own
``related_to_limit``.

Scale shape: closure doubling squares the edge set only within SAME_AS
clusters (small by construction — the reference bounds them at 5 real
hops); the work-count aggregate is a map-side-combining groupBy on
concept id.  Skewed super-concepts are capped upstream by
``related_concepts``' deterministic per-concept work cap, the same guard
the reference's Cypher applies with ``LIMIT 1000``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bounded_closure(edges: DataFrame, max_hops: int) -> DataFrame:
    """Reachability pairs (src, dst) along 0..max_hops directed edges —
    the relational SAME_AS*0..N.  ``max_hops`` must be a power of two
    (doubling: closure_k ∘ closure_k = closure_2k); the identity (0-hop)
    pairs cover both endpoints of every edge."""
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError("max_hops must be a power of two")
    nodes = (
        edges.select(F.col("src").alias("n"))
        .unionByName(edges.select(F.col("dst").alias("n")))
        .distinct()
    )
    r = (
        nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        .unionByName(edges.select("src", "dst"))
        .distinct()
    )
    steps = max_hops.bit_length() - 1  # 2^steps == max_hops
    for _ in range(steps):
        hop2 = (
            r.alias("a")
            .join(r.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
        )
        r = r.unionByName(hop2).distinct()
    return r


def source_concepts(
    has_source: DataFrame,
    same_as: DataFrame,
    max_hops: int = 8,
    ignored: list[str] | None = None,
) -> DataFrame:
    """SOURCE_CONCEPT_QUERY rows: (concept_id, linked_source_id,
    source_id) — every source reachable from the concept's linked source
    within the hop bound; ``ignored`` drops denylisted source ids (the
    Wikidata ignore list parameter)."""
    cl = bounded_closure(same_as, max_hops)
    out = (
        has_source.withColumnRenamed("source_id", "linked_source_id")
        .join(cl, F.col("linked_source_id") == cl.src, "left")
        .select(
            "concept_id",
            "linked_source_id",
            F.coalesce(cl.dst, F.col("linked_source_id")).alias("source_id"),
        )
        .distinct()
    )
    if ignored:
        out = out.filter(~F.col("source_id").isin(*ignored))
    return out


def same_as_concept_ids(
    has_source: DataFrame, same_as: DataFrame, max_hops: int = 8
) -> DataFrame:
    """SAME_AS_CONCEPT_QUERY rows: (concept_id, same_as_concept_id) —
    other concepts whose linked source lies in this concept's source
    closure (source <-[:HAS_SOURCE_CONCEPT]- other, other ≠ concept)."""
    srcs = source_concepts(has_source, same_as, max_hops)
    other = has_source.select(
        F.col("source_id").alias("source_id"),
        F.col("concept_id").alias("same_as_concept_id"),
    )
    return (
        srcs.join(other, "source_id")
        .filter(F.col("same_as_concept_id") != F.col("concept_id"))
        .select("concept_id", "same_as_concept_id")
        .distinct()
    )


def concept_types(has_concept: DataFrame) -> DataFrame:
    """CONCEPT_TYPE_QUERY rows: (concept_id, types) — sorted distinct
    referenced types over incoming HAS_CONCEPT edges."""
    return has_concept.groupBy("concept_id").agg(
        F.array_sort(F.collect_set("referenced_type")).alias("types")
    )


def related_source_concepts(
    has_source: DataFrame,
    same_as: DataFrame,
    rel_edges: DataFrame,
    has_concept: DataFrame,
    *,
    edge_types: list[str],
    direction: str = "from",
    max_hops: int = 2,
    limit: int = 10,
    ignored: list[str] | None = None,
    require_works: bool = False,
) -> DataFrame:
    """``get_related_query`` re-expression → (concept_id, related_id,
    relationship_type, work_count, rank).

    ``require_works=True`` is the reference's exact join shape — the Cypher
    MATCHes ``(related_concept)<-[:HAS_CONCEPT]-(work)`` non-optionally, so
    work-less related concepts never surface (they are removed from the
    index and would 404).  The default keeps them at weight 0 (the q62
    family's established contract).

    Pipeline, mirroring the Cypher stage for stage
    (concept_queries.py:48-105):

    1. concept → linked source → SAME_AS*0..2 source closure (``ignored``
       filtered at every closure step, as in the Cypher WHERE clauses);
    2. relationship edges of the requested types leave (direction='from')
       or enter (direction='to') any closure member;
    3. targets lying in the *linked* source's own closure are excluded
       (the NOT SAME_AS guard — a source's aliases are not "related");
    4. the target's closure maps back to Wellcome concepts via reversed
       HAS_SOURCE_CONCEPT, each weighted by its incoming HAS_CONCEPT work
       count;
    5. per (concept, relationship_type, target): the lexicographic-min
       related concept id (the Cypher ``head(collect(...))`` made
       deterministic) and the summed work count; ranked per concept by
       work count descending, id ascending (pinned tie order), capped at
       ``related_to_limit``.
    """
    cl = bounded_closure(same_as, max_hops)
    base = source_concepts(has_source, same_as, max_hops, ignored)

    if direction == "from":
        rels = rel_edges.select(
            F.col("src").alias("source_id"),
            F.col("dst").alias("linked_related_id"),
            "relationship_type",
        )
    else:
        rels = rel_edges.select(
            F.col("dst").alias("source_id"),
            F.col("src").alias("linked_related_id"),
            "relationship_type",
        )
    rels = rels.filter(F.col("relationship_type").isin(*edge_types))
    if ignored:
        rels = rels.filter(~F.col("linked_related_id").isin(*ignored))

    hits = base.join(rels, "source_id").select(
        "concept_id", "linked_source_id", "linked_related_id", "relationship_type"
    )
    # NOT (linked_source)-[:SAME_AS*0..2]->(linked_related)
    own = cl.select(
        F.col("src").alias("linked_source_id"),
        F.col("dst").alias("linked_related_id"),
    )
    hits = hits.join(
        own, ["linked_source_id", "linked_related_id"], "left_anti"
    ).select("concept_id", "linked_related_id", "relationship_type").distinct()

    # target closure → related concepts → work counts (fresh aliases: the
    # closure table joins twice, Spark needs disambiguated lineage)
    cl2 = cl.select(F.col("src").alias("_tsrc"), F.col("dst").alias("_tdst"))
    rcl = (
        hits.join(cl2, hits.linked_related_id == cl2._tsrc, "left")
        .select(
            "concept_id",
            "linked_related_id",
            "relationship_type",
            F.coalesce(F.col("_tdst"), F.col("linked_related_id")).alias(
                "related_source_id"
            ),
        )
        .distinct()
    )
    if ignored:
        rcl = rcl.filter(~F.col("related_source_id").isin(*ignored))
    back = has_source.select(
        F.col("source_id").alias("related_source_id"),
        F.col("concept_id").alias("related_concept_id"),
    )
    counts = has_concept.groupBy(F.col("concept_id").alias("related_concept_id")).agg(
        F.count(F.lit(1)).alias("n_works")
    )
    joined = (
        rcl.join(back, "related_source_id")
        .join(counts, "related_concept_id", "left")
        .withColumn("n_works", F.coalesce("n_works", F.lit(0)))
    )
    if require_works:
        joined = joined.filter(F.col("n_works") >= 1)
    per_target = joined.groupBy(
        "concept_id", "relationship_type", "linked_related_id"
    ).agg(
        F.min("related_concept_id").alias("related_id"),
        F.sum("n_works").alias("work_count"),
    )
    per_related = per_target.groupBy(
        "concept_id", "relationship_type", "related_id"
    ).agg(F.sum("work_count").alias("work_count"))
    w = Window.partitionBy("concept_id").orderBy(
        F.col("work_count").desc(), F.col("related_id").asc()
    )
    return (
        per_related.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .select("concept_id", "related_id", "relationship_type", "work_count", "rank")
    )


# ------------------------------------------------- indexable documents

# ingestor/transformers/raw_concept.py:17-34 — source priority for the
# query label vs the display label (Wikidata over LC-Names for display)
QUERY_SOURCE_PRIORITY = ["nlm-mesh", "lc-subjects", "lc-names", "wikidata", "label-derived"]
DISPLAY_SOURCE_PRIORITY = [
    "weco-authority", "nlm-mesh", "lc-subjects", "wikidata", "lc-names", "label-derived",
]
# raw_concept.py:103-120 — most-specific concept-type election order
CONCEPT_TYPE_PRIORITY = [
    "Genre", "Place", "Person", "Organisation", "Period", "Meeting",
    "Agent", "Subject", "Concept",
]


def standardise_label_expr(label):
    """raw_concept.py:41-48 — capitalise + LoC '--' → ' - '."""
    cap = F.concat(F.upper(F.substring(label, 1, 1)), F.substr(label, F.lit(2)))
    return F.replace(cap, F.lit("--"), F.lit(" - "))


def _priority_pick(label_map, fallback, priority):
    """First non-null label walking the source-priority list; sources not
    in the map fall through; 'label-derived' resolves to the concept's own
    label (raw_concept.py:65-87)."""
    arms = []
    for src in priority:
        arms.append(
            fallback if src == "label-derived" else F.try_element_at(label_map, F.lit(src))
        )
    return F.coalesce(*arms)


def most_specific_type_expr(types):
    """raw_concept.py:90-120 — empty → 'Concept', else the highest-priority
    member of the type list."""
    return F.coalesce(
        *[
            F.when(F.array_contains(types, t), F.lit(t))
            for t in CONCEPT_TYPE_PRIORITY
        ],
        F.lit("Concept"),
    )


def indexable_concepts(
    concepts: DataFrame,
    has_source: DataFrame,
    same_as: DataFrame,
    has_concept: DataFrame,
    source_nodes: DataFrame,
    max_hops: int = 8,
) -> DataFrame:
    """The concepts-ingestor document builder
    (ingestor/transformers/concepts_transformer.py +
    transformers/raw_concept.py): one display-ready row per concept —

      * ``label`` / ``display_label`` — priority-elected across the
        concept's source-concept closure (standardised labels) with the
        label-derived fallback;
      * ``concept_type`` — most-specific election over the referenced
        types of incoming HAS_CONCEPT edges;
      * ``identifiers`` — the DIRECTLY linked source concepts as
        ``source:id`` pairs (closure members beyond the first hop are
        query material, not identifiers);
      * ``same_as`` — concepts sharing a source concept.

    concepts(concept_id, label); source_nodes(id, label, source) from
    plans/source_concepts.py transformers.  Every stage is a concept-keyed
    join + groupBy; the closure is the bounded SAME_AS doubling above.
    """
    srcs = source_concepts(has_source, same_as, max_hops)
    sn = source_nodes.select(
        F.col("id").alias("source_id"),
        standardise_label_expr(F.col("label")).alias("_slabel"),
        F.col("source").alias("_source"),
    )
    # one label per (concept, source): deterministic min, then a map —
    # the reference's dict assignment keeps an arbitrary last-writer
    label_maps = (
        srcs.join(sn, "source_id")
        .groupBy("concept_id", "_source")
        .agg(F.min("_slabel").alias("_slabel"))
        .groupBy("concept_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_source"), F.col("_slabel")))
            ).alias("_labels")
        )
    )
    ids = (
        has_source.select("concept_id", "source_id")
        .join(sn, "source_id")
        .groupBy("concept_id")
        .agg(
            F.array_sort(
                F.collect_set(F.concat_ws(":", "_source", "source_id"))
            ).alias("identifiers")
        )
    )
    sa = same_as_concept_ids(has_source, same_as, max_hops).groupBy(
        "concept_id"
    ).agg(F.array_sort(F.collect_set("same_as_concept_id")).alias("same_as"))
    types = concept_types(has_concept)

    out = (
        concepts.join(label_maps, "concept_id", "left")
        .join(ids, "concept_id", "left")
        .join(sa, "concept_id", "left")
        .join(types, "concept_id", "left")
    )
    empty = F.array().cast("array<string>")
    own = F.col("label")
    return out.select(
        "concept_id",
        _priority_pick(F.col("_labels"), own, QUERY_SOURCE_PRIORITY).alias("label"),
        _priority_pick(F.col("_labels"), own, DISPLAY_SOURCE_PRIORITY).alias(
            "display_label"
        ),
        most_specific_type_expr(
            F.coalesce(F.col("types"), empty)
        ).alias("concept_type"),
        F.coalesce(F.col("identifiers"), empty).alias("identifiers"),
        F.coalesce(F.col("same_as"), empty).alias("same_as"),
    )


def concept_primary_ids(
    has_source: DataFrame, same_as: DataFrame, max_hops: int = 8
) -> DataFrame:
    """(concept_id, primary_id) — the alphabetical-min member of each
    concept's same-as group, the reference's ``primary_map``
    (base_concepts_extractor.py:118-128: 'Alphabetical ID-based
    prioritisation').  Concepts without same-as rows are their own primary
    (callers coalesce on the left join)."""
    sa = same_as_concept_ids(has_source, same_as, max_hops)
    return sa.groupBy("concept_id").agg(
        F.least(F.col("concept_id"), F.min("same_as_concept_id")).alias("primary_id")
    )


def merged_related_concepts(
    related: DataFrame,
    primary: DataFrame,
    work_connected: DataFrame,
    limit: int = 10,
) -> DataFrame:
    """The related-concepts merge layer (_get_related_concepts,
    base_concepts_extractor.py:134-210): per query key the raw per-concept
    results are re-keyed to same-as PRIMARY ids on both sides, self-related
    groups dropped, counts summed and relationship types unioned across the
    group; then each merged target elects a referable id — the primary when
    it has works, else the alphabetically-first work-connected group member
    (the raw referenced ids are always safe fallbacks because the source
    query only returns concepts with works) — and the per-primary list is
    re-ranked by summed count and re-capped at ``related_to_limit``.

    ``related``: (concept_id, related_id, relationship_type nullable,
    work_count).  ``primary``: concept_primary_ids output.
    ``work_connected``: one column ``concept_id`` — concepts with >= 1
    HAS_CONCEPT edge (the reference probes this with CONCEPT_TYPE_QUERY,
    :129-133).  Deterministic where the reference is dict-ordered: the
    relationship type is the sorted-first of the union, ties in the final
    rank break on target id."""
    p1 = primary.select("concept_id", F.col("primary_id").alias("_p1"))
    p2 = primary.select(
        F.col("concept_id").alias("related_id"), F.col("primary_id").alias("_p2")
    )
    r = (
        related.join(p1, "concept_id", "left")
        .withColumn("_p1", F.coalesce("_p1", F.col("concept_id")))
        .join(p2, "related_id", "left")
        .withColumn("_p2", F.coalesce("_p2", F.col("related_id")))
        .filter(F.col("_p1") != F.col("_p2"))
    )
    merged = r.groupBy(
        F.col("_p1").alias("primary_id"), F.col("_p2").alias("primary_related_id")
    ).agg(
        F.sum("work_count").alias("work_count"),
        F.array_sort(F.collect_set("relationship_type")).alias("_rtypes"),
        F.array_sort(F.collect_set("related_id")).alias("_referenced_ids"),
    )
    # work-connected members of each target's same-as group
    members = (
        primary.select("primary_id", F.col("concept_id").alias("_member"))
        .unionByName(
            primary.select("primary_id", F.col("primary_id").alias("_member"))
        )
        .distinct()
        .join(
            work_connected.select(F.col("concept_id").alias("_member")),
            "_member",
        )
        .groupBy(F.col("primary_id").alias("primary_related_id"))
        .agg(
            F.min("_member").alias("_min_wc"),
            F.max(F.col("_member") == F.col("primary_id")).alias("_primary_wc"),
        )
    )
    merged = merged.join(members, "primary_related_id", "left")
    primary_ok = F.coalesce(F.col("_primary_wc"), F.lit(False)) | F.array_contains(
        F.col("_referenced_ids"), F.col("primary_related_id")
    )
    target = F.when(primary_ok, F.col("primary_related_id")).otherwise(
        F.least(F.col("_min_wc"), F.array_min("_referenced_ids"))
    )
    merged = merged.withColumn("_target", target)
    w = Window.partitionBy("primary_id").orderBy(
        F.col("work_count").desc(), F.col("_target").asc()
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .select(
            "primary_id",
            F.col("_target").alias("related_id"),
            F.try_element_at(F.col("_rtypes"), F.lit(1)).alias("relationship_type"),
            "work_count",
            "rank",
        )
    )


# The eight concept-document sections and their queries
# (concept_queries.py:184-210 + the ConceptRelatedQuery literal).
TYPED_SECTION_SPECS = {
    "related_to": {"edge_types": ["RELATED_TO"], "direction": "from"},
    "fields_of_work": {"edge_types": ["HAS_FIELD_OF_WORK"], "direction": "from"},
    "narrower_than": {"edge_types": ["NARROWER_THAN"], "direction": "from"},
    "broader_than": {"edge_types": ["NARROWER_THAN", "HAS_PARENT"], "direction": "to"},
    "people": {"edge_types": ["HAS_FIELD_OF_WORK"], "direction": "to"},
    "founded_by": {"edge_types": ["HAS_FOUNDER"], "direction": "from"},
}
TOGETHER_SECTION_SPECS = {
    "frequent_collaborators": {
        "source_types": ["Person", "Organisation"],
        "related_types": ["Person", "Organisation"],
        "source_fields": ["contributors"],
        "related_fields": ["contributors"],
    },
    "related_topics": {
        "related_types": ["Concept", "Subject", "Place", "Meeting", "Period", "Genre"],
        "related_fields": ["subjects"],
    },
}


def related_concepts_sections(
    concepts: DataFrame,
    has_source: DataFrame,
    same_as: DataFrame,
    rel_edges: DataFrame,
    has_concept: DataFrame,
    source_nodes: DataFrame,
    *,
    max_hops: int = 8,
    related_hops: int = 2,
    ignored: list[str] | None = None,
    limit: int = 10,
    threshold: int = 3,
    work_cap: int = 1000,
) -> DataFrame:
    """The full relatedConcepts display block of an indexable concept
    (concepts_transformer.py:37-106 + the extractor merge): one row per
    (concept, section, rank) — six typed-edge sections + two
    referenced-together sections, merged across same-as groups, target-id
    elected among work-connected members, and joined display-ready with the
    target's priority-elected label and most-specific shared type; entries
    whose target has no label are dropped (MissingLabelError → skip,
    concepts_transformer.py:47-49).

    Every concept in a same-as group carries its PRIMARY's merged list
    (extract_raw keys the lookup by primary, concepts_index_extractor
    .py:66-76)."""
    from .concepts import related_concepts as referenced_together

    primary = concept_primary_ids(has_source, same_as, max_hops)
    wc = has_concept.select("concept_id").distinct()

    parts = []
    for section, spec in TYPED_SECTION_SPECS.items():
        raw = related_source_concepts(
            has_source,
            same_as,
            rel_edges,
            has_concept,
            edge_types=spec["edge_types"],
            direction=spec["direction"],
            max_hops=related_hops,
            limit=limit,
            ignored=ignored,
            require_works=True,
        ).select("concept_id", "related_id", "relationship_type", "work_count")
        parts.append((section, raw))
    for section, spec in TOGETHER_SECTION_SPECS.items():
        raw = referenced_together(
            has_concept.select("work_id", "concept_id", "field", "referenced_type"),
            source_fields=spec.get("source_fields"),
            related_fields=spec.get("related_fields"),
            source_types=spec.get("source_types"),
            related_types=spec.get("related_types"),
            threshold=threshold,
            limit=limit,
            max_works_per_concept=work_cap,
        ).select(
            "concept_id",
            "related_id",
            F.lit(None).cast("string").alias("relationship_type"),
            F.col("shared_works").alias("work_count"),
        )
        parts.append((section, raw))

    merged_parts = []
    for section, raw in parts:
        merged_parts.append(
            merged_related_concepts(raw, primary, wc, limit).select(
                F.lit(section).alias("section"),
                "primary_id",
                "related_id",
                "relationship_type",
                "work_count",
                "rank",
            )
        )
    long = merged_parts[0]
    for p in merged_parts[1:]:
        long = long.unionByName(p)

    # fan the primary-keyed lists back out to every group member
    member_of = (
        primary.select(F.col("concept_id").alias("doc_concept_id"), "primary_id")
        .unionByName(
            concepts.join(primary, "concept_id", "left_anti").select(
                F.col("concept_id").alias("doc_concept_id"),
                F.col("concept_id").alias("primary_id"),
            )
        )
    )
    long = long.join(member_of, "primary_id").select(
        F.col("doc_concept_id").alias("concept_id"),
        "section",
        "rank",
        "related_id",
        "relationship_type",
        "work_count",
    )

    # display-ready target cards: elected label + most-specific shared type
    cards = indexable_concepts(
        concepts, has_source, same_as, has_concept, source_nodes, max_hops
    ).select(
        F.col("concept_id").alias("related_id"),
        F.col("display_label").alias("label"),
        F.col("concept_type").alias("concept_type"),
    )
    return (
        long.join(cards, "related_id")
        .filter(F.col("label").isNotNull())  # MissingLabelError → drop entry
        .select(
            "concept_id",
            "section",
            "rank",
            "related_id",
            "relationship_type",
            "concept_type",
            "label",
            "work_count",
        )
    )


def inconsistent_concept_types(
    concepts: DataFrame, has_concept: DataFrame
) -> DataFrame:
    """The graph data-quality check (graph/data_validation/
    concept_types.py:21-60): a concept's combination of HAS_CONCEPT
    referenced types is consistent when — after dropping the
    always-compatible 'Concept' and 'Subject' — at most one type remains,
    or the remainder is exactly {Agent, Organisation} or {Agent, Person}.
    Returns the inconsistent rows (concept_id, concept_label,
    concept_types '||'-joined, SORTED for determinism where the
    reference keeps graph-return order).  One groupBy + one join — no
    paging loop; the reference's SKIP/LIMIT scan is the shuffle."""
    types = has_concept.groupBy("concept_id").agg(
        F.array_sort(F.collect_set("referenced_type")).alias("_types")
    )
    rest = F.array_except(F.col("_types"), F.array(F.lit("Concept"), F.lit("Subject")))
    ok = (
        (F.size(rest) <= 1)
        | (rest == F.array(F.lit("Agent"), F.lit("Organisation")))
        | (rest == F.array(F.lit("Agent"), F.lit("Person")))
    )
    return (
        concepts.join(types, "concept_id", "left")
        .withColumn(
            "_types",
            F.coalesce(F.col("_types"), F.array().cast("array<string>")),
        )
        .filter(~ok)
        .select(
            "concept_id",
            F.col("label").alias("concept_label"),
            F.array_join("_types", "||").alias("concept_types"),
        )
    )
