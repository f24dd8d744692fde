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
) -> DataFrame:
    """``get_related_query`` re-expression → (concept_id, related_id,
    relationship_type, work_count, rank).

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
