"""Concepts-index relatedConcepts sections: the same-as merge layer,
work-connected target election, referenced-together type filters and the
eight-section display assembly — mirrored from
base_concepts_extractor.py:118-210 (_update_same_as_map /
_get_related_concepts / _choose_target_id), concept_queries.py:184-210
(section specs) and concepts_transformer.py:37-106 (display entries with
the missing-label drop)."""

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.concept_graph import (
    concept_primary_ids,
    merged_related_concepts,
    related_concepts_sections,
)

HC_SCHEMA = "work_id string, concept_id string, referenced_type string, field string"


def frames(spark):
    concepts = spark.createDataFrame(
        [("c1", "florence"), ("c2", "florence dupe"), ("c3", None), ("c9", "art"),
         ("c4", "paris"), ("c7", None)],
        "concept_id string, label string",
    )
    has_source = spark.createDataFrame(
        [("c1", "s1"), ("c2", "s2"), ("c3", "s3"), ("c9", "s9"),
         ("c4", "s4"), ("c7", "s7")],
        "concept_id string, source_id string",
    )
    same_as = spark.createDataFrame(
        [("s1", "s2"), ("s2", "s1"), ("s3", "s9"), ("s9", "s3")],
        "src string, dst string",
    )
    rel_edges = spark.createDataFrame(
        [("s1", "s4", "RELATED_TO"), ("s2", "s4", "RELATED_TO"),
         ("s1", "s3", "RELATED_TO"),     # → workless primary c3, elected c9
         ("s1", "s2", "RELATED_TO"),     # own-closure: excluded
         ("s4", "s7", "RELATED_TO"),     # → label-less c7: entry dropped
         ("s4", "s1", "NARROWER_THAN")],
        "src string, dst string, relationship_type string",
    )
    rows = []
    for w in ("w1", "w2", "w3"):
        rows += [(w, "c1", "Person", "contributors"),
                 (w, "c4", "Person", "contributors"),
                 (w, "c4", "Place", "subjects"),
                 (w, "c9", "Concept", "subjects")]
    rows += [("w4", "c2", "Organisation", "contributors"),
             ("w4", "c7", "Concept", "subjects")]
    has_concept = spark.createDataFrame(rows, HC_SCHEMA)
    source_nodes = spark.createDataFrame(
        [("s1", "florence", "lc-names"), ("s2", "florence", "wikidata"),
         ("s3", "art", "lc-subjects"), ("s9", "art alias", "wikidata"),
         ("s4", "paris", "lc-names")],
        "id string, label string, source string",
    )
    return concepts, has_source, same_as, rel_edges, has_concept, source_nodes


def run(spark):
    out = related_concepts_sections(*frames(spark), threshold=2)
    return [
        (r["concept_id"], r["section"], r["rank"], r["related_id"],
         r["relationship_type"], r["concept_type"], r["label"], r["work_count"])
        for r in out.sort("concept_id", "section", "rank").collect()
    ]


def test_primary_ids_alphabetical(spark):
    concepts, has_source, same_as, *_ = frames(spark)
    got = {r["concept_id"]: r["primary_id"]
           for r in concept_primary_ids(has_source, same_as).collect()}
    assert got == {"c1": "c1", "c2": "c1", "c3": "c3", "c9": "c3"}


def test_typed_merge_across_same_as_and_fanout(spark):
    """Both group members' raw results merge under the primary (counts
    summed) and EVERY member carries the primary's list
    (concepts_index_extractor.py:66-76)."""
    rows = run(spark)
    c1_rel = [r for r in rows if r[0] == "c1" and r[1] == "related_to"]
    c2_rel = [r for r in rows if r[0] == "c2" and r[1] == "related_to"]
    assert [r[3:] for r in c1_rel] == [r[3:] for r in c2_rel]
    # c4 entry: raw from BOTH c1 (via s1) and c2 (via s2) → one merged row
    c4 = [r for r in c1_rel if r[3] == "c4"]
    assert len(c4) == 1
    # c4's 6 HAS_CONCEPT edges counted once per raw side → summed across both
    assert c4[0][7] == 12
    assert c4[0][4] == "RELATED_TO"
    assert c4[0][6] == "Paris"  # display label from the lc-names source
    assert c4[0][5] == "Place"  # most specific of {Person, Place}


def test_workless_primary_elects_work_connected_member(spark):
    """_choose_target_id: the primary (c3) has no works; the entry refers to
    the work-connected group member c9 instead."""
    rows = run(spark)
    c1_rel = [r for r in rows if r[0] == "c1" and r[1] == "related_to"]
    assert any(r[3] == "c9" for r in c1_rel)
    assert not any(r[3] == "c3" for r in c1_rel)


def test_own_group_and_labelless_targets_dropped(spark):
    rows = run(spark)
    c1_rel = [r for r in rows if r[0] == "c1" and r[1] == "related_to"]
    assert not any(r[3] in ("c1", "c2") for r in c1_rel)  # self-group
    c4_rel = [r for r in rows if r[0] == "c4" and r[1] == "related_to"]
    assert not any(r[3] == "c7" for r in c4_rel)  # MissingLabelError drop


def test_directional_sections(spark):
    """s4 -NARROWER_THAN-> s1: narrower_than surfaces on c4 (direction
    'from'), broader_than on the c1 group (direction 'to')."""
    rows = run(spark)
    assert [r[3] for r in rows if r[0] == "c4" and r[1] == "narrower_than"] == ["c1"]
    assert [r[3] for r in rows if r[0] == "c1" and r[1] == "broader_than"] == ["c4"]
    assert [r[3] for r in rows if r[0] == "c2" and r[1] == "broader_than"] == ["c4"]


def test_frequent_collaborators_type_filter(spark):
    """Person/Organisation × contributors only: c1↔c4 share 3 contributor
    works; subject edges never feed this section."""
    rows = run(spark)
    fc = [r for r in rows if r[1] == "frequent_collaborators"]
    assert ("c1", "frequent_collaborators", 1, "c4", None, "Place", "Paris", 3) in fc
    assert ("c4", "frequent_collaborators", 1, "c1", None, "Person", "Florence", 3) in fc
    # c9 appears only in subjects → no collaborator rows
    assert not any(r[0] == "c9" or r[3] == "c9" for r in fc)


def test_related_topics_excludes_agents(spark):
    """related_topics: related side restricted to topical types referenced
    in subjects (concept_queries.py:196-210)."""
    rows = run(spark)
    rt = [r for r in rows if r[1] == "related_topics"]
    # c4 (Place, subjects) co-occurs with c9 (Concept, subjects) on 3 works
    assert any(r[0] == "c4" and r[3] == "c9" and r[7] == 3 for r in rt)
    # Person-typed contributor edges never appear on the related side
    assert not any(r[3] == "c1" for r in rt)


def test_merge_layer_relationship_type_union(spark):
    """merged_related_concepts in isolation: counts summed across members,
    relationship types unioned, deterministic sorted-first type."""
    concepts, has_source, same_as, *_ = frames(spark)
    primary = concept_primary_ids(has_source, same_as)
    related = spark.createDataFrame(
        [("c1", "c4", "RELATED_TO", 2), ("c2", "c4", "HAS_PARENT", 5),
         ("c1", "c2", "RELATED_TO", 9)],  # self-group → dropped
        "concept_id string, related_id string, relationship_type string, work_count long",
    )
    wc = spark.createDataFrame([("c4",)], "concept_id string")
    out = merged_related_concepts(related, primary, wc).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["primary_id"], r["related_id"], r["work_count"]) == ("c1", "c4", 7)
    assert r["relationship_type"] == "HAS_PARENT"  # sorted-first of the union
