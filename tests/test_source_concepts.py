"""LoC / MeSH / Wikidata source-concept transformers.

Scenario expectations mirror the reference parsers
(catalogue_graph/src/graph/transformers/{loc,mesh,wikidata}/raw_concept.py
and their transformer classes).
"""

import json

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.source_concepts import (
    transform_loc,
    transform_mesh,
    transform_wikidata_edges,
    transform_wikidata_nodes,
)


def _loc_doc(
    sid="sh85101552",
    kind="subjects",
    label="Poetry",
    types=("madsrdf:Authority",),
    variants=None,
    broader=None,
    narrower=None,
    related=None,
    components=None,
):
    base = f"http://id.loc.gov/authorities/{kind}/{sid}"
    node = {
        "@id": base,
        "@type": list(types),
        "madsrdf:authoritativeLabel": {"@language": "en", "@value": label},
    }
    graph = [node]
    if variants:
        node["madsrdf:hasVariant"] = [{"@id": f"_:v{i}"} for i in range(len(variants))]
        for i, vl in enumerate(variants):
            graph.append({"@id": f"_:v{i}", "@type": "madsrdf:Variant",
                          "madsrdf:variantLabel": vl})
    ref = lambda x: {"@id": f"http://id.loc.gov/authorities/subjects/{x}"}  # noqa: E731
    if broader:
        node["madsrdf:hasBroaderAuthority"] = [ref(x) for x in broader]
    if components:
        node["madsrdf:componentList"] = {"@list": [ref(x) for x in components]}
    if narrower:
        node["madsrdf:hasNarrowerAuthority"] = (
            ref(narrower[0]) if len(narrower) == 1 else [ref(x) for x in narrower]
        )
    if related:
        node["madsrdf:hasReciprocalAuthority"] = [ref(x) for x in related]
    return {"@id": base, "@graph": graph}


def _run_loc(spark, docs):
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], "content string")
    nodes, edges = transform_loc(df)
    return (
        [r.asDict() for r in nodes.orderBy("id").collect()],
        {(r["from_id"], r["to_id"], r["relationship"]) for r in edges.collect()},
    )


def test_loc_nodes_and_labels(spark):
    nodes, _ = _run_loc(
        spark, [_loc_doc(label="Poetry", variants=["Poem", "Verses"])]
    )
    assert nodes == [
        {"id": "sh85101552", "label": "Poetry", "source": "lc-subjects",
         "alternative_labels": ["Poem", "Verses"]}
    ]
    # names authority → lc-names; n-prefixed id with optional letter
    nodes, _ = _run_loc(spark, [_loc_doc(sid="no2017146789", kind="names", label="X")])
    assert nodes[0]["id"] == "no2017146789" and nodes[0]["source"] == "lc-names"


def test_loc_exclusions(spark):
    # geographic concepts and unparseable ids are dropped
    nodes, _ = _run_loc(
        spark,
        [_loc_doc(types=("madsrdf:Authority", "madsrdf:Geographic")),
         _loc_doc(sid="zz9", kind="other")],
    )
    assert nodes == []
    # a doc whose graph lacks an Authority node with a label is dropped
    doc = _loc_doc()
    doc["@graph"][0].pop("madsrdf:authoritativeLabel")
    nodes, _ = _run_loc(spark, [doc])
    assert nodes == []


def test_loc_edges(spark):
    _, edges = _run_loc(
        spark,
        [_loc_doc(broader=["sh1"], components=["sh2"], narrower=["sh3"],
                  related=["sh4"])],
    )
    me = "sh85101552"
    assert edges == {
        (me, "sh1", "NARROWER_THAN"),      # broader → me NARROWER_THAN b
        (me, "sh2", "NARROWER_THAN"),      # componentList members count too
        ("sh3", me, "NARROWER_THAN"),      # narrower edge is reversed
        (me, "sh4", "RELATED_TO"),         # related goes both ways
        ("sh4", me, "RELATED_TO"),
    }


def _mesh_xml(
    sid="D000001",
    label="Calcimycin",
    terms=("Calcimycin", "A-23187"),
    treenums=("D03.633.100.221.173",),
    scope="An ionophorous antibiotic.",
    related=(),
    geographic=False,
):
    cls = ' DescriptorClass="4"' if geographic else ' DescriptorClass="1"'
    t = "".join(f"<TreeNumber>{x}</TreeNumber>" for x in treenums)
    terms_xml = "".join(f"<Term><String>{x}</String></Term>" for x in terms)
    rel = "".join(
        f"<SeeRelatedDescriptor><DescriptorReferredTo><DescriptorUI>{x}</DescriptorUI>"
        f"</DescriptorReferredTo></SeeRelatedDescriptor>" for x in related
    )
    return (
        f'<DescriptorRecord{cls}><DescriptorUI>{sid}</DescriptorUI>'
        f"<DescriptorName><String>{label}</String></DescriptorName>"
        f"<TreeNumberList>{t}</TreeNumberList>"
        f'<ConceptList><Concept PreferredConceptYN="Y">'
        f"<ScopeNote>{scope}</ScopeNote>"
        f"<TermList>{terms_xml}</TermList></Concept></ConceptList>"
        f"<SeeRelatedList>{rel}</SeeRelatedList>"
        f"</DescriptorRecord>"
    )


def _run_mesh(spark, xmls):
    df = spark.createDataFrame([(x,) for x in xmls], "content string")
    nodes, edges = transform_mesh(df)
    return (
        {r["id"]: r.asDict() for r in nodes.collect()},
        {(r["from_id"], r["to_id"], r["relationship"]) for r in edges.collect()},
    )


def test_mesh_nodes(spark):
    nodes, _ = _run_mesh(spark, [_mesh_xml(related=("D005561",))])
    n = nodes["D000001"]
    assert n["label"] == "Calcimycin"
    assert n["source"] == "nlm-mesh"
    # the preferred label's FIRST occurrence is removed from terms
    assert n["alternative_labels"] == ["A-23187"]
    assert n["alternative_ids"] == ["D03.633.100.221.173"]
    assert n["description"] == "An ionophorous antibiotic."
    # geographic descriptors are dropped
    nodes, _ = _run_mesh(spark, [_mesh_xml(geographic=True)])
    assert nodes == {}


def test_mesh_parent_join_and_related(spark):
    # D2's tree number is one segment below D1's → HAS_PARENT(D2 → D1);
    # top-level tree numbers yield no parent
    xmls = [
        _mesh_xml(sid="D1", label="Anatomy", terms=("Anatomy",), treenums=("A01",)),
        _mesh_xml(sid="D2", label="Body Regions", terms=("Body Regions",),
                  treenums=("A01.111",), related=("D1",)),
        _mesh_xml(sid="D3", label="Twin", terms=("Twin",),
                  treenums=("A01.111", "B02.200")),
    ]
    # B02 has no owning descriptor → that parent link simply drops out
    nodes, edges = _run_mesh(spark, xmls)
    assert ("D2", "D1", "HAS_PARENT") in edges
    assert ("D3", "D1", "HAS_PARENT") in edges
    # related is one-directional for MeSH (source data lists both sides)
    assert ("D2", "D1", "RELATED_TO") in edges
    assert ("D1", "D2", "RELATED_TO") not in edges
    assert not any(f == "D1" and r == "HAS_PARENT" for f, _, r in edges)


def _wd_row(qid="Q1", label="universe", alt=None, desc=None):
    row = {
        "item": {"type": "uri",
                 "value": f"http://www.wikidata.org/entity/{qid}"},
        "itemLabel": {"type": "literal", "value": label, "xml:lang": "en"},
    }
    if alt is not None:
        row["itemAltLabel"] = {"type": "literal", "value": alt, "xml:lang": "en"}
    if desc is not None:
        row["itemDescription"] = {"type": "literal", "value": desc, "xml:lang": "en"}
    return json.dumps(row)


def test_wikidata_nodes(spark):
    df = spark.createDataFrame(
        [(_wd_row(alt="cosmos, everything", desc="all that exists"),),
         (_wd_row(qid="Q99", label="Q99"),)],  # no English label → excluded
        "content string",
    )
    out = [r.asDict() for r in transform_wikidata_nodes(df).collect()]
    assert out == [
        {"id": "Q1", "label": "universe", "source": "wikidata",
         "alternative_labels": ["cosmos", "everything"],
         "description": "all that exists"}
    ]


def test_wikidata_edges(spark):
    df = spark.createDataFrame(
        [("Q1", "sh1", "same_as_loc"), ("Q2", "D1", "same_as_mesh"),
         ("Q3", "Q4", "has_parent"), ("Q5", "Q6", "has_founder"),
         ("Q7", "Q8", "bogus")],
        "from_id string, to_id string, edge_type string",
    )
    got = {(r["from_id"], r["to_id"], r["relationship"])
           for r in transform_wikidata_edges(df).collect()}
    assert got == {
        ("Q1", "sh1", "SAME_AS"), ("sh1", "Q1", "SAME_AS"),
        ("Q2", "D1", "SAME_AS"), ("D1", "Q2", "SAME_AS"),
        ("Q3", "Q4", "HAS_PARENT"), ("Q5", "Q6", "HAS_FOUNDER"),
    }
