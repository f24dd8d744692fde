"""Wikidata linked-ontology source: query grammar + node/edge filtering.

Scenarios ported from the reference's
``tests/graph/sources/test_linked_ontology_node_source.py`` /
``test_linked_ontology_edge_source.py`` and the
``sparql_query_builder.py`` shapes.
"""

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.wikidata_source import (
    SPARQL_ITEMS_CHUNK_SIZE,
    all_ids_query,
    chunked_edge_queries,
    chunked_items_queries,
    edge_query,
    edge_types_for,
    extract_wikidata_id_col,
    filtered_edges,
    filtered_node_ids,
    items_query,
)


# ---------------------------------------------------------------- grammar


def test_all_ids_query():
    assert all_ids_query("loc") == "SELECT ?item WHERE { ?item wdt:P244 ?locId. }"
    assert all_ids_query("mesh") == "SELECT ?item WHERE { ?item wdt:P486 ?meshId. }"
    with pytest.raises(ValueError):
        all_ids_query("wikidata")


def test_items_query_concepts():
    q = items_query(["Q2", "Q1"], "concepts")
    assert q == (
        "SELECT DISTINCT ?item (SAMPLE(?itemLabel) as ?itemLabel) "
        "(SAMPLE(?itemDescription) as ?itemDescription) "
        "(SAMPLE(?itemAltLabel) as ?itemAltLabel) "
        "WHERE { VALUES ?item { wd:Q1 wd:Q2 } "
        "OPTIONAL { SERVICE wikibase:label { "
        'bd:serviceParam wikibase:language "en,mul". '
        "?item rdfs:label ?itemLabel. "
        "?item schema:description ?itemDescription. "
        "?item skos:altLabel ?itemAltLabel. } } } GROUP BY ?item"
    )


def test_items_query_names_and_locations():
    qn = items_query(["Q5"], "names")
    # names add birth/death/place fields, their OPTIONAL mappings, and a
    # place-of-birth label inside the label service
    assert "(SAMPLE(?dateOfBirth) as ?dateOfBirth)" in qn
    assert "(SAMPLE(?placeOfBirthLabel) as ?placeOfBirthLabel)" in qn
    assert "OPTIONAL { ?item wdt:P569 ?dateOfBirth. }" in qn
    assert "OPTIONAL { ?item wdt:P570 ?dateOfDeath. }" in qn
    assert "OPTIONAL { ?item wdt:P19 ?placeOfBirth. }" in qn
    assert "?placeOfBirth rdfs:label ?placeOfBirthLabel." in qn
    ql = items_query(["Q5"], "locations")
    assert "(SAMPLE(?coordinates) as ?coordinates)" in ql
    assert "OPTIONAL { ?item p:P625/ps:P625 ?coordinates. }" in ql
    assert "?placeOfBirth" not in ql
    # ?item is the lone un-aggregated field in both
    for q in (qn, ql):
        assert q.startswith("SELECT DISTINCT ?item (SAMPLE(")
        assert q.endswith("GROUP BY ?item")


def test_edge_query():
    q = edge_query(["Q2", "Q1"], "instance_of")
    assert q == (
        "SELECT DISTINCT ?fromItem ?toItem WHERE { "
        "VALUES ?fromItem { wd:Q1 wd:Q2 } "
        "?fromItem wdt:P31 ?toItem. "
        "FILTER (!wikibase:isSomeValue(?toItem)) }"
    )
    assert "p:P244/ps:P244" in edge_query(["Q1"], "same_as_loc")
    assert "p:P486/ps:P486" in edge_query(["Q1"], "same_as_mesh")
    assert "wdt:P26" in edge_query(["Q1"], "has_spouse")
    with pytest.raises(ValueError):
        edge_query(["Q1"], "likes")


def test_edge_types_for():
    assert edge_types_for("concepts") == [
        "instance_of",
        "subclass_of",
        "has_industry",
        "has_founder",
    ]
    names = edge_types_for("names")
    assert "has_field_of_work" in names and "has_spouse" in names
    assert "has_spouse" not in edge_types_for("locations")


# --------------------------------------------------------- column pieces


def test_extract_wikidata_id_col(spark):
    df = spark.createDataFrame(
        [
            ("http://www.wikidata.org/entity/Q42", "uri"),
            ("http://www.wikidata.org/.well-known/genid/abc123", "uri"),
            ("sh00001", "literal"),
            ("http://www.wikidata.org/entity/Q7", "literal"),
        ],
        "value string, type string",
    )
    got = [
        r[0]
        for r in df.select(
            extract_wikidata_id_col(F.col("value"), F.col("type"))
        ).collect()
    ]
    assert got == ["Q42", None, None, None]
    # without a binding-type column only the prefix is checked
    got2 = [
        r[0] for r in df.select(extract_wikidata_id_col(F.col("value"))).collect()
    ]
    assert got2 == ["Q42", None, None, "Q7"]


def test_chunked_queries_match_python_builder(spark):
    ids = [f"Q{i}" for i in range(1, 26)]
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    rows = {
        r.chunk_id: r.query
        for r in chunked_items_queries(df, "concepts", chunk_size=10).collect()
    }
    assert set(rows) == {0, 1, 2}
    # chunks are contiguous runs of the sorted id list; each chunk's query
    # is byte-identical to the Python builder over that chunk
    ordered = sorted(ids)
    for cid, chunk in enumerate(
        ordered[i : i + 10] for i in range(0, len(ordered), 10)
    ):
        assert rows[cid] == items_query(chunk, "concepts")
    erows = {
        r.chunk_id: r.query
        for r in chunked_edge_queries(df, "subclass_of", chunk_size=10).collect()
    }
    assert erows[2] == edge_query(ordered[20:], "subclass_of")
    # default chunk size is the reference's 400
    assert SPARQL_ITEMS_CHUNK_SIZE == 400
    one = chunked_items_queries(df, "concepts").collect()
    assert len(one) == 1 and one[0].chunk_id == 0


# ------------------------------------------------------------ node source


def _ids(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "id string")


def test_node_ids_valid_linked_ids(spark):
    # reference test_yields_ids_with_valid_linked_ids: Q2's linked id is
    # ontology-valid but not transformer-valid -> dropped
    edges = spark.createDataFrame(
        [(0, "Q1", "sh001"), (1, "Q2", "n001"), (2, "Q3", "sh002")],
        "seq long, from_id string, to_id string",
    )
    got = sorted(
        r.id
        for r in filtered_node_ids(
            edges,
            _ids(spark, "sh001", "n001", "sh002"),
            _ids(spark, "sh001", "sh002"),
            "concepts",
        ).collect()
    )
    assert got == ["Q1", "Q3"]


def test_node_ids_invalid_ontology_id_skipped(spark):
    edges = spark.createDataFrame(
        [(0, "Q1", "invalid_id")], "seq long, from_id string, to_id string"
    )
    got = filtered_node_ids(
        edges, _ids(spark, "sh999"), _ids(spark, "sh999"), "concepts"
    ).collect()
    assert got == []


def test_node_ids_first_valid_edge_wins(spark):
    # first ontology-valid edge's target fails the transformer gate; the
    # later passing edge must NOT resurrect the id (the reference adds to
    # `seen` before the transformer check)
    edges = spark.createDataFrame(
        [(0, "Q1", "n001"), (1, "Q1", "sh001"), (0, "Q2", "sh002")],
        "seq long, from_id string, to_id string",
    )
    got = sorted(
        r.id
        for r in filtered_node_ids(
            edges,
            _ids(spark, "n001", "sh001", "sh002"),
            _ids(spark, "sh001", "sh002"),
            "concepts",
        ).collect()
    )
    assert got == ["Q2"]


def test_node_ids_parents_concepts_only(spark):
    edges = spark.createDataFrame(
        [(0, "Q1", "sh001")], "seq long, from_id string, to_id string"
    )
    parents = spark.createDataFrame(
        # Q1 already seen -> excluded; P1 appears under both parent edge
        # types -> deduplicated; P2 fresh
        [("Q1", "P1", "instance_of"), ("Q1", "P1", "subclass_of"),
         ("Q1", "P2", "subclass_of"), ("Q9", "Q1", "instance_of")],
        "from_id string, to_id string, edge_type string",
    )
    vo, vt = _ids(spark, "sh001"), _ids(spark, "sh001")
    got = sorted(
        r.id
        for r in filtered_node_ids(edges, vo, vt, "concepts", parents).collect()
    )
    assert got == ["P1", "P2", "Q1"]
    # names never add parents
    got_names = sorted(
        r.id for r in filtered_node_ids(edges, vo, vt, "names", parents).collect()
    )
    assert got_names == ["Q1"]


def test_node_ids_unyielded_parent_child_still_seen(spark):
    # Q1 has an ontology-valid edge but fails the transformer gate: not
    # yielded, but still `seen`, so it cannot come back as a parent
    edges = spark.createDataFrame(
        [(0, "Q1", "sh001")], "seq long, from_id string, to_id string"
    )
    parents = spark.createDataFrame(
        [("Q9", "Q1", "instance_of")],
        "from_id string, to_id string, edge_type string",
    )
    got = filtered_node_ids(
        edges, _ids(spark, "sh001"), _ids(spark, "xx"), "concepts", parents
    ).collect()
    assert got == []


# ------------------------------------------------------------ edge source


def test_filtered_edges(spark):
    same_as = spark.createDataFrame(
        # Q1 current + valid target; Q2 current + invalid target;
        # Q3 not current
        [("Q1", "sh001"), ("Q2", "n001"), ("Q3", "sh002")],
        "from_id string, to_id string",
    )
    internal = spark.createDataFrame(
        [
            ("Q1", "Q5", "instance_of"),   # kept
            ("Q1", "P9", "instance_of"),   # target not a wikidata node
            ("Q3", "Q5", "subclass_of"),   # from not current
            ("Q1", "Q5", "has_spouse"),    # people edge: names only
            ("Q1", "Q5", "has_founder"),   # kept
        ],
        "from_id string, to_id string, edge_type string",
    )
    args = dict(
        same_as_edges=same_as,
        internal_edges=internal,
        linked_ontology="loc",
        valid_transformer_ids=_ids(spark, "sh001", "sh002"),
        current_node_ids=_ids(spark, "Q1", "Q2"),
        wikidata_ontology_ids=_ids(spark, "Q1", "Q2", "Q5"),
    )
    got = sorted(
        (r.from_id, r.to_id, r.edge_type)
        for r in filtered_edges(node_type="concepts", **args).collect()
    )
    assert got == [
        ("Q1", "Q5", "has_founder"),
        ("Q1", "Q5", "instance_of"),
        ("Q1", "sh001", "same_as_loc"),
    ]
    got_names = sorted(
        (r.from_id, r.to_id, r.edge_type)
        for r in filtered_edges(node_type="names", **args).collect()
    )
    assert ("Q1", "Q5", "has_spouse") in got_names
    # mesh flavour labels the same_as edges accordingly
    got_mesh = filtered_edges(node_type="concepts", **{**args, "linked_ontology": "mesh"})
    assert [r.edge_type for r in got_mesh.collect() if r.to_id == "sh001"] == [
        "same_as_mesh"
    ]
