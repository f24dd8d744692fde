"""Id-minter embedder parity — scenarios from
catalogue_graph/tests/id_minter/test_embedder.py (the Python twin of
SourceIdentifierEmbedderTest.scala)."""

import json

import pytest

from catalogue_pipeline_spark.plans.id_embedder import (
    embed_canonical_ids,
    extract_source_identifiers,
    normalize_ontology_type,
)

MINTED_SCHEMA = (
    "ontology_type string, source_system string, source_id string,"
    " canonical_id string"
)


def _si(system="sierra-system-number", value="v1", otype="Work"):
    return {"identifierType": {"id": system}, "value": value, "ontologyType": otype}


def _docs(spark, docs):
    return spark.createDataFrame(
        [(f"d{i}", json.dumps(d)) for i, d in enumerate(docs)],
        "doc_id string, doc_json string",
    )


def _extract(spark, doc):
    rows = extract_source_identifiers(_docs(spark, [doc])).collect()
    return {
        (
            (r.ontology_type, r.source_system, r.source_id),
            (r.pred_ontology_type, r.pred_source_system, r.pred_source_id),
        )
        for r in rows
    }


def test_extract_root_and_nested(spark):
    # 'retrieves a sourceIdentifier at the root' + 'multiple nested'
    doc = {
        "sourceIdentifier": _si(value="a"),
        "moreThings": [
            {"sourceIdentifier": _si(value="b")},
            {
                "sourceIdentifier": _si(value="c"),
                "evenMoreThings": [{"sourceIdentifier": _si(value="d")}],
            },
        ],
    }
    got = _extract(spark, doc)
    none = (None, None, None)
    assert got == {
        (("Work", "sierra-system-number", v), none) for v in "abcd"
    }


def test_extract_predecessor_alongside(spark):
    doc = {
        "sourceIdentifier": _si(system="axiell-system-number", value="ax1"),
        "predecessorIdentifier": _si(value="b1"),
    }
    got = _extract(spark, doc)
    assert got == {
        (
            ("Work", "axiell-system-number", "ax1"),
            ("Work", "sierra-system-number", "b1"),
        )
    }


def test_extract_concept_subtypes_normalize(spark):
    # an Agent and a Person with the same LoC id mint the SAME id
    doc = {
        "subjects": [
            {"sourceIdentifier": _si("lc-names", "n1", "Agent")},
            {"sourceIdentifier": _si("lc-names", "n1", "Person")},
        ]
    }
    got = {k for k, _ in _extract(spark, doc)}
    assert got == {("Concept", "lc-names", "n1")}
    assert normalize_ontology_type("Work") == "Work"
    assert normalize_ontology_type("Genre") == "Concept"


def test_extract_invalid_source_identifier_raises(spark):
    doc = {"sourceIdentifier": {"something": "something"}}
    with pytest.raises(Exception):
        extract_source_identifiers(_docs(spark, [doc])).collect()


def _embed(spark, doc, minted_rows):
    minted = spark.createDataFrame(minted_rows, MINTED_SCHEMA)
    out = embed_canonical_ids(_docs(spark, [doc]), minted).collect()
    return json.loads(out[0].doc_json)


def test_embed_nested_ids_and_promotion(spark):
    doc = {
        "sourceIdentifier": _si(value="a"),
        "type": "Identifiable",
        "identifiedType": "NewType",
        "moreThings": [
            {
                "sourceIdentifier": _si(value="b"),
                "type": "Identifiable",
            }
        ],
    }
    r = _embed(
        spark,
        doc,
        [
            ("Work", "sierra-system-number", "a", "cid_a"),
            ("Work", "sierra-system-number", "b", "cid_b"),
        ],
    )
    assert r["canonicalId"] == "cid_a"
    assert r["type"] == "NewType" and "identifiedType" not in r
    inner = r["moreThings"][0]
    # Identifiable without identifiedType promotes to Identified
    assert inner["canonicalId"] == "cid_b" and inner["type"] == "Identified"


def test_embed_only_minted_nodes_promoted(spark):
    # 'only promotes minted nodes' — the unminted sibling keeps its
    # Identifiable/identifiedType shape and gains no canonicalId
    doc = {
        "sourceIdentifier": _si(value="a"),
        "type": "Identifiable",
        "identifiedType": "Identified",
        "moreThings": [
            {
                "sourceIdentifier": _si(value="b"),
                "type": "Identifiable",
                "identifiedType": "Identified",
            }
        ],
    }
    r = _embed(spark, doc, [("Work", "sierra-system-number", "a", "cid_a")])
    assert r["canonicalId"] == "cid_a" and r["type"] == "Identified"
    inner = r["moreThings"][0]
    assert "canonicalId" not in inner
    assert inner["type"] == "Identifiable"
    assert inner["identifiedType"] == "Identified"


def test_embed_empty_id_map_leaves_doc_unchanged(spark):
    doc = {"sourceIdentifier": _si(value="a"), "other": "data"}
    r = _embed(spark, doc, [("Work", "x", "nope", "cid")])
    assert "canonicalId" not in r and r["other"] == "data"


def test_embed_overwrites_preexisting_null_canonical_id(spark):
    doc = {"sourceIdentifier": _si(value="a"), "canonicalId": None}
    r = _embed(spark, doc, [("Work", "sierra-system-number", "a", "cid_a")])
    assert r["canonicalId"] == "cid_a"
