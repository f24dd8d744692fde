"""HAS_SOURCE_CONCEPT edge derivation parity — scenarios mirrored from
catalogue_graph/tests/graph/transformers/catalogue/test_id_label_checker.py
and test_catalogue_concepts_transformer.py."""

from catalogue_pipeline_spark.plans.concepts import concept_source_edges
from catalogue_pipeline_spark.plans.source_concepts import transform_weco

ONTO_SCHEMA = "id string, label string, alternative_labels array<string>, source string"
CON_SCHEMA = (
    "concept_id string, label string, concept_type string, "
    "source string, source_value string"
)


def _onto(spark):
    return spark.createDataFrame(
        [
            ("sh00000002", "Tacos", [], "lc-subjects"),
            ("sh85045046", "Etching", ["etching_s"], "lc-subjects"),
            ("sh85123237", "Something", ["Some example concept",
                                         "Another example concept"], "lc-subjects"),
            ("sh85004839", "Example concept", [], "lc-subjects"),
            ("n00000001", "McQuerry, Maureen, 1955-",
             ["MacQuerry, Maureen, 1955-"], "lc-names"),
            ("D004467", "Economics", ["Consumer Price Index"], "nlm-mesh"),
            ("D000715", "Anatomy", [], "nlm-mesh"),
            ("sh00000099", "Anatomy", [], "lc-subjects"),
            ("sh77000001", "Ambig", ["shared alt"], "lc-subjects"),
            ("sh77000002", "Ambig two", ["shared alt"], "lc-subjects"),
            ("D008288", "Malaria", [], "nlm-mesh"),
            ("weco:s6s24vd7", "", [], "weco-authority"),
            ("weco:abcd1234", "Example concept", [], "weco-authority"),
        ],
        ONTO_SCHEMA,
    )


def _edges(spark, concepts):
    df = concept_source_edges(
        spark.createDataFrame(concepts, CON_SCHEMA), _onto(spark)
    )
    return {
        r["concept_id"]: (r["source_concept_id"], r["matched_by"], r["qualifier"])
        for r in df.collect()
    }


def ld(cid, label, ctype="Concept"):
    return (cid, label, ctype, "label-derived", label)


def test_label_matching_main_and_alt(spark):
    got = _edges(spark, [
        ld("c1", "tacos"),
        ld("c2", "TACOS"),
        ld("c3", "etching_s"),
        ld("c4", "Some example concept"),
        ld("c5", "no such label"),
    ])
    assert got["c1"] == ("sh00000002", "label", None)
    assert got["c2"] == ("sh00000002", "label", None)
    assert got["c3"] == ("sh85045046", "label", None)
    assert got["c4"] == ("sh85123237", "label", None)
    assert "c5" not in got


def test_denylist(spark):
    got = _edges(spark, [ld("c1", "consumption"), ld("c2", "Siamese", "Person")])
    assert got == {}


def test_things_to_people_gates(spark):
    got = _edges(spark, [
        # alternative labels never match things to people...
        ld("c1", "macquerry, maureen, 1955-"),
        ld("c2", "macquerry, maureen, 1955-", "Person"),
        # ...but main labels are not gated
        ld("c3", "mcquerry, maureen, 1955-"),
        # and never people to things
        ld("c4", "consumer price index", "Person"),
        ld("c5", "consumer price index"),
        ld("c6", "anatomy", "Person"),
    ])
    assert "c1" not in got
    assert got["c2"] == ("n00000001", "label", None)
    assert got["c3"] == ("n00000001", "label", None)
    assert "c4" not in got
    assert got["c5"] == ("D004467", "label", None)
    assert got["c6"][0] == "D000715"


def test_ambiguous_alternative_label_discarded(spark):
    got = _edges(spark, [ld("c1", "shared alt")])
    assert "c1" not in got


def test_main_beats_alternative_and_mesh_beats_loc(spark):
    got = _edges(spark, [
        ld("c1", "Example concept", "Genre"),
        ld("c2", "Another example concept", "Genre"),
        ld("c3", "anatomy"),
    ])
    # main label of sh85004839 wins over sh85123237's alternative
    assert got["c1"] == ("sh85004839", "label", None)
    assert got["c2"] == ("sh85123237", "label", None)
    # nlm-mesh main label outranks lc-subjects main label
    assert got["c3"] == ("D000715", "label", None)


def test_weco_never_label_matched_and_blank_never_matches(spark):
    got = _edges(spark, [ld("c1", "Example concept"), ld("c2", "")])
    # LoC wins although the weco record carries the same label
    assert got["c1"] == ("sh85004839", "label", None)
    assert "c2" not in got


def test_identifier_matching_mesh_and_loc(spark):
    got = _edges(spark, [
        # mesh id + qualifier; source label 'malaria' is a substring
        ("c1", "Malaria treatment", "Subject", "nlm-mesh", "D008288Q000517"),
        # mesh id whose label does NOT occur in the concept label → no edge
        ("c2", "Something else", "Subject", "nlm-mesh", "D008288"),
        # loc: existence is enough
        ("c3", "whatever", "Subject", "lc-subjects", "sh00000002"),
        ("c4", "whatever", "Subject", "lc-subjects", "sh99999999"),
        ("c5", "name", "Person", "lc-names", "n00000001"),
    ])
    assert got["c1"] == ("D008288", "identifier", "Q000517")
    assert "c2" not in got
    assert got["c3"] == ("sh00000002", "identifier", None)
    assert "c4" not in got
    assert got["c5"] == ("n00000001", "identifier", None)


def test_weco_authority_edge(spark):
    got = _edges(spark, [
        ("s6s24vd7", "anything", "Concept", "viaf", "v1"),
        ("nope1234", "anything", "Concept", "viaf", "v1"),
    ])
    assert got["s6s24vd7"] == ("weco:s6s24vd7", "identifier", None)
    assert "nope1234" not in got


def test_transform_weco_nodes(spark):
    recs = spark.createDataFrame(
        [(" s6s24vd7 ", " Florence Nightingale ", " desc ",
          "https://a||https://b"),
         ("x1", "Blank", "", None)],
        "id string, label string, description string, image_url string",
    )
    got = {r["id"]: r.asDict() for r in transform_weco(recs).collect()}
    n = got["weco:s6s24vd7"]
    assert n["label"] == "Florence Nightingale"
    assert n["source"] == "weco-authority"
    assert n["description"] == "desc"
    assert n["image_urls"] == ["https://a", "https://b"]
    assert got["weco:x1"]["image_urls"] == []
