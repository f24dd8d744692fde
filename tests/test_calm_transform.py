"""CALM transformer scenarios, mirroring the reference's CalmTransformerTest
(suppression statuses, AMSG guides, mandatory-field precedence, level
mapping, NormaliseText, mojibake fixes, merge candidates)."""

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.calm_transform import (
    transform_calm,
    with_parsed_production,
)

_SCHEMA = "id string, data map<string,array<string>>, deleted boolean"

GOOD = {
    "Title": ["A collection"],
    "Level": ["Collection"],
    "RefNo": ["WA/HMM"],
    "CatalogueStatus": ["Catalogued"],
}


def one(spark, data, deleted=False, rid="r1"):
    df = spark.createDataFrame([(rid, data, deleted)], _SCHEMA)
    return transform_calm(df).collect()[0]


def test_visible_work_fields(spark):
    row = one(
        spark,
        {
            **GOOD,
            "AltRefNo": ["WA/HMM (alt)"],
            "BNumber": ["b1234567x"],
            "AccNo": ["ACC/99"],
            "Material": ["Archives - Digital"],
            "Subject": ["Medicine"],
            "Alternative_Title": ["Alt title"],
            "Extent": ["12 boxes"],
            "UserWrapped6": ["3 rolls"],
        },
    )
    assert row["type"] == "Visible"
    assert row["title"] == "A collection"
    assert row["work_type"] == "Collection"
    assert row["collection_path"] == "WA/HMM"
    assert row["reference_number"] == "WA/HMM (alt)"
    assert row["format_id"] == "hdig"
    assert row["other_identifiers"] == [
        "calm-ref-no:WA/HMM",
        "calm-altref-no:WA/HMM (alt)",
        "sierra-system-number:b1234567x",
        "accession-number:ACC/99",
    ]
    assert row["physical_description"] == "12 boxes 3 rolls"
    assert row["merge_candidates"] == [
        "sierra-system-number:b1234567x:CALM/Sierra harvest work",
        "calm-ref-no:WA/HMM:Archivematica work",
    ]


def test_suppressed_without_valid_catalogue_status(spark):
    missing = one(spark, {k: v for k, v in GOOD.items() if k != "CatalogueStatus"})
    assert missing["type"] == "Deleted"
    assert missing["reason"] == "SuppressedFromSource(Calm)"
    bad = one(spark, {**GOOD, "CatalogueStatus": ["in progress"]})
    assert bad["type"] == "Deleted"
    ok = one(spark, {**GOOD, "CatalogueStatus": ["  Not Yet Available  "]})
    assert ok["type"] == "Visible"


def test_amsg_guides_are_suppressed(spark):
    row = one(spark, {**GOOD, "RefNo": ["AMSG/X/3"]})
    assert row["type"] == "Deleted"
    assert row["reason"] == "SuppressedFromSource(Calm)"


def test_deleted_beats_suppression(spark):
    row = one(spark, {k: v for k, v in GOOD.items() if k != "CatalogueStatus"},
              deleted=True)
    assert row["reason"] == "DeletedFromSource(Calm)"


def test_mandatory_field_precedence(spark):
    no_title = one(spark, {k: v for k, v in GOOD.items() if k != "Title"})
    assert no_title["reason"] == "SourceFieldMissing(Calm:Title)"
    no_level = one(spark, {k: v for k, v in GOOD.items() if k != "Level"})
    assert no_level["reason"] == "SourceFieldMissing(Calm:Level)"
    no_ref = one(spark, {k: v for k, v in GOOD.items() if k != "RefNo"})
    assert no_ref["reason"] == "SourceFieldMissing(Calm:RefNo)"
    # title missing wins over level missing
    neither = one(
        spark, {k: v for k, v in GOOD.items() if k not in ("Title", "Level")}
    )
    assert neither["reason"] == "SourceFieldMissing(Calm:Title)"


def test_level_mapping_and_bad_levels(spark):
    assert one(spark, {**GOOD, "Level": ["SubSubSeries"]})["work_type"] == "Series"
    assert one(spark, {**GOOD, "Level": ["Piece"]})["work_type"] == "Standard"
    gop = one(spark, {**GOOD, "Level": ["Group of Pieces"]})
    assert gop["type"] == "Invisible"
    assert "Suppressed level" in gop["reason"]
    weird = one(spark, {**GOOD, "Level": ["Shelf"]})
    assert weird["reason"] == "InvalidValueInSourceField(Calm:Level - shelf)"


def test_normalise_text_keeps_only_italics_in_title(spark):
    row = one(
        spark,
        {**GOOD, "Title": ['A <b>bold</b> <i>italic</i> &amp; entity']},
    )
    assert row["title"] == "A bold <i>italic</i> & entity"


def test_mojibake_fixed(spark):
    row = one(spark, {**GOOD, "Title": ["1850â1900 quoted"]})
    assert row["title"] == "1850–1900 “quoted”"


def test_invalid_merge_candidate_ids_dropped(spark):
    row = one(spark, {**GOOD, "BNumber": ["not-a-bnumber"],
                      "RefNo": ["WA HMM"]})  # space breaks the RefNo regex
    assert row["merge_candidates"] == []


def test_parsed_production_union_range(spark):
    df = spark.createDataFrame(
        [("r1", {**GOOD, "Date": ["1901", "1905-1910"]}, False)], _SCHEMA
    )
    out = with_parsed_production(transform_calm(df)).collect()[0]
    assert out["production_label"] == "1901 1905-1910"
    assert out["prod_from"] == "1901-01-01"
    assert out["prod_to"] == "1910-12-31"


def test_collection_path_feeds_graph_queries(spark):
    """End-to-end synergy: CALM collectionPaths drive the path-hierarchy
    operator (plans/graph.py), like the reference's works → path graph."""
    from catalogue_pipeline_spark.plans.graph import work_ancestors

    rows = [
        ("r1", {**GOOD, "RefNo": ["WA"]}, False),
        ("r2", {**GOOD, "RefNo": ["WA/HMM"], "Level": ["Series"]}, False),
        ("r3", {**GOOD, "RefNo": ["WA/HMM/X1"], "Level": ["Item"]}, False),
    ]
    works = transform_calm(spark.createDataFrame(rows, _SCHEMA))
    paths = works.filter(F.col("type") == "Visible").select(
        F.col("id").alias("work_id"), F.col("collection_path").alias("path")
    )
    anc = {
        (r["id"], r["ancestor_id"]) for r in work_ancestors(paths).collect()
    }
    assert ("r3", "r2") in anc and ("r3", "r1") in anc and ("r2", "r1") in anc
