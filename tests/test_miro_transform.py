"""Miro transformer scenarios, mirroring MiroRecordTransformerTest /
MiroTitleAndDescriptionTest (truncated-title rule, award sentences,
copyright suppression, innopac normalization)."""

import json

from catalogue_pipeline_spark.plans.miro_transform import (
    transform_miro,
    with_created_period,
)

_SCHEMA = "id string, content string, cleared boolean"


def one(spark, data, cleared=True, mid="M0000001"):
    data.setdefault("image_copyright_cleared", "Y")
    df = spark.createDataFrame([(mid, json.dumps(data), cleared)], _SCHEMA)
    return transform_miro(df).collect()[0]


def test_plain_title_and_description(spark):
    row = one(spark, {"image_title": "Cat, pencil",
                      "image_image_desc": "A drawing of a cat"})
    # title is NOT a prefix of the description's first line -> both kept
    assert row["title"] == "Cat, pencil"
    assert row["description"] == "A drawing of a cat"
    assert (row["format_id"], row["format_label"]) == ("q", "Digital Images")


def test_truncated_title_replaced_by_description_first_line(spark):
    row = one(spark, {
        "image_title": "A wood engraving",
        "image_image_desc": "A wood engraving of a horse\nBy T. Artist",
    })
    assert row["title"] == "A wood engraving of a horse"
    assert row["description"] == "By T. Artist"


def test_single_line_truncated_description_dropped(spark):
    row = one(spark, {
        "image_title": "An etching",
        "image_image_desc": "An etching of a dog",
    })
    assert row["title"] == "An etching of a dog"
    assert row["description"] is None


def test_dash_title_uses_description(spark):
    row = one(spark, {"image_title": "-",
                      "image_image_desc": "Real description\nmore"})
    assert row["title"] == "Real description"


def test_dash_description_falls_back_to_academic(spark):
    row = one(spark, {
        "image_title": "T",
        "image_image_desc": "--",
        "image_image_desc_academic": "From Sierra",
    })
    # title 'T' is not a prefix of 'From Sierra' -> kept; academic desc used
    assert row["title"] == "T"
    assert row["description"] == "From Sierra"


def test_award_sentences(spark):
    single = one(spark, {
        "image_title": "X", "image_image_desc": "ZZZ",
        "image_award": ["Wellcome Image Awards"], "image_award_date": ["2015"],
    })
    assert single["description"] == "ZZZ Wellcome Image Awards 2015."
    double = one(spark, {
        "image_title": "X", "image_image_desc": "ZZZ",
        "image_award": ["WIA Overall Winner", "Wellcome Image Awards"],
        "image_award_date": ["2016", "2016"],
    })
    assert double["description"] == "ZZZ Wellcome Image Awards Overall Winner 2016."
    ignored = one(spark, {
        "image_title": "X", "image_image_desc": "ZZZ",
        "image_award": ["Some Other Award"], "image_award_date": ["2001"],
    })
    assert ignored["description"] == "ZZZ"


def test_copyright_suppression(spark):
    row = one(spark, {"image_title": "X", "image_copyright_cleared": "N"})
    assert row["type"] == "Deleted"
    assert row["reason"] == "SuppressedFromSource(Miro: image_copyright_cleared = N)"
    missing = one(spark, {"image_title": "X", "image_copyright_cleared": None})
    assert missing["reason"] == (
        "SuppressedFromSource(Miro: image_copyright_cleared = <empty>)"
    )
    uncleared = one(spark, {"image_title": "X"}, cleared=False)
    assert uncleared["reason"] == (
        "SuppressedFromSource(Miro: isClearedForCatalogueAPI = false)"
    )


def test_innopac_normalization(spark):
    for raw in ("1234567x", "b1234567x", ".b1234567x", "B1234567x"):
        row = one(spark, {"image_title": "X", "image_innopac_id": raw})
        assert row["other_identifiers"] == ["sierra-system-number:b1234567x"], raw
    # uppercase X fails b-number validation -> silently dropped
    upper = one(spark, {"image_title": "X", "image_innopac_id": "1234567X"})
    assert upper["other_identifiers"] == []
    bad = one(spark, {"image_title": "X", "image_innopac_id": "garbage"})
    assert bad["type"] == "Error"


def test_subjects_and_genres_sentence_cased(spark):
    row = one(spark, {
        "image_title": "X",
        "image_keywords": ["skeletons"],
        "image_keywords_unauth": ["dancing", None],
        "image_phys_format": "etching",
        "image_lc_genre": "Etching",
    })
    assert row["subjects"] == ["Skeletons", "Dancing"]
    assert row["genres"] == ["Etching"]  # deduped after sentence-casing


def test_created_period_only_for_v_collection(spark):
    rows = [
        ("V0000001", json.dumps({"image_title": "X", "image_copyright_cleared": "Y",
                                 "image_artwork_date": "1889"}), True),
        ("L0000001", json.dumps({"image_title": "X", "image_copyright_cleared": "Y",
                                 "image_artwork_date": "1889"}), True),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {r["id"]: r for r in with_created_period(transform_miro(df)).collect()}
    assert out["V0000001"]["created_from"] == "1889-01-01"
    assert out["V0000001"]["created_to"] == "1889-12-31"
    assert out["L0000001"]["created_from"] is None


# ------------------------- round-4: locations / licences / contributors


def _locrow(spark, rec, mid="V0001234"):
    import json as _json

    from catalogue_pipeline_spark.plans.miro_transform import miro_locations

    df = spark.createDataFrame(
        [(mid, _json.dumps(rec))], "id string, content string"
    )
    return miro_locations(df).collect()[0].asDict()


def test_miro_license_mapping(spark):
    # MiroLicensesTest: direct string mappings
    for s, lid in [("CC-0", "cc-0"), ("CC-BY", "cc-by"), ("CC-BY-NC", "cc-by-nc"),
                   ("CC-BY-NC-ND", "cc-by-nc-nd"), ("PDM", "pdm"),
                   ("In copyright", "inc"), ("Academics", "cc-by-nc")]:
        out = _locrow(spark, {"image_use_restrictions": s})
        assert out["license_id"] == lid and out["suppress_reason"] is None
    # suppression strings
    out = _locrow(spark, {"image_use_restrictions": "Do not use"})
    assert out["suppress_reason"] == "image_use_restrictions = 'Do not use'"
    # absent restrictions = data error
    out = _locrow(spark, {})
    assert out["error_reason"] == "Nothing in the image_use_restrictions field"


def test_miro_location_urls(spark):
    out = _locrow(spark, {"image_use_restrictions": "CC-BY"}, mid="L0011760")
    assert out["location_url"] == (
        "https://iiif.wellcomecollection.org/image/L0011760/info.json"
    )
    assert out["thumbnail_url"] == (
        "https://iiif.wellcomecollection.org/image/L0011760/full/300,/0/default.jpg"
    )


def test_miro_credit_line(spark):
    # the tidy-up table, e.g. old Wellcome names
    out = _locrow(spark, {
        "image_use_restrictions": "CC-BY",
        "image_credit_line": "Wellcome Library, London",
    })
    assert out["credit"] == "Wellcome Collection"
    # contributor-code fallback (case-insensitive)
    out = _locrow(spark, {"image_use_restrictions": "CC-BY", "image_source_code": "aam"})
    assert out["credit"] == "Aamir Ahmed, Jane Pendjiky and Michael Millar"
    # per-record override
    out = _locrow(
        spark,
        {"image_use_restrictions": "CC-BY", "image_source_code": "CHC"},
        mid="B0007831",
    )
    assert out["credit"] == "Dr Stephen McQuaid & Stewart Church / QUB"
    # the GUS denylist suppresses nine specific records
    out = _locrow(
        spark,
        {"image_use_restrictions": "CC-BY", "image_source_code": "GUS"},
        mid="B0009891",
    )
    assert out["suppress_reason"] == "we do not expose image_source_code = GUS"
    out = _locrow(
        spark,
        {"image_use_restrictions": "CC-BY", "image_source_code": "GUS"},
        mid="B0000001",
    )
    assert out["credit"] == "Karen Gustafson"


def test_miro_contributors(spark):
    # creator ++ secondary creator ++ non-Wellcome credit, Agent labels
    out = _locrow(spark, {
        "image_use_restrictions": "CC-BY",
        "image_creator": ["Henry Wellcome", None],
        "image_secondary_creator": ["A N Other"],
        "image_credit_line": "Science Museum London",
    })
    assert out["contributors"] == [
        "Agent~Henry Wellcome~label-derived=henry wellcome",
        "Agent~A N Other~label-derived=a n other",
        "Agent~Science Museum, London~label-derived=science museum, london",
    ]
    # a Wellcome Collection credit is NOT a contributor
    out = _locrow(spark, {
        "image_use_restrictions": "CC-BY",
        "image_creator": ["Henry Wellcome"],
        "image_credit_line": "Wellcome Images",
    })
    assert out["contributors"] == [
        "Agent~Henry Wellcome~label-derived=henry wellcome"
    ]
