"""Sierra genres/notes/languages/production/duration parity tests.

Cases ported (expected values as fixtures) from the reference suites:
SierraGenresTest.scala, SierraNotesTest.scala, SierraLanguagesTest.scala,
SierraProductionTest.scala, SierraDurationTest.scala.
"""

import json

from catalogue_pipeline_spark.plans.sierra_fields import transform_sierra_fields


def vf(marcTag, subfields=None, ind1=" ", ind2=" ", content=None):
    d = {"fieldTag": "a", "marcTag": marcTag, "ind1": ind1, "ind2": ind2}
    if content is not None:
        d["content"] = content
    if subfields is not None:
        d["subfields"] = subfields
    return d


def sf(tag, content):
    return {"tag": tag, "content": content}


def run(spark, varfields, extra=None):
    doc = {"id": "1000001", "deleted": False, "suppressed": False,
           "varFields": varfields}
    doc.update(extra or {})
    df = spark.createDataFrame(
        [("1000001", json.dumps(doc))], "id string, content string"
    )
    return transform_sierra_fields(df).collect()[0]


# ----------------------------------------------------------------- genres

def test_genres_empty(spark):
    assert run(spark, [])["genres_ser"] == []


def test_genres_labels_and_concepts(spark):
    row = run(spark, [
        vf("655", [sf("a", "A1 Content"), sf("z", "Z1 Content")]),
        vf("655", [sf("a", "A2 Content"), sf("v", "V2 Content")]),
        vf("655", [sf("2", "rbgenr")]),          # label-less → dropped
        vf("655", [sf("a", "Printed books.")]),  # trailing period stripped
    ])
    assert row["genres_ser"] == [
        "A1 Content - Z1 Content|"
        "Genre~A1 Content~label-derived=a1 content;"
        "Place~Z1 Content~label-derived=z1 content",
        "A2 Content - V2 Content|"
        "Genre~A2 Content~label-derived=a2 content;"
        "Concept~V2 Content~label-derived=v2 content",
        "Printed books|Genre~Printed books~label-derived=printed books",
    ]
    assert row["genres"] == [
        "A1 Content - Z1 Content", "A2 Content - V2 Content", "Printed books"]


def test_genres_deduplicate(spark):
    row = run(spark, [
        vf("655", [sf("a", "Electronic journals")]),
        vf("655", [sf("a", "Electronic journals")]),
        vf("655", [sf("a", "Periodical")]),
        vf("655", [sf("a", "Periodicals"), sf("2", "rbgenr")]),
        vf("655", [sf("a", "Periodicals"), sf("2", "lcgft")]),
    ])
    assert row["genres"] == ["Electronic journals", "Periodical", "Periodicals"]


def test_genres_roman_numeral_period_id(spark):
    # SierraGenresTest "returns subjects for tag 655 with subfields a, y":
    # the Period id derives from the PREPROCESSED label
    row = run(spark, [
        vf("655", [sf("y", "MDCCLXXXVII. [1787]"), sf("a", "A Content")]),
    ])
    assert row["genres_ser"] == [
        "A Content - MDCCLXXXVII. [1787]|"
        "Genre~A Content~label-derived=a content;"
        "Period~MDCCLXXXVII. [1787]~label-derived=1787"
    ]


def test_genres_identifiers_from_0(spark):
    row = run(spark, [
        vf("655", [sf("a", "absence"), sf("0", "sh85060628")], ind2="0"),
        vf("655", [sf("a", "abolition"), sf("0", "mesh/456")], ind2="2"),
    ])
    assert row["genres_ser"] == [
        "absence|Genre~absence~lc-subjects=sh85060628",
        "abolition|Genre~abolition~nlm-mesh=mesh/456",
    ]


def test_genres_electronic_books_sentence_case(spark):
    row = run(spark, [vf("655", [sf("a", "Electronic Books.")])])
    assert row["genres"] == ["Electronic books"]


# ------------------------------------------------------------------ notes

def test_notes_tag_map_and_order(spark):
    row = run(spark, [
        vf("500", [sf("a", "general note")]),
        vf("502", [sf("a", "dissertation note")]),
        vf("504", [sf("a", "bib info")]),
        vf("505", [sf("a", "contents note")]),
        vf("518", [sf("a", "time and place")]),
        vf("524", [sf("a", "cite as note")]),
        vf("545", [sf("a", "bio note")]),
        vf("591", [sf("a", "local note")]),
        vf("593", [sf("a", "copyright b")]),
        vf("999", [sf("a", "not a note")]),
    ])
    assert row["notes_ser"] == [
        "GeneralNote|general note",
        "DissertationNote|dissertation note",
        "BibliographicalInformation|bib info",
        "ContentsNote|contents note",
        "TimeAndPlaceNote|time and place",
        "CiteAsNote|cite as note",
        "BiographicalNote|bio note",
        "GeneralNote|local note",
        "CopyrightNote|copyright b",
    ]


def test_notes_concatenate_subfields_not_fields(spark):
    row = run(spark, [
        vf("500", [sf("a", "1st part."), sf("b", "2nd part."),
                   sf("c", "3rd part.")]),
        vf("500", [sf("a", "1st note.")]),
        vf("500", [sf("a", "2nd note.")]),
    ])
    assert row["notes_ser"] == [
        "GeneralNote|1st part. 2nd part. 3rd part.",
        "GeneralNote|1st note.",
        "GeneralNote|2nd note.",
    ]


def test_notes_535_indicator_1(spark):
    row = run(spark, [
        vf("535", [sf("a", "The originals are in Oman")], ind1="1"),
        vf("535", [sf("a", "The duplicates are in Denmark")], ind1="2"),
    ])
    assert row["notes_ser"] == [
        "LocationOfOriginalNote|The originals are in Oman",
        "LocationOfDuplicatesNote|The duplicates are in Denmark",
    ]


def test_notes_561_requires_indicator_1(spark):
    row = run(spark, [
        vf("561", [sf("a", "Provenance: one plate in the set of plates")], ind1="1"),
        vf("561", [sf("a", "Purchased from John Smith on 01/01/2001")], ind1="0"),
        vf("561", [sf("a", "Private contact details for John Smith")]),
    ])
    assert row["notes_ser"] == [
        "OwnershipNote|Provenance: one plate in the set of plates",
    ]


def test_notes_suppressed_subfields(spark):
    row = run(spark, [
        vf("500", [sf("a", "Main bit."), sf("5", "UkLW")]),
        vf("591", [sf("z", "Copy 1."),
                   sf("e", "Note: The author's presentation inscription on verso of 2nd leaf."),
                   sf("9", "X8253")]),
    ])
    assert row["notes_ser"] == [
        "GeneralNote|Main bit.",
        "GeneralNote|Copy 1. Note: The author's presentation inscription "
        "on verso of 2nd leaf.",
    ]


def test_notes_787_search_link(spark):
    row = run(spark, [
        vf("787", [sf("i", "Complemented by (work):"),
                   sf("t", "Depression ain't the sads."),
                   sf("w", "(UkLW)b33039112")]),
        vf("787", [sf("s", "Times (London, England :  1788)."),
                   sf("g", "May 27, 2004."), sf("w", "(OCoLC)6967919")]),
    ])
    assert row["notes_ser"] == [
        'RelatedMaterial|Complemented by (work): Depression ain\'t the sads. '
        '(<a href="https://wellcomecollection.org/search/works?query=b33039112">b33039112</a>)',
        "RelatedMaterial|Times (London, England :  1788). May 27, 2004. "
        "(OCoLC)6967919",
    ]


def test_notes_514_suppressed_for_pictures(spark):
    mat = {"materialType": {"code": "k", "value": "Pictures"}}
    row = run(spark, [vf("514", [sf("a", "Lettering continues")])], extra=mat)
    assert row["notes_ser"] == []
    row = run(spark, [vf("514", [sf("a", "Lettering continues")])])
    assert row["notes_ser"] == ["LetteringNote|Lettering continues"]


def test_notes_url_subfield_becomes_link(spark):
    row = run(spark, [
        vf("540", [sf("a", "Terms."), sf("u", "https://example.org/t")]),
        vf("540", [sf("u", "not a url")]),
    ])
    assert row["notes_ser"] == [
        'TermsOfUse|Terms. <a href="https://example.org/t">https://example.org/t</a>',
        "TermsOfUse|not a url",
    ]


# -------------------------------------------------------------- languages

def test_languages_primary_and_041(spark):
    row = run(spark, [
        vf("041", [sf("a", "fre"), sf("a", "ger")]),
    ], extra={"lang": {"code": "eng", "name": "English"}})
    assert row["languages_ser"] == ["eng~English", "fre~French", "ger~German"]


def test_languages_unknown_041_dropped_name_fallback(spark):
    row = run(spark, [
        vf("041", [sf("a", "Lat "), sf("a", "qqq")]),
    ], extra={"lang": {"code": "zz9", "name": "Klingon"}})
    # primary falls back to the Sierra-supplied name; 041 trims+lowercases,
    # unknown codes dropped
    assert row["languages_ser"] == ["zz9~Klingon", "lat~Latin"]


def test_languages_suppressed_and_distinct(spark):
    row = run(spark, [
        vf("041", [sf("a", "eng"), sf("a", "mul"), sf("a", "und"),
                   sf("a", "zxx"), sf("a", "eng")]),
    ], extra={"lang": {"code": "eng", "name": "English"}})
    assert row["languages_ser"] == ["eng~English"]


def test_languages_whitespace_code_ignored(spark):
    row = run(spark, [], extra={"lang": {"code": "   ", "name": None}})
    assert row["languages_ser"] == []


# ------------------------------------------------------------- production

def test_production_260_fields(spark):
    row = run(spark, [
        vf("260", [sf("a", "Paris  : "), sf("a", "London :"),
                   sf("b", "Publisher,"), sf("c", "1984 . "),
                   sf("c", "1999.")]),
    ])
    assert row["production_ser"] == [
        "|Paris  :  London : Publisher, 1984 .  1999.|Paris;London|Publisher|1984;1999"
    ]


def test_production_260_manufacture_function(spark):
    row = run(spark, [
        vf("260", [sf("a", "Place"), sf("e", "Harlow :"),
                   sf("f", "Longman,"), sf("g", "1988")]),
    ])
    assert row["production_ser"] == [
        "Manufacture|Place Harlow : Longman, 1988|Place;Harlow|Longman|1988"
    ]


def test_production_264_function_from_indicator(spark):
    for ind2, fn in (("0", "Production"), ("1", "Publication"),
                     ("2", "Distribution"), ("3", "Manufacture")):
        row = run(spark, [vf("264", [sf("a", "London")], ind2=ind2)])
        assert row["production_ser"] == [f"{fn}|London|London||"]


def test_production_264_copyright_and_blank_dropped(spark):
    # 264 with ind2 4 (copyright) or blank is ignored → 260 wins
    row = run(spark, [
        vf("260", [sf("a", "San Francisco :"),
                   sf("b", "Morgan Kaufmann Publishers,"), sf("c", "2004")]),
        vf("264", [sf("c", "©2004")], ind2="4"),
        vf("264", [sf("c", "©2005")], ind2=" "),
    ])
    assert row["production_ser"] == [
        "|San Francisco : Morgan Kaufmann Publishers, 2004|"
        "San Francisco|Morgan Kaufmann Publishers|2004"
    ]


def test_production_prefers_264(spark):
    row = run(spark, [
        vf("260", [sf("a", "Paris")]),
        vf("264", [sf("a", "London")], ind2="0"),
    ])
    assert row["production_ser"] == ["Production|London|London||"]


def test_production_008_only(spark):
    f008 = "790922s1757    enk||||      o00||||eng ccam   "
    row = run(spark, [vf("008", content=f008)])
    assert row["production_ser"] == ["|1757|England||1757"]


def test_production_008_ignored_when_date_parses(spark):
    f008 = "790922s1757    enk||||      o00||||eng ccam   "
    row = run(spark, [
        vf("008", content=f008),
        vf("264", [sf("c", "2002"), sf("a", "London")], ind2="1"),
    ])
    assert row["production_ser"] == ["Publication|2002 London|London||2002"]


def test_production_008_date_substituted_when_no_dates(spark):
    f008 = "790922s1757    enk||||      o00||||eng ccam   "
    row = run(spark, [
        vf("008", content=f008),
        vf("260", [sf("a", "London")]),
    ])
    # dates take the 008 range (6th field marks the substituted range)
    assert row["production_ser"] == ["|London|London||1757|1757"]


def test_production_008_label_kept_when_unparseable(spark):
    f008 = "790922s1757    enk||||      o00||||eng ccam   "
    row = run(spark, [
        vf("008", content=f008),
        vf("260", [sf("a", "London"), sf("c", "printed in the year MDCCLVII")]),
    ])
    # the unparseable 260 $c keeps its label; the machine range comes
    # from 008 (the 6th serialized field)
    assert row["production_ser"] == [
        "|London printed in the year MDCCLVII|London||"
        "printed in the year MDCCLVII|1757"
    ]


# --------------------------------------------------------------- duration

def test_duration_from_306(spark):
    assert run(spark, [vf("306", [sf("a", "011012")])])["duration_seconds"] \
        == 1 * 3600 + 10 * 60 + 12
    assert run(spark, [
        vf("306", [sf("a", "001000")]),
        vf("306", [sf("a", "001132")]),
    ])["duration_seconds"] == 10 * 60
    assert run(spark, [vf("306", [sf("a", "01xx1012")])])["duration_seconds"] is None
    assert run(spark, [vf("999", [sf("a", "011012")])])["duration_seconds"] is None
    assert run(spark, [vf("306", [sf("b", "011012")])])["duration_seconds"] is None
