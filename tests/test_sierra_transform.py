"""Sierra bib-JSON transformer scenarios, mirroring the reference's
transformer_sierra test suite (SierraTitleTest, SierraIdentifiersTest,
SierraMergeCandidatesTest, SierraLetteringTest, SierraPhysicalDescriptionTest,
MiroIdParsingTest, SierraTransformerTest deleted/suppressed cases)."""

import json

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.sierra_transform import (
    link_item_records,
    sierra_check_digit,
    transform_sierra,
)


def vf(marcTag=None, subfields=None, content=None, ind1=" ", ind2=" ", fieldTag="a"):
    d = {"fieldTag": fieldTag, "ind1": ind1, "ind2": ind2}
    if marcTag:
        d["marcTag"] = marcTag
    if content is not None:
        d["content"] = content
    if subfields is not None:
        d["subfields"] = subfields
    return d


def sf(tag, content):
    return {"tag": tag, "content": content}


def bib_df(spark, *bibs):
    rows = []
    for sierra_id, varfields, extra in bibs:
        doc = {"id": sierra_id, "deleted": False, "suppressed": False,
               "varFields": varfields}
        doc.update(extra or {})
        rows.append((sierra_id, json.dumps(doc)))
    return spark.createDataFrame(rows, "id string, content string")


def one(spark, varfields, extra=None, sierra_id="1234567"):
    out = transform_sierra(bib_df(spark, (sierra_id, varfields, extra)))
    return out.collect()[0]


# ------------------------------------------------------------- check digit

def py_check_digit(s):
    rem = sum(int(c) * w for c, w in zip(reversed(s), range(2, 9))) % 11
    return "x" if rem == 10 else str(rem)


def test_check_digit_matches_python_reference(spark):
    ids = [str(1000000 + 37 * k)[:7] for k in range(60)]
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    got = dict(
        df.select("id", sierra_check_digit(F.col("id")).alias("cd")).collect()
    )
    for i in ids:
        assert got[i] == py_check_digit(i), i


def test_source_identifier_is_bnumber_with_check_digit(spark):
    row = one(spark, [vf("245", [sf("a", "T")])], sierra_id="1000001")
    # 1*8 + 1*2 = 10 -> 'x'
    assert row["id"] == "b1000001x"
    assert row["sierra_id"] == "1000001"


# ------------------------------------------------------------------ title

def test_title_joins_subfields_in_original_order(spark):
    row = one(spark, [vf("245", [sf("n", "Vol. 1,"), sf("p", "Part A"), sf("a", "X")])])
    assert row["title"] == "Vol. 1, Part A X"


def test_title_drops_trailing_h_and_strips_brackets_in_retained_h(spark):
    row = one(
        spark,
        [vf("245", [sf("a", "A"), sf("h", "[electronic resource] :"), sf("b", "B"),
                    sf("h", "[microform]")])],
    )
    # retained $h loses "[...]" and is trimmed; trailing $h is dropped
    assert row["title"] == "A : B"


def test_title_uses_first_of_multiple_245s(spark):
    row = one(spark, [vf("245", [sf("a", "First")]), vf("245", [sf("a", "Second")])])
    assert row["title"] == "First"


def test_title_ignores_unwanted_subfield_codes(spark):
    row = one(spark, [vf("245", [sf("a", "Kept"), sf("6", "880-01")])])
    assert row["title"] == "Kept"


def test_missing_245_is_invisible(spark):
    row = one(spark, [vf("100", [sf("a", "Author")])])
    assert row["type"] == "Invisible"
    assert "Could not find field 245" in row["reason"]
    assert row["title"] is None


def test_245_without_usable_subfields_is_invisible(spark):
    row = one(spark, [vf("245", [sf("z", "only")])])
    assert row["type"] == "Invisible"
    assert "No subfields in field 245" in row["reason"]


# ------------------------------------------------------- deleted/suppressed

def test_deleted_and_suppressed_become_deleted_works(spark):
    out = transform_sierra(
        bib_df(
            spark,
            ("1000001", [vf("245", [sf("a", "D")])], {"deleted": True}),
            ("1000002", [vf("245", [sf("a", "S")])], {"suppressed": True}),
            ("1000003", [vf("245", [sf("a", "DS")])], {"deleted": True, "suppressed": True}),
        )
    ).orderBy("sierra_id").collect()
    assert [r["type"] for r in out] == ["Deleted"] * 3
    assert out[0]["reason"] == "DeletedFromSource(Sierra)"
    assert out[1]["reason"] == "SuppressedFromSource(Sierra)"
    # deleted takes precedence over suppressed
    assert out[2]["reason"] == "DeletedFromSource(Sierra)"
    # work data is not populated, but identity stays
    assert out[0]["title"] is None and out[0]["other_identifiers"] == []


def test_deleted_work_keeps_state_level_merge_candidates(spark):
    row = one(
        spark,
        [vf("776", [sf("w", "(UkLW)b1234567x")])],
        extra={"deleted": True},
    )
    assert row["merge_candidates"] == [
        "sierra-system-number:b1234567x:Physical/digitised Sierra work"
    ]


# ------------------------------------------------------------- identifiers

def test_isbn_issn_only_from_fields_with_subfield_a(spark):
    row = one(
        spark,
        [
            vf("245", [sf("a", "T")]),
            vf("020", [sf("a", " 978-0-x ")]),
            vf("020", [sf("z", "cancelled")]),
            vf("022", [sf("a", "1234-5678")]),
        ],
    )
    ids = row["other_identifiers"]
    assert ids[0] == "sierra-identifier:1234567"
    assert "isbn:978-0-x" in ids and "issn:1234-5678" in ids
    assert not any("cancelled" in i for i in ids)


def test_digcodes_extracted_and_deduped(spark):
    row = one(
        spark,
        [
            vf("245", [sf("a", "T")]),
            vf("759", [sf("a", "digmoh(Channel)")]),
            vf("759", [sf("a", "digmoh")]),
            vf("759", [sf("a", "dig")]),  # no suffix -> not a digcode
            vf("759", [sf("a", "digicon")]),
        ],
    )
    digs = [i for i in row["other_identifiers"] if i.startswith("wellcome-digcode")]
    assert digs == ["wellcome-digcode:digmoh", "wellcome-digcode:digicon"]


def test_iconographic_number_only_for_visual_collections(spark):
    fields = [vf("245", [sf("a", "T")]), vf("001", content="12345i")]
    k = one(spark, fields, extra={"materialType": {"code": "k", "value": "Pictures"}})
    assert k["reference_number"] == "12345i"
    assert "iconographic-number:12345i" in k["other_identifiers"]
    book = one(spark, fields, extra={"materialType": {"code": "a", "value": "Books"}})
    assert book["reference_number"] is None
    assert not any("iconographic" in i for i in book["other_identifiers"])


def test_iconographic_number_falls_back_to_099(spark):
    row = one(
        spark,
        [vf("245", [sf("a", "T")]), vf("099", [sf("a", "67890i.2")])],
        extra={"materialType": {"code": "r", "value": "3D-Objects"}},
    )
    assert row["reference_number"] == "67890i.2"


def test_estc_references_require_exact_shape(spark):
    row = one(
        spark,
        [
            vf("245", [sf("a", "T")]),
            vf("510", [sf("a", "ESTC"), sf("c", "T102669")]),
            vf("510", [sf("a", "ESTC"), sf("c", "cf. T99")]),  # not a full match
            vf("510", [sf("a", "Other"), sf("c", "T1")]),
            vf("510", [sf("a", "ESTC"), sf("c", "T2"), sf("c", "T3")]),  # 3 subfields
        ],
    )
    estc = [i for i in row["other_identifiers"] if i.startswith("estc")]
    assert estc == ["estc:T102669"]


# --------------------------------------------------------- merge candidates

def test_776_candidate_requires_exactly_one_distinct_id(spark):
    base = [vf("245", [sf("a", "T")])]
    a = one(spark, base + [vf("776", [sf("w", "(UkLW)b1234567x")]),
                           vf("776", [sf("w", "(uklw)  b1234567x")])])
    assert a["merge_candidates"] == [
        "sierra-system-number:b1234567x:Physical/digitised Sierra work"
    ]
    b = one(spark, base + [vf("776", [sf("w", "(UkLW)b1234567x")]),
                           vf("776", [sf("w", "(UkLW)b7654321x")])])
    assert b["merge_candidates"] == []
    c = one(spark, base + [vf("776", [sf("w", "(OCLC)12345")])])
    assert c["merge_candidates"] == []
    d = one(spark, base + [vf("776", [sf("w", "(UkLW)not-a-bnumber")])])
    assert d["merge_candidates"] == []


def test_miro_ids_from_089_are_space_stripped_and_padded(spark):
    row = one(spark, [vf("245", [sf("a", "T")]), vf("089", [sf("a", "V 123")])])
    assert row["merge_candidates"] == ["miro-image-number:V0000123:Miro/Sierra work"]


def test_miro_suffix_preferred_over_bare_stem(spark):
    row = one(
        spark,
        [
            vf("245", [sf("a", "T")]),
            vf("089", [sf("a", "V0036036")]),
            vf("962", [sf("u", "http://wellcomeimages.org/indexplus/image/V0036036EL.html")]),
            vf("962", [sf("u", "http://wellcomeimages.org/ixbin/hixclient?MIROPAC=L0076330")]),
        ],
    )
    assert row["merge_candidates"] == [
        "miro-image-number:V0036036EL:Miro/Sierra work",
        "miro-image-number:L0076330:Miro/Sierra work",
    ]


def test_calm_candidates_are_uuids_only(spark):
    row = one(
        spark,
        [
            vf("245", [sf("a", "T")]),
            vf("035", [sf("a", "f5217b45-b742-472b-95c3-f136d5de1104")]),
            vf("035", [sf("a", "(OCoLC)927468903")]),
        ],
    )
    assert row["merge_candidates"] == [
        "calm-record-id:f5217b45-b742-472b-95c3-f136d5de1104:Calm/Sierra harvest"
    ]


def test_ebsco_candidate_needs_ebz_003(spark):
    base = [vf("245", [sf("a", "T")]), vf("001", content="ebs123e")]
    no_ebz = one(spark, base)
    assert no_ebz["merge_candidates"] == []
    with_ebz = one(spark, base + [vf("003", content="EBZ")])
    assert with_ebz["merge_candidates"] == [
        "ebsco-alt-lookup:ebs123e:EBSCO/Sierra e-resource"
    ]


# ------------------------------------------------------------- data fields

def test_alternative_titles_skip_captions_and_uklw(spark):
    row = one(
        spark,
        [
            vf("245", [sf("a", "Main")]),
            vf("240", [sf("a", "Uniform"), sf("5", "UkLW")]),
            vf("130", [sf("a", "Entry"), sf("l", "English")]),
            vf("246", [sf("a", "Caption")], ind2="6"),
            vf("246", [sf("a", "Varying")]),
            vf("242", [sf("a", "Varying")]),  # duplicate -> deduped
        ],
    )
    assert row["alternative_titles"] == ["Uniform", "Entry English", "Varying"]


def test_lettering_246_ind2_6_plus_514_for_pictures(spark):
    fields = [
        vf("245", [sf("a", "T")]),
        vf("246", [sf("a", "Inscribed")], ind2="6"),
        vf("514", [sf("a", "More")]),
    ]
    k = one(spark, fields, extra={"materialType": {"code": "k", "value": "Pictures"}})
    assert k["lettering"] == "Inscribed\n\nMore"
    other = one(spark, fields, extra={"materialType": {"code": "a", "value": "Books"}})
    assert other["lettering"] == "Inscribed"


def test_physical_description_multiline(spark):
    row = one(
        spark,
        [
            vf("245", [sf("a", "T")]),
            vf("300", [sf("a", "1 videocassette"), sf("c", "VHS")]),
            vf("300", [sf("z", "skip me")]),
            vf("300", [sf("b", "col."), sf("e", "+ booklet")]),
        ],
    )
    assert row["physical_description"] == "1 videocassette VHS<br/>col. + booklet"


def test_format_resolves_linked_codes(spark):
    fields = [vf("245", [sf("a", "T")])]
    ebook = one(spark, fields, extra={"materialType": {"code": "v", "value": "E-books"}})
    assert (ebook["format_id"], ebook["format_label"]) == ("a", "Books")
    ejournal = one(spark, fields, extra={"materialType": {"code": "j", "value": "E-journals"}})
    assert (ejournal["format_id"], ejournal["format_label"]) == ("d", "Journals")
    unknown = one(spark, fields, extra={"materialType": {"code": "9", "value": "??"}})
    assert unknown["format_id"] is None and unknown["format_label"] is None


def test_edition_concatenates_all_250a(spark):
    row = one(
        spark,
        [vf("245", [sf("a", "T")]), vf("250", [sf("a", "2nd ed. ")]),
         vf("250", [sf("a", "revised")])],
    )
    assert row["edition"] == "2nd ed. revised"


def test_former_frequencies_per_field(spark):
    row = one(
        spark,
        [vf("245", [sf("a", "T")]),
         vf("321", [sf("a", "Monthly,"), sf("b", "1990-1995")]),
         vf("321", [sf("a", "Weekly")])],
    )
    assert row["former_frequencies"] == ["Monthly, 1990-1995", "Weekly"]


# ------------------------------------------------------------ linked items

def test_link_item_records_joins_live_items(spark):
    works = transform_sierra(
        bib_df(spark, ("1000001", [vf("245", [sf("a", "T")])], None),
               ("1000002", [vf("245", [sf("a", "U")])], None))
    )
    items = spark.createDataFrame(
        [
            ("2000001", "1000001", json.dumps({"id": "2000001", "deleted": False,
                                               "location": {"code": "sgmed", "name": "Closed stores"}})),
            ("2000002", "1000001", json.dumps({"id": "2000002", "deleted": True})),
            ("2000003", "1000001", json.dumps({"id": "2000003", "suppressed": True})),
        ],
        "item_id string, bib_id string, content string",
    )
    out = {r["sierra_id"]: r["items"] for r in link_item_records(works, items).collect()}
    # 2000001 -> 1*2 + 2*8 = 18 % 11 = 7
    assert out["1000001"] == ["i20000017@Closed stores"]
    assert out["1000002"] == []


# ------------------------------------------------------------ sierra items

def _items_df(spark, rows):
    """rows: (item_id, bib_id, item_json_dict)"""
    return spark.createDataFrame(
        [(i, b, json.dumps(d)) for i, b, d in rows],
        "item_id string, bib_id string, content string",
    )


# items in these fixtures carry no access fixed fields, so every one
# resolves to the rules engine's fallback access condition
_FALLBACK_ACCESS = (
    'NotRequestable||This item cannot be requested online. Please contact '
    '<a href="mailto:library@wellcomecollection.org">'
    'library@wellcomecollection.org</a> for more information.|'
)


def _items_map(df):
    from catalogue_pipeline_spark.plans.sierra_transform import items_per_bib

    return {
        r["bib_id"]: [i.replace("|" + _FALLBACK_ACCESS, "") for i in r["items"]]
        for r in items_per_bib(df).collect()
    }


def test_items_location_mapping_and_closed_stores_label(spark):
    out = _items_map(_items_df(spark, [
        ("2000001", "b1", {"id": "2000001",
                           "location": {"code": "x", "name": "Closed stores Med."}}),
        ("2000002", "b1", {"id": "2000002",
                           "location": {"code": "y", "name": "Open shelves"}}),
        ("2000003", "b1", {"id": "2000003",
                           "location": {"code": "z", "name": "On Exhibition"}}),
    ]))
    assert out["b1"] == [
        "2000001|i20000017||ClosedStores|Closed stores",
        "2000002|i20000029||OpenShelves|Open shelves",
        "2000003|i20000030||OnExhibition|On Exhibition",
    ]


def test_items_above_location_uses_unambiguous_fallback(spark):
    out = _items_map(_items_df(spark, [
        ("2000001", "b1", {"id": "2000001",
                           "location": {"code": "x", "name": "Closed stores"}}),
        ("2000002", "b1", {"id": "2000002",
                           "location": {"code": "b", "name": "bound in above"}}),
    ]))
    # the 'above' item inherits the bib's single unambiguous location
    assert out["b1"][1] == "2000002|i20000029||ClosedStores|Closed stores"


def test_items_ambiguous_fallback_yields_no_location(spark):
    out = _items_map(_items_df(spark, [
        ("2000001", "b1", {"id": "2000001",
                           "location": {"code": "x", "name": "Closed stores"}}),
        ("2000002", "b1", {"id": "2000002",
                           "location": {"code": "y", "name": "Open shelves"}}),
        ("2000003", "b1", {"id": "2000003",
                           "location": {"code": "b", "name": "Contained in above"}}),
    ]))
    assert out["b1"][2] == "2000003|i20000030|||"


def test_items_deleted_and_suppressed_dropped(spark):
    out = _items_map(_items_df(spark, [
        ("2000001", "b1", {"id": "2000001", "deleted": True}),
        ("2000002", "b1", {"id": "2000002", "suppressed": True}),
        ("2000003", "b1", {"id": "2000003"}),
    ]))
    assert len(out["b1"]) == 1 and out["b1"][0].startswith("2000003|")


def test_items_volume_title_beats_copy_no(spark):
    out = _items_map(_items_df(spark, [
        ("2000001", "b1", {"id": "2000001", "copyNo": 2,
                           "varFields": [{"fieldTag": "v", "content": "Vol. 1"}]}),
        ("2000002", "b1", {"id": "2000002", "copyNo": 3}),
    ]))
    assert out["b1"] == [
        "2000001|i20000017|Vol. 1||",
        "2000002|i20000029|Copy 3||",
    ]


def test_items_tidy_titles_drops_uniform_automated_titles(spark):
    out = _items_map(_items_df(spark, [
        ("2000001", "b1", {"id": "2000001", "copyNo": 1}),
        ("2000002", "b1", {"id": "2000002", "copyNo": 1}),
    ]))
    # both items say "Copy 1" -> distinguishes nothing -> dropped
    assert out["b1"] == ["2000001|i20000017|||", "2000002|i20000029|||"]


def test_items_title_from_v_subfield_a(spark):
    out = _items_map(_items_df(spark, [
        ("2000001", "b1", {"id": "2000001",
                           "varFields": [{"fieldTag": "v",
                                          "subfields": [{"tag": "a", "content": "Box 7"}]}]}),
    ]))
    assert out["b1"] == ["2000001|i20000017|Box 7||"]
