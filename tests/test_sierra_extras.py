"""Sierra transformer remainder: shelfmark, 856 electronic resources,
collection paths, on-order items, holdings objects.

Scenario expectations ported from the reference test suites (data-only):
SierraShelfmarkTest.scala, SierraElectronicResourcesTest.scala,
MarcCollectionPathTest.scala, SierraItemsOnOrderTest.scala,
SierraHoldingsTest.scala.
"""

import json

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.sierra_extras import (
    SIERRA_HOLDINGS_SCHEMA,
    collection_path_expr,
    electronic_resources_expr,
    items_on_order,
    shelfmark_expr,
    sierra_holdings,
)
from catalogue_pipeline_spark.plans.sierra_transform import SIERRA_BIB_SCHEMA


def _vf(marc_tag=None, field_tag=None, content=None, subfields=None, ind2=None):
    return {
        "fieldTag": field_tag,
        "marcTag": marc_tag,
        "ind1": None,
        "ind2": ind2,
        "content": content,
        "subfields": subfields,
    }


def _sub(tag, content):
    return {"tag": tag, "content": content}


# ------------------------------------------------------------- shelfmark


def _shelfmark(spark, material_code, icono, item_varfields):
    bib_vfs = []
    if icono is not None:
        bib_vfs.append(_vf(marc_tag="001", content=icono))
    bib = {
        "materialType": {"code": material_code, "value": None},
        "varFields": bib_vfs,
    }
    df = spark.createDataFrame(
        [(json.dumps(bib), json.dumps({"varFields": item_varfields}))],
        "bib string, item string",
    )
    b = F.from_json("bib", SIERRA_BIB_SCHEMA)
    it = F.from_json("item", SIERRA_BIB_SCHEMA)  # only varFields consumed
    from catalogue_pipeline_spark.plans.sierra_transform import (
        _iconographic_number_expr,
    )

    out = df.select(
        shelfmark_expr(
            b.getField("materialType").getField("code"),
            _iconographic_number_expr(b),
            it.getField("varFields"),
        ).alias("s")
    ).collect()
    return out[0]["s"]


F949C = lambda v: _vf(  # noqa: E731
    marc_tag="949", field_tag="c", subfields=[_sub("a", v)]
)


def test_shelfmark_basic(spark):
    # SierraShelfmarkTest: no 949 / plain 949 / whitespace trim
    assert _shelfmark(spark, "a", None, []) is None
    assert _shelfmark(spark, "a", None, [F949C("S7956")]) == "S7956"
    assert _shelfmark(spark, "a", None, [F949C("/MED     ")]) == "/MED"


def test_shelfmark_archives_and_other_tags(spark):
    # A&M bibs (materialType h) suppress the shelfmark entirely
    assert _shelfmark(spark, "h", None, [F949C("PP/CRI/1")]) is None
    # other subfields of 949 are ignored
    vf = _vf(marc_tag="949", field_tag="c", subfields=[_sub("b", "X"), _sub("a", "S2")])
    assert _shelfmark(spark, "a", None, [vf]) == "S2"
    # a 949 with a different fieldTag is ignored
    vf2 = _vf(marc_tag="949", field_tag="a", subfields=[_sub("a", "S3")])
    assert _shelfmark(spark, "a", None, [vf2]) is None


def test_shelfmark_iconographic_rules(spark):
    # i-number on the bib (001 ends in 'i'): equal shelfmark is hidden,
    # a '.'-extension is kept, a different prefix is hidden
    assert _shelfmark(spark, "r", "12345i", [F949C("12345i")]) is None
    assert _shelfmark(spark, "r", "12345i", [F949C("12345i.1")]) == "12345i.1"
    assert _shelfmark(spark, "r", "12345i", [F949C("56789i.1")]) is None


# ------------------------------------------- 856 electronic resources


def _eresources(spark, varfields):
    df = spark.createDataFrame(
        [(json.dumps({"varFields": varfields}),)], "bib string"
    )
    b = F.from_json("bib", SIERRA_BIB_SCHEMA)
    rows = df.select(
        F.explode(electronic_resources_expr(b.getField("varFields"))).alias("r")
    ).select("r.*").collect()
    return [r.asDict() for r in rows]


def test_eresources_url_rules(spark):
    # plain $u → one item, no title/link text
    out = _eresources(
        spark, [_vf(marc_tag="856", subfields=[_sub("u", "https://example.org/journal")])]
    )
    assert out == [
        {"url": "https://example.org/journal", "title": None, "link_text": None,
         "relationship": "Resource"}
    ]
    # not a URL / repeated $u / no $u → nothing
    assert _eresources(
        spark, [_vf(marc_tag="856", subfields=[_sub("u", "search for 'online journals'")])]
    ) == []
    assert _eresources(
        spark,
        [_vf(marc_tag="856", subfields=[_sub("u", "https://a.org/x"), _sub("u", "https://a.org/y")])],
    ) == []
    assert _eresources(
        spark, [_vf(marc_tag="856", subfields=[_sub("a", "https://example.org/journal")])]
    ) == []
    # 855/857 are not electronic resources
    assert _eresources(spark, [_vf(marc_tag="855"), _vf(marc_tag="857")]) == []


def test_eresources_label_heuristic(spark):
    # short CTA label → linkText, with trailing-dot strip and view casing
    out = _eresources(
        spark,
        [_vf(marc_tag="856",
             subfields=[_sub("u", "https://example.org/x"), _sub("z", "view resource.")])],
    )
    assert out[0]["link_text"] == "View resource"
    assert out[0]["title"] is None
    # long label → title
    long_label = "A very long descriptive label that is not a call to action at all"
    out = _eresources(
        spark,
        [_vf(marc_tag="856",
             subfields=[_sub("u", "https://example.org/x"), _sub("y", long_label)])],
    )
    assert out[0]["title"] == long_label
    assert out[0]["link_text"] is None
    # $z + $y + $3 concatenated in document order, trimmed
    out = _eresources(
        spark,
        [_vf(marc_tag="856",
             subfields=[_sub("u", "https://example.org/x"),
                        _sub("z", " Connect "), _sub("3", "to the database")])],
    )
    assert out[0]["link_text"] == "Connect to the database"
    # ind2 = 2 → related resource
    out = _eresources(
        spark,
        [_vf(marc_tag="856", ind2="2",
             subfields=[_sub("u", "https://example.org/x")])],
    )
    assert out[0]["relationship"] == "RelatedResource"


# --------------------------------------------------- collection path


def _cpath(spark, control_001, fields):
    vfs = list(fields)
    if control_001 is not None:
        vfs.insert(0, _vf(marc_tag="001", content=control_001))
    df = spark.createDataFrame(
        [(json.dumps({"varFields": vfs}),)], "bib string"
    )
    b = F.from_json("bib", SIERRA_BIB_SCHEMA)
    return df.select(collection_path_expr(b).alias("p")).collect()[0]["p"]


def test_collection_path_scenarios(spark):
    host = lambda *subs: _vf(marc_tag="773", subfields=list(subs))  # noqa: E731
    const = lambda *subs: _vf(marc_tag="774", subfields=list(subs))  # noqa: E731
    # leaf without $g
    assert _cpath(spark, "record_id", [host(_sub("w", "parent_id"))]) == \
        "parent_id/record_id"
    # leaf with $g tokenised
    assert _cpath(
        spark, "record_id",
        [host(_sub("w", "parent_id"), _sub("g", "Some Qualified Name 1."))],
    ) == "parent_id/Some_Qualified_Name_1_record_id"
    # ids are trimmed; the (Wcat) prefix is stripped (before the trim,
    # matching stripPrefix-then-trim in MarcCollectionPath.scala:214-219)
    assert _cpath(spark, " record_id ", [host(_sub("w", " parent_id "))]) == \
        "parent_id/record_id"
    assert _cpath(spark, "record_id", [host(_sub("w", "(Wcat)parent_id"))]) == \
        "parent_id/record_id"
    # self-referential host → no path
    assert _cpath(spark, "record_id", [host(_sub("w", "record_id"))]) is None
    # root: only constituents
    assert _cpath(
        spark, "record_id", [const(_sub("t", "anything"), _sub("w", "whatever"))]
    ) == "record_id"
    # branch: host + constituents → parent/this
    assert _cpath(
        spark, "record_id",
        [host(_sub("w", "parent_id")),
         const(_sub("t", "anything"), _sub("w", "whatever"))],
    ) == "parent_id/record_id"
    # no 001 → no path; no $w anywhere → no path (773 = series membership)
    assert _cpath(spark, None, [host(_sub("w", "parent_id"))]) is None
    assert _cpath(spark, "record_id", [host(_sub("t", "A series title"))]) is None


# ------------------------------------------------------------ on-order


def _orders_df(spark, orders, bib_ff=None, item_bib_ids=()):
    bibs = spark.createDataFrame(
        [("b1", json.dumps({"fixedFields": bib_ff or {}}))], "id string, content string"
    )
    odf = spark.createDataFrame(
        [("o%d" % i, "b1", json.dumps(o)) for i, o in enumerate(orders)]
        or [("o0", "bX", json.dumps({"id": "0"}))],
        "order_id string, bib_id string, content string",
    )
    items = None
    if item_bib_ids:
        items = spark.createDataFrame(
            [(b,) for b in item_bib_ids], "bib_id string"
        )
    out = items_on_order(bibs, odf, items).filter(F.col("bib_id") == "b1").collect()
    return out[0]["order_items"]


def _order(sid, status=None, odate=None, rdate=None, suppressed=False, deleted=False):
    ff = {}
    if status is not None:
        ff["20"] = {"label": "STATUS", "value": status, "display": None}
    if odate is not None:
        ff["13"] = {"label": "ODATE", "value": odate, "display": None}
    if rdate is not None:
        ff["17"] = {"label": "RDATE", "value": rdate, "display": None}
    return {"id": sid, "suppressed": suppressed, "deleted": deleted, "fixedFields": ff}


def test_items_on_order_messages(spark):
    # SierraItemsOnOrderTest: status o + ODATE, no RDATE
    assert _orders_df(spark, [_order("1", "o", odate="2001-01-01")]) == [
        "Ordered for Wellcome Collection on 1 January 2001"
    ]
    # order date missing or unparseable → no "on" suffix
    assert _orders_df(spark, [_order("1", "o")]) == ["Ordered for Wellcome Collection"]
    assert _orders_df(spark, [_order("1", "c", odate="tomorrow")]) == [
        "Ordered for Wellcome Collection"
    ]
    # status a + RDATE → awaiting cataloguing
    assert _orders_df(
        spark, [_order("1", "a", odate="2001-01-01", rdate="2002-02-02")]
    ) == ["Awaiting cataloguing for Wellcome Collection"]
    # unrecognised status ignored
    assert _orders_df(spark, [_order("1", "z", odate="2001-01-01")]) == []


def test_items_on_order_gates_and_dedup(spark):
    # deduplicates identical messages; sorted by order number
    assert _orders_df(
        spark,
        [_order("2", "o", odate="2001-01-01"), _order("1", "o", odate="2001-01-01"),
         _order("3", "o", odate="2002-03-04")],
    ) == [
        "Ordered for Wellcome Collection on 1 January 2001",
        "Ordered for Wellcome Collection on 4 March 2002",
    ]
    # suppressed / deleted orders are ignored
    assert _orders_df(spark, [_order("1", "o", suppressed=True)]) == []
    assert _orders_df(spark, [_order("1", "o", deleted=True)]) == []
    # any item record on the bib → no order items
    assert _orders_df(spark, [_order("1", "o")], item_bib_ids=["b1"]) == []
    # a CAT DATE (fixed field 28) → no order items
    assert _orders_df(
        spark, [_order("1", "o")],
        bib_ff={"28": {"label": "CAT DATE", "value": "2021-05-03", "display": None}},
    ) == []


# ------------------------------------------------------------- holdings


def _holdings(spark, recs):
    df = spark.createDataFrame(
        [("h%d" % i, "b1", json.dumps(r)) for i, r in enumerate(recs)],
        "holdings_id string, bib_id string, content string",
    )
    rows = sierra_holdings(df).orderBy("kind", "url", "note").collect()
    return [r.asDict() for r in rows]


def _hrec(sid="1000001", loc=None, varfields=(), deleted=False, suppressed=False):
    ff = {}
    if loc is not None:
        ff["40"] = {"label": "LOCATION", "value": loc, "display": None}
    return {
        "id": sid, "deleted": deleted, "suppressed": suppressed,
        "fixedFields": ff, "varFields": list(varfields),
    }


def test_holdings_physical(spark):
    # 866 $a description + $z note, stax location (padded code), 949 shelfmark
    out = _holdings(
        spark,
        [_hrec(loc="stax ", varfields=[
            _vf(marc_tag="866", subfields=[_sub("a", "Vol. 1-5"), _sub("z", "Gaps")]),
            _vf(marc_tag="949", subfields=[_sub("a", "/MED     ")]),
        ])],
    )
    assert len(out) == 1
    h = out[0]
    assert h["kind"] == "physical"
    assert h["note"] == "Gaps"
    assert h["enumeration"] == ["Vol. 1-5"]
    assert h["loc_type"] == "ClosedStores" and h["loc_label"] == "Closed stores"
    assert h["shelfmark"] == "/MED"
    # a holdings record with no 866 and no enumeration is dropped
    assert _holdings(spark, [_hrec(loc="stax ")]) == []
    # deleted / suppressed are dropped
    assert _holdings(spark, [_hrec(loc="stax ", deleted=True, varfields=[
        _vf(marc_tag="866", subfields=[_sub("a", "Vol. 1")])])]) == []


def test_holdings_digital_and_url_merge(spark):
    f856 = lambda *subs: _vf(marc_tag="856", subfields=list(subs))  # noqa: E731
    # elro → digital holdings carrying the 856 item title as the note
    out = _holdings(
        spark,
        [_hrec(loc="elro ", varfields=[
            f856(_sub("u", "https://example.org/journal"),
                 _sub("z", "A long enough label that is clearly a title here")),
        ])],
    )
    assert len(out) == 1
    assert out[0]["kind"] == "digital"
    assert out[0]["url"] == "https://example.org/journal"
    assert out[0]["note"].startswith("A long enough label")
    # two records, same URL, compatible (one has linkText, other empty) → merged
    out = _holdings(
        spark,
        [
            _hrec(sid="1000002", loc="elro ", varfields=[
                f856(_sub("u", "https://example.org/x"), _sub("z", "View resource"))]),
            _hrec(sid="1000003", loc="elro ", varfields=[
                f856(_sub("u", "https://example.org/x"))]),
        ],
    )
    assert len(out) == 1
    assert out[0]["link_text"] == "View resource"
    # incompatible (two different linkTexts) → both kept
    out = _holdings(
        spark,
        [
            _hrec(sid="1000002", loc="elro ", varfields=[
                f856(_sub("u", "https://example.org/x"), _sub("z", "View resource"))]),
            _hrec(sid="1000003", loc="elro ", varfields=[
                f856(_sub("u", "https://example.org/x"), _sub("z", "Access here"))]),
        ],
    )
    assert len(out) == 2


def test_holdings_schema_roundtrip(spark):
    # SIERRA_HOLDINGS_SCHEMA parses the full record shape
    rec = _hrec(loc="stax ", varfields=[_vf(marc_tag="866", subfields=[_sub("a", "v1")])])
    df = spark.createDataFrame([(json.dumps(rec),)], "content string")
    parsed = df.select(F.from_json("content", SIERRA_HOLDINGS_SCHEMA).alias("h")).collect()
    assert parsed[0]["h"]["fixedFields"]["40"]["value"] == "stax "


# --------------------------------------------------------- full bundle


def test_sierra_work_bundle(spark):
    from catalogue_pipeline_spark.plans.sierra_extras import sierra_work_bundle

    bib = {
        "id": "1000001",
        "deleted": False,
        "suppressed": False,
        "varFields": [
            _vf(field_tag="a", marc_tag="245", subfields=[_sub("a", "A title")]),
            _vf(marc_tag="001", content="1000001"),
            _vf(marc_tag="773", subfields=[_sub("w", "(Wcat)parent9")]),
            _vf(marc_tag="856", subfields=[_sub("u", "https://example.org/r")]),
        ],
    }
    bibs = spark.createDataFrame(
        [("1000001", json.dumps(bib))], "id string, content string"
    )
    items = spark.createDataFrame(
        [("i1", "1000001",
          json.dumps({"id": "2000001", "varFields": [
              _vf(marc_tag="949", field_tag="c", subfields=[_sub("a", "S55")])]}))],
        "item_id string, bib_id string, content string",
    )
    orders = spark.createDataFrame(
        [("o1", "1000001", json.dumps(_order("7000001", "o", odate="2001-01-01")))],
        "order_id string, bib_id string, content string",
    )
    holdings = spark.createDataFrame(
        [("h1", "1000001", json.dumps(_hrec(loc="stax ", varfields=[
            _vf(marc_tag="866", subfields=[_sub("a", "Vol. 1-3")])])))],
        "holdings_id string, bib_id string, content string",
    )
    row = (
        sierra_work_bundle(bibs, items, orders, holdings)
        .filter(F.col("sierra_id") == "1000001")
        .collect()[0]
    )
    assert row["collection_path"] == "parent9/1000001"
    assert row["eresources"] == ["https://example.org/r|||Resource"]
    assert len(row["items"]) == 1 and row["items"][0].endswith("|S55")
    # items exist → the on-order gate yields nothing
    assert row["order_items"] == []
    assert row["holdings"] == [
        "physical||Vol. 1-3|ClosedStores|Closed stores|||"
    ]
