"""SierraHoldingsEnumeration parity: the reference's test cases
(SierraHoldingsEnumerationTest.scala) ported verbatim, plus the Spark UDF
wiring."""

import json

from catalogue_pipeline_spark.functions.holdings import (
    holdings_enumeration,
    holdings_enumeration_udf,
)


def vf(marcTag, *subs, fieldTag=None, content=None):
    d = {"marcTag": marcTag, "subfields": [{"tag": t, "content": c} for t, c in subs]}
    if fieldTag:
        d["fieldTag"] = fieldTag
    if content is not None:
        d["content"] = content
    return d


def test_empty():
    assert holdings_enumeration([]) == []


def test_single_pair():
    fields = [
        vf("853", ("8", "10"), ("a", "vol."), ("i", "(year)")),
        vf("863", ("8", "10.1"), ("a", "1"), ("i", "1995")),
    ]
    assert holdings_enumeration(fields) == ["vol.1 (1995)"]


def test_range_with_start_end():
    fields = [
        vf("863", ("8", "1.1"), ("a", "1-35"), ("b", "1-2"), ("i", "1984-2018")),
        vf("853", ("8", "1"), ("a", "v."), ("b", "no."), ("i", "(year)")),
    ]
    assert holdings_enumeration(fields) == ["v.1:no.1 (1984) - v.35:no.2 (2018)"]


def test_deduplicates_rendered_values():
    fields = [
        vf("863", ("8", "1.1"), ("i", "2004-"), ("j", "01-"), ("k", "01-")),
        vf("863", ("8", "1.2"), ("i", "2004-"), ("j", "01-"), ("k", "01-")),
        vf("853", ("8", "1"), ("i", "(year)"), ("j", "(month)"), ("k", "(day)")),
    ]
    assert holdings_enumeration(fields) == ["1 Jan. 2004 -"]


def test_skips_empty_values():
    fields = [
        vf("863", ("8", "1.1"), ("a", ""), ("b", "1-101"), ("i", "1982-2010")),
        vf("853", ("8", "1"), ("a", "v."), ("b", "no."), ("i", "(year)")),
    ]
    assert holdings_enumeration(fields) == ["no.1 (1982) - no.101 (2010)"]


def test_skips_empty_values_at_one_end_of_range():
    fields = [
        vf("863", ("8", "1.1"), ("a", "1-130"), ("b", "-1"), ("i", "1979-2010")),
        vf("853", ("8", "1"), ("a", "v."), ("b", "no."), ("i", "(year)")),
    ]
    assert holdings_enumeration(fields) == ["v.1 (1979) - v.130:no.1 (2010)"]


def test_dash_values_dropped():
    fields = [
        vf("863", ("8", "1.1"), ("a", "-"), ("b", "1-21"), ("i", "1984-2004")),
        vf("853", ("8", "1"), ("a", "v."), ("b", "no."), ("i", "(year)")),
    ]
    assert holdings_enumeration(fields) == ["no.1 (1984) - no.21 (2004)"]


def test_multi_part_ranges_split_once():
    fields = [
        vf("863", ("8", "1.1"), ("a", "12-21"), ("b", "1-1-2"), ("i", "2009-2018")),
        vf("853", ("8", "1"), ("a", "v."), ("b", "no."), ("i", "(year)")),
    ]
    assert holdings_enumeration(fields) == ["v.12:no.1 (2009) - v.21:no.1-2 (2018)"]


def test_bare_date_loses_parens():
    fields = [
        vf("863", ("8", "1.1"), ("i", "2010-2020")),
        vf("853", ("8", "1"), ("i", "(year)")),
    ]
    assert holdings_enumeration(fields) == ["2010 - 2020"]


def test_season_names():
    fields = [
        vf("863", ("8", "1.1"), ("a", "41-57"), ("b", "4-2"),
           ("i", "1992-2008"), ("j", "23-21")),
        vf("863", ("8", "1.2"), ("a", "57-59"), ("b", "4-1"),
           ("i", "2008-2009"), ("j", "23-24")),
        vf("863", ("8", "1.4"), ("a", "60-61"), ("b", "3-2"),
           ("i", "2011-2012"), ("j", "22-21")),
        vf("853", ("8", "1"), ("a", "v."), ("b", "no."), ("i", "(year)"),
           ("j", "(season)")),
    ]
    assert holdings_enumeration(fields) == [
        "v.41:no.4 (Autumn 1992) - v.57:no.2 (Spring 2008)",
        "v.57:no.4 (Autumn 2008) - v.59:no.1 (Winter 2009)",
        "v.60:no.3 (Summer 2011) - v.61:no.2 (Spring 2012)",
    ]


def test_month_range_and_slash():
    fields = [
        vf("853", ("8", "1"), ("i", "(year)"), ("j", "(month)")),
        vf("863", ("8", "1.1"), ("i", "2005-2014/2015"), ("j", "07-12/01")),
    ]
    assert holdings_enumeration(fields) == ["July 2005 - Dec./Jan. 2014/2015"]


def test_public_note_appended():
    fields = [
        vf("863", ("8", "1.1"), ("a", "1-2"), ("b", "1-2"),
           ("z", "Current issue on display")),
        vf("853", ("8", "1"), ("a", "v."), ("b", "no.")),
    ]
    assert holdings_enumeration(fields) == [
        "v.1:no.1 - v.2:no.2 Current issue on display"
    ]


def test_sorts_by_link_and_sequence():
    fields = [
        vf("863", ("8", "2.1"), ("a", "2"), ("b", "1")),
        vf("863", ("8", "1.2"), ("a", "1"), ("b", "2")),
        vf("863", ("8", "1.1"), ("a", "1"), ("b", "1")),
        vf("853", ("8", "1"), ("a", "v."), ("b", "no.")),
        vf("853", ("8", "2"), ("a", "v."), ("b", "no.")),
    ]
    assert holdings_enumeration(fields) == ["v.1:no.1", "v.1:no.2", "v.2:no.1"]


def test_human_written_enumeration_first():
    fields = [
        {"fieldTag": "h", "content": "A written description"},
        vf("863", ("8", "1.1"), ("a", "1")),
        vf("853", ("8", "1"), ("a", "v.")),
    ]
    assert holdings_enumeration(fields) == ["A written description", "v.1"]


def test_unparseable_links_dropped():
    fields = [
        vf("863", ("8", "x.y"), ("a", "1")),
        vf("863", ("8", "1"), ("a", "1")),       # no sequence
        vf("863", ("8", "9.1"), ("a", "1")),     # no matching label
        vf("853", ("8", "zz"), ("a", "v.")),
    ]
    assert holdings_enumeration(fields) == []


def test_udf_wiring(spark):
    df = spark.createDataFrame(
        [("h1", json.dumps([
            {"marcTag": "853", "subfields": [
                {"tag": "8", "content": "10"}, {"tag": "a", "content": "vol."},
                {"tag": "i", "content": "(year)"}]},
            {"marcTag": "863", "subfields": [
                {"tag": "8", "content": "10.1"}, {"tag": "a", "content": "1"},
                {"tag": "i", "content": "1995"}]},
        ]))],
        "id string, varfields string",
    )
    out = df.select("id", holdings_enumeration_udf()("varfields").alias("e")).collect()
    assert out[0]["e"] == ["vol.1 (1995)"]
