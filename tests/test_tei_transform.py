"""TEI transformer scenarios (TeiReferenceNumber, bNumber, summary,
merge candidates, deleted records)."""

from catalogue_pipeline_spark.plans.tei_transform import transform_tei

_SCHEMA = "id string, content string, deleted boolean"


def tei_xml(msid="WMS_Arabic_404", extra_msid=None, sierra=None, sierra2=None,
            summary=None, summaries=1):
    parts = ['<TEI xmlns="http://www.tei-c.org/ns/1.0" xml:id="manuscript_1">',
             "<teiHeader><fileDesc><publicationStmt><idno>UkLW</idno>"]
    if msid is not None:
        parts.append(f'<idno type="msID">{msid}</idno>')
    if extra_msid:
        parts.append(f'<idno type="msID">{extra_msid}</idno>')
    parts.append('<idno type="catalogue">Fihrist</idno></publicationStmt>')
    parts.append('<sourceDesc><msDesc><msIdentifier>')
    parts.append('<altIdentifier type="former"><idno>WMS. Or. 1a</idno></altIdentifier>')
    for s in (sierra, sierra2):
        if s:
            parts.append(f'<altIdentifier type="Sierra"><idno>{s}</idno></altIdentifier>')
    parts.append("</msIdentifier><msContents>")
    if summary is not None:
        for _ in range(summaries):
            parts.append(f"<summary>{summary}</summary>")
    parts.append("</msContents></msDesc></sourceDesc></fileDesc></teiHeader></TEI>")
    return "".join(parts)


def one(spark, content, deleted=False, rid="manuscript_1"):
    df = spark.createDataFrame([(rid, content, deleted)], _SCHEMA)
    return transform_tei(df).collect()[0]


def test_visible_work(spark):
    row = one(spark, tei_xml(sierra=" b1234567x ",
                             summary='A copy of <title key="x">al-Qanun</title>'))
    assert row["type"] == "Visible"
    assert row["title"] == "WMS_Arabic_404"
    assert row["reference_number"] == "WMS_Arabic_404"
    assert row["b_number"] == "b1234567x"
    assert row["description"] == "A copy of al-Qanun"
    assert row["merge_candidates"] == [
        "sierra-system-number:b1234567x:Bnumber present in TEI file"
    ]


def test_summary_keeps_p_tags(spark):
    row = one(spark, tei_xml(summary='<p rend="x">First</p><p>Second</p>'))
    assert row["description"] == "<p>First</p><p>Second</p>"


def test_refno_errors(spark):
    missing = one(spark, tei_xml(msid=None))
    assert missing["type"] == "Error"
    assert missing["reason"] == "No <idno type='msID'> found!"
    empty = one(spark, tei_xml(msid=" "))
    assert empty["reason"] == "Empty <idno type='msID'> found!"
    multi = one(spark, tei_xml(extra_msid="Other_1"))
    assert multi["reason"] == "Multiple instances of <idno type='msID'> found!"


def test_multiple_sierra_bnumbers_error(spark):
    row = one(spark, tei_xml(sierra="b1234567x", sierra2="b7654321x"))
    assert row["type"] == "Error"
    assert row["reason"] == "More than one sierra bnumber node!"


def test_multiple_summaries_error(spark):
    row = one(spark, tei_xml(summary="S", summaries=2))
    assert row["reason"] == "More than one summary node!"


def test_invalid_bnumber_no_candidate(spark):
    row = one(spark, tei_xml(sierra="1234567"))
    assert row["type"] == "Visible"
    assert row["b_number"] == "1234567"
    assert row["merge_candidates"] == []


def test_deleted(spark):
    row = one(spark, "", deleted=True)
    assert row["type"] == "Deleted"
    assert row["reason"] == "DeletedFromSource(Deleted by TEI source)"
