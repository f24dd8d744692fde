"""METS transformer scenarios (MetsTitle, MetsLicence, MetsAccessStatus,
MetsMergeCandidate, deleted records)."""

import pytest

from catalogue_pipeline_spark.plans.mets_transform import transform_mets

_SCHEMA = "id string, content string, deleted boolean"


def mets_xml(titles=("A scan",), dz=None, status=None, usage=None):
    parts = ['<mets:mets><mets:dmdSec ID="DMDLOG_0000"><mets:mdWrap MDTYPE="MODS">'
             "<mets:xmlData><mods:mods>"]
    for t in titles:
        parts.append(f"<mods:titleInfo><mods:title>{t}</mods:title></mods:titleInfo>")
    for typ, v in (("dz", dz), ("status", status), ("usage", usage)):
        if v is not None:
            parts.append(f'<mods:accessCondition type="{typ}">{v}</mods:accessCondition>')
    parts.append("</mods:mods></mets:xmlData></mets:mdWrap></mets:dmdSec></mets:mets>")
    return "".join(parts)


def one(spark, content, rid="B1234567x", deleted=False):
    df = spark.createDataFrame([(rid, content, deleted)], _SCHEMA)
    return transform_mets(df).collect()[0]


def test_invisible_work_with_lowercased_bnumber(spark):
    row = one(spark, mets_xml(dz="CC-BY", status="Open"))
    assert row["id"] == "b1234567x"
    assert row["type"] == "Invisible"
    assert row["reason"] == "MetsWorksAreNotVisible"
    assert row["title"] == "A scan"
    assert row["licence"] == "cc-by"
    assert row["access_status"] == "Open"
    assert row["merge_candidates"] == ["sierra-system-number:b1234567x:METS work"]


def test_archivematica_id_goes_to_calm(spark):
    row = one(spark, mets_xml(), rid="f5217b45-b742-472b-95c3-f136d5de1104")
    assert row["merge_candidates"] == [
        "calm-ref-no:f5217b45-b742-472b-95c3-f136d5de1104:METS work"
    ]


def test_titles_distinct_joined(spark):
    row = one(spark, mets_xml(titles=("Vol 1", "Vol 1", "Vol 2")))
    assert row["title"] == "Vol 1 Vol 2"


def test_licence_special_cases_and_errors(spark):
    assert one(spark, mets_xml(dz="Copyright not cleared"))["licence"] == "inc"
    assert one(spark, mets_xml(
        dz="rightsstatements.org/page/InC/1.0/?language=en"))["licence"] == "inc"
    assert one(spark, mets_xml(
        dz="In copyright"))["licence"] == "inc"
    assert one(spark, mets_xml(
        dz="https://creativecommons.org/licenses/by-nc/4.0/"))["licence"] == "cc-by-nc"
    bad = one(spark, mets_xml(dz="No known licence"))
    assert bad["type"] == "Error"
    assert "Couldn't match No known licence to a license" in bad["reason"]


def test_access_status_table(spark):
    assert one(spark, mets_xml(status="Requires registration"))["access_status"] == "OpenWithAdvisory"
    assert one(spark, mets_xml(status="Clinical images"))["access_status"] == "Restricted"
    bad = one(spark, mets_xml(status="Secret"))
    assert bad["type"] == "Error"


def test_deleted_record(spark):
    row = one(spark, "", deleted=True)
    assert row["type"] == "Deleted"
    assert row["reason"] == "DeletedFromSource(Mets)"
    assert row["merge_candidates"] == []
    assert row["title"] is None
