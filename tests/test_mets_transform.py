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


# ---------------- Archivematica / Premis variant (round 5) ----------------
# Scenarios mirrored from PremisAccessConditionsTest.scala and
# ArchivematicaMetsXMLTest.scala.

def arch_mets(identifiers=("AR/CH/1",), rights_md=True, basis=None,
              copyright_note=None, license_note=None, grants=()):
    parts = ["<mets:mets><mets:amdSec>",
             '<mets:digiprovMD ID="digiprovMD_1"><mets:mdWrap><mets:xmlData>'
             "<premis:agent><premis:agentName>Archivematica</premis:agentName>"
             "</premis:agent></mets:xmlData></mets:mdWrap></mets:digiprovMD>"]
    if rights_md:
        parts.append('<mets:rightsMD ID="rightsMD_1"><mets:mdWrap MDTYPE="PREMIS:RIGHTS">'
                     '<mets:xmlData><premis:rightsStatement xmlns:premis="http://www.loc.gov/premis/v3">')
        if basis is not None:
            parts.append(f"<premis:rightsBasis>{basis}</premis:rightsBasis>")
        if copyright_note is not None:
            parts.append("<premis:copyrightInformation>"
                         "<premis:copyrightStatus>copyrighted</premis:copyrightStatus>"
                         "<premis:copyrightStatusDeterminationDate />"
                         f"<premis:copyrightNote>{copyright_note}</premis:copyrightNote>"
                         "</premis:copyrightInformation>")
        if license_note is not None:
            parts.append("<premis:licenseInformation>"
                         f"<premis:licenseNote>{license_note}</premis:licenseNote>"
                         "</premis:licenseInformation>")
        for act, note in grants:
            parts.append(f"<premis:rightsGranted><premis:act>{act}</premis:act>"
                         f"<premis:rightsGrantedNote>{note}</premis:rightsGrantedNote>"
                         "</premis:rightsGranted>")
        parts.append("</premis:rightsStatement></mets:xmlData></mets:mdWrap></mets:rightsMD>")
    parts.append("</mets:amdSec>"
                 '<mets:dmdSec ID="dmdSec_1"><mets:mdWrap MDTYPE="OTHER"><mets:xmlData><dublincore>')
    for i in identifiers:
        parts.append(f"<dc:identifier>{i}</dc:identifier>")
    parts.append("</dublincore></mets:xmlData></mets:mdWrap></mets:dmdSec></mets:mets>")
    return "".join(parts)


def test_arch_access_conditions_from_rights_md(spark):
    """'extracts accessConditions from a rightsMD element': Copyright basis →
    copyrightNote licence, use-act note → access status; usage None."""
    row = one(spark, arch_mets(basis="Copyright", copyright_note="In copyright",
                               grants=[("use", "Open")]), rid="store1")
    assert row["type"] == "Invisible"
    assert row["licence"] == "inc"
    assert row["access_status"] == "Open"
    assert row["access_usage"] is None
    assert row["file_refs"] == [] and row["thumbnail_url"] is None


def test_arch_record_identifier_from_dublincore(spark):
    """'extracts the recordIdentifier from a dublincore identifier element' —
    lowercased for the work id, raw in the calm merge candidate."""
    row = one(spark, arch_mets(identifiers=("BA/AD/FO/OD",), basis="Copyright",
                               copyright_note="In copyright"), rid="store1")
    assert row["id"] == "ba/ad/fo/od"
    assert row["merge_candidates"] == ["calm-ref-no:BA/AD/FO/OD:METS work"]


def test_arch_license_basis_routes_license_note(spark):
    """'pulls out the licenceNote where rightsBasis is License'."""
    row = one(spark, arch_mets(basis="License", copyright_note="In copyright",
                               license_note="CC-BY-NC"), rid="store1")
    assert row["licence"] == "cc-by-nc"


def test_arch_missing_basis_prefers_copyright_note(spark):
    """'pulls out the copyrightNote where rightsBasis is not specified'."""
    row = one(spark, arch_mets(copyright_note="In copyright",
                               license_note="CC-BY"), rid="store1")
    assert row["licence"] == "inc"


def test_arch_empty_rights_md_has_no_conditions(spark):
    """'has no access conditions if none are given' / 'creates empty
    accessConditions if the relevant fields are absent'."""
    row = one(spark, arch_mets(), rid="store1")
    assert row["type"] == "Invisible"
    assert row["licence"] is None and row["access_status"] is None


def test_arch_non_use_act_ignored_and_first_use_wins(spark):
    """'ignores a rightsGrantedNote if it is not for the use act' + 'finds
    the correct rightsGrantedNote if there are more than one'."""
    row = one(spark, arch_mets(basis="Copyright", copyright_note="In copyright",
                               grants=[("replicate", "Open"),
                                       ("use", "Open with advisory"),
                                       ("use", "Closed")]), rid="store1")
    assert row["access_status"] == "OpenWithAdvisory"
    row = one(spark, arch_mets(grants=[("disseminate", "Open")]), rid="store1")
    assert row["access_status"] is None


def test_arch_unexpected_notes_error(spark):
    """'fails if the copyrightNote/accessStatus is something unexpected'."""
    row = one(spark, arch_mets(basis="Copyright",
                               copyright_note="Yow! CABBAGE-BRAINED!"), rid="store1")
    assert row["type"] == "Error" and "to a license" in row["reason"]
    row = one(spark, arch_mets(grants=[("use", "flexible friend")]), rid="store1")
    assert row["type"] == "Error" and "to an access status" in row["reason"]


def test_arch_identifier_failures(spark):
    """'fails if a document has multiple identifiers' + missing identifier."""
    row = one(spark, arch_mets(identifiers=("A", "B")), rid="store1")
    assert row["type"] == "Error"
    assert row["reason"] == "multiple candidate record identifiers found"
    assert row["id"] == "store1"  # falls back to the store key
    row = one(spark, arch_mets(identifiers=()), rid="store1")
    assert row["type"] == "Error"
    assert row["reason"] == "could not find record identifier"


def test_arch_missing_rights_md_errors(spark):
    """'fails if a document has no rights information'."""
    row = one(spark, arch_mets(rights_md=False), rid="store1")
    assert row["type"] == "Error"
    assert row["reason"] == (
        "Archivematica Mets file must contain a premis-compatible rightsMD element")


def test_strict_flavour_errors_on_unknown(spark):
    """MetsXml.apply: 'Could not determine which flavour of METS to parse'
    — opt-in via strict_flavour (the lenient default keeps legacy fixtures
    parsing as Goobi, documented in the module docstring)."""
    df = spark.createDataFrame([("x1", "<mets:mets></mets:mets>", False)], _SCHEMA)
    row = transform_mets(df, strict_flavour=True).collect()[0]
    assert row["type"] == "Error"
    assert row["reason"] == "Could not determine which flavour of METS to parse"
    row = transform_mets(df).collect()[0]
    assert row["type"] == "Invisible"  # lenient default: Goobi path


def test_goobi_header_detected_as_goobi(spark):
    """A Goobi metsHdr agent keeps the MODS path even when an Archivematica
    digiprovMD appears later (reference checks Goobi first)."""
    content = ('<mets:mets><mets:metsHdr CREATEDATE="2016-01-01T00:00:00">'
               "<mets:agent><mets:name>Goobi - UGH-1.11.0</mets:name></mets:agent>"
               "</mets:metsHdr>"
               '<mets:dmdSec ID="D1"><mets:mdWrap MDTYPE="MODS"><mets:xmlData><mods:mods>'
               "<mods:titleInfo><mods:title>T</mods:title></mods:titleInfo>"
               '<mods:accessCondition type="dz">CC-BY</mods:accessCondition>'
               "</mods:mods></mets:xmlData></mets:mdWrap></mets:dmdSec></mets:mets>")
    row = one(spark, content, rid="B1234567x")
    assert row["type"] == "Invisible" and row["licence"] == "cc-by"
    assert row["id"] == "b1234567x"


def test_location_url_prefix_by_flavour(spark):
    """MetsLocation + locationPrefix: 'v2/' for Goobi (InvisibleMetsData,
    MetsData.scala:144-147), '' for Archivematica ('uses the
    recordIdentifier to determine the location')."""
    row = one(spark, mets_xml(dz="CC-BY"))
    assert row["location_url"] == (
        "https://iiif.wellcomecollection.org/presentation/v2/b1234567x")
    row = one(spark, arch_mets(identifiers=("BA/AD/FO/OD",)), rid="store1")
    assert row["location_url"] == (
        "https://iiif.wellcomecollection.org/presentation/BA/AD/FO/OD".lower())


def test_created_date_version_gate_and_formats(spark):
    """CREATEDATE reformatted to ...'Z' (bare → assumed UTC, offset
    normalised); 'ignores CREATEDATE ... when version is not 1'."""
    content = ('<mets:mets><mets:metsHdr CREATEDATE="2016-05-08T10:11:12">'
               "</mets:metsHdr></mets:mets>")
    df = spark.createDataFrame([("B1234567x", content, False, 1)],
                               _SCHEMA + ", version int")
    row = transform_mets(df).collect()[0]
    assert row["created_date"] == "2016-05-08T10:11:12Z"
    df2 = spark.createDataFrame([("B1234567x", content.replace('12"', '12+01:00"'), False, 1)],
                                _SCHEMA + ", version int")
    assert transform_mets(df2).collect()[0]["created_date"] == "2016-05-08T09:11:12Z"
    df3 = spark.createDataFrame([("B1234567x", content, False, 2)],
                                _SCHEMA + ", version int")
    assert transform_mets(df3).collect()[0]["created_date"] is None
