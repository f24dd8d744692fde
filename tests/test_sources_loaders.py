"""File snapshot loaders (S5) and time-window planning (S2)."""

import datetime as dt

from catalogue_pipeline_spark.cdc.replay import plan_time_ranges
from catalogue_pipeline_spark.sources import load_jsonl_records, load_xml_records


def test_load_jsonl(spark, tmp_path):
    p = tmp_path / "snap.jsonl"
    p.write_text(
        '{"conv_id": "a", "turn_idx": "0", "role": "user", "text": "hi", "tool": null}\n'
        '{"conv_id": "a", "turn_idx": "1", "role": "assistant", "text": "yo", "tool": "t1"}\n'
    )
    df = load_jsonl_records(spark, str(p))
    rows = {(r["conv_id"], r["turn_idx"]): r for r in df.collect()}
    assert rows[("a", 1)]["tool"] == "t1"
    assert df.schema["turn_idx"].dataType.typeName() == "long"


def test_load_xml(spark, tmp_path):
    p = tmp_path / "snap.xml"
    p.write_text(
        "<record><conv_id>a</conv_id><turn_idx>0</turn_idx><role>user</role>"
        "<text>hello xml</text></record>\n"
        "<record><conv_id>b</conv_id><turn_idx>3</turn_idx><role>tool</role>"
        "<text>payload</text><tool>t9</tool></record>\n"
        "<junk>not a record</junk>\n"
    )
    df = load_xml_records(spark, str(p))
    rows = {(r["conv_id"], r["turn_idx"]): r for r in df.collect()}
    assert rows[("a", 0)]["text"] == "hello xml"
    assert rows[("b", 3)]["tool"] == "t9"
    assert len(rows) == 2  # junk line dropped


def test_plan_time_ranges_overlap():
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 2, 0)
    ws = plan_time_ranges(t0, t1, window_minutes=30, overlap_minutes=1)
    # consecutive windows overlap by exactly 1 minute (build_windows.py:57-65)
    for (_, s1, e1), (_, s2, _) in zip(ws, ws[1:]):
        assert s2 == e1 - dt.timedelta(minutes=1)
    assert ws[0][1] == t0 and ws[-1][2] == t1


def test_marcxml_collection_loader(spark, tmp_path):
    """Real multi-record MARCXML (marcxml_loader.py semantics): records split
    from a whole-file <collection>, ids from 001 else 035$a with the
    parenthetical prefix stripped; strict mode raises on id-less records."""
    import pytest as _pytest

    from catalogue_pipeline_spark.sources.loaders import load_marcxml_collection

    xml = """<?xml version="1.0"?>
<marc:collection xmlns:marc="http://www.loc.gov/MARC21/slim">
  <marc:record>
    <marc:controlfield tag="001">ebs001</marc:controlfield>
    <marc:datafield tag="245"><marc:subfield code="a">Title One</marc:subfield></marc:datafield>
  </marc:record>
  <marc:record>
    <marc:controlfield tag="001">  ebs002  </marc:controlfield>
  </marc:record>
  <marc:record>
    <marc:datafield tag="035">
      <marc:subfield code="a">(OCoLC)oc35-id</marc:subfield>
    </marc:datafield>
  </marc:record>
</marc:collection>
"""
    p = tmp_path / "drop"
    p.mkdir()
    (p / "full.xml").write_text(xml)
    got = {r["id"]: r for r in load_marcxml_collection(spark, str(p)).collect()}
    assert set(got) == {"ebs001", "ebs002", "oc35-id"}  # 001 trimmed, 035 prefix stripped
    assert all(r["namespace"] == "ebsco" for r in got.values())
    assert "<marc:controlfield" in got["ebs001"]["content"]
    assert "Title One" in got["ebs001"]["content"]

    # an id-less record: strict raises, non-strict drops
    (p / "full.xml").write_text(
        xml.replace('<marc:controlfield tag="001">ebs001</marc:controlfield>', "")
    )
    with _pytest.raises(ValueError, match="MissingRecordIdentifier"):
        load_marcxml_collection(spark, str(p)).collect()
    loose = load_marcxml_collection(spark, str(p), strict=False)
    assert {r["id"] for r in loose.collect()} == {"ebs002", "oc35-id"}


def test_marcxml_035_without_subfield_a_does_not_steal_later_ids(spark, tmp_path):
    """A 035 datafield with NO $a must not take subfield a from a LATER
    datafield (e.g. 040$a) — the match is bounded at </datafield>, so the
    record is correctly id-less (strict raises MissingRecordIdentifier)."""
    import pytest as _pytest

    from catalogue_pipeline_spark.sources.loaders import load_marcxml_collection

    xml = """<?xml version="1.0"?>
<marc:collection xmlns:marc="http://www.loc.gov/MARC21/slim">
  <marc:record>
    <marc:datafield tag="035">
      <marc:subfield code="z">cancelled-id</marc:subfield>
    </marc:datafield>
    <marc:datafield tag="040">
      <marc:subfield code="a">NOT-AN-ID</marc:subfield>
    </marc:datafield>
  </marc:record>
  <marc:record>
    <marc:controlfield tag="001">keep1</marc:controlfield>
  </marc:record>
</marc:collection>
"""
    p = tmp_path / "drop035"
    p.mkdir()
    (p / "full.xml").write_text(xml)
    with _pytest.raises(ValueError, match="MissingRecordIdentifier"):
        load_marcxml_collection(spark, str(p)).collect()
    loose = load_marcxml_collection(spark, str(p), strict=False)
    assert {r["id"] for r in loose.collect()} == {"keep1"}  # 040$a NOT taken
