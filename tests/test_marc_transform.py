"""EBSCO MARC transformer scenarios, mirroring the reference's test cases
(catalogue_graph/tests/adapters/transformers/marc/test_title.py,
test_other_identifiers.py, ebsco/test_transformer.py) plus the V2 no-op
re-transform invariant."""

import pytest

from catalogue_pipeline_spark.plans.marc_transform import (
    transform_ebsco_marc,
    transform_report,
)


def _rec(rec_id, fields, deleted=False):
    return (rec_id, f"<record>{fields}</record>", deleted)


def _cf001(v):
    return f'<controlfield tag="001">{v}</controlfield>'


def _df(tag, *subs):
    inner = "".join(f'<subfield code="{c}">{v}</subfield>' for c, v in subs)
    return f'<datafield tag="{tag}">{inner}</datafield>'


SCHEMA = "id string, content string, deleted boolean"


def run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["id"]: r for r in transform_ebsco_marc(df).collect()}


def test_title_a_only(spark):
    got = run(spark, [_rec("r1", _cf001("ebs1") + _df("245", ("a", "How to Avoid Huge Ships")))])
    assert got["ebs1"]["type"] == "Visible"
    assert got["ebs1"]["title"] == "How to Avoid Huge Ships"


def test_title_a_b_joined_with_space(spark):
    got = run(
        spark,
        [
            _rec(
                "r1",
                _cf001("ebs1")
                + _df(
                    "245",
                    ("a", "101 Ways to Know If Your Cat Is French:"),
                    ("b", "How To Talk to Your Cat About Their Secret Life"),
                ),
            )
        ],
    )
    assert (
        got["ebs1"]["title"]
        == "101 Ways to Know If Your Cat Is French: How To Talk to Your Cat About Their Secret Life"
    )


def test_title_trailing_h_dropped_and_inner_h_bracket_stripped(spark):
    # trailing $h is dropped entirely
    got = run(
        spark,
        [_rec("r1", _cf001("e1") + _df("245", ("a", "A title"), ("h", "[electronic resource]")))],
    )
    assert got["e1"]["title"] == "A title"
    # a retained (non-last) $h has ALL bracketed segments removed, then trim
    got2 = run(
        spark,
        [
            _rec(
                "r2",
                _cf001("e2")
                + _df(
                    "245",
                    ("a", "A map"),
                    ("h", "[cartographic material] :"),
                    ("b", "of somewhere"),
                ),
            )
        ],
    )
    assert got2["e2"]["title"] == "A map : of somewhere"


def test_title_ignores_unselected_subfields_and_preserves_order(spark):
    got = run(
        spark,
        [
            _rec(
                "r1",
                _cf001("e1")
                + _df("245", ("a", "Part one"), ("6", "880-01"), ("n", "Vol. 2"), ("p", "The sequel")),
            )
        ],
    )
    assert got["e1"]["title"] == "Part one Vol. 2 The sequel"


def test_missing_245_and_blank_title_are_error_rows_not_batch_failures(spark):
    got = run(
        spark,
        [
            _rec("r1", _cf001("e1")),  # no 245
            _rec("r2", _cf001("e2") + _df("245", ("a", ""), ("b", " "))),  # blank
            _rec("r3", _cf001("e3") + _df("245", ("a", "Fine"))),
        ],
    )
    assert got["e1"]["type"] == "Error" and "245" in got["e1"]["error"]
    assert got["e2"]["type"] == "Error" and "Empty" in got["e2"]["error"].title()
    assert got["e3"]["type"] == "Visible"


def test_missing_001_is_error(spark):
    got = run(spark, [_rec("raw-id", _df("245", ("a", "No id")))])
    assert got["raw-id"]["type"] == "Error" and "001" in got["raw-id"]["error"]


def test_other_identifiers_isbn_issn_only_with_subfield_a(spark):
    got = run(
        spark,
        [
            _rec(
                "r1",
                _cf001("e1")
                + _df("245", ("a", "T"))
                + _df("020", ("a", "978-3-16-148410-0"))
                + _df("020", ("z", "cancelled"))  # no $a → skipped
                + _df("022", ("a", "2049-3630")),
            )
        ],
    )
    assert got["e1"]["other_identifiers"] == ["isbn:978-3-16-148410-0", "issn:2049-3630"]


def test_deleted_record_becomes_deleted_work_with_reason(spark):
    got = run(
        spark,
        [_rec("r1", _cf001("e1") + _df("245", ("a", "Was here")), True)],
    )
    assert got["e1"]["type"] == "Deleted"
    assert got["e1"]["title"] is None
    assert got["e1"]["deleted_reason"] == "deleted from source"


def test_xml_entities_unescaped(spark):
    got = run(
        spark,
        [_rec("r1", _cf001("e1") + _df("245", ("a", "Salt &amp; pepper &lt;3")))],
    )
    assert got["e1"]["title"] == "Salt & pepper <3"


def test_alternative_titles_caption_skipped_and_deduped(spark):
    """130/240/246 become alternative titles; a 246 with ind2=6 (caption) is
    skipped; values are trimmed, blanks dropped, duplicates removed with
    first-occurrence order preserved (marc/alternative_titles.py)."""
    fields = (
        _cf001("e1")
        + _df("245", ("a", "Main"))
        + _df("130", ("a", "Uniform title"))
        + '<datafield tag="246" ind1="3" ind2="6"><subfield code="a">Caption title</subfield></datafield>'
        + '<datafield tag="246" ind1="3" ind2="0"><subfield code="a"> Varying form </subfield></datafield>'
        + _df("240", ("a", "Uniform title"))  # duplicate of the 130 value
        + _df("246", ("a", ""))  # blank → dropped
    )
    got = run(spark, [_rec("r1", fields)])
    assert got["e1"]["alternative_titles"] == ["Uniform title", "Varying form"]


def test_description_520_with_links(spark):
    """520 $a/$b/$c + $u per field inside <p>, URL-shaped $u as an HTML
    link, fields joined with newlines (marc/description.py)."""
    fields = (
        _cf001("e1")
        + _df("245", ("a", "T"))
        + _df("520", ("a", "A summary. "), ("u", "https://example.org/x"))
        + _df("520", ("a", "Second."), ("u", "not a url"))
    )
    got = run(spark, [_rec("r1", fields)])
    assert got["e1"]["description"] == (
        '<p>A summary. <a href="https://example.org/x">https://example.org/x</a></p>\n'
        "<p>Second. not a url</p>"
    )
    # no 520 → NULL description
    got2 = run(spark, [_rec("r2", _cf001("e2") + _df("245", ("a", "T")))])
    assert got2["e2"]["description"] is None


def test_contributors_types_roles_primary_dedupe(spark):
    """ebsco/contributors.py rules: type from tag suffix, type-specific label
    subfields, $e roles (trailing period trimmed, ellipsis kept), primary
    (1xx) contributors fronted, duplicates equal-apart-from-primary removed
    keeping the primary occurrence."""
    fields = (
        _cf001("e1")
        + _df("245", ("a", "T"))
        + _df("700", ("a", "Smith, Jane,"), ("e", "editor."))  # added entry FIRST in doc
        + _df("100", ("a", "Smith, Jane,"), ("e", "editor."))  # primary duplicate
        + _df("110", ("a", "Acme Corp"), ("b", "Research Div."))
        + _df("111", ("a", "Big Meeting"), ("n", "(2nd)"), ("e", "organizer"))
    )
    got = run(spark, [_rec("r1", fields)])
    assert got["e1"]["contributors"] == [
        # primaries fronted in document order; the 700 duplicate of the 100
        # (equal apart from primary) is dropped, keeping the primary
        "Person|Smith, Jane|editor|P",  # trailing comma trimmed, role period trimmed
        "Organisation|Acme Corp Research Div.||P",  # label period PRESERVED
        "Meeting|Big Meeting (2nd)|organizer|P",  # meeting label = a,c,d,n,t only
    ]


def test_contributors_role_ellipsis_and_secondary(spark):
    fields = (
        _cf001("e1")
        + _df("245", ("a", "T"))
        + _df("700", ("a", "Doe, John"), ("e", "author..."))  # ellipsis kept
        + _df("710", ("a", "Other Org"))
    )
    got = run(spark, [_rec("r1", fields)])
    assert got["e1"]["contributors"] == [
        "Person|Doe, John|author...|S",
        "Organisation|Other Org||S",
    ]


def test_subjects_keep_rule_and_label_builds(spark):
    """ebsco/subjects.py: ind2 ∈ {0,2} kept, ind2=7 only with a recognised
    $2, others dropped; 650 joins $a with v/x/y/z via ' - '; 600 appends $e
    and $x space-joined without period trimming; blank $a dropped."""
    f650 = '<datafield tag="650" ind1=" " ind2="0"><subfield code="a">Medicine</subfield><subfield code="x">History</subfield><subfield code="z">England</subfield></datafield>'
    f650_7ok = '<datafield tag="650" ind1=" " ind2="7"><subfield code="a">Kept.</subfield><subfield code="2">homoit</subfield></datafield>'
    f650_7no = '<datafield tag="650" ind1=" " ind2="7"><subfield code="a">Dropped</subfield><subfield code="2">fast</subfield></datafield>'
    f650_blank = '<datafield tag="650" ind1=" " ind2="0"><subfield code="a"> </subfield></datafield>'
    f600 = '<datafield tag="600" ind1="1" ind2="0"><subfield code="a">Darwin, Charles,</subfield><subfield code="d">1809-1882.</subfield><subfield code="x">Travel</subfield></datafield>'
    fields = _cf001("e1") + _df("245", ("a", "T")) + f650 + f650_7ok + f650_7no + f650_blank + f600
    got = run(spark, [_rec("r1", fields)])
    assert got["e1"]["subjects"] == [
        "Medicine - History - England",
        "Kept",  # trailing period stripped (non-600), $2=homoit kept
        "Darwin, Charles, 1809-1882. Travel",  # 600: no period trim
    ]


def test_edition_format_language(spark):
    """Positional-field rules: format needs online form-of-item (006[6]='o')
    on a language-material leader ([6]='a'), bibliographic level [7] picks
    ebooks/ejournals; language = 008 chars 35-37 via the code lookup;
    edition = 250 $a."""
    leader = "<leader>00000pam a22000003i 4500</leader>"  # [6]=a, [7]=m
    f006 = '<controlfield tag="006">m     o  d  |||||</controlfield>'
    f008 = '<controlfield tag="008">900716s1991    maub    ob    001 0 lat  </controlfield>'
    rec = (
        leader + _cf001("e1") + f006 + f008
        + _df("245", ("a", "T")) + _df("250", ("a", "2nd ed."))
    )
    got = run(spark, [_rec("r1", rec)])
    assert got["e1"]["edition"] == "2nd ed."
    assert got["e1"]["format"] == "ebooks"
    assert got["e1"]["language"] == "lat:Latin"

    # serial bibliographic level → ejournals; print form (006[6] blank) → None
    rec2 = (
        "<leader>00000cas a22000003  4500</leader>" + _cf001("e2") + f006
        + _df("245", ("a", "T"))
    )
    got2 = run(spark, [_rec("r2", rec2)])
    assert got2["e2"]["format"] == "ejournals"
    rec3 = (
        leader + _cf001("e3")
        + '<controlfield tag="006">m        d  |||||</controlfield>'
        + _df("245", ("a", "T"))
    )
    got3 = run(spark, [_rec("r3", rec3)])
    assert got3["e3"]["format"] is None
    # unknown language code → no language (from_code None semantics)
    rec4 = (
        leader + _cf001("e4")
        + '<controlfield tag="008">900716s1991    maub    ob    001 0 zxx  </controlfield>'
        + _df("245", ("a", "T"))
    )
    got4 = run(spark, [_rec("r4", rec4)])
    assert got4["e4"]["language"] is None and got4["e4"]["edition"] is None


def test_production_260_preferred_and_264_functions(spark):
    """ebsco/production.py: 260 events win over 264; 260 with $e/$f/$g gains
    function Manufacture; 264 function from ind2 (4/blank dropped); places
    trim trailing colon, agents trailing comma, dates trailing period."""
    f260 = _df("260", ("a", "London :"), ("b", "Printed for the author,"), ("c", "1850."))
    f264 = '<datafield tag="264" ind1=" " ind2="1"><subfield code="a">York :</subfield><subfield code="b">Pub,</subfield><subfield code="c">2001.</subfield></datafield>'
    got = run(spark, [_rec("r1", _cf001("e1") + _df("245", ("a", "T")) + f260 + f264)])
    assert got["e1"]["production"] == [
        "|London : Printed for the author, 1850.|London|Printed for the author|1850"
    ]
    # no 260 → the 264 event, with its ind2 function
    got2 = run(spark, [_rec("r2", _cf001("e2") + _df("245", ("a", "T")) + f264)])
    assert got2["e2"]["production"] == ["Publication|York : Pub, 2001.|York|Pub|2001"]
    # 264 ind2=4 (copyright) is dropped entirely
    f264c = f264.replace('ind2="1"', 'ind2="4"')
    got3 = run(spark, [_rec("r3", _cf001("e3") + _df("245", ("a", "T")) + f264c)])
    assert got3["e3"]["production"] == []
    # 260 with manufacture subfields
    f260m = _df("260", ("a", "Leeds :"), ("b", "B,"), ("c", "1900."), ("f", "Maker,"))
    got4 = run(spark, [_rec("r4", _cf001("e4") + _df("245", ("a", "T")) + f260m)])
    assert got4["e4"]["production"][0].startswith("Manufacture|")
    assert got4["e4"]["production"][0].endswith("|Leeds|B;Maker|1900")


def test_008_maximal_date_range_and_period_parse(spark):
    """parsers/field008.py maximal_date_range shapes, then the range parsed
    through the engine's period parser (the production-date wiring)."""
    from catalogue_pipeline_spark.plans.marc_transform import (
        transform_ebsco_marc,
        with_production_period,
    )

    def rec8(rid, data):
        return _rec(rid, _cf001(rid) + f'<controlfield tag="008">{data}</controlfield>' + _df("245", ("a", "T")))

    cases = {
        "s1": ("||||||s1925uuuu", "1925", "1925-01-01", "1925-12-31"),
        "s2": ("||||||s192uuuuu", "1920-1929", "1920-01-01", "1929-12-31"),
        "c1": ("||||||u1979uuuu", "1979-", "1979-01-01", "9999-12-31"),
        "d1": ("||||||d19uu200u", "1900-2009", "1900-01-01", "2009-12-31"),
        "q1": ("||||||q19251956", "1925-1956", "1925-01-01", "1956-12-31"),
        "n1": ("||||||n1979uuuu", None, None, None),
        "u4": ("||||||suuuuuuuu", None, None, None),
    }
    rows = [rec8(rid, data) for rid, (data, *_rest) in cases.items()]
    df = with_production_period(transform_ebsco_marc(spark.createDataFrame(rows, SCHEMA)))
    got = {r["id"]: r for r in df.collect()}
    for rid, (_data, rng, from_, to_) in cases.items():
        assert got[rid]["date_range_008"] == rng, rid
        assert got[rid]["prod_from"] == from_, rid
        assert got[rid]["prod_to"] == to_, rid


def test_designation_frequency_genres_holdings(spark):
    """The remaining EbscoWorkBuilder fields: 362 designation, 310 current
    frequency, 655 genres (single-$a rule, subdivisions, Electronic Books
    sentence-casing, dedupe), 856 holdings (needs $3+$z+URL-shaped $u)."""
    fields = (
        _cf001("e1")
        + _df("245", ("a", "T"))
        + _df("362", ("a", "Vol. 1 (1990)-"))
        + _df("310", ("a", "Monthly,"), ("b", "1990-1995"))
        + _df("310", ("a", "Quarterly"))
        + _df("655", ("a", "Electronic Books."))
        + _df("655", ("a", "Periodicals"), ("x", "History."), ("z", "England"))
        + _df("655", ("a", "Periodicals"), ("x", "History."), ("z", "England"))  # dup
        + _df("655", ("a", "First"), ("a", "Second"))  # repeated $a → dropped
        + _df("655", ("x", "No primary"))  # no $a → dropped
        + _df("856", ("3", "v.1"), ("z", "View online"), ("u", "https://ex.org/1"))
        + _df("856", ("3", "v.2"), ("z", "View online"), ("u", "not-a-url"))  # bad url
        + _df("856", ("z", "no enum"), ("u", "https://ex.org/3"))  # missing $3
    )
    got = run(spark, [_rec("r1", fields)])["e1"]
    assert got["designation"] == ["Vol. 1 (1990)-"]
    assert got["current_frequency"] == "Monthly, 1990-1995 Quarterly"
    assert got["genres"] == ["Electronic books", "Periodicals - History. - England"]
    assert got["holdings"] == ["v.1|View online|https://ex.org/1"]


def test_parents_series_titles(spark):
    """440/490/773/830 → Series parents (ebsco/parents.py): first value of
    the tag's subfield codes, ';' then ',' suffixes removed, deduped."""
    fields = (
        _cf001("e1")
        + _df("245", ("a", "T"))
        + _df("490", ("a", "Studies in things ;"))
        + _df("773", ("t", "Host journal,"), ("g", "Vol. 2"))
        + _df("830", ("a", "Studies in things"))  # dup after trimming
        + _df("440", ("x", "no matching code"))  # none of the tag's codes
    )
    got = run(spark, [_rec("r1", fields)])["e1"]
    assert got["parents"] == ["Studies in things", "Host journal"]


def test_transform_report_counts(spark):
    df = spark.createDataFrame(
        [
            _rec("r1", _cf001("e1") + _df("245", ("a", "ok"))),
            _rec("r2", _cf001("e2")),  # error
        ],
        SCHEMA,
    )
    rep = transform_report(transform_ebsco_marc(df))
    assert rep == {"success_count": 1, "failure_count": 1}


def test_retransform_is_noop_through_merge_path(spark, tmp_path):
    """V2: transformed works are deterministic in (content, deleted), so
    writing a re-transform of UNCHANGED records through the LWW merge commits
    nothing (no bucket rewritten, snapshot id unchanged)."""
    import datetime as dt
    import os

    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.cdc import STATE_SCHEMA
    from catalogue_pipeline_spark.cdc.merge import merge_into_state
    from catalogue_pipeline_spark.lake import LakeTable

    rows = [
        _rec("r1", _cf001("e1") + _df("245", ("a", "Work one"))),
        _rec("r2", _cf001("e2") + _df("245", ("a", "Work two"), ("b", "subtitle"))),
        _rec("r3", _cf001("e3") + _df("245", ("a", "Gone")), True),
    ]
    records = spark.createDataFrame(rows, SCHEMA)
    ts = dt.datetime(2024, 5, 1, 12, 0, 0)

    def as_state(works):
        # works → the engine's state shape: one turn per work, title as text
        return works.select(
            F.col("id").alias("conv_id"),
            F.lit(0).cast("long").alias("turn_idx"),
            F.lit("work").alias("role"),
            F.col("title").alias("text"),
            F.concat_ws(",", "other_identifiers").alias("tool"),
            F.lit(ts).cast("timestamp").alias("ts"),
            F.when(F.col("type") == "Deleted", 1).otherwise(0).alias("op_pri"),
            F.lit(1).cast("long").alias("offset"),
            F.when(F.col("type") != "Deleted", F.lit(ts).cast("timestamp")).alias("nd_ts"),
            F.when(F.col("type") != "Deleted", F.lit(1).cast("long")).alias("nd_offset"),
            F.when(F.col("type") == "Deleted", "true").otherwise("false").alias("deleted"),
            F.lit(1).cast("long").alias("n_events"),
        )

    table = LakeTable.create(
        os.path.join(str(tmp_path), "works"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=4
    )
    works1 = transform_ebsco_marc(records)
    sid1, m1 = merge_into_state(spark, table, as_state(works1), changeset_id="t1")
    assert sid1 is not None and m1.keys_in == 3 and m1.events_applied >= 3

    # re-transform the SAME records → merge is a complete no-op
    works2 = transform_ebsco_marc(records)
    sid2, m2 = merge_into_state(spark, table, as_state(works2), changeset_id="t2")
    assert sid2 is None  # V3: no commit at all
    assert m2.noop_updates == 3 and m2.events_applied == 0
    assert table.current_snapshot_id() == sid1


def test_008_fallback_production_event_with_place(spark):
    """ebsco/production.py:30-71 + parsers/field008.py:69-80: with no 260/
    264 event, the 008 maximal date range becomes a standalone production
    event whose place resolves from 008 chars 15-17 through the MARC
    country-code table (lookups/places.py); an unresolvable code ('|||' or
    'xx ') yields a place-less event; dtype 'n'/'|' yields NO event; a
    present 260 suppresses the 008 event entirely."""
    def rec8(rid, data, extra=""):
        return _rec(
            rid,
            _cf001(rid)
            + f'<controlfield tag="008">{data}</controlfield>'
            + _df("245", ("a", "T"))
            + extra,
        )

    got = run(spark, [rec8("e1", "900716s1991    mau")])
    assert got["e1"]["production"] == ["|1991|Massachusetts||1991"]
    # Scotland place code per the reference doctest (field008.py:72-73)
    got2 = run(spark, [rec8("e2", "900716s1979uuuustk")])
    assert got2["e2"]["production"] == ["|1979|Scotland||1979"]
    # unresolvable place code -> event without a place
    got3 = run(spark, [rec8("e3", "900716s1979uuuu|||")])
    assert got3["e3"]["production"] == ["|1979|||1979"]
    # dtype '|' (no attempt to code) / 'n' (unknown) -> no range -> no event
    got4 = run(spark, [rec8("e4", "||||||n1979uuuu")])
    assert got4["e4"]["production"] == []
    got4b = run(spark, [rec8("e4b", "|||||||1979uuuustk")])
    assert got4b["e4b"]["production"] == []
    # a 260 event wins over the 008 fallback
    f260 = _df("260", ("a", "London :"), ("c", "1850."))
    got5 = run(spark, [rec8("e5", "900716s1991    mau", f260)])
    assert got5["e5"]["production"] == ["|London : 1850.|London||1850"]
