"""Parity tests for the Axiell MARCXML transformer slice.

Scenarios ported from the reference's Axiell suites
(catalogue_graph/tests/adapters/transformers/axiell/):
test_suppression.py, test_access_status.py, test_predecessor_identifier.py,
test_languages.py, test_terms_of_use.py, test_notes.py,
test_merge_candidates.py, test_transformer.py and the bdd features
(work_type, other_identifiers, collection_path, production,
minimal_record).  One Spark job per test class keeps the suite fast: each
collects a batch of per-scenario records in a single transform_axiell call.
"""

import pytest

from catalogue_pipeline_spark.plans.axiell_transform import transform_axiell

TODAY = "2025-01-01"


def _field(tag, subs, ind1=" ", ind2=" "):
    body = "".join(
        f'<subfield code="{c}">{v}</subfield>' for c, v in subs
    )
    return (
        f'<datafield tag="{tag}" ind1="{ind1}" ind2="{ind2}">{body}</datafield>'
    )


def _record(
    identifier="test001",
    catalogue_status="catalogued",
    ref_no="TestRefNo",
    publish_to_web=None,
    extra="",
    include_005=True,
    include_245=True,
    include_351=True,
):
    """Mirror of the reference conftest's make_axiell_record."""
    parts = ["<record>"]
    if identifier is not None:
        parts.append(f'<controlfield tag="001">{identifier}</controlfield>')
    if include_245:
        parts.append(_field("245", [("a", "Test Title")]))
    if include_005:
        parts.append('<controlfield tag="005">18530821094530.0</controlfield>')
    if ref_no is not None:
        parts.append(_field("035", [("a", f"(Calm RefNo){ref_no}")]))
    if include_351:
        parts.append(_field("351", [("c", "Item")]))
    if catalogue_status is not None:
        parts.append(_field("583", [("l", catalogue_status)], ind1="0"))
    if publish_to_web is not None:
        parts.append(_field("981", [("a", publish_to_web)]))
    parts.append(extra)
    parts.append("</record>")
    return "".join(parts)


def _run(spark, cases):
    """cases: dict name → content.  Returns name → Row dict."""
    df = spark.createDataFrame(
        [(k, v, False) for k, v in cases.items()],
        "id string, content string, deleted boolean",
    )
    out = transform_axiell(df, today=TODAY)
    rows = {}
    for r in out.collect():
        rows.setdefault(r["id"], r.asDict())
    # re-key by the synthetic batch id for records lacking 001
    by_batch = {r["id"]: r.asDict() for r in out.collect()}
    return by_batch


# ---------------------------------------------------------- suppression


def test_suppression_rules(spark):
    """test_suppression.py, all scenarios in one batch."""
    cases = {
        "s1": _record(identifier="s1", catalogue_status="catalogued"),
        "s2": _record(identifier="s2", catalogue_status="partially complete"),
        "s3": _record(identifier="s3", catalogue_status="Catalogued"),
        "s4": _record(identifier="s4", catalogue_status="CATALOGUED"),
        "s5": _record(identifier="s5", catalogue_status="draft"),
        "s6": _record(identifier="s6", catalogue_status="in progress"),
        "s7": _record(identifier="s7", publish_to_web="no"),
        "s8": _record(identifier="s8", publish_to_web="yes"),
        "s9": _record(identifier="s9"),
        "s10": _record(identifier="s10", publish_to_web="unexpected"),
        "s11": _record(identifier="s11", publish_to_web="no", ref_no=None),
        "s12": _record(identifier="s12", catalogue_status=None),
        "s13": _record(identifier="s13", catalogue_status="draft", ref_no=None),
        "s14": _record(identifier="s14", catalogue_status=None, ref_no=None),
        "s15": _record(identifier="s15", ref_no=None),
        "s16": _record(
            identifier="s16",
            extra=_field("035", [("a", "(AltRefNo)AMSG-Research-Guide-001")]),
        ),
        "s17": _record(
            identifier="s17", extra=_field("035", [("a", "(AltRefNo)PP/ABC/1")])
        ),
        "s18": _record(identifier="s18", catalogue_status="mangled"),
    }
    rows = _run(spark, cases)
    visible = {"s1", "s2", "s3", "s4", "s8", "s9", "s10", "s17"}
    deleted = {"s5", "s6", "s7", "s11", "s12", "s13", "s14", "s16"}
    for k in visible:
        assert rows[k]["type"] == "Visible", (k, rows[k]["error"])
    for k in deleted:
        assert rows[k]["type"] == "Deleted", (k, rows[k]["type"])
        assert rows[k]["deleted_reason"] == "suppressed: Axiell"
    # catalogued without RefNo is a record error, not a batch failure
    assert rows["s15"]["type"] == "Error"
    assert rows["s15"]["error"] == "Missing RefNo on work 's15'."
    # unknown catalogue status is a record error
    assert rows["s18"]["type"] == "Error"
    assert rows["s18"]["error"] == (
        "Unexpected Axiell catalogue status (record progress) value "
        "'mangled' on record 's18'."
    )


# --------------------------------------------------------- access status


def test_access_status_rules(spark):
    """test_access_status.py: the six 506 $f/$g interactions."""
    cases = {
        "a1": _record(identifier="a1", extra=_field("506", [("f", "CLOSED")])),
        "a2": _record(
            identifier="a2",
            extra=_field("506", [("f", "OPEN"), ("g", "2999-01-01")]),
        ),
        "a3": _record(
            identifier="a3", extra=_field("506", [("f", "RESTRICTIONSAPPLY")])
        ),
        "a4": _record(identifier="a4", extra=_field("506", [("g", "2999-01-01")])),
        "a5": _record(identifier="a5", extra=_field("506", [("g", "2001-01-01")])),
        "a6": _record(
            identifier="a6",
            extra=_field("506", [("f", "PRIVATE"), ("g", "2999-01-01")]),
        ),
    }
    rows = _run(spark, cases)
    assert rows["a1"]["access_status"] == "closed"
    assert rows["a2"]["access_status"] == "open"
    assert rows["a3"]["access_status"] == "restricted"
    assert rows["a4"]["access_status"] == "closed"
    assert rows["a5"]["access_status"] is None
    assert rows["a6"]["access_status"] == "closed"


# ---------------------------------------------------------- predecessor


UUID1 = "f1fab6a1-b172-418f-93eb-bc24740e266d"
UUID2 = "2637bb63-9ffa-4a51-93d9-be35038d39f9"


def test_predecessor_identifier(spark):
    """test_predecessor_identifier.py: 907 $a UUID extraction."""
    cases = {
        "p1": _record(identifier="p1", extra=_field("907", [("a", UUID1)])),
        "p2": _record(identifier="p2", extra=_field("907", [("a", f".{UUID2}")])),
        "p3": _record(identifier="p3"),
        "p4": _record(
            identifier="p4",
            extra=_field("907", [("a", UUID1)]) + _field("907", [("a", UUID1)]),
        ),
        "p5": _record(
            identifier="p5",
            extra=_field("907", [("a", UUID1)]) + _field("907", [("a", UUID2)]),
        ),
        "p6": _record(identifier="p6", extra=_field("907", [("a", "1234567")])),
        "p7": _record(
            identifier="p7",
            extra=_field("907", [("a", "2637bb639ffa-4a51-93d9-be35038d39f9")]),
        ),
    }
    rows = _run(spark, cases)
    assert rows["p1"]["predecessor_id"] == UUID1
    assert rows["p2"]["predecessor_id"] == UUID2
    assert rows["p3"]["predecessor_id"] is None
    assert rows["p4"]["predecessor_id"] == UUID1
    assert rows["p5"]["type"] == "Error"
    assert (
        rows["p5"]["error"]
        == "Multiple distinct instances of varfield with tag 907"
    )
    for k in ("p6", "p7"):
        assert rows[k]["type"] == "Error"
        assert (
            rows[k]["error"]
            == "Predecessor identifier does not match CALM record ID format"
        )


# ------------------------------------------------------------ work type


LEVEL_TABLE = [
    ("collection", "Collection"),
    ("section", "Section"),
    ("sub-section", "Section"),
    ("series", "Series"),
    ("sub-series", "Series"),
    ("item", "Standard"),
    ("item part", "Standard"),
    ("fonds", "Collection"),
    ("sub-fonds", "Section"),
    ("file", "Standard"),
    ("CoLlECtIon", "Collection"),  # case-insensitive
]


def test_work_type_levels(spark):
    """work_type.feature: 351 $c level table, case-insensitive.  One batch
    — each parametrized scenario is a record in a single transform call."""
    cases = {
        f"w{i}": _record(
            identifier=f"w{i}",
            include_351=False,
            extra=_field("351", [("c", level)]),
        )
        for i, (level, _) in enumerate(LEVEL_TABLE)
    }
    rows = _run(spark, cases)
    for i, (level, expected) in enumerate(LEVEL_TABLE):
        assert rows[f"w{i}"]["work_type"] == expected, level


def test_missing_and_unknown_level_are_errors(spark):
    cases = {
        "w2": _record(identifier="w2", include_351=False),
        "w3": _record(
            identifier="w3",
            include_351=False,
            extra=_field("351", [("c", "shoebox")]),
        ),
    }
    rows = _run(spark, cases)
    assert rows["w2"]["type"] == "Error"
    assert (
        rows["w2"]["error"]
        == "Missing hierarchical level (work type) on record 'w2'."
    )
    assert rows["w3"]["type"] == "Error"
    assert (
        rows["w3"]["error"]
        == "Unknown hierarchical level 'shoebox' on record 'w3'."
    )


# ----------------------------------------------------- other identifiers


ID_TABLE = [
    ("(Bibliographic Number)b11839053", "sierra-system-number", "b11839053"),
    ("(Bibliographic Number).b11839053", "sierra-system-number", "b11839053"),
    ("(Sierra Number)i12056868", "sierra-identifier", "i12056868"),
    ("(Mimsy reference)WELL-55", "mimsy-reference", "WELL-55"),
    ("(WI number)L0023438", "miro-image-number", "L0023438"),
    ("(accession number)172", "wellcome-accession-number", "172"),
    ("(Library Reference Number)20385i.3", "iconographic-number", "20385i.3"),
    ("(Library Reference Number)20385i", "iconographic-number", "20385i"),
    ("(Library Reference Number)BA/NA/NA", "calm-altref-no", "BA/NA/NA"),
]


def test_other_identifier_schemes(spark):
    """other_identifiers.feature scenario outline, one batch."""
    cases = {
        f"o{i}": _record(
            identifier=f"o{i}", extra=_field("035", [("a", raw)])
        )
        for i, (raw, _, _) in enumerate(ID_TABLE)
    }
    rows = _run(spark, cases)
    for i, (raw, scheme, value) in enumerate(ID_TABLE):
        assert f"{scheme}:{value}" in rows[f"o{i}"]["other_identifiers"], raw


def test_multiple_other_identifiers_kept_in_order(spark):
    rows = _run(
        spark,
        {
            "o2": _record(
                identifier="o2",
                extra=_field("035", [("a", "(Bibliographic Number)b11839053")])
                + _field("035", [("a", "(Mimsy reference)WELL-55")])
            )
        },
    )
    assert rows["o2"]["other_identifiers"] == [
        "calm-ref-no:TestRefNo",
        "sierra-system-number:b11839053",
        "mimsy-reference:WELL-55",
    ]


# -------------------------------------------------- collection path / ref


def test_collection_path_and_reference_number(spark):
    """collection_path.feature: path from calm-ref-no, label from the
    calm-altref-no; the LAST identifier of each scheme wins."""
    cases = {
        "c1": _record(identifier="c1"),
        "c2": _record(
            identifier="c2", extra=_field("035", [("a", "(AltRefNo)PP/MIA/1")])
        ),
        "c3": _record(
            identifier="c3",
            extra=_field("035", [("a", "(AltRefNo)PP/A/1")])
            + _field("035", [("a", "(AltRefNo)PP/B/2")]),
        ),
    }
    rows = _run(spark, cases)
    assert rows["c1"]["ref_no"] == "TestRefNo"
    assert rows["c1"]["alt_ref_no"] is None
    assert rows["c2"]["alt_ref_no"] == "PP/MIA/1"
    assert rows["c3"]["alt_ref_no"] == "PP/B/2"


# ------------------------------------------------------ merge candidates


def test_merge_candidates(spark):
    """test_merge_candidates.py: calm-ref-no → Archivematica,
    sierra-system-number → CALM/Sierra harvest; AltRefNo none."""
    cases = {
        "m1": _record(identifier="m1"),
        "m2": _record(
            identifier="m2",
            extra=_field("035", [("a", "(Bibliographic Number)b12345678")]),
        ),
        "m3": _record(
            identifier="m3", extra=_field("035", [("a", "(AltRefNo)PP/WIT/A/1")])
        ),
    }
    rows = _run(spark, cases)
    assert rows["m1"]["merge_candidates"] == [
        "Archivematica work~calm-ref-no:TestRefNo"
    ]
    assert (
        "CALM/Sierra harvest work~sierra-system-number:b12345678"
        in rows["m2"]["merge_candidates"]
    )
    assert rows["m3"]["merge_candidates"] == [
        "Archivematica work~calm-ref-no:TestRefNo"
    ]


# ------------------------------------------------------------- languages


def _langs_of(row):
    return [tuple(reversed(x.split("~", 1))) for x in row["languages"]]


def test_languages_exact_and_multiple(spark):
    """test_languages.py exact/multiple-match tables."""
    mk = lambda i, v: _record(identifier=i, extra=_field("546", [("a", v)]))
    cases = {
        "l1": mk("l1", "English"),
        "l2": mk("l2", "Mandarin"),
        "l3": mk("l3", "Middle English"),
        "l4": mk("l4", "Portuguese\nSpanish"),
        "l5": mk("l5", "English."),
        "l6": mk("l6", "English`"),
        "l7": mk("l7", "German; French"),
        "l8": mk("l8", "English, Chinese"),
        "l9": mk("l9", "German, French, "),
        "l10": mk("l10", "English/French"),
        "l11": mk("l11", "English/Ganda"),
        "l12": mk("l12", "English and Russian"),
    }
    rows = _run(spark, cases)
    assert _langs_of(rows["l1"]) == [("English", "eng")]
    assert _langs_of(rows["l2"]) == [("Mandarin", "chi")]
    assert _langs_of(rows["l3"]) == [("Middle English", "enm")]
    assert _langs_of(rows["l4"]) == [("Portuguese", "por"), ("Spanish", "spa")]
    assert _langs_of(rows["l5"]) == [("English", "eng")]
    assert _langs_of(rows["l6"]) == [("English", "eng")]
    assert _langs_of(rows["l7"]) == [("German", "ger"), ("French", "fre")]
    assert _langs_of(rows["l8"]) == [("English", "eng"), ("Chinese", "chi")]
    assert _langs_of(rows["l9"]) == [("German", "ger"), ("French", "fre")]
    assert _langs_of(rows["l10"]) == [("English", "eng"), ("French", "fre")]
    assert _langs_of(rows["l11"]) == [("English", "eng"), ("Ganda", "lug")]
    assert _langs_of(rows["l12"]) == [("English", "eng"), ("Russian", "rus")]
    for k in cases:
        assert not [n for n in rows[k]["notes"] if n.startswith("language-note~")]


def test_languages_tags_fuzzy_and_fallback(spark):
    mk = lambda i, v: _record(identifier=i, extra=_field("546", [("a", v)]))
    cases = {
        "f1": mk("f1", "&lt;language&gt;French&lt;/language&gt;"),
        "f2": mk(
            "f2",
            '&lt;language langcode="ger"&gt;German, &lt;/language&gt;'
            '&lt;language langcode="fre"&gt;French, &lt;/language&gt;',
        ),
        "f3": mk("f3", "Portguese"),
        "f4": mk("f4", "Lugandan"),
        "f5": mk("f5", "Swiss-German"),
        "f6": mk("f6", "Eng"),
        "f7": mk("f7", "Language"),
        "f8": mk("f8", "English and Norweigan"),
        "f9": mk("f9", "English, Portugese, French and Spanish"),
        "f10": mk(
            "f10", "Partly in German, partly in English, some articles in French."
        ),
        "f11": mk("f11", "Nigerian"),
    }
    rows = _run(spark, cases)
    assert _langs_of(rows["f1"]) == [("French", "fre")]
    assert _langs_of(rows["f2"]) == [("German", "ger"), ("French", "fre")]
    assert _langs_of(rows["f3"]) == [("Portuguese", "por")]
    assert _langs_of(rows["f4"]) == [("Luganda", "lug")]
    assert _langs_of(rows["f5"]) == [("Swiss German", "gsw")]
    assert _langs_of(rows["f6"]) == [("English", "eng")]
    assert _langs_of(rows["f7"]) == []
    assert _langs_of(rows["f8"]) == [("English", "eng"), ("Norwegian", "nor")]
    assert _langs_of(rows["f9"]) == [
        ("English", "eng"),
        ("Portuguese", "por"),
        ("French", "fre"),
        ("Spanish", "spa"),
    ]
    # fallback: capitalised salvage + the verbatim text as a language note
    assert _langs_of(rows["f10"]) == [
        ("German", "ger"),
        ("English", "eng"),
        ("French", "fre"),
    ]
    assert (
        "language-note~Partly in German, partly in English, some articles in"
        " French." in rows["f10"]["notes"]
    )
    assert _langs_of(rows["f11"]) == []
    assert "language-note~Nigerian" in rows["f11"]["notes"]


def test_languages_multi_value_dedup_and_spelling(spark):
    cases = {
        "d1": _record(
            identifier="d1",
            extra=_field("546", [("a", "English; German")])
            + _field("546", [("a", "French with a Polish translation")])
            + _field("546", [("a", "Dutch")])
            + _field("546", [("a", "Chinese inscription")]),
        ),
        "d2": _record(
            identifier="d2",
            extra=_field("546", [("a", "English; Chinese")])
            + _field("546", [("a", "Chinese inscription")])
            + _field("546", [("a", "Chinese inscription")]),
        ),
        "d3": _record(
            identifier="d3",
            extra=_field(
                "546",
                [(
                    "a",
                    "The majority of this collection is in English, however"
                    " Kitzinger recieved letters from around the world and"
                    " travelled widely for conferences so some material is"
                    " not.",
                )],
            ),
        ),
    }
    rows = _run(spark, cases)
    assert _langs_of(rows["d1"]) == [
        ("English", "eng"),
        ("German", "ger"),
        ("French", "fre"),
        ("Polish", "pol"),
        ("Dutch", "dut"),
        ("Chinese", "chi"),
    ]
    d1_notes = [n for n in rows["d1"]["notes"] if n.startswith("language-note~")]
    assert d1_notes == [
        "language-note~French with a Polish translation",
        "language-note~Chinese inscription",
    ]
    assert _langs_of(rows["d2"]) == [("English", "eng"), ("Chinese", "chi")]
    assert [n for n in rows["d2"]["notes"] if n.startswith("language-note~")] == [
        "language-note~Chinese inscription"
    ]
    # 'recieved' is corrected in the note (reference test_fixes_spelling_errors)
    assert _langs_of(rows["d3"]) == [("English", "eng")]
    assert "recieved" not in " ".join(rows["d3"]["notes"])
    assert "received" in " ".join(rows["d3"]["notes"])


# ---------------------------------------------------------- terms of use


def test_terms_of_use_composition(spark):
    """test_terms_of_use.py: status/date/conditions interactions."""
    cases = {
        # closed, no conditions → synthesized sentence
        "t1": _record(
            identifier="t1",
            extra=_field("506", [("f", "CLOSED"), ("g", "2068-01-01")]),
        ),
        # closed, date not mentioned in conditions → appended
        "t2": _record(
            identifier="t2",
            extra=_field(
                "506",
                [("a", "This file is closed."), ("f", "CLOSED"), ("g", "2068-01-01")],
            ),
        ),
        # closed, date already rendered in conditions → untouched
        "t3": _record(
            identifier="t3",
            extra=_field(
                "506",
                [
                    ("a", "This file is closed until 1 January 2068."),
                    ("f", "CLOSED"),
                    ("g", "2068-01-01"),
                ],
            ),
        ),
        # conditions gain a trailing full stop
        "t4": _record(
            identifier="t4",
            extra=_field("506", [("a", "Access restricted to staff")]),
        ),
        # whitespace-only conditions → none
        "t5": _record(identifier="t5", extra=_field("506", [("a", "   ")])),
        # just a status, no conditions, no dates → none
        "t6": _record(identifier="t6", extra=_field("506", [("f", "OPEN")])),
    }
    rows = _run(spark, cases)
    assert rows["t1"]["terms_of_use"] == "Closed until 1 January 2068."
    assert (
        rows["t2"]["terms_of_use"]
        == "This file is closed. Closed until 1 January 2068."
    )
    assert (
        rows["t3"]["terms_of_use"]
        == "This file is closed until 1 January 2068."
    )
    assert rows["t4"]["terms_of_use"] == "Access restricted to staff."
    assert rows["t5"]["terms_of_use"] is None
    assert rows["t6"]["terms_of_use"] is None
    # ... and the composed sentence also lands as a terms-of-use note
    assert "terms-of-use~Closed until 1 January 2068." in rows["t1"]["notes"]


# ----------------------------------------------------------------- notes


def test_notes_rules(spark):
    """test_notes.py: arrangement, 546/506/540 routing, comment strip."""
    cases = {
        "n1": _record(
            identifier="n1",
            extra=_field(
                "351",
                [("b", "Arranged alphabetically by correspondent.")],
            ),
        ),
        "n2": _record(identifier="n2"),
        "n3": _record(identifier="n3", extra=_field("351", [("b", "")])),
        # parseable 546 → languages, not a language-note
        "n4": _record(
            identifier="n4", extra=_field("546", [("a", "French and English")])
        ),
        # 540 $a is ignored by the Axiell terms-of-use path
        "n5": _record(
            identifier="n5",
            extra=_field(
                "540", [("a", "Reproductions may be made for personal use.")]
            ),
        ),
        # a note reduced to nothing by normalise_text is dropped
        "n6": _record(
            identifier="n6",
            extra=_field("500", [("a", "&lt;!-- only a comment --&gt;")]),
        ),
        # plain 500 general note passes through
        "n7": _record(identifier="n7", extra=_field("500", [("a", "A note.")])),
    }
    rows = _run(spark, cases)
    arr = [n for n in rows["n1"]["notes"] if n.startswith("arrangement-note~")]
    assert arr == ["arrangement-note~Arranged alphabetically by correspondent."]
    for k in ("n2", "n3"):
        assert not [
            n for n in rows[k]["notes"] if n.startswith("arrangement-note~")
        ]
    assert not [n for n in rows["n4"]["notes"] if n.startswith("language-note~")]
    assert _langs_of(rows["n4"]) == [("French", "fre"), ("English", "eng")]
    assert not [n for n in rows["n5"]["notes"] if n.startswith("terms-of-use~")]
    assert not [n for n in rows["n6"]["notes"] if n.startswith("general-note~")]
    assert "general-note~A note." in rows["n7"]["notes"]


# ---------------------------------------------------------------- format


def test_format_born_digital(spark):
    """format.feature: local 655 'Archives - Digital' → hdig."""
    digital = _field("655", [("a", "Archives - Digital"), ("2", "local")], ind2="7")
    nonlocal_ = _field("655", [("a", "Archives - Digital"), ("2", "lcsh")], ind2="7")
    cases = {
        "g1": _record(identifier="g1"),
        "g2": _record(identifier="g2", extra=digital),
        "g3": _record(identifier="g3", extra=nonlocal_),
    }
    rows = _run(spark, cases)
    assert (rows["g1"]["format_id"], rows["g1"]["format_label"]) == (
        "h",
        "Archives and manuscripts",
    )
    assert (rows["g2"]["format_id"], rows["g2"]["format_label"]) == (
        "hdig",
        "Born-digital archives",
    )
    assert rows["g3"]["format_id"] == "h"


# ------------------------------------------------------------ production


def test_production_dates(spark):
    """production.feature/axiell/dates.py: 046 pair beats parsed labels;
    bare years widen to 1 Jan / 31 Dec."""
    cases = {
        "pr1": _record(
            identifier="pr1",
            extra=_field("264", [("c", "1930s")], ind2="0")
            + _field("046", [("k", "1932"), ("l", "1938")]),
        ),
        "pr2": _record(
            identifier="pr2", extra=_field("264", [("c", "1930-1935")], ind2="0")
        ),
        "pr3": _record(identifier="pr3"),
    }
    rows = _run(spark, cases)
    assert rows["pr1"]["production_label"] == "1930s"
    assert rows["pr1"]["production_dates"] == [
        "1932-01-01T00:00:00Z..1938-12-31T23:59:59.999999999Z"
    ]
    assert rows["pr2"]["production_dates"] == [
        "1930-01-01T00:00:00Z..1935-12-31T23:59:59.999999999Z"
    ]
    assert rows["pr3"]["production_dates"] == []


# ------------------------------------------------- versioning / deletions


def test_modified_time_version_and_errors(spark):
    """005 → ISO modified time + epoch-seconds version; missing/invalid
    005 and missing 001/245 are record errors (marc tests)."""
    cases = {
        "v1": _record(identifier="v1"),
        "v2": _record(identifier="v2", include_005=False),
        "v3": _record(
            identifier="v3",
            include_005=False,
            extra='<controlfield tag="005">garbage</controlfield>',
        ),
        "v4": _record(identifier="v4", include_245=False),
    }
    rows = _run(spark, cases)
    assert rows["v1"]["source_modified_time"] == "1853-08-21T09:45:30Z"
    assert rows["v1"]["version"] == -3672051270
    assert rows["v2"]["type"] == "Error"
    assert rows["v2"]["error"] == "Missing last transaction time field (005)"
    assert rows["v3"]["type"] == "Error"
    assert rows["v3"]["error"] == "Invalid last transaction time field (005)"
    assert rows["v4"]["type"] == "Error"
    assert rows["v4"]["error"] == "missing mandatory field 245 (title)"


def test_missing_001_is_error(spark):
    df = spark.createDataFrame(
        [("batch-1", _record(identifier=None), False)],
        "id string, content string, deleted boolean",
    )
    rows = {r["id"]: r.asDict() for r in transform_axiell(df, today=TODAY).collect()}
    assert rows["batch-1"]["type"] == "Error"
    assert rows["batch-1"]["error"] == "missing mandatory field 001 (id)"


def test_deleted_records_and_deletion_facts(spark):
    """test_transformer.py: deleted rows tombstone with their 005 version;
    reconciler facts add Deleted rows keyed by guid."""
    df = spark.createDataFrame(
        [
            ("x1", _record(identifier="x1"), False),
            ("x2", _record(identifier="x2"), True),
        ],
        "id string, content string, deleted boolean",
    )
    facts = spark.createDataFrame(
        [("f-row", UUID1, "2024-05-06 07:08:09")],
        "id string, guid string, last_modified string",
    ).selectExpr("id", "guid", "cast(last_modified as timestamp) last_modified")
    rows = {
        r["id"]: r.asDict()
        for r in transform_axiell(df, deletion_facts=facts, today=TODAY).collect()
    }
    assert rows["x1"]["type"] == "Visible"
    assert rows["x2"]["type"] == "Deleted"
    assert rows["x2"]["deleted_reason"] == "deleted-from-source"
    assert rows["x2"]["version"] == -3672051270
    assert rows[UUID1]["type"] == "Deleted"
    assert rows[UUID1]["deleted_reason"] == "deleted-from-source"
    assert rows[UUID1]["source_modified_time"] == "2024-05-06T07:08:09Z"


# -------------------------------------------------- subjects/contributors


def test_subjects_and_contributors(spark):
    """subjects.feature/contributors.feature: 653 $a with the <p> prefix
    stripped and trailing period trimmed; 720 $a verbatim agents."""
    cases = {
        "sc1": _record(
            identifier="sc1",
            extra=_field("653", [("a", "&lt;p&gt;Medicine.")])
            + _field("653", [("a", "Public Health...")])
            + _field("720", [("a", "Florence Nightingale")]),
        ),
    }
    rows = _run(spark, cases)
    assert rows["sc1"]["subjects"] == ["Medicine", "Public Health..."]
    assert rows["sc1"]["contributors"] == ["Florence Nightingale"]
    assert rows["sc1"]["subject_ids"][0] == "medicine"
