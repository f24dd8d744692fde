"""Sierra subjects/contributors parity tests.

Each case ports a scenario from the reference suites (expected values as
fixtures, engine re-expressed):
SierraContributorsTest.scala, SierraSubjectsTest.scala,
subjects/SierraConceptSubjectsTest.scala, SierraPersonSubjectsTest.scala,
SierraOrganisationSubjectsTest.scala, SierraMeetingSubjectsTest.scala,
SierraBrandNameSubjectsTest.scala, SubjectsAndContributorsTest.scala.

Serialized forms: contributor "ctype|label|roles|idtype=idvalue|P-or-S",
subject "stype|label|id|ctype~label~id;…" ("-" = unidentifiable).
"""

import json

from catalogue_pipeline_spark.plans.sierra_concepts import (
    transform_sierra_concepts,
)


def vf(marcTag, subfields=None, ind1=" ", ind2=" ", content=None):
    d = {"fieldTag": "a", "marcTag": marcTag, "ind1": ind1, "ind2": ind2}
    if content is not None:
        d["content"] = content
    if subfields is not None:
        d["subfields"] = subfields
    return d


def sf(tag, content):
    return {"tag": tag, "content": content}


def run(spark, varfields):
    doc = {"id": "1000001", "deleted": False, "suppressed": False,
           "varFields": varfields}
    df = spark.createDataFrame(
        [("1000001", json.dumps(doc))], "id string, content string"
    )
    row = transform_sierra_concepts(df).collect()[0]
    return row


def contribs(spark, varfields):
    return run(spark, varfields)["contributors_ser"]


def subjects(spark, varfields):
    return run(spark, varfields)["subjects_ser"]


# ---------------------------------------------------------- contributors

def test_empty_bib_has_no_contributors(spark):
    assert contribs(spark, []) == []


def test_mixture_of_person_organisation_meeting(spark):
    # SierraContributorsTest "extracts a mixture of Person, Organisation
    # and Meeting contributors"
    out = contribs(spark, [
        vf("100", [sf("a", "Sarah the soybean")]),
        vf("100", [sf("a", "Sam the squash,"), sf("c", "Sir")]),
        vf("110", [sf("a", "Spinach Solicitors")]),
        vf("700", [sf("a", "Sebastian the sugarsnap")]),
        vf("710", [sf("a", "Shallot Swimmers")]),
        vf("711", [sf("a", "Sammys meet the Sammys"), sf("c", "at Sammys")]),
    ])
    assert out == [
        "Person|Sarah the soybean||label-derived=sarah the soybean|P",
        "Person|Sam the squash, Sir||label-derived=sam the squash, sir|P",
        "Organisation|Spinach Solicitors||label-derived=spinach solicitors|P",
        "Person|Sebastian the sugarsnap||label-derived=sebastian the sugarsnap|S",
        "Organisation|Shallot Swimmers||label-derived=shallot swimmers|S",
        "Meeting|Sammys meet the Sammys at Sammys||label-derived=sammys meet the sammys at sammys|S",
    ]


def test_person_label_combines_abcd(spark):
    out = contribs(spark, [
        vf("100", [sf("a", "Charles Emmanuel"), sf("b", "III,"),
                   sf("c", "King of Sardinia,"), sf("d", "1701-1773")]),
        vf("700", [sf("a", "Charles Emmanuel"), sf("b", "IV,"),
                   sf("c", "King of Sardinia,"), sf("d", "1796-1802")]),
    ])
    assert [o.split("|")[1] for o in out] == [
        "Charles Emmanuel III, King of Sardinia, 1701-1773",
        "Charles Emmanuel IV, King of Sardinia, 1796-1802",
    ]
    assert [o.split("|")[-1] for o in out] == ["P", "S"]


def test_subfield_t_demotes_person_to_agent(spark):
    out = contribs(spark, [
        vf("700", [sf("a", "Shakespeare, William,"), sf("d", "1564-1616."),
                   sf("t", "Hamlet.")]),
    ])
    assert out == [
        "Agent|Shakespeare, William, 1564-1616. Hamlet.|"
        "|label-derived=shakespeare, william, 1564-1616. hamlet|S"
    ]


def test_primaries_come_before_secondaries(spark):
    out = contribs(spark, [
        vf("700", [sf("a", "Alison the Apple")]),
        vf("100", [sf("a", "Alfie the Artichoke")]),
        vf("700", [sf("a", "Archie the Aubergine")]),
    ])
    assert [o.split("|")[1] for o in out] == [
        "Alfie the Artichoke", "Alison the Apple", "Archie the Aubergine"]
    assert [o.split("|")[-1] for o in out] == ["P", "S", "S"]


def test_roles_from_e_j_with_period_strip(spark):
    out = contribs(spark, [
        vf("100", [sf("a", "Violet the Vanilla"), sf("e", "spice"),
                   sf("e", "flavour")]),
        vf("700", [sf("a", "Zurbarán, Francisco de,"), sf("d", "1598-1664,"),
                   sf("j", "Follower of")]),
        vf("700", [sf("a", "A made-up leader"), sf("j", "Follower of"),
                   sf("e", "Disciple of")]),
        vf("700", [sf("a", "Nurse, Paul,"), sf("d", "1949-"),
                   sf("e", "writer of introduction.")]),
    ])
    assert out[0].split("|")[2] == "spice;flavour"
    assert out[1].split("|")[2] == "Follower of"
    # $e/$j roles keep document order (MarcContributionRoles)
    assert out[2].split("|")[2] == "Follower of;Disciple of"
    assert out[3].split("|")[2] == "writer of introduction"
    # the folded label keeps diacritics out of the id
    assert out[1].split("|")[3] == "label-derived=zurbaran, francisco de, 1598-1664"


def test_identifier_from_subfield_0(spark):
    out = contribs(spark, [
        vf("100", [sf("a", "Ivan the ivy"), sf("0", "nlcsh7101607")]),
    ])
    assert out == ["Person|Ivan the ivy||lc-names=nlcsh7101607|P"]


def test_inconsistent_spacing_in_0_is_canonicalised(spark):
    out = contribs(spark, [
        vf("100", [sf("a", "Wanda the watercress"), sf("0", "nlcsh 2055034"),
                   sf("0", "  nlcsh2055034 "), sf("0", " nlc sh 2055034"),
                   sf("0", "nlcsh 2055034.,")]),
    ])
    assert out == ["Person|Wanda the watercress||lc-names=nlcsh2055034|P"]


def test_multiple_distinct_ids_fall_back_to_label(spark):
    out = contribs(spark, [
        vf("100", [sf("a", "Darren the Dill"), sf("0", "nlcsh9069541"),
                   sf("0", "nlcsh3384149")]),
    ])
    assert out == ["Person|Darren the Dill||label-derived=darren the dill|P"]


def test_person_labels_trim_trailing_comma(spark):
    out = contribs(spark, [
        vf("100", [sf("a", "George,")]),
        vf("700", [sf("a", "Sebastian,")]),
    ])
    assert [o.split("|")[1] for o in out] == ["George", "Sebastian"]


def test_organisation_label_excludes_n_and_normalises(spark):
    out = contribs(spark, [
        vf("110", [sf("a", "IARC Working Group on the Evaluation of the Carcinogenic Risk of Chemicals to Man."),
                   sf("b", "Meeting"), sf("d", "1972 :"),
                   sf("c", "Lyon, France"), sf("n", "  79125097")]),
        vf("110", [sf("a", "The organisation,")]),
        vf("710", [sf("a", "Another organisation,")]),
    ])
    # $b/$d/$c keep document order; $n is not an Organisation label subfield
    assert out[0].split("|")[1] == (
        "IARC Working Group on the Evaluation of the Carcinogenic Risk of "
        "Chemicals to Man. Meeting 1972 : Lyon, France")
    assert out[1].split("|")[1] == "The organisation"
    assert out[2].split("|")[1] == "Another organisation"


def test_organisation_multiple_ids_fall_back_to_label(spark):
    out = contribs(spark, [
        vf("110", [sf("a", "Luke the lime"), sf("0", "nlcsh3349285"),
                   sf("0", "nlcsh9059917")]),
    ])
    assert out == ["Organisation|Luke the lime||label-derived=luke the lime|P"]


def test_no_label_subfields_yields_no_contributor(spark):
    assert contribs(spark, [vf("100", [sf("e", "")])]) == []


def test_meeting_label_and_roles(spark):
    out = contribs(spark, [
        vf("111", [sf("a", "1"), sf("b", "not used"), sf("c", "2"),
                   sf("d", "3"), sf("t", "4")]),
        vf("111", [sf("a", "label"), sf("e", "not a role"),
                   sf("j", "1st role"), sf("j", "2nd role")]),
        vf("111", [sf("a", "label"), sf("0", "n456")]),
        vf("711", [sf("a", "Big meeting")]),
    ])
    assert out[0].split("|")[1] == "1 2 3 4"
    assert out[0].split("|")[-1] == "P"
    assert out[1].split("|")[2] == "1st role;2nd role"
    assert out[2] == "Meeting|label||lc-names=n456|P"
    assert out[3] == "Meeting|Big meeting||label-derived=big meeting|S"


def test_deduplicates_primary_and_secondary_copies(spark):
    # SierraContributorsTest "deduplicates contributors" (b24541758)
    out = contribs(spark, [
        vf("100", [sf("a", "Steele, Richard,"), sf("c", "Sir,"),
                   sf("d", "1672-1729.")]),
        vf("700", [sf("a", "Steele, Richard,"), sf("c", "Sir,"),
                   sf("d", "1672-1729.")]),
    ])
    assert out == [
        "Person|Steele, Richard, Sir, 1672-1729.|"
        "|label-derived=steele, richard, sir, 1672-1729|P"
    ]


def test_agent_with_n_p_subfields_and_identifier(spark):
    out = contribs(spark, [
        vf("700", [sf("a", "Hippocrates."), sf("t", "Epistolae."),
                   sf("p", "Ad Ptolemaeum regem de hominis fabrica."),
                   sf("l", "Latin."), sf("f", "1561."),
                   sf("0", "n  79005643")]),
    ])
    assert out == [
        "Agent|Hippocrates. Epistolae. Ad Ptolemaeum regem de hominis "
        "fabrica. Latin.||lc-names=n79005643|S"
    ]


def test_contributor_harmonisation_prefers_specific_type(spark):
    # OntologyTypeOps: an Agent sharing an identifier with a Person is
    # retyped to Person
    out = contribs(spark, [
        vf("100", [sf("a", "Maimonides"), sf("0", "sh00000000")]),
        vf("700", [sf("a", "Maimonides,"), sf("t", "Logic."),
                   sf("0", "sh00000000")]),
    ])
    assert out == [
        "Person|Maimonides||lc-subjects=sh00000000|P",
        "Person|Maimonides, Logic.||lc-subjects=sh00000000|S",
    ]


# -------------------------------------------------------------- subjects

def test_deduplicates_identical_subjects(spark):
    # SierraSubjectsTest (b2506728x)
    out = subjects(spark, [
        vf("650", [sf("a", "Medicine")], ind2="0"),
        vf("650", [sf("a", "Medicine.")], ind2="2"),
    ])
    assert out == [
        "Concept|Medicine|label-derived=medicine|"
        "Concept~Medicine~label-derived=medicine"
    ]


def test_subject_identified_from_concept(spark):
    out = subjects(spark, [
        vf("650", [sf("a", "Medicine"), sf("0", "sh85083064")], ind2="0"),
    ])
    assert out == [
        "Concept|Medicine|lc-subjects=sh85083064|"
        "Concept~Medicine~lc-subjects=sh85083064"
    ]


def test_650_subdivision_labels_and_types(spark):
    out = subjects(spark, [
        vf("650", [sf("v", "V Content"), sf("a", "A Content")]),
        vf("650", [sf("a", "A Content"), sf("x", "X Content"),
                   sf("v", "V Content")]),
        vf("650", [sf("y", "Y Content"), sf("a", "A Content")]),
        vf("650", [sf("z", "Z Content"), sf("a", "A Content")]),
    ])
    assert out == [
        "Concept|A Content - V Content|label-derived=a content - v content|"
        "Concept~A Content~label-derived=a content;"
        "Concept~V Content~label-derived=v content",
        "Concept|A Content - X Content - V Content|"
        "label-derived=a content - x content - v content|"
        "Concept~A Content~label-derived=a content;"
        "Concept~X Content~label-derived=x content;"
        "Concept~V Content~label-derived=v content",
        "Concept|A Content - Y Content|label-derived=a content - y content|"
        "Concept~A Content~label-derived=a content;"
        "Period~Y Content~label-derived=y content",
        "Concept|A Content - Z Content|label-derived=a content - z content|"
        "Concept~A Content~label-derived=a content;"
        "Place~Z Content~label-derived=z content",
    ]


def test_648_and_651_primary_types(spark):
    # NB distinct labels per field: identical labels would share a
    # label-derived identifier and harmonise to one type (as the full
    # SierraSubjects path does in the reference too)
    out = subjects(spark, [
        vf("648", [sf("a", "A Content"), sf("x", "X Content"),
                   sf("v", "V Content")]),
        vf("651", [sf("x", "X2 Content"), sf("a", "A2 Content"),
                   sf("v", "V2 Content")]),
    ])
    assert out[0] == (
        "Period|A Content - X Content - V Content|"
        "label-derived=a content - x content - v content|"
        "Period~A Content~label-derived=a content;"
        "Concept~X Content~label-derived=x content;"
        "Concept~V Content~label-derived=v content")
    assert out[1] == (
        "Place|A2 Content - X2 Content - V2 Content|"
        "label-derived=a2 content - x2 content - v2 content|"
        "Place~A2 Content~label-derived=a2 content;"
        "Concept~X2 Content~label-derived=x2 content;"
        "Concept~V2 Content~label-derived=v2 content")


def test_identifier_schemes_from_indicator2(spark):
    out = subjects(spark, [
        vf("650", [sf("a", "absence"), sf("0", "sh85060628")], ind2="0"),
        vf("650", [sf("a", "abolition"), sf("0", "mesh/456")], ind2="2"),
        vf("650", [sf("a", "something"), sf("0", "(DNLM)123456")], ind2="2"),
    ])
    assert [o.split("|")[2] for o in out] == [
        "lc-subjects=sh85060628", "nlm-mesh=mesh/456", "nlm-mesh=123456"]


def test_ind2_7_subjects_are_dropped(spark):
    out = subjects(spark, [
        vf("650", [sf("a", "absence"), sf("0", "lcsh/123")], ind2="7"),
        vf("650", [sf("a", "abolition"), sf("0", "mesh/456")], ind2="2"),
    ])
    assert len(out) == 1 and out[0].startswith("Concept|abolition|")
    assert subjects(spark, [
        vf("650", [sf("a", "abolition")], ind2="7"),
    ]) == []


def test_primary_label_trailing_period_removed(spark):
    for tag, typ in (("648", "Period"), ("650", "Concept"), ("651", "Place")):
        out = subjects(spark, [vf(tag, [sf("a", "Diet, Food, and Nutrition.")])])
        assert out == [
            f"{typ}|Diet, Food, and Nutrition|"
            f"label-derived=diet, food, and nutrition|"
            f"{typ}~Diet, Food, and Nutrition~"
            f"label-derived=diet, food, and nutrition"
        ]


def test_z_only_subject_trims_whitespace_in_id(spark):
    # NB through the full SierraSubjects path the sole Place concept is
    # rewritten to the subject's (Concept-typed) identifier by
    # harmoniseOntologyTypes' copyWithNewType — the family-level reference
    # test sees Place only because it skips harmonisation
    out = subjects(spark, [vf("650", [sf("z", "United States. ")], ind2="0")])
    assert out == [
        "Concept|United States|label-derived=united states|"
        "Concept~United States~label-derived=united states"
    ]


def test_multiple_a_subfields_fronted(spark):
    out = subjects(spark, [
        vf("650", [sf("a", "Geography"), sf("a", "Textbooks"),
                   sf("v", "Early works to 1800.")], ind2="0"),
        vf("650", [sf("a", "Death notices"), sf("z", "Great Britain"),
                   sf("y", "19th century"), sf("a", "Last words")], ind2="0"),
    ])
    assert out[0] == (
        "Concept|Geography - Textbooks - Early works to 1800|"
        "label-derived=geography - textbooks - early works to 1800|"
        "Concept~Geography~label-derived=geography;"
        "Concept~Textbooks~label-derived=textbooks;"
        "Concept~Early works to 1800~label-derived=early works to 1800")
    assert out[1] == (
        "Concept|Death notices - Last words - Great Britain - 19th century|"
        "label-derived=death notices - last words - great britain - 19th century|"
        "Concept~Death notices~label-derived=death notices;"
        "Concept~Last words~label-derived=last words;"
        "Place~Great Britain~label-derived=great britain;"
        "Period~19th century~label-derived=19th century")


def test_ascii_folding_in_label_derived_ids(spark):
    out = subjects(spark, [
        vf("650", [sf("a", "Flüssigkeit")]),
        vf("600", [sf("a", "François")]),
        vf("610", [sf("a", "Hasseröder")]),
        vf("611", [sf("a", "Düsseldorf Convention 2097")]),
        vf("652", [sf("a", "Citroën")]),
    ])
    ids = [o.split("|")[2] for o in out]
    assert ids == [
        "label-derived=flussigkeit", "label-derived=francois",
        "label-derived=hasseroder", "label-derived=dusseldorf convention 2097",
        "label-derived=citroen"]
    # labels keep the original diacritics
    assert [o.split("|")[1] for o in out] == [
        "Flüssigkeit", "François", "Hasseröder",
        "Düsseldorf Convention 2097", "Citroën"]


def test_person_subject_label_includes_roles_and_x(spark):
    out = subjects(spark, [
        vf("600", [sf("a", "Shakespeare, William,"), sf("x", "Characters"),
                   sf("x", "Hamlet.")]),
    ])
    assert out == [
        "Person|Shakespeare, William, Characters Hamlet.|"
        "label-derived=shakespeare, william, characters hamlet|"
        "Person~Shakespeare, William,~label-derived=shakespeare, william,;"
        "Concept~Characters~-;Concept~Hamlet.~-"
    ]


def test_person_subject_roles_in_label_not_concept(spark):
    out = subjects(spark, [
        vf("600", [sf("a", "David Attenborough,"), sf("e", "author")]),
    ])
    assert out[0].split("|")[1] == "David Attenborough, author"
    assert out[0].split("|")[3].split("~")[1] == "David Attenborough,"


def test_person_subject_title_subfield(spark):
    out = subjects(spark, [
        vf("600", [sf("a", "Aristophanes."), sf("t", "Birds.")]),
        vf("600", [sf("a", "Hippocrates."), sf("t", "Aphorisms."),
                   sf("l", "Latin."), sf("0", "n85221892")], ind2="0"),
        vf("600", [sf("a", "Agate, John,"), sf("d", "1676-1720."),
                   sf("t", "Sermon preach'd at Exeter, on the 30th of January ...")]),
    ])
    assert out[0] == (
        "Person|Aristophanes. Birds.|label-derived=aristophanes. birds|"
        "Person~Aristophanes. Birds.~label-derived=aristophanes. birds")
    assert out[1].split("|")[1] == "Hippocrates. Aphorisms. Latin."
    assert out[1].split("|")[3].split("~")[2] == "lc-names=n85221892"
    # a trailing ellipsis is not a trailing period
    assert out[2].split("|")[1] == (
        "Agate, John, 1676-1720. Sermon preach'd at Exeter, "
        "on the 30th of January ...")


def test_person_subject_no_identifier_when_ind2_not_0(spark):
    out = subjects(spark, [
        vf("600", [sf("a", "Gerry the Garlic"), sf("0", "sh12345678")], ind2="2"),
    ])
    assert out == [
        "Person|Gerry the Garlic|label-derived=gerry the garlic|"
        "Person~Gerry the Garlic~label-derived=gerry the garlic"
    ]


def test_person_subject_missing_a_yields_nothing(spark):
    assert subjects(spark, [vf("600", [sf("x", "Hmmm")])]) == []


def test_person_subject_empty_subfield_filtered_in_id(spark):
    out = subjects(spark, [
        vf("600", [sf("a", ""), sf("a", "Turner, John")], ind2="0"),
    ])
    assert out[0].split("|")[2] == "label-derived=turner, john"


def test_organisation_subject_labels(spark):
    out = subjects(spark, [
        vf("610", [sf("a", "United States."), sf("b", "Supreme Court,"),
                   sf("c", "Washington, DC."), sf("d", "September 29, 2005,"),
                   sf("e", "pictured.")], ind2="0"),
        vf("610", [sf("a", "Wellcome Trust.")], ind2="0"),
        vf("610", [sf("a", "Wellcome Trust."), sf("b", "Facilities,"),
                   sf("b", "Health & Safety"), sf("c", "27 September 2018")],
           ind2="0"),
    ])
    assert out[0].split("|")[1] == (
        "United States. Supreme Court, Washington, DC. "
        "September 29, 2005, pictured")
    assert out[1].split("|")[3] == (
        "Organisation~Wellcome Trust~label-derived=wellcome trust")
    assert out[2].split("|")[3].split("~")[1] == (
        "Wellcome Trust. Facilities, Health & Safety")


def test_organisation_subject_identifiers(spark):
    out = subjects(spark, [
        vf("610", [sf("a", "ACME Corp"), sf("0", "n1234567")], ind2="0"),
        vf("610", [sf("a", "ACME Corp"), sf("0", "  n1234"), sf("0", "n1234")],
           ind2="0"),
        vf("610", [sf("a", "ACME Corp"), sf("0", "n12345"), sf("0", "n67890")],
           ind2="0"),
        vf("610", [sf("a", "ACME Corp"), sf("0", "n12345")], ind2="2"),
    ])
    assert out[0].split("|")[3] == "Organisation~ACME Corp~lc-names=n1234567"
    assert out[1].split("|")[3] == "Organisation~ACME Corp~lc-names=n1234"
    # ambiguous $0 → Unidentifiable concept (DiscardMultipleIds)
    assert out[2].split("|")[3] == "Organisation~ACME Corp~-"
    # non-0 indicator2 → label-derived (OnlyLocIds)
    assert out[3].split("|")[3] == "Organisation~ACME Corp~label-derived=acme corp"


def test_organisation_subject_missing_label_yields_nothing(spark):
    assert subjects(spark, [vf("610", [])]) == []


def test_meeting_subject_document_order_label(spark):
    out = subjects(spark, [
        vf("611", [sf("c", "C"), sf("a", "A"), sf("d", "D")]),
        vf("611", [sf("a", "Content"), sf("0", "nlcsh7212")], ind2="0"),
        vf("611", [sf("x", "Hmmm")]),
    ])
    assert out[0] == (
        "Meeting|C A D|label-derived=c a d|Meeting~C A D~label-derived=c a d")
    assert out[1] == (
        "Meeting|Content|lc-names=nlcsh7212|Meeting~Content~lc-names=nlcsh7212")
    assert len(out) == 2


def test_brand_name_subjects_652(spark):
    out = subjects(spark, [
        vf("652", [sf("a", "Content")]),
        vf("652", [sf("b", "Hmmm")]),
    ])
    assert out == [
        "Concept|Content|label-derived=content|"
        "Concept~Content~label-derived=content"
    ]


def test_subject_harmonisation_rewrites_sole_concept(spark):
    # OntologyTypeOps: a Concept subject sharing its identifier with a
    # Place subject is retyped, including its sole concept
    out = subjects(spark, [
        vf("650", [sf("a", "Maimonides"), sf("0", "sh00000000")], ind2="0"),
        vf("651", [sf("a", "Maimonides land"), sf("0", "sh00000000")], ind2="0"),
    ])
    assert out == [
        "Place|Maimonides|lc-subjects=sh00000000|"
        "Place~Maimonides~lc-subjects=sh00000000",
        "Place|Maimonides land|lc-subjects=sh00000000|"
        "Place~Maimonides land~lc-subjects=sh00000000",
    ]


def test_contributors_harmonised_against_subject_types(spark):
    # SubjectsAndContributors: subject typing is trusted more — an
    # Organisation contributor sharing a Place subject's id becomes Place
    row = run(spark, [
        vf("651", [sf("a", "Cordoba"), sf("0", "sh12345678")], ind2="0"),
        vf("710", [sf("a", "Cordoba"), sf("0", "sh12345678")]),
    ])
    assert row["subjects_ser"][0].startswith("Place|Cordoba|lc-subjects=sh12345678")
    assert row["contributors_ser"] == [
        "Place|Cordoba||lc-subjects=sh12345678|S"]


def test_flat_columns_feed_the_concepts_graph(spark):
    row = run(spark, [
        vf("650", [sf("a", "Medicine")], ind2="0"),
        vf("100", [sf("a", "Sarah the soybean"), sf("e", "author.")]),
    ])
    assert row["subjects"] == ["Medicine"]
    assert row["contributors"] == ["Person|Sarah the soybean|author|P"]
