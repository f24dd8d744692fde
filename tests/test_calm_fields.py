"""CALM notes / languages / terms-of-use / access-status / items scenarios,
mirroring CalmNotesTest, CalmLanguagesTest, CalmTermsOfUseTest and
CalmItemsTest (pipeline/transformer/transformer_calm/src/test/)."""

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.calm_fields import with_calm_fields

_SCHEMA = "id string, data map<string,array<string>>"


def fields_many(spark, datas):
    """Evaluate MANY records in ONE query — the per-query expression-tree
    build dominates wall time, so each test batches its cases."""
    df = spark.createDataFrame(
        [(str(i), d) for i, d in enumerate(datas)], _SCHEMA
    )
    cols = with_calm_fields(F.col("data"))
    out = df.select(F.col("id"), *[v.alias(k) for k, v in cols.items()])
    rows = {r["id"]: r.asDict() for r in out.collect()}
    return [rows[str(i)] for i in range(len(datas))]


def fields(spark, data):
    return fields_many(spark, [data])[0]


def langs_many(spark, cases):
    got = fields_many(spark, [{"Language": list(vs)} for vs in cases])
    return [
        (
            g["languages"],
            [n.split("~", 1)[1] for n in g["notes"]
             if n.startswith("language-note~")],
        )
        for g in got
    ]


def test_language_degenerate_and_exact(spark):
    got = langs_many(spark, [
        ("", "  "),
        ("English",),
        ("Mandarin",),
        ("Middle English",),
    ])
    assert got == [
        ([], []),
        (["eng~English"], []),
        (["chi~Mandarin"], []),
        (["enm~Middle English"], []),
    ]


def test_language_multi_split(spark):
    got = langs_many(spark, [
        ("Portuguese\nSpanish",),
        ("English.",),
        ("English`",),
        ("German; French",),
        ("German, French, ",),
        ("English/Ganda",),       # \band\b boundary: Ganda survives
        ("English and Russian",),
    ])
    assert got == [
        (["por~Portuguese", "spa~Spanish"], []),
        (["eng~English"], []),
        (["eng~English"], []),
        (["ger~German", "fre~French"], []),
        (["ger~German", "fre~French"], []),
        (["eng~English", "lug~Ganda"], []),
        (["eng~English", "rus~Russian"], []),
    ]


def test_language_tags_and_fuzzy(spark):
    got = langs_many(spark, [
        ("<language>French</language>",),
        ('<language langcode="ger">German, </language>'
         '<language langcode="fre">French, </language>',),
        ("Portguese",),
        ("Swiss-German",),
        ("Eng",),
        ("Language",),
        ("English and Norweigan",),
        ("English, Portugese, French and Spanish",),
    ])
    assert got == [
        (["fre~French"], []),
        (["ger~German", "fre~French"], []),
        (["por~Portuguese"], []),
        (["gsw~Swiss German"], []),
        (["eng~English"], []),
        ([], []),
        (["eng~English", "nor~Norwegian"], []),
        (["eng~English", "por~Portuguese", "fre~French", "spa~Spanish"], []),
    ]


def test_language_fallback_guesses_and_notes(spark):
    got = langs_many(spark, [
        ("Partly in German, partly in English, some articles in French.",),
        ("Nigerian",),
        ("English", "English; French"),   # fold dedupes across values
        ("Text in English, recieved from the depositor",),
    ])
    assert got[0] == (
        ["ger~German", "eng~English", "fre~French"],
        ["Partly in German, partly in English, some articles in French."],
    )
    assert got[1] == ([], ["Nigerian"])
    assert got[2][0] == ["eng~English", "fre~French"]
    # 'recieved' typo fixed in the note, original guesses kept
    assert got[3] == (
        ["eng~English"],
        ["Text in English, received from the depositor"],
    )


def test_terms_of_use_cases(spark):
    cases = [
        {"AccessStatus": ["Open"],
         "AccessConditions": ["The papers are available."]},
        {"AccessStatus": ["Closed"],
         "AccessConditions": ["Closed on depositor agreement."]},
        {"AccessConditions": [
            "Closed under the Data Protection Act until 1st January 2039."],
         "AccessStatus": ["Closed"], "ClosedUntil": ["01/01/2039"]},
        {"AccessConditions": [
            "This file is restricted until 01/01/2039 for data protection "
            "reasons. Readers must sign a form."],
         "AccessStatus": ["Restricted"], "UserDate1": ["01/01/2039"]},
        {"AccessConditions": [
            "This file is restricted for data protection reasons."],
         "AccessStatus": ["Restricted"], "UserDate1": ["01/01/2060"]},
        {"AccessConditions": ["Closed under the Data Protection Act."],
         "AccessStatus": ["Closed"], "ClosedUntil": ["01/01/2039"]},
        {"AccessStatus": ["Closed"], "ClosedUntil": ["01/01/2068"]},
        {"AccessConditions": [
            "Permission must be obtained from the Winnicott Trust. "
            "This item is also restricted."],
         "AccessStatus": ["Donor Permission"], "UserDate1": ["01/01/2027"]},
        {"AccessStatus": ["Open"]},
        {},
        {"AccessConditions": ["See the catalogue."],
         "UserDate1": ["02/03/2030"], "ClosedUntil": ["04/05/2031"]},
        {"AccessStatus": ["Closed"],
         "AccessConditions": ["Closed pending review"],
         "ClosedUntil": ["01/06/2040"]},
    ]
    want = [
        "The papers are available.",
        "Closed on depositor agreement.",
        "Closed under the Data Protection Act until 1st January 2039.",
        "This file is restricted until 01/01/2039 for data protection "
        "reasons. Readers must sign a form.",
        "This file is restricted for data protection reasons. "
        "Restricted until 1 January 2060.",
        "Closed under the Data Protection Act. Closed until 1 January 2039.",
        "Closed until 1 January 2068.",
        "Permission must be obtained from the Winnicott Trust. "
        "This item is also restricted. Restricted until 1 January 2027.",
        None,
        None,
        "See the catalogue. Restricted until 2 March 2030. "
        "Closed until 4 May 2031.",
        "Closed pending review. Closed until 1 June 2040.",
    ]
    got = [g["terms_of_use"] for g in fields_many(spark, cases)]
    assert got == want


def test_access_status_table(spark):
    cases = [
        ("Open", "Open"),
        ("Open with advisory", "OpenWithAdvisory"),
        ("Closed.", "Closed"),
        ("Restricted", "Restricted"),
        ("Certain restrictions apply.", "Restricted"),
        ("Restricted access (Data Protection Act)", "Restricted"),
        ("By Appointment", "ByAppointment"),
        ("Donor Permission", "PermissionRequired"),
        ("Missing", "Unavailable"),
        ("Deaccessioned", "Unavailable"),
        ("Temporarily Unavailable", "TemporarilyUnavailable"),
        ("Unrecognised thing", None),
    ]
    got = fields_many(spark, [{"AccessStatus": [raw]} for raw, _ in cases])
    for (raw, want), g in zip(cases, got):
        assert g["access_status"] == want, (raw, g["access_status"], want)


def test_notes_table_and_items(spark):
    got, got2 = fields_many(spark, [
        {
            "AdminHistory": ["Founded in 1900."],
            "CustodialHistory": ["Kept in the basement."],
            "Notes": ["General note one.", "General note two."],
            "Copyright": ["<p>Copyright &amp; Co.</p>"],
            "AccessStatus": ["Open"],
        },
        {"Title": ["T"]},
    ])
    assert got["notes"][:2] == [
        "biographical-note~Founded in 1900.",
        "ownership-note~Kept in the basement.",
    ]
    assert "copyright-note~<p>Copyright & Co.</p>" in got["notes"]
    assert "general-note~General note one." in got["notes"]
    assert "general-note~General note two." in got["notes"]
    assert got["items"] == ["ClosedStores~Closed stores~NotRequestable~Open"]
    # no parseable status → empty status slot (AccessCondition.isEmpty)
    assert got2["items"] == ["ClosedStores~Closed stores~NotRequestable~"]


def test_terms_of_use_note_lands_in_notes(spark):
    got = fields(spark, {
        "AccessStatus": ["Closed"],
        "ClosedUntil": ["01/01/2068"],
        "Notes": ["A note."],
    })
    assert got["notes"] == [
        "general-note~A note.",
        "terms-of-use~Closed until 1 January 2068.",
    ]
