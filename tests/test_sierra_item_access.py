"""SierraItemAccess / RulesForRequesting parity tests.

Scenarios ported from SierraItemAccessTest.scala (common/source_model) —
the ones consistent with the CURRENT SierraRulesForRequesting.scala (the
reference's rules file was updated 2024 so a couple of its older test
expectations — the 108="a" by-appointment cases — no longer correspond to
any reachable access branch; we mirror the code, and exercise A9 via its
actual NoPublicMessage precondition instead).
"""

import json

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.sierra_transform import sierra_items


def item_row(spark, *, fixed=None, hold=0, loc="Closed stores Hist.",
             varfields=None, sid="1234567"):
    doc = {
        "id": sid, "deleted": False, "suppressed": False,
        "holdCount": hold,
        "fixedFields": {
            k: {"label": "L", "value": v} for k, v in (fixed or {}).items()
        },
        "varFields": varfields or [],
    }
    if loc is not None:
        doc["location"] = {"code": "c", "name": loc}
    df = spark.createDataFrame(
        [(sid, "b1", json.dumps(doc))], "item_id string, bib_id string, content string"
    )
    return sierra_items(df).collect()[0]


def note_vf(content):
    return {"fieldTag": "n", "content": content}


def test_online_request_closed_stores(spark):
    r = item_row(spark, fixed={"88": "-", "108": "f"})
    assert (r["access_method"], r["access_status"]) == ("OnlineRequest", "Open")
    assert r["access_note"] is None and r["item_note"] is None


def test_restricted_still_requestable(spark):
    r = item_row(spark, fixed={"88": "-", "108": "c"})
    assert (r["access_method"], r["access_status"]) == ("OnlineRequest", "Restricted")


def test_manual_request_uses_display_note(spark):
    # SierraItemAccessTest "if there's a display note about manual requesting"
    note = ("Email library@wellcomecollection.org to tell us why you need "
            "access. We'll reply within a week.")
    r = item_row(spark, fixed={"88": "-", "108": "n"},
                 varfields=[note_vf(note)])
    assert r["access_method"] == "ManualRequest"
    assert r["access_note"] == note
    assert r["item_note"] is None


def test_manual_request_placeholder_without_note(spark):
    r = item_row(spark, fixed={"88": "-", "108": "n"})
    assert r["access_method"] == "ManualRequest"
    assert "ordered manually" in r["access_note"]


def test_hold_does_not_get_overwritten_by_note(spark):
    # "doesn't overwrite the note if there's a hold on the item"
    r = item_row(spark, fixed={"88": "-", "108": "f"}, hold=1,
                 varfields=[note_vf("Email library@wellcomecollection.org to "
                                    "tell us why you need access.")])
    assert (r["access_method"], r["access_status"]) == (
        "NotRequestable", "TemporarilyUnavailable")
    assert r["access_note"].startswith("Item is in use by another reader")
    assert r["item_note"] is None


def test_unrelated_note_stays_on_item(spark):
    # "returns the note if it's unrelated to access data"
    r = item_row(spark, fixed={"88": "-", "108": "f"},
                 varfields=[note_vf("uncoloured impression on paper mount")])
    assert r["access_method"] == "OnlineRequest"
    assert r["access_note"] is None
    assert r["item_note"] == "uncoloured impression on paper mount"


def test_access_note_moves_onto_empty_condition(spark):
    r = item_row(spark, fixed={"88": "-", "108": "f"},
                 varfields=[note_vf("Shelved at the end of the Quick Ref. section")])
    assert r["access_method"] == "OnlineRequest"
    assert r["access_note"] == "Shelved at the end of the Quick Ref. section"
    assert r["item_note"] is None


def test_safeguarded_with_access_note(spark):
    # "if there's a display note about access for a safeguarded item"
    note = ("This item requires safeguarded access. Please contact "
            "collections@wellcomecollection.org for more details.")
    r = item_row(spark, fixed={"88": "g", "108": "p"}, varfields=[note_vf(note)])
    assert (r["access_method"], r["access_status"]) == (
        "NotRequestable", "Safeguarded")
    assert r["access_note"] == note


def test_by_appointment_via_no_public_message(spark):
    # A9 via its actual precondition: 61 ∈ {17,18,15} → NoPublicMessage
    r = item_row(spark, fixed={"88": "y", "108": "a", "61": "17"})
    assert (r["access_method"], r["access_status"]) == (
        "ManualRequest", "ByAppointment")


def test_donor_permission(spark):
    # 79=sc#ac fires the DPA rule (a NotRequestable) → PermissionRequired
    r = item_row(spark, fixed={"88": "y", "108": "q", "79": "sc#ac"})
    assert (r["access_method"], r["access_status"]) == (
        "ManualRequest", "PermissionRequired")


def test_missing_overrides_everything(spark):
    for loc in ("Closed stores Hist.", "Open shelves", None):
        r = item_row(spark, fixed={"88": "m"}, hold=1, loc=loc)
        assert (r["access_method"], r["access_status"]) == (
            "NotRequestable", "Unavailable")
        assert r["access_note"] == "This item is missing."


def test_withdrawn(spark):
    r = item_row(spark, fixed={"88": "x"})
    assert (r["access_method"], r["access_status"]) == (
        "NotRequestable", "Unavailable")
    assert r["access_note"] == "This item is withdrawn."


def test_closed_item(spark):
    r = item_row(spark, fixed={"88": "h", "108": "u"})
    assert (r["access_method"], r["access_status"]) == ("NotRequestable", "Closed")
    assert r["access_note"] is None


def test_at_digitisation(spark):
    r = item_row(spark, fixed={"88": "r", "108": "b"})
    assert (r["access_method"], r["access_status"]) == (
        "NotRequestable", "TemporarilyUnavailable")
    assert "digitised" in r["access_note"]


def test_open_shelves_plain_and_due(spark):
    # "an item on the open shelves ... cannot be requested online"
    r = item_row(spark, fixed={"88": "-", "108": "o", "79": "isref"},
                 loc="Open shelves")
    assert (r["access_method"], r["access_status"]) == ("OpenShelves", None)
    # "is not available if it has a due date"
    r = item_row(spark, fixed={"88": "-", "108": "o", "79": "isref",
                               "65": "2020-01-01"}, loc="Open shelves")
    assert (r["access_method"], r["access_status"]) == (
        "OpenShelves", "TemporarilyUnavailable")


def test_exhibition_999_note(spark):
    # "has a note based on its 999 MARC tag"
    vf999 = {"fieldTag": "a", "marcTag": "999", "ind1": " ", "ind2": " ",
             "subfields": [{"tag": "a", "content": "On display in gallery 3"}]}
    r = item_row(spark, fixed={"88": "-"}, loc="Exhibition space",
                 varfields=[vf999])
    assert r["access_method"] == "NotRequestable"
    assert r["access_note"] == "On display in gallery 3"


def test_fallback_is_not_requestable(spark):
    r = item_row(spark, fixed={"88": "-", "108": "f"}, loc=None)
    assert r["access_method"] == "NotRequestable"
    assert "cannot be requested online" in r["access_note"]