"""Parity tests for the Axiell→FOLIO sync plan.

Scenarios ported from the reference suites
(catalogue_graph/tests/adapters/steps/axiell_folio_sync/):
test_selection_for_sync.py, test_axiell_folio_sync.py, test_suppress.py,
test_upsert.py, test_deletion_fact_contract.py — re-expressed against the
relational sync plan (the OKAPI transport itself is out of engine scope;
create-vs-update and found-vs-skip decisions are driven by the `existing`
inventory-state frame instead of live CQL lookups).
"""

import json

from catalogue_pipeline_spark.plans.folio_sync import (
    default_ref_data,
    folio_reconcile_plan,
    folio_sync_plan,
    folio_sync_report,
    folio_upsert_plan,
)


def _rec(
    source_id="g1",
    harvest="Y",
    record_type="ITEM",
    title="A title",
    extra="",
):
    parts = ["<record>"]
    if source_id is not None:
        parts.append(f'<controlfield tag="001">{source_id}</controlfield>')
    if title is not None:
        parts.append(
            f'<datafield tag="245"><subfield code="a">{title}</subfield></datafield>'
        )
    if harvest is not None:
        parts.append(
            f'<datafield tag="980"><subfield code="a">{harvest}</subfield></datafield>'
        )
    if record_type is not None:
        parts.append(
            f'<datafield tag="351"><subfield code="c">{record_type}</subfield></datafield>'
        )
    parts.append(extra)
    parts.append("</record>")
    return "".join(parts)


def _run(spark, cases, **kw):
    """cases: row_id → (content, deleted).  Returns list of plan row dicts."""
    df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in cases.items()],
        "id string, content string, deleted boolean",
    )
    plan = folio_upsert_plan(df, default_ref_data(spark), **kw)
    return [r.asDict() for r in plan.collect()]


def _by_record(rows):
    out = {}
    for r in rows:
        out.setdefault(r["source_id"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["seq"])
    return out


# ------------------------------------------------------------- selection


def test_selection_rules(spark):
    """test_selection_for_sync.py: harvest flag + item level, both from the
    MARCXML; ITEM match case-insensitive; missing/empty either → skip."""
    rows = _by_record(
        _run(
            spark,
            {
                "r1": (_rec("s1"), False),
                "r2": (_rec("s2", record_type="item"), False),
                "r3": (_rec("s3", record_type="Collection"), False),
                "r4": (_rec("s4", harvest=None), False),
                "r5": (_rec("s5", harvest=""), False),
                "r6": (_rec("s6", record_type=None), False),
            },
        )
    )
    for sid in ("s1", "s2"):
        assert [r["entity"] for r in rows[sid]] == ["instance", "holdings", "item"]
        assert all(r["action"] == "upsert" for r in rows[sid])
    for sid in ("s3", "s4", "s5", "s6"):
        assert len(rows[sid]) == 1
        assert rows[sid][0]["action"] == "skip"
        assert rows[sid][0]["error"] is None


def test_tombstone_is_advisory_and_errors_are_recorded(spark):
    """test_axiell_folio_sync.py: loader deleted=true is advisory (never
    suppressed); empty content and mapping failures are per-record errors
    that do not abort the batch."""
    rows = _by_record(
        _run(
            spark,
            {
                "r1": (_rec("t1"), True),  # tombstone
                "r2": ("", False),  # empty content
                "r3": (_rec(None), False),  # missing 001
                "r4": (_rec("t4", title=None), False),  # missing title
                "r5": (_rec("t5"), False),  # fine
            },
        )
    )
    assert rows["t1"][0]["action"] == "tombstone"
    assert rows["t1"][0]["error"] is None
    assert rows["r2"][0]["action"] == "error"
    assert rows["r2"][0]["error"] == "empty_content"
    assert rows["r3"][0]["action"] == "error"
    assert rows["r3"][0]["error"] == "Missing MARC 001 — cannot identify record"
    assert rows["t4"][0]["action"] == "error"
    assert rows["t4"][0]["error"] == "Missing 245$a (title) for source_id=t4"
    assert [r["action"] for r in rows["t5"]] == ["upsert"] * 3


# --------------------------------------------------------------- mapping


def test_payload_mapping_and_hrids(spark):
    """mapping.py builders: hrid scheme, material-type normalisation table
    with case-insensitive keys, defaults, location note, 856 access."""
    extra = (
        '<datafield tag="852"><subfield code="b">Closed stores</subfield>'
        '<subfield code="h">MS.123</subfield><subfield code="c">WMS</subfield>'
        '<subfield code="j">ms 123</subfield></datafield>'
        '<datafield tag="949"><subfield code="a">B1001</subfield>'
        '<subfield code="c">Sound Only</subfield>'
        '<subfield code="l">Non-Circulating</subfield></datafield>'
        '<datafield tag="876"><subfield code="p">c.2</subfield>'
        '<subfield code="t">v.3</subfield></datafield>'
        '<datafield tag="856"><subfield code="u">https://ex.org/x</subfield></datafield>'
    )
    rows = _by_record(
        _run(
            spark,
            {
                "r1": (_rec("m1", extra=extra), False),
                "r2": (_rec("m2"), False),  # all defaults
            },
        )
    )
    m1 = {r["entity"]: r for r in rows["m1"]}
    assert m1["instance"]["hrid"] == "AxC-instance-m1"
    assert m1["holdings"]["hrid"] == "AxC-holding-m1"
    assert m1["item"]["hrid"] == "AxC-item-m1"
    inst = json.loads(m1["instance"]["payload_json"])
    assert inst["title"] == "A title"
    assert inst["source"] == "FOLIO"
    hold = json.loads(m1["holdings"]["payload_json"])
    assert hold["permanentLocationId"] == "uuid-location-closed-stores"
    assert hold["callNumber"] == "MS.123"
    assert hold["callNumberPrefix"] == "WMS"
    assert hold["shelvingOrder"] == "ms 123"
    assert hold["sourceId"] == "uuid-holdings_source-marc"
    item = json.loads(m1["item"]["payload_json"])
    # 'Sound Only' → material table (case-insensitive) → 'sound recording'
    assert item["materialType"]["id"] == "uuid-material_type-sound-recording"
    assert item["permanentLoanType"]["id"] == "uuid-loan_type-non-circulating"
    assert item["barcode"] == "B1001"
    assert item["copyNumber"] == "c.2"
    assert item["volume"] == "v.3"
    assert item["electronicAccess"] == [{"uri": "https://ex.org/x"}]
    assert item["notes"][0]["note"] == "Axiell location: Closed stores"
    assert item["notes"][0]["itemNoteTypeId"] == "uuid-item_note_type-axiell-location"
    # defaults: History of Medicine / book / Can Circulate; unknown-code note
    m2_item = json.loads({r["entity"]: r for r in rows["m2"]}["item"]["payload_json"])
    assert m2_item["materialType"]["id"] == "uuid-material_type-book"
    assert m2_item["permanentLoanType"]["id"] == "uuid-loan_type-can-circulate"
    assert m2_item["permanentLocation"]["id"] == "uuid-location-history-of-medicine"
    assert m2_item["notes"][0]["note"] == "Axiell location: unknown"
    assert "electronicAccess" not in m2_item


def test_unresolved_lookup_is_a_mapping_error(spark):
    """mapping.py _resolve: a name the tenant does not know is a
    MappingError with the reference's message."""
    extra = '<datafield tag="852"><subfield code="b">Narnia</subfield></datafield>'
    rows = _by_record(_run(spark, {"r1": (_rec("u1", extra=extra), False)}))
    assert rows["u1"][0]["action"] == "error"
    assert (
        rows["u1"][0]["error"]
        == "Unresolved location 'Narnia' — add it to the FOLIO tenant or fix the MARC"
    )


def test_create_vs_update_against_existing_state(spark):
    """upsert.py _upsert_entity: hrid found → update (keeps folio id),
    else create — decided per entity."""
    df = spark.createDataFrame(
        [("r1", _rec("e1"), False)], "id string, content string, deleted boolean"
    )
    existing = spark.createDataFrame(
        [("AxC-instance-e1", "f-100"), ("AxC-item-e1", "f-102")],
        "hrid string, folio_id string",
    )
    plan = folio_upsert_plan(df, default_ref_data(spark), existing=existing)
    rows = {r["entity"]: r.asDict() for r in plan.collect()}
    assert rows["instance"]["action"] == "update"
    assert rows["instance"]["folio_id"] == "f-100"
    assert rows["holdings"]["action"] == "create"
    assert rows["holdings"]["folio_id"] is None
    assert rows["item"]["action"] == "update"


# ------------------------------------------------------------- reconcile


def test_reconcile_cascade_child_first_with_suppression_flags(spark):
    """test_suppress.py: all three entities suppressed child-first
    (item → holdings → instance); discoverySuppress everywhere,
    staffSuppress ONLY on the instance."""
    facts = spark.createDataFrame([("g1",)], "guid string")
    plan = folio_reconcile_plan(facts)
    rows = sorted((r.asDict() for r in plan.collect()), key=lambda r: r["seq"])
    assert [(r["entity"], r["seq"]) for r in rows] == [
        ("item", 1), ("holdings", 2), ("instance", 3)
    ]
    assert rows[0]["hrid"] == "AxC-item-g1"
    assert rows[1]["hrid"] == "AxC-holding-g1"
    assert rows[2]["hrid"] == "AxC-instance-g1"
    for r in rows:
        assert r["action"] == "suppress"
        p = json.loads(r["payload_json"])
        assert p["discoverySuppress"] is True
        assert ("staffSuppress" in p) == (r["entity"] == "instance")


def test_reconcile_live_guid_recheck_drops_reclaimed(spark):
    """README reconciliation: a fact whose GUID is mapped again by a live
    record is dropped (anti-join), so a revert/handoff never suppresses
    the wrong record."""
    facts = spark.createDataFrame([("g1",), ("g2",)], "guid string")
    live = spark.createDataFrame([("g2",)], "guid string")
    plan = folio_reconcile_plan(facts, live_mappings=live)
    assert {r["source_id"] for r in plan.collect()} == {"g1"}


def test_reconcile_missing_records_skip_and_hard_delete(spark):
    """test_suppress.py: not-found → skip (idempotent under redelivery);
    hard_delete mode emits delete actions with no payload."""
    facts = spark.createDataFrame([("g1",)], "guid string")
    existing = spark.createDataFrame(
        [("AxC-item-g1", "f-1"), ("AxC-instance-g1", "f-3")],
        "hrid string, folio_id string",
    )
    soft = {r["entity"]: r.asDict()
            for r in folio_reconcile_plan(facts, existing=existing).collect()}
    assert soft["item"]["action"] == "suppress"
    assert soft["holdings"]["action"] == "skip"  # absent from FOLIO
    assert soft["instance"]["action"] == "suppress"
    hard = {r["entity"]: r.asDict()
            for r in folio_reconcile_plan(
                facts, existing=existing, hard_delete=True
            ).collect()}
    assert hard["item"]["action"] == "delete"
    assert hard["item"]["payload_json"] is None
    assert hard["holdings"]["action"] == "skip"


def test_deletion_fact_contract(spark):
    """test_deletion_fact_contract.py: a superseded GUID maps directly onto
    the hrids the upsert path wrote for the same source id."""
    df = spark.createDataFrame(
        [("r1", _rec("shared-guid"), False)],
        "id string, content string, deleted boolean",
    )
    up = folio_upsert_plan(df, default_ref_data(spark))
    facts = spark.createDataFrame([("shared-guid",)], "guid string")
    rec = folio_reconcile_plan(facts)
    assert {r["hrid"] for r in up.collect()} == {r["hrid"] for r in rec.collect()}


# ---------------------------------------------------------------- report


def test_sync_plan_order_and_report(spark):
    """sync_to_folio.py run_sync: upserts (rank 1) before reconcile
    cascades (rank 2); report counts match the reference's tallies."""
    records = spark.createDataFrame(
        [
            ("r1", _rec("a1"), False),           # synced (3 creates)
            ("r2", _rec("a2", harvest=None), False),  # skipped
            ("r3", _rec("a3"), True),            # tombstone
            ("r4", _rec(None), False),           # failed
        ],
        "id string, content string, deleted boolean",
    )
    facts = spark.createDataFrame([("a9",)], "guid string")
    existing = spark.createDataFrame(
        [("AxC-item-a9", "f-1")], "hrid string, folio_id string"
    )
    plan = folio_sync_plan(
        records, default_ref_data(spark), deletion_facts=facts, existing=existing
    )
    rows = [r.asDict() for r in plan.collect()]
    assert {r["pass_rank"] for r in rows if r["pass"] == "upsert"} == {1}
    assert {r["pass_rank"] for r in rows if r["pass"] == "reconcile"} == {2}
    rep = {r["metric"]: r["n"] for r in folio_sync_report(plan).collect()}
    assert rep["total"] == 4
    assert rep["synced"] == 1
    assert rep["skipped"] == 1
    assert rep["tombstone"] == 1
    assert rep["failed"] == 1
    assert rep["deletions"] == 1
    assert rep["created"] == 3   # instance+holdings+item of a1
    assert rep["suppressed"] == 1  # the found a9 item
