"""Parity tests for the FOLIO transformer slice.

Scenarios ported from catalogue_graph/tests/adapters/transformers/folio/
(test_transformer.py, test_predecessor_identifier.py,
test_item_enrichment.py) against plans/folio_transform.py.
"""

from catalogue_pipeline_spark.plans.folio_transform import (
    enrich_instance_ids,
    transform_folio,
)

BNUM = "b11839053"
BNUM2 = "b1234567x"


def _field(tag, subs, ind1=" ", ind2=" "):
    body = "".join(f'<subfield code="{c}">{v}</subfield>' for c, v in subs)
    return f'<datafield tag="{tag}" ind1="{ind1}" ind2="{ind2}">{body}</datafield>'


def _rec(identifier="inst-1", title="Folio Title", extra=""):
    parts = ["<record>"]
    if identifier is not None:
        parts.append(f'<controlfield tag="001">{identifier}</controlfield>')
    if title is not None:
        parts.append(_field("245", [("a", title)]))
    parts.append(extra)
    parts.append("</record>")
    return "".join(parts)


def _run(spark, cases, **kw):
    df = spark.createDataFrame(
        [(k, v if isinstance(v, str) else v[0],
          False if isinstance(v, str) else v[1]) for k, v in cases.items()],
        "id string, content string, deleted boolean",
    )
    return {r["id"]: r.asDict() for r in transform_folio(df, **kw).collect()}


def test_suppression_999_t_marker(spark):
    """folio_work_builder._is_suppressed: 999 with $t == '1' suppresses;
    other 999 content does not."""
    rows = _run(
        spark,
        {
            "s1": _rec("s1", extra=_field("999", [("t", "1")])),
            "s2": _rec("s2", extra=_field("999", [("t", "0")])),
            "s3": _rec("s3", extra=_field("999", [("i", "1")])),
            "s4": _rec("s4"),
            # several 999s, one carrying the marker
            "s5": _rec(
                "s5",
                extra=_field("999", [("i", "x")]) + _field("999", [("t", "1")]),
            ),
        },
    )
    for k in ("s1", "s5"):
        assert rows[k]["type"] == "Deleted"
        assert rows[k]["deleted_reason"] == "suppressed: Folio"
    for k in ("s2", "s3", "s4"):
        assert rows[k]["type"] == "Visible", k


def test_sierra_predecessor_rules(spark):
    """test_predecessor_identifier.py under the Sierra b-number format."""
    rows = _run(
        spark,
        {
            "p1": _rec("p1", extra=_field("907", [("a", BNUM)])),
            "p2": _rec("p2", extra=_field("907", [("a", f".{BNUM2}")])),
            "p3": _rec("p3"),
            "p4": _rec(
                "p4",
                extra=_field("907", [("a", BNUM)]) + _field("907", [("a", BNUM)]),
            ),
            "p5": _rec(
                "p5",
                extra=_field("907", [("a", BNUM)]) + _field("907", [("a", BNUM2)]),
            ),
            "p6": _rec("p6", extra=_field("907", [("a", "1234567")])),
            "p7": _rec(
                "p7",
                extra=_field(
                    "907", [("a", "f1fab6a1-b172-418f-93eb-bc24740e266d")]
                ),
            ),
        },
    )
    assert rows["p1"]["predecessor_id"] == BNUM
    assert rows["p2"]["predecessor_id"] == BNUM2
    assert rows["p3"]["predecessor_id"] is None
    assert rows["p4"]["predecessor_id"] == BNUM
    assert rows["p5"]["type"] == "Error"
    assert (
        rows["p5"]["error"]
        == "Multiple distinct instances of varfield with tag 907"
    )
    for k in ("p6", "p7"):
        assert rows[k]["type"] == "Error"
        assert (
            rows[k]["error"]
            == "Predecessor identifier does not match Sierra system number format"
        )


def test_items_joined_from_enrichment_store(spark):
    """test_item_enrichment.py: items come from the enrichment join with a
    folio-item identifier and enumeration-or-volume title; instances with
    no enrichment row (or no store at all) get no items."""
    cases = {
        "inst-1": _rec("inst-1"),
        "inst-2": _rec("inst-2"),
        "inst-3": (_rec("inst-3"), True),  # deleted: items dropped
    }
    enriched = spark.createDataFrame(
        [
            ("inst-1", [("item-uuid-1", "no. 1", None), ("item-uuid-2", None, "v. 2")]),
            ("inst-3", [("item-uuid-9", "no. 9", None)]),
        ],
        "instance_id string, items array<struct<id:string,enumeration:string,volume:string>>",
    )
    rows = _run(spark, cases, enriched_items=enriched, broadcast_items=True)
    assert rows["inst-1"]["items"] == [
        "folio-item:item-uuid-1~no. 1",
        "folio-item:item-uuid-2~v. 2",
    ]
    assert rows["inst-2"]["items"] == []
    assert rows["inst-3"]["type"] == "Deleted"
    assert rows["inst-3"]["items"] == []
    # without a store, no items at all — never guessed from MARC
    rows2 = _run(spark, {"inst-1": _rec("inst-1")})
    assert rows2["inst-1"]["items"] == []


def test_base_marc_fields_and_deletions(spark):
    """The shared MARC base: title/alt-titles/description/035 ids/parents;
    deleted rows keep the deleted-from-source reason."""
    extra = (
        _field("246", [("a", "Alt T")], ind1="3", ind2="0")
        + _field("520", [("a", "About things.")])
        + _field("035", [("a", "(Bibliographic Number).b11839053")])
        + _field("490", [("a", "A Series;")])
    )
    rows = _run(
        spark,
        {
            "b1": _rec("b1", extra=extra),
            "b2": (_rec("b2"), True),
            "b3": _rec("b3", title=None),
            "b4": _rec(None),
        },
    )
    assert rows["b1"]["type"] == "Visible"
    assert rows["b1"]["title"] == "Folio Title"
    assert rows["b1"]["alternative_titles"] == ["Alt T"]
    assert "About things." in rows["b1"]["description"]
    assert rows["b1"]["other_identifiers"] == ["sierra-system-number:b11839053"]
    assert rows["b1"]["parents"] == ["A Series"]
    assert rows["b1"]["work_type"] == "Standard"
    assert rows["b2"]["type"] == "Deleted"
    assert rows["b2"]["deleted_reason"] == "deleted-from-source"
    assert rows["b3"]["type"] == "Error"
    assert rows["b3"]["error"] == "missing mandatory field 245 (title)"
    assert rows["b4"]["type"] == "Error"
    assert rows["b4"]["error"] == "missing mandatory field 001 (id)"


def test_enrich_instance_ids_worklist(spark):
    """folio_enrich.collect_instance_ids: de-duplicated changed ids."""
    df = spark.createDataFrame(
        [("a", "x", False), ("b", "y", False), ("a", "x2", False)],
        "id string, content string, deleted boolean",
    )
    ids = {r["id"] for r in enrich_instance_ids(df).collect()}
    assert ids == {"a", "b"}
    assert enrich_instance_ids(df).count() == 2
