"""Sierra indexer splitter parity — scenarios from
sierra_adapter/sierra_indexer SierraIndexerFeatureTest / Splitter /
IndexerRequest."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from catalogue_pipeline_spark.plans.sierra_indexer import (
    apply_index_deletions,
    indexer_deletions,
    indexer_fixedfields,
    indexer_main_records,
    indexer_requests,
    indexer_varfields,
    sierra_api_data,
)

T_SCHEMA = (
    "bib_id string, bib_data string, "
    "items array<struct<id:string,data:string>>, "
    "holdings array<struct<id:string,data:string>>, "
    "orders array<struct<id:string,data:string>>"
)

BIB = json.dumps(
    {
        "id": "1234567",
        "updatedDate": "2013-12-12T13:56:07Z",
        "deleted": False,
        "varFields": [
            {"fieldTag": "b", "content": "22501328220"},
            {
                "fieldTag": "c",
                "marcTag": "949",
                "subfields": [{"tag": "a", "content": "/RHO"}],
            },
        ],
        "fixedFields": {
            "86": {"label": "AGENCY", "value": "1"},
            "265": {"label": "Inherit Location", "value": False},
        },
    }
)
ITEM = json.dumps({"id": "7000001", "deleted": False, "varFields": []})


def _tf(spark, rows):
    return spark.createDataFrame(rows, T_SCHEMA)


def _one_bib(spark):
    return sierra_api_data(
        _tf(
            spark,
            [
                (
                    "1234567",
                    BIB,
                    [("7000001", ITEM), ("7000002", ITEM)],
                    [("3000001", '{"id":"3000001"}')],
                    [],
                )
            ],
        )
    )


def test_api_data_rows_and_check_digits(spark):
    rows = {(r.record_type, r.id): r for r in _one_bib(spark).collect()}
    assert set(rows) == {
        ("bibs", "1234567"),
        ("items", "7000001"),
        ("items", "7000002"),
        ("holdings", "3000001"),
    }
    # mod-11: 1234567 -> b12345672 (1*8+2*7+3*6+4*5+5*4+6*3+7*2 = 112; 112%11=2)
    assert rows[("bibs", "1234567")].id_with_check_digit == "b12345672"
    assert rows[("items", "7000001")].id_with_check_digit.startswith("i7000001")
    assert rows[("holdings", "3000001")].id_with_check_digit.startswith("c3000001")


def test_main_records_strip_fields_and_add_ids(spark):
    # SierraIndexerFeatureTest:157-170 — bib doc keeps scalars, gains
    # idWithCheckDigit + sorted sub-record id lists, loses var/fixedFields
    docs = {
        r.doc_id: r
        for r in indexer_main_records(_one_bib(spark), "sierra").collect()
        if r["index"] == "sierra_bibs"
    }
    doc = json.loads(docs["1234567"].source)
    assert doc["idWithCheckDigit"] == "b12345672"
    assert doc["updatedDate"] == "2013-12-12T13:56:07Z"
    assert doc["itemIds"] == ["7000001", "7000002"]
    assert doc["holdingsIds"] == ["3000001"]
    assert doc["orderIds"] == []
    assert "varFields" not in doc and "fixedFields" not in doc


def test_varfield_docs_positions_and_parent(spark):
    # :172-216 — {recordType}-{id}-{position} ids, parent struct, payload
    docs = {
        r.doc_id: json.loads(r.source)
        for r in indexer_varfields(_one_bib(spark), "sierra").collect()
    }
    assert set(docs) == {"bibs-1234567-0", "bibs-1234567-1"}
    d0 = docs["bibs-1234567-0"]
    assert d0["parent"] == {
        "recordType": "bibs",
        "id": "1234567",
        "idWithCheckDigit": "b12345672",
    }
    assert d0["position"] == 0
    assert d0["varField"] == {"fieldTag": "b", "content": "22501328220"}
    assert docs["bibs-1234567-1"]["varField"]["marcTag"] == "949"


def test_fixedfield_docs_by_code(spark):
    docs = {
        r.doc_id: json.loads(r.source)
        for r in indexer_fixedfields(_one_bib(spark), "sierra").collect()
    }
    assert set(docs) == {"bibs-1234567-86", "bibs-1234567-265"}
    assert docs["bibs-1234567-86"]["fixedField"] == {
        "label": "AGENCY",
        "value": "1",
    }
    assert docs["bibs-1234567-265"]["code"] == "265"
    assert docs["bibs-1234567-265"]["fixedField"]["value"] is False


def test_requests_union_counts(spark):
    reqs = indexer_requests(_one_bib(spark), "sierra")
    by_index = {
        r["index"]: r["count"] for r in reqs.groupBy("index").count().collect()
    }
    assert by_index == {
        "sierra_bibs": 1,
        "sierra_items": 2,
        "sierra_holdings": 1,
        "sierra_varfields": 2,
        "sierra_fixedfields": 2,
    }


def test_transformable_without_bib(spark):
    df = sierra_api_data(
        _tf(spark, [(None, None, [("7000009", ITEM)], [], [])])
    )
    rows = df.collect()
    assert [(r.record_type, r.id) for r in rows] == [("items", "7000009")]


def test_strict_parse_failure_fails_run(spark):
    df = sierra_api_data(
        _tf(spark, [("1234567", "{not json", [], [], [])], ),
        strict=True,
    )
    with pytest.raises(Exception) as e:
        df.collect()
    assert "Could not parse all records" in str(e.value)
    lenient = sierra_api_data(
        _tf(spark, [("1234567", "{not json", [("7000001", ITEM)], [], [])]),
        strict=False,
    )
    assert [r.record_type for r in lenient.collect()] == ["items"]


def test_deletion_predicates(spark):
    # IndexerRequest:75-93 — varfields tail from the current count;
    # :116-131 — fixedfields code NOT IN the live codes
    dels = {
        (r["index"], r.record_type, r.id): r
        for r in indexer_deletions(_one_bib(spark), "sierra").collect()
    }
    vf = dels[("sierra_varfields", "bibs", "1234567")]
    assert vf.stale_from == 2 and vf.live_codes is None
    ff = dels[("sierra_fixedfields", "bibs", "1234567")]
    assert ff.stale_from is None and sorted(ff.live_codes) == ["265", "86"]


def test_apply_deletions_end_to_end(spark):
    # 'replaces a bib record that has changed': a previous version had 4
    # varFields and codes {86, 265, 999}; the new record has 2 varFields
    # and codes {86, 265} — positions 2,3 and code 999 must die
    existing = spark.createDataFrame(
        [
            ("sierra_varfields", "bibs-1234567-0", "bibs", "1234567", 0, None),
            ("sierra_varfields", "bibs-1234567-1", "bibs", "1234567", 1, None),
            ("sierra_varfields", "bibs-1234567-2", "bibs", "1234567", 2, None),
            ("sierra_varfields", "bibs-1234567-3", "bibs", "1234567", 3, None),
            ("sierra_fixedfields", "bibs-1234567-86", "bibs", "1234567", None, "86"),
            ("sierra_fixedfields", "bibs-1234567-999", "bibs", "1234567", None, "999"),
            # another parent: untouched
            ("sierra_varfields", "bibs-9999999-9", "bibs", "9999999", 9, None),
        ],
        "index string, doc_id string, record_type string, id string, "
        "position int, code string",
    )
    dels = indexer_deletions(_one_bib(spark), "sierra")
    survivors = sorted(
        r.doc_id for r in apply_index_deletions(existing, dels).collect()
    )
    assert survivors == [
        "bibs-1234567-0",
        "bibs-1234567-1",
        "bibs-1234567-86",
        "bibs-9999999-9",
    ]
