"""CALM indexer reshape parity — scenarios from
calm_indexer/CalmIndexerFeatureTest + Worker.scala:73-86."""

from catalogue_pipeline_spark.plans.calm_indexer import (
    RECORDS_SCHEMA,
    calm_index_actions,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, RECORDS_SCHEMA)
    out = {}
    for r in calm_index_actions(df).collect():
        out[r.id] = (
            r.op,
            None
            if r.fields is None
            else {f.key: (f.scalar, f.list) for f in r.fields},
        )
    return out


def test_indexes_calm_record_dropping_empty_fields(spark):
    # 'indexes Calm records' — ("Document", "") arrives as [""] and must
    # vanish; the single Modified value unwraps to a scalar
    out = _run(
        spark,
        [("r1", {"Modified": ["29/06/2020"], "Document": [""]}, False)],
    )
    op, fields = out["r1"]
    assert op == "index"
    assert fields == {"Modified": ("29/06/2020", None)}


def test_multi_value_fields_stay_lists(spark):
    out = _run(
        spark,
        [("r1", {"Subject": ["a", "b"], "RefNo": ["X/1"]}, False)],
    )
    _, fields = out["r1"]
    assert fields["Subject"] == (None, ["a", "b"])
    assert fields["RefNo"] == ("X/1", None)
    # a list containing an empty string among others is NOT the empty
    # marker — only exactly [""] is dropped
    out2 = _run(spark, [("r2", {"Notes": ["", "x"]}, False)])
    assert out2["r2"][1]["Notes"] == (None, ["", "x"])


def test_deleted_payload_is_delete_by_id(spark):
    # 'removes a deleted Calm record'
    out = _run(
        spark,
        [
            ("r1", {"Modified": ["29/06/2020"]}, True),
            ("r2", {"Modified": ["29/06/2020"]}, None),  # null → not deleted
        ],
    )
    assert out["r1"] == ("delete", None)
    assert out["r2"][0] == "index"
