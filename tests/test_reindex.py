"""Reindexer parity — scenarios from reindexer/scripts/start_reindex.py,
reindex_worker/services/ReindexWorkerServiceTest.scala and
scripts/get_reindex_status.py."""

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.cdc.reindex import (
    funnel_report,
    how_many_segments,
    plan_reindex_requests,
    read_reindex_records,
    run_reindex_requests,
    to_source_payload,
    verify_specific_ids,
)


def _table(spark, n=50):
    return spark.range(n).select(
        F.concat(F.lit("rec"), F.col("id").cast("string")).alias("id"),
        (F.col("id") % 9 + 1).cast("int").alias("version"),
    )


def test_how_many_segments():
    # start_reindex.py:26-48 — ceil(count / 900)
    assert how_many_segments(900) == 1
    assert how_many_segments(901) == 2
    assert how_many_segments(3_240_000) == 3600
    assert how_many_segments(100, records_per_segment=30) == 4


def test_verify_specific_ids_sierra():
    # start_reindex.py:172-180
    verify_specific_ids("sierra", ["3272507", "1234567"])
    with pytest.raises(ValueError):
        verify_specific_ids("sierra", ["b32725073"])
    with pytest.raises(ValueError):
        verify_specific_ids("sierra", ["327250a"])
    verify_specific_ids("miro", ["anything-goes"])  # only sierra is checked


def test_plan_complete_requests(spark):
    rows = plan_reindex_requests(
        spark, "sierra", "complete", item_count=2500, records_per_segment=900
    ).orderBy("segment").collect()
    assert [r.segment for r in rows] == [0, 1, 2]
    assert all(r.total_segments == 3 for r in rows)


def test_plan_specific_requests_chunked_by_100(spark):
    ids = [f"{1000000 + i}" for i in range(250)]
    rows = plan_reindex_requests(spark, "sierra", "specific", ids=ids).orderBy(
        "request_id"
    ).collect()
    assert [len(r.ids) for r in rows] == [100, 100, 50]
    # order-preserving chunking
    assert rows[0].ids[0] == "1000000" and rows[2].ids[-1] == "1000249"


def test_plan_rejects_unknown_source_and_mode(spark):
    with pytest.raises(ValueError):
        plan_reindex_requests(spark, "ebsco", "complete", item_count=10)
    with pytest.raises(ValueError):
        plan_reindex_requests(spark, "miro", "sideways")


def test_complete_segments_disjoint_and_covering(spark):
    # ParallelScanner contract: every record lands in exactly one segment
    table = _table(spark, 120)
    parts = [
        read_reindex_records(
            table, mode="complete", segment=s, total_segments=4
        )
        for s in range(4)
    ]
    counts = [p.count() for p in parts]
    assert sum(counts) == 120
    assert all(c > 0 for c in counts)  # hash spreads
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    assert union.select("id").distinct().count() == 120


def test_partial_reads_first_n_deterministically(spark):
    table = _table(spark, 30)
    a = read_reindex_records(table, mode="partial", max_records=5).collect()
    b = read_reindex_records(table, mode="partial", max_records=5).collect()
    assert [r.id for r in a] == [r.id for r in b]
    assert len(a) == 5


def test_specific_multi_get_ignores_absent_ids(spark):
    table = _table(spark, 10)
    got = read_reindex_records(
        table, mode="specific", ids=["rec3", "rec7", "nope"]
    ).collect()
    assert sorted(r.id for r in got) == ["rec3", "rec7"]


def test_run_reindex_requests_tags_request_ids(spark):
    table = _table(spark, 40)
    reqs = plan_reindex_requests(
        spark, "miro", "complete", item_count=40, records_per_segment=20
    )
    out = run_reindex_requests(table, reqs, "miro")
    assert out.count() == 40
    by_req = {
        r.request_id: r["count"]
        for r in out.groupBy("request_id").count().collect()
    }
    assert set(by_req) == {"complete/0", "complete/1"}
    assert sum(by_req.values()) == 40


def test_payload_calm_deleted_default(spark):
    # ReindexWorkerServiceTest 'extant/deleted CALM records'
    df = spark.createDataFrame(
        [
            ("c1", {"bucket": "b", "key": "k1"}, 2, True),
            ("c2", {"bucket": "b", "key": "k2"}, 1, None),
        ],
        "id string, payload map<string,string>, version int, is_deleted boolean",
    )
    rows = {r.id: r for r in to_source_payload(df, "calm").collect()}
    assert rows["c1"].payload.isDeleted is True
    assert rows["c2"].payload.isDeleted is False  # case-class default
    assert rows["c2"].payload.location["key"] == "k2"
    assert rows["c2"].source == "calm"


def test_payload_mets_tagged_union(spark):
    # 'extant METS' vs 'deleted METS' — the Dynamo wrapper key routes kind
    df = spark.createDataFrame(
        [
            ("m1", "MetsFileWithImages", "goobi.xml", 3),
            ("m2", "DeletedMetsFile", None, 4),
        ],
        "id string, payload_kind string, payload string, version int",
    )
    rows = {r.id: r for r in to_source_payload(df, "mets").collect()}
    assert rows["m1"].payload.kind == "MetsFileWithImages"
    assert rows["m2"].payload.kind == "DeletedMetsFile"
    assert rows["m2"].payload.sourceData is None


def test_payload_miro_defaults(spark):
    # 'Miro records' — events default empty, overrides pass through
    df = spark.createDataFrame(
        [
            ("M1", True, "s3://b/1", None, None, 1),
            ("M2", False, "s3://b/2", ["ev1"], "cc-by", 2),
        ],
        "id string, is_cleared_for_catalogue_api boolean, location string, "
        "events array<string>, overrides string, version int",
    )
    rows = {r.id: r for r in to_source_payload(df, "miro").collect()}
    assert rows["M1"].payload.events == []
    assert rows["M1"].payload.overrides is None
    assert rows["M2"].payload.overrides == "cc-by"
    assert rows["M2"].payload.isClearedForCatalogueAPI is False


def test_funnel_report_flags_drops(spark):
    # get_reindex_status.py:213-233 — shrink vs previous stage
    df = spark.createDataFrame(
        [
            ("works", 0, "source", 100),
            ("works", 1, "identified", 100),
            ("works", 2, "denormalised", 97),
            ("works", 3, "indexed", 99),
            ("images", 0, "initial", 10),
            ("images", 1, "augmented", 10),
        ],
        "pipeline string, stage_order int, stage string, count long",
    )
    rows = {
        (r.pipeline, r.stage): r.drop for r in funnel_report(df).collect()
    }
    assert rows[("works", "denormalised")] == 3
    assert rows[("works", "indexed")] is None  # growth is not flagged
    assert rows[("works", "source")] is None
    assert rows[("images", "augmented")] is None


def test_run_reindex_requests_rejects_mixed_total_segments(spark):
    # a hand-built frame mixing moduli would silently mis-bucket —
    # segment residues are disjoint+covering for one modulus only
    import pytest

    table = _table(spark, 10)
    reqs = spark.createDataFrame(
        [
            ("complete/0", "complete", 0, 2, None, None),
            ("complete/0", "complete", 0, 3, None, None),
        ],
        "request_id string, mode string, segment int, total_segments int,"
        " max_records int, ids array<string>",
    )
    with pytest.raises(ValueError, match="total_segments"):
        run_reindex_requests(table, reqs, "miro")


def test_run_reindex_requests_partial_request_id_from_frame(spark):
    # the partial row's request_id is read from the frame, not hardcoded
    import pytest

    table = _table(spark, 10)
    reqs = spark.createDataFrame(
        [("backfill/7", "partial", None, None, 4, None)],
        "request_id string, mode string, segment int, total_segments int,"
        " max_records int, ids array<string>",
    )
    out = run_reindex_requests(table, reqs, "miro")
    assert {r.request_id for r in out.collect()} == {"backfill/7"}
    two = reqs.union(
        spark.createDataFrame(
            [("backfill/8", "partial", None, None, 2, None)], reqs.schema
        )
    )
    with pytest.raises(ValueError, match="partial"):
        run_reindex_requests(table, two, "miro")
