"""Ingestor loader/indexer bookkeeping scenarios
(base_transformer.py:107-146, ingestor_loader.py:46-88,
ingestor_indexer.py:45-84, events.py:64-96, step_events.py:20-52)."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.ingestor_loader import (
    format_window,
    global_offsets,
    ids_path_segment,
    loader_report,
    objects_from_listing,
    parse_window,
    path_prefix,
    shard_plan,
    triage_bulk_errors,
    write_jsonl_shards,
)
from tests.conftest import spark  # noqa: F401


def _docs(spark, n, parts=7):
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.concat(F.lit("doc:"), F.col("id").cast("string")).alias("payload"),
        )
        .repartition(parts)
    )


def test_path_prefix_full_mode(spark):
    # step_events docstring example: full reindex appends job segment
    p = path_prefix(
        "concepts",
        "2025-05-05",
        graph_date="2026-01-01",
        index_date="2025-06-06",
        job_id="20250930T0930",
    )
    assert p == (
        "graph-2026-01-01/pipeline-2025-05-05/ingestor_concepts/"
        "index-2025-06-06/full/job-20250930T0930"
    )


def test_path_prefix_window_mode_no_job(spark):
    # incremental windows key the run — no job segment (step_events:44-45)
    p = path_prefix(
        "works",
        "2025-05-05",
        window=(datetime(2025, 1, 1, 0, 0), datetime(2025, 1, 1, 0, 15)),
        job_id="should-not-appear",
    )
    assert p == (
        "graph-prod/pipeline-2025-05-05/ingestor_works/index-2025-05-05/"
        "windows/20250101T0000-20250101T0015"
    )
    # graph_date defaults to 'prod'; index_date defaults to pipeline_date


def test_path_prefix_ids_mode(spark):
    p = path_prefix("images", "d", ids=["b1", "a2"], job_id="j")
    assert p.endswith("by_id/a2_b1")
    many = [f"id{i}" for i in range(6)]
    seg = ids_path_segment(many)
    assert seg.startswith("hash_") and len(seg) == len("hash_") + 12
    with pytest.raises(ValueError):
        ids_path_segment([])


def test_window_roundtrip(spark):
    w = (datetime(2025, 1, 1, 9, 30), datetime(2025, 1, 1, 9, 45))
    assert parse_window(format_window(*w)) == w


def test_global_offsets_dense_rank(spark):
    got = {
        r["id"]: r["_rn0"]
        for r in global_offsets(_docs(spark, 25), "id").collect()
    }
    assert got == {i: i for i in range(25)}


def test_shard_plan_names_counts_bytes(spark):
    # 25 docs, batch 10 -> files 00000000-00000010 / ...10-20 / ...20-25
    plan = shard_plan(
        _docs(spark, 25),
        order_col="id",
        batch_size=10,
        payload_col="payload",
        prefix="s3://bkt/pre",
    ).orderBy("shard_index")
    rows = plan.collect()
    assert [r["file_name"] for r in rows] == [
        "00000000-00000010",
        "00000010-00000020",
        "00000020-00000025",
    ]
    assert [r["record_count"] for r in rows] == [10, 10, 5]
    # jsonl bytes: len('doc:{i}') + 1 per row
    assert rows[0]["content_length"] == sum(len(f"doc:{i}") + 1 for i in range(10))
    assert rows[2]["uri"] == "s3://bkt/pre/00000020-00000025.jsonl"
    rep = loader_report(plan).collect()[0]
    assert rep["n_objects"] == 3 and rep["record_count"] == 25
    assert rep["total_file_size"] == sum(len(f"doc:{i}") + 1 for i in range(25))


def test_shard_plan_empty_input(spark):
    plan = shard_plan(_docs(spark, 0), order_col="id", batch_size=10)
    assert plan.count() == 0
    rep = loader_report(plan).collect()[0]
    assert rep["n_objects"] == 0 and rep["record_count"] == 0


def test_write_jsonl_shards_measures_tell(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_jsonl_shards(
        _docs(spark, 23), out, order_col="id", payload_col="payload", batch_size=10
    ).orderBy("shard_index")
    rows = manifest.collect()
    assert [r["file_name"] for r in rows] == [
        "00000000-00000010",
        "00000010-00000020",
        "00000020-00000023",
    ]
    # measured f.tell() equals the plan's computed bytes, and the files
    # exist with exactly those sizes, rows in id order
    plan = {
        r["file_name"]: r["content_length"]
        for r in shard_plan(
            _docs(spark, 23), order_col="id", batch_size=10, payload_col="payload"
        ).collect()
    }
    for r in rows:
        path = os.path.join(out, r["file_name"] + ".jsonl")
        assert os.path.getsize(path) == r["content_length"] == plan[r["file_name"]]
    first = open(os.path.join(out, rows[0]["file_name"] + ".jsonl")).read()
    assert first.splitlines()[:3] == ["doc:0", "doc:1", "doc:2"]


def test_objects_from_listing(spark):
    listing = spark.createDataFrame(
        [
            ("pre/full/job-1/00000000-00010000.parquet", 111),
            ("pre/full/job-1/00010000-00012070.parquet", 22),
            ("pre/full/job-1/manifest.json", 9),  # wrong suffix: dropped
        ],
        "key string, size long",
    )
    rows = (
        objects_from_listing(listing, load_format="parquet", bucket="bkt")
        .orderBy("file_name")
        .collect()
    )
    assert [r["record_count"] for r in rows] == [10000, 2070]
    assert rows[0]["uri"] == "s3://bkt/pre/full/job-1/00000000-00010000.parquet"
    assert rows[1]["content_length"] == 22


def test_triage_bulk_errors(spark):
    errors = spark.createDataFrame(
        [
            ("version_conflict_engine_exception",),
            ("version_conflict_engine_exception",),
            ("mapper_parsing_exception",),
        ],
        "error_type string",
    )
    row = triage_bulk_errors(errors).collect()[0]
    assert row["version_conflict_count"] == 2 and row["other_error_count"] == 1
    empty = triage_bulk_errors(errors.limit(0)).collect()[0]
    assert empty["version_conflict_count"] == 0 and empty["other_error_count"] == 0
