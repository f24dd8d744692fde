"""EBSCO trigger parity — scenarios from
tests/adapters/extractors/ebsco/test_trigger.py."""

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.ebsco_adapter import (
    get_most_recent_valid_file,
    plan_sync,
    snapshot_file_date,
)


def test_most_recent_valid():
    files = [
        "ebz-s7451719-20240322-1.xml",
        "ebz-s7451719-20231225-5.xml",
        "ebz-s7451719-20200101-10.xml",
    ]
    assert get_most_recent_valid_file(files) == "ebz-s7451719-20240322-1.xml"


def test_invalid_names_and_bad_date():
    assert get_most_recent_valid_file(["abc-s7451719-20240322-1.xml"]) is None
    assert get_most_recent_valid_file(["ebz-s7451719-20240322-1.txt"]) is None
    with pytest.raises(ValueError):
        get_most_recent_valid_file(["ebz-s7451719-20240332-1.xml"])  # bad day


def test_plan_sync_reuse_download_error():
    newest = "ebz-s7451719-20240322-1.xml"
    older = "ebz-s7451719-20231225-5.xml"
    # 'file already exists in S3' -> reuse, no fetch
    p = plan_sync([newest, older], [f"pre/{newest}"])
    assert p == {"action": "reuse", "fetch": None, "forward": newest}
    # fresh file -> download it, forward it
    p = plan_sync([newest], [f"pre/{older}"])
    assert p == {"action": "download", "fetch": newest, "forward": newest}
    # 'forward most recent S3 file' — a pre-seeded NEWER object wins
    seeded = "ebz-s7451719-20250101-1.xml"
    p = plan_sync([newest], [f"pre/{seeded}"])
    assert p["action"] == "download" and p["forward"] == seeded
    # 'no xml files found'
    assert plan_sync(["junk.txt"], [])["action"] == "error"


def test_snapshot_file_date_column(spark):
    df = spark.createDataFrame(
        [("ebz-s7451719-20240322-1.xml",), ("nope.xml",)], "name string"
    ).select(snapshot_file_date(F.col("name")).cast("string").alias("d"))
    assert [r.d for r in df.collect()] == ["2024-03-22", None]
