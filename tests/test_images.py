"""Images pipeline slice: extract → augment → indexable documents."""

import json

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.images import (
    augment_images,
    extract_image_data,
    indexable_images,
)
from catalogue_pipeline_spark.plans.miro_transform import miro_locations


def test_images_pipeline(spark):
    recs = spark.createDataFrame(
        [
            ("V0000001", json.dumps({"image_use_restrictions": "CC-BY"})),
            ("V0000002", json.dumps({"image_use_restrictions": "Do not use"})),
            ("V0000003", json.dumps({"image_use_restrictions": "CC-0"})),
        ],
        "id string, content string",
    )
    locs = miro_locations(recs)
    link = spark.createDataFrame(
        [("V0000001", "wk1"), ("V0000002", "wk2"), ("V0000003", "wk_orphan")],
        "id string, work_id string",
    )
    images = extract_image_data(locs, link)
    got = {r["image_id"]: r.asDict() for r in images.collect()}
    # the suppressed record's image is dropped with it
    assert set(got) == {"V0000001", "V0000003"}
    assert got["V0000001"]["license_id"] == "cc-by"
    assert got["V0000001"]["thumbnail_url"].endswith("/full/300,/0/default.jpg")

    palette = spark.createDataFrame(
        [("V0000001", "#1a2b3c")], "id string, average_color_hex string"
    )
    ar = spark.createDataFrame(
        [("V0000001", 1.5), ("V0000003", 0.75)], "id string, aspect_ratio double"
    )
    aug = augment_images(images, palette, ar)
    a = {r["image_id"]: r.asDict() for r in aug.collect()}
    assert a["V0000001"]["average_color_hex"] == "#1a2b3c"
    assert a["V0000001"]["aspect_ratio"] == 1.5
    # a missing inferrer row leaves NULL features, like a failed inferrer
    assert a["V0000003"]["average_color_hex"] is None

    works = spark.createDataFrame(
        [("wk1", "Visible", "A work"), ("wk_gone", "Visible", "B"),
         ("wk_orphan", "Deleted", "C")],
        "work_id string, type string, title string",
    )
    docs, orphans = indexable_images(aug, works)
    rows = docs.collect()
    # V0000003's parent is not visible → orphan, warning-counted
    assert [r["image_id"] for r in rows] == ["V0000001"]
    assert rows[0]["work_title"] == "A work"
    assert orphans == 1


def test_infer_features_deterministic_unit_norm(spark):
    import hashlib
    import math

    from catalogue_pipeline_spark.plans.images import infer_features

    imgs = spark.createDataFrame([("V1",), ("V2",)], "image_id string")
    got = {r["image_id"]: r["features"] for r in infer_features(imgs, dim=16).collect()}
    assert len(got["V1"]) == 16
    # unit L2 norm — the inferrer's output contract (main.py:48)
    assert abs(math.sqrt(sum(x * x for x in got["V1"])) - 1.0) < 1e-5
    # deterministic, content-keyed: recompute dim 0 by hand
    raw = [
        int(hashlib.md5(f"V1:{j}".encode()).hexdigest()[:8], 16) / 2147483648.0 - 1.0
        for j in range(16)
    ]
    n = math.sqrt(sum(x * x for x in raw))
    assert abs(got["V1"][0] - raw[0] / n) < 1e-6
    assert got["V1"] != got["V2"]

    # and it rides through the augmentor fan-in on image_id
    from catalogue_pipeline_spark.plans.images import augment_images

    feats = infer_features(imgs, dim=4)
    aug = augment_images(
        spark.createDataFrame(
            [("V1", "u", "t", "cc-by", "wk1")],
            "image_id string, location_url string, thumbnail_url string, "
            "license_id string, work_id string",
        ),
        features=feats,
    )
    row = aug.collect()[0]
    assert len(row["features"]) == 4
