"""Image inference manager + find-work: the all-or-nothing task semantics.

Scenarios ported from catalogue_graph/tests/inferrer/test_inference_manager.py
(validate poisoned docs, index-nothing-on-poison, skip permanently
undownloadable, still-fail on transient), test_find_work.py (partitioned
work, modified-time window) and test_image_downloader.py (info.json →
thumbnail rewrite, pass-through, no-iiif-location).
"""

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.images import (
    image_vector_values,
    inference_find_work,
    inference_image_url,
    run_inference,
)

LOC_T = "array<struct<location_type_id:string,url:string>>"


def _initial(spark, ids):
    return spark.createDataFrame(
        [(i, f"2024-01-01T00:00:{n:02d}Z") for n, i in enumerate(ids)],
        "image_id string, modified_time string",
    )


def _ok_outputs(spark, ids, dim=4):
    feats = spark.createDataFrame(
        [(i, [float(n)] * dim) for n, i in enumerate(ids)],
        "image_id string, features array<float>",
    )
    pal = spark.createDataFrame(
        [(i, [0.5, 0.5], "#aabbcc") for i in ids],
        "image_id string, palette_embedding array<float>, average_color_hex string",
    )
    ar = spark.createDataFrame(
        [(i, 1.5) for i in ids], "image_id string, aspect_ratio double"
    )
    return feats, pal, ar


def _downloads(spark, rows):
    return spark.createDataFrame(rows, "image_id string, http_status int")


def test_happy_path_indexes_augmented_images(spark):
    # test_handler_indexes_augmented_image
    ids = ["im1", "im2"]
    feats, pal, ar = _ok_outputs(spark, ids)
    aug, rep = run_inference(
        _initial(spark, ids),
        _downloads(spark, [("im1", 200)]),  # im2 has no row = ok
        feats,
        pal,
        ar,
        feature_dim=4,
        batch_time="2024-06-01T12:00:00Z",
    )
    got = {r["image_id"]: r.asDict() for r in aug.collect()}
    assert set(got) == {"im1", "im2"}
    assert got["im1"]["augmented_time"] == "2024-06-01T12:00:00Z"
    assert got["im1"]["inferred_data"]["average_color_hex"] == "#aabbcc"
    r = rep.collect()[0].asDict()
    assert (r["status"], r["processed"], r["augmented"], r["download_failures"]) == (
        "ok", 2, 2, 0,
    )


def test_poisoned_doc_fails_partition_and_indexes_nothing(spark):
    # test_handler_fails_and_indexes_nothing_on_poison +
    # test_validate_inferred_rejects_poisoned_data: each poison variant
    # (short feature vector, empty palette, missing colour, missing aspect
    # ratio) kills its whole partition — even the healthy images.
    ids = ["p1", "p2"]
    feats = spark.createDataFrame(
        [("p1", [1.0] * 4), ("p2", [1.0] * 3)],  # p2: wrong dim
        "image_id string, features array<float>",
    )
    _, pal, ar = _ok_outputs(spark, ids)
    aug, rep = run_inference(
        _initial(spark, ids), _downloads(spark, []), feats, pal, ar, feature_dim=4
    )
    assert aug.count() == 0
    r = rep.collect()[0].asDict()
    assert (r["status"], r["error_kind"], r["augmented"]) == ("failed", "poisoned", 0)

    for bad_pal, bad_ar in [(True, False), (False, True)]:
        pal2 = spark.createDataFrame(
            [("p1", [0.5], "#aabbcc"), ("p2", [] if bad_pal else [0.5], "#aabbcc")],
            "image_id string, palette_embedding array<float>, average_color_hex string",
        )
        ar2 = spark.createDataFrame(
            [("p1", 1.5), ("p2", None if bad_ar else 1.5)],
            "image_id string, aspect_ratio double",
        )
        feats_ok, _, _ = _ok_outputs(spark, ids)
        aug2, rep2 = run_inference(
            _initial(spark, ids), _downloads(spark, []), feats_ok, pal2, ar2,
            feature_dim=4,
        )
        assert aug2.count() == 0
        assert rep2.collect()[0]["error_kind"] == "poisoned"


def test_permanent_download_failure_is_skipped_and_counted(spark):
    # test_handler_skips_permanently_undownloadable_image: a 404 must not
    # block the rest of the partition.
    ids = ["d1", "d2", "d3"]
    feats, pal, ar = _ok_outputs(spark, ids)
    aug, rep = run_inference(
        _initial(spark, ids),
        _downloads(spark, [("d2", 404)]),
        feats, pal, ar, feature_dim=4,
    )
    assert {r["image_id"] for r in aug.collect()} == {"d1", "d3"}
    r = rep.collect()[0].asDict()
    assert (r["status"], r["processed"], r["augmented"], r["download_failures"]) == (
        "ok", 3, 2, 1,
    )


def test_transient_download_failure_fails_the_partition(spark):
    # test_handler_still_fails_on_transient_download_error: a 502 after
    # retries fails the whole task, unlike the 404 carve-out.
    ids = ["t1", "t2"]
    feats, pal, ar = _ok_outputs(spark, ids)
    aug, rep = run_inference(
        _initial(spark, ids),
        _downloads(spark, [("t2", 502)]),
        feats, pal, ar, feature_dim=4,
    )
    assert aug.count() == 0
    r = rep.collect()[0].asDict()
    assert (r["status"], r["error_kind"]) == ("failed", "transient_download")


def test_missing_inferrer_response_fails_the_partition(spark):
    # "must receive all three responses" (inference_manager.py:8-9): a
    # missing palette row is an inferrer failure, not a poisoned doc.
    ids = ["m1", "m2"]
    feats, pal, ar = _ok_outputs(spark, ids)
    aug, rep = run_inference(
        _initial(spark, ids),
        _downloads(spark, []),
        feats,
        pal.filter(F.col("image_id") != "m2"),
        ar, feature_dim=4,
    )
    assert aug.count() == 0
    assert rep.collect()[0]["error_kind"] == "inferrer_failure"


def test_partition_isolation(spark):
    # The all-or-nothing gate is per TASK: partition 0 stays green while
    # partition 1 dies of its poison.
    ids = ["a1", "a2", "b1", "b2"]
    parts = spark.createDataFrame(
        [("a1", 0), ("a2", 0), ("b1", 1), ("b2", 1)],
        "image_id string, partition_id int",
    )
    feats = spark.createDataFrame(
        [("a1", [1.0] * 4), ("a2", [1.0] * 4), ("b1", [1.0] * 4), ("b2", [1.0] * 2)],
        "image_id string, features array<float>",
    )
    _, pal, ar = _ok_outputs(spark, ids)
    aug, rep = run_inference(
        _initial(spark, ids), _downloads(spark, []), feats, pal, ar,
        partitions=parts, feature_dim=4,
    )
    assert {r["image_id"] for r in aug.collect()} == {"a1", "a2"}
    by_part = {r["partition_id"]: r.asDict() for r in rep.collect()}
    assert by_part[0]["status"] == "ok" and by_part[0]["augmented"] == 2
    assert by_part[1]["status"] == "failed" and by_part[1]["augmented"] == 0


def test_find_work_partitions_and_window(spark):
    # test_handler_returns_partitioned_work + window query on modified_time
    initial = _initial(spark, [f"im{n:02d}" for n in range(10)])
    parts = inference_find_work(initial, partition_size=4)
    got = {r["image_id"]: r["partition_id"] for r in parts.collect()}
    assert len(got) == 10
    assert sorted(set(got.values())) == [0, 1, 2]
    # ids are chunked in id order
    assert got["im00"] == 0 and got["im04"] == 1 and got["im08"] == 2

    windowed = inference_find_work(
        initial,
        window=("2024-01-01T00:00:02Z", "2024-01-01T00:00:05Z"),
        partition_size=100,
    )
    assert {r["image_id"] for r in windowed.collect()} == {"im02", "im03", "im04"}

    by_ids = inference_find_work(initial, ids=["im07", "im01"], partition_size=1)
    assert {r["image_id"] for r in by_ids.collect()} == {"im01", "im07"}


def test_inference_image_url_rewrite(spark):
    # test_get_image_url_* : info.json → DLCS thumbnail; non-info.json
    # passes through; no iiif-image location → NULL (permanent failure).
    df = spark.createDataFrame(
        [
            ("u1", [("iiif-image", "https://iiif.io/img/abc/info.json")]),
            ("u2", [("iiif-image", "https://iiif.io/img/abc/full.jpg")]),
            ("u3", [("thumbnail-image", "https://iiif.io/t.jpg")]),
        ],
        f"image_id string, locations {LOC_T}",
    )
    got = {
        r["image_id"]: r["u"]
        for r in df.select(
            "image_id", inference_image_url(F.col("locations")).alias("u")
        ).collect()
    }
    assert got["u1"] == "https://iiif.io/img/abc/full/!400,400/0/default.jpg"
    assert got["u2"] == "https://iiif.io/img/abc/full.jpg"
    assert got["u3"] is None


def test_image_vector_values(spark):
    # ingestor/models/vector/image.py:5-14 projection
    ids = ["v1"]
    feats, pal, ar = _ok_outputs(spark, ids)
    aug, _ = run_inference(
        _initial(spark, ids), _downloads(spark, []), feats, pal, ar, feature_dim=4
    )
    row = image_vector_values(aug).collect()[0]
    assert row["features"] == [0.0, 0.0, 0.0, 0.0]
    assert row["palette_embedding"] == [0.5, 0.5]
