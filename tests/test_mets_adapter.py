"""METS adapter bag parity — scenarios from mets_adapter BagTest and the
worker's space filter."""

from datetime import datetime

from catalogue_pipeline_spark.plans.mets_adapter import bag_to_mets_source_data

SCHEMA = (
    "external_identifier string, space string, bucket string, path string, "
    "version string, created_date timestamp, "
    "files array<struct<name:string,path:string>>"
)
T = datetime(2024, 5, 1, 12, 0)


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r.external_identifier: r for r in bag_to_mets_source_data(df).collect()}


def _f(name, path=None):
    return (name, path or f"v1/{name}")


def test_extracts_full_mets_data(spark):
    # BagTest 'extracts all METS data from Bag' (+ 'when not first file')
    rows = _run(
        spark,
        [
            (
                "b1234567",
                "digitised",
                "bkt",
                "digitised/b1234567",
                "v3",
                T,
                [
                    _f("data/alto/b12345678_0001.xml"),
                    _f("data/b12345678.xml"),
                    _f("data/b12345678_0001.xml"),
                    _f("data/b12345678_0002.xml"),
                    _f("objects/blah.jp2"),
                ],
            )
        ],
    )
    r = rows["b1234567"]
    assert r.status == "ok" and r.kind == "MetsFileWithImages"
    assert r.filename == "v1/data/b12345678.xml"
    assert r.root_bucket == "bkt" and r.root_key_prefix == "digitised/b1234567"
    assert r.manifestations == [
        "v1/data/b12345678_0001.xml",
        "v1/data/b12345678_0002.xml",
    ]
    assert r.version == 3 and r.created_date == T


def test_b_number_ending_x_and_born_digital_form(spark):
    # 'b-number ending with x' + 'born-digital METS...xml form'
    rows = _run(
        spark,
        [
            ("bx", "digitised", "b", "p", "v1", T, [_f("data/b1234567x.xml")]),
            (
                "bd",
                "born-digital",
                "b",
                "p",
                "v1",
                T,
                [
                    _f("data/METS.b5cdf62c-fc63-46b8-a5f8-d8e0eb46e3b2.xml"),
                    _f("objects/file.pdf"),
                ],
            ),
        ],
    )
    # the x-suffixed bag holds ONLY its METS file -> deleted (issue 4893)
    assert rows["bx"].kind == "DeletedMetsFile"
    assert rows["bd"].kind == "MetsFileWithImages"
    assert rows["bd"].filename == "v1/data/METS.b5cdf62c-fc63-46b8-a5f8-d8e0eb46e3b2.xml"


def test_rejects_wrong_names(spark):
    # 'name not prefixed with data/' + 'name isn't XML'
    rows = _run(
        spark,
        [
            ("nodata", "digitised", "b", "p", "v1", T, [_f("b12345678.xml")]),
            ("noxml", "digitised", "b", "p", "v1", T, [_f("data/b12345678.txt")]),
        ],
    )
    assert rows["nodata"].status == "error"
    assert rows["nodata"].error == "Couldn't find METS file"
    assert rows["noxml"].status == "error"


def test_empty_manifest_is_deleted(spark):
    # 'marks a METS data as deleted if the bag manifest is empty' (4872)
    rows = _run(spark, [("gone", "digitised", "b", "p", "v2", T, [])])
    r = rows["gone"]
    assert r.status == "ok" and r.kind == "DeletedMetsFile"
    assert r.version == 2 and r.filename is None


def test_invalid_version_fails(spark):
    # 'doesn't parse incorrectly formatted versions'
    rows = _run(
        spark,
        [
            ("bad1", "digitised", "b", "p", "x1", T, [_f("data/b12345678.xml")]),
            ("bad2", "digitised", "b", "p", "", T, [_f("data/b12345678.xml")]),
            ("ok27", "digitised", "b", "p", "v27", T, [_f("data/b12345678.xml"), _f("objects/x.jp2")]),
        ],
    )
    assert rows["bad1"].status == "error"
    assert rows["bad1"].error == "Couldn't parse version"
    assert rows["bad2"].status == "error"
    assert rows["ok27"].version == 27


def test_space_filter_skips(spark):
    # MetsAdapterWorkerService:85-97
    rows = _run(
        spark,
        [("stage", "staging", "b", "p", "v1", T, [_f("data/b12345678.xml")])],
    )
    assert rows["stage"].status == "skipped_space"
    assert rows["stage"].kind is None
