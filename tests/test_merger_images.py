"""Merger image rules: scenarios mirrored from ImageDataRuleTest.scala,
ImagesRuleTest.scala, FlatImageMergeRuleTest.scala and
PlatformMergerTest.scala:304-343 (multi-item sierra + miro), plus the
TargetOnlyMergeResult standalone-image cases (MergeResult.scala:18-37) and
withItemsInInternalWorks (WorkMergingOps.scala:23-40)."""

import datetime as dt

from pyspark.sql import functions as F

from catalogue_pipeline_spark.plans.merger import (
    match_and_merge,
    merged_image_stream,
    propagate_to_internal_works,
)

BATCH_TS = dt.datetime(2024, 6, 1, 12, 0, 0)
SCHEMA = (
    "work_id string, source_type string, merge_candidate_ids array<string>, "
    "suppressed boolean, items array<string>, identifiers array<string>, "
    "thumbnail string, format string, digcodes array<string>, "
    "images array<struct<image_id:string,licence:string>>"
)


def w(wid, typ, cands=(), items=("i",), fmt=None, digcodes=(), images=(), thumb=None):
    return (
        wid, typ, list(cands), False, [f"{i}-{wid}" for i in items],
        [f"id-{wid}"], thumb, fmt, list(digcodes),
        [(f"img-{wid}{sfx}", lic) for sfx, lic in images],
    )


def run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = match_and_merge(df, BATCH_TS)
    return {r["work_id"]: r for r in out.collect()}


def imgs(row, col="image_data"):
    return [(x["image_id"], x["licence"]) for x in row[col]]


# --------------------------- ImageDataRule (target imageData) ---------------

def test_images_from_miro_into_sierra_target(spark):
    """'returns images from Miro' + 'does not return images from METS'
    (ImageDataRuleTest): only Miro images populate the target's imageData;
    METS images ride via items, not imageData."""
    rows = [
        w("s1", "sierra", cands=["m1", "m2", "x1"], fmt="picture"),
        w("m1", "miro", images=[("", "L0")]),
        w("m2", "miro", images=[("", "L0")]),
        w("x1", "mets", images=[("a", "L1"), ("b", "L1"), ("c", "L1")]),
    ]
    got = run(spark, rows)
    assert imgs(got["s1"]) == [("img-m1", "L0"), ("img-m2", "L0")]
    for s in ("m1", "m2", "x1"):
        assert got[s]["type"] == "Redirected"


def test_digmiro_discards_miro_images(spark):
    """'discards Miro images for Sierra works with digmiro or digaids'
    (ImageDataRuleTest) — and a matched-but-unmerged Miro emits nothing."""
    for code in ("digmiro", "digaids"):
        rows = [
            # two items so neither ThumbnailRule nor ItemsRule redirects m1
            w("s1", "sierra", cands=["m1"], fmt="picture", items=("i1", "i2"),
              digcodes=[code]),
            w("m1", "miro", images=[("", "L0")]),
        ]
        got = run(spark, rows)
        assert imgs(got["s1"]) == []
        assert got["m1"]["type"] == "Visible"  # no rule matched it
        assert imgs(got["m1"], "emitted_images") == []  # matched-unmerged: none


def test_digmiro_elected_under_tei_and_calm_targets(spark):
    """'discards digmiro images when the target is a TEI/CALM work'
    (ImageDataRuleTest): the sierra participant is elected regardless of the
    principal target; its digcode suppresses the Miro images."""
    for ttyp in ("tei", "calm"):
        titems = () if ttyp == "tei" else ("i",)
        rows = [
            (f"t1", ttyp, ["s9", "m1", "x1"], False,
             [f"i-{i}" for i in range(len(titems))], ["id-t1"], None, None, [], []),
            w("s9", "sierra", digcodes=["digaids"]),
            w("m1", "miro", images=[("", "L0")]),
            w("x1", "mets", images=[("a", "L1")]),
        ]
        got = run(spark, rows)
        assert imgs(got["t1"]) == []


def test_non_digmiro_digcode_keeps_miro_images(spark):
    """'returns Miro images for Sierra works with non-digmiro digcodes' and
    'a mixture of digmiro and non-digmiro digcodes' (ImageDataRuleTest)."""
    got = run(spark, [
        w("s1", "sierra", cands=["m1"], fmt="picture", digcodes=["digicon"]),
        w("m1", "miro", images=[("", "L0")]),
    ])
    assert imgs(got["s1"]) == [("img-m1", "L0")]
    got = run(spark, [
        w("s1", "sierra", cands=["m1"], fmt="picture",
          digcodes=["digicon", "digmiro", "digpicture"]),
        w("m1", "miro", images=[("", "L0")]),
    ])
    assert imgs(got["s1"]) == []


def test_multi_item_sierra_redirects_miro_with_image_data(spark):
    """PlatformMergerTest.scala:304-343: multi-item sierra + miro — items
    unmerged but the miro redirects and its images land in imageData."""
    got = run(spark, [
        w("s1", "sierra", cands=["m1"], items=("i1", "i2"), fmt="picture"),
        w("m1", "miro", images=[("", "L0")]),
    ])
    assert got["m1"]["type"] == "Redirected"
    assert got["s1"]["items"] == ["i1-s1", "i2-s1"]
    assert imgs(got["s1"]) == [("img-m1", "L0")]


# ------------------------ ImagesRule (emitted image stream) -----------------

def test_mets_images_emitted_for_picture_and_ephemera(spark):
    """'creates n images from a METS work … and a single Sierra picture/
    ephemera work' (ImagesRuleTest)."""
    for fmt in ("picture", "ephemera"):
        got = run(spark, [
            w("s1", "sierra", cands=["x1"], fmt=fmt),
            w("x1", "mets", images=[("a", "L1"), ("b", "L1")]),
        ])
        assert imgs(got["s1"], "emitted_images") == [
            ("img-x1a", "L1"), ("img-x1b", "L1")]
        assert imgs(got["s1"]) == []  # METS never populates imageData


def test_mets_plus_miro_emitted_with_licence_copy(spark):
    """'creates n + m images …' + 'overrides the licence in Miro works with
    the licence from the METS work' (ImagesRuleTest / ImageDataOps)."""
    got = run(spark, [
        w("s1", "sierra", cands=["m1", "m2", "x1"], fmt="ephemera"),
        w("m1", "miro", images=[("", "L0")]),
        w("m2", "miro", images=[("", "L0")]),
        w("x1", "mets", images=[("a", "L9"), ("b", "L9")]),
    ])
    # mets first, then miro with the single distinct METS licence copied in
    assert imgs(got["s1"], "emitted_images") == [
        ("img-x1a", "L9"), ("img-x1b", "L9"),
        ("img-m1", "L9"), ("img-m2", "L9"),
    ]
    # imageData keeps the ORIGINAL miro licences (ImageDataRule has no copy)
    assert imgs(got["s1"]) == [("img-m1", "L0"), ("img-m2", "L0")]


def test_ambiguous_mets_licences_leave_miro_untouched(spark):
    """ImageDataOps: 'multiple source licences present … leaving original'."""
    got = run(spark, [
        w("s1", "sierra", cands=["m1", "x1"], fmt="picture"),
        w("m1", "miro", images=[("", "L0")]),
        w("x1", "mets", images=[("a", "L1"), ("b", "L2")]),
    ])
    assert imgs(got["s1"], "emitted_images") == [
        ("img-x1a", "L1"), ("img-x1b", "L2"), ("img-m1", "L0")]


def test_non_picture_sierra_ignores_mets_images(spark):
    """'ignores METS images, but uses n Miro images, for a non-picture/
    ephemera Sierra work' (ImagesRuleTest)."""
    got = run(spark, [
        w("s1", "sierra", cands=["m1", "x1"]),  # no format
        w("m1", "miro", images=[("", "L0")]),
        w("x1", "mets", images=[("a", "L1")]),
    ])
    assert imgs(got["s1"], "emitted_images") == [("img-m1", "L0")]
    assert imgs(got["s1"]) == [("img-m1", "L0")]


def test_digaids_emits_mets_only(spark):
    """'does not use Miro images when a METS image is present for a digaids
    Sierra work' (ImagesRuleTest digmiro suppression)."""
    got = run(spark, [
        w("s1", "sierra", cands=["m1", "x1"], fmt="picture", digcodes=["digaids"]),
        w("m1", "miro", images=[("", "L0")]),
        w("x1", "mets", images=[("a", "L1")]),
    ])
    assert imgs(got["s1"], "emitted_images") == [("img-x1a", "L1")]
    assert imgs(got["s1"]) == []


def test_digmiro_source_elected_over_unmarked_sierra_target(spark):
    """'correctly identifies a digmiro Sierra work even if there is an
    unmarked Sierra work participating in the merge' (ImagesRuleTest)."""
    got = run(spark, [
        w("s0", "sierra", cands=["s9", "m1", "x1"]),  # actual target, unmarked
        w("s9", "sierra", fmt="picture", digcodes=["digmiro"]),
        w("m1", "miro", images=[("", "L0")]),
        w("x1", "mets", images=[("a", "L1")]),
    ])
    # elected = s9 (digmiro, picture): mets emitted, miro suppressed;
    # the result is applied to the ACTUAL target s0
    assert imgs(got["s0"], "emitted_images") == [("img-x1a", "L1")]
    assert imgs(got["s0"]) == []


# ----------------- standalone images + stream + internal works --------------

def test_standalone_miro_singleton_emits_own_images(spark):
    """TargetOnlyMergeResult (MergeResult.scala:18-37): an unmatched
    single-digital-item Miro work emits its own images, parented by itself;
    a multi-item Miro singleton emits nothing."""
    got = run(spark, [
        w("m1", "miro", images=[("", "L0")]),
        w("m2", "miro", items=("i1", "i2"), images=[("", "L0")]),
        w("s1", "sierra", images=[("", "LS")]),
    ])
    assert imgs(got["m1"], "emitted_images") == [("img-m1", "L0")]
    assert imgs(got["m2"], "emitted_images") == []
    assert imgs(got["s1"], "emitted_images") == []
    # singleton data untouched: imageData stays its own
    assert imgs(got["m1"]) == [("img-m1", "L0")]
    assert imgs(got["m2"]) == [("img-m2", "L0")]


def test_merged_image_stream_parents(spark):
    """ImageDataWithSource: parent = the ACTUAL merge target."""
    df = spark.createDataFrame([
        w("s1", "sierra", cands=["m1"], fmt="picture"),
        w("m1", "miro", images=[("", "L0")]),
        w("m9", "miro", images=[("", "L0")]),
    ], SCHEMA)
    out = merged_image_stream(match_and_merge(df, BATCH_TS))
    rows = {(r["parent_work_id"], r["image_id"]) for r in out.collect()}
    assert rows == {("s1", "img-m1"), ("m9", "img-m9")}


def test_propagate_to_internal_works(spark):
    """withItemsInInternalWorks + Merger.scala:126-146: internal stubs of the
    merge TARGET carry the wrapper's MERGED items and MERGED thumbnail;
    redirected sources' stubs are dropped."""
    df = spark.createDataFrame([
        w("t1", "tei", cands=["s1"], items=()),
        w("s1", "sierra", items=("i1", "i2"), thumb=None),
        w("lone", "tei", items=("i",)),
    ], SCHEMA)
    merged = match_and_merge(df, BATCH_TS)
    stubs = spark.createDataFrame(
        [("t1", "t1/1"), ("t1", "t1/2"), ("s1", "s1/1"), ("lone", "lone/1")],
        "work_id string, stub_work_id string",
    )
    out = {r["work_id"]: r for r in propagate_to_internal_works(merged, stubs).collect()}
    # tei target: ItemsRule replaced its items with the sierra source's
    assert sorted(out) == ["lone/1", "t1/1", "t1/2"]  # s1 redirected → dropped
    assert out["t1/1"]["items"] == ["i1-s1", "i2-s1"]
    assert out["t1/1"]["wrapper_work_id"] == "t1"
    assert out["lone/1"]["items"] == ["i-lone"]
    assert out["t1/1"]["batch_ts"] == BATCH_TS
