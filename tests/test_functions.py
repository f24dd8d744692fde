from pyspark.sql import functions as F

from catalogue_pipeline_spark.functions import (
    canonical_id,
    deep_diff,
    to_clean_json,
    trace_id,
    unlinked_ids,
)


def test_canonical_id_shape_and_determinism(spark):
    df = spark.createDataFrame([("sierra", "b1234"), ("calm", "x9")], "src string, id string")
    out = df.select(canonical_id(F.col("src"), F.col("id")).alias("cid")).collect()
    again = df.select(canonical_id(F.col("src"), F.col("id")).alias("cid")).collect()
    assert out == again  # deterministic across runs (X3 requirement)
    for r in out:
        cid = r["cid"]
        assert len(cid) == 8
        assert cid[0].isalpha()
        assert not set(cid) & set("0oil1")
    assert out[0]["cid"] != out[1]["cid"]


def test_trace_and_json(spark):
    df = spark.createDataFrame([(1, "a", None)], "k long, v string, n string")
    row = df.select(
        trace_id(F.col("k"), F.col("v")).alias("t"),
        to_clean_json(F.struct("k", "v", "n")).alias("j"),
    ).collect()[0]
    assert len(row["t"]) == 32
    assert row["j"] == '{"k":1,"v":"a"}'  # null field dropped (X4)


def test_unlinked_ids(spark):
    df = spark.createDataFrame(
        [(["a", "b"], ["c"], ["b"])],
        "old_links array<string>, old_unlinked array<string>, new_links array<string>",
    )
    got = df.select(
        F.array_sort(unlinked_ids(F.col("old_links"), F.col("old_unlinked"), F.col("new_links"))).alias("u")
    ).collect()[0]["u"]
    assert got == ["a", "c"]  # (a,b ∪ c) − b


def test_deep_diff(spark):
    a = spark.createDataFrame([(1, 0.123456), (2, 5.0)], "k long, v double")
    b = spark.createDataFrame([(2, 5.0), (1, 0.123457)], "k long, v double")
    d1, d2 = deep_diff(a, b)
    assert d1.count() == 1 and d2.count() == 1  # strict: the float differs
    d1, d2 = deep_diff(a, b, float_tolerance=1e-4)
    assert d1.count() == 0 and d2.count() == 0  # tolerant: equal


def test_mint_canonical_ids_collision_gate(spark):
    from catalogue_pipeline_spark.functions import (
        CanonicalIdCollision,
        mint_canonical_ids,
    )

    df = spark.createDataFrame([(f"k{i}",) for i in range(300)], "k string")
    # tiny id space (2 chars ≈ 713 ids) over 300 keys: birthday collision
    # is certain — the gate must fire
    import pytest as _pytest

    with _pytest.raises(CanonicalIdCollision):
        mint_canonical_ids(df, "k", length=2)
    # the fractional gate tolerates them when asked (A8-style)
    assert mint_canonical_ids(df, "k", length=2, max_collision_fraction=1.0).count() == 300
    # at the real 8-char space a small corpus mints uniquely
    minted = mint_canonical_ids(df, "k", length=8)
    assert minted.select("canonical_id").distinct().count() == 300
