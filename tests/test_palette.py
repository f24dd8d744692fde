"""Palette inferrer parity vs the reference's numpy histogram
(pipeline/inferrer/palette_inferrer/app/palette_encoder.py, noise-free
path) and similarity/aspect-ratio behaviors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.operators.palette import (
    aspect_ratio,
    average_color_hex,
    palette_histogram,
    palette_similarity_topk,
)


def _pixels(seed, n=64):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, 3)).astype(int)


def _img_df(spark, arrays):
    rows = [
        (f"im{i}", [(int(r), int(g), int(b)) for r, g, b in arr])
        for i, arr in enumerate(arrays)
    ]
    return spark.createDataFrame(
        rows, "id string, pixels array<struct<r:int,g:int,b:int>>"
    )


def _numpy_hist(arr, n_bins=10):
    """The reference embed() without the noise repeat (exact histogram)."""
    bins = np.linspace(0, 255, n_bins + 1)
    h, _ = np.histogramdd(arr.astype(float), bins=[bins, bins, bins])
    return (h / np.linalg.norm(h)).flatten()


def test_histogram_matches_numpy_histogramdd(spark):
    arrays = [_pixels(s) for s in range(4)]
    # include every boundary value in one image to pin the edge semantics
    edges = np.array(
        [[v, v, v] for v in (0, 25, 26, 254, 255)] + [[255, 0, 128]], dtype=int
    )
    arrays.append(edges)
    df = _img_df(spark, arrays)
    got = {}
    for r in palette_histogram(df).collect():
        got.setdefault(r["id"], {})[r["bin"]] = r["weight"]
    for i, arr in enumerate(arrays):
        want = _numpy_hist(arr)
        nz = {int(b): float(want[b]) for b in np.nonzero(want)[0]}
        have = got[f"im{i}"]
        assert set(have) == set(nz), f"im{i} bins differ"
        for b, w in nz.items():
            assert have[b] == pytest.approx(w, abs=1e-12), (i, b)


def test_average_color_hex_matches_reference(spark):
    arrays = [_pixels(7), np.array([[26, 43, 60], [27, 44, 61]], dtype=int)]
    df = _img_df(spark, arrays)
    got = dict(
        (r["id"], r["average_color_hex"]) for r in average_color_hex(df).collect()
    )
    for i, arr in enumerate(arrays):
        avg = arr.mean(axis=0)
        r, g, b = avg.astype(int)
        assert got[f"im{i}"] == f"#{r:02x}{g:02x}{b:02x}"


def test_similarity_identical_palettes_rank_first(spark):
    a = _pixels(1)
    arrays = [a, a.copy(), _pixels(2)]
    df = _img_df(spark, arrays)
    hist = palette_histogram(df)
    q = spark.createDataFrame([("im0",)], "id string")
    out = palette_similarity_topk(hist, q, k=2).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["neighbor_id"] == "im1"
    assert by_rank[1]["cosine"] == pytest.approx(1.0, abs=1e-12)
    assert by_rank[2]["cosine"] < 1.0


def test_aspect_ratio_null_on_degenerate(spark):
    df = spark.createDataFrame(
        [("a", 200, 100), ("b", 10, 0)], "id string, width int, height int"
    )
    got = {r["id"]: r["aspect_ratio"] for r in aspect_ratio(df).collect()}
    assert got["a"] == 2.0 and got["b"] is None
