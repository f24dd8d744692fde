"""Palette inferrer: color-histogram embeddings + palette similarity.

The reference runs three inferrer sidecar services over every image
(pipeline/inferrer): aspect_ratio, feature (CLIP-style vectors — covered by
the embeddings/ANN operators), and palette
(palette_inferrer/app/palette_encoder.py): a 50×50 NEAREST-resampled RGB
image becomes an n_bins³ color histogram (np.histogramdd over
linspace(0,255,n_bins+1) edges), L2-normalized, plus an average-color hex
string.

Spark-first re-expression — the numpy histogram becomes **explode +
groupBy**, which is also the 100 TB-correct representation:

  * pixels(id, array<struct<r,g,b>>) → posexplode → per-pixel bin index
    (pure integer arithmetic, codegen) → groupBy (id, bin) count →
    window-normalize.  No UDF anywhere; the whole embedding is JVM-side.
  * the result is a SPARSE histogram table (id, bin, weight) — images touch
    ~dozens of the n_bins³=1000 bins, so sparse rows beat a dense
    1000-float array by ~20× in shuffle bytes, and similarity becomes a
    relational join instead of a vector UDF.
  * palette similarity (cosine) = join on bin, SUM(w_a·w_b) — the classic
    sparse dot product.  Skew note: a handful of bins (whites/blacks) are
    hot; the per-(query,candidate) groupBy partial-aggregates map-side, and
    at real scale the join side would be bin-bucketed with a document
    frequency cap, exactly like the LSH band join in operators/dedup.py.

Determinism deviation (documented): the reference adds unseeded gaussian
noise to 100× repeated pixels so boundary colors smear across bins
(palette_encoder.py:44-50) — nondeterministic by construction.  We compute
the exact histogram (no noise), which is the same embedding in expectation;
robustness-smearing belongs in the query side (probe neighboring bins), not
in stored data, when replays must be byte-identical.

Binning parity: np.histogramdd over linspace(0,255,n+1) maps v →
min(floor(v·n/255), n−1) (last edge closed); the integer form
``(v*n)//255`` clamped is bit-identical for v ∈ [0,255] (proved in
tests/test_palette.py against numpy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _bin(v, n_bins):
    return F.least(F.floor(v * n_bins / F.lit(255)), F.lit(n_bins - 1)).cast("int")


def palette_histogram(
    images: DataFrame, *, id_col: str = "id", pixel_col: str = "pixels",
    n_bins: int = 10,
) -> DataFrame:
    """images(id, pixels: array<struct<r:int,g:int,b:int>>) →
    (id, bin, weight) sparse L2-normalized color histogram."""
    px = images.select(id_col, F.explode(pixel_col).alias("p"))
    flat = (
        _bin(F.col("p.r"), n_bins) * (n_bins * n_bins)
        + _bin(F.col("p.g"), n_bins) * n_bins
        + _bin(F.col("p.b"), n_bins)
    )
    counts = px.select(F.col(id_col), flat.alias("bin")).groupBy(id_col, "bin").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy(id_col)
    return counts.select(
        id_col,
        "bin",
        (
            F.col("n")
            / F.sqrt(F.sum(F.col("n") * F.col("n")).over(w))
        ).alias("weight"),
    )


def average_color_hex(
    images: DataFrame, *, id_col: str = "id", pixel_col: str = "pixels"
) -> DataFrame:
    """images → (id, average_color_hex), e.g. '#1a2b3c'
    (palette_encoder.py:58-73; np .astype(int) truncates → floor for
    non-negative means)."""
    px = images.select(id_col, F.explode(pixel_col).alias("p"))
    return px.groupBy(id_col).agg(
        F.format_string(
            "#%02x%02x%02x",
            F.floor(F.avg("p.r")).cast("int"),
            F.floor(F.avg("p.g")).cast("int"),
            F.floor(F.avg("p.b")).cast("int"),
        ).alias("average_color_hex")
    )


def palette_similarity_topk(
    hist: DataFrame, query_ids: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k palette neighbors per query image: sparse cosine =
    join-on-bin + SUM(w_q·w_c).  Histograms are unit-normalized, so the
    dot product IS the cosine.  Ties pinned by neighbor id ASC."""
    q = hist.join(query_ids, "id").select(
        F.col("id").alias("query_id"), "bin", F.col("weight").alias("wq")
    )
    pairs = (
        q.join(hist.select(F.col("id").alias("neighbor_id"), "bin", "weight"), "bin")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("wq") * F.col("weight")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def aspect_ratio(
    media: DataFrame, *, width_col: str = "width", height_col: str = "height"
) -> DataFrame:
    """The aspect_ratio_inferrer: width/height from metadata (NULL-safe on
    degenerate heights)."""
    return media.withColumn(
        "aspect_ratio",
        F.when(
            F.col(height_col) > 0,
            F.col(width_col).cast("double") / F.col(height_col),
        ),
    )
