"""Images pipeline slice: source image data → augmented images →
indexable image documents.

The reference runs images through their own mini-pipeline alongside works:
Miro (and METS thumbnail) works carry ``ImageData``; the inferrer stack
attaches palette / aspect-ratio features ("augmented" images,
pipeline/inferrer/*); the graph ingestor joins each augmented image back
to its parent VISIBLE work and drops orphans
(catalogue_graph/src/ingestor/extractors/images/images_extractor.py:44-66 —
the ES-batch + work-lookup loop is a plain equi-join here).

Spark-first: every stage is a narrow map or a bib/work-keyed equi-join;
the inferrer outputs join on image_id (the same partitioning reused across
both joins), and the orphan drop is the inner join itself — the
reference's per-batch ``work_id in works_batch`` check.  The returned
``orphans`` count mirrors its warning log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_image_data(miro_locations: DataFrame, works: DataFrame) -> DataFrame:
    """Image rows from the Miro location slice joined to their works:
    (image_id, work_id, location_url, thumbnail_url, license_id) — only
    images whose record was neither suppressed nor errored
    (MiroImageData semantics: the image inherits the record's fate)."""
    live = miro_locations.filter(
        (F.col("suppress_reason").isNull() | (F.col("suppress_reason") == ""))
        & (F.col("error_reason").isNull() | (F.col("error_reason") == ""))
    )
    w = works.select(F.col("id").alias("image_id"), F.col("work_id"))
    return live.select(
        F.col("id").alias("image_id"),
        "location_url",
        "thumbnail_url",
        "license_id",
    ).join(w, "image_id")


def infer_features(images: DataFrame, key_col: str = "image_id", dim: int = 16) -> DataFrame:
    """Deterministic stand-in for the VGG16 feature inferrer
    (pipeline/inferrer/feature_inferrer/app/src/feature_extraction.py:28-37,
    whose 4096-d output main.py:48 L2-normalises before indexing).  Real
    model weights are out of scope in this engine; this derives a
    unit-norm pseudo-embedding from per-dimension md5 of ``key ':' j`` —
    deterministic, SQL-reproducible, and carrying the inferrer's exact
    output CONTRACT (fixed-dim array<float>, ||v|| = 1) so the images
    pipeline is end-to-end testable.  Pure JVM codegen: hex→[-1,1) per
    dim, one array aggregate for the norm — no Python, no shuffle."""
    key = F.col(key_col)
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.conv(
            F.substring(F.md5(F.concat(key, F.lit(":"), j.cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(2147483648.0)
        - F.lit(1.0),
    )
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    return images.withColumn(
        "features", F.transform(raw, lambda x: (x / norm).cast("float"))
    )


def augment_images(
    images: DataFrame,
    palette: DataFrame | None = None,
    aspect_ratios: DataFrame | None = None,
    features: DataFrame | None = None,
) -> DataFrame:
    """Attach inferrer outputs (operators/palette.py) on image_id — the
    reference's augmentor fan-in (inferrer manager).  Missing inferrer
    rows leave NULL features, exactly as a failed inferrer does."""
    out = images
    if palette is not None:
        out = out.join(
            palette.select(
                F.col("id").alias("image_id"),
                F.col("average_color_hex").alias("average_color_hex"),
            ),
            "image_id",
            "left",
        )
    if aspect_ratios is not None:
        out = out.join(
            aspect_ratios.select(
                F.col("id").alias("image_id"), "aspect_ratio"
            ),
            "image_id",
            "left",
        )
    if features is not None:
        out = out.join(
            features.select("image_id", "features"), "image_id", "left"
        )
    return out


def indexable_images(
    augmented: DataFrame, works: DataFrame
) -> tuple[DataFrame, int]:
    """Join augmented images to their parent VISIBLE work and drop
    orphans (images_extractor.py:50-59).  Returns (documents, n_orphans);
    the orphan count is the reference's warning-log signal."""
    visible = works.filter(F.col("type") == "Visible").select(
        F.col("work_id"), F.col("title").alias("work_title")
    )
    docs = augmented.join(visible, "work_id")
    n_orphans = augmented.count() - docs.count()
    return docs, n_orphans
