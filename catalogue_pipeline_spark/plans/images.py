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


def indexable_image_documents(images: DataFrame, work_docs: DataFrame) -> DataFrame:
    """The full images-ingestor document builder
    (ingestor/models/indexable/image.py:35-44 + display/query/aggregate/
    filter/vector image models): each image document embeds its PARENT
    work's computed sections, so this is a join of the augmented image
    against the indexable-works output (plans/works_ingestor.
    indexable_works) rather than a re-derivation — the reference calls the
    same Display/Query/Aggregate work transformers on the extracted work.

    ``images``: (image_id, work_id, locations array<loc struct>,
    aspect_ratio, average_color_hex, features, palette_embedding).
    ``work_docs``: indexable_works output.  Faithful quirks kept:
    aggregatable licenses come from the WORK's item locations
    (aggregate/image.py:24-29 uses AggregateWorkTransformer) while
    filterable ``locations_license_id`` uses the IMAGE's own locations
    (filter/image.py:44-46); missing inferred data defaults to
    aspect_ratio 1.0 / average color '#ffffff' (display/image.py:66-67).
    Orphan images (no VISIBLE parent work) drop out on the inner join
    (images_extractor.py:50-59)."""
    from .works_ingestor import _display_location

    w = work_docs.filter(F.col("type") == "Visible").select(
        F.col("work_id"),
        F.col("display").alias("_wd"),
        F.col("query").alias("_wq"),
        F.col("aggregatable").alias("_wa"),
        F.col("filterable").alias("_wf"),
    )
    out = images.join(w, "work_id")
    locs = F.transform(F.col("locations"), _display_location)
    thumb = F.try_element_at(
        F.filter(locs, lambda loc: loc.getField("location_type_id") == "iiif-image"),
        F.lit(1),
    )
    wd, wq, wa, wf = F.col("_wd"), F.col("_wq"), F.col("_wa"), F.col("_wf")
    return out.select(
        "image_id",
        "work_id",
        F.struct(
            F.col("image_id").alias("id"),
            locs.alias("locations"),
            thumb.alias("thumbnail"),
            F.coalesce(F.col("aspect_ratio"), F.lit(1.0)).alias("aspect_ratio"),
            F.coalesce(F.col("average_color_hex"), F.lit("#ffffff")).alias(
                "average_color"
            ),
            F.struct(
                wd.getField("id").alias("id"),
                wd.getField("title").alias("title"),
                wd.getField("contributors").alias("contributors"),
                wd.getField("subjects").alias("subjects"),
                wd.getField("genres").alias("genres"),
                wd.getField("languages").alias("languages"),
                F.lit("Work").alias("type"),
            ).alias("source"),
            F.lit("Image").alias("type"),
        ).alias("display"),
        F.struct(F.col("image_id").alias("id"), wq.alias("source")).alias("query"),
        F.struct(
            wa.getField("item_licenses").alias("licenses"),
            wa.getField("contributors").alias("contributors"),
            wa.getField("genres").alias("genres"),
            wa.getField("subjects").alias("subjects"),
        ).alias("aggregatable"),
        F.struct(
            F.filter(
                F.transform(F.col("locations"), lambda loc: loc.getField("license_id")),
                lambda x: x.isNotNull(),
            ).alias("locations_license_id"),
            wf.getField("contributors_agent_label").alias("source_contributors_agent_label"),
            wf.getField("contributors_agent_id").alias("source_contributors_agent_id"),
            wf.getField("contributors_agent_source_identifier").alias(
                "source_contributors_agent_source_identifier"
            ),
            wf.getField("genres_label").alias("source_genres_label"),
            wf.getField("genres_concepts_id").alias("source_genres_concepts_id"),
            wf.getField("genres_concepts_source_identifier").alias(
                "source_genres_concepts_source_identifier"
            ),
            wf.getField("subjects_label").alias("source_subjects_label"),
            wf.getField("subjects_concepts_id").alias("source_subjects_concepts_id"),
            wf.getField("subjects_concepts_source_identifier").alias(
                "source_subjects_concepts_source_identifier"
            ),
            wf.getField("production_dates_range_from").alias(
                "source_production_dates_range_from"
            ),
        ).alias("filterable"),
        F.struct(
            F.col("features").alias("features"),
            F.col("palette_embedding").alias("palette_embedding"),
        ).alias("vector_values"),
    )


# ------------------------------------------------------------------ inference
# The image-inferrer state machine (catalogue_graph/src/inferrer/):
# find_work partitions the window's image ids; each inference task downloads
# the DLCS thumbnail, calls the three inferrer sidecars, and bulk-writes
# augmented docs ALL-OR-NOTHING — with one carve-out for images whose asset
# permanently fails to download (inference_manager.py:173-194).

# adapters.py:22 — a VGG feature vector has exactly 4096 dims; anything else
# is a poisoned doc.  The engine takes the dim as a parameter so tests can
# run small.
FEATURE_VECTOR_SIZE = 4096
# image_downloader.py:30-33 — transient HTTP statuses (retry, then fail the
# task); any other non-200 is permanent (skip + count).
TRANSIENT_STATUS_CODES = (429, 500, 502, 503, 504)


def inference_image_url(locations) -> "F.Column":
    """``get_image_url`` + ``_to_thumbnail_url``
    (image_downloader.py:50-62): the first iiif-image location's URL with an
    ``info.json`` suffix swapped for the fixed DLCS 400x400 thumbnail form;
    NULL when no iiif-image location exists (a permanent download error —
    the reference raises ImageDownloadError there)."""
    url = F.try_element_at(
        F.filter(
            locations, lambda loc: loc.getField("location_type_id") == "iiif-image"
        ),
        F.lit(1),
    ).getField("url")
    return F.when(
        url.endswith("info.json"),
        F.concat(
            F.substring(url, 1, F.length(url) - F.lit(9)),
            F.lit("full/!400,400/0/default.jpg"),
        ),
    ).otherwise(url)


def inference_find_work(
    initial: DataFrame,
    *,
    ids: list[str] | None = None,
    window: tuple[str, str] | None = None,
    partition_size: int = 300,
) -> DataFrame:
    """The work-discovery step (inferrer/steps/find_work.py:38-65): select
    the ids in scope — explicit ids, a [from, to) modified-time window, or
    full — and partition them into fixed-size chunks, one per downstream
    inference task.  Output (image_id, partition_id).  The chunking is the
    O5 control-plane pattern (rank over the id column only); the id list a
    window matches is Lambda-sized by construction in the reference."""
    from ..operators.precedence import fixed_size_chunks

    df = initial.select("image_id", "modified_time")
    if ids is not None:
        df = df.filter(F.col("image_id").isin(*ids))
    elif window is not None:
        lo, hi = window
        df = df.filter(
            (F.col("modified_time") >= F.lit(lo)) & (F.col("modified_time") < F.lit(hi))
        )
    return fixed_size_chunks(
        df.select("image_id"), "image_id", partition_size
    ).withColumnRenamed("chunk_id", "partition_id")


def run_inference(
    initial: DataFrame,
    downloads: DataFrame,
    features: DataFrame,
    palette: DataFrame,
    aspect_ratios: DataFrame,
    *,
    partitions: DataFrame | None = None,
    feature_dim: int = FEATURE_VECTOR_SIZE,
    batch_time: str = "1970-01-01T00:00:00Z",
) -> tuple[DataFrame, DataFrame]:
    """The inference-manager task re-expressed over the whole window at once
    (inference_manager.py:130-228), keeping the reference's per-TASK
    all-or-nothing semantics by keying every gate on ``partition_id``:

    * an image whose asset PERMANENTLY fails to download (non-200 outside
      the transient set, or no iiif-image URL at all) is skipped and
      counted — it must not block its partition (:173-177);
    * a TRANSIENT download failure, a missing inferrer response (the task
      must receive all three), or a poisoned doc (wrong feature-vector
      size, empty palette embedding, missing average colour or aspect
      ratio, validate_inferred :75-93) fails the WHOLE partition — none of
      that partition's images are indexed, exactly as the dead task
      indexes nothing;
    * successful partitions emit augmented docs stamped with the batch's
      ``augmented_time`` (:114-127) plus a per-partition report row
      mirroring InferenceManagerResult (:224-228).

    ``downloads``: (image_id, http_status int) — the download outcome per
    image; missing row or status 200 = ok.  ``features``: (image_id,
    features array<float>).  ``palette``: (image_id, palette_embedding
    array<float>, average_color_hex).  ``aspect_ratios``: (image_id,
    aspect_ratio double).  ``partitions``: inference_find_work output;
    default = everything in one partition.  Returns (augmented, report).

    Scale shape: four image_id equi-joins (the same key partitioning
    reused), ONE groupBy(partition_id) rollup, and a partition_id join
    back — no driver-side state, no per-row Python."""
    if partitions is None:
        partitions = initial.select("image_id").withColumn(
            "partition_id", F.lit(0).cast("int")
        )
    st = F.col("http_status")
    dl_class = (
        F.when(st.isNull() | (st == 200), F.lit("ok"))
        .when(st.isin(*TRANSIENT_STATUS_CODES), F.lit("transient"))
        .otherwise(F.lit("permanent"))
    )
    g = (
        initial.join(partitions, "image_id")
        .join(downloads.select("image_id", "http_status"), "image_id", "left")
        .withColumn("_dl", dl_class)
        .join(
            features.select("image_id", "features", F.lit(True).alias("_has_f")),
            "image_id",
            "left",
        )
        .join(
            palette.select(
                "image_id",
                "palette_embedding",
                "average_color_hex",
                F.lit(True).alias("_has_p"),
            ),
            "image_id",
            "left",
        )
        .join(
            aspect_ratios.select(
                "image_id", "aspect_ratio", F.lit(True).alias("_has_a")
            ),
            "image_id",
            "left",
        )
    )
    # a MISSING response row is an inferrer failure; a PRESENT row whose
    # payload fails validate_inferred (:75-93) is a poisoned doc — the
    # adapters deliberately pass bad payloads through so the manager can
    # tell the two apart (adapters.py:45-62)
    poisoned = (
        (F.coalesce(F.size("features"), F.lit(-1)) != feature_dim)
        | (F.coalesce(F.size("palette_embedding"), F.lit(0)) == 0)
        | F.col("average_color_hex").isNull()
        | F.col("aspect_ratio").isNull()
    )
    state = (
        F.when(F.col("_dl") == "permanent", F.lit("skipped"))
        .when(F.col("_dl") == "transient", F.lit("transient_download"))
        .when(
            F.col("_has_f").isNull()
            | F.col("_has_p").isNull()
            | F.col("_has_a").isNull(),
            F.lit("inferrer_failure"),
        )
        .when(poisoned, F.lit("poisoned"))
        .otherwise(F.lit("ok"))
    )
    g = g.withColumn("_state", state)
    fatal = ~F.col("_state").isin("ok", "skipped")
    report = g.groupBy("partition_id").agg(
        F.count("*").alias("processed"),
        F.sum(F.when(F.col("_state") == "ok", 1).otherwise(0)).alias("augmented"),
        F.sum(F.when(F.col("_state") == "skipped", 1).otherwise(0)).alias(
            "download_failures"
        ),
        F.min(F.when(fatal, F.col("_state"))).alias("error_kind"),
    )
    report = report.select(
        "partition_id",
        F.when(F.col("error_kind").isNull(), F.lit("ok"))
        .otherwise(F.lit("failed"))
        .alias("status"),
        "error_kind",
        "processed",
        # a failed task indexes (and therefore reports) nothing augmented
        F.when(F.col("error_kind").isNull(), F.col("augmented"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("augmented"),
        F.when(F.col("error_kind").isNull(), F.col("download_failures"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("download_failures"),
    )
    ok_parts = report.filter(F.col("status") == "ok").select("partition_id")
    augmented = (
        g.filter(F.col("_state") == "ok")
        .join(ok_parts, "partition_id")
        .select(
            "image_id",
            "partition_id",
            F.struct(
                F.col("features"),
                F.col("palette_embedding"),
                F.col("average_color_hex"),
                F.col("aspect_ratio"),
            ).alias("inferred_data"),
            F.lit(batch_time).alias("augmented_time"),
        )
    )
    return augmented, report


def image_vector_values(augmented: DataFrame) -> DataFrame:
    """The vector-index projection of an augmented image
    (ingestor/models/vector/image.py:5-14): just the two embedding
    columns, keyed by image id."""
    return augmented.select(
        "image_id",
        F.col("inferred_data").getField("features").alias("features"),
        F.col("inferred_data").getField("palette_embedding").alias(
            "palette_embedding"
        ),
    )
