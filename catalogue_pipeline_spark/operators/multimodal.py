"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (image/audio libraries are not in this
container): ``decode_fn=None`` uses a deterministic fake that derives feature
values from the payload bytes, and ``strict=True`` raises NotImplementedError
— the Spark-side contract (schema, batching, partitioning, UDF signature) is
real and tested, which is the part that matters for the engine.

At scale: mapInPandas streams Arrow record batches through the Python worker
(no per-row pickling); partition sizing should target batches of tens of MB
of payload so decode amortizes (spark.sql.files.maxPartitionBytes + an
explicit repartition when payloads are huge).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature_0", DoubleType(), True),
        StructField("feature_1", DoubleType(), True),
        StructField("feature_2", DoubleType(), True),
    ]
)


def _fake_decode_features(payload: pd.Series) -> pd.DataFrame:
    """Deterministic fake 'decode': features derived from byte content —
    stands in for image-decode/resize/frame-sample until real codecs exist."""
    import hashlib

    def feats(b: bytes | None) -> tuple[float, float, float]:
        if b is None:
            return (0.0, 0.0, 0.0)
        h = hashlib.md5(b).digest()
        return (
            int.from_bytes(h[0:4], "big") / 2**32,
            int.from_bytes(h[4:8], "big") / 2**32,
            int.from_bytes(h[8:12], "big") / 2**32,
        )

    vals = payload.map(feats)
    return pd.DataFrame(
        {
            "feature_0": vals.map(lambda t: t[0]),
            "feature_1": vals.map(lambda t: t[1]),
            "feature_2": vals.map(lambda t: t[2]),
        }
    )


def extract_media_features(
    media: DataFrame,
    decode_fn=None,
    strict: bool = False,
    batch_rows_hint: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``decode_fn(pdf: pd.DataFrame) -> pd.DataFrame`` receives Arrow batches
    with all MEDIA_SCHEMA columns and must return FEATURE_SCHEMA columns
    minus the passthroughs. ``strict=True`` + no decode_fn raises
    NotImplementedError (clearly-marked stub per the build contract).
    """
    if strict and decode_fn is None:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present in "
            "this environment; pass decode_fn or use the deterministic fake"
        )
    fn = decode_fn

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = fn(pdf) if fn is not None else _fake_decode_features(pdf["payload"])
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                }
            )
            for c in ("feature_0", "feature_1", "feature_2"):
                out[c] = feats[c].astype("float64")
            yield out

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN: one output row per sampled frame timestamp —
    the timestamp grid is computed JVM-side (sequence/explode); the actual
    frame decode is the stubbed step above."""
    vids = media.filter(F.col("kind") == "video").filter(F.col("duration_ms").isNotNull())
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_plan(
    media: DataFrame,
    target_w: int,
    target_h: int,
    keep_aspect: bool = True,
) -> DataFrame:
    """Image-resize PLAN: per image, the output geometry (scale factor,
    letterbox offsets, final dims) computed JVM-side from width/height
    metadata — everything except the pixel pass, which belongs in the
    stubbed decode_fn. Columns: (media_id, out_w, out_h, scale, pad_x,
    pad_y). keep_aspect=False is a plain stretch (scale = width ratio)."""
    imgs = media.filter(
        (F.col("kind") == "image") & F.col("width").isNotNull() & F.col("height").isNotNull()
        & (F.col("width") > 0) & (F.col("height") > 0)
    )
    sx = F.lit(float(target_w)) / F.col("width")
    sy = F.lit(float(target_h)) / F.col("height")
    if keep_aspect:
        scale = F.least(sx, sy)
        out_w = F.floor(F.col("width") * scale).cast("int")
        out_h = F.floor(F.col("height") * scale).cast("int")
        return imgs.select(
            "media_id",
            F.lit(target_w).alias("canvas_w"),
            F.lit(target_h).alias("canvas_h"),
            out_w.alias("out_w"),
            out_h.alias("out_h"),
            F.round(scale, 6).alias("scale"),
            ((F.lit(target_w) - out_w) / 2).cast("int").alias("pad_x"),
            ((F.lit(target_h) - out_h) / 2).cast("int").alias("pad_y"),
        )
    return imgs.select(
        "media_id",
        F.lit(target_w).alias("canvas_w"),
        F.lit(target_h).alias("canvas_h"),
        F.lit(target_w).alias("out_w"),
        F.lit(target_h).alias("out_h"),
        F.round(sx, 6).alias("scale"),
        F.lit(0).alias("pad_x"),
        F.lit(0).alias("pad_y"),
    )


def sample_audio_windows(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio windowing PLAN: overlapping (start_ms, end_ms) analysis windows
    per clip, JVM-side sequence/explode — the sample decode is the stubbed
    step. Windows are clamped to the clip, hop may be < window (overlap)."""
    auds = media.filter((F.col("kind") == "audio") & F.col("duration_ms").isNotNull())
    return auds.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(hop_ms))
        ).alias("start_ms"),
        F.col("duration_ms"),
    ).select(
        "media_id",
        "start_ms",
        F.least(F.col("start_ms") + window_ms, F.col("duration_ms")).alias("end_ms"),
    )
