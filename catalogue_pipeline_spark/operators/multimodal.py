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
