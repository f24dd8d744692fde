"""File snapshot loaders (S5): full-file sources → (id, content) records.

The reference loads MARCXML full files into Arrow tables
(marcxml_loader.py / steps/ebsco/loader.py:66-80). Here: Spark-native
loaders producing DataFrames ready for snapshot_sync. XML parsing uses
Spark 4's built-in ``from_xml``; JSONL uses the json reader. Both are
declarative scans — schema inference is avoided (explicit schemas), so the
loaders are safe to point at TB-scale drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def load_jsonl_records(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Load newline-delimited JSON records with an explicit schema (never
    inference at scale)."""
    schema = schema or StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("turn_idx", StringType(), True),
            StructField("role", StringType(), True),
            StructField("text", StringType(), True),
            StructField("tool", StringType(), True),
        ]
    )
    df = spark.read.schema(schema).json(path)
    if "turn_idx" in df.columns:
        df = df.withColumn("turn_idx", F.col("turn_idx").cast("bigint"))
    return df


def load_xml_records(
    spark: SparkSession,
    path: str,
    record_schema: str = "conv_id STRING, turn_idx BIGINT, role STRING, text STRING, tool STRING",
    record_tag: str = "record",
) -> DataFrame:
    """Load an XML full-file drop: each line-delimited ``<record>…</record>``
    blob parsed with the built-in from_xml (no Python parsing).

    For multi-line XML files, pre-split with ``spark.read.text`` +
    ``wholetext`` and a regexp extract of record elements — kept simple here
    because the reference's files are record-per-blob after its own split
    step (marcxml_loader.py).
    """
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_xml(F.col("value"), record_schema).alias("r")
    ).select("r.*")
    return parsed.filter(F.col("conv_id").isNotNull())
