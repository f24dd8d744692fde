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


# record-splitting regex: namespace-prefix-insensitive, (?s) so records span
# lines. MARCXML is regular enough for this (no nested <record> elements).
_RECORD_RE = r"(?s)<(?:\w+:)?record[\s>].*?</(?:\w+:)?record>|(?s)<(?:\w+:)?record/>"
_CONTROL_001_RE = (
    r"(?s)<(?:\w+:)?controlfield[^>]*tag=\"001\"[^>]*>\s*(.*?)\s*</(?:\w+:)?controlfield>"
)
# tempered dot between the 035 open tag and its $a: the match must not cross
# </datafield>, else a 035 with no $a would silently steal subfield a from a
# LATER datafield (e.g. 040$a) instead of raising MissingRecordIdentifier
_DATA_035A_RE = (
    r"(?s)<(?:\w+:)?datafield[^>]*tag=\"035\"[^>]*>"
    r"(?:(?!</(?:\w+:)?datafield>).)*?"
    r"<(?:\w+:)?subfield[^>]*code=\"a\"[^>]*>\s*(?:\([^)]*\))?\s*(.*?)\s*</(?:\w+:)?subfield>"
)


def load_marcxml_collection(
    spark: SparkSession,
    path: str,
    namespace: str = "ebsco",
    strict: bool = True,
) -> DataFrame:
    """Load REAL multi-record MARCXML full files (the reference's
    marcxml_loader.py: one <collection> per file, many <record> elements,
    records identified by controlfield 001 or datafield 035$a with any
    parenthetical prefix stripped). Output: (namespace, id, content) —
    the reference's Arrow schema.

    Spark-first shape: ``wholetext`` gives one row per FILE (a full-file XML
    drop parallelizes across files, exactly like the reference's per-file
    load), the record split and id extraction are JVM-side regexes inside
    codegen — no lxml, no Python in the executor path. MARCXML's flat
    record structure (no nested <record>) makes the regex split exact.

    ``strict=True`` raises if any record lacks a usable identifier
    (MissingRecordIdentifierError semantics, marcxml_loader.py:40-66);
    ``strict=False`` drops such records instead.
    """
    raw = spark.read.text(path, wholetext=True)
    records = raw.select(
        F.explode(F.regexp_extract_all("value", F.lit(_RECORD_RE), 0)).alias("content")
    )
    with_id = records.select(
        F.lit(namespace).alias("namespace"),
        F.nullif(
            F.coalesce(
                F.nullif(F.regexp_extract("content", _CONTROL_001_RE, 1), F.lit("")),
                F.nullif(F.regexp_extract("content", _DATA_035A_RE, 1), F.lit("")),
            ),
            F.lit(""),
        ).alias("id"),
        F.col("content"),
    )
    if strict:
        bad = with_id.filter(F.col("id").isNull()).limit(1).collect()
        if bad:
            raise ValueError(
                "MissingRecordIdentifier: no controlfield 001 or datafield 035$a in: "
                + bad[0]["content"][:200]
            )
        return with_id
    return with_id.filter(F.col("id").isNotNull())
