"""Scenario 10: stream transitions schema_ver 1→2 (adds ``tool``) and 2→3
(``turn_idx`` int32→int64); final table uses the widest schema. Also checks
the pandas-UDF escape hatch keeps the Arrow path honest."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from catalogue_pipeline_spark.cdc import (
    BINLOG_SCHEMA,
    STATE_SCHEMA,
    SchemaRegistry,
    merge_into_state,
    resolve_lww,
)
from catalogue_pipeline_spark.cdc.merge import visible_transcripts
from catalogue_pipeline_spark.lake import LakeTable

T0 = dt.datetime(2024, 1, 1)

V1_SCHEMA = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("op", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),  # narrow!
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        # no ``tool`` column at all
        StructField("ts", TimestampType(), False),
        StructField("schema_ver", IntegerType(), False),
    ]
)


def test_normalize_v1_batch(spark):
    reg = SchemaRegistry()
    v1 = spark.createDataFrame(
        [(0, "insert", "a", 1, "user", "hi", T0, 1)], V1_SCHEMA
    )
    out = reg.normalize(v1)
    assert out.schema == BINLOG_SCHEMA or [
        (f.name, f.dataType) for f in out.schema.fields
    ] == [(f.name, f.dataType) for f in BINLOG_SCHEMA.fields]
    row = out.collect()[0]
    assert row["tool"] is None and row["turn_idx"] == 1
    assert out.schema["turn_idx"].dataType == LongType()


def test_mixed_version_stream_end_to_end(spark, tmp_path):
    """v1 batch (no tool, narrow ints) then v3 batch — one table, widest
    schema, old rows null-tool."""
    table = LakeTable.create(
        str(tmp_path / "t"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=2
    )
    reg = SchemaRegistry()
    v1 = spark.createDataFrame(
        [(0, "insert", "a", 1, "user", "old-style", T0, 1)], V1_SCHEMA
    )
    merge_into_state(spark, table, resolve_lww(reg.normalize(v1)), "cs1")
    v3 = spark.createDataFrame(
        [(1, "insert", "a", 2, "tool", "new-style", "tool_x", T0 + dt.timedelta(seconds=1), 3)],
        BINLOG_SCHEMA,
    )
    merge_into_state(spark, table, resolve_lww(reg.normalize(v3)), "cs2")
    rows = {r["turn_idx"]: r for r in visible_transcripts(table.read(spark)).collect()}
    assert rows[1]["tool"] is None and rows[1]["text"] == "old-style"
    assert rows[2]["tool"] == "tool_x"
    assert table.read(spark).schema["turn_idx"].dataType == LongType()


def test_pandas_udf_mapper_is_vectorized(spark):
    """A registry mapper runs as an Arrow-batched pandas UDF (series in/out,
    never per-row Python objects)."""
    seen_types = []

    def upper_mapper(s: pd.Series) -> pd.Series:
        seen_types.append(type(s).__name__)
        return s.str.upper()

    reg = SchemaRegistry(pandas_mappers={"role": upper_mapper})
    v1 = spark.createDataFrame(
        [(i, "insert", "a", i, "user", "x", T0, 1) for i in range(10)], V1_SCHEMA
    )
    out = reg.normalize(v1)
    assert {r["role"] for r in out.collect()} == {"USER"}
