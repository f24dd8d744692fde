"""Schemas + the schema-evolution column-mapping registry.

Input shape is dictated by BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp)``. The binlog adds CDC bookkeeping columns; the state table adds
LWW bookkeeping (tombstones + tie-break key), mirroring the reference's
``(namespace, id, content, changeset, last_modified, deleted)`` pipeline-store
schema (catalogue_graph/src/adapters/utils/schemata.py:9-33).

Schema evolution model (tolerance for extra/missing columns in incoming
batches, pipeline_store.py:273-281):
  * schema_ver 1 — base: no ``tool`` column, ``turn_idx`` int32
  * schema_ver 2 — adds ``tool`` (older rows null)
  * schema_ver 3 — widens ``turn_idx`` to int64

The registry maps any incoming batch version onto the CURRENT (widest) schema
with pure column expressions — nulls for added columns, casts for widenings —
so the hot path stays JVM-side. A pandas-UDF escape hatch exists for mappings
a cast can't express (none are needed for v1→v3; it is exercised in tests to
keep the Arrow path honest).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# the change-event log (CDC input) — FIXTURES.md §2
BINLOG_SCHEMA = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("op", StringType(), False),  # insert|update|delete|upsert
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", LongType(), False),  # widest form
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
        StructField("schema_ver", IntegerType(), False),
    ]
)

# the user-visible transcripts table — FIXTURES.md §1
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", LongType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# Internal state = two independent MAX-REGISTERS per (conv_id, turn_idx):
#
#   winner register  (ts, op_pri, offset)       — the LWW gate; its op decides
#                                                 ``deleted`` (tombstones kept
#                                                 so stale updates still lose:
#                                                 deletes one-way for older
#                                                 data, sierra_reader.py:50-53;
#                                                 op_pri=1 for delete encodes
#                                                 equal-ts delete-dominance X6)
#   non-delete register (nd_ts, nd_offset)      — newest visible payload; the
#                                                 role/text/tool columns are
#                                                 ALWAYS this register's
#                                                 payload (when the winner is
#                                                 a non-delete, winner == nd).
#
# Two max-registers make apply ASSOCIATIVE and COMMUTATIVE: any grouping of
# events into batches/ranges yields the identical final state, which is what
# makes overlap replay, crash/resume, and the single-threaded parity oracle
# byte-for-byte equal. J5 content preservation (tombstones keep replayable
# payload, adapter_store.py:91-148) falls out of the nd register for free.
STATE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", LongType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
        StructField("op_pri", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("nd_ts", TimestampType(), True),
        StructField("nd_offset", LongType(), True),
        StructField("deleted", StringType(), False),  # "true"/"false" — see note
    ]
)
# note: ``deleted`` as string avoids the SQL-null three-valued-logic trap the
# reference hit in Arrow (adapter_store.py:128-136 "PyArrow's and_/if_else
# propagate nulls (unlike SQL)") — but Spark HAS SQL semantics, so we simply
# make it non-null boolean-ish and never null. Stored as string for stable
# cross-engine hashing in the parity oracle.

CHECKPOINT_SCHEMA = StructType(
    [
        StructField("range_id", StringType(), False),
        StructField("offset_start", LongType(), False),
        StructField("offset_end", LongType(), False),
        StructField("state", StringType(), False),  # pending|success|failed
        StructField("attempts", IntegerType(), False),
        StructField("changeset_id", StringType(), True),
        StructField("snapshot_id", LongType(), True),
        StructField("updated_at", TimestampType(), True),
        StructField("metrics", MapType(StringType(), StringType()), True),
    ]
)


MappingExpr = Callable[[DataFrame], Column]


class SchemaRegistry:
    """Column-mapping registry: (schema_ver → per-column mapping exprs).

    ``normalize(df)`` projects ANY supported incoming batch version onto the
    current widest binlog schema using native column expressions (nulls for
    added columns, casts for widenings), the Spark rendering of the
    reference's projection-onto-common-columns tolerance
    (pipeline_store.py:273-281). Unknown versions fail fast.
    """

    CURRENT_VERSION = 3

    #: columns added at each version (column → null-filled before then)
    ADDED: dict[int, list[str]] = {2: ["tool"]}
    #: column type widenings at each version (column → target type)
    WIDENED: dict[int, dict[str, str]] = {3: {"turn_idx": "bigint"}}

    def __init__(self, pandas_mappers: dict[str, Callable[[pd.Series], pd.Series]] | None = None):
        # optional Arrow-vectorized per-column mappers (no per-row Python):
        # applied as pandas UDFs only for columns that need a real function
        self.pandas_mappers = pandas_mappers or {}

    def normalize(self, df: DataFrame) -> DataFrame:
        """Map a batch holding rows of mixed ``schema_ver`` ∈ {1..CURRENT}
        onto the current schema. Missing columns become typed nulls; narrow
        ints are widened by cast (vectorized, JVM-side)."""
        cols = {f.name for f in df.schema.fields}
        out = df
        for _ver, added in self.ADDED.items():
            for c in added:
                if c not in cols:
                    out = out.withColumn(c, F.lit(None).cast("string"))
        for _ver, widenings in self.WIDENED.items():
            for c, t in widenings.items():
                out = out.withColumn(c, F.col(c).cast(t))
        for c, fn in self.pandas_mappers.items():
            udf = F.pandas_udf(fn, out.schema[c].dataType)  # Arrow-batched
            out = out.withColumn(c, udf(F.col(c)))
        # project in canonical order
        return out.select(*[f.name for f in BINLOG_SCHEMA.fields])
