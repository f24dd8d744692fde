"""Scalar helper functions (SURVEY.md §2.9).

Deterministic variants of the reference's scalar utilities — determinism is a
hard requirement for replayable pipelines (X3 note: the reference mints ids
with ``random`` + a uniqueness table; we derive them from content so replays
mint identical ids with no coordination).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# canonical-id alphabet: lowercase+digits minus 0 o i l 1 (identifiers.py:1-39)
CANONICAL_ALPHABET = "23456789abcdefghjkmnpqrstuvwxyz"  # 31 chars
_FIRST_ALPHA = "abcdefghjkmnpqrstuvwxyz"  # first char must be alphabetic


def canonical_id(*cols: Column, length: int = 8) -> Column:
    """Deterministic 8-char canonical id over the reference's alphabet
    (8 chars, no 0/o/i/l/1, first char alphabetic — identifiers.py:1-39),
    derived from xxhash64 of the key columns instead of a random pool so
    replays are reproducible (X3)."""
    h = F.abs(F.xxhash64(*cols))
    first = F.substring(
        F.lit(_FIRST_ALPHA), (F.pmod(h, F.lit(len(_FIRST_ALPHA))) + 1).cast("int"), 1
    )
    rest = []
    acc = h
    for _ in range(length - 1):
        acc = F.abs(F.xxhash64(acc))
        rest.append(
            F.substring(
                F.lit(CANONICAL_ALPHABET),
                (F.pmod(acc, F.lit(len(CANONICAL_ALPHABET))) + 1).cast("int"),
                1,
            )
        )
    return F.concat(first, *rest)


def trace_id(*cols: Column) -> Column:
    """MD5 batch/lineage trace id (X7, ElasticIndexer.scala:180-189)."""
    return F.md5(F.concat_ws("|", *cols))


def to_clean_json(struct_col: Column) -> Column:
    """JSON encoding with nulls dropped (X4 deepDropNullValues,
    ElasticIndexer.scala:26-35)."""
    return F.to_json(struct_col, {"ignoreNullFields": "true"})


def unlinked_ids(old_links: Column, old_unlinked: Column, new_links: Column) -> Column:
    """Link maintenance (J9, LinkOps.scala:63-67):
    unlinked = (old.links ∪ old.unlinked) − new.links."""
    return F.array_except(F.array_union(old_links, old_unlinked), new_links)


def deep_diff(df1, df2, float_tolerance: float | None = None):
    """Bidirectional deep diff of two DataFrames (X8 — the
    es_index_comparison oracle, scripts/es_index_comparison/README.md:1-13):
    returns (only_in_df1, only_in_df2) via exceptAll both ways, optionally
    rounding float/double columns first so tolerance-insensitive comparisons
    are possible. Empty both ways ⇔ multiset-equal."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    a, b = df1, df2.select(*df1.columns)
    if float_tolerance is not None:
        import math

        digits = max(0, -int(math.floor(math.log10(float_tolerance))))
        for f in a.schema.fields:
            if isinstance(f.dataType, (DoubleType, FloatType)):
                a = a.withColumn(f.name, F.round(F.col(f.name).cast("double"), digits))
                b = b.withColumn(f.name, F.round(F.col(f.name).cast("double"), digits))
    return a.exceptAll(b), b.exceptAll(a)
