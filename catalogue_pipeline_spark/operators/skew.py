"""Hot-key skew handling (SURVEY.md §7 step 4).

The core LWW dedup already survives skew because ``max(struct)`` partial-
aggregates map-side (resolve.py) — a hot conversation's events collapse to
one row per input partition before the shuffle. This module provides the
EXPLICIT two-phase salted variant for operators that are genuinely
window-shaped (need all rows of a key together), plus hot-key detection.

Two-phase salted reduce:
    phase 1  group by (key, salt)  → per-salt partial registers  (spreads a
             hot key over ``salt_factor`` reducers)
    phase 2  group by key          → max of registers across salts (tiny
             input: ≤ salt_factor rows per key)

Both registers are max-registers, so within-salt-then-across-salts equals
unsalted resolution exactly (associativity) — asserted in tests against the
unsalted resolver, per FIXTURES.md scenario 9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_hot_keys(
    df: DataFrame, key_col: str, top_k: int = 10, threshold_fraction: float = 0.01
) -> list[str]:
    """Detect keys holding more than ``threshold_fraction`` of all rows.
    Driver-side result is ≤ top_k values (safe to collect/broadcast)."""
    total = df.count()
    if total == 0:
        return []
    rows = (
        df.groupBy(key_col)
        .count()
        .filter(F.col("count") >= total * threshold_fraction)
        .orderBy(F.desc("count"))
        .limit(top_k)
        .collect()
    )
    return [r[key_col] for r in rows]


def salted_lww(batch: DataFrame, salt_factor: int = 16) -> DataFrame:
    """Explicit two-phase salted LWW over a normalized binlog batch.

    Deterministic salt = offset % salt_factor (no RNG in executors). Output
    schema matches resolve.resolve_lww.
    """
    from ..cdc.resolve import with_op_pri

    ev = with_op_pri(batch).withColumn(
        "_salt", F.pmod(F.col("offset"), F.lit(salt_factor)).cast("int")
    )
    # phase 1: per-salt partial registers
    p1 = ev.groupBy("conv_id", "turn_idx", "_salt").agg(
        F.max(F.struct("ts", "op_pri", "offset", "op")).alias("w"),
        F.max(
            F.when(
                F.col("op") != "delete",
                F.struct("ts", "offset", "role", "text", "tool"),
            )
        ).alias("nd"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # phase 2: merge registers across salts — max ignores null nd registers
    p2 = p1.groupBy("conv_id", "turn_idx").agg(
        F.max("w").alias("w"),
        F.max("nd").alias("nd"),
        F.sum("n_events").alias("n_events"),
    )
    return p2.select(
        "conv_id",
        "turn_idx",
        F.col("nd.role").alias("role"),
        F.col("nd.text").alias("text"),
        F.col("nd.tool").alias("tool"),
        F.col("w.ts").alias("ts"),
        F.col("w.op_pri").alias("op_pri"),
        F.col("w.offset").alias("offset"),
        F.col("nd.ts").alias("nd_ts"),
        F.col("nd.offset").alias("nd_offset"),
        F.when(F.col("w.op") == "delete", F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("deleted"),
        "n_events",
    )
