"""Target precedence & partitioning helpers (O3/O5) and the safety gate (A8).

``pick_target_by_precedence`` is the merger's TargetPrecedence.scala:10-32 —
first match in a fixed rule order — rendered as a when-chain score + top-1
per group (row_number over score). ``fixed_size_chunks`` is the 10k-id
partitioner (find_work.py:58-77). ``fractional_change_gate`` is the 5%/20%
abort-on-mass-change invariant (safety.py:5, ingestor_deletions.py:75-81).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def precedence_score(col, ordered_values: list[str]) -> F.Column:
    """Lower score = higher precedence; unknown values sink to the bottom."""
    expr = F.lit(len(ordered_values))
    for i, v in reversed(list(enumerate(ordered_values))):
        expr = F.when(col == v, F.lit(i)).otherwise(expr)
    return expr


def pick_target_by_precedence(
    df: DataFrame,
    group_col: str,
    type_col: str,
    ordered_values: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One target row per group: the first row matching the precedence order
    (O3). Deterministic tie-break within equal precedence."""
    score = precedence_score(F.col(type_col), ordered_values).alias("_score")
    order = [F.asc("_score")] + (
        [F.asc(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_score", score)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_score", "_rn")
    )


def fixed_size_chunks(df: DataFrame, order_col: str, chunk_size: int) -> DataFrame:
    """Assign rows to fixed-size chunks by rank order (O5: minting partitions
    of 10,000 ids). Adds ``chunk_id``. Note: global rank = one-partition sort
    of the KEY COLUMN only — acceptable for control-plane id lists, which is
    exactly what the reference uses it for."""
    w = Window.orderBy(order_col)
    return df.withColumn(
        "chunk_id", F.floor((F.row_number().over(w) - 1) / chunk_size).cast("int")
    )


def fractional_change_gate(
    n_changes: int, n_total: int, threshold: float = 0.05, force: bool = False
) -> None:
    """Abort when |Δ|/total exceeds the threshold (A8). Raises ValueError."""
    if force or n_total == 0:
        return
    frac = n_changes / n_total
    if frac > threshold:
        raise ValueError(
            f"safety gate: {n_changes}/{n_total} = {frac:.1%} exceeds {threshold:.0%}"
        )
