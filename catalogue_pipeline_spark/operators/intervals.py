"""Interval arithmetic as DataFrame ops — the gap detector / coverage merge
(S4/A5, sierra_progress_reporter/interval_arithmetic.py:47-94) done with a
running-max window instead of a driver sweep, so it scales to millions of
windows.

Algorithm (classic sort + sweep, vectorized):
    order by start; running_max_end = max(end) over rows before this one;
    a row STARTS a new covering interval iff start > running_max_end;
    gaps are (running_max_end, start) at those break points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals_df(df: DataFrame, start: str = "start", end: str = "end") -> DataFrame:
    """Coalesce overlapping/adjacent intervals → covering set.
    Output: (start, end) of merged intervals."""
    w = Window.orderBy(start, end).rowsBetween(Window.unboundedPreceding, -1)
    marked = df.select(
        F.col(start).alias("s"),
        F.col(end).alias("e"),
        F.max(F.col(end)).over(w).alias("prev_max"),
    ).withColumn(
        "new_group",
        F.when(F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1).otherwise(0),
    )
    grouped = marked.withColumn(
        "grp", F.sum("new_group").over(Window.orderBy("s", "e").rowsBetween(Window.unboundedPreceding, 0))
    )
    return grouped.groupBy("grp").agg(
        F.min("s").alias(start), F.max("e").alias(end)
    ).drop("grp").orderBy(start)


def coverage_gaps_df(df: DataFrame, start: str = "start", end: str = "end") -> DataFrame:
    """Holes between covered intervals: rows (gap_start, gap_end)."""
    w = Window.orderBy(start, end).rowsBetween(Window.unboundedPreceding, -1)
    marked = df.select(
        F.col(start).alias("s"),
        F.col(end).alias("e"),
        F.max(F.col(end)).over(w).alias("prev_max"),
    )
    return (
        marked.filter(F.col("prev_max").isNotNull() & (F.col("s") > F.col("prev_max")))
        .select(F.col("prev_max").alias("gap_start"), F.col("s").alias("gap_end"))
        .orderBy("gap_start")
    )
