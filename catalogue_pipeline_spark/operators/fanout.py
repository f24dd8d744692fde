"""Scan fan-out for compute-dense operators (optimization guide §2.5/§6).

A parquet file is splittable only at row-group boundaries, so a small-but-
dense input written as one large row group (the common single-file layout of
the benchmark tables) exposes ONE scan split no matter what
``maxPartitionBytes``/``minPartitionNum`` say — and Spark fuses the whole
downstream pipeline (shingle explode, minhash, regex scoring, vector math)
into that scan stage, pinning it to 1-2 cores of a 32-core box.

``fan_out`` breaks that fusion with a round-robin repartition to the
session's default parallelism. The trade, in guide terms: one extra exchange
that moves the operator's *input* bytes exactly once, in return for
core-count parallelism on downstream work that is 10x-1000x the input bytes
(explode multiplies rows ~20x; brute-force cosine is |corpus| x |queries|).
At cluster scale the input arrives as many files/row groups and the scan is
already parallel, but the repartition stays a single linear pass of the
operator's input — still negligible against the compute it feeds, and it
doubles as a skew-leveller for uneven document sizes.

Only used in front of logic whose RESULT is partitioning-independent
(aggregations, joins, per-row projections); never ahead of anything that
reads ``spark_partition_id()`` or otherwise observes physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session default parallelism."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)
