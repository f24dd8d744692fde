"""SparkSession factory with scale-appropriate defaults.

The reference hand-rolls every optimization (SURVEY.md §4); on Spark we get
pushdown / pruning / AQE for free but still have to *turn on* the right knobs:
AQE (runtime re-planning + skew-join splitting), Arrow (vectorized Python
boundary), and a shuffle-partition count sized to the core count rather than
the 200 default (which at local scale creates thousands of empty tasks and at
cluster scale is set per-job).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "catalogue-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster it is left unset so ``spark-submit`` controls it.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one-ish partition per core locally; a real cluster run overrides
        # this (or lets AQE coalesce) — see bench.py
        shuffle_partitions = max(cpus, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # zstd level 1 writes 27% faster than the default level 3 for only
        # ~4% more bytes on this data (measured: 2.0s vs 2.7s for a 2.4M-row
        # sorted bucket write at local[16], 99 MB vs 95 MB) — base files keep
        # zstd's ratio advantage over snappy without its write-path cost
        .config("spark.hadoop.parquet.compression.codec.zstd.level", "1")
        # parquet min/max stats drive file pruning on our sorted writes
        # (the reference's id-sorted Iceberg tables, schemata.py:36-40)
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
    )
    # pre-size the heap (-Xms = -Xmx): a lazily-grown multi-GB heap stalls
    # allocation-heavy stages mid-query while the JVM commits and zeroes
    # fresh regions (guide §5 memory).  Measured on the 48 g bench heap, 8
    # warm repeats of the allocation-heaviest query (q42 LSH): growing heap
    # median 4.5 s / max 20.1 s vs pre-sized median 2.9 s / max 9.0 s (the
    # cold rep).  Local mode: driver == all executors, so this covers the
    # whole JVM; cluster deployments set the executor equivalent via
    # spark.executor.extraJavaOptions in spark-submit.  Derived from the
    # EFFECTIVE driver memory so an extra_conf override stays consistent.
    ec = dict(extra_conf or {})
    mem = ec.get(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    )
    b = b.config("spark.driver.memory", mem)
    b = b.config(
        "spark.driver.extraJavaOptions",
        ec.get("spark.driver.extraJavaOptions", f"-Xms{mem}"),
    )
    for k, v in ec.items():
        b = b.config(k, v)
    return b.getOrCreate()
