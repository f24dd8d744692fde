"""Deterministic synthetic binlog generator.

Everything derives from ``spark.range(n)`` + pure hash functions of the
offset and a seed — no wall-clock, no ``uuid1``, no Python RNG in executors
(the reference's ``uuid1()`` / ``datetime.now()`` nondeterminism,
pipeline_store.py:212 / adapter_store.py:39, is exactly the bug class this
excludes per FIXTURES.md). The same (n_events, seed, …) always yields the
same bytes, at any parallelism — generation is fully distributed, O(0) driver
memory, and scales linearly to the 10^10-event target.

Shape knobs (FIXTURES.md §4-5):
  * hot-key skew: ``hot_fraction`` of events land on ``n_hot`` conversations
    (scenario 9: one conversation with ~10% of events) + a uniform tail;
  * ops mix insert/update/upsert/delete (deletes carry null payload → J5);
  * event time increases with offset but with ±jitter, so late arrivals and
    exact ts collisions (equal-ts tie-break scenarios) occur naturally;
  * ``schema_ver`` transitions 1→2→3 across offset thirds (scenario 10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z — fixed, never wall-clock


def _h(seed: int, salt: int):
    return F.xxhash64(F.col("offset"), F.lit(seed), F.lit(salt))


def generate_binlog(
    spark: SparkSession,
    n_events: int,
    n_convs: int,
    turns_per_conv: int = 20,
    seed: int = 42,
    hot_fraction: float = 0.10,
    n_hot: int = 1,
    delete_pct: int = 8,
    events_per_second: int = 10,
    jitter_seconds: int = 4,
    schema_transitions: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return the binlog as a DataFrame in BINLOG_SCHEMA column order.

    ``ts`` for offset o is ``BASE + o/eps ± jitter`` — monotone-ish with
    deterministic jitter, which manufactures both late arrivals and equal-ts
    collisions at a controlled rate.
    """
    df = spark.range(0, n_events, 1, num_partitions or spark.sparkContext.defaultParallelism)
    df = df.withColumnRenamed("id", "offset")

    hot_cut = int(hot_fraction * 1_000_000)
    conv = (
        F.when(
            F.pmod(_h(seed, 1), F.lit(1_000_000)) < hot_cut,
            F.concat(F.lit("hot_"), F.pmod(_h(seed, 2), F.lit(n_hot)).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("c"), F.pmod(_h(seed, 3), F.lit(n_convs)).cast("string"))
        )
    )
    turn = F.pmod(_h(seed, 4), F.lit(turns_per_conv)).cast("long")

    opr = F.pmod(_h(seed, 5), F.lit(100))
    op = (
        F.when(opr < 40, F.lit("insert"))
        .when(opr < 70, F.lit("update"))
        .when(opr < 100 - delete_pct, F.lit("upsert"))
        .otherwise(F.lit("delete"))
    )

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.pmod(_h(seed, 6), F.lit(4)) + 1).cast("int"),
    )

    if schema_transitions:
        third = max(n_events // 3, 1)
        schema_ver = (
            F.when(F.col("offset") < third, F.lit(1))
            .when(F.col("offset") < 2 * third, F.lit(2))
            .otherwise(F.lit(3))
        )
    else:
        schema_ver = F.lit(3)

    is_delete = op == "delete"
    text = F.when(
        is_delete, F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.lit("msg "),
            conv,
            F.lit("/"),
            turn.cast("string"),
            F.lit(" rev-"),
            F.pmod(_h(seed, 7), F.lit(9)).cast("string"),
            F.lit(" "),
            # bulk the payload up to a realistic transcript-turn size
            F.repeat(
                F.concat(F.lit("tok"), F.pmod(_h(seed, 8), F.lit(97)).cast("string"), F.lit(" ")),
                (F.pmod(_h(seed, 9), F.lit(24)) + 4).cast("int"),
            ),
        )
    )
    tool = F.when(
        (schema_ver >= 2) & (role == "tool") & ~is_delete,
        F.concat(F.lit("tool_"), F.pmod(_h(seed, 10), F.lit(12)).cast("string")),
    ).otherwise(F.lit(None).cast("string"))

    ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH)
        + (F.col("offset") / F.lit(events_per_second)).cast("long")
        + (F.pmod(_h(seed, 11), F.lit(2 * jitter_seconds + 1)) - jitter_seconds).cast("long")
    )

    return df.select(
        F.col("offset"),
        op.alias("op"),
        conv.alias("conv_id"),
        turn.alias("turn_idx"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(role).alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
        schema_ver.cast("int").alias("schema_ver"),
    )


def write_binlog(df: DataFrame, path: str, ranges: int = 16) -> None:
    """Materialize a binlog ordered/partitioned by offset so range replays
    (``offset BETWEEN a AND b``) prune files via parquet min/max stats —
    the binlog analog of the reference's id-sorted store (schemata.py:36-40).

    ``ranges`` (the output file count) bounds scan parallelism per replay
    range: each file is typically one zstd row group (unsplittable), so pick
    ranges ≥ replay_ranges × cores. On a real cluster the binlog producer
    (Kafka connect / WAL shipper) handles this via segment sizing.
    """
    (
        df.repartitionByRange(ranges, "offset")
        .sortWithinPartitions("offset")
        .write.mode("overwrite")
        .parquet(path)
    )
