"""Physical-plan assertions: the optimizations SURVEY.md §4 says Catalyst
must give us actually appear in the plans — pushdown, pruning, broadcast,
partial aggregation. These guard the 100 TB properties at any scale."""

from pyspark.sql import functions as F

from catalogue_pipeline_spark.cdc import SchemaRegistry, generate_binlog, resolve_lww
from catalogue_pipeline_spark.cdc.generator import write_binlog


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_offset_range_pushdown(spark, tmp_path):
    """Replay's offset slice must reach the parquet scan as PushedFilters —
    with repartitionByRange(offset) writes, whole files get skipped."""
    p = str(tmp_path / "b")
    write_binlog(generate_binlog(spark, 5000, n_convs=50, seed=1), p, ranges=8)
    df = spark.read.parquet(p).filter((F.col("offset") >= 100) & (F.col("offset") < 200))
    plan = _plan(df)
    assert "PushedFilters" in plan and "GreaterThanOrEqual(offset,100)" in plan


def test_column_pruning_reaches_scan(spark, tmp_path):
    p = str(tmp_path / "b2")
    write_binlog(generate_binlog(spark, 1000, n_convs=10, seed=1), p, ranges=2)
    df = spark.read.parquet(p).select("conv_id", "offset")
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema and "conv_id" in read_schema


def test_resolve_uses_partial_aggregation(spark):
    """The LWW core must be an aggregate with a map-side partial pass before
    the exchange (skew armor: a hot key reduces to one row per partition
    pre-shuffle), NOT a sort-based window over raw events. Note: max(struct)
    falls back to SortAggregate (hash agg doesn't take struct buffers) —
    still partial+final with a single exchange of pre-reduced rows."""
    df = SchemaRegistry().normalize(generate_binlog(spark, 1000, n_convs=10, seed=1))
    plan = _plan(resolve_lww(df))
    assert "partial_max" in plan  # map-side combine before the shuffle
    # exactly one shuffle node in the plan tree (each node also appears a
    # second time in the detail section)
    assert plan.count("+- Exchange") == 1
    assert "Window" not in plan
    # the exchange must carry partial aggregates, not raw events
    assert plan.index("partial_max") < plan.rindex("Exchange")


def test_small_dim_join_broadcasts(spark):
    """Nation-sized dims must broadcast (no shuffle of the fact side)."""
    fact = spark.range(0, 100000).withColumn("k", F.pmod(F.col("id"), F.lit(25)))
    dim = spark.createDataFrame([(i, f"n{i}") for i in range(25)], "k long, name string")
    j = fact.join(F.broadcast(dim), "k")
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_covers_scalar_pipeline(spark, tmp_path):
    """Scalar-heavy pipelines (normalize → filter → project → plain agg)
    stay inside whole-stage codegen spans."""
    p = str(tmp_path / "b3")
    write_binlog(generate_binlog(spark, 1000, n_convs=10, seed=1), p, ranges=2)
    df = (
        spark.read.parquet(p)
        .filter(F.col("op") != "delete")
        .groupBy("conv_id")
        .agg(F.max("ts").alias("max_ts"), F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(df)
    assert "HashAggregate" in plan
    codegen = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in codegen
