"""A/B probe for the delta-write path at two parallelism levels.

Isolates the bucket-repartition + sorted parquet write from resolve by
pre-materializing the resolved change set, then times write variants:

  write_zstd    current path (repartition _b, sortWithinPartitions, zstd)
  write_snappy  same, snappy codec
  write_nosort  zstd, no within-file sort
  write_direct  zstd, no repartition: tasks write per-bucket files directly
                (partitionBy splits; more files, no exchange)

Usage: python tools/probe_write_variants.py [n_events] [n_small]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def run_variants(cpus: int, resolved_path: str, work: str) -> dict:
    from catalogue_pipeline_spark.lake.table import _BUCKET_COL, bucket_expr
    from catalogue_pipeline_spark.session import build_session

    spark = build_session("probe-w", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    resolved = spark.read.parquet(resolved_path)
    resolved.count()  # warm
    out = {}

    def timed(name, fn):
        d = os.path.join(work, f"{name}-{cpus}")
        t0 = time.time()
        fn(d)
        out[name] = time.time() - t0
        shutil.rmtree(d, ignore_errors=True)

    wdf = resolved.withColumn(_BUCKET_COL, bucket_expr("conv_id", 64))

    timed(
        "write_zstd",
        lambda d: wdf.repartition(F.col(_BUCKET_COL))
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.partitionBy(_BUCKET_COL)
        .parquet(d),
    )
    timed(
        "write_snappy",
        lambda d: wdf.repartition(F.col(_BUCKET_COL))
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.option("compression", "snappy")
        .partitionBy(_BUCKET_COL)
        .parquet(d),
    )
    timed(
        "write_nosort",
        lambda d: wdf.repartition(F.col(_BUCKET_COL))
        .write.partitionBy(_BUCKET_COL)
        .parquet(d),
    )
    timed(
        "write_direct",
        lambda d: wdf.sortWithinPartitions(_BUCKET_COL, "conv_id", "turn_idx")
        .write.partitionBy(_BUCKET_COL)
        .parquet(d),
    )
    spark.stop()
    return out


def main():
    if os.environ.get("PROBE_CHILD"):
        print("CHILD" + json.dumps(run_variants(int(sys.argv[1]), sys.argv[2], sys.argv[3])))
        return

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_big = 4 * n_small
    work = tempfile.mkdtemp(prefix="cps-probe-w-")
    from catalogue_pipeline_spark.cdc.generator import generate_binlog, write_binlog
    from catalogue_pipeline_spark.cdc.resolve import resolve_lww
    from catalogue_pipeline_spark.cdc.schema import SchemaRegistry
    from catalogue_pipeline_spark.session import build_session

    spark = build_session("gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    binlog = os.path.join(work, "binlog")
    write_binlog(
        generate_binlog(spark, n_events, n_convs=max(n_events // 200, 10),
                        turns_per_conv=20, seed=42),
        binlog, ranges=128,
    )
    resolved_path = os.path.join(work, "resolved")
    resolve_lww(SchemaRegistry().normalize(spark.read.parquet(binlog))).write.parquet(
        resolved_path
    )
    spark.stop()

    def child(cpus):
        env = dict(os.environ, PROBE_CHILD="1")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cpus), resolved_path, work],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        )
        return json.loads([l for l in p.stdout.splitlines() if l.startswith("CHILD")][-1][5:])

    big = child(n_big)
    small = child(n_small)
    print(f"{'variant':<14}{'local[' + str(n_small) + ']':>12}{'local[' + str(n_big) + ']':>12}{'speedup':>9}{'eff':>6}")
    for k in big:
        sp = small[k] / big[k]
        print(f"{k:<14}{small[k]:>11.1f}s{big[k]:>11.1f}s{sp:>8.2f}x{sp / 4:>6.2f}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
