"""Is the delta-write's 0.51 scaling the DISK or the engine?

Times the identical bucket-repartition + sorted snappy write at local[4]
and local[16], once to the root disk and once to tmpfs (/dev/shm). If tmpfs
scales better, the non-scaling term is device write bandwidth — a per-node
resource that multiplies with executors on a real cluster.

Usage: python tools/probe_write_medium.py [n_events]
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


def child(cpus: int, resolved_path: str, outbase: str) -> None:
    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.lake.table import _BUCKET_COL, bucket_expr
    from catalogue_pipeline_spark.session import build_session

    spark = build_session("probe-wm", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    resolved = spark.read.parquet(resolved_path)
    resolved.count()
    wdf = resolved.withColumn(_BUCKET_COL, bucket_expr("conv_id", 64))
    times = []
    for i in range(2):
        d = os.path.join(outbase, f"w{cpus}-{i}")
        t0 = time.time()
        (
            wdf.repartition(F.col(_BUCKET_COL))
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.option("compression", "snappy")
            .partitionBy(_BUCKET_COL)
            .parquet(d)
        )
        times.append(time.time() - t0)
        shutil.rmtree(d, ignore_errors=True)
    print("CHILD" + json.dumps({"t": min(times)}))


def main():
    if os.environ.get("PROBE_CHILD"):
        child(int(sys.argv[1]), sys.argv[2], sys.argv[3])
        return
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    from catalogue_pipeline_spark.cdc.generator import generate_binlog, write_binlog
    from catalogue_pipeline_spark.cdc.resolve import resolve_lww
    from catalogue_pipeline_spark.cdc.schema import SchemaRegistry
    from catalogue_pipeline_spark.session import build_session

    work = tempfile.mkdtemp(prefix="cps-wm-")
    spark = build_session("gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    binlog = os.path.join(work, "binlog")
    write_binlog(
        generate_binlog(spark, n_events, n_convs=max(n_events // 200, 10),
                        turns_per_conv=20, seed=42),
        binlog, ranges=128,
    )
    rp = os.path.join(work, "resolved")
    resolve_lww(SchemaRegistry().normalize(spark.read.parquet(binlog))).write.parquet(rp)
    spark.stop()

    shm = tempfile.mkdtemp(dir="/dev/shm", prefix="cps-wm-")
    try:
        for name, outbase in (("disk", work), ("tmpfs", shm)):
            res = {}
            for cpus in (16, 4):
                env = dict(os.environ, PROBE_CHILD="1")
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), str(cpus), rp, outbase],
                    env=env, capture_output=True, text=True, check=True, cwd=REPO,
                )
                line = [l for l in p.stdout.splitlines() if l.startswith("CHILD")][-1]
                res[cpus] = json.loads(line[5:])["t"]
            eff = (res[4] / res[16]) / 4
            print(f"{name}: local[4] {res[4]:.1f}s, local[16] {res[16]:.1f}s, eff {eff:.2f}")
    finally:
        shutil.rmtree(shm, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
