"""Does shuffle-partition count (1x vs 4x cores) change resolve scaling?

Smaller reduce partitions mean smaller per-partition sort-aggregate runs
(better cache residency) at the cost of more tasks. Measures resolve at
local[4]/local[16] with shuffle partitions = cores and 4*cores.

Usage: python tools/probe_shuffle_parts.py [n_events]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, parts: int, binlog: str) -> None:
    from catalogue_pipeline_spark.cdc.resolve import resolve_lww
    from catalogue_pipeline_spark.cdc.schema import SchemaRegistry
    from catalogue_pipeline_spark.session import build_session

    spark = build_session("probe-sp", master=f"local[{cpus}]", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(binlog)
    raw.count()
    reg = SchemaRegistry()
    times = []
    for _ in range(2):
        t0 = time.time()
        resolve_lww(reg.normalize(raw)).count()
        times.append(time.time() - t0)
    print("CHILD" + json.dumps({"t": min(times)}))


def main():
    if os.environ.get("PROBE_CHILD"):
        child(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
        return
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    work = tempfile.mkdtemp(prefix="cps-sp-")
    from catalogue_pipeline_spark.cdc.generator import generate_binlog, write_binlog
    from catalogue_pipeline_spark.session import build_session

    spark = build_session("gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    binlog = os.path.join(work, "binlog")
    write_binlog(
        generate_binlog(spark, n_events, n_convs=max(n_events // 200, 10),
                        turns_per_conv=20, seed=42),
        binlog, ranges=128,
    )
    spark.stop()

    res = {}
    for cpus in (16, 4):
        for parts in (cpus, 4 * cpus):
            env = dict(os.environ, PROBE_CHILD="1")
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(cpus), str(parts), binlog],
                env=env, capture_output=True, text=True, check=True, cwd=REPO,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("CHILD")][-1]
            res[(cpus, parts)] = json.loads(line[5:])["t"]
            print(f"local[{cpus}] parts={parts}: {res[(cpus, parts)]:.1f}s")
    for mult in (1, 4):
        eff = (res[(4, 4 * mult)] / res[(16, 16 * mult)]) / 4
        print(f"parts={mult}x cores: eff {eff:.2f}")
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
