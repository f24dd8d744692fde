"""Stage-level scaling probe: which phase of the CDC apply stops scaling?

Runs each phase of the delta-mode apply in isolation at two parallelism
levels on the SAME pre-generated binlog and prints per-phase times +
efficiency, so optimization effort goes where the scaling is lost:

  scan      binlog read + schema normalize + count      (no shuffle)
  resolve   + LWW aggregate (the groupBy shuffle), count only
  ingest    + bucket repartition + sorted parquet write (full delta apply)

Usage: python tools/profile_scaling.py [n_events] [n_small] [binlog_dir]
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


def run_phases(cpus: int, binlog: str, work: str) -> dict:
    """Executed in a subprocess: fresh JVM per parallelism level."""
    from catalogue_pipeline_spark.cdc import STATE_SCHEMA
    from catalogue_pipeline_spark.cdc.merge import append_delta
    from catalogue_pipeline_spark.cdc.resolve import resolve_lww
    from catalogue_pipeline_spark.cdc.schema import SchemaRegistry
    from catalogue_pipeline_spark.lake import LakeTable
    from catalogue_pipeline_spark.session import build_session

    spark = build_session("profile", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = SchemaRegistry()
    out = {}

    raw = spark.read.parquet(binlog)
    raw.count()  # warm page cache + codegen

    t0 = time.time()
    reg.normalize(raw).count()
    out["scan"] = time.time() - t0

    t0 = time.time()
    resolve_lww(reg.normalize(raw)).count()
    out["resolve"] = time.time() - t0

    table = LakeTable.create(
        os.path.join(work, f"t{cpus}"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=64
    )
    t0 = time.time()
    append_delta(spark, table, resolve_lww(reg.normalize(raw)), changeset_id="p1")
    out["ingest"] = time.time() - t0
    spark.stop()
    return out


def main():
    if os.environ.get("PROFILE_CHILD"):
        cpus = int(sys.argv[1])
        res = run_phases(cpus, sys.argv[2], sys.argv[3])
        print("CHILD" + json.dumps(res))
        return

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_big = 4 * n_small
    binlog = sys.argv[3] if len(sys.argv) > 3 else None
    work = tempfile.mkdtemp(prefix="cps-profile-")
    if binlog is None:
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

    def child(cpus):
        env = dict(os.environ, PROFILE_CHILD="1")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cpus), binlog, work],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("CHILD")][-1]
        return json.loads(line[5:])

    big = child(n_big)
    small = child(n_small)
    print(f"{'phase':<10}{'local[' + str(n_small) + ']':>12}{'local[' + str(n_big) + ']':>12}{'speedup':>9}{'eff':>6}")
    for k in ("scan", "resolve", "ingest"):
        sp = small[k] / big[k]
        print(f"{k:<10}{small[k]:>11.1f}s{big[k]:>11.1f}s{sp:>8.2f}x{sp / 4:>6.2f}")
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
