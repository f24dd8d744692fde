#!/usr/bin/env python
"""Long CDC run (round-6 verdict ask #4): >=80M events replayed delta-MOR
with the production maintenance cadence, recording per-range throughput
stability and the manifest trajectory over the run.

BASELINE.json's headline is a 10^10-event replay; bench.py exercises 8M
events and a handful of compactions. This is the 10x-over-bench evidence
that (a) per-range throughput holds flat as the table grows (the apply
cost is change-proportional: bucket-pruned deltas, never a full rewrite)
and (b) compaction + snapshot expiry keep the file count and manifest
size bounded instead of growing with run length.

Knobs: BENCH_EVENTS (default 80,000,000), BENCH_RANGES (default 40),
BENCH_COMPACT_EVERY (default 4 ranges, expire keep_last=10 after each —
the ReplayDriver.run cadence), SPARK_GRAFT_CPUS (default 32),
BENCH_BINLOG (reuse a pre-generated binlog dir).

Prints one JSON line: per-range seconds/ev/s/file-counts/manifest-bytes,
per-compaction seconds, and the overall apply throughput.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catalogue_pipeline_spark.cdc import STATE_SCHEMA, plan_ranges  # noqa: E402
from catalogue_pipeline_spark.cdc.checkpoints import CheckpointStore  # noqa: E402
from catalogue_pipeline_spark.cdc.generator import (  # noqa: E402
    generate_binlog,
    write_binlog,
)
from catalogue_pipeline_spark.cdc.merge import compact  # noqa: E402
from catalogue_pipeline_spark.cdc.replay import ReplayDriver  # noqa: E402
from catalogue_pipeline_spark.lake import LakeTable  # noqa: E402
from catalogue_pipeline_spark.session import build_session  # noqa: E402


def snapshot_stats(table: LakeTable) -> dict:
    snap = table.snapshot()
    n_delta = sum(1 for f in snap.files if f.get("kind", "base") == "delta")
    total_bytes = 0
    for f in snap.files:
        p = os.path.join(table.data_dir, f["path"])
        try:
            total_bytes += os.path.getsize(p)
        except OSError:
            pass
    return {
        "files": len(snap.files),
        "delta_files": n_delta,
        "base_files": len(snap.files) - n_delta,
        "data_bytes": total_bytes,
        "manifest_bytes": len(snap.to_json()),
        "snapshots_kept": len(table.history()),
    }


def main() -> None:
    n_events = int(os.environ.get("BENCH_EVENTS", "80000000"))
    n_ranges = int(os.environ.get("BENCH_RANGES", "40"))
    compact_every = int(os.environ.get("BENCH_COMPACT_EVERY", "4"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = build_session(
        "bench-long-cdc", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    binlog = os.environ.get("BENCH_BINLOG")
    gen_sec = 0.0
    own_binlog = binlog is None
    if binlog is None or not os.path.exists(os.path.join(binlog, "_SUCCESS")):
        binlog = os.path.join(tempfile.mkdtemp(prefix="cps-long-binlog-"), "binlog")
        t0 = time.time()
        write_binlog(
            generate_binlog(
                spark,
                n_events,
                n_convs=max(n_events // 200, 10),
                turns_per_conv=20,
                seed=42,
            ),
            binlog,
            ranges=128,
        )
        gen_sec = time.time() - t0
        print(f"generated {n_events} events in {gen_sec:.1f}s", file=sys.stderr)

    work = tempfile.mkdtemp(prefix="cps-long-cdc-")
    ranges_log: list[dict] = []
    compactions: list[dict] = []
    try:
        table = LakeTable.create(
            os.path.join(work, "transcripts"),
            STATE_SCHEMA,
            bucket_key="conv_id",
            num_buckets=64,
        )
        driver = ReplayDriver(
            spark,
            binlog,
            table,
            CheckpointStore(os.path.join(work, "ck")),
            mode="delta",
        )
        ranges = plan_ranges(0, n_events, range_size=max(n_events // n_ranges, 1))
        t_run = time.time()
        for i, r in enumerate(ranges, start=1):
            t0 = time.time()
            driver.run([r])
            dt = time.time() - t0
            per_range_events = r.end - r.start
            entry = {
                "range": i,
                "seconds": round(dt, 2),
                "events_per_sec": round(per_range_events / dt, 1),
                **snapshot_stats(table),
            }
            ranges_log.append(entry)
            print(json.dumps(entry), file=sys.stderr)
            if compact_every and i % compact_every == 0:
                t0 = time.time()
                compact(spark, table, changeset_id=f"auto-compact-{i}")
                table.expire_snapshots(keep_last=10)
                compactions.append(
                    {
                        "after_range": i,
                        "seconds": round(time.time() - t0, 2),
                        **snapshot_stats(table),
                    }
                )
                print(json.dumps(compactions[-1]), file=sys.stderr)
        apply_sec = time.time() - t_run
        rows = table.metadata_count()
        evs = [e["events_per_sec"] for e in ranges_log]
        half = len(evs) // 2
        out = {
            "metric": "long-run delta-MOR replay: throughput stability + manifest trajectory",
            "events": n_events,
            "ranges": n_ranges,
            "compact_every": compact_every,
            "cpus": cpus,
            "seconds": round(apply_sec, 2),
            "events_per_sec": round(n_events / apply_sec, 1),
            "first_half_mean_evps": round(sum(evs[:half]) / half, 1),
            "second_half_mean_evps": round(sum(evs[half:]) / (len(evs) - half), 1),
            "final_rows": rows,
            "n_compactions": len(compactions),
            "generate_seconds": round(gen_sec, 1),
            "per_range": ranges_log,
            "compactions": compactions,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        if own_binlog:
            shutil.rmtree(os.path.dirname(binlog), ignore_errors=True)


if __name__ == "__main__":
    main()
