"""Compute-bound scaling probe: the same Spark engine and scheduling path as
the CDC bench, but with a workload whose per-row cost is CPU (iterated
sha2 hashing inside whole-stage codegen) rather than memory bandwidth.

Purpose: separate two claims the single-box CDC pair conflates —
  (a) "the PLAN has a serial bottleneck" (would show here too), vs
  (b) "the BOX saturates memory bandwidth on string-heavy replay"
      (does NOT show here: hashing a few hot cache lines per row scales
      with cores).
A ≥0.8 efficiency here, alongside the <0.8 string-replay pair, is the
evidence that the engine scales and the shared-DRAM box is the ceiling
(BENCH/BASELINE.md variance analysis).

Usage: python tools/bench_cpu_probe.py [rows] [N] [repeats]  → local[N] vs local[4N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = r"""
import sys, time
sys.path.insert(0, {repo!r})
from catalogue_pipeline_spark.session import build_session
from pyspark.sql import functions as F

rows = {rows}
spark = build_session("cpu-probe", master="local[{cpus}]", shuffle_partitions={cpus})
df = spark.range(rows, numPartitions={cpus} * 4)
# 256 chained xxhash64 rounds per row: pure ALU on longs, ZERO allocation
# (sha2-on-strings measures the GC, not the cores)
col = F.col("id")
for _ in range(256):
    col = F.xxhash64(col)
# warm-up run compiles codegen + schedules once; the timed run measures
# steady-state compute only
probe = df.select(F.shiftright(col, 40).alias("h"))  # small values: sum cannot overflow under ANSI
probe.agg(F.sum("h")).collect()
t0 = time.time()
n = probe.agg(F.sum("h")).collect()[0][0]
dt = time.time() - t0
print("PROBE_RESULT", {rows} / dt, n, flush=True)
spark.stop()
"""


def run_at(cpus: int, rows: int) -> float:
    code = _JOB.format(repo=REPO, rows=rows, cpus=cpus)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True, cwd=REPO
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("PROBE_RESULT")][-1]
    return float(line.split()[1])


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_big = 4 * n_small
    results = []
    for i in range(repeats):
        t_big = run_at(n_big, rows)
        t_small = run_at(n_small, rows)
        eff = (t_big / t_small) / 4.0
        results.append((t_small, t_big, eff))
        print(
            f"repeat {i + 1}/{repeats}: local[{n_small}]={t_small:,.0f} rows/s "
            f"local[{n_big}]={t_big:,.0f} rows/s eff={eff:.2f}",
            file=sys.stderr,
        )
    results.sort(key=lambda t: t[2])
    med = results[len(results) // 2]
    print(
        json.dumps(
            {
                "probe": "compute-bound sha2 chain",
                "rows": rows,
                "pair": [n_small, n_big],
                "median": {"t_small": med[0], "t_big": med[1], "efficiency": round(med[2], 3)},
                "all_efficiencies": [round(e, 3) for _, _, e in results],
            }
        )
    )


if __name__ == "__main__":
    main()
