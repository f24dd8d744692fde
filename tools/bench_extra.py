"""Noop-sink isolation bench (guide §1.4/§1.5) — NOT the driver bench.

Times each headline query with ``df.write.format("noop")`` so every column
of every row is computed and the timing excludes sink effects, with
``setJobDescription`` labels. bench.py stays the frozen driver contract;
numbers from here are cited in OPTIMIZATION_r08.md only.

Usage: python tools/bench_extra.py [query ...]   (default: headline set)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS,
BENCH_EXTRA_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from catalogue_pipeline_spark.session import build_session  # noqa: E402

HEADLINE = [
    "q01_cdc_apply",
    "z03_lww_latest_event",
    "q12_session_merge",
    "q42_lsh_near_dup",
    "z24_text_quality",
    "q26_cosine_topk",
    "z28_pricing_summary",
    "z29_top_orders",
    "z30_nation_volume",
    "q75_indexable_works",
]


def main():
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
    spark = build_session("cps-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    for name in names:
        times = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        times.sort()
        out[name] = {"median": times[len(times) // 2], "all": times}
        print(f"# {name}: median {times[len(times)//2]:.2f}s {times}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "noop": out}))
    spark.stop()


if __name__ == "__main__":
    main()
