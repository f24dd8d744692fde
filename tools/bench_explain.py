"""Capture .explain("formatted") for the headline queries (guide §1.1/§7.2).

Writes plans/r08/<name>_<tag>.txt for each headline query. Usage:

    python tools/bench_explain.py <tag> [query ...]

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

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
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("cps-explain", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        # historical bench names for the z-aliased rows
        fname = {
            "z03_lww_latest_event": "q03_lww_latest_event",
            "z24_text_quality": "q24_text_quality",
            "z28_pricing_summary": "q28_pricing_summary",
            "z29_top_orders": "q29_top_orders",
            "z30_nation_volume": "q30_nation_volume",
        }.get(name, name)
        p = os.path.join(out_dir, f"{fname}_{tag}.txt")
        with open(p, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {p} ({len(buf.getvalue())} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
