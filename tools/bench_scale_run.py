"""Sustained-scale demonstration run.

Replays a large deterministic binlog (default 64M events — the generator
rate-scales toward the 10^10 target, FIXTURES.md §5) through the production
ingest path with the full durability story exercised mid-flight:

  * 16 checkpointed ranges (commit cadence = the flush_every trade)
  * an injected CRASH after range 7's data commit, before its checkpoint
    write — the §7.4 #2 failure — then resume from checkpoint
  * final compaction
  * full-state validation: the incremental 16-range state must equal a
    one-shot resolve over the whole binlog (associativity at scale), checked
    with a bidirectional exceptAll — zero differing rows

Appends results to BENCH/BASELINE.md. Usage:
    python tools/bench_scale_run.py [n_events]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from catalogue_pipeline_spark.cdc import STATE_SCHEMA, plan_ranges  # noqa: E402
from catalogue_pipeline_spark.cdc.checkpoints import CheckpointStore  # noqa: E402
from catalogue_pipeline_spark.cdc.generator import generate_binlog, write_binlog  # noqa: E402
from catalogue_pipeline_spark.cdc.merge import STATE_COLS, compact, read_state  # noqa: E402
from catalogue_pipeline_spark.cdc.replay import CrashInjected, ReplayDriver  # noqa: E402
from catalogue_pipeline_spark.cdc.resolve import resolve_lww  # noqa: E402
from catalogue_pipeline_spark.cdc.schema import SchemaRegistry  # noqa: E402
from catalogue_pipeline_spark.lake import LakeTable  # noqa: E402
from catalogue_pipeline_spark.session import build_session  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))  # past the bandwidth knee
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = build_session(
        "cps-scale-run", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="cps-scale-")
    binlog = os.path.join(work, "binlog")

    t0 = time.time()
    write_binlog(
        generate_binlog(spark, n, n_convs=max(n // 200, 10), turns_per_conv=20, seed=42),
        binlog,
        ranges=256,
    )
    gen_sec = time.time() - t0
    print(f"# generated {n:,} events in {gen_sec:.1f}s", file=sys.stderr)

    table = LakeTable.create(
        os.path.join(work, "transcripts"), STATE_SCHEMA, bucket_key="conv_id", num_buckets=128
    )
    ck = CheckpointStore(os.path.join(work, "ck"))
    driver = ReplayDriver(spark, binlog, table, ck, mode="delta")
    ranges = plan_ranges(0, n, range_size=n // 16)

    t1 = time.time()
    crashed = False
    try:
        driver.run(ranges, crash_after_commit_of=ranges[7].range_id)
    except CrashInjected:
        crashed = True
    assert crashed, "crash injection did not fire"
    # resume with a FRESH driver (new process semantics)
    driver2 = ReplayDriver(spark, binlog, table, ck, mode="delta")
    repaired = driver2.reconcile()
    rep = driver2.run(ranges)
    compact(spark, table, changeset_id="scale-compact")
    apply_sec = time.time() - t1
    eps = n / apply_sec
    print(
        f"# applied {n:,} events in {apply_sec:.1f}s = {eps:,.0f} ev/s "
        f"(crash after range 7, {repaired} checkpoint repaired, "
        f"{rep.ranges_skipped} fenced, {rep.ranges_applied} resumed)",
        file=sys.stderr,
    )

    # full-state associativity validation vs one-shot resolve
    t2 = time.time()
    oneshot = resolve_lww(
        SchemaRegistry().normalize(spark.read.parquet(binlog))
    ).select(*STATE_COLS)
    state = read_state(spark, table).select(*STATE_COLS)
    d1 = state.exceptAll(oneshot).count()
    d2 = oneshot.exceptAll(state).count()
    rows = table.metadata_count()
    check_sec = time.time() - t2
    assert d1 == 0 and d2 == 0, f"state mismatch: {d1}/{d2}"
    print(f"# validation: 0 differing rows both directions over {rows:,} keys "
          f"({check_sec:.1f}s)", file=sys.stderr)

    section = f"""

## Sustained scale run ({n:,} events, crash+resume mid-flight)

One run of the production ingest path at local[{cpus}]:
16 checkpointed ranges in merge-on-read delta mode, a crash injected after
range 7's data commit but before its checkpoint write, resume from a fresh
driver (1 checkpoint row repaired from the table's own snapshot summaries,
8 ranges fenced out, 8 resumed), final compaction.

* generate: {gen_sec:.1f}s · **apply (incl. crash, resume, compaction): {apply_sec:.1f}s = {eps:,.0f} events/s**
* final table: {rows:,} keys across 128 buckets
* full-state validation: incremental 16-range state `exceptAll` one-shot
  whole-log resolve = **0 rows in both directions** (associativity at scale)
* context: the reference's full reindex is 3.24M records in "a few hours"
  (~300-900 rec/s end-to-end, REINDEXING.md:73,89)
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(section)
    print(section)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
