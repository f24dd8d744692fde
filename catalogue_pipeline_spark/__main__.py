"""CLI entry point — the spark-submit surface of the engine.

    spark-submit --py-files cps.zip -m catalogue_pipeline_spark ...   (cluster)
    python -m catalogue_pipeline_spark <cmd> ...                      (local)

Commands mirror the reference's service entry points (SURVEY.md §3):

  init-table     create the transcripts lake table
  generate       write a deterministic synthetic binlog
  replay         checkpointed resumable replay (the adapter/harvester loop)
  compact        fold merge-on-read deltas into base files
  snapshot-sync  diff a full snapshot (parquet) into the table
  status         table + checkpoint status (window_status view)
  show           visible transcripts sample
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="catalogue_pipeline_spark")
    p.add_argument("--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("init-table")
    sp.add_argument("table")
    sp.add_argument("--buckets", type=int, default=64)

    sp = sub.add_parser("generate")
    sp.add_argument("binlog")
    sp.add_argument("--events", type=int, required=True)
    sp.add_argument("--convs", type=int, default=None)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--files", type=int, default=128)

    sp = sub.add_parser("replay")
    sp.add_argument("binlog")
    sp.add_argument("table")
    sp.add_argument("--checkpoints", required=True)
    sp.add_argument("--range-size", type=int, required=True)
    sp.add_argument("--overlap", type=int, default=0)
    sp.add_argument("--mode", choices=["cow", "delta"], default="cow")
    sp.add_argument("--max-ranges", type=int, default=None)

    sp = sub.add_parser("reindex")  # the reindexer's partial/specific modes
    sp.add_argument("binlog")
    sp.add_argument("table")
    sp.add_argument("--ids", default=None, help="comma-separated conv_ids (specific mode)")
    sp.add_argument("--conv-prefix", default=None, help="conv_id prefix filter (partial mode)")
    sp.add_argument("--mode", choices=["cow", "delta"], default="cow")
    sp.add_argument("--changeset", default="reindex-cli")
    sp.add_argument("--max-offset", type=int, default=None)

    sp = sub.add_parser("compact")
    sp.add_argument("table")
    sp.add_argument("--changeset", default="compact-cli")

    sp = sub.add_parser("snapshot-sync")
    sp.add_argument("snapshot_parquet")
    sp.add_argument("table")
    sp.add_argument("--ts", required=True, help="snapshot timestamp, ISO-8601")
    sp.add_argument("--changeset", required=True)
    sp.add_argument("--offset-base", type=int, default=0)

    sp = sub.add_parser("transform")  # per-source transformer batch run
    sp.add_argument("source", choices=["sierra", "ebsco"])
    sp.add_argument("records_parquet", help="(id, content[, deleted]) records")
    sp.add_argument("out_parquet")

    sp = sub.add_parser("status")
    sp.add_argument("table")
    sp.add_argument("--checkpoints", default=None)

    sp = sub.add_parser("show")
    sp.add_argument("table")
    sp.add_argument("-n", type=int, default=20)

    a = p.parse_args(argv)

    from .session import build_session

    spark = build_session("cps-cli", master=a.master)
    spark.sparkContext.setLogLevel("WARN")

    from .cdc import STATE_SCHEMA, plan_ranges
    from .cdc.checkpoints import CheckpointStore
    from .cdc.merge import compact, read_state, visible_transcripts
    from .cdc.replay import ReplayDriver
    from .lake import LakeTable

    if a.cmd == "init-table":
        LakeTable.create(a.table, STATE_SCHEMA, bucket_key="conv_id", num_buckets=a.buckets)
        print(json.dumps({"created": a.table, "buckets": a.buckets}))

    elif a.cmd == "generate":
        from .cdc.generator import generate_binlog, write_binlog

        write_binlog(
            generate_binlog(
                spark, a.events, n_convs=a.convs or max(a.events // 200, 10), seed=a.seed
            ),
            a.binlog,
            ranges=a.files,
        )
        print(json.dumps({"binlog": a.binlog, "events": a.events}))

    elif a.cmd == "replay":
        from pyspark.sql import functions as F

        table = LakeTable(a.table)
        driver = ReplayDriver(
            spark, a.binlog, table, CheckpointStore(a.checkpoints), mode=a.mode
        )
        bounds = spark.read.parquet(a.binlog).agg(
            F.min("offset"), F.max("offset")
        ).collect()[0]
        ranges = plan_ranges(bounds[0], bounds[1] + 1, a.range_size, a.overlap)
        rep = driver.run(ranges, max_ranges=a.max_ranges)
        print(
            json.dumps(
                {
                    "ranges_applied": rep.ranges_applied,
                    "ranges_skipped": rep.ranges_skipped,
                    "metrics": rep.metrics.as_map(),
                }
            )
        )

    elif a.cmd == "reindex":
        import tempfile

        from pyspark.sql import functions as F

        driver = ReplayDriver(
            spark,
            a.binlog,
            LakeTable(a.table),
            CheckpointStore(tempfile.mkdtemp(prefix="cps-reindex-ck-")),
            mode=a.mode,
        )
        sid, m = driver.replay_selective(
            conv_ids=a.ids.split(",") if a.ids else None,
            conv_filter=F.col("conv_id").startswith(a.conv_prefix) if a.conv_prefix else None,
            max_offset_exclusive=a.max_offset,
            changeset_id=a.changeset,
        )
        print(json.dumps({"snapshot_id": sid, "metrics": m.as_map()}))

    elif a.cmd == "compact":
        snap = compact(spark, LakeTable(a.table), changeset_id=a.changeset)
        print(json.dumps({"compacted_snapshot": snap}))

    elif a.cmd == "snapshot-sync":
        import datetime as dt

        from .sources import snapshot_sync

        snap_df = spark.read.parquet(a.snapshot_parquet)
        sid, m = snapshot_sync(
            spark,
            LakeTable(a.table),
            snap_df,
            dt.datetime.fromisoformat(a.ts),
            a.changeset,
            offset_base=a.offset_base,
        )
        print(json.dumps({"snapshot_id": sid, "metrics": m.as_map()}))

    elif a.cmd == "transform":
        from pyspark.sql import functions as F

        records = spark.read.parquet(a.records_parquet)
        if a.source == "sierra":
            from .plans.sierra_transform import transform_sierra

            works = transform_sierra(records)
        else:
            from .plans.marc_transform import transform_ebsco_marc, with_production_period

            works = with_production_period(transform_ebsco_marc(records))
        works.write.mode("overwrite").parquet(a.out_parquet)
        out = spark.read.parquet(a.out_parquet)
        counts = {r["type"]: r["n"] for r in out.groupBy("type").agg(F.count("*").alias("n")).collect()}
        print(json.dumps({"out": a.out_parquet, "rows": out.count(), "by_type": counts}))

    elif a.cmd == "status":
        table = LakeTable(a.table)
        out = {
            "snapshot_id": table.current_snapshot_id(),
            "rows": table.metadata_count(),
            "delta_buckets": table.delta_buckets(),
            "last_summary": table.snapshot().summary,
        }
        if a.checkpoints:
            out["checkpoints"] = CheckpointStore(a.checkpoints).counts_by_state()
        print(json.dumps(out))

    elif a.cmd == "show":
        df = visible_transcripts(read_state(spark, LakeTable(a.table)))
        df.orderBy("conv_id", "turn_idx").show(a.n, truncate=60)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
