#!/usr/bin/env python
"""Window-soak bench (round-6 verdict ask #3): the q94 soak shape —
transform-shaped updates → matcher affected-region recompute → merge
over the affected region → CDC-fenced index ingest — iterated over ~10
consecutive windows of CONSTANT change volume while the corpus GROWS,
recording per-window wall time.

The claim under test (SCALE.md / round-6 plan audit): per-window cost is
change-proportional, not corpus-proportional.  Each window applies the
same change volume (ADD new works, 1/3 paired with a new miro work, plus
UPD version bumps against the previous window's works); the matcher
corpus grows by ~1.33*ADD works per window.  Flat per-window times while
the corpus multiplies is the evidence; a corpus-proportional engine
would show times growing with the corpus curve.

Reference anchor: the 15-minute Step Functions window cadence
(catalogue_graph/README.md:42-63) — production runs this loop forever,
so per-window cost must not inherit a corpus term.

Knobs: SOAK_SEED_WORKS (default 50,000), SOAK_ADD (20,000 new
works/window), SOAK_UPD (5,000 updates/window), SOAK_WINDOWS (10),
SOAK_MATCHER_MODE ('cow' default | 'delta' = merge-on-read appends with
compact_matcher every SOAK_COMPACT_EVERY windows, default 4),
SOAK_INDEX_MODE ('cow' default merge_into_state | 'delta' = the CDC
append_delta ingest with merge.compact on the same cadence),
SPARK_GRAFT_CPUS (32).  Prints one JSON line with per-window rows,
including the bytes the matcher table wrote per window — the COW-vs-MOR
write-amplification comparison.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from catalogue_pipeline_spark.cdc import (  # noqa: E402
    STATE_SCHEMA,
    SchemaRegistry,
    merge_into_state,
    resolve_lww,
)
from catalogue_pipeline_spark.cdc.merge import append_delta, compact  # noqa: E402
from catalogue_pipeline_spark.lake import LakeTable  # noqa: E402
from catalogue_pipeline_spark.plans.matcher import (  # noqa: E402
    compact_matcher,
    create_matcher_table,
    read_matcher_state,
    update_graph,
)
from catalogue_pipeline_spark.plans.merger import match_and_merge  # noqa: E402
from catalogue_pipeline_spark.session import build_session  # noqa: E402

T0 = dt.datetime(2024, 7, 1, 9, 0, 0)


def new_works(spark, wname: str, n: int, version: int):
    """ADD sierra works (every third carrying a merge candidate to a new
    miro work) + the miro side — the q94 window-1 shape at bench size."""
    base = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit(f"s/{wname}_"), F.col("id").cast("string")).alias("swid"),
        F.concat(F.lit(f"m/{wname}_"), F.col("id").cast("string")).alias("mwid"),
    )
    sierra = base.select(
        F.col("swid").alias("work_id"),
        F.lit(version).alias("version"),
        F.when(F.col("id") % 3 == 0, F.array(F.col("mwid")))
        .otherwise(F.array().cast("array<string>"))
        .alias("candidates"),
        F.lit(False).alias("suppressed"),
    )
    miro = base.filter(F.col("id") % 3 == 0).select(
        F.col("mwid").alias("work_id"),
        F.lit(version).alias("version"),
        F.array().cast("array<string>").alias("candidates"),
        F.lit(False).alias("suppressed"),
    )
    return sierra.unionByName(miro)


def bumped_works(spark, wname: str, n_prev: int, n_upd: int, version: int):
    """UPD version bumps against a previous window's sierra works (every
    (n_prev // n_upd)-th id), candidates preserved — the q94 window-2
    title-bump arm."""
    step = max(n_prev // n_upd, 1)
    base = (
        spark.range(n_prev)
        .filter(F.col("id") % step == 0)
        .limit(n_upd)
        .select(
            F.col("id"),
            F.concat(F.lit(f"s/{wname}_"), F.col("id").cast("string")).alias("swid"),
            F.concat(F.lit(f"m/{wname}_"), F.col("id").cast("string")).alias("mwid"),
        )
    )
    return base.select(
        F.col("swid").alias("work_id"),
        F.lit(version).alias("version"),
        F.when(F.col("id") % 3 == 0, F.array(F.col("mwid")))
        .otherwise(F.array().cast("array<string>"))
        .alias("candidates"),
        F.lit(False).alias("suppressed"),
    )


def main() -> None:
    seed_n = int(os.environ.get("SOAK_SEED_WORKS", "50000"))
    add_n = int(os.environ.get("SOAK_ADD", "20000"))
    upd_n = int(os.environ.get("SOAK_UPD", "5000"))
    windows = int(os.environ.get("SOAK_WINDOWS", "10"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    matcher_mode = os.environ.get("SOAK_MATCHER_MODE", "cow")
    index_mode = os.environ.get("SOAK_INDEX_MODE", "cow")
    compact_every = int(os.environ.get("SOAK_COMPACT_EVERY", "4"))

    spark = build_session(
        "bench-window-soak", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    work = tempfile.mkdtemp(prefix="cps-soak-")
    per_window: list[dict] = []
    reg = SchemaRegistry()
    try:
        mt = create_matcher_table(f"{work}/graph", num_buckets=64)
        ix = LakeTable.create(
            f"{work}/index", STATE_SCHEMA, bucket_key="conv_id", num_buckets=64
        )

        seen_files: dict[str, int] = {}

        def matcher_bytes_added() -> int:
            """Bytes of matcher data files first seen this window —
            the write-amplification meter for the COW-vs-MOR comparison."""
            added = 0
            for f in mt.snapshot().files:
                p = f["path"]
                if p not in seen_files:
                    try:
                        seen_files[p] = os.path.getsize(
                            os.path.join(mt.data_dir, p)
                        )
                    except OSError:
                        seen_files[p] = 0
                    added += seen_files[p]
            return added

        def run_window(w: int, updates, measured: bool) -> None:
            ts = T0 + dt.timedelta(minutes=15 * w)
            t0 = time.time()
            _snap, result = update_graph(
                spark, mt, updates, batch_seq=w + 1, changeset_id=f"soak-w{w}",
                write_mode=matcher_mode,
            )
            # affected work ids, materialized once (the result is lazy)
            ids = (
                result.select(F.explode("works").alias("_w"))
                .select(F.col("_w.work_id").alias("work_id"))
                .localCheckpoint()
            )
            n_affected = ids.count()
            # J6 multiget of the affected region, then the merger over it —
            # change-proportional: the merge never sees unaffected works
            region = read_matcher_state(spark, mt).join(ids, "work_id", "left_semi")
            w_in = region.select(
                "work_id",
                F.when(F.col("work_id").startswith("s/"), F.lit("sierra"))
                .otherwise(F.lit("miro"))
                .alias("source_type"),
                F.col("candidates").alias("merge_candidate_ids"),
                (F.col("suppressed") == "true").alias("suppressed"),
                F.array(F.concat(F.lit("item-"), F.col("work_id"))).alias("items"),
                F.array(F.concat(F.lit("id-"), F.col("work_id"))).alias(
                    "identifiers"
                ),
                F.lit(None).cast("string").alias("thumbnail"),
                F.col("version"),
            )
            merged = match_and_merge(
                w_in.drop("version"), ts, precedence=["sierra", "miro"]
            )
            docs = merged.join(w_in.select("work_id", "version"), "work_id").select(
                F.lit(0).cast("long").alias("offset"),
                F.lit("upsert").alias("op"),
                F.col("work_id").alias("conv_id"),
                F.lit(0).cast("long").alias("turn_idx"),
                F.lit("doc").alias("role"),
                F.concat_ws(
                    "|",
                    F.col("work_id"),
                    F.concat(F.lit("v"), F.col("version").cast("string")),
                    F.col("type"),
                    F.coalesce(F.col("redirect_target"), F.lit("-")),
                ).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit(ts.isoformat()).cast("timestamp").alias("ts"),
                F.lit(3).cast("int").alias("schema_ver"),
            )
            resolved = resolve_lww(reg.normalize(docs))
            if index_mode == "delta":
                append_delta(spark, ix, resolved, changeset_id=f"soak-w{w}")
            else:
                merge_into_state(spark, ix, resolved, changeset_id=f"soak-w{w}")
            if compact_every and w % compact_every == 0:
                if matcher_mode == "delta":
                    compact_matcher(spark, mt, changeset_id=f"soak-compact-{w}")
                if index_mode == "delta":
                    compact(spark, ix, changeset_id=f"soak-ix-compact-{w}")
            secs = time.time() - t0
            # read-side meter (round-8 split-read evidence): wall time of a
            # full matcher-state resolve at this window's snapshot, plus how
            # many buckets the latest-batch-wins window actually covers —
            # with the split read this tracks the delta buckets (compaction
            # cadence), not the corpus
            t_r = time.time()
            read_matcher_state(spark, mt).write.format("noop").mode(
                "overwrite"
            ).save()
            resolve_secs = time.time() - t_r
            if measured:
                entry = {
                    "window": w,
                    "seconds": round(secs, 2),
                    "resolve_read_seconds": round(resolve_secs, 2),
                    "delta_buckets": len(mt.delta_buckets()),
                    "affected_works": n_affected,
                    "corpus_rows": mt.metadata_count(),
                    "index_rows": ix.metadata_count(),
                    "matcher_bytes_written": matcher_bytes_added(),
                }
                per_window.append(entry)
                print(json.dumps(entry), file=sys.stderr)
            else:
                matcher_bytes_added()  # mark seed files seen, not counted
                print(
                    f"seed window: {secs:.1f}s corpus={mt.metadata_count()}",
                    file=sys.stderr,
                )

        # window 0: the unmeasured seed (bootstrap is corpus-sized by
        # definition — the claim is about steady-state windows)
        run_window(0, new_works(spark, "w0", seed_n, version=1), measured=False)
        for w in range(1, windows + 1):
            updates = new_works(spark, f"w{w}", add_n, version=1).unionByName(
                bumped_works(
                    spark,
                    f"w{w - 1}",
                    add_n if w > 1 else seed_n,
                    upd_n,
                    version=w + 1,
                )
            )
            run_window(w, updates, measured=True)

        secs = [e["seconds"] for e in per_window]
        half = len(secs) // 2
        out = {
            "metric": "per-window wall time, constant change over growing corpus",
            "seed_works": seed_n,
            "add_per_window": add_n,
            "upd_per_window": upd_n,
            "windows": windows,
            "cpus": cpus,
            "matcher_mode": matcher_mode,
            "index_mode": index_mode,
            "matcher_bytes_total": sum(
                e["matcher_bytes_written"] for e in per_window
            ),
            "first_half_mean_sec": round(sum(secs[:half]) / half, 2),
            "second_half_mean_sec": round(sum(secs[half:]) / (len(secs) - half), 2),
            "last_over_first": round(secs[-1] / secs[0], 2),
            "corpus_growth": round(
                per_window[-1]["corpus_rows"] / per_window[0]["corpus_rows"], 2
            ),
            "per_window": per_window,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
