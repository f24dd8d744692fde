"""A/B probe for resolve_lww formulations at two parallelism levels.

Variants:
  decode    force full-column parquet decode, no shuffle (the scan floor)
  current   resolve_lww as shipped (SortAggregate over structs, op string)
  no_op     winner struct carries op_pri only (no op string through shuffle)
  packed    hash-aggregate formulation: both registers packed into SORTABLE
            fixed-width binary-ish strings (max(string) has a primitive
            hash-agg buffer; no map-side sort at all)

Usage: PROBE_CHILD= python tools/probe_resolve_variants.py [n_events] [n_small] [binlog]
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

from pyspark.sql import functions as F  # noqa: E402


def _pack_key(ts, op_pri, offset):
    """Fixed-width hex big-endian (ts_micros, op_pri, offset) — lexicographic
    order == numeric order; 16+1+10 hex chars."""
    return F.concat(
        F.lpad(F.hex(F.unix_micros(ts)), 16, "0"),
        op_pri.cast("string"),
        F.lpad(F.hex(offset), 10, "0"),
    )


def resolve_packed(batch):
    from catalogue_pipeline_spark.cdc.resolve import with_op_pri

    ev = with_op_pri(batch)
    sep = F.lit("\x00")
    wkey = _pack_key(F.col("ts"), F.col("op_pri"), F.col("offset"))
    ndkey = F.concat(
        F.lpad(F.hex(F.unix_micros(F.col("ts"))), 16, "0"),
        F.lpad(F.hex(F.col("offset")), 10, "0"),
    )
    agg = ev.groupBy("conv_id", "turn_idx").agg(
        F.max(F.concat(wkey, sep, F.col("op"))).alias("w"),
        F.max(
            F.when(
                F.col("op") != "delete",
                F.concat(
                    ndkey,
                    sep,
                    F.coalesce(F.col("role"), F.lit("\x01")),
                    sep,
                    F.coalesce(F.col("tool"), F.lit("\x01")),
                    sep,
                    F.coalesce(F.col("text"), F.lit("\x01")),
                ),
            )
        ).alias("nd"),
        F.count(F.lit(1)).alias("n_events"),
    )
    spl = F.split(F.col("nd"), "\x00", 4)
    return agg.select(
        "conv_id",
        "turn_idx",
        F.nullif(spl[1], F.lit("\x01")).alias("role"),
        F.nullif(spl[3], F.lit("\x01")).alias("text"),
        F.nullif(spl[2], F.lit("\x01")).alias("tool"),
        F.timestamp_micros(F.conv(F.substring("w", 1, 16), 16, 10).cast("long")).alias("ts"),
        F.substring("w", 17, 1).cast("int").alias("op_pri"),
        F.conv(F.substring("w", 18, 10), 16, 10).cast("long").alias("offset"),
        F.timestamp_micros(
            F.conv(F.substring("nd", 1, 16), 16, 10).cast("long")
        ).alias("nd_ts"),
        F.conv(F.substring("nd", 17, 10), 16, 10).cast("long").alias("nd_offset"),
        F.when(F.substring("w", 17, 1) == "1", F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("deleted"),
        "n_events",
    )


def resolve_packed_dict(batch):
    """packed + the round-3 verdict's last suggestion: take the 64-bit
    hash of conv_id as the grouping key so the exchange carries a long
    instead of the string, and re-attach the conv_id after the aggregate.
    Without a true dictionary there is nothing to re-attach FROM except the
    rows themselves, so the string rides along as one more max() register —
    the probe measures whether keying the hash beats keying the string
    (collision risk is accepted for the probe; a production version would
    need a salt-and-verify pass, which is part of why this variant was
    never shipped)."""
    from catalogue_pipeline_spark.cdc.resolve import with_op_pri

    ev = with_op_pri(batch)
    sep = F.lit("\x00")
    wkey = _pack_key(F.col("ts"), F.col("op_pri"), F.col("offset"))
    ndkey = F.concat(
        F.lpad(F.hex(F.unix_micros(F.col("ts"))), 16, "0"),
        F.lpad(F.hex(F.col("offset")), 10, "0"),
    )
    agg = ev.groupBy(
        F.xxhash64("conv_id").alias("conv_h"), F.col("turn_idx")
    ).agg(
        F.max("conv_id").alias("conv_id"),
        F.max(F.concat(wkey, sep, F.col("op"))).alias("w"),
        F.max(
            F.when(
                F.col("op") != "delete",
                F.concat(
                    ndkey,
                    sep,
                    F.coalesce(F.col("role"), F.lit("\x01")),
                    sep,
                    F.coalesce(F.col("tool"), F.lit("\x01")),
                    sep,
                    F.coalesce(F.col("text"), F.lit("\x01")),
                ),
            )
        ).alias("nd"),
        F.count(F.lit(1)).alias("n_events"),
    )
    spl = F.split(F.col("nd"), "\x00", 4)
    return agg.select(
        "conv_id",
        "turn_idx",
        F.nullif(spl[1], F.lit("\x01")).alias("role"),
        F.nullif(spl[3], F.lit("\x01")).alias("text"),
        F.nullif(spl[2], F.lit("\x01")).alias("tool"),
        F.timestamp_micros(F.conv(F.substring("w", 1, 16), 16, 10).cast("long")).alias("ts"),
        F.substring("w", 17, 1).cast("int").alias("op_pri"),
        F.conv(F.substring("w", 18, 10), 16, 10).cast("long").alias("offset"),
        "n_events",
    )


def resolve_no_op(batch):
    from catalogue_pipeline_spark.cdc.resolve import with_op_pri

    ev = with_op_pri(batch)
    agg = ev.groupBy("conv_id", "turn_idx").agg(
        F.max(F.struct("ts", "op_pri", "offset")).alias("w"),
        F.max(
            F.when(
                F.col("op") != "delete",
                F.struct("ts", "offset", "role", "text", "tool"),
            )
        ).alias("nd"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "conv_id",
        "turn_idx",
        F.col("nd.role").alias("role"),
        F.col("nd.text").alias("text"),
        F.col("nd.tool").alias("tool"),
        F.col("w.ts").alias("ts"),
        F.col("w.op_pri").alias("op_pri"),
        F.col("w.offset").alias("offset"),
        F.col("nd.ts").alias("nd_ts"),
        F.col("nd.offset").alias("nd_offset"),
        F.when(F.col("w.op_pri") == 1, F.lit("true"))
        .otherwise(F.lit("false"))
        .alias("deleted"),
        "n_events",
    )


def run_variants(cpus: int, binlog: str) -> dict:
    from catalogue_pipeline_spark.cdc.resolve import resolve_lww
    from catalogue_pipeline_spark.cdc.schema import SchemaRegistry
    from catalogue_pipeline_spark.session import build_session

    spark = build_session("probe", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reg = SchemaRegistry()
    raw = spark.read.parquet(binlog)
    raw.count()  # warm
    out = {}

    # warm-up: one untimed aggregate so codegen/JIT/shuffle-service setup
    # doesn't land on whichever variant happens to run first (measured:
    # the first aggregate pays a multi-second first-run penalty)
    resolve_no_op(reg.normalize(raw)).count()

    t0 = time.time()
    reg.normalize(raw).select(
        F.sum(F.length("text") + F.length("conv_id") + F.length("op")).alias("b")
    ).collect()
    out["decode"] = time.time() - t0

    for name, fn in (
        ("current", resolve_lww),
        ("no_op", resolve_no_op),
        ("packed", resolve_packed),
        ("packed_dict", resolve_packed_dict),
    ):
        t0 = time.time()
        fn(reg.normalize(raw)).count()
        out[name] = time.time() - t0
    spark.stop()
    return out


def main():
    if os.environ.get("PROBE_CHILD"):
        print("CHILD" + json.dumps(run_variants(int(sys.argv[1]), sys.argv[2])))
        return

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_big = 4 * n_small
    binlog = sys.argv[3] if len(sys.argv) > 3 else None
    work = tempfile.mkdtemp(prefix="cps-probe-")
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
        env = dict(os.environ, PROBE_CHILD="1")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(cpus), binlog],
            env=env, capture_output=True, text=True, check=True, cwd=REPO,
        )
        return json.loads([l for l in p.stdout.splitlines() if l.startswith("CHILD")][-1][5:])

    big = child(n_big)
    small = child(n_small)
    print(f"{'variant':<10}{'local[' + str(n_small) + ']':>12}{'local[' + str(n_big) + ']':>12}{'speedup':>9}{'eff':>6}")
    for k in ("decode", "current", "no_op", "packed", "packed_dict"):
        sp = small[k] / big[k]
        print(f"{k:<10}{small[k]:>11.1f}s{big[k]:>11.1f}s{sp:>8.2f}x{sp / 4:>6.2f}")
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
