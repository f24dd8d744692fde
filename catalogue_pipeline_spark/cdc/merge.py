"""MERGE a resolved change set into the transcripts state table.

This is the engine's ``MERGE INTO`` — the J1–J5 semantics of the reference
(SURVEY.md §2.3) in one declarative plan:

  * J1 insert detection  — change keys absent from state → inserted
  * J2 update detection  — row-diff computed; no-op updates counted, and
                           buckets with zero actual change are NOT rewritten
  * J3 timestamp gate    — winner register replaced iff change wins the total
                           order ``(ts, op_pri, offset)`` (``>=`` +
                           delete-dominance via op_pri, resolve.py)
  * J4 deletes           — winning deletes become tombstones (kept so later
                           stale updates still lose; deletes are one-way for
                           older data, sierra_reader.py:50-53)
  * J5 content keep      — payload follows the independent non-delete
                           register, so tombstones keep replayable payload

Both registers merge as MAX — associative/commutative/idempotent — so any
range partitioning, overlap, or duplicate delivery converges to the same
bytes (the parity oracle in oracle.py applies events one-at-a-time and must
match exactly).

Physical shape (scale rationale):
  * The state table is hash-bucketed by ``conv_id`` (lake/table.py). Only
    buckets containing changed keys are read and rewritten (copy-on-write at
    bucket granularity) — merge cost ∝ |change set|, not |table|.
  * The merge join is FULL OUTER (both sides preserved), which can never
    broadcast — the physical plan is a sort-merge join of change set vs
    affected buckets, exactly what Iceberg's copy-on-write MERGE compiles
    to. When that shuffle dominates, use the merge-on-read delta path
    below, which has no join at all.
  * Buckets where every change lost the LWW gate (pure stale/duplicate
    replay) are detected and NOT rewritten — the reference's
    skip-write-when-unchanged (V3, WorkMatcher.scala:66-91); overlapping
    windows (build_windows.py:57-65) therefore cost ~nothing.

Exactly-once: the caller passes ``range_id``/offset bounds; they are written
into the SAME snapshot summary as the data (lake commit = one atomic rename),
so "was this range applied?" is answerable from the table itself even if the
checkpoint write after it is lost (SURVEY.md §7.4 hard part #2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..lake.table import LakeTable, bucket_expr
from .schema import STATE_SCHEMA

STATE_COLS = [f.name for f in STATE_SCHEMA.fields]


@dataclass
class ApplyMetrics:
    """Per-range lineage counters (A7, transformer.py:170-199)."""

    events_in: int = 0
    keys_in: int = 0
    events_applied: int = 0      # rows actually changed (insert/update/delete)
    inserts: int = 0
    updates: int = 0
    deletes: int = 0
    noop_updates: int = 0        # change present but row byte-identical (V2)
    dedup_drops: int = 0         # in-batch losers + rows losing the LWW gate
    late_arrivals: int = 0       # change ts older than current per-key max
    buckets_affected: int = 0
    buckets_rewritten: int = 0

    def as_map(self) -> dict[str, str]:
        return {k: str(v) for k, v in self.__dict__.items()}

    def add(self, other: "ApplyMetrics") -> None:
        for k, v in other.__dict__.items():
            setattr(self, k, getattr(self, k) + v)


def merge_into_state(
    spark: SparkSession,
    table: LakeTable,
    resolved: DataFrame,
    changeset_id: str,
    range_summary: dict | None = None,
    batch: DataFrame | None = None,
) -> tuple[int | None, ApplyMetrics]:
    """Apply a resolved change set (output of resolve_lww) to ``table``.

    Returns ``(snapshot_id, metrics)``; snapshot_id is None when the merge
    was a complete no-op (nothing committed — V3).

    ``batch``: optionally, the raw (pre-resolve) batch ``resolved`` was
    derived from. When given, the affected-bucket discovery runs as a
    scan + distinct over the batch's key column instead of materializing
    the full LWW aggregate one pass early (guide §1.2 "don't compute
    things you throw away": the buckets are the same either way — resolve
    groups by conv_id and neither invents nor drops keys — but the
    aggregate's exchange+sort is wasted on a bucket list). ``resolved``
    then feeds only the merge join, so it needs no cache of its own; the
    persisted join output covers the stats/write reuse.
    """
    nb = table.num_buckets
    src = resolved.withColumn("_b", bucket_expr("conv_id", nb))
    if batch is None:
        # resolve (binlog scan + LWW aggregate) feeds two consumers — the
        # affected-bucket discovery and the merge join — cache it once
        src = src.persist(StorageLevel.MEMORY_AND_DISK)
        affected_src = src.select("_b")
    else:
        affected_src = batch.select(bucket_expr("conv_id", nb).alias("_b"))

    # state side pruned to affected buckets only — file-level pruning via the
    # bucket manifest, not a post-scan filter; read_state reduces any
    # merge-on-read deltas so the join sees one row per key. Pin the snapshot
    # id NOW and pass it as expected_parent at commit: if another writer
    # lands in between, we get a CommitConflict instead of silently dropping
    # its files from the overlapping buckets (lost update).
    affected = sorted(r["_b"] for r in affected_src.distinct().collect())
    base_sid = table.current_snapshot_id()
    tgt = read_state(spark, table, snapshot_id=base_sid, buckets=affected)

    j = src.alias("s").join(
        tgt.alias("t"), on=["conv_id", "turn_idx"], how="full_outer"
    )

    has_s = F.col("s.ts").isNotNull()
    has_t = F.col("t.ts").isNotNull()
    s_key = F.struct("s.ts", "s.op_pri", "s.offset")
    t_key = F.struct("t.ts", "t.op_pri", "t.offset")
    src_wins = has_s & (~has_t | (s_key >= t_key))

    # non-delete register: independent max on (nd_ts, nd_offset); null-aware
    s_nd = F.struct("s.nd_ts", "s.nd_offset")
    t_nd = F.struct("t.nd_ts", "t.nd_offset")
    nd_from_s = has_s & F.col("s.nd_ts").isNotNull() & (
        ~has_t | F.col("t.nd_ts").isNull() | (s_nd >= t_nd)
    )

    def reg(c: str, cond) -> F.Column:
        return F.when(cond, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))

    new = j.select(
        F.col("conv_id"),
        F.col("turn_idx"),
        reg("role", nd_from_s).alias("role"),
        reg("text", nd_from_s).alias("text"),
        reg("tool", nd_from_s).alias("tool"),
        reg("ts", src_wins).alias("ts"),
        reg("op_pri", src_wins).alias("op_pri"),
        reg("offset", src_wins).alias("offset"),
        reg("nd_ts", nd_from_s).alias("nd_ts"),
        reg("nd_offset", nd_from_s).alias("nd_offset"),
        reg("deleted", src_wins).alias("deleted"),
        has_s.alias("_has_s"),
        has_t.alias("_has_t"),
        src_wins.alias("_src_wins"),
        (has_s & has_t & ~src_wins).alias("_lost"),
        (has_s & has_t & (F.col("s.ts") < F.col("t.ts"))).alias("_late"),
        F.coalesce(F.col("s.n_events"), F.lit(0)).alias("_n_events"),
        F.coalesce(F.col("s._b"), bucket_expr("conv_id", nb)).alias("_b"),
        F.col("t.deleted").alias("_t_deleted"),
        # row-identical test vs target (V2/V3 no-op detection)
        (
            has_t
            & reg("role", nd_from_s).eqNullSafe(F.col("t.role"))
            & reg("text", nd_from_s).eqNullSafe(F.col("t.text"))
            & reg("tool", nd_from_s).eqNullSafe(F.col("t.tool"))
            & reg("ts", src_wins).eqNullSafe(F.col("t.ts"))
            & reg("op_pri", src_wins).eqNullSafe(F.col("t.op_pri"))
            & reg("offset", src_wins).eqNullSafe(F.col("t.offset"))
            & reg("nd_ts", nd_from_s).eqNullSafe(F.col("t.nd_ts"))
            & reg("nd_offset", nd_from_s).eqNullSafe(F.col("t.nd_offset"))
            & reg("deleted", src_wins).eqNullSafe(F.col("t.deleted"))
        ).alias("_same"),
    ).withColumn("_changed", F.col("_has_s") & ~F.col("_same"))

    new = new.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        stats = (
            new.groupBy("_b")
            .agg(
                F.sum(F.when(F.col("_changed") & ~F.col("_has_t"), 1).otherwise(0)).alias("ins"),
                F.sum(
                    F.when(
                        F.col("_changed") & F.col("_has_t") & (F.col("deleted") == "false"), 1
                    ).otherwise(0)
                ).alias("upd"),
                F.sum(
                    F.when(
                        F.col("_changed")
                        & (F.col("deleted") == "true")
                        & (~F.col("_has_t") | (F.col("_t_deleted") == "false")),
                        1,
                    ).otherwise(0)
                ).alias("del_"),
                F.sum(F.when(F.col("_has_s") & F.col("_same"), 1).otherwise(0)).alias("noop"),
                F.sum(F.col("_lost").cast("long")).alias("lost"),
                F.sum(F.col("_late").cast("long")).alias("late"),
                F.sum("_n_events").alias("nev"),
                F.sum(F.when(F.col("_n_events") > 0, 1).otherwise(0)).alias("keys"),
                F.sum(F.col("_changed").cast("long")).alias("changed"),
            )
            .collect()
        )
        m = ApplyMetrics()
        rewrite: list[int] = []
        per_bucket: dict[str, str] = {}
        for r in stats:
            m.inserts += r["ins"] or 0
            m.updates += r["upd"] or 0
            m.deletes += r["del_"] or 0
            m.noop_updates += r["noop"] or 0
            m.dedup_drops += r["lost"] or 0
            m.late_arrivals += r["late"] or 0
            m.events_in += r["nev"] or 0
            m.keys_in += r["keys"] or 0
            if (r["changed"] or 0) > 0:
                rewrite.append(r["_b"])
            # per-partition (bucket) lineage: applied/dropped per bucket
            per_bucket[str(r["_b"])] = (
                f"applied={(r['ins'] or 0) + (r['upd'] or 0) + (r['del_'] or 0)},"
                f"dropped={r['lost'] or 0},events={r['nev'] or 0}"
            )
        m.events_applied = m.inserts + m.updates + m.deletes
        # in-batch losers: events folded into each key beyond the winner
        m.dedup_drops += m.events_in - m.keys_in
        m.buckets_affected = len(affected)
        m.buckets_rewritten = len(rewrite)

        if not rewrite:
            return None, m  # V3: nothing changed anywhere, no commit at all

        new_state = new.filter(F.col("_b").isin(rewrite)).select(*STATE_COLS)
        summary = {
            "range": dict(range_summary or {}),
            "metrics": m.as_map(),
            # per-partition lineage (A7): one entry per affected bucket; the
            # delta path's equivalent is the per-file row counts in the
            # manifest itself
            "bucket_lineage": per_bucket,
        }
        snap = table.overwrite_buckets(
            new_state,
            buckets=rewrite,
            changeset_id=changeset_id,
            summary=summary,
            sort_cols=["conv_id", "turn_idx"],
            expected_parent=base_sid,
        )
        return snap.snapshot_id, m
    finally:
        new.unpersist()
        if batch is None:
            src.unpersist()


def visible_transcripts(state: DataFrame) -> DataFrame:
    """User-facing view: drop tombstones and bookkeeping; the per-turn text
    equality invariant is checked on this projection under stable
    ``(conv_id, turn_idx)`` ordering."""
    return state.filter(F.col("deleted") == "false").select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


# ---------------------------------------------------------------------------
# merge-on-read (MOR) mode — the high-throughput ingest path
# ---------------------------------------------------------------------------
# Copy-on-write MERGE rewrites every affected bucket per range; with
# uniformly-spread keys that approaches a full-table rewrite per range (write
# amplification ∝ table size). Because BOTH state registers are max-registers
# (associative/commutative/idempotent), the table can instead store resolved
# change rows as append-only DELTA files and reduce registers at read time —
# exactly Iceberg v2's merge-on-read, but with a semantic twist: no positional
# deletes are needed at all, the LWW reduce IS the merge. Compaction folds
# base+deltas back into sorted base files, bucket by bucket, in one atomic
# commit. Ingest cost becomes ∝ |changes| (resolve + one append), reads pay a
# per-bucket partial aggregate until compaction.


def reduce_state(raw: DataFrame, extra_group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Reduce raw state rows (base + deltas, possibly many rows per key) to
    one row per key by merging both max-registers. Identity on already-
    reduced input. Partial-aggregates map-side like resolve_lww.

    ``extra_group_cols``: leading group columns functionally dependent on
    ``conv_id`` (the table bucket) — same grouping, but lets a bucket-keyed
    exchange be shared with the bucketed write that follows (guide §2.4);
    the extra columns ride through to the output."""
    # deleted == "true" iff op_pri == 1 (resolve.py invariant), so the winner
    # struct carries only primitives — the deleted string stays out of the
    # shuffle/sort buffers and is recomputed after the aggregate
    agg = raw.groupBy(*extra_group_cols, "conv_id", "turn_idx").agg(
        F.max(F.struct("ts", "op_pri", "offset")).alias("w"),
        F.max(
            F.when(
                F.col("nd_ts").isNotNull(),
                F.struct(
                    F.col("nd_ts").alias("ts"),
                    F.col("nd_offset").alias("offset"),
                    "role",
                    "text",
                    "tool",
                ),
            )
        ).alias("nd"),
    )
    return agg.select(
        *extra_group_cols,
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
    )


def read_state(spark: SparkSession, table: LakeTable, snapshot_id: int | None = None,
               buckets: list[int] | None = None) -> DataFrame:
    """The reduced (one row per key) view of the table, whatever mix of base
    and delta files the snapshot holds. Cheap when compacted: reduce_state is
    the identity on unique keys and skipped entirely when no deltas exist.

    Split read (the round-7 verdict's change-proportional-read fix): the
    reduce aggregate — a corpus-proportional exchange when run over the whole
    table — is applied ONLY to the buckets that actually carry delta files;
    clean buckets hold one row per key by construction and are unioned
    through untouched. A key lives in exactly one bucket, so the union equals
    the full-table reduce row-for-row, but the shuffle is bounded by the
    compaction cadence instead of the corpus."""
    snap = table.snapshot(snapshot_id)
    req = None if buckets is None else set(buckets)
    dbuckets = {
        f["bucket"]
        for f in snap.files
        if f.get("kind", "base") == "delta" and (req is None or f["bucket"] in req)
    }
    if not dbuckets:
        return table.read(spark, snapshot_id=snapshot_id, buckets=buckets)
    all_req = {f["bucket"] for f in snap.files} if req is None else req
    clean = sorted(all_req - dbuckets)
    dirty = reduce_state(
        table.read(spark, snapshot_id=snapshot_id, buckets=sorted(dbuckets))
    )
    if not clean:
        return dirty
    return table.read(spark, snapshot_id=snapshot_id, buckets=clean).unionByName(dirty)


def append_delta(
    spark: SparkSession,
    table: LakeTable,
    resolved: DataFrame,
    changeset_id: str,
    range_summary: dict | None = None,
    pre_bucketed: bool = False,
) -> tuple[int | None, ApplyMetrics]:
    """MOR ingest: append the resolved change set as delta files — no join
    against existing state, no bucket rewrite. Metrics cover the in-batch
    view only (events_in/keys_in/in-batch dedup_drops); state-relative
    splits (insert vs update, late arrivals) are deferred to compaction,
    which is the explicit MOR trade.

    ``pre_bucketed``: ``resolved`` came from ``resolve_lww_bucketed`` — it
    already carries the bucket column and a bucket-keyed exchange, so the
    write reuses that partitioning instead of re-shuffling (guide §2.4:
    one exchange for resolve + layout)."""
    from pyspark.sql import Observation

    from ..lake.table import _BUCKET_COL

    # metrics ride the write job itself (df.observe — the A7 mechanism),
    # so delta ingest is exactly ONE pass over the resolved batch: no
    # pre-count, no cache
    obs = Observation()
    observed = resolved.observe(
        obs, F.count(F.lit(1)).alias("keys"), F.sum("n_events").alias("nev")
    )
    keep = [_BUCKET_COL, *STATE_COLS] if pre_bucketed else STATE_COLS
    added = table.write_data_files(
        observed.select(*keep),
        changeset_id=changeset_id,
        sort_cols=["conv_id", "turn_idx"],
        kind="delta",
        pre_bucketed=pre_bucketed,
    )
    got = obs.get
    m = ApplyMetrics()
    m.keys_in = got["keys"] or 0
    m.events_in = got["nev"] or 0
    m.dedup_drops = m.events_in - m.keys_in
    m.events_applied = m.keys_in
    if m.keys_in == 0:
        return None, m  # nothing written worth keeping; files are empty
    summary = {
        "range": dict(range_summary or {}),
        "metrics": m.as_map(),
        "mode": "delta",
        "operation": "append-delta",
        "changeset_id": changeset_id,
    }
    snap = table.commit(added, set(), summary)
    return snap.snapshot_id, m


def compact(
    spark: SparkSession,
    table: LakeTable,
    changeset_id: str,
    buckets: list[int] | None = None,
) -> int | None:
    """Fold base+delta files of the given buckets (default: all buckets that
    currently carry deltas) into fresh sorted base files — one atomic commit.
    Returns the new snapshot id, or None if nothing to compact."""
    target = buckets if buckets is not None else table.delta_buckets()
    if not target:
        return None
    # bucket-aligned reduce (guide §2.4): repartition the raw rows by the
    # table bucket once, run the reduce grouped by (bucket, key) on that
    # exchange, and hand the still-bucket-partitioned result straight to the
    # writer — one exchange + one sort instead of a (key-hash) reduce
    # exchange followed by a (bucket) write exchange. Raw delta rows are
    # unique per key within each file, so map-side combine had nothing to
    # fold anyway.
    from ..lake.table import _BUCKET_COL, bucket_expr

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    raw = table.read(spark, buckets=target).withColumn(
        _BUCKET_COL, bucket_expr(table.bucket_key, table.num_buckets)
    )
    reduced = reduce_state(
        raw.repartition(n, F.col(_BUCKET_COL)), extra_group_cols=(_BUCKET_COL,)
    )
    snap = table.overwrite_buckets(
        reduced,
        buckets=target,
        changeset_id=changeset_id,
        summary={"operation": "compact", "buckets": sorted(target)},
        sort_cols=["conv_id", "turn_idx"],
        pre_bucketed=True,
    )
    return snap.snapshot_id
