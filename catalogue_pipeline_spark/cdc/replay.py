"""The replay driver: checkpointed, resumable, exactly-once range application.

The Spark rendering of the reference's window harvester + window store loop
(window_harvester.py:163-182, window_store.py:98-126, SURVEY.md §3.2):

    plan offset ranges → for each unapplied range:
        read binlog slice (parquet min/max pruning on ``offset``)
        → SchemaRegistry.normalize (schema evolution, V-mapping)
        → resolve_lww (two max-registers per key)
        → merge_into_state (bucket-pruned copy-on-write MERGE; the range id
          and offsets land in the SAME atomic table commit — the fence)
        → checkpoint row success (cache of the fence)

Exactly-once story (V5/V7/V8):
  * a range is APPLIED iff its range_id appears in a snapshot summary of the
    target table — written atomically with the data;
  * on startup the driver reconciles checkpoint rows with the snapshot chain,
    so a crash after data-commit but before checkpoint-write is repaired,
    not re-applied;
  * re-applying a range anyway would be harmless (max-register merge is
    idempotent; the no-op merge commits nothing) — fencing exists to avoid
    the wasted work, matching "UpdateNotApplied = benign" (Updater.scala).

Ranges may OVERLAP (``overlap`` > 0) like the reference's 1-minute window
overlap (build_windows.py:57-65) — idempotence makes that safe; it exists so
a binlog tailer never misses boundary records.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from .checkpoints import CheckpointStore
from .merge import ApplyMetrics, append_delta, merge_into_state
from .resolve import resolve_lww, resolve_lww_bucketed
from .schema import STATE_SCHEMA, SchemaRegistry


@dataclass
class Range:
    range_id: str
    start: int  # inclusive
    end: int    # exclusive


def plan_ranges(
    min_offset: int, max_offset_exclusive: int, range_size: int, overlap: int = 0
) -> list[Range]:
    """Fixed-size offset ranges covering [min, max); consecutive ranges may
    overlap by ``overlap`` offsets (S2 semantics — dedup handled downstream).
    Range ids are zero-padded so lexicographic == numeric order."""
    out: list[Range] = []
    start = min_offset
    i = 0
    while start < max_offset_exclusive:
        end = min(start + range_size, max_offset_exclusive)
        out.append(Range(f"{i:09d}", start, end))
        start = end - overlap if end < max_offset_exclusive else end
        i += 1
    return out


class CrashInjected(RuntimeError):
    """Test hook: simulated crash at a chosen point in the commit protocol."""


@dataclass
class ReplayReport:
    ranges_total: int = 0
    ranges_applied: int = 0
    ranges_skipped: int = 0
    events_scanned: int = 0
    metrics: ApplyMetrics = field(default_factory=ApplyMetrics)


class ReplayDriver:
    def __init__(
        self,
        spark: SparkSession,
        binlog_path: str,
        table: LakeTable,
        checkpoints: CheckpointStore,
        registry: SchemaRegistry | None = None,
        mode: str = "cow",
    ):
        """``mode``: "cow" = copy-on-write MERGE per range (read-optimized);
        "delta" = merge-on-read append per range (write-optimized, the
        high-throughput ingest path; run merge.compact periodically)."""
        assert mode in ("cow", "delta")
        self.spark = spark
        self.binlog_path = binlog_path
        self.table = table
        self.checkpoints = checkpoints
        self.registry = registry or SchemaRegistry()
        self.mode = mode

    # -- fencing ----------------------------------------------------------
    def applied_range_ids(self) -> set[str]:
        """Source of truth: range ids recorded in the table's own snapshot
        summaries, unioned with checkpoint successes (V3 no-op ranges commit
        no snapshot, so they appear only in the checkpoint)."""
        applied = {
            s.get("range", {}).get("range_id")
            for s in self.table.summaries()
            if s.get("range")
        }
        applied.discard(None)
        return applied | self.checkpoints.successful_range_ids()

    def reconcile(self) -> int:
        """Repair checkpoint rows for ranges whose data commit landed but
        whose checkpoint write was lost (crash between the two). Returns the
        number of repaired rows."""
        repaired = 0
        ck_success = self.checkpoints.successful_range_ids()
        for snap in self.table.history():
            rng = snap.summary.get("range") or {}
            rid = rng.get("range_id")
            if rid and rid not in ck_success:
                self.checkpoints.upsert(
                    rid,
                    int(rng.get("offset_start", -1)),
                    int(rng.get("offset_end", -1)),
                    "success",
                    changeset_id=snap.summary.get("changeset_id"),
                    snapshot_id=snap.snapshot_id,
                    metrics=snap.summary.get("metrics"),
                )
                repaired += 1
        return repaired

    # -- apply ------------------------------------------------------------
    def read_range(self, r: Range) -> DataFrame:
        # offset predicate pushes down to parquet row-group stats; the binlog
        # is written repartitionByRange(offset) so non-matching files are
        # skipped wholesale
        return self.spark.read.parquet(self.binlog_path).filter(
            (F.col("offset") >= r.start) & (F.col("offset") < r.end)
        )

    def apply_range(self, r: Range, attempt: int = 1) -> tuple[int | None, ApplyMetrics]:
        batch = self.registry.normalize(self.read_range(r))
        changeset_id = f"{r.range_id}-a{attempt}"
        summary = {
            "range_id": r.range_id,
            "offset_start": r.start,
            "offset_end": r.end,
        }
        if self.mode == "delta":
            # bucket-keyed resolve: ONE exchange + one sort serve both the
            # LWW aggregate and the per-bucket delta layout (guide §2.4;
            # resolve.resolve_lww_bucketed) — the write then reuses the
            # partitioning instead of re-shuffling the resolved rows.
            resolved = resolve_lww_bucketed(batch, self.table.num_buckets)
            return append_delta(
                self.spark,
                self.table,
                resolved,
                changeset_id=changeset_id,
                range_summary=summary,
                pre_bucketed=True,
            )
        # batch= lets the affected-bucket discovery run as a scan+distinct
        # on the raw keys instead of materializing the LWW aggregate one
        # pass early (same bucket set by construction; see merge_into_state)
        return merge_into_state(
            self.spark,
            self.table,
            resolve_lww(batch),
            changeset_id=changeset_id,
            range_summary=summary,
            batch=batch,
        )

    def run(
        self,
        ranges: list[Range],
        crash_after_commit_of: str | None = None,
        max_ranges: int | None = None,
        compact_every: int | None = None,
        expire_keep_last: int | None = None,
    ) -> ReplayReport:
        """Apply all unapplied ranges in order. ``crash_after_commit_of``
        simulates a crash AFTER the data commit of that range but BEFORE its
        checkpoint write (the §7.4 #2 failure) — tests resume through it.

        Maintenance cadence (delta mode's production loop): ``compact_every``
        folds merge-on-read deltas into base files every N applied ranges
        (the flush/durability trade, window_harvester.py:163-182);
        ``expire_keep_last`` garbage-collects snapshot metadata + orphaned
        files after each compaction, keeping the last N snapshots for time
        travel. Safe w.r.t. fencing because ``run`` reconciles checkpoint
        rows against the snapshot chain BEFORE any expiry can happen, so a
        range id is only allowed to age out of the chain once its checkpoint
        success row exists."""
        self.reconcile()
        applied = self.applied_range_ids()
        rep = ReplayReport(ranges_total=len(ranges))
        done = 0
        for r in ranges:
            if max_ranges is not None and done >= max_ranges:
                break
            if r.range_id in applied:
                rep.ranges_skipped += 1
                continue
            row = self.checkpoints.get(r.range_id) or {}
            attempt = int(row.get("attempts", 0)) + 1
            self.checkpoints.upsert(r.range_id, r.start, r.end, "pending")
            try:
                snap_id, m = self.apply_range(r, attempt=attempt)
            except Exception as e:  # noqa: BLE001 — recorded then re-raised
                self.checkpoints.upsert(
                    r.range_id, r.start, r.end, "failed", error=repr(e)[:500]
                )
                raise
            if crash_after_commit_of == r.range_id:
                raise CrashInjected(r.range_id)
            self.checkpoints.upsert(
                r.range_id,
                r.start,
                r.end,
                "success",
                changeset_id=f"{r.range_id}-a{attempt}",
                snapshot_id=snap_id,
                metrics=m.as_map(),
            )
            rep.ranges_applied += 1
            rep.events_scanned += m.events_in
            rep.metrics.add(m)
            done += 1
            if compact_every and rep.ranges_applied % compact_every == 0:
                from .merge import compact

                compact(self.spark, self.table, changeset_id=f"auto-compact-{r.range_id}")
                if expire_keep_last:
                    self.table.expire_snapshots(keep_last=expire_keep_last)
        return rep

    # -- selective replay (the reindexer's partial/specific modes) ---------
    def replay_selective(
        self,
        conv_ids: list[str] | None = None,
        conv_filter=None,
        max_offset_exclusive: int | None = None,
        changeset_id: str = "reindex",
    ) -> tuple[int | None, ApplyMetrics]:
        """Re-drive CHOSEN conversations from the binlog through the same
        apply path — the reference reindexer's "specific" (a given set of
        IDs) and "partial" (a filtered subset) modes (reindexer/README.md:
        47-55), without replanning offset ranges.

        ``conv_ids`` selects exact conversation ids (an isin/semi-join
        filter that pushes down to the binlog scan); ``conv_filter`` is any
        boolean Column over binlog columns (e.g. ``F.col("conv_id")
        .startswith("hot_")``). Both given = AND.

        Idempotent by construction: re-applying max-registers over a state
        that already reflects these events is a complete no-op — in cow mode
        literally nothing is committed (V3: no bucket rewritten); in delta
        mode the appended registers fold away at read time and vanish at the
        next compaction. So selective replay needs no fencing of its own and
        can run at any time. ``max_offset_exclusive``
        bounds the scan to the already-covered watermark so a concurrent
        tailer's new events are not half-applied out of band.

        Runs as ONE apply (not range-chunked): the selection is assumed
        small relative to the binlog — the reindexer's "small number of
        records" case. For a bulk re-drive, use ``run`` over fresh ranges.
        """
        if conv_ids is None and conv_filter is None:
            raise ValueError("selective replay needs conv_ids and/or conv_filter")
        batch = self.spark.read.parquet(self.binlog_path)
        if max_offset_exclusive is not None:
            batch = batch.filter(F.col("offset") < max_offset_exclusive)
        if conv_ids is not None:
            batch = batch.filter(F.col("conv_id").isin([str(c) for c in conv_ids]))
        if conv_filter is not None:
            batch = batch.filter(conv_filter)
        resolved = resolve_lww(self.registry.normalize(batch))
        apply_fn = append_delta if self.mode == "delta" else merge_into_state
        return apply_fn(
            self.spark,
            self.table,
            resolved,
            changeset_id=changeset_id,
            range_summary={"range_id": None, "reindex": changeset_id},
        )

    # -- gap detection (S4) ------------------------------------------------
    def coverage_gaps(self, upto_offset: int) -> list[tuple[int, int]]:
        """Holes in successfully-applied offset coverage — the interval-sweep
        gap detector (interval_arithmetic.py:47-94) over checkpoint rows."""
        rows = sorted(
            (
                (int(r["offset_start"]), int(r["offset_end"]))
                for r in self.checkpoints.all().values()
                if r["state"] == "success"
            ),
        )
        gaps: list[tuple[int, int]] = []
        covered = 0
        for s, e in rows:
            if s > covered:
                gaps.append((covered, s))
            covered = max(covered, e)
        if covered < upto_offset:
            gaps.append((covered, upto_offset))
        return gaps


def state_schema_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], STATE_SCHEMA)


def plan_time_ranges(
    start_ts, end_ts, window_minutes: int, overlap_minutes: int = 1
):
    """Time-windowed ranges — the reference's actual window generator
    (build_windows.py:57-65): fixed windows with a 1-minute overlap so
    boundary records are never missed (idempotent apply absorbs the overlap).
    Returned as (range_id, window_start, window_end) datetimes; apply by
    filtering the binlog on ``ts`` instead of ``offset``."""
    import datetime as dt

    out = []
    cur = start_ts
    i = 0
    step = dt.timedelta(minutes=window_minutes)
    back = dt.timedelta(minutes=overlap_minutes)
    while cur < end_ts:
        end = min(cur + step, end_ts)
        out.append((f"w{i:09d}", cur, end))
        if end >= end_ts:
            break
        cur = end - back
        i += 1
    return out


def covered_upto(checkpoints: CheckpointStore) -> int:
    """Highest contiguously-covered offset (exclusive) across successful
    ranges — where the tailer resumes from."""
    rows = sorted(
        (int(r["offset_start"]), int(r["offset_end"]))
        for r in checkpoints.all().values()
        if r["state"] == "success"
    )
    covered = 0
    for s, e in rows:
        if s > covered:
            break  # gap: do not leap over it
        covered = max(covered, e)
    return covered


class BinlogTailer:
    """Continuous ingest: poll the binlog for new offsets, plan fresh ranges
    from the covered watermark, apply through the same driver — the
    cron→window_generator→harvest loop of the reference (SURVEY §3.1) with
    data-arrival-driven windows instead of wall-clock ones.

    ``range_overlap`` mirrors the reference's 1-minute window overlap
    (build_windows.py:57-65); idempotent apply absorbs it.
    """

    def __init__(self, driver: ReplayDriver, range_size: int, overlap: int = 0,
                 compact_every: int | None = None):
        self.driver = driver
        self.range_size = range_size
        self.overlap = overlap
        self.compact_every = compact_every
        # Continue range numbering from max(existing numeric id) + 1, NOT
        # len(checkpoints): with sparse numbering or ids from other planners
        # mixed in (plan_time_ranges 'w…' ids, custom ranges), a length-based
        # seed can collide with an already-applied range_id, and driver.run
        # would silently skip the newly planned offsets as "done".
        seqs = [
            int(rid)
            for rid in driver.checkpoints.all()
            if isinstance(rid, str) and rid.isdigit()
        ]
        self._next_seq = (max(seqs) + 1) if seqs else 0

    def poll_once(self) -> ReplayReport | None:
        """One tail iteration: apply everything between the covered watermark
        and the binlog's current max offset. None = nothing new."""
        from pyspark.sql import functions as F

        start = covered_upto(self.driver.checkpoints)
        bounds = (
            self.driver.spark.read.parquet(self.driver.binlog_path)
            .filter(F.col("offset") >= start)
            .agg(F.max("offset"))
            .collect()[0][0]
        )
        if bounds is None:
            return None
        end = int(bounds) + 1
        ranges = []
        cur = max(start - self.overlap, 0)
        while cur < end:
            ranges.append(Range(f"{self._next_seq:09d}", cur, min(cur + self.range_size, end)))
            cur = ranges[-1].end
            self._next_seq += 1
        return self.driver.run(ranges, compact_every=self.compact_every)
