"""A minimal ACID table format over parquet ("lake table").

No Iceberg runtime jar ships in this sandbox, so we implement — from scratch,
in ~300 lines — exactly the subset of table-format semantics the reference
pipeline relies on (SURVEY.md §1.1, §2.1 S6/S8/S13, §2.7 V7/V8):

* **Atomic commits / snapshot isolation** — every write produces an immutable
  snapshot file ``metadata/v{N}.json`` created with ``O_EXCL`` (the optimistic
  lock: a concurrent writer racing to the same version fails cleanly, like an
  Iceberg commit conflict) and then atomically publishes it by ``os.rename``
  of the ``CURRENT`` pointer. Readers always see a complete snapshot.
* **Changeset-tagged commits** — each snapshot carries a free-form ``summary``
  dict; the CDC engine writes ``changeset_id`` / ``range_id`` / offset bounds
  into it, which is the commit-fencing protocol (the analog of the
  reference's atomic changeset commit, pipeline_store.py:205-235, and of
  "facts must land first", reconcile.py:1-9 — here the fact IS the commit).
* **Time travel** — ``read(snapshot_id=K)`` pins a historical snapshot, the
  analog of the transformer's pinned ``snapshot_id`` reads
  (catalogue_graph/src/adapters/steps/transformer.py:107,232-235).
* **Hash-bucketed layout** — data files are assigned to ``num_buckets``
  buckets by ``xxhash64(key) % B``. A MERGE only rewrites buckets containing
  changed keys (copy-on-write at bucket granularity), so merge cost scales
  with the change set, not table size — at 100 TB this is the difference
  between rewriting gigabytes and rewriting everything. Within each bucket,
  files are written sorted by key so parquet min/max stats prune point
  lookups (mirrors the reference's id-sorted tables, schemata.py:36-40).

Design note (scale): bucket count is fixed per table (like Iceberg's
``bucket(N, col)`` partition transform). At 100 TB choose B so each bucket is
a few GB (e.g. B = 16384); local tests use small B. All metadata the driver
touches is O(#files-in-affected-buckets), never O(rows).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_BUCKET_COL = "__bucket"


class CommitConflict(Exception):
    """Another writer committed the same version first (optimistic-lock loss,
    the moral equivalent of the matcher's lock failure, WorkMatcher.scala:44-64)."""


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    schema_json: str
    # list of {"path": rel_path, "bucket": int, "rows": int | None}
    files: list[dict] = field(default_factory=list)
    summary: dict = field(default_factory=dict)
    properties: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "snapshot_id": self.snapshot_id,
                "parent_id": self.parent_id,
                "schema_json": self.schema_json,
                "files": self.files,
                "summary": self.summary,
                "properties": self.properties,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d["parent_id"],
            schema_json=d["schema_json"],
            files=d["files"],
            summary=d["summary"],
            properties=d.get("properties", {}),
        )

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.schema_json))


def bucket_expr(key_col: str, num_buckets: int):
    """Deterministic bucket assignment — same function on both the table
    layout and incoming change batches, so bucket-local merges need no
    shuffle of the target side."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


class LakeTable:
    """Handle to a lake table rooted at ``path`` (a local or DFS directory).

    ``orphan_grace_s`` governs crash healing: an unpublished ``v{N}.json``
    (written but CURRENT never advanced — a writer crashed between the two
    commit steps) is adopted-or-deleted by the next committer only once it is
    older than this grace period; younger files are assumed to belong to an
    in-flight writer about to publish. The same grace protects data files of
    in-flight writers from ``expire_snapshots``."""

    def __init__(self, path: str, orphan_grace_s: float = 600.0):
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")
        self.orphan_grace_s = orphan_grace_s

    # ------------------------------------------------------------------ DDL
    @staticmethod
    def create(
        path: str,
        schema: StructType,
        bucket_key: str | None = None,
        num_buckets: int = 16,
        properties: dict | None = None,
    ) -> "LakeTable":
        t = LakeTable(path)
        os.makedirs(t.meta_dir, exist_ok=False)
        os.makedirs(t.data_dir, exist_ok=True)
        props = dict(properties or {})
        if bucket_key is not None:
            props["bucket_key"] = bucket_key
            props["num_buckets"] = num_buckets
        snap = Snapshot(
            snapshot_id=0,
            parent_id=None,
            schema_json=json.dumps(schema.jsonValue()),
            files=[],
            summary={"operation": "create"},
            properties=props,
        )
        t._write_snapshot(snap)
        t._publish(0)
        return t

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, "metadata", "CURRENT"))

    # ------------------------------------------------------------- metadata
    def current_snapshot_id(self) -> int:
        with open(os.path.join(self.meta_dir, "CURRENT")) as f:
            return int(f.read().strip())

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        with open(os.path.join(self.meta_dir, f"v{sid}.json")) as f:
            return Snapshot.from_json(f.read())

    def history(self) -> list[Snapshot]:
        """All snapshots, oldest first (walks the parent chain)."""
        out: list[Snapshot] = []
        snap = self.snapshot()
        while True:
            out.append(snap)
            if snap.parent_id is None:
                break
            snap = self.snapshot(snap.parent_id)
        return list(reversed(out))

    def summaries(self) -> list[dict]:
        return [s.summary for s in self.history()]

    @property
    def num_buckets(self) -> int:
        return int(self.snapshot().properties.get("num_buckets", 1))

    @property
    def bucket_key(self) -> str | None:
        return self.snapshot().properties.get("bucket_key")

    # ----------------------------------------------------------------- read
    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        buckets: list[int] | None = None,
        with_bucket_col: bool = False,
        kinds: set[str] | None = None,
    ) -> DataFrame:
        """Read raw rows of a snapshot (optionally pinned — V7 fencing),
        optionally restricted to a bucket subset (the file-pruning fast path
        for merges; analog of Iceberg partition pruning) and to file kinds
        ("base"/"delta"). NOTE: with merge-on-read deltas present, raw rows
        may contain multiple versions per key — use cdc.merge.read_state for
        the reduced view."""
        snap = self.snapshot(snapshot_id)
        files = snap.files
        if buckets is not None:
            bs = set(buckets)
            files = [f for f in files if f["bucket"] in bs]
        if kinds is not None:
            files = [f for f in files if f.get("kind", "base") in kinds]
        schema = snap.schema
        if not files:
            df = spark.createDataFrame([], schema)
            return df.withColumn(_BUCKET_COL, F.lit(None).cast("int")) if with_bucket_col else df
        paths = [os.path.join(self.data_dir, f["path"]) for f in files]
        # an explicit schema makes old int32 files read as the widened type
        # after schema evolution (parquet type promotion)
        df = spark.read.schema(schema).parquet(*paths)
        if with_bucket_col:
            key = self.bucket_key
            df = df.withColumn(_BUCKET_COL, bucket_expr(key, self.num_buckets))
        return df

    def metadata_count(self, snapshot_id: int | None = None) -> int | None:
        """Metadata-only row count when file stats are present (S9,
        pipeline_store.py:75-86). Returns None if any file lacks stats."""
        snap = self.snapshot(snapshot_id)
        total = 0
        for f in snap.files:
            if f.get("rows") is None:
                return None
            total += f["rows"]
        return total

    # ---------------------------------------------------------------- write
    def _write_snapshot(self, snap: Snapshot) -> None:
        p = os.path.join(self.meta_dir, f"v{snap.snapshot_id}.json")
        # O_EXCL: the optimistic commit lock — exactly-one writer wins v{N}
        fd = os.open(p, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        try:
            with os.fdopen(fd, "w") as f:
                f.write(snap.to_json())
        except BaseException:
            os.unlink(p)
            raise

    def _publish(self, snapshot_id: int, expected_current: int | None = None) -> None:
        """Advance CURRENT → ``snapshot_id``. With ``expected_current`` set,
        publish is CAS-like: re-read CURRENT and refuse unless it still equals
        the snapshot's parent — a writer stalled past the orphan grace whose
        v{N} slot was healed (and possibly built on by later commits) must NOT
        regress CURRENT past those commits; it gets a CommitConflict instead.
        (The read→rename window is not atomic, but reaching it requires a
        writer paused longer than ``orphan_grace_s`` waking inside that
        microsecond window — the grace period is the real guard.)"""
        if expected_current is not None:
            cur = self.current_snapshot_id()
            if cur != expected_current:
                raise CommitConflict(
                    f"cannot publish v{snapshot_id}: CURRENT moved to {cur} "
                    f"(expected {expected_current}); this commit's slot was "
                    "healed by another writer"
                )
        tmp = os.path.join(self.meta_dir, f".CURRENT.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(str(snapshot_id))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.meta_dir, "CURRENT"))  # atomic publish

    def commit(
        self,
        added: list[dict],
        removed_paths: set[str],
        summary: dict,
        schema: StructType | None = None,
        expected_parent: int | None = None,
    ) -> Snapshot:
        """Atomically produce the next snapshot = (parent.files − removed) ∪ added.

        ``expected_parent`` rejects the commit if the table moved underneath
        us (compare-and-swap; S13 single-transaction semantics)."""
        parent = self.snapshot()
        if expected_parent is not None and parent.snapshot_id != expected_parent:
            raise CommitConflict(
                f"expected parent {expected_parent}, found {parent.snapshot_id}"
            )
        files = [f for f in parent.files if f["path"] not in removed_paths] + added
        snap = Snapshot(
            snapshot_id=parent.snapshot_id + 1,
            parent_id=parent.snapshot_id,
            schema_json=json.dumps(schema.jsonValue()) if schema is not None else parent.schema_json,
            files=files,
            summary=summary,
            properties=parent.properties,
        )
        try:
            self._write_snapshot(snap)
        except FileExistsError as e:
            # v{N}.json exists but CURRENT never advanced past N-1: a writer
            # crashed between _write_snapshot and _publish. Without healing,
            # every future commit recomputes N and fails forever (the table
            # is wedged). If the orphan is past the grace period, it cannot
            # be an in-flight writer — delete it and take the slot; younger
            # files get a plain conflict (the in-flight writer will publish).
            if self.current_snapshot_id() >= snap.snapshot_id:
                raise CommitConflict(
                    f"snapshot v{snap.snapshot_id} already committed"
                ) from e
            orphan = os.path.join(self.meta_dir, f"v{snap.snapshot_id}.json")
            import time as _time

            try:
                age = _time.time() - os.path.getmtime(orphan)
            except OSError:
                age = None
            if age is None or age < self.orphan_grace_s:
                raise CommitConflict(
                    f"unpublished snapshot v{snap.snapshot_id} in flight"
                ) from e
            # Atomic quarantine: two healers can both pass the age check, but
            # only one rename succeeds — the loser hits FileNotFoundError and
            # backs off, so it can never unlink the winner's freshly-written
            # replacement snapshot (the unlink/recreate TOCTOU).
            quarantine = os.path.join(
                self.meta_dir, f".orphan-v{snap.snapshot_id}.{uuid.uuid4().hex}"
            )
            try:
                os.rename(orphan, quarantine)
            except FileNotFoundError:
                raise CommitConflict(
                    f"orphan v{snap.snapshot_id} healed concurrently"
                ) from e
            try:
                self._write_snapshot(snap)
            except FileExistsError as e2:  # lost the re-take race
                raise CommitConflict(
                    f"snapshot v{snap.snapshot_id} re-taken concurrently"
                ) from e2
        self._publish(snap.snapshot_id, expected_current=parent.snapshot_id)
        return snap

    def write_data_files(
        self,
        df: DataFrame,
        changeset_id: str,
        sort_cols: list[str] | None = None,
        kind: str = "base",
        pre_bucketed: bool = False,
    ) -> list[dict]:
        """Write ``df`` as new data files (one directory per changeset),
        bucketed by the table's bucket key, sorted within files for stats
        pruning. Returns the file manifest entries; does NOT commit — callers
        compose write + commit so one snapshot covers the whole change (S13).

        Codec-by-lifetime: DELTA files are ephemeral (read a handful of times
        before compaction folds them away) and sit on the ingest hot path, so
        they use snappy; base/compacted files keep the session codec (zstd)
        for the 100 TB storage bill. Measured (tools/probe_write_variants.py,
        2.4M-row write, this box): sorted-zstd 5.9 s vs sorted-snappy 3.1 s
        at local[16], and 4→16-core write scaling 0.31 → 0.51 — zstd's
        per-column-chunk compression was the non-scaling term.

        ``pre_bucketed``: the caller already carries ``_BUCKET_COL`` and an
        exchange keyed on it (e.g. ``resolve_lww_bucketed``) — skip this
        function's own bucket column + repartition so the upstream exchange
        is the only one (guide §2.4).
        """
        key = self.bucket_key
        nb = self.num_buckets
        rel_dir = f"cs-{changeset_id}"
        out_dir = os.path.join(self.data_dir, rel_dir)
        wdf = df
        writer_opts = {"compression": "snappy"} if kind == "delta" else {}
        if key is not None:
            if not pre_bucketed:
                wdf = wdf.withColumn(_BUCKET_COL, bucket_expr(key, nb))
                # one output file per affected bucket: repartition on the
                # bucket column (EXPLICIT partition count: AQE's 64MB-advisory
                # coalescing would otherwise shrink this exchange to a few
                # tasks and serialize the CPU-bound sort+encode write stage),
                # then partitionBy writes a directory per bucket
                wdf = wdf.repartition(
                    int(wdf.sparkSession.conf.get("spark.sql.shuffle.partitions")),
                    F.col(_BUCKET_COL),
                )
            if sort_cols:
                # lead with the bucket column: FileFormatWriter requires
                # rows ordered by the partitionBy column and inserts its
                # own (non-stable) sort when they are not — which would
                # silently destroy the within-file sort order the manifest
                # stats pruning depends on.  Sorting (bucket, *sort_cols)
                # satisfies the writer's requirement so no extra sort is
                # added and each file stays sorted by sort_cols.
                wdf = wdf.sortWithinPartitions(_BUCKET_COL, *sort_cols)
            wdf.write.mode("errorifexists").options(**writer_opts).partitionBy(
                _BUCKET_COL
            ).parquet(out_dir)
        else:
            if sort_cols:
                wdf = wdf.sortWithinPartitions(*sort_cols)
            wdf.write.mode("errorifexists").options(**writer_opts).parquet(out_dir)
        return self._manifest_from_dir(out_dir, rel_dir, kind=kind)

    def _manifest_from_dir(self, out_dir: str, rel_dir: str, kind: str = "base") -> list[dict]:
        entries: list[tuple[str, int, str]] = []  # (rel_path, bucket, full)
        for root, _dirs, fnames in os.walk(out_dir):
            for fn in sorted(fnames):
                if not fn.endswith(".parquet"):
                    continue
                rel_root = os.path.relpath(root, self.data_dir)
                bucket = 0
                if f"{_BUCKET_COL}=" in rel_root:
                    bucket = int(rel_root.split(f"{_BUCKET_COL}=")[-1].split("/")[0])
                entries.append(
                    (os.path.join(rel_root, fn), bucket, os.path.join(root, fn))
                )
        # footer reads are independent, latency-bound syscalls — a commit of
        # B bucket files paid B serial opens (~0.2-0.3 s per range at B=64,
        # on the ingest hot path); a small thread pool overlaps them
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, max(len(entries), 1))) as pool:
            rows = list(pool.map(lambda t: _parquet_rows(t[2]), entries))
        return [
            {"path": rel, "bucket": bucket, "rows": r, "kind": kind}
            for (rel, bucket, _full), r in zip(entries, rows)
        ]

    def append(self, df: DataFrame, changeset_id: str, summary: dict | None = None,
               sort_cols: list[str] | None = None, kind: str = "base",
               pre_bucketed: bool = False) -> Snapshot:
        added = self.write_data_files(df, changeset_id, sort_cols=sort_cols, kind=kind,
                                      pre_bucketed=pre_bucketed)
        s = {"operation": "append", "changeset_id": changeset_id}
        s.update(summary or {})
        return self.commit(added, set(), s)

    def overwrite_buckets(
        self,
        df: DataFrame,
        buckets: list[int],
        changeset_id: str,
        summary: dict | None = None,
        schema: StructType | None = None,
        sort_cols: list[str] | None = None,
        expected_parent: int | None = None,
        pre_bucketed: bool = False,
    ) -> Snapshot:
        """Copy-on-write replace of a bucket subset in ONE atomic snapshot —
        the physical form of MERGE INTO (added files + removed files commit
        together, like Iceberg's overwrite+append single transaction,
        pipeline_store.py:205-235)."""
        added = self.write_data_files(df, changeset_id, sort_cols=sort_cols,
                                      pre_bucketed=pre_bucketed)
        bs = set(buckets)
        parent = self.snapshot()
        removed = {f["path"] for f in parent.files if f["bucket"] in bs}
        s = {"operation": "overwrite", "changeset_id": changeset_id, "buckets": sorted(bs)}
        s.update(summary or {})
        return self.commit(added, removed, s, schema=schema,
                           expected_parent=expected_parent)

    def overwrite_all(
        self,
        df: DataFrame,
        changeset_id: str,
        summary: dict | None = None,
        sort_cols: list[str] | None = None,
    ) -> Snapshot:
        """Full-table replace in ONE atomic snapshot (all previous files
        removed, new files added together) — the snapshot-advance primitive
        for control-plane tables like the graph remover's ids snapshot."""
        added = self.write_data_files(df, changeset_id, sort_cols=sort_cols)
        parent = self.snapshot()
        removed = {f["path"] for f in parent.files}
        s = {"operation": "overwrite-all", "changeset_id": changeset_id}
        s.update(summary or {})
        return self.commit(added, removed, s)

    def delta_buckets(self, snapshot_id: int | None = None) -> list[int]:
        """Buckets currently carrying merge-on-read delta files."""
        snap = self.snapshot(snapshot_id)
        return sorted({f["bucket"] for f in snap.files if f.get("kind", "base") == "delta"})

    # ---------------------------------------------------------- maintenance
    def expire_snapshots(self, keep_last: int = 10, orphan_grace_s: float | None = None) -> int:
        """Delete snapshot metadata older than the last ``keep_last`` and any
        data files no live snapshot references. Returns #files deleted.

        Files referenced by an expired snapshot are deleted immediately (they
        were committed once; nothing in flight can own them). Files unknown
        to ANY snapshot are indistinguishable from an in-flight writer's
        not-yet-committed output (write_data_files + commit is a two-step
        compose), so those are only deleted once older than the grace period
        — the same rule as Iceberg's remove-orphan-files default."""
        grace = self.orphan_grace_s if orphan_grace_s is None else orphan_grace_s
        hist = self.history()
        keep = hist[-keep_last:]
        live = {f["path"] for s in keep for f in s.files}
        once_committed = {f["path"] for s in hist for f in s.files}
        deleted = 0
        for s in hist[:-keep_last]:
            p = os.path.join(self.meta_dir, f"v{s.snapshot_id}.json")
            if os.path.exists(p):
                os.unlink(p)
        # break the parent chain at the oldest kept snapshot
        if hist[:-keep_last] and keep:
            oldest = keep[0]
            oldest.parent_id = None
            tmp = os.path.join(self.meta_dir, f".v{oldest.snapshot_id}.tmp")
            with open(tmp, "w") as f:
                f.write(oldest.to_json())
            os.rename(tmp, os.path.join(self.meta_dir, f"v{oldest.snapshot_id}.json"))
        import time as _time

        now = _time.time()
        # quarantined orphan snapshots (healed commit slots) age out too
        for fn in os.listdir(self.meta_dir):
            if fn.startswith(".orphan-"):
                full = os.path.join(self.meta_dir, fn)
                try:
                    if now - os.path.getmtime(full) >= grace:
                        os.unlink(full)
                except OSError:
                    pass
        for root, _dirs, fnames in os.walk(self.data_dir, topdown=False):
            for fn in fnames:
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, self.data_dir)
                if not fn.endswith(".parquet") or rel in live:
                    continue
                if rel not in once_committed:
                    try:
                        if now - os.path.getmtime(full) < grace:
                            continue  # possibly an in-flight writer's file
                    except OSError:
                        continue
                os.unlink(full)
                deleted += 1
            if not os.listdir(root) and root != self.data_dir:
                shutil.rmtree(root, ignore_errors=True)
        return deleted


def _parquet_rows(path: str) -> int | None:
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def read_changesets(
    spark: SparkSession,
    table: "LakeTable",
    changeset_ids: list[str],
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read only the rows written by the given changesets, at an optionally
    pinned snapshot — the downstream-consumption pattern of the reference's
    transformer ("read rows by changeset_ids at pinned snapshot_id",
    transformer.py:96-168 / pipeline_store.py:121-165, S8).

    Changeset membership is file-granular here (each changeset writes its own
    file directory), so this is pure manifest pruning — no data-column filter
    needed, unlike the reference which must add a derived last_modified bound
    to prune. Files from other changesets are never opened."""
    snap = table.snapshot(snapshot_id)
    prefixes = tuple(f"cs-{c}/" for c in changeset_ids)
    files = [f for f in snap.files if f["path"].startswith(prefixes)]
    if not files:
        return spark.createDataFrame([], snap.schema)
    paths = [os.path.join(table.data_dir, f["path"]) for f in files]
    return spark.read.schema(snap.schema).parquet(*paths)
