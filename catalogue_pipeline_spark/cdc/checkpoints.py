"""Offset-range checkpoint store — the engine's ``window_status`` table.

Mirrors the reference's window store (window_store.py:31-52,98-126): one row
per offset range with ``state ∈ {pending, success, failed}``, attempt count,
the changeset/snapshot the range committed, and its lineage metrics. Each
update is one atomic versioned commit (write-new-file + rename pointer — the
same protocol as lake/table.py, shared via the same CURRENT-pointer trick).

This is a small control-plane table (one row per range, thousands of rows at
10^10 events with sane range sizes), so it lives driver-side on pyarrow — by
design, exactly like the reference keeps window bookkeeping out of the data
plane. ``to_spark`` exposes it for inspection/joins.

The checkpoint is a CACHE of progress; the source of truth for "was range R
applied" is the range summary inside the data table's own snapshot chain
(merge.py writes them in the same atomic commit). ``ReplayDriver`` reconciles
both on startup, which is what makes a crash between data-commit and
checkpoint-write harmless (SURVEY.md §7.4 #2).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import uuid


class CheckpointStore:
    def __init__(self, path: str):
        self.path = path
        self.meta = os.path.join(path, "metadata")
        os.makedirs(self.meta, exist_ok=True)
        if not os.path.exists(os.path.join(self.meta, "CURRENT")):
            self._commit({}, 0)

    # -- versioned atomic state ------------------------------------------
    def _current_version(self) -> int:
        with open(os.path.join(self.meta, "CURRENT")) as f:
            return int(f.read().strip())

    def _load(self) -> dict[str, dict]:
        v = self._current_version()
        with open(os.path.join(self.meta, f"v{v}.json")) as f:
            return json.load(f)

    def _commit(self, rows: dict[str, dict], version: int | None = None) -> None:
        v = (self._current_version() + 1) if version is None else version
        p = os.path.join(self.meta, f"v{v}.json")
        fd = os.open(p, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        with os.fdopen(fd, "w") as f:
            json.dump(rows, f, sort_keys=True)
        tmp = os.path.join(self.meta, f".CURRENT.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.rename(tmp, os.path.join(self.meta, "CURRENT"))

    # -- window-status API (window_store.py:98-126 semantics) -------------
    def get(self, range_id: str) -> dict | None:
        return self._load().get(range_id)

    def all(self) -> dict[str, dict]:
        return self._load()

    def upsert(
        self,
        range_id: str,
        offset_start: int,
        offset_end: int,
        state: str,
        changeset_id: str | None = None,
        snapshot_id: int | None = None,
        metrics: dict[str, str] | None = None,
        error: str | None = None,
        updated_at: str | None = None,
    ) -> dict:
        rows = self._load()
        prev = rows.get(range_id, {})
        row = {
            "range_id": range_id,
            "offset_start": offset_start,
            "offset_end": offset_end,
            "state": state,
            "attempts": int(prev.get("attempts", 0)) + (1 if state == "pending" else 0),
            "changeset_id": changeset_id if changeset_id is not None else prev.get("changeset_id"),
            "snapshot_id": snapshot_id if snapshot_id is not None else prev.get("snapshot_id"),
            "last_error": error,
            # caller-supplied timestamp keeps tests deterministic; falls back
            # to wall-clock only for interactive use (control plane only —
            # never data)
            "updated_at": updated_at
            or dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds"),
            "metrics": metrics or prev.get("metrics") or {},
        }
        rows[range_id] = row
        self._commit(rows)
        return row

    def successful_range_ids(self) -> set[str]:
        return {k for k, r in self._load().items() if r["state"] == "success"}

    def counts_by_state(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for r in self._load().values():
            out[r["state"]] = out.get(r["state"], 0) + 1
        return out

    def to_spark(self, spark):
        from .schema import CHECKPOINT_SCHEMA

        rows = []
        for r in self._load().values():
            rows.append(
                (
                    r["range_id"],
                    int(r["offset_start"]),
                    int(r["offset_end"]),
                    r["state"],
                    int(r["attempts"]),
                    r.get("changeset_id"),
                    r.get("snapshot_id"),
                    dt.datetime.fromisoformat(r["updated_at"]).replace(tzinfo=None)
                    if r.get("updated_at")
                    else None,
                    {k: str(v) for k, v in (r.get("metrics") or {}).items()},
                )
            )
        return spark.createDataFrame(rows, CHECKPOINT_SCHEMA)
