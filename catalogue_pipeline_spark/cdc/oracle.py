"""Parity oracle: a deliberately naive single-threaded applier.

The reference keeps an unpruned read path "as the… parity-test oracle" for
the optimized one (pipeline_store.py:108-119); ours is a pure-Python dict
applier that processes events ONE AT A TIME in arrival (offset) order with
the same two max-registers per key (schema.py). Because both registers are
max-registers, one-at-a-time application must produce byte-identical state to
the engine's batched, partitioned, overlapped, crash-resumed replay — that
equality is the core correctness test (test_parity.py).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass


@dataclass
class _KeyState:
    # winner register
    ts: dt.datetime
    op_pri: int
    offset: int
    deleted: bool
    # non-delete register (None when the key only ever saw deletes)
    nd_ts: dt.datetime | None = None
    nd_offset: int | None = None
    role: str | None = None
    text: str | None = None
    tool: str | None = None


class NaiveApplier:
    def __init__(self) -> None:
        self.state: dict[tuple[str, int], _KeyState] = {}

    def apply(self, ev: dict) -> None:
        """Apply one binlog event dict (BINLOG_SCHEMA fields)."""
        key = (ev["conv_id"], int(ev["turn_idx"]))
        is_del = ev["op"] == "delete"
        op_pri = 1 if is_del else 0
        w = (ev["ts"], op_pri, ev["offset"])
        cur = self.state.get(key)
        if cur is None:
            cur = _KeyState(ts=ev["ts"], op_pri=op_pri, offset=ev["offset"], deleted=is_del)
            if not is_del:
                cur.nd_ts, cur.nd_offset = ev["ts"], ev["offset"]
                cur.role, cur.text, cur.tool = ev.get("role"), ev.get("text"), ev.get("tool")
            self.state[key] = cur
            return
        # winner register: replace iff >= (the reference's ">=" rule)
        if w >= (cur.ts, cur.op_pri, cur.offset):
            cur.ts, cur.op_pri, cur.offset = ev["ts"], op_pri, ev["offset"]
            cur.deleted = is_del
        # non-delete register: independent max on (ts, offset)
        if not is_del:
            nd = (ev["ts"], ev["offset"])
            if cur.nd_ts is None or nd >= (cur.nd_ts, cur.nd_offset):
                cur.nd_ts, cur.nd_offset = ev["ts"], ev["offset"]
                cur.role, cur.text, cur.tool = ev.get("role"), ev.get("text"), ev.get("tool")

    def apply_all(self, events: list[dict]) -> None:
        for ev in sorted(events, key=lambda e: e["offset"]):
            self.apply(ev)

    # -- exports ----------------------------------------------------------
    def state_rows(self) -> list[tuple]:
        """Rows in STATE_SCHEMA order, sorted by (conv_id, turn_idx)."""
        out = []
        for (conv, turn), s in sorted(self.state.items()):
            out.append(
                (
                    conv,
                    turn,
                    s.role,
                    s.text,
                    s.tool,
                    s.ts,
                    s.op_pri,
                    s.offset,
                    s.nd_ts,
                    s.nd_offset,
                    "true" if s.deleted else "false",
                )
            )
        return out

    def visible_rows(self) -> list[tuple]:
        """Rows in visible-transcripts order (conv_id, turn_idx, role, text,
        tool, ts), tombstones dropped."""
        return [
            (row[0], row[1], row[2], row[3], row[4], row[5])
            for row in self.state_rows()
            if row[10] == "false"
        ]
