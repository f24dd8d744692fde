"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (SURVEY.md §2.10 / brief: "applyInPandasWithState
for custom stateful operators").

This is the STREAMING counterpart of the batch interval-merge (A5 / q12):
events for a user belong to one session while each arrives within
``gap_seconds`` of the running session end. Batch mode computes it with an
analytic window over the whole history; here the state is one tiny register
per user — (running session end, session count) — carried across
micro-batches by Spark's state store.

Contract notes:
  * events must arrive in non-decreasing ts order PER USER across
    micro-batches (the usual streaming-sessionization assumption; the
    binlog's per-key ordering guarantees it for CDC offsets). Within a
    micro-batch we concatenate ALL Arrow chunks for the key and sort once
    before folding — applyInPandasWithState yields multiple chunks per key
    (spark.sql.execution.arrow.maxRecordsPerBatch, ~10k rows) in arbitrary
    relative order, so a per-chunk sort would not absorb intra-batch
    disorder for high-volume users.
  * a LATE event (ts ≤ the running session end carried from a previous
    micro-batch) is folded conservatively: it extends/joins the current
    session rather than opening a new one, and an event older than the
    session start is counted into the current session (never a
    retroactive split) — the no-watermark late-data policy (SURVEY §2.10).
  * state is two scalars per user — bounded memory regardless of history
    length, which is the entire point vs. replaying the window.
  * the engine's core CDC path deliberately does NOT use executor state
    (see stream_apply.py docstring — lake-table state is what makes 10^10
    events replayable); this operator exists for semantics the lake table
    cannot express incrementally without rereading history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SESSION_OUTPUT_SCHEMA = "user_id long, n_sessions long, session_end double"
SESSION_STATE_SCHEMA = "session_end double, n_sessions long"


def _sessionize_fn(gap_seconds: float):
    import pandas as pd  # executor-side

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.exists:
            session_end, n = state.get
        else:
            session_end, n = None, 0
        # one concat + sort across ALL chunks: chunk boundaries are an Arrow
        # batching artifact with no ordering guarantee between chunks
        chunks = [pdf for pdf in pdf_iter]
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            t = ts.timestamp()
            if session_end is None or t > session_end:
                n += 1
            session_end = max(session_end or float("-inf"), t + gap_seconds)
        state.update((session_end, n))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n], "session_end": [session_end]}
        )

    return fn


def sessionize_stream(events: DataFrame, gap_seconds: float = 300.0) -> DataFrame:
    """events(user_id, event_id, ts) stream → per-user running session
    counts, state carried in the streaming state store."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
