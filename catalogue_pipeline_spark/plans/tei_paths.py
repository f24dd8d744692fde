"""TEI id-extractor path↔id bookkeeping — which XML file currently carries
which manuscript id, folded from the git-tree change/delete events.

Reference: ``tei_adapter/tei_id_extractor/PathIdManager.scala:28-150`` —
the five transactional arms on a path-changed event (plain update, fresh
insert, a new id moving into a known path, the same row seen through both
keys, and an id moving while its new path is occupied: store + change
message, a deleted message for every displaced id, old path row dropped),
the path-deleted arm (strictly-newer tombstone, emit deleted, drop the
row), and the ``tei_files/{id}/{epochSecond}.xml`` store key stamped into
every change message.  ALL time comparisons are strictly-after — a
same-timestamp replay is a no-op, unlike the sierra merger's deliberate
``>=``.

Spark-first shape: the state ties rows together through BOTH unique keys
(id and path), so one event can touch two rows — per-key windows cannot
express it.  The fold therefore (1) groups state rows and events into
connected components over the id∪path link graph (the existing
hash-to-min operator — components are an id and its historical paths,
bounded by a manuscript's move history, never table-sized) and (2) runs
the reference's exact sequential machine per component in an
Arrow-batched ``applyInPandas`` — the same accepted pattern as the TEI
nested-works recursion: genuinely order-dependent, tiny groups, off every
per-event hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.components import connected_components

STATE_SCHEMA = "id string, path string, time_modified timestamp"
EVENTS_SCHEMA = (
    "kind string, path string, id string, time_modified timestamp, seq int"
)
_FOLD_OUT = (
    "out_kind string, id string, path string, time_modified timestamp, "
    "store_key string"
)


def _fold_component(pdf: pd.DataFrame) -> pd.DataFrame:
    by_id: dict[str, tuple[str, object]] = {}
    by_path: dict[str, tuple[str, object]] = {}
    out: list[tuple] = []

    for r in pdf[pdf.row_kind == "state"].itertuples():
        by_id[r.id] = (r.path, r.time_modified)
        by_path[r.path] = (r.id, r.time_modified)

    def emit_change(id_, path, t):
        # naive timestamps delivered by applyInPandas are localized to
        # spark.sql.session.timeZone; fold_path_ids asserts that is UTC,
        # so .value here is the true epoch
        key = f"tei_files/{id_}/{t.value // 1_000_000_000}.xml"
        out.append(("changed", id_, path, t, key))

    def emit_deleted(id_, t):
        out.append(("deleted", id_, None, t, None))

    def unbind_id(id_):
        old = by_id.pop(id_, None)
        if old is not None:
            by_path.pop(old[0], None)

    def unbind_path(path):
        old = by_path.pop(path, None)
        if old is not None:
            by_id.pop(old[0], None)

    def bind(id_, path, t):
        by_id[id_] = (path, t)
        by_path[path] = (id_, t)

    events = pdf[pdf.row_kind == "event"].sort_values(["time_modified", "seq"])
    for e in events.itertuples():
        t = e.time_modified
        if e.kind == "deleted":
            row = by_path.get(e.path)
            if row is not None and t > row[1]:
                emit_deleted(row[0], t)
                unbind_path(e.path)
            continue
        id_row = by_id.get(e.id)
        path_row = by_path.get(e.path)
        if id_row is not None and path_row is None:
            # the id moved to a fresh path (PathIdManager 'update by id')
            if t > id_row[1]:
                emit_change(e.id, e.path, t)
                unbind_id(e.id)
                bind(e.id, e.path, t)
        elif id_row is None and path_row is None:
            emit_change(e.id, e.path, t)
            bind(e.id, e.path, t)
        elif id_row is None and path_row is not None:
            # a new id moved into a known path: the displaced id is deleted
            if t > path_row[1]:
                emit_change(e.id, e.path, t)
                emit_deleted(path_row[0], t)
                unbind_path(e.path)
                bind(e.id, e.path, t)
        elif id_row[0] == e.path:
            # same row through both keys: plain update
            if t > id_row[1]:
                emit_change(e.id, e.path, t)
                unbind_id(e.id)
                bind(e.id, e.path, t)
        else:
            # id moved AND its new path is occupied: both rows must be newer
            if t > id_row[1] and t > path_row[1]:
                emit_change(e.id, e.path, t)
                emit_deleted(path_row[0], t)
                unbind_path(e.path)
                unbind_id(e.id)
                bind(e.id, e.path, t)

    for id_, (path, t) in sorted(by_id.items()):
        out.append(("state", id_, path, t, None))
    return pd.DataFrame(
        out, columns=["out_kind", "id", "path", "time_modified", "store_key"]
    )


def fold_path_ids(
    state: DataFrame, events: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Fold one batch of TEI tree events into the path↔id table.  Returns
    ``(new_state, messages)`` — messages carry ``kind``
    (``changed``/``deleted``), ``id``, ``time_modified`` and (for changes)
    the ``tei_files/{id}/{epoch}.xml`` store key."""
    spark = state.sparkSession
    # the pandas fold derives the store-key epoch from naive timestamps,
    # which applyInPandas localizes to the session time zone — the keys
    # are only correct when that zone is UTC, so fail loudly otherwise
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"fold_path_ids requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): store-key epochs are derived from naive "
            f"session-local timestamps"
        )
    s_nodes = state.select(
        F.concat(F.lit("i:"), "id").alias("src"),
        F.concat(F.lit("p:"), "path").alias("dst"),
    )
    e_nodes = events.filter(F.col("id").isNotNull()).select(
        F.concat(F.lit("i:"), "id").alias("src"),
        F.concat(F.lit("p:"), "path").alias("dst"),
    )
    # deleted events link only a path; self-edge keeps the node present
    d_nodes = events.filter(F.col("id").isNull()).select(
        F.concat(F.lit("p:"), "path").alias("src"),
        F.concat(F.lit("p:"), "path").alias("dst"),
    )
    comps = connected_components(s_nodes.union(e_nodes).union(d_nodes))

    path_comp = comps.filter(F.col("id").startswith("p:")).select(
        F.expr("substring(id, 3)").alias("path"), F.col("component")
    )
    tagged_state = state.join(path_comp, "path").select(
        "component",
        F.lit("state").alias("row_kind"),
        F.lit(None).cast("string").alias("kind"),
        "id",
        "path",
        "time_modified",
        F.lit(0).alias("seq"),
    )
    tagged_events = events.join(path_comp, "path").select(
        "component",
        F.lit("event").alias("row_kind"),
        "kind",
        "id",
        "path",
        "time_modified",
        "seq",
    )
    folded = (
        tagged_state.unionByName(tagged_events)
        .groupBy("component")
        .applyInPandas(
            lambda _, pdf: _fold_component(pdf), schema=_FOLD_OUT
        )
    )
    new_state = folded.filter(F.col("out_kind") == "state").select(
        "id", "path", "time_modified"
    )
    messages = folded.filter(F.col("out_kind") != "state").select(
        F.col("out_kind").alias("kind"), "id", "time_modified", "store_key"
    )
    return new_state, messages
