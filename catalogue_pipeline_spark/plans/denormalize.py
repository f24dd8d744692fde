"""Incremental denormalizer: transcripts → conversation documents.

The downstream stage of the pipeline (the reference's transformer→ingestor
path, SURVEY.md §3.3): a materialized per-conversation document table kept in
sync incrementally — only conversations touched since the last processed
snapshot are recomputed and merged, with no-op suppression (V2) so an
unchanged document is never rewritten.

Incrementality protocol (V7/S8):
  * the docs table records, in each commit summary, the transcripts
    ``snapshot_id`` it has processed up to (``source_snapshot``);
  * a run pins the transcripts CURRENT snapshot (V7 fencing), diffs it
    against the last processed snapshot at file granularity to find touched
    buckets, and recomputes ONLY conversations living in those buckets;
  * document rows = groupBy(conv_id) over visible turns: turn count, roles,
    concatenated text (ordered by turn_idx), last_ts — the "denormalised
    work document" analog;
  * MERGE gates on content equality: byte-identical documents are skipped
    (V2), so replays and no-op upstream commits cost nothing downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..cdc.merge import read_state, visible_transcripts
from ..lake.table import LakeTable, bucket_expr

DOC_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", LongType(), False),
        StructField("roles", StringType(), True),       # sorted distinct, '+'-joined
        StructField("text_concat", StringType(), True),  # turns in order
        StructField("last_ts", TimestampType(), False),
    ]
)

DOC_COLS = [f.name for f in DOC_SCHEMA.fields]


def create_docs_table(path: str, num_buckets: int = 16) -> LakeTable:
    return LakeTable.create(path, DOC_SCHEMA, bucket_key="conv_id", num_buckets=num_buckets)


def _docs_for(transcripts_visible: DataFrame) -> DataFrame:
    ordered = F.array_sort(
        F.collect_list(F.struct("turn_idx", "text", "role", "ts"))
    )
    return transcripts_visible.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.concat_ws("+", F.array_sort(F.collect_set("role"))).alias("roles"),
        F.concat_ws("\n", F.transform(ordered, lambda s: s["text"])).alias("text_concat"),
        F.max("ts").alias("last_ts"),
    )


def _last_processed(docs_table: LakeTable) -> int | None:
    for s in reversed(docs_table.history()):
        if "source_snapshot" in s.summary:
            return int(s.summary["source_snapshot"])
    return None


def refresh_documents(
    spark: SparkSession,
    transcripts: LakeTable,
    docs: LakeTable,
    changeset_id: str,
) -> tuple[int | None, int]:
    """Incrementally refresh the docs table. Returns (snapshot_id | None,
    n_conversations_recomputed). None = nothing changed downstream (V2/V3).
    """
    src_snap = transcripts.current_snapshot_id()  # V7: pin once
    last = _last_processed(docs)

    if last is not None and last == src_snap:
        return None, 0

    # touched buckets = buckets whose file set changed since `last`
    cur_files = {(f["path"], f["bucket"]) for f in transcripts.snapshot(src_snap).files}
    if last is not None:
        try:
            old_files = {(f["path"], f["bucket"]) for f in transcripts.snapshot(last).files}
            touched = {b for _p, b in cur_files ^ old_files}
        except FileNotFoundError:
            # the processed-up-to snapshot was expired upstream — fall back
            # to a full recompute (correct, just not incremental this once)
            touched = {b for _p, b in cur_files}
    else:
        touched = {b for _p, b in cur_files}
    if not touched:
        return None, 0
    touched_list = sorted(touched)

    # recompute documents for conversations in touched buckets only
    region = visible_transcripts(
        read_state(spark, transcripts, snapshot_id=src_snap, buckets=touched_list)
    )
    new_docs = _docs_for(region)

    nb = docs.num_buckets
    nb_tr = transcripts.num_buckets
    # both tables bucket by xxhash64(conv_id); when nb divides nb_tr, a
    # touched transcript bucket t maps exactly onto doc bucket t % nb — so
    # the affected doc-bucket set comes from the MANIFEST, no scan. This also
    # covers conversations that were fully deleted upstream (they must be
    # dropped from docs even though no new doc row lands in their bucket).
    if nb_tr % nb == 0:
        affected = sorted({t % nb for t in touched_list})
    else:  # incompatible bucket counts: rewrite all doc buckets
        affected = list(range(nb))
    existing = docs.read(spark, buckets=affected)
    keep = existing.filter(
        ~bucket_expr("conv_id", nb_tr).isin(touched_list)
    )
    out = keep.unionByName(new_docs.select(*DOC_COLS))

    # V2 no-op suppression at table level: skip the commit when the result
    # is byte-identical to what's stored
    if (
        out.exceptAll(existing).limit(1).isEmpty()
        and existing.exceptAll(out).limit(1).isEmpty()
    ):
        # still record progress so the next run can fast-skip
        docs.commit([], set(), {"operation": "docs-noop", "source_snapshot": src_snap})
        return None, 0

    n = new_docs.count()
    snap = docs.overwrite_buckets(
        out,
        buckets=affected,
        changeset_id=changeset_id,
        summary={"operation": "docs-refresh", "source_snapshot": src_snap},
        sort_cols=["conv_id"],
    )
    return snap.snapshot_id, n
