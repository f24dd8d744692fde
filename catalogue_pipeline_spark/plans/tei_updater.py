"""TEI updater — GitHub tree diff (tei_adapter/tei_updater/src/
tei_updater.py:1-169).

The reference's scheduled Lambda fetches the recursive GitHub tree of
the TEI repository, keeps the blob entries as ``{path: {sha, uri}}``,
DeepDiffs it against the previous snapshot stored in S3, and publishes
one message per difference:

* value changed (sha or uri) → ``{path, uri, timeModified}``
  (diff_trees, tei_updater.py:58-90 — values_changed is collapsed to the
  parent path with a set, so sha+uri both changing yields ONE message);
* path added → ``{path, uri, timeModified}`` (same shape as changed —
  downstream cannot tell them apart, and does not need to);
* path removed → ``{path, timeDeleted}``;
* no stored tree (or an empty one — ``if old_tree:`` is falsy for ``{}``,
  tei_updater.py:153) → every blob is a changed message, which is exactly
  what diffing against an empty tree produces, so one join serves both;
* a truncated GitHub response is an error before any diffing
  (get_new_tree's ``assert response_tree["truncated"] is False``, :47).

These messages feed the path↔id fold (plans/tei_paths.py, W24).

Spark shape: the tree is a ``(path, sha, uri)`` frame; the diff is one
full-outer join on ``path`` with null-safe change detection — the same
idiom as sources/snapshot.py (J1/J4), but hard-delete shaped (the
reference's message stream carries explicit ``timeDeleted`` rather than
tombstoned state).  The type-changed DeepDiff arm
(test_more_types_of_diff_is_error) cannot occur here: the frame schema
types ``uri`` as string, so drift fails at ingest, strictly earlier than
the reference's assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TREE_SCHEMA = "path string, sha string, uri string"
GITHUB_ENTRY_SCHEMA = "path string, type string, sha string, uri string"


def parse_github_tree(entries: DataFrame, *, truncated: bool) -> DataFrame:
    """``get_new_tree`` (tei_updater.py:34-51): keep only ``type='blob'``
    entries of the recursive tree listing; a truncated listing is an
    error — diffing a partial tree would mass-delete every unlisted
    path."""
    if truncated:
        raise ValueError(
            "truncated GitHub tree response: refusing to diff a partial "
            "tree (reference asserts truncated is False)"
        )
    return entries.filter(F.col("type") == "blob").select("path", "sha", "uri")


def diff_tei_trees(
    old_tree: DataFrame | None,
    new_tree: DataFrame,
    *,
    time: str,
) -> tuple[DataFrame, DataFrame]:
    """``diff_trees`` + the bootstrap arm of ``main`` (tei_updater.py:
    58-90,153-160).  Returns ``(messages, new_state)``:

    * ``messages`` — ``(path, uri, time_modified, time_deleted)``; changed
      and added paths carry the NEW uri and ``time_modified``; removed
      paths carry ``time_deleted`` and a null uri;
    * ``new_state`` — the new tree verbatim, the caller persists it as the
      next run's ``old_tree`` (the reference's closing s3 put, :168).

    ``old_tree=None`` (no stored tree yet) behaves as an empty tree: every
    blob becomes a changed message, matching the reference's bootstrap.
    """
    spark = new_tree.sparkSession
    new_t = new_tree.select("path", "sha", "uri")
    old_t = (
        old_tree.select("path", "sha", "uri")
        if old_tree is not None
        else spark.createDataFrame([], TREE_SCHEMA)
    )

    # presence markers survive the full-outer join even when all payload
    # columns are null on one side
    o = old_t.select(
        "path",
        F.col("sha").alias("_old_sha"),
        F.col("uri").alias("_old_uri"),
        F.lit(1).alias("_in_old"),
    )
    n = new_t.withColumn("_in_new", F.lit(1))
    j = n.join(o, "path", "full_outer")
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    same = F.col("sha").eqNullSafe(F.col("_old_sha")) & F.col("uri").eqNullSafe(
        F.col("_old_uri")
    )

    messages = (
        j.filter(~(in_old & in_new & same))
        .select(
            "path",
            # removed rows carry no uri (the reference's delete message
            # has only path + timeDeleted)
            F.when(in_new, F.col("uri")).alias("uri"),
            F.when(in_new, F.lit(time)).alias("time_modified"),
            F.when(~in_new, F.lit(time)).alias("time_deleted"),
        )
    )
    return messages, new_t
