"""Matcher + merger as one declarative plan (SURVEY.md §2.8 G1–G5).

The reference splits this across two services: the matcher maintains an
incremental connected-components graph of works that should merge
(WorkGraphUpdater.scala:98-193) and the merger folds each component into a
single target work by precedence rules, emitting Redirected stubs for the
absorbed sources (Merger.scala:72-161, TargetPrecedence.scala:10-32,
ItemsRule.scala:25-57). Spark-first, that's:

    works(id, source_type, merge_candidate_ids, suppressed, items,
          identifiers, thumbnail)
      → edges from candidate lists, suppressed endpoints dropped      (F6)
      → connected components (min-label propagation)                  (G1)
      → stable component digest over sorted member ids                (G2)
      → target per component = precedence top-1                       (O3)
      → fold members into target: items/identifiers concatenated in
        deterministic (precedence, id) order, thumbnail from target
        else best source                                              (G4)
      → emit Visible merged target + Redirected stubs; singletons
        pass through untouched; everything stamped with the BATCH
        time, never per-work times                                    (G5)

G5 matters: "we cannot rely on the modified times of the individual works —
this may cause us to drop updates if works get unlinked" (RFC 038 via
MergeProcessor.scala:41-65) — so all derived rows carry ``batch_ts``.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.components import component_digest, connected_components
from ..operators.precedence import precedence_score

DEFAULT_PRECEDENCE = ["ebsco", "tei", "calm", "sierra-digital", "sierra-physical", "sierra"]


def match_and_merge(
    works: DataFrame,
    batch_ts: dt.datetime,
    precedence: list[str] | None = None,
) -> DataFrame:
    """Returns one row per input work:
    (work_id, component, subgraph_id, type ∈ Visible|Redirected,
     redirect_target, source_type, items, identifiers, thumbnail, batch_ts).

    Input columns: work_id, source_type, merge_candidate_ids array<string>,
    suppressed boolean, items array<string>, identifiers array<string>,
    thumbnail string.
    """
    order = precedence or DEFAULT_PRECEDENCE

    # G1: edges from candidate lists; suppression breaks edges at either
    # endpoint (WorkGraphUpdater.scala:117-134) but every work self-links so
    # isolated/suppressed works still form singleton components
    sup = works.select("work_id", "suppressed")
    cand_edges = (
        works.select(
            F.col("work_id").alias("src"),
            F.explode("merge_candidate_ids").alias("dst"),
            F.col("suppressed").alias("src_sup"),
        )
        .join(sup.withColumnsRenamed({"work_id": "dst", "suppressed": "dst_sup"}), "dst", "left")
        .filter(~F.col("src_sup") & ~F.coalesce(F.col("dst_sup"), F.lit(True)))
        .select("src", "dst")
    )
    self_edges = works.select(
        F.col("work_id").alias("src"), F.col("work_id").alias("dst")
    )
    edges = cand_edges.unionByName(self_edges)
    labels = connected_components(edges)
    digests = component_digest(labels)

    w = works.join(labels.withColumnRenamed("id", "work_id"), "work_id", "left")
    w = w.withColumn("component", F.coalesce("component", "work_id"))

    # O3: target per component (suppressed works can never be targets)
    score = precedence_score(F.col("source_type"), order)
    w = w.withColumn("_score", F.when(F.col("suppressed"), F.lit(10_000)).otherwise(score))
    from pyspark.sql import Window

    rank_w = Window.partitionBy("component").orderBy(F.asc("_score"), F.asc("work_id"))
    w = w.withColumn("_rn", F.row_number().over(rank_w))

    # G4: fold member payloads in deterministic (precedence, id) order
    folded = w.groupBy("component").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_score", "work_id", "items"))
                ),
                lambda s: s["items"],
            )
        ).alias("merged_items"),
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_score", "work_id", "identifiers"))
                    ),
                    lambda s: s["identifiers"],
                )
            )
        ).alias("merged_identifiers"),
        # thumbnail: target's, else highest-precedence source's (max ignores
        # null structs only if whole struct null — guard with when)
        F.min(
            F.when(F.col("thumbnail").isNotNull(), F.struct("_score", "work_id", "thumbnail"))
        ).alias("thumb_pick"),
        F.count(F.lit(1)).alias("n_members"),
    )

    out = (
        w.join(folded, "component")
        .join(digests.withColumnRenamed("members", "_members"), "component")
        .select(
            "work_id",
            "component",
            "subgraph_id",
            F.when(F.col("_rn") == 1, F.lit("Visible"))
            .otherwise(F.lit("Redirected"))
            .alias("type"),
            F.when(F.col("_rn") != 1, F.first("work_id").over(rank_w)).alias(
                "redirect_target"
            ),
            "source_type",
            F.when(F.col("_rn") == 1, F.col("merged_items"))
            .otherwise(F.array().cast("array<string>"))
            .alias("items"),
            F.when(F.col("_rn") == 1, F.col("merged_identifiers"))
            .otherwise(F.array().cast("array<string>"))
            .alias("identifiers"),
            F.when(F.col("_rn") == 1, F.col("thumb_pick.thumbnail")).alias("thumbnail"),
            F.lit(batch_ts).alias("batch_ts"),
        )
    )
    return out
