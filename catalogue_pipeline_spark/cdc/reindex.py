"""Reindexer — the reference's second transformer trigger, re-expressed as
DataFrame plans over the lake's source tables.

The reference reindexer re-sends source records into a pipeline without a
source-system update: a **complete** reindex fans the whole table out as
hash-disjoint segments (DynamoDB parallel scan), a **partial** reindex
takes the first N records as a smoke test, and a **specific** reindex
multi-gets an explicit id list in 100-id batches.  Reference:

* ``reindexer/scripts/start_reindex.py:26-88,172-180`` — segment sizing
  (~900 records per segment), the three request-parameter generators, the
  Sierra seven-digit id sanity check;
* ``reindex_worker/services/RecordReader.scala:27-44`` — mode dispatch to
  ParallelScanner / MaxRecordsScanner / MultiItemGetter;
* ``reindex_worker/dynamo/ParallelScanner.scala:16-53`` — the
  segment/totalSegments parallel scan contract;
* ``reindex_worker/models/source/ReindexPayload.scala:17-93`` — the six
  per-source payload shapes handed to the transformer;
* ``reindex_worker/services/ReindexWorkerService.scala:28-93`` — job
  config lookup (unknown id fails the run) and the read→payload→send
  chain;
* ``scripts/get_reindex_status.py:104-245`` — the reindex funnel report:
  per-stage document counts with stage-over-stage shrink flags.

Spark-first shape: a "segment" is a hash-residue filter on the id column
(``md5``-derived, the engine's DuckDB-checkable analogue of DynamoDB's
internal hash segmentation) — N segment filters over one table scan are
disjoint and covering by construction, each prunable independently, and
the whole complete-reindex is equally just ``spark.read`` of the table
(segments exist for the reference's Lambda-sized workers; on a cluster the
scan itself is already parallel).  Nothing here collects record data to
the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.precedence import fixed_size_chunks

RECORDS_PER_SEGMENT = 900
SPECIFIC_BATCH_SIZE = 100

REINDEX_SOURCES = ("calm", "mets", "miro", "miro_inventory", "sierra", "tei")


def how_many_segments(
    item_count: int, records_per_segment: int = RECORDS_PER_SEGMENT
) -> int:
    """``start_reindex.how_many_segments`` (:26-48): ceil(count/900) — each
    segment sized so the reference's worker can hold it in memory."""
    return int(math.ceil(item_count / records_per_segment))


def verify_specific_ids(source: str, ids: list[str]) -> None:
    """``start_reindex.verify_specific_ids`` (:172-180): the Sierra table
    keys on bare seven-digit ids; prefixed/check-digit forms (b32725073)
    silently reindex nothing, so fail fast on them."""
    if source == "sierra":
        bad = [i for i in ids if len(i) != 7 or not i.isnumeric()]
        if bad:
            raise ValueError(f"Sierra IDs should be 7-digit numeric IDs, got {bad}")


def plan_reindex_requests(
    spark: SparkSession,
    source: str,
    mode: str,
    *,
    item_count: int | None = None,
    max_records: int | None = None,
    ids: list[str] | None = None,
    records_per_segment: int = RECORDS_PER_SEGMENT,
) -> DataFrame:
    """The request-parameter generators (start_reindex.py:50-88) as one
    frame of reindex requests — ``complete`` yields one row per segment,
    ``partial`` one row carrying ``max_records``, ``specific`` one row per
    100-id batch (the reindexer's per-request id ceiling).  Columns:
    ``(request_id, mode, segment, total_segments, max_records, ids)``."""
    if source not in REINDEX_SOURCES:
        raise ValueError(f"unknown reindex source: {source!r}")
    if mode == "complete":
        if item_count is None:
            raise ValueError("complete reindex needs item_count")
        total = how_many_segments(item_count, records_per_segment)
        base = spark.range(total).select(
            F.col("id").cast("int").alias("segment"),
            F.lit(total).alias("total_segments"),
        )
        return base.select(
            F.concat(F.lit("complete/"), F.col("segment").cast("string")).alias(
                "request_id"
            ),
            F.lit("complete").alias("mode"),
            "segment",
            "total_segments",
            F.lit(None).cast("int").alias("max_records"),
            F.lit(None).cast("array<string>").alias("ids"),
        )
    if mode == "partial":
        if max_records is None:
            raise ValueError("partial reindex needs max_records")
        return spark.range(1).select(
            F.lit("partial/0").alias("request_id"),
            F.lit("partial").alias("mode"),
            F.lit(None).cast("int").alias("segment"),
            F.lit(None).cast("int").alias("total_segments"),
            F.lit(int(max_records)).alias("max_records"),
            F.lit(None).cast("array<string>").alias("ids"),
        )
    if mode == "specific":
        if not ids:
            raise ValueError("specific reindex needs ids")
        verify_specific_ids(source, ids)
        id_df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(ids)], "seq int, record_id string"
        )
        return (
            fixed_size_chunks(id_df, "seq", SPECIFIC_BATCH_SIZE)
            .groupBy("chunk_id")
            .agg(
                F.sort_array(F.collect_list(F.struct("seq", "record_id")))
                .getField("record_id")
                .alias("ids")
            )
            .select(
                F.concat(
                    F.lit("specific/"), F.col("chunk_id").cast("string")
                ).alias("request_id"),
                F.lit("specific").alias("mode"),
                F.lit(None).cast("int").alias("segment"),
                F.lit(None).cast("int").alias("total_segments"),
                F.lit(None).cast("int").alias("max_records"),
                "ids",
            )
        )
    raise ValueError(f"unknown reindex mode: {mode!r}")


def reindex_segment_expr(id_col: Column, total_segments: int) -> Column:
    """Deterministic segment assignment for an id: md5-derived residue mod
    ``total_segments`` — the engine's analogue of DynamoDB's internal hash
    segmentation (ParallelScanner.scala: 'DynamoDB handles the problem of
    dividing up rows between the different workers').  Disjoint and
    covering over any id set by construction."""
    h = F.conv(F.substring(F.md5(id_col), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(int(total_segments))).cast("int")


def read_reindex_records(
    table: DataFrame,
    *,
    mode: str,
    segment: int | None = None,
    total_segments: int | None = None,
    max_records: int | None = None,
    ids: list[str] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """``RecordReader.findRecords`` (RecordReader.scala:27-44): one request
    worth of records.

    * ``complete`` — the segment's residue class of the id hash
      (ParallelScanner);
    * ``partial`` — the first ``max_records`` ids; the reference's
      MaxRecordsScanner takes table order, which DynamoDB leaves
      unspecified — the engine pins id order so the smoke sample is
      deterministic and replayable;
    * ``specific`` — the multi-get (MultiItemGetter): ids present in the
      table; absent ids simply return nothing, like BatchGetItem.
    """
    if mode == "complete":
        return table.filter(
            reindex_segment_expr(F.col(id_col), int(total_segments))
            == int(segment)
        )
    if mode == "partial":
        w = Window.orderBy(id_col)
        return (
            table.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= int(max_records))
            .drop("_rk")
        )
    if mode == "specific":
        return table.filter(F.col(id_col).isin(*list(ids or [])))
    raise ValueError(f"unknown reindex mode: {mode!r}")


def to_source_payload(records: DataFrame, source: str) -> DataFrame:
    """``ReindexPayload.toSourcePayload`` (ReindexPayload.scala:17-93): map
    a source table's rows to the payload shape the transformer consumes.
    Expected input columns per source (mirroring the table schemas the
    worker scans):

    * calm — ``id, payload (s3 struct), version, is_deleted`` (absent flag
      defaults False, like the case-class default);
    * mets — ``id, payload_kind ('MetsFileWithImages'|'DeletedMetsFile'),
      payload, version`` (the tagged-union wrapper key in Dynamo);
    * miro — ``id, is_cleared_for_catalogue_api, location, events,
      overrides, version`` (events default empty, overrides None);
    * miro_inventory — ``id, location, version``;
    * sierra / tei — ``id, payload, version``.

    Output: ``(id, version, payload struct, source)`` rows; the payload
    struct carries the per-source fields so downstream consumers keep the
    reference's shape.
    """
    if source == "calm":
        body = F.struct(
            F.col("payload").alias("location"),
            F.coalesce(F.col("is_deleted"), F.lit(False)).alias("isDeleted"),
        )
    elif source == "mets":
        body = F.struct(
            F.col("payload_kind").alias("kind"),
            F.col("payload").alias("sourceData"),
        )
    elif source == "miro":
        body = F.struct(
            F.col("is_cleared_for_catalogue_api").alias(
                "isClearedForCatalogueAPI"
            ),
            F.col("location").alias("location"),
            F.coalesce(F.col("events"), F.array().cast("array<string>")).alias(
                "events"
            ),
            F.col("overrides").alias("overrides"),
        )
    elif source == "miro_inventory":
        body = F.struct(F.col("location").alias("location"))
    elif source in ("sierra", "tei"):
        body = F.struct(F.col("payload").alias("location"))
    else:
        raise ValueError(f"unknown reindex source: {source!r}")
    return records.select(
        "id",
        "version",
        body.alias("payload"),
        F.lit(source).alias("source"),
    )


def run_reindex_requests(
    table: DataFrame,
    requests: DataFrame,
    source: str,
    *,
    id_col: str = "id",
) -> DataFrame:
    """The worker loop (ReindexWorkerService.scala:28-57) over a whole
    request frame at once: records per request, tagged with the request id
    so each bulk send is reconstructible.  Complete-mode requests become
    one segment-residue join against the table (a single scan serves every
    segment); specific-mode requests explode their id batches into an
    equi-join; partial mode delegates to the deterministic first-N read."""
    modes = {r["mode"] for r in requests.select("mode").distinct().collect()}
    out = []
    if "complete" in modes:
        seg = requests.filter(F.col("mode") == "complete").select(
            "request_id", "segment", "total_segments"
        )
        totals = [
            r[0]
            for r in seg.select("total_segments").distinct().collect()
        ]
        if len(totals) != 1:
            # mixed totals would silently mis-bucket: segment residues
            # are only disjoint+covering for one modulus per scan
            raise ValueError(
                "complete-mode requests must share one total_segments, "
                f"got {sorted(totals)}"
            )
        total = totals[0]
        tagged = table.withColumn(
            "segment", reindex_segment_expr(F.col(id_col), int(total))
        )
        out.append(tagged.join(F.broadcast(seg), "segment").drop(
            "segment", "total_segments"
        ))
    if "specific" in modes:
        wanted = (
            requests.filter(F.col("mode") == "specific")
            .select("request_id", F.explode("ids").alias(id_col))
        )
        out.append(table.join(F.broadcast(wanted), id_col))
    if "partial" in modes:
        prows = (
            requests.filter(F.col("mode") == "partial")
            .select("request_id", "max_records")
            .collect()
        )
        if len(prows) != 1:
            # two partial requests cannot share one deterministic
            # first-N read; the reference submits at most one
            raise ValueError(
                f"expected exactly one partial-mode request, got {len(prows)}"
            )
        out.append(
            read_reindex_records(
                table,
                mode="partial",
                max_records=prows[0]["max_records"],
                id_col=id_col,
            ).withColumn("request_id", F.lit(prows[0]["request_id"]))
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def funnel_report(stage_counts: DataFrame) -> DataFrame:
    """``get_reindex_status`` funnel (:213-233): per-stage counts in
    pipeline order with the stage-over-stage shrink flagged (a later stage
    holding fewer documents than the one before it means records fell out
    of the pipeline).  Input: ``(pipeline, stage_order, stage, count)``;
    output adds ``drop`` — the shrink vs the previous stage, NULL when the
    stage grew or held steady (growth is normal: the TOTAL source line
    feeds several per-source indexes)."""
    w = Window.partitionBy("pipeline").orderBy("stage_order")
    prev = F.lag("count").over(w)
    return stage_counts.select(
        "pipeline",
        "stage_order",
        "stage",
        "count",
        F.when(prev > F.col("count"), prev - F.col("count")).alias("drop"),
    )
