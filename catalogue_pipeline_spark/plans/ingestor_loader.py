"""Ingestor loader/indexer bookkeeping: shard manifests, path grammar,
and the bulk-error triage — the pre-shard pagination the ingestors run
between document building and indexing.

Reference: ``catalogue_graph/src/ingestor/transformers/base_transformer.py``
(:28 ``S3_BATCH_SIZE = 10_000``; :62-69 transform stream; :70-71 fixed-size
batching; :107-146 ``load_documents`` — per-batch file naming
``{start:08d}-{end:08d}``, jsonl byte accounting via ``f.tell()``, one
``IngestorIndexerObject(s3_uri, content_length, record_count)`` per file),
``ingestor/steps/ingestor_loader.py:46-88`` (the loader report totals:
``sum(record_count)`` / ``sum(content_length)``),
``ingestor/steps/ingestor_indexer.py:45-55`` (benign ``external_gte``
version-conflict triage), ``:57-84`` (re-deriving the object list from an
S3 listing — range suffix parse, ``record_count = end - start``),
``models/events.py:64-96`` + ``ingestor/models/step_events.py:20-52``
(the shared S3 path-prefix grammar: ``graph-*/pipeline-*/
ingestor_{type}/index-{date}/{windows/...|by_id/...|full}[/job-...]``),
``models/incremental_window.py:57-67`` (window path format),
``models/source_scope.py:73-85`` (ids path segment, hash over 5 ids).

Spark-first shape: the reference streams documents sequentially through a
single process, so "global offset" is free there.  Here the shard
assignment is distributed: ``repartitionByRange`` gives contiguous,
ordered key ranges per partition; per-partition counts (one tiny frame,
bounded by the partition count) yield cumulative start offsets; a
partition-local ``row_number`` window finishes the global 0-based rank
without ever sorting the corpus on a single reducer.  The manifest is one
``groupBy(shard)`` over pre-aggregated ranks — change-proportional, no
driver loop over batches.
"""

from __future__ import annotations

import hashlib
from datetime import datetime
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# base_transformer.py:28
S3_BATCH_SIZE = 10_000
# config.py:22 (INGESTOR_S3_PREFIX default)
INGESTOR_S3_PREFIX = "ingestor"


# --------------------------------------------------------------------------
# path grammar (driver-coordinated strings, like the CALM / Wikidata
# grammars: plain Python)
# --------------------------------------------------------------------------


def format_window(start: datetime, end: datetime) -> str:
    """``IncrementalWindow.to_formatted_string`` (:57-60)."""
    return f"{start.strftime('%Y%m%dT%H%M')}-{end.strftime('%Y%m%dT%H%M')}"


def parse_window(s: str) -> tuple[datetime, datetime]:
    """``IncrementalWindow.from_formatted_string`` (:62-67)."""
    start_str, end_str = s.split("-")
    return (
        datetime.strptime(start_str, "%Y%m%dT%H%M"),
        datetime.strptime(end_str, "%Y%m%dT%H%M"),
    )


def ids_path_segment(ids: Sequence[str]) -> str:
    """Compact path-safe id-scope segment (source_scope.py:73-85): short
    lists join sorted with ``_``; >5 ids hash to ``hash_{sha256[:12]}``."""
    if not ids:
        raise ValueError("ids_path_segment is only valid in `id` mode")
    joined_ids = "_".join(sorted(ids))
    if len(ids) <= 5:
        return joined_ids
    return f"hash_{hashlib.sha256(joined_ids.encode()).hexdigest()[:12]}"


def path_prefix(
    ingestor_type: str,
    pipeline_date: str,
    *,
    graph_date: str | None = None,
    index_date: str | None = None,
    job_id: str | None = None,
    window: tuple[datetime, datetime] | None = None,
    ids: Sequence[str] | None = None,
) -> str:
    """The shared run-output prefix (events.py:64-96 + step_events.py:26-47).

    ``graph-{graph_date|prod}/pipeline-{pipeline_date}/ingestor_{type}/
    index-{index_date|pipeline_date}/`` then the run scope —
    ``windows/{win}`` | ``by_id/{ids}`` | ``full`` — and, only when
    neither window nor ids scope the run, ``job-{job_id}``
    (step_events.py:44-45: incremental windows are already unique keys;
    full reindexes need the timestamped job segment)."""
    parts = [
        f"graph-{graph_date or 'prod'}",
        f"pipeline-{pipeline_date}",
        f"{INGESTOR_S3_PREFIX}_{ingestor_type}",
        f"index-{index_date or pipeline_date}",
    ]
    if window is not None:
        parts += ["windows", format_window(*window)]
    elif ids:
        parts += ["by_id", ids_path_segment(ids)]
    else:
        parts.append("full")
        if job_id is not None:
            parts.append(f"job-{job_id}")
    return "/".join(parts)


def shard_file_name(start: Column, end: Column) -> Column:
    """``{start:08d}-{end:08d}`` (base_transformer.py:121)."""
    return F.concat(
        F.lpad(start.cast("string"), 8, "0"),
        F.lit("-"),
        F.lpad(end.cast("string"), 8, "0"),
    )


# --------------------------------------------------------------------------
# shard manifest
# --------------------------------------------------------------------------


def global_offsets(
    docs: DataFrame, order_col: str, *, offset_name: str = "_rn0"
) -> DataFrame:
    """Attach a 0-based global rank by ``order_col`` WITHOUT a global
    single-reducer sort: range-repartition (contiguous ordered key ranges
    per partition), per-partition local rank, plus a broadcast cumulative
    count per partition.  ``order_col`` should be unique (a document id);
    ties make the rank assignment among tied rows nondeterministic.
    """
    n_part = docs.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = docs.repartitionByRange(int(n_part), F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Pin ONE physical partitioning for both consumers below: range
    # boundaries come from sampling, so if the per-partition counts and the
    # local ranks evaluated `ranged` through two independently-planned
    # subtrees (exchange reuse off, AQE replan), they could see different
    # partitionings and emit duplicate/skipped global offsets. The lazy
    # localCheckpoint materializes the ranged layout once and both branches
    # read the same RDD.
    ranged = ranged.localCheckpoint(eager=False)
    # tiny frame: one row per partition — the single-reducer window over
    # it is bounded by the partition count, never by the data
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    offsets = counts.select(
        "_pid",
        (
            F.sum("_cnt").over(
                Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("_off"),
    ).fillna({"_off": 0})
    local = F.row_number().over(
        Window.partitionBy("_pid").orderBy(order_col)
    )
    return (
        ranged.withColumn("_lrn", local)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(offset_name, (F.col("_off") + F.col("_lrn") - 1).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def shard_plan(
    docs: DataFrame,
    *,
    order_col: str = "id",
    batch_size: int = S3_BATCH_SIZE,
    payload_col: str | None = None,
    prefix: str | None = None,
    load_format: str = "jsonl",
) -> DataFrame:
    """One row per output file, exactly the objects ``load_documents``
    accumulates (base_transformer.py:107-146): ``shard_index``,
    ``file_name`` (``{start:08d}-{end:08d}``), ``start_offset``,
    ``end_offset``, ``record_count``, ``content_length`` (jsonl bytes:
    per-doc payload + newline — the reference's ``f.tell()`` — when
    ``payload_col`` is given, else null), and ``uri`` when ``prefix``
    is given (step_events.py:49-52).
    """
    ranked = global_offsets(docs, order_col)
    shard = (F.col("_rn0") / batch_size).cast("long")
    bytes_expr = (
        (F.octet_length(F.col(payload_col)) + F.lit(1)).cast("long")
        if payload_col is not None
        else F.lit(None).cast("long")
    )
    plan = (
        ranked.select(shard.alias("shard_index"), F.col("_rn0"), bytes_expr.alias("_b"))
        .groupBy("shard_index")
        .agg(
            F.min("_rn0").alias("start_offset"),
            (F.max("_rn0") + 1).alias("end_offset"),
            F.count("*").alias("record_count"),
            F.sum("_b").alias("content_length"),
        )
        .withColumn(
            "file_name", shard_file_name(F.col("start_offset"), F.col("end_offset"))
        )
    )
    if prefix is not None:
        plan = plan.withColumn(
            "uri",
            F.concat(
                F.lit(f"{prefix}/"), F.col("file_name"), F.lit(f".{load_format}")
            ),
        )
    return plan


def loader_report(shards: DataFrame) -> DataFrame:
    """The loader step report (ingestor_loader.py:70-78): total record
    count and total file size across the run's objects."""
    return shards.agg(
        F.count("*").alias("n_objects"),
        F.coalesce(F.sum("record_count"), F.lit(0)).alias("record_count"),
        F.coalesce(F.sum("content_length"), F.lit(0)).alias("total_file_size"),
    )


def write_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    *,
    order_col: str = "id",
    payload_col: str = "payload",
    batch_size: int = S3_BATCH_SIZE,
) -> DataFrame:
    """Materialize the shards as local jsonl files — one file per shard,
    rows in ``order_col`` order, named ``{start:08d}-{end:08d}.jsonl`` —
    and return the measured manifest (byte length from the filesystem,
    the reference's ``f.tell()``).  Executor-side writes via
    ``applyInPandas`` keyed on the shard index; no driver loop."""
    import os

    ranked = global_offsets(docs, order_col).select(
        ((F.col("_rn0") / batch_size).cast("long")).alias("shard_index"),
        F.col("_rn0"),
        F.col(payload_col).alias("_payload"),
    )

    def _write(pdf):
        import pandas as pd

        pdf = pdf.sort_values("_rn0")
        start, end = int(pdf["_rn0"].min()), int(pdf["_rn0"].max()) + 1
        name = f"{start:08d}-{end:08d}.jsonl"
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            for p in pdf["_payload"]:
                f.write(p.encode("utf-8") + b"\n")
            content_length = f.tell()
        return pd.DataFrame(
            {
                "shard_index": [int(pdf["shard_index"].iloc[0])],
                "file_name": [name[: -len(".jsonl")]],
                "start_offset": [start],
                "end_offset": [end],
                "record_count": [len(pdf)],
                "content_length": [content_length],
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    return ranked.groupBy("shard_index").applyInPandas(
        _write,
        "shard_index long, file_name string, start_offset long, end_offset long, "
        "record_count long, content_length long",
    )


# --------------------------------------------------------------------------
# indexer side
# --------------------------------------------------------------------------


def objects_from_listing(
    listing: DataFrame,
    *,
    load_format: str = "parquet",
    key_col: str = "key",
    size_col: str = "size",
    bucket: str | None = None,
) -> DataFrame:
    """Re-derive the object list from a storage listing when the loader
    didn't pass it through (ingestor_indexer.py:57-84): keep only keys
    with the run's format suffix, parse the ``{start}-{end}`` range from
    the final path segment, and take ``record_count = end - start`` —
    from the NAME, not the content (the loader's naming invariant is the
    contract).  ``content_length`` is the listed object size."""
    base = F.element_at(F.split(F.col(key_col), "/"), -1)
    stem = F.regexp_replace(base, r"\.[^.]+$", "")
    start = F.split(stem, "-").getItem(0).cast("long")
    end = F.split(stem, "-").getItem(1).cast("long")
    uri = (
        F.concat(F.lit(f"s3://{bucket}/"), F.col(key_col))
        if bucket is not None
        else F.col(key_col)
    )
    return (
        listing.filter(F.col(key_col).endswith(f".{load_format}"))
        .select(
            uri.alias("uri"),
            F.col(size_col).cast("long").alias("content_length"),
            (end - start).alias("record_count"),
            stem.alias("file_name"),
        )
    )


def triage_bulk_errors(errors: DataFrame, *, type_col: str = "error_type") -> DataFrame:
    """Split bulk-index failures into the benign ``external_gte``
    version-conflict class (the document already carries a >= version —
    idempotent replay noise, logged and skipped) and real failures that
    must fail the run (ingestor_indexer.py:45-55,140-162).  One row:
    ``version_conflict_count`` / ``other_error_count``."""
    is_conflict = F.col(type_col) == "version_conflict_engine_exception"
    return errors.agg(
        F.coalesce(F.sum(F.when(is_conflict, 1).otherwise(0)), F.lit(0)).alias(
            "version_conflict_count"
        ),
        F.coalesce(F.sum(F.when(~is_conflict, 1).otherwise(0)), F.lit(0)).alias(
            "other_error_count"
        ),
    )
