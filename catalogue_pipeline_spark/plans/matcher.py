"""Incremental matcher: the persistent work-graph service (SURVEY.md §2.8 G1,
§2.3 J7, §2.7 V1/V3) — WorkGraphUpdater.scala:90-193 + WorkGraphStore.

State table (lake, bucketed by work_id):
    (work_id, version, batch_seq, candidates array<string>,
     suppressed string, component, subgraph_id)

Two DIFFERENT groupings per reference semantics (WorkGraphUpdater.scala:
152-170 comment):

  * ``component``    — true connectivity over UNSUPPRESSED candidate edges;
                       what the merger folds (suppressed endpoints break
                       matching, WorkGraphUpdater.scala:117-134).
  * ``subgraph_id``  — one shared id over the WHOLE update closure,
                       suppression-blind, "so that when we recombine the
                       graph, we can still match across the C->D edge" —
                       i.e. the lookup overlay that keeps split/suppressed
                       neighbours discoverable for future updates.

Candidate ids that don't exist yet become PLACEHOLDER rows (version = -1,
the analog of WorkNode(sourceWork = None)); they join components so the real
work links up the moment it arrives, and are dropped from merger-facing
results (A3 "drop placeholder nodes", WorkMatcher.scala:176-198).

Per batch of updated works:
  1. V1 version gate — reject if stored version strictly newer; same version
     accepted ("last write wins… so the graph can re-form").
  2. J7 affected expansion — load every work whose subgraph_id intersects
     the updated works + their candidates; everything else untouched.
  3. Recompute BOTH groupings over the affected region only.
  4. V3 — if nothing changed, commit nothing.

The matcher's optimistic locking (V4) is replaced by single-writer batch
semantics + the lake's commit CAS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..lake.table import LakeTable, bucket_expr
from ..operators.components import connected_components

MATCHER_STATE_SCHEMA = StructType(
    [
        StructField("work_id", StringType(), False),
        StructField("version", IntegerType(), False),  # -1 = placeholder
        StructField("batch_seq", IntegerType(), False),
        StructField("candidates", ArrayType(StringType()), False),
        StructField("suppressed", StringType(), False),  # "true"/"false"
        StructField("component", StringType(), False),
        StructField("subgraph_id", StringType(), False),
    ]
)

STATE_COLS = [f.name for f in MATCHER_STATE_SCHEMA.fields]
WORK_COLS = ["work_id", "version", "batch_seq", "candidates", "suppressed"]


def create_matcher_table(path: str, num_buckets: int = 16) -> LakeTable:
    return LakeTable.create(
        path, MATCHER_STATE_SCHEMA, bucket_key="work_id", num_buckets=num_buckets
    )


def matcher_result(state_region: DataFrame) -> DataFrame:
    """MatcherResult: per component, the sorted (work_id, version) members,
    placeholders dropped (WorkMatcher.scala:176-198)."""
    return (
        state_region.filter(F.col("version") >= 0)
        .groupBy("component", "subgraph_id")
        .agg(F.array_sort(F.collect_list(F.struct("work_id", "version"))).alias("works"))
    )


DRIVER_REGION_MAX = 200_000


def read_matcher_state(
    spark: SparkSession, table: LakeTable, snapshot_id: int | None = None
) -> DataFrame:
    """MOR-aware matcher state: when delta files are present (a
    ``write_mode='delta'`` ingest), resolve to the latest written row per
    work_id — every row of a delta batch carries that batch's
    ``batch_seq``, so (batch_seq, version) descending picks the newest
    labels. With no deltas (the COW default) this is a plain read with
    zero added cost (the check is metadata-only).

    Split read (round-7 verdict item 1 — change-proportional reads): the
    latest-batch-wins window shuffles whatever it is given, so it runs ONLY
    over the delta-carrying buckets (bounded by the compaction cadence);
    clean base buckets hold one row per work_id by construction and union
    through with no exchange. A work_id hashes to exactly one bucket, so
    this equals the full-table window row-for-row."""
    dbuckets = table.delta_buckets(snapshot_id)
    if not dbuckets:
        return table.read(spark, snapshot_id=snapshot_id)
    clean = sorted(
        {f["bucket"] for f in table.snapshot(snapshot_id).files} - set(dbuckets)
    )
    dirty = _resolve_latest(table.read(spark, snapshot_id=snapshot_id, buckets=dbuckets))
    if not clean:
        return dirty
    return table.read(spark, snapshot_id=snapshot_id, buckets=clean).unionByName(dirty)


def _resolve_latest(raw: DataFrame) -> DataFrame:
    """Latest-batch-wins per work_id over a base+delta row mix.

    Determinism contract: ``(batch_seq desc, version desc)`` is a total
    order per work_id because batch_seq is UNIQUE-MONOTONIC per applied
    batch — a hard single-writer invariant of the matcher loop (the lake
    commit CAS rejects a second writer, and a failed-commit retry re-sends
    the SAME batch content under a new changeset, never a reused batch_seq
    with different rows). Two rows with equal (work_id, batch_seq) can
    therefore only be byte-identical re-appends, for which either pick is
    the same row."""
    w = Window.partitionBy("work_id").orderBy(
        F.col("batch_seq").desc(), F.col("version").desc()
    )
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def compact_matcher(
    spark: SparkSession, table: LakeTable, changeset_id: str = "matcher-compact"
) -> int | None:
    """Fold merge-on-read matcher deltas into base files — only the
    delta-carrying buckets are rewritten (the cdc.merge.compact cadence,
    applied to the matcher table). Returns the new snapshot id, or None
    when there is nothing to fold."""
    dbuckets = table.delta_buckets()
    if not dbuckets:
        return None
    # read + resolve ONLY the delta-carrying buckets (the split-read fast
    # path) — the previous full-state read + post-hoc bucket filter paid a
    # corpus-proportional window to rewrite a delta-bounded bucket set
    rows = _resolve_latest(table.read(spark, buckets=dbuckets))
    snap = table.overwrite_buckets(
        rows,
        buckets=dbuckets,
        changeset_id=changeset_id,
        summary={"operation": "matcher-compact"},
        sort_cols=["work_id"],
    )
    return snap.snapshot_id


def update_graph(
    spark: SparkSession,
    table: LakeTable,
    updates: DataFrame,
    batch_seq: int,
    changeset_id: str,
    driver_region_max: int = DRIVER_REGION_MAX,
    write_mode: str = "cow",
) -> tuple[int | None, DataFrame]:
    """Apply one batch of work updates; returns (snapshot_id | None,
    matcher_result over the affected region). snapshot_id None = V3 no-op.

    ``updates`` columns: work_id, version int, candidates array<string>,
    suppressed boolean.

    ``write_mode``: ``'cow'`` (default) copy-on-write replaces every
    affected bucket — read-optimized, but k uniformly-hashed changed
    works touch min(k, num_buckets) buckets, so the per-window write cost
    carries a min(1, k/B)·corpus byte term (the round-7 window-soak
    finding). ``'delta'`` appends ONLY the recomputed region as
    merge-on-read delta files — change-proportional bytes per window, the
    same trade the CDC ingest path makes — with reads resolving
    latest-batch-wins per work_id (``read_matcher_state``) until
    ``compact_matcher`` folds the deltas on cadence. Delta rows are all
    stamped with this batch's ``batch_seq`` (the resolution key: one row
    per work_id per batch, later batches outrank earlier ones). The V1
    version gate is unchanged — an incoming update always carries the
    newest batch_seq, so equal-version re-sends still win exactly as in
    COW mode (WorkGraphUpdater.scala:44-78).

    Operating rule (SCALE.md round 8; measured terms from the round-7/8
    window soaks): per window, COW writes min(1, k/B)·corpus bytes (k =
    changed works, B = buckets) while delta writes ~|region| bytes
    (measured flat ~2.85 MB/window at constant 33k-work change) plus a
    read-side resolve bounded by the delta buckets accumulated since the
    last compaction. COW is the better default only while the corpus is
    small enough that min(1, k/B)·corpus ≲ |region| — i.e. corpus ≲
    region·B/k — or when reads vastly outnumber writes and zero read
    overhead matters. Past that crossover (any production-size corpus
    under a steady change stream), run delta with compaction cadence c
    chosen so c·k/B stays ≪ 1 (deltas confined to a bucket subset keeps
    the split-read exchange change-proportional).
    """
    state = read_matcher_state(spark, table)

    up = updates.select(
        "work_id",
        F.col("version").cast("int").alias("version"),
        F.lit(batch_seq).cast("int").alias("batch_seq"),
        F.coalesce(F.col("candidates"), F.array().cast("array<string>")).alias("candidates"),
        F.when(F.col("suppressed"), F.lit("true")).otherwise(F.lit("false")).alias("suppressed"),
    )

    # --- V1 version gate (placeholders, version -1, never win) -------------
    gated = (
        up.alias("u")
        .join(state.alias("s"), on="work_id", how="left")
        .filter(
            F.col("s.version").isNull()
            | (F.struct("u.version", "u.batch_seq") >= F.struct("s.version", "s.batch_seq"))
        )
        .select("work_id", "u.version", "u.batch_seq", "u.candidates", "u.suppressed")
    )

    # --- J7 affected expansion by subgraph_id -------------------------------
    touched_ids = (
        gated.select(F.col("work_id").alias("id"))
        .union(gated.select(F.explode("candidates").alias("id")))
        .distinct()
    )
    touched_sgs = (
        state.join(touched_ids, state.work_id == touched_ids.id, "left_semi")
        .select("subgraph_id")
        .distinct()
    )
    region_old = state.join(touched_sgs, on="subgraph_id", how="left_semi")

    # region works: gated updates override stored rows
    merged = (
        region_old.select(*WORK_COLS)
        .join(gated.select("work_id"), on="work_id", how="left_anti")
        .unionByName(gated)
    )
    # placeholders for candidates that have no row anywhere yet
    cand_ids = merged.select(F.explode("candidates").alias("work_id")).distinct()
    placeholders = (
        cand_ids.join(merged.select("work_id"), on="work_id", how="left_anti")
        .join(state.select("work_id"), on="work_id", how="left_anti")
        .select(
            "work_id",
            F.lit(-1).alias("version"),
            F.lit(batch_seq).alias("batch_seq"),
            F.array().cast("array<string>").alias("candidates"),
            F.lit("false").alias("suppressed"),
        )
    )
    nodes = merged.unionByName(placeholders)

    # --- both groupings over the affected region ----------------------------
    # The reference loads the affected subgraph into memory and runs scalax's
    # componentTraverser on it (WorkGraphStore → WorkGraphUpdater) — regions
    # are update-neighbourhood-sized by construction. We do the same with a
    # union-find under a size threshold, and fall back to distributed
    # min-label propagation for pathological regions.
    # Size-check BEFORE collecting: limit(max+1).count() touches at most
    # max+1 rows, so a pathological region (one viral merge-candidate hub)
    # routes to the distributed fallback instead of OOMing the driver.
    region_nodes = nodes.select("work_id", "candidates", "suppressed")
    probe = region_nodes.limit(driver_region_max + 1).count()
    if probe <= driver_region_max:
        region_rows = region_nodes.collect()
        old_sg_rows = region_old.select("work_id", "subgraph_id").collect()
        labels_df = spark.createDataFrame(
            _region_labels(region_rows, old_sg_rows),
            "work_id string, component string, subgraph_id string",
        )
    else:  # distributed fallback for giant regions
        sup = nodes.select(F.col("work_id").alias("dst"), F.col("suppressed").alias("dsup"))
        raw_edges = nodes.select(
            F.col("work_id").alias("src"),
            F.explode("candidates").alias("dst"),
            F.col("suppressed").alias("ssup"),
        )
        unsup_edges = (
            raw_edges.join(sup, on="dst", how="left")
            .filter(
                (F.col("ssup") == "false")
                & (F.coalesce(F.col("dsup"), F.lit("false")) == "false")
            )
            .select("src", "dst")
        )
        self_edges = nodes.select(F.col("work_id").alias("src"), F.col("work_id").alias("dst"))
        comp_labels = connected_components(
            unsup_edges.unionByName(self_edges)
        ).withColumnRenamed("id", "work_id")
        old_sg_edges = region_old.select(
            F.col("work_id").alias("src"), F.concat(F.lit("sg:"), "subgraph_id").alias("dst")
        )
        sub_edges = raw_edges.select("src", "dst").unionByName(self_edges).unionByName(old_sg_edges)
        sg_groups = connected_components(sub_edges).filter(~F.col("id").startswith("sg:"))
        sg_digest = sg_groups.groupBy("component").agg(
            F.sha2(F.concat_ws("+", F.array_sort(F.collect_set("id"))), 256).alias("subgraph_id")
        )
        sg_labels = sg_groups.join(sg_digest, on="component").select(
            F.col("id").alias("work_id"), "subgraph_id"
        )
        labels_df = comp_labels.join(sg_labels, on="work_id")

    new_state = nodes.join(labels_df, on="work_id").select(*STATE_COLS)

    # --- V3 skip-write when nothing changed ---------------------------------
    old_cols = region_old.select(*STATE_COLS)
    changed = (
        new_state.exceptAll(old_cols).limit(1).count() > 0
        or old_cols.exceptAll(new_state).limit(1).count() > 0
    )
    result = matcher_result(new_state)
    if not changed:
        return None, result

    if write_mode == "delta":
        # merge-on-read: append just the recomputed region, stamped with
        # this batch's seq so reads resolve latest-batch-wins — bytes
        # written scale with the CHANGE, never the corpus
        snap = table.append(
            new_state.withColumn(
                "batch_seq", F.lit(batch_seq).cast("int")
            ).select(*STATE_COLS),
            changeset_id=changeset_id,
            summary={
                "operation": "matcher-update",
                "mode": "delta",
                "batch_seq": batch_seq,
            },
            sort_cols=["work_id"],
            kind="delta",
        )
        return snap.snapshot_id, result

    # copy-on-write only the buckets holding affected rows
    nb = table.num_buckets
    region_ids = new_state.select("work_id").union(region_old.select("work_id"))
    affected_buckets = sorted(
        r["_b"]
        for r in region_ids.select(bucket_expr("work_id", nb).alias("_b")).distinct().collect()
    )
    keep = state.join(touched_sgs, on="subgraph_id", how="left_anti").select(*STATE_COLS)
    rows_to_write = new_state.unionByName(
        keep.filter(bucket_expr("work_id", nb).isin(affected_buckets))
    )
    snap = table.overwrite_buckets(
        rows_to_write,
        buckets=affected_buckets,
        changeset_id=changeset_id,
        summary={"operation": "matcher-update", "batch_seq": batch_seq},
        sort_cols=["work_id"],
    )
    return snap.snapshot_id, result


def _region_labels(region_rows, old_sg_rows):
    """Driver-side grouping of one affected region (the reference's in-memory
    componentTraverser). Returns [(work_id, component, subgraph_id)]."""
    import hashlib

    parent_c: dict[str, str] = {}
    parent_s: dict[str, str] = {}

    def find(p, x):
        p.setdefault(x, x)
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(p, a, b):
        ra, rb = find(p, a), find(p, b)
        if ra != rb:
            p[max(ra, rb)] = min(ra, rb)

    suppressed = {}
    ids = []
    for r in region_rows:
        ids.append(r["work_id"])
        suppressed[r["work_id"]] = r["suppressed"] == "true"
        find(parent_c, r["work_id"])
        find(parent_s, r["work_id"])
    for r in region_rows:
        for dst in r["candidates"]:
            union(parent_s, r["work_id"], dst)  # subgraphs: suppression-blind
            if not suppressed.get(r["work_id"], False) and not suppressed.get(dst, False):
                union(parent_c, r["work_id"], dst)
    # old subgraph co-membership keeps split graphs rejoinable
    by_old_sg: dict[str, list[str]] = {}
    for r in old_sg_rows:
        by_old_sg.setdefault(r["subgraph_id"], []).append(r["work_id"])
    for members in by_old_sg.values():
        for m in members[1:]:
            union(parent_s, members[0], m)

    sg_members: dict[str, list[str]] = {}
    for i in set(ids) | set(parent_s):
        sg_members.setdefault(find(parent_s, i), []).append(i)
    sg_digest = {
        root: hashlib.sha256("+".join(sorted(ms)).encode()).hexdigest()
        for root, ms in sg_members.items()
    }
    out = []
    for i in sorted(set(ids)):
        out.append((i, find(parent_c, i), sg_digest[find(parent_s, i)]))
    return out
