"""Catalogue-graph slice: concept extraction + the incremental graph remover.

The reference's catalogue_graph builds a knowledge graph from works: a
transformer extracts concept NODES and work→concept EDGES from each work's
subjects/genres/contributors (graph/transformers/catalogue/
concepts_transformer.py:31-60 — nodes deduped by wellcome id), and a
monthly "graph remover" diffs the ids loaded by the current run against the
previous run's snapshot, deletes the difference from the graph behind a 5%
fractional-change safety gate, logs added/deleted ids with a 1-year
retention, and advances the snapshot (graph/steps/graph_remover.py:25-140,
utils/safety.py:8-23).

Spark-first rendering:

  * concept ids are DETERMINISTIC label-derived canonical ids
    (functions.canonical_id over (type, label) — the reference's
    label-derived identifier path), so extraction is a pure projection and
    re-runs mint identical ids with no coordination;
  * the previous-ids snapshot and the added/deleted logs are lake tables —
    the diff is two anti-joins (no driver-side sets, unlike the reference's
    polars-in-memory sets, so a 10^9-node graph diff still runs);
  * the safety gate is the shared fractional_change_gate (A8);
  * log retention is a filtered rewrite at append time, exactly the
    reference's "remove all IDs older than 1 year".
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from ..functions import canonical_id
from ..lake.table import LakeTable
from ..operators.precedence import fractional_change_gate

SNAPSHOT_SCHEMA = StructType([StructField("id", StringType(), False)])
LOG_SCHEMA = StructType(
    [
        StructField("timestamp", TimestampType(), False),
        StructField("id", StringType(), False),
        StructField("action", StringType(), False),  # added | deleted
    ]
)


def extract_concept_nodes(works: DataFrame) -> DataFrame:
    """Concept nodes from a transformed-works frame: one row per distinct
    (concept_id, type, label) across subjects, genres and contributor
    agents. Dedup-by-id is a distinct, not a driver-side seen-set
    (concepts_transformer.py:33-43)."""
    subj = works.select(
        F.explode("subjects").alias("label"), F.lit("Subject").alias("type")
    )
    genr = works.select(
        F.explode("genres").alias("label"), F.lit("Genre").alias("type")
    )
    # contributor strings serialize as type|label|roles|P-or-S
    contrib = works.select(F.explode("contributors").alias("c")).select(
        F.split("c", r"\|")[1].alias("label"), F.split("c", r"\|")[0].alias("type")
    )
    nodes = subj.unionByName(genr).unionByName(contrib).filter(F.col("label") != "")
    return nodes.select(
        canonical_id(F.col("type"), F.col("label")).alias("concept_id"),
        "type",
        "label",
    ).distinct()


def extract_concept_edges(works: DataFrame, id_col: str = "id") -> DataFrame:
    """work→concept HAS_CONCEPT edges, one per (work, concept, field)."""
    parts = []
    for field, typ in (("subjects", "Subject"), ("genres", "Genre")):
        parts.append(
            works.select(
                F.col(id_col).alias("work_id"), F.explode(field).alias("label")
            ).select(
                "work_id",
                canonical_id(F.lit(typ), F.col("label")).alias("concept_id"),
                F.lit(field).alias("field"),
            )
        )
    contrib = works.select(
        F.col(id_col).alias("work_id"), F.explode("contributors").alias("c")
    ).select(
        "work_id",
        canonical_id(F.split("c", r"\|")[0], F.split("c", r"\|")[1]).alias("concept_id"),
        F.lit("contributors").alias("field"),
    )
    parts.append(contrib)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


@dataclass
class RemoverReport:
    first_run: bool
    n_previous: int
    n_current: int
    n_added: int
    n_deleted: int


def create_remover_state(path: str) -> tuple[LakeTable, LakeTable]:
    snap = LakeTable.create(f"{path}/ids_snapshot", SNAPSHOT_SCHEMA, bucket_key="id", num_buckets=8)
    log = LakeTable.create(f"{path}/ids_log", LOG_SCHEMA, bucket_key="id", num_buckets=8)
    return snap, log


def run_graph_remover(
    spark: SparkSession,
    snapshot_table: LakeTable,
    log_table: LakeTable,
    current_ids: DataFrame,
    now: dt.datetime,
    threshold: float = 0.05,
    force: bool = False,
    retention_days: int = 365,
) -> tuple[RemoverReport, DataFrame]:
    """One remover run: diff current vs the snapshot, gate, log, advance.

    Returns (report, deleted_ids_df) — the caller applies the deletions to
    its downstream store (the reference calls Neptune delete_entities_by_id;
    here deletions typically become tombstones through the merge path).
    First run (empty snapshot): nothing deleted, everything recorded.
    """
    cur = current_ids.select(F.col(current_ids.columns[0]).alias("id")).distinct()
    prev = snapshot_table.read(spark).select("id")
    n_prev, n_cur = prev.count(), cur.count()
    first_run = n_prev == 0

    deleted = prev.join(cur, "id", "left_anti")
    added = cur.join(prev, "id", "left_anti")
    n_deleted = 0 if first_run else deleted.count()
    n_added = 0 if first_run else added.count()

    # the 5% safety valve (safety.py DEFAULT_THRESHOLD; A8)
    fractional_change_gate(n_deleted, n_prev, threshold=threshold, force=force)

    # append added/deleted log rows, pruning entries past retention — the
    # rewrite IS the retention policy (graph_remover.py:79-83). On the first
    # run both sets are empty (graph_remover.py:104-110): the baseline load
    # is not an "addition".
    stamp = F.lit(now).cast("timestamp")
    log_src = (
        deleted.withColumn("action", F.lit("deleted")).unionByName(
            added.withColumn("action", F.lit("added"))
        )
        if not first_run
        else spark.createDataFrame([], "id string, action string")
    )
    new_rows = log_src.select(stamp.alias("timestamp"), "id", "action")
    cutoff = now - dt.timedelta(days=retention_days)
    kept = log_table.read(spark).filter(F.col("timestamp") >= F.lit(cutoff))
    log_table.overwrite_all(
        kept.unionByName(new_rows),
        changeset_id=f"remover-{now:%Y%m%dT%H%M%S}",
        summary={"operation": "remover-log"},
    )

    # advance the ids snapshot to the current run
    snapshot_table.overwrite_all(
        cur,
        changeset_id=f"snapshot-{now:%Y%m%dT%H%M%S}",
        summary={"operation": "ids-snapshot"},
    )
    report = RemoverReport(
        first_run=first_run,
        n_previous=n_prev,
        n_current=n_cur,
        n_added=n_added if not first_run else n_cur,
        n_deleted=n_deleted,
    )
    return report, deleted


def related_concepts(
    edges: DataFrame,
    *,
    source_fields: list[str] | None = None,
    related_fields: list[str] | None = None,
    source_types: list[str] | None = None,
    related_types: list[str] | None = None,
    threshold: int = 3,
    limit: int = 10,
    max_works_per_concept: int = 1000,
) -> DataFrame:
    """Frequently-referenced-together concepts — the ingestor's
    ``get_referenced_together_query`` (catalogue_graph/src/ingestor/queries/
    concept_queries.py:152-182) re-expressed as a DataFrame co-occurrence
    join: per source concept, the top-``limit`` other concepts sharing a
    work, where the shared-work count is >= ``threshold`` (defaults mirror
    CONCEPT_QUERY_PARAMS, base_concepts_extractor.py:26-36:
    related_to_limit=10, shared_works_count_threshold=3).
    ``source_fields``/``related_fields`` are the referenced_in filters
    (e.g. frequent_collaborators = contributors×contributors,
    related_topics = ×subjects).

    Scale shape (the 100 TB reasoning, not incidental):
      * the reference's Cypher caps works per concept (``LIMIT 1000``,
        concept_queries.py:161) to bound supernodes; we apply the same cap
        DETERMINISTICALLY — lowest work_ids win via a rank window — so
        replays are byte-identical.
      * the self-join is keyed on work_id, so blow-up is per-work concept
        count squared (small, ~10s), never per-concept work count (the
        capped, skewed side); the hot-concept skew lands in the groupBy,
        which partial-aggregates map-side.
      * threshold filtering runs BEFORE the per-concept top-N window, so
        the window sees only qualifying pairs.

    Ordering deviation (documented): the reference orders by count DESC
    only, leaving ties engine-defined; we pin (count DESC, related_id ASC).
    """
    from pyspark.sql import Window

    def side(fields, types, cid, wid):
        e = edges
        if fields:
            e = e.filter(F.col("field").isin(*fields))
        if types:
            # referenced_type filter (frequent_collaborators: Person/
            # Organisation × Person/Organisation; related_topics: topical
            # related types only — concept_queries.py:188-210)
            e = e.filter(F.col("referenced_type").isin(*types))
        return e.select(
            F.col("concept_id").alias(cid), F.col("work_id").alias(wid)
        ).distinct()

    src = side(source_fields, source_types, "concept_id", "work_id")
    capped = (
        src.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("concept_id").orderBy("work_id")
            ),
        )
        .filter(F.col("_rk") <= max_works_per_concept)
        .drop("_rk")
    )
    rel = side(related_fields, related_types, "related_id", "work_id")
    counts = (
        capped.join(rel, "work_id")
        .filter(F.col("concept_id") != F.col("related_id"))
        .groupBy("concept_id", "related_id")
        .agg(F.count("*").alias("shared_works"))
        .filter(F.col("shared_works") >= threshold)
    )
    ranked = counts.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("concept_id").orderBy(
                F.col("shared_works").desc(), F.col("related_id")
            )
        ),
    )
    return ranked.filter(F.col("rank") <= limit)


# ---------------------------------------------- HAS_SOURCE_CONCEPT edges
AGENT_TYPES = ("Person", "Agent", "Organisation")
LABEL_MATCH_SOURCES_BY_PRIORITY = ["nlm-mesh", "lc-subjects", "lc-names"]
AMBIGUITY_THRESHOLD = 1
# catalogue/data/concept_label_deny_list.txt (2 entries, public)
CONCEPT_LABEL_DENY_LIST = ["siamese", "consumption"]


def concept_source_edges(concepts: DataFrame, ontology: DataFrame) -> DataFrame:
    """Catalogue-concept → source-concept HAS_SOURCE_CONCEPT edges
    (catalogue/concepts_transformer.py:45-96 + raw_concept.py:29-107 +
    id_label_checker.py:37-160), re-expressed as joins against the
    bulk-loaded ontology instead of driver-side dicts:

      * **label-matched** (``matched_by='label'``): label-derived concepts
        only; normalised (lowercased) label equality against MAIN ontology
        labels first — walking nlm-mesh → lc-subjects → lc-names priority —
        then against alternative labels, where a label matching more than
        AMBIGUITY_THRESHOLD source ids within one source is discarded,
        agents never match mesh/lc-subjects alternatives, non-agents never
        match lc-names alternatives; deny-listed labels never match.
        (Deviation: ties inside one source resolve to MIN(source_id) — the
        reference keeps CSV insertion order, which is not reproducible
        relationally.)
      * **identifier-matched** (``matched_by='identifier'``): the concept's
        own source id must exist in the ontology; MeSH additionally demands
        a source label (main or alternative) be a SUBSTRING of the
        concept's lowercased label, and carries the ``Q\\d+`` qualifier
        split out of the raw value.
      * **weco authority**: an edge to ``weco:<canonical id>`` whenever the
        name authority has a record keyed by this concept's canonical id.

    concepts(concept_id, label, concept_type, source, source_value);
    ontology(id, label, alternative_labels array, source).  Output:
    (concept_id, source_concept_id, matched_by, qualifier).  Every stage
    is an equi-join on a label or id; the ontology side is dimension-sized
    (broadcastable)."""
    norm = F.lower(F.col("label"))
    onto = ontology.select(
        F.col("id").alias("sid"),
        F.lower(F.col("label")).alias("olabel"),
        F.transform(
            F.coalesce("alternative_labels", F.array().cast("array<string>")),
            F.lower,
        ).alias("oalts"),
        F.col("source").alias("osource"),
    )
    pri = F.coalesce(
        *[
            F.when(F.col("osource") == s, F.lit(i))
            for i, s in enumerate(LABEL_MATCH_SOURCES_BY_PRIORITY)
        ]
    )

    # ---- label matching (label-derived concepts only)
    ld = concepts.filter(
        (F.col("source") == "label-derived") & ~norm.isin(*CONCEPT_LABEL_DENY_LIST)
    ).select("concept_id", norm.alias("nlabel"), "concept_type")
    main_lab = onto.filter(pri.isNotNull()).select(
        F.col("olabel").alias("nlabel"), "sid", pri.alias("pri")
    )
    best_main = (
        ld.join(main_lab, "nlabel")
        .groupBy("concept_id")
        .agg(F.min(F.struct("pri", "sid")).alias("m"))
        .select("concept_id", F.col("m.sid").alias("source_concept_id"))
    )
    # alternative labels: per (source, label) ambiguity gate FIRST, then
    # the type gates, then priority election
    alts = (
        onto.filter(pri.isNotNull())
        .select("sid", pri.alias("pri"), F.col("osource"),
                F.explode("oalts").alias("nlabel"))
        .filter(F.col("nlabel") != "")
    )
    alt_uniq = (
        alts.groupBy("osource", "pri", "nlabel")
        .agg(F.count(F.lit(1)).alias("n"), F.min("sid").alias("sid"))
        .filter(F.col("n") <= AMBIGUITY_THRESHOLD)
    )
    is_agent = F.col("concept_type").isin(*AGENT_TYPES)
    alt_match = (
        ld.join(alt_uniq, "nlabel")
        .filter(
            ~(is_agent & F.col("osource").isin("nlm-mesh", "lc-subjects"))
            & ~(~is_agent & (F.col("osource") == "lc-names"))
        )
        .groupBy("concept_id")
        .agg(F.min(F.struct("pri", "sid")).alias("m"))
        .select("concept_id", F.col("m.sid").alias("source_concept_id"))
    )
    label_edges = (
        best_main.withColumn("rank", F.lit(0))
        .unionByName(alt_match.withColumn("rank", F.lit(1)))
        .groupBy("concept_id")
        .agg(F.min(F.struct("rank", "source_concept_id")).alias("m"))
        .select(
            "concept_id",
            F.col("m.source_concept_id").alias("source_concept_id"),
            F.lit("label").alias("matched_by"),
            F.lit(None).cast("string").alias("qualifier"),
        )
    )

    # ---- identifier matching
    qual = F.when(
        F.col("source") == "nlm-mesh",
        F.regexp_extract(F.col("source_value"), "Q\\d+", 0),
    )
    qual = F.when(qual.isNotNull() & (qual != ""), qual)
    sid_val = F.when(
        qual.isNotNull(), F.replace(F.col("source_value"), qual, F.lit(""))
    ).otherwise(F.col("source_value"))
    ided = concepts.filter(
        F.col("source").isin("nlm-mesh", "lc-subjects", "lc-names")
    ).select(
        "concept_id", norm.alias("nlabel"), "source",
        sid_val.alias("sid"), qual.alias("qualifier"),
    )
    id_join = ided.join(
        onto.withColumnsRenamed({"osource": "source"}), ["sid", "source"]
    )
    mesh_ok = F.exists(
        F.concat(F.array(F.col("olabel")), F.col("oalts")),
        lambda lab: (lab != "") & F.col("nlabel").contains(lab),
    )
    id_edges = id_join.filter(
        (F.col("source") != "nlm-mesh") | mesh_ok
    ).select(
        "concept_id",
        F.col("sid").alias("source_concept_id"),
        F.lit("identifier").alias("matched_by"),
        "qualifier",
    )

    # ---- weco authority override
    weco = onto.filter(F.col("osource") == "weco-authority").select(
        F.col("sid").alias("source_concept_id")
    )
    weco_edges = concepts.join(
        weco,
        F.concat(F.lit("weco:"), F.col("concept_id"))
        == weco.source_concept_id,
    ).select(
        "concept_id",
        "source_concept_id",
        F.lit("identifier").alias("matched_by"),
        F.lit(None).cast("string").alias("qualifier"),
    )

    return label_edges.unionByName(id_edges).unionByName(weco_edges)
