"""Catalogue→graph WORK-side transformers + the work-hierarchy queries.

Reference behavior reproduced (catalogue_graph/src/…):

* ``graph/transformers/catalogue/raw_work.py:23-139`` — work node
  properties (Standard→Work type mapping, label/reference number/raw
  collection path) and the PATH-IDENTIFIER derivation: a work whose raw
  collection path exactly equals one of its own identifier values keeps
  the FULL path as its identifier (the Calm RefNo case) with the parent
  being the path minus its last fragment; every other work's identifier
  is the path's LAST fragment with the second-to-last as parent (the
  Sierra 773/774-style incomplete path).  Trailing slashes stripped.
* ``graph/transformers/catalogue/work_identifiers_transformer.py:57-84``
  — PathIdentifier nodes, WorkHasPathIdentifier and
  PathIdentifierHasParent edges (one parent edge per work).
* ``graph/sources/catalogue/concepts_source.py:17-53`` +
  ``graph/transformers/catalogue/raw_work.py:52-70`` — HAS_CONCEPT
  edges: subjects (with the single-matching-concept type promotion),
  contributor agents, FIRST genre concept only; identified concepts
  only; per-work first-seen dedup.
* ``ingestor/queries/work_queries.py`` — WORK_ANCESTORS (HAS_PARENT*
  walk, hops ascending, parts = child-identifier count of the ancestor
  identifier) and WORK_CHILDREN (one hop down, parts = grandchild
  identifier count).

Spark-first: the HAS_PARENT* closure is hop-doubling over the DISTINCT
single-hop edge set (log2(max_depth) self-joins, each an equi-join on the
identifier id — archival hierarchies are shallow so the closure size is
~depth × identifiers, never quadratic).  Everything else is narrow maps
plus identifier-keyed equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _node_type():
    # raw_work.py:33-40 — 'Standard' renders as 'Work' in the graph
    return F.when(F.col("work_type") == "Standard", F.lit("Work")).otherwise(
        F.col("work_type")
    )


def work_nodes(works: DataFrame) -> DataFrame:
    """Graph work nodes from VISIBLE works (works_transformer.py:39-49 +
    raw_work.py:23-50)."""
    return works.filter(F.col("type") == "Visible").select(
        F.col("work_id").alias("id"),
        F.coalesce(F.col("title"), F.lit("")).alias("label"),
        F.col("alternative_titles").alias("alternative_labels"),
        _node_type().alias("node_type"),
        F.col("reference_number"),
        F.col("collection_path.path").alias("collection_path"),
        F.col("collection_path.label").alias("collection_path_label"),
    )


def work_concept_edges(works: DataFrame) -> DataFrame:
    """(work_id, concept_id, referenced_in, referenced_type) HAS_CONCEPT
    edges — concepts_source.py:17-53: subjects with the type promotion
    for simple subjects whose single nested concept IS the subject,
    contributor agents, the FIRST concept of each genre; only concepts
    with a canonical id; first reference per (work, concept) wins
    (raw_work.py:53-68 processed-set)."""
    subj_type = lambda s: F.when(  # noqa: E731
        (F.size(s.getField("concepts")) == 1)
        & (
            F.element_at(s.getField("concepts"), 1).getField("concept_id")
            == s.getField("concept_id")
        ),
        F.element_at(s.getField("concepts"), 1).getField("concept_type"),
    ).otherwise(F.lit("Subject"))
    refs = F.concat(
        F.transform(
            F.col("subjects"),
            lambda s: F.struct(
                s.getField("concept_id").alias("concept_id"),
                F.lit("subjects").alias("referenced_in"),
                subj_type(s).alias("referenced_type"),
            ),
        ),
        F.transform(
            F.col("contributors"),
            lambda c: F.struct(
                c.getField("agent").getField("concept_id").alias("concept_id"),
                F.lit("contributors").alias("referenced_in"),
                c.getField("agent").getField("concept_type").alias("referenced_type"),
            ),
        ),
        F.transform(
            F.filter(F.col("genres"), lambda g: F.size(g.getField("concepts")) > 0),
            lambda g: F.struct(
                F.element_at(g.getField("concepts"), 1)
                .getField("concept_id")
                .alias("concept_id"),
                F.lit("genres").alias("referenced_in"),
                F.element_at(g.getField("concepts"), 1)
                .getField("concept_type")
                .alias("referenced_type"),
            ),
        ),
    )
    # first-seen dedup per work, preserving reference order
    deduped = F.aggregate(
        F.filter(refs, lambda r: r.getField("concept_id").isNotNull()),
        F.slice(refs, 1, 0),
        lambda acc, r: F.when(
            F.exists(
                acc, lambda e: e.getField("concept_id") == r.getField("concept_id")
            ),
            acc,
        ).otherwise(F.concat(acc, F.array(r))),
    )
    return (
        works.filter(F.col("type") == "Visible")
        .select("work_id", F.explode(deduped).alias("r"))
        .select(
            "work_id",
            F.col("r.concept_id").alias("concept_id"),
            F.col("r.referenced_in").alias("referenced_in"),
            F.col("r.referenced_type").alias("referenced_type"),
        )
    )


def path_identifier_graph(works: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(attach, edges): WorkHasPathIdentifier rows (work_id, pid) and the
    DISTINCT PathIdentifierHasParent edge set (pid, parent_pid) —
    raw_work.py:108-139 + work_identifiers_transformer.py:57-84.  Only
    visible works with a non-null collection path contribute
    (work_identifiers_transformer.py ES_QUERY)."""
    raw = F.col("collection_path.path")
    path = F.regexp_replace(raw, "/+$", "")
    idvals = F.concat(
        F.array(F.col("source_value")),
        F.transform(F.col("other_identifiers"), lambda i: i.getField("value")),
    )
    full = F.array_contains(idvals, raw)
    segs = F.split(path, "/")
    n = F.size(segs)
    pid = F.when(full, path).otherwise(F.element_at(segs, -1))
    parent = F.when(
        path.contains("/"),
        F.when(full, F.concat_ws("/", F.slice(segs, 1, n - 1))).otherwise(
            F.element_at(segs, -2)
        ),
    )
    base = works.filter(
        (F.col("type") == "Visible") & raw.isNotNull() & (F.length(raw) > 0)
    ).select(
        "work_id", pid.alias("pid"), parent.alias("parent_pid")
    )
    attach = base.select("work_id", "pid")
    edges = (
        base.filter(F.col("parent_pid").isNotNull())
        .select("pid", "parent_pid")
        .distinct()
    )
    return attach, edges


def parent_closure(edges: DataFrame, max_hops: int = 16) -> DataFrame:
    """(pid, anc_pid, hops) — HAS_PARENT*1..max_hops with minimal hop
    count, by hop-doubling (max_hops a power of two)."""
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError("max_hops must be a power of two")
    r = edges.select(
        F.col("pid"), F.col("parent_pid").alias("anc_pid"), F.lit(1).alias("hops")
    )
    prev_n = None
    for _ in range(max_hops.bit_length() - 1):
        # materialization barrier per round: without it each self-join
        # re-EXPANDS the whole lineage (2^rounds copies of the edge scan —
        # measured 454 exchanges / 91 input re-scans in the un-barriered
        # plan).  The closure is ~depth × identifiers rows, tiny relative
        # to the works table, so checkpointing it is the 100 TB shape.
        r = r.localCheckpoint(eager=False)
        # fixpoint early-exit: when a doubling round added no new ancestor
        # pairs the closure is complete — a real hierarchy is far
        # shallower than max_hops (ceil(log2(depth)) rounds suffice), and
        # the count is over the already-checkpointed closure, which is
        # lineage-sized, not works-sized
        n = r.count()
        if n == prev_n:
            break
        prev_n = n
        hop2 = (
            r.alias("a")
            .join(r.alias("b"), F.col("a.anc_pid") == F.col("b.pid"))
            .select(
                F.col("a.pid").alias("pid"),
                F.col("b.anc_pid").alias("anc_pid"),
                (F.col("a.hops") + F.col("b.hops")).alias("hops"),
            )
        )
        r = (
            r.unionByName(hop2)
            .groupBy("pid", "anc_pid")
            .agg(F.min("hops").alias("hops"))
        )
    return r


_NODE_T = (
    "struct<id:string,label:string,collection_path:string,"
    "collection_path_label:string,work_type:string,parts:bigint>"
)


def work_hierarchy(
    works: DataFrame, max_hops: int = 16
) -> tuple[DataFrame, DataFrame]:
    """(ancestors, children): per-work hierarchy arrays over the path
    identifier graph (work_queries.py WORK_ANCESTORS / WORK_CHILDREN).

    ancestors(work_id, hierarchy_ancestors): closest parent first,
    node struct carries (id,label,collection_path,collection_path_label,
    work_type,parts) with parts = the ancestor identifier's direct
    child-identifier count.  children(work_id, hierarchy_children):
    natural collection order (the display transformer's sort,
    work_display_transformer.py:155-162), parts = grandchild count."""
    from .works_ingestor import natural_sort_key_expr  # local to avoid a cycle

    attach, edges = path_identifier_graph(works)
    # one truncated-lineage copy each: attach/edges/nodes are consumed by
    # several joins below and inside the closure — without the barrier the
    # works scan is re-expanded once per reference
    attach = attach.localCheckpoint(eager=False)
    edges = edges.localCheckpoint(eager=False)
    nodes = work_nodes(works).select(
        F.col("id").alias("_nid"),
        F.col("label").alias("_label"),
        F.col("collection_path").alias("_cp"),
        F.col("collection_path_label").alias("_cpl"),
        F.col("node_type").alias("_wt"),
    )
    parts = edges.groupBy(F.col("parent_pid").alias("_pp")).agg(
        F.count(F.lit(1)).alias("_parts")
    )
    closure = parent_closure(edges, max_hops)

    node_struct = F.struct(
        F.col("_nid").alias("id"),
        F.col("_label").alias("label"),
        F.col("_cp").alias("collection_path"),
        F.col("_cpl").alias("collection_path_label"),
        F.col("_wt").alias("work_type"),
        F.coalesce(F.col("_parts"), F.lit(0)).cast("bigint").alias("parts"),
    )

    anc = (
        attach.join(closure, "pid")
        .join(attach.select(F.col("pid").alias("anc_pid"),
                            F.col("work_id").alias("_aid")), "anc_pid")
        .join(nodes, F.col("_aid") == F.col("_nid"))
        .join(parts, F.col("anc_pid") == F.col("_pp"), "left")
        .groupBy("work_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("hops"), node_struct.alias("node")))
                ),
                lambda x: x.getField("node"),
            ).alias("hierarchy_ancestors")
        )
    )
    chi = (
        attach.join(
            edges.select(F.col("parent_pid").alias("pid"),
                         F.col("pid").alias("child_pid")),
            "pid",
        )
        .join(attach.select(F.col("pid").alias("child_pid"),
                            F.col("work_id").alias("_cid")), "child_pid")
        .join(nodes, F.col("_cid") == F.col("_nid"))
        .join(parts, F.col("child_pid") == F.col("_pp"), "left")
        .groupBy("work_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            natural_sort_key_expr(F.col("_cp")).alias("k"),
                            node_struct.alias("node"),
                        )
                    )
                ),
                lambda x: x.getField("node"),
            ).alias("hierarchy_children")
        )
    )
    return anc, chi


def incremental_reingest_set(
    changed_ids: DataFrame, works: DataFrame, max_hops: int = 16
) -> DataFrame:
    """The works-index extractor's incremental related-works expansion
    (ingestor/extractors/works/works_index_extractor.py:56-99): when a
    work changes, every work document that embeds it in ``partOf`` /
    ``parts`` must be re-ingested — so the re-ingest set is the changed
    works plus ALL their descendants plus their closest-parent works
    (the reference adds ``ancestors[0]``; relationally that is every
    work attached to the minimal-hops ancestor identifier).

    changed_ids(work_id) → (work_id, reason ∈ changed|descendant|parent),
    one row per (work, reason), deduplicated on work_id at the end the
    way ``related_ids.difference(streamed_ids)`` does.  Shape: the same
    bounded closure as work_hierarchy — identifier-keyed equi-joins, no
    driver-side sets."""
    attach, edges = path_identifier_graph(works)
    closure = parent_closure(edges, max_hops)
    changed = changed_ids.select("work_id").distinct()
    ch_pids = changed.join(attach, "work_id").select(
        F.col("work_id").alias("_src"), "pid"
    )
    # descendants: works attached to identifiers BELOW a changed pid
    desc = (
        ch_pids.join(
            closure.select(F.col("anc_pid").alias("pid"),
                           F.col("pid").alias("_dpid")),
            "pid",
        )
        .join(attach.select(F.col("pid").alias("_dpid"),
                            F.col("work_id").alias("desc_id")), "_dpid")
        .select(F.col("desc_id").alias("work_id"), F.lit("descendant").alias("reason"))
    )
    # closest parent: the minimal-hops ancestor identifier's works
    min_anc = (
        ch_pids.join(closure, "pid")
        .groupBy("_src")
        .agg(F.min_by("anc_pid", "hops").alias("anc_pid"))
        .join(attach.withColumnsRenamed({"pid": "anc_pid"}), "anc_pid")
        .select("work_id", F.lit("parent").alias("reason"))
    )
    out = (
        changed.select("work_id", F.lit("changed").alias("reason"))
        .unionByName(desc)
        .unionByName(min_anc)
    )
    # a work already in the changed set is not re-ingested twice
    w = F.when(F.col("reason") == "changed", 0).otherwise(1)
    return (
        out.groupBy("work_id")
        .agg(F.min(F.struct(w.alias("_p"), F.col("reason").alias("r"))).alias("m"))
        .select("work_id", F.col("m.r").alias("reason"))
    )


def image_nodes_and_edges(images: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Catalogue→graph IMAGE nodes + WorkHasImage edges
    (graph/transformers/catalogue/images_transformer.py:25-59): each
    augmented image's iiif-image location becomes the node's
    location_type/url; a missing iiif-image location or an access
    condition other than a single ViewOnline/Open is flagged instead of
    raised (``error`` column — the engine's no-exceptions-on-executors
    policy; the reference raises per record).

    images(image_id, work_id, locations array<loc struct with
    access_status/access_relationship as elected condition>).  Returns
    (nodes, edges); nodes carry ``error`` for the reference's ValueError
    cases."""
    iiif = F.try_element_at(
        F.filter(
            F.col("locations"),
            lambda loc: loc.getField("location_type_id") == "iiif-image",
        ),
        F.lit(1),
    )
    ok_access = iiif.isNotNull() & (
        F.coalesce(iiif.getField("access_status"), F.lit("")) == "Open"
    )
    nodes = images.select(
        F.col("image_id").alias("id"),
        iiif.getField("location_type_id").alias("location_type"),
        iiif.getField("url").alias("location_url"),
        F.when(iiif.isNull(), F.lit("no-iiif-image-location"))
        .when(~ok_access, F.lit("unexpected-access-conditions"))
        .alias("error"),
    )
    edges = images.select(
        F.col("work_id").alias("from_id"), F.col("image_id").alias("to_id")
    )
    return nodes, edges
