"""Wikidata linked-ontology source: the SPARQL query-builder grammar plus
the node/edge id-filtering semantics, re-expressed Spark-side.

Reference: ``catalogue_graph/src/graph/sources/wikidata/``
``sparql_query_builder.py:1-180`` (query grammar — field selection with
SAMPLE aggregation, OPTIONAL property mappings, the ``wikibase:label``
service block, the all-ids / items / edge query shapes),
``linked_ontology_source.py:1-144`` (wikidata-id extraction from SPARQL
bindings, edge streaming over id chunks),
``linked_ontology_node_source.py:11-57`` (node-id filtering: first
ontology-valid SAME_AS edge wins, transformer-validity gate, parents of
concept nodes), ``linked_ontology_edge_source.py:11-57`` (edge
filtering: from-side current-transformer gate, SAME_AS target gate,
internal-edge wikidata-ontology gate).

The reference drives a rate-limited HTTP SPARQL endpoint: queries are
driver-coordinated strings built over id chunks
(``SPARQL_ITEMS_CHUNK_SIZE = 400``, ``sparql_client.py:22``).  Here the
grammar is pure Python for the driver-coordinated paths — exactly how the
CALM ``Expr`` grammar was ported (``functions/calm_query.py``) — plus a
column-side chunked-VALUES construction (``fixed_size_chunks`` → one
query string per chunk in a single aggregation) so that building many
chunk queries is itself distributed.  The id-filtering source semantics
become joins against the extracted-id dimension frames (broadcast-able),
never per-row Python.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# grammar constants (sparql_query_builder.py:5-18,150-165;
# linked_ontology_source.py:21-30)
# --------------------------------------------------------------------------

EDGE_PROPERTY_PATHS: dict[str, str] = {
    "same_as_loc": "p:P244/ps:P244",
    "same_as_mesh": "p:P486/ps:P486",
    "instance_of": "wdt:P31",
    "subclass_of": "wdt:P279",
    "has_field_of_work": "wdt:P101",
    "has_founder": "wdt:P112",
    "has_industry": "wdt:P452",
    "has_father": "wdt:P22",
    "has_mother": "wdt:P25",
    "has_sibling": "wdt:P3373",
    "has_spouse": "wdt:P26",
    "has_child": "wdt:P40",
}

HAS_PARENT_EDGE_TYPES: list[str] = ["instance_of", "subclass_of"]
PEOPLE_RELATIONSHIP_EDGE_TYPES: list[str] = [
    "has_father",
    "has_mother",
    "has_sibling",
    "has_spouse",
    "has_child",
]

ALL_IDS_FIELD_FILTERS: dict[str, str] = {
    "loc": "?item wdt:P244 ?locId.",
    "mesh": "?item wdt:P486 ?meshId.",
}

WIKIDATA_ID_PREFIX = "http://www.wikidata.org/entity/"

# chunk size the reference uses for every id-chunked SPARQL query
# (sparql_client.py:22)
SPARQL_ITEMS_CHUNK_SIZE = 400


def compact_query(query: str) -> str:
    """``_compact_format_query``: collapse all whitespace runs to one
    space (:26-31)."""
    return " ".join(query.split())


def _formatted_fields(node_type: str) -> str:
    """Field list with SAMPLE aggregation around everything but ``?item``
    (:33-56) — ``?item`` is the lone GROUP BY key, so SPARQL requires the
    rest to be aggregate-wrapped."""
    fields = ["?item", "?itemLabel", "?itemDescription", "?itemAltLabel"]
    if node_type == "names":
        fields += ["?dateOfBirth", "?dateOfDeath", "?placeOfBirthLabel"]
    elif node_type == "locations":
        fields += ["?coordinates"]
    return " ".join(
        f if f == "?item" else f"(SAMPLE({f}) as {f})" for f in fields
    )


def _field_mappings(node_type: str) -> str:
    """OPTIONAL property-path definitions per node type (:58-74)."""
    definitions = []
    if node_type == "names":
        definitions += [
            "OPTIONAL { ?item wdt:P569 ?dateOfBirth. }",
            "OPTIONAL { ?item wdt:P570 ?dateOfDeath. }",
            "OPTIONAL { ?item wdt:P19 ?placeOfBirth. }",
        ]
    elif node_type == "locations":
        definitions += ["OPTIONAL { ?item p:P625/ps:P625 ?coordinates. }"]
    return "\n".join(definitions)


def _label_mappings(node_type: str) -> str:
    """``wikibase:label`` service block, English-or-multilingual labels
    only (:76-97)."""
    extra = []
    if node_type == "names":
        extra.append("?placeOfBirth rdfs:label ?placeOfBirthLabel.")
    joined = "\n".join(extra)
    return f"""
        OPTIONAL {{
            SERVICE wikibase:label {{
                bd:serviceParam wikibase:language "en,mul".
                ?item rdfs:label ?itemLabel.
                ?item schema:description ?itemDescription.
                ?item skos:altLabel ?itemAltLabel.
                {joined}
            }}
        }}
        """


def all_ids_query(linked_ontology: str) -> str:
    """Query for ids of ALL Wikidata items referencing the linked
    ontology (:99-117) — the step-1 sweep that seeds every chunked query."""
    field_filter = ALL_IDS_FIELD_FILTERS.get(linked_ontology)
    if field_filter is None:
        raise ValueError(f"Invalid linked ontology type: {linked_ontology}")
    return compact_query(f"SELECT ?item WHERE {{ {field_filter} }}")


def _items_query_parts(node_type: str) -> tuple[str, str]:
    """(prefix, suffix) such that ``prefix + ids_clause + suffix`` is the
    compacted items query — the split point the column-side builder
    concatenates around."""
    head = compact_query(
        f"SELECT DISTINCT {_formatted_fields(node_type)} WHERE {{ VALUES ?item {{"
    )
    tail = compact_query(
        f"}} {_field_mappings(node_type)} {_label_mappings(node_type)} }} GROUP BY ?item"
    )
    return head + " ", " " + tail


def items_query(item_ids: Iterable[str], node_type: str) -> str:
    """``get_items_query`` (:119-137): all required fields for a sorted
    VALUES chunk of ids."""
    prefix, suffix = _items_query_parts(node_type)
    ids_clause = " ".join(f"wd:{i}" for i in sorted(item_ids))
    return prefix + ids_clause + suffix


def _edge_query_parts(edge_type: str) -> tuple[str, str]:
    if edge_type not in EDGE_PROPERTY_PATHS:
        raise ValueError(f"Unknown edge type: {edge_type}")
    path = EDGE_PROPERTY_PATHS[edge_type]
    head = "SELECT DISTINCT ?fromItem ?toItem WHERE { VALUES ?fromItem {"
    tail = f"}} ?fromItem {path} ?toItem. FILTER (!wikibase:isSomeValue(?toItem)) }}"
    return head + " ", " " + tail


def edge_query(item_ids: Iterable[str], edge_type: str) -> str:
    """``get_edge_query`` (:139-180): edges of one type out of a sorted
    VALUES chunk, unknown-value targets filtered."""
    prefix, suffix = _edge_query_parts(edge_type)
    ids_clause = " ".join(f"wd:{i}" for i in sorted(item_ids))
    return prefix + ids_clause + suffix


# --------------------------------------------------------------------------
# column-side pieces
# --------------------------------------------------------------------------


def extract_wikidata_id_col(value: Column, binding_type: Column | None = None) -> Column:
    """``extract_wikidata_id`` (linked_ontology_source.py:33-50) as a
    column: strip the entity-uri prefix; NULL for the rare
    ``.well-known/genid/...`` bindings (the reference logs and drops
    them) and for non-uri binding types."""
    ok = value.startswith(WIKIDATA_ID_PREFIX)
    if binding_type is not None:
        ok = ok & (binding_type == "uri")
    return F.when(ok, F.substring(value, len(WIKIDATA_ID_PREFIX) + 1, 1 << 20))


def chunked_values_clauses(
    ids: DataFrame,
    id_col: str = "id",
    chunk_size: int = SPARQL_ITEMS_CHUNK_SIZE,
) -> DataFrame:
    """(chunk_id, values_clause, n_ids) — the ``wd:Q1 wd:Q2 ...`` VALUES
    body per fixed-size chunk.  Chunking reuses the O5 operator
    (``fixed_size_chunks``); ids sort within each chunk exactly as the
    Python builders sort each chunk's id list."""
    from ..operators.precedence import fixed_size_chunks

    chunked = fixed_size_chunks(ids.select(id_col).distinct(), id_col, chunk_size)
    return chunked.groupBy("chunk_id").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.concat(F.lit("wd:"), F.col(id_col)))),
            " ",
        ).alias("values_clause"),
        F.count("*").alias("n_ids"),
    )


def chunked_items_queries(
    ids: DataFrame,
    node_type: str,
    id_col: str = "id",
    chunk_size: int = SPARQL_ITEMS_CHUNK_SIZE,
) -> DataFrame:
    """(chunk_id, query) — one full items query per chunk, built in one
    distributed aggregation; byte-identical to ``items_query`` over the
    same chunk's ids."""
    prefix, suffix = _items_query_parts(node_type)
    return chunked_values_clauses(ids, id_col, chunk_size).select(
        "chunk_id",
        F.concat(F.lit(prefix), F.col("values_clause"), F.lit(suffix)).alias(
            "query"
        ),
    )


def chunked_edge_queries(
    ids: DataFrame,
    edge_type: str,
    id_col: str = "id",
    chunk_size: int = SPARQL_ITEMS_CHUNK_SIZE,
) -> DataFrame:
    """(chunk_id, query) — one edge query per chunk, distributed."""
    prefix, suffix = _edge_query_parts(edge_type)
    return chunked_values_clauses(ids, id_col, chunk_size).select(
        "chunk_id",
        F.concat(F.lit(prefix), F.col("values_clause"), F.lit(suffix)).alias(
            "query"
        ),
    )


# --------------------------------------------------------------------------
# source semantics
# --------------------------------------------------------------------------


def _id_dim(ids: DataFrame, alias: str) -> DataFrame:
    return ids.select(F.col(ids.columns[0]).alias(alias)).distinct()


def filtered_node_ids(
    same_as_edges: DataFrame,
    valid_ontology_ids: DataFrame,
    valid_transformer_ids: DataFrame,
    node_type: str,
    parent_edges: DataFrame | None = None,
    seq_col: str = "seq",
) -> DataFrame:
    """Node-source id filtering
    (``linked_ontology_node_source.py:11-44``): over SAME_AS edges
    ``(seq, from_id, to_id)`` in stream order,

    * the FIRST ontology-valid edge of each ``from_id`` wins — the
      reference marks an id seen on its first valid edge whether or not
      it passes the transformer gate, so a later passing edge cannot
      resurrect it;
    * the winner's ``to_id`` must have been extracted by the linked
      transformer for the id to be yielded;
    * for ``concepts`` only, parents (``to_id`` of instance_of /
      subclass_of edges, supplied via ``parent_edges``) are added when
      not already seen — no validity check, deduplicated across both
      parent edge types.

    Returns a one-column ``(id)`` frame.  The validity sets are
    dimension frames (broadcast): the big side — the edge stream — is
    scanned once per join, never collected.
    """
    vo = _id_dim(valid_ontology_ids, "to_id")
    vt = _id_dim(valid_transformer_ids, "_vt_id")

    valid_edges = same_as_edges.join(F.broadcast(vo), "to_id", "left_semi")
    first = valid_edges.groupBy("from_id").agg(
        F.min_by("to_id", F.col(seq_col)).alias("_first_to")
    )
    yielded = first.join(
        F.broadcast(vt), first["_first_to"] == vt["_vt_id"], "left_semi"
    ).select(F.col("from_id").alias("id"))

    if node_type != "concepts" or parent_edges is None:
        return yielded.distinct()

    # seen = every id with at least one ontology-valid SAME_AS edge,
    # yielded or not (:27-29)
    seen = first.select(F.col("from_id").alias("id"))
    parents = (
        parent_edges.select(F.col("to_id").alias("id"))
        .distinct()
        .join(seen, "id", "left_anti")
    )
    return yielded.unionByName(parents).distinct()


def edge_types_for(node_type: str) -> list[str]:
    """Internal edge types the edge source streams for a node type
    (``linked_ontology_edge_source.py:42-49``)."""
    types = [*HAS_PARENT_EDGE_TYPES, "has_industry", "has_founder"]
    if node_type == "names":
        types += ["has_field_of_work", *PEOPLE_RELATIONSHIP_EDGE_TYPES]
    return types


def filtered_edges(
    same_as_edges: DataFrame,
    internal_edges: DataFrame,
    node_type: str,
    linked_ontology: str,
    valid_transformer_ids: DataFrame,
    current_node_ids: DataFrame,
    wikidata_ontology_ids: DataFrame,
) -> DataFrame:
    """Edge-source filtering (``linked_ontology_edge_source.py:11-57``):

    * every edge's ``from_id`` must have been extracted by the CURRENT
      wikidata transformer (the node source runs first — :14-24);
    * SAME_AS edges (``same_as_<ontology>``) keep only targets extracted
      by the linked transformer (:33-41);
    * internal edges keep only the types for this ``node_type`` (people
      relationships for names only) and targets known to the wikidata
      ontology (:43-57).

    ``same_as_edges`` is ``(from_id, to_id)``; ``internal_edges`` is
    ``(from_id, to_id, edge_type)``.  Returns
    ``(from_id, to_id, edge_type)``.
    """
    cur = _id_dim(current_node_ids, "from_id")
    vt = _id_dim(valid_transformer_ids, "to_id")
    wd = _id_dim(wikidata_ontology_ids, "to_id")

    same_as_type = f"same_as_{linked_ontology}"
    sa = (
        same_as_edges.select("from_id", "to_id")
        .join(F.broadcast(cur), "from_id", "left_semi")
        .join(F.broadcast(vt), "to_id", "left_semi")
        .withColumn("edge_type", F.lit(same_as_type))
    )
    internal = (
        internal_edges.select("from_id", "to_id", "edge_type")
        .filter(F.col("edge_type").isin(edge_types_for(node_type)))
        .join(F.broadcast(cur), "from_id", "left_semi")
        .join(F.broadcast(wd), "to_id", "left_semi")
    )
    return sa.unionByName(internal)
