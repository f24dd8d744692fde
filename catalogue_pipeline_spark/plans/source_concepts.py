"""Source-concept transformers: LoC (MADS/RDF JSON-LD), MeSH (descriptor
XML) and Wikidata (SPARQL result rows) → SourceConcept nodes + typed
relationship edges.

The reference's "concepts pipeline" bulk-loads external ontologies into the
knowledge graph (catalogue_graph/src/graph/transformers/{loc,mesh,
wikidata}/ + sources/).  These nodes/edges are exactly what the ingestor
queries in ``plans/concept_graph.py`` traverse (SAME_AS closures,
NARROWER_THAN/RELATED_TO expansion), so together they close the
catalogue_graph loop: external ontology → source-concept graph →
per-concept enrichment.

Spark-first shapes:

* **LoC JSON-LD is heterogeneous** (every field may be a string, an
  object with ``@value``, or a list) — a fixed ``from_json`` schema can't
  hold it, and a per-row Python parser would put json.loads on the bulk
  path.  Spark 4's VariantType is the built-in answer: one ``parse_json``
  per record, then ``try_variant_get`` + ``schema_of_variant`` inside
  higher-order array functions, all JVM-side
  (loc/raw_concept.py:35-193).
* **MeSH descriptor XML is fixed-depth** → regex columns, like the METS
  slice.  The one relational step is the parent derivation: a concept's
  tree numbers encode ancestry, so parents = explode(treenums) →
  strip-last-segment → EQUI-JOIN on the (treenum → descriptor) lookup
  built from the same corpus — the reference's in-memory
  ``treenum_lookup`` dict re-expressed as a join (mesh/raw_concept.py:
  66-95).
* **Wikidata rows are flat SPARQL JSON** → ``from_json`` with a typed
  schema; SAME_AS edges materialize in both directions, exactly as
  wikidata/concepts_transformer.py:38-51.

Node schema (graph_node.SourceConcept): id, label, source, alternative
labels, alternative ids (MeSH tree numbers), description.  Edge schema
(graph_edge.py:59-77): (from_id, to_id, relationship).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------- helpers

_LOC_SUBJECTS_RE = r"authorities/subjects/(sh\d+)$"
_LOC_NAMES_RE = r"authorities/names/(n[a-z]?\d+)$"


def _jsonld_str(v: Column) -> Column:
    """A JSON-LD value that may be a plain string, an object with
    ``@value``, or a list whose first entry is the Latin-script string
    (loc/raw_concept.py:158-178)."""
    t = F.schema_of_variant(v)
    return (
        F.when(t == "STRING", F.try_variant_get(v, "$", "string"))
        .when(t.startswith("ARRAY"), F.try_variant_get(v, "$[0]", "string"))
        .otherwise(F.try_variant_get(v, "$['@value']", "string"))
    )


def _as_variant_list(v: Column) -> Column:
    """Single-object-or-list → array<variant> (loc/raw_concept.py:181-188)."""
    t = F.schema_of_variant(v)
    return F.when(
        v.isNotNull(),
        F.when(
            t.startswith("ARRAY"),
            F.try_variant_get(v, "$", "array<variant>"),
        ).otherwise(F.array(v)),
    )


def _loc_id_of(id_str: Column) -> Column:
    """LoC id from a node @id URI — subject heading or name, else NULL
    (loc/raw_concept.py:5-21)."""
    sh = F.regexp_extract(id_str, _LOC_SUBJECTS_RE, 1)
    nm = F.regexp_extract(id_str, _LOC_NAMES_RE, 1)
    return F.when(sh != "", sh).when(nm != "", nm)


def _types_of(node: Column) -> Column:
    tv = F.try_variant_get(node, "$['@type']", "variant")
    return F.coalesce(
        F.try_variant_get(tv, "$", "array<string>"),
        F.array(F.try_variant_get(tv, "$", "string")),
        F.array().cast("array<string>"),
    )


def _ids_of(nodes_variant: Column) -> Column:
    """LoC ids extracted from a list-or-single of {@id} references."""
    lst = F.coalesce(_as_variant_list(nodes_variant), F.array().cast("array<variant>"))
    return F.filter(
        F.transform(
            lst, lambda n: _loc_id_of(F.try_variant_get(n, "$['@id']", "string"))
        ),
        lambda c: c.isNotNull(),
    )


# ------------------------------------------------------------------ LoC

def transform_loc(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """records(content = one MADS/RDF JSON-LD document per row) →
    (nodes, edges).

    nodes: (id, label, source, alternative_labels) — excluded when the id
    is neither a subject heading nor a name, when no authority node with a
    label exists, or when the concept is Geographic
    (loc/concepts_transformer.py:18-29).
    edges: NARROWER_THAN from broader refs (+ componentList members) and
    the reversed narrower refs; RELATED_TO in both directions
    (loc/concepts_transformer.py:31-55).
    """
    v = F.parse_json("content")
    top_id = F.try_variant_get(v, "$['@id']", "string")
    sid = _loc_id_of(top_id)
    graph = F.coalesce(
        F.try_variant_get(v, "$['@graph']", "array<variant>"),
        F.array().cast("array<variant>"),
    )
    # the authority node: @id contains the source id, typed madsrdf:
    # Authority (DeprecatedAuthority excluded by exact match), labelled
    auth_nodes = F.filter(
        graph,
        lambda n: F.coalesce(
            F.try_variant_get(n, "$['@id']", "string").contains(sid), F.lit(False)
        )
        & F.array_contains(_types_of(n), "madsrdf:Authority")
        & F.try_variant_get(n, "$['madsrdf:authoritativeLabel']", "variant").isNotNull(),
    )
    node = F.try_element_at(auth_nodes, F.lit(1))
    base = records.select(
        sid.alias("id"),
        F.when(top_id.contains("subjects"), F.lit("lc-subjects"))
        .otherwise(F.lit("lc-names"))
        .alias("source"),
        node.alias("_n"),
        graph.alias("_g"),
    ).filter(F.col("id").isNotNull() & F.col("_n").isNotNull())
    n = F.col("_n")
    is_geo = F.array_contains(_types_of(n), "madsrdf:Geographic")
    base = base.filter(~is_geo)

    label = _jsonld_str(F.try_variant_get(n, "$['madsrdf:authoritativeLabel']", "variant"))
    variant_ids = F.transform(
        F.coalesce(
            _as_variant_list(F.try_variant_get(n, "$['madsrdf:hasVariant']", "variant")),
            F.array().cast("array<variant>"),
        ),
        lambda x: F.try_variant_get(x, "$['@id']", "string"),
    )
    alt_labels = F.filter(
        F.transform(
            F.filter(
                F.col("_g"),
                lambda g: F.array_contains(
                    variant_ids, F.try_variant_get(g, "$['@id']", "string")
                ),
            ),
            lambda g: _jsonld_str(
                F.try_variant_get(g, "$['madsrdf:variantLabel']", "variant")
            ),
        ),
        lambda c: c.isNotNull(),
    )
    broader = F.concat(
        _ids_of(F.try_variant_get(n, "$['madsrdf:hasBroaderAuthority']", "variant")),
        _ids_of(
            F.try_variant_get(n, "$['madsrdf:componentList']['@list']", "variant")
        ),
    )
    narrower = _ids_of(
        F.try_variant_get(n, "$['madsrdf:hasNarrowerAuthority']", "variant")
    )
    related = _ids_of(
        F.try_variant_get(n, "$['madsrdf:hasReciprocalAuthority']", "variant")
    )
    enriched = base.select(
        "id",
        label.alias("label"),
        "source",
        alt_labels.alias("alternative_labels"),
        broader.alias("_broader"),
        narrower.alias("_narrower"),
        related.alias("_related"),
    )
    nodes = enriched.select("id", "label", "source", "alternative_labels")

    def edge(from_id, to_id, rel):
        return F.struct(
            from_id.alias("from_id"), to_id.alias("to_id"), F.lit(rel).alias("relationship")
        )

    me = F.col("id")
    edges = enriched.select(
        F.explode(
            F.concat(
                F.transform(F.col("_broader"), lambda b: edge(me, b, "NARROWER_THAN")),
                F.transform(F.col("_narrower"), lambda x: edge(x, me, "NARROWER_THAN")),
                F.transform(F.col("_related"), lambda r: edge(me, r, "RELATED_TO")),
                F.transform(F.col("_related"), lambda r: edge(r, me, "RELATED_TO")),
            )
        ).alias("e")
    ).select("e.from_id", "e.to_id", "e.relationship")
    return nodes, edges


# ----------------------------------------------------------------- MeSH

def _xml_all(content: Column, pattern: str) -> Column:
    return F.regexp_extract_all(content, F.lit(pattern), F.lit(1))


def transform_mesh(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """records(content = one <DescriptorRecord> XML per row) →
    (nodes, edges).

    nodes: (id, label, source='nlm-mesh', alternative_labels [first
    occurrence of the preferred label removed, mesh/raw_concept.py:31-41],
    alternative_ids = tree numbers, description = preferred concept's
    scope note); Geographic descriptors (DescriptorClass="4") dropped.
    edges: HAS_PARENT via the tree-number join (strip the last dotted
    segment, look up the owning descriptor); RELATED_TO one direction
    only — the source data references both ways
    (mesh/concepts_transformer.py:30-46).
    """
    c = F.col("content")
    sid = F.regexp_extract(c, r"<DescriptorUI>([^<]+)</DescriptorUI>", 1)
    label = F.regexp_extract(
        c, r"<DescriptorName>\s*<String>([^<]+)</String>", 1
    )
    # terms live under ConceptList//TermList only — scope the extraction to
    # the TermList sections so DescriptorName's <String> doesn't leak in
    all_terms = F.flatten(
        F.transform(
            F.regexp_extract_all(c, F.lit(r"(?s)<TermList>(.*?)</TermList>"), F.lit(1)),
            lambda s: F.regexp_extract_all(
                s, F.lit(r"<String>([^<]+)</String>"), F.lit(1)
            ),
        )
    )
    pos = F.array_position(all_terms, label)
    alt = F.when(
        pos > 0,
        F.concat(
            F.slice(all_terms, 1, (pos - 1).cast("int")),
            F.when(
                F.size(all_terms) > pos,
                F.slice(all_terms, (pos + 1).cast("int"), F.size(all_terms)),
            ).otherwise(F.array().cast("array<string>")),
        ),
    ).otherwise(all_terms)
    treenums = _xml_all(c, r"<TreeNumber>([^<]+)</TreeNumber>")
    scope = F.nullif(
        F.regexp_extract(
            c,
            r'(?s)<Concept PreferredConceptYN="Y">.*?<ScopeNote>\s*([^<]*?)\s*</ScopeNote>',
            1,
        ),
        F.lit(""),
    )
    related = _xml_all(c, r"<DescriptorReferredTo>\s*<DescriptorUI>([^<]+)</DescriptorUI>")
    is_geo = c.rlike(r'DescriptorClass="4"')

    base = records.select(
        sid.alias("id"),
        label.alias("label"),
        F.lit("nlm-mesh").alias("source"),
        alt.alias("alternative_labels"),
        treenums.alias("alternative_ids"),
        scope.alias("description"),
        related.alias("_related"),
    ).filter((F.col("id") != "") & ~is_geo)
    nodes = base.drop("_related")

    # (treenum → descriptor) lookup from the same corpus, then the
    # strip-last-segment equi-join — the reference's in-memory dict
    lookup = nodes.select(
        F.explode("alternative_ids").alias("treenum"), F.col("id").alias("parent_id")
    )
    child_tns = nodes.select(
        F.col("id").alias("from_id"), F.explode("alternative_ids").alias("tn")
    ).filter(F.col("tn").contains("."))
    _parts = F.split(F.col("tn"), r"\.")
    parent_tn = F.array_join(F.slice(_parts, 1, F.size(_parts) - 1), ".")
    parents = (
        child_tns.withColumn("treenum", parent_tn)
        .join(lookup, "treenum")
        .select("from_id", F.col("parent_id").alias("to_id"))
        .distinct()
        .withColumn("relationship", F.lit("HAS_PARENT"))
    )
    rel = base.select(
        F.col("id").alias("from_id"), F.explode("_related").alias("to_id")
    ).withColumn("relationship", F.lit("RELATED_TO"))
    return nodes, parents.unionByName(rel)


# ------------------------------------------------------------- Wikidata

from pyspark.sql import types as T  # noqa: E402

_WD_FIELD = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("xml:lang", T.StringType()),
    ]
)
WIKIDATA_ROW_SCHEMA = T.StructType(
    [
        T.StructField("item", _WD_FIELD),
        T.StructField("itemLabel", _WD_FIELD),
        T.StructField("itemAltLabel", _WD_FIELD),
        T.StructField("itemDescription", _WD_FIELD),
    ]
)

_WD_ID_RE = r"entity/(Q\d+)$"


def transform_wikidata_nodes(records: DataFrame) -> DataFrame:
    """records(content = one SPARQL result binding as JSON) → nodes
    (id, label, source='wikidata', alternative_labels — the comma-joined
    altLabel split, description).  A concept whose label equals its own id
    has no English label and is excluded (wikidata/raw_concept.py:16-21)."""
    r = F.from_json("content", WIKIDATA_ROW_SCHEMA)
    sid = F.regexp_extract(r.getField("item").getField("value"), _WD_ID_RE, 1)
    label = r.getField("itemLabel").getField("value")
    alt = F.when(
        r.getField("itemAltLabel").isNotNull(),
        F.split(r.getField("itemAltLabel").getField("value"), ", "),
    ).otherwise(F.array().cast("array<string>"))
    return (
        records.select(
            sid.alias("id"),
            label.alias("label"),
            F.lit("wikidata").alias("source"),
            alt.alias("alternative_labels"),
            r.getField("itemDescription").getField("value").alias("description"),
        )
        .filter((F.col("id") != "") & (F.col("id") != F.col("label")))
    )


_WD_EDGE_MAP = {
    "same_as_loc": "SAME_AS",
    "same_as_mesh": "SAME_AS",
    "has_parent": "HAS_PARENT",
    "instance_of": "HAS_PARENT",
    "subclass_of": "HAS_PARENT",
    "has_founder": "HAS_FOUNDER",
    "has_industry": "HAS_FIELD_OF_WORK",
    "has_field_of_work": "HAS_FIELD_OF_WORK",
}


def transform_wikidata_edges(raw_edges: DataFrame) -> DataFrame:
    """raw_edges(from_id, to_id, edge_type) → (from_id, to_id,
    relationship); SAME_AS materializes BOTH directions
    (wikidata/concepts_transformer.py:38-51)."""
    pairs = []
    for k, v in sorted(_WD_EDGE_MAP.items()):
        pairs += [F.lit(k), F.lit(v)]
    rel = F.try_element_at(F.create_map(*pairs), F.col("edge_type"))
    typed = raw_edges.select(
        "from_id", "to_id", rel.alias("relationship")
    ).filter(F.col("relationship").isNotNull())
    back = typed.filter(F.col("relationship") == "SAME_AS").select(
        F.col("to_id").alias("from_id"),
        F.col("from_id").alias("to_id"),
        "relationship",
    )
    return typed.unionByName(back)


# ------------------------------------------------------- weco authority
def transform_weco(records: DataFrame) -> DataFrame:
    """Wellcome name-authority CSV rows → SourceConcept nodes
    (graph/transformers/weco_concepts/concepts_transformer.py:29-37):
    ids prefixed ``weco:`` (the raw id doubles as the canonical id of the
    catalogue concept the record overrides), trimmed label/description,
    ``||``-split image urls.  HAS_SOURCE_CONCEPT edges for these start at
    catalogue concepts and are produced by ``plans/concepts.
    concept_source_edges`` instead (the transformer raises
    NotImplementedError for edges, concepts_transformer.py:39-44)."""
    img = F.coalesce(F.col("image_url"), F.lit(""))
    return records.select(
        F.concat(F.lit("weco:"), F.trim(F.col("id"))).alias("id"),
        F.trim(F.col("label")).alias("label"),
        F.lit("weco-authority").alias("source"),
        F.trim(F.coalesce(F.col("description"), F.lit(""))).alias("description"),
        F.when(img == "", F.array().cast("array<string>")).otherwise(
            F.split(img, "\\|\\|")
        ).alias("image_urls"),
    )
