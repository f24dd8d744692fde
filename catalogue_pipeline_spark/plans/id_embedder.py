"""Id-minter embedder — recursive canonical-id embedding for work
documents (catalogue_graph/src/id_minter/embedder.py:1-110, the Python
twin of SourceIdentifierEmbedderTest.scala's subject).

The reference walks an arbitrarily nested work document, emits one mint
request per node carrying a ``sourceIdentifier`` (with the node's
``predecessorIdentifier`` when present), and — once ids are minted —
writes ``canonicalId`` back onto exactly those nodes, promoting them to
the identified wire shape:

* the request key normalizes concept subtypes (Person/Organisation/
  Place/Agent/Meeting/Genre/Period) to ``Concept`` so e.g. an Agent and a
  Person with the same LoC identifier mint the SAME id
  (normalize_ontology_type, embedder.py:43-54);
* a minted node with a string ``identifiedType`` drops that field and
  takes it as ``type``; a minted ``type='Identifiable'`` node becomes
  ``Identified``; unminted nodes are left untouched, including their
  ``identifiedType`` (embed_canonical_ids, :79-110);
* a malformed ``sourceIdentifier`` (missing keys) raises, exactly the
  reference's KeyError.

Spark-first shape: the document tree is opaque JSON and the traversal is
genuinely recursive, so both directions run as Arrow-batched
``mapInPandas`` (the accepted non-columnar pattern — per-document work,
no shuffle).  The id map is never broadcast whole: embedding joins the
minted ids to each document's OWN extracted keys and aggregates a
per-document array, so a 100 TB corpus ships each document only the
handful of ids it references.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TYPES_NORMALIZED_TO_CONCEPT = frozenset(
    {"Person", "Organisation", "Place", "Agent", "Meeting", "Genre", "Period"}
)

KEY_COLS = ["ontology_type", "source_system", "source_id"]
EXTRACT_SCHEMA = (
    "doc_id string, ontology_type string, source_system string,"
    " source_id string, pred_ontology_type string,"
    " pred_source_system string, pred_source_id string"
)


def normalize_ontology_type(t: str) -> str:
    return "Concept" if t in TYPES_NORMALIZED_TO_CONCEPT else t


def _key_of(si: dict) -> tuple[str, str, str]:
    # KeyError on malformed nodes is the contract (make_key, embedder.py:56-62)
    return (
        normalize_ontology_type(si["ontologyType"]),
        si["identifierType"]["id"],
        si["value"],
    )


def _identifier_nodes(node, out: list) -> None:
    if isinstance(node, dict):
        if "sourceIdentifier" in node:
            out.append(node)
        for v in node.values():
            _identifier_nodes(v, out)
    elif isinstance(node, list):
        for item in node:
            _identifier_nodes(item, out)


def _rewrite_identifier_nodes(node, fn):
    if isinstance(node, dict):
        done = {k: _rewrite_identifier_nodes(v, fn) for k, v in node.items()}
        return fn(done) if "sourceIdentifier" in done else done
    if isinstance(node, list):
        return [_rewrite_identifier_nodes(item, fn) for item in node]
    return node


def extract_source_identifiers(
    docs: DataFrame, *, id_col: str = "doc_id", json_col: str = "doc_json"
) -> DataFrame:
    """One mint-request row per sourceIdentifier node in each document —
    ``(doc_id, <key>, <predecessor key or nulls>)`` (extract_source_
    identifiers, embedder.py:65-77)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for did, js in zip(pdf[id_col], pdf[json_col]):
                nodes: list = []
                _identifier_nodes(json.loads(js), nodes)
                for n in nodes:
                    k = _key_of(n["sourceIdentifier"])
                    p = (
                        _key_of(n["predecessorIdentifier"])
                        if "predecessorIdentifier" in n
                        else (None, None, None)
                    )
                    rows.append((did, *k, *p))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    *KEY_COLS,
                    "pred_ontology_type",
                    "pred_source_system",
                    "pred_source_id",
                ],
            )

    return docs.select(F.col(id_col).alias(id_col), json_col).mapInPandas(
        gen, EXTRACT_SCHEMA
    )


def embed_canonical_ids(
    docs: DataFrame,
    minted: DataFrame,
    *,
    id_col: str = "doc_id",
    json_col: str = "doc_json",
) -> DataFrame:
    """Write minted ids back onto the documents (embed_canonical_ids,
    embedder.py:79-110).  ``minted``: ``(ontology_type, source_system,
    source_id, canonical_id)`` — the global mint table; each document is
    joined only the ids its own nodes reference.  Returns ``(doc_id,
    doc_json)`` with ``canonicalId`` embedded and minted nodes promoted
    (identifiedType → type; Identifiable → Identified); unminted nodes
    pass through unchanged."""
    reqs = extract_source_identifiers(docs, id_col=id_col, json_col=json_col)
    per_doc = (
        reqs.join(minted.select(*KEY_COLS, "canonical_id"), KEY_COLS)
        .groupBy("doc_id")
        .agg(
            F.collect_set(
                F.struct(*KEY_COLS, F.col("canonical_id"))
            ).alias("_minted")
        )
        .withColumnRenamed("doc_id", id_col)
    )
    j = docs.select(id_col, json_col).join(per_doc, id_col, "left")

    def gen(batches):
        for pdf in batches:
            out = []
            for did, js, ids in zip(pdf[id_col], pdf[json_col], pdf["_minted"]):
                id_map = {}
                if ids is not None:
                    for e in ids:
                        id_map[
                            (e["ontology_type"], e["source_system"], e["source_id"])
                        ] = e["canonical_id"]

                def emb(node: dict) -> dict:
                    cid = id_map.get(_key_of(node["sourceIdentifier"]))
                    if cid is None:
                        return node
                    node = {**node, "canonicalId": cid}
                    promoted = node.get("identifiedType")
                    if isinstance(promoted, str):
                        node = {
                            k: v for k, v in node.items() if k != "identifiedType"
                        }
                        node["type"] = promoted
                    elif node.get("type") == "Identifiable":
                        node["type"] = "Identified"
                    return node

                out.append(
                    (did, json.dumps(_rewrite_identifier_nodes(json.loads(js), emb)))
                )
            yield pd.DataFrame(out, columns=[id_col, json_col])

    return j.mapInPandas(gen, f"{id_col} string, {json_col} string")
