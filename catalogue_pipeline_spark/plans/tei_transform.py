"""Per-source transformer slice #6 (thin): TEI manuscript records.

TEI files describe manuscripts (pipeline/transformer/transformer_tei).  This
is deliberately a THIN slice — the top-level work fields and the merge
wiring — because the transformer's bulk (TeiNestedData's recursive
item/part internal works, scribes, languages, notes) is nested-document
construction the nested-works family here models via the path-graph
operators.  With this, all six source families have a transformer slice.

Rules carried over (file:line under transformer_tei/src/main/.../tei):

* reference no. — every <idno type="msID"> in the document; EXACTLY ONE
                  non-empty (trimmed) value is required — empty, missing or
                  repeated ids error the record (the reference's message
                  strings preserved verbatim)
                  (transformers/TeiReferenceNumber.scala:16-35)
* title         — the reference number (deliberately NOT the <title> node —
                  "Wellcome Library"/repeated-refno data, TeiXml.scala:63-70)
* b-number      — msDesc > msIdentifier > altIdentifier[@type=sierra, case-
                  insensitive] > idno: one → trimmed value, none → null,
                  more → 'More than one sierra bnumber node!'
                  (TeiXml.scala:38-56)
* summary       — the single msContents > summary node, tags other than
                  <p>/</p> stripped (attribute-carrying <p>s normalised),
                  trimmed; more than one → 'More than one summary node!'
                  (TeiOps.scala:22-50)
* merge cand    — validated b-number → sierra-system-number,
                  'Bnumber present in TEI file' (TeiData.scala:89-103)
* deleted       — Deleted(DeletedFromSource(Deleted by TEI source))
                  (TeiTransformer.scala:24-32); live TEI works are VISIBLE
                  (unlike METS).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IDNO_MSID_RE = (
    r'(?s)<(?:\w+:)?idno[^>]*type="msID"[^>]*>(.*?)</(?:\w+:)?idno>'
)
_SIERRA_ALT_RE = (
    r'(?s)<(?:\w+:)?altIdentifier[^>]*type="(?i:sierra)"[^>]*>'
    r"(?:(?!</(?:\w+:)?altIdentifier>).)*?"
    r"<(?:\w+:)?idno[^>]*>(.*?)</(?:\w+:)?idno>"
)
_SUMMARY_RE = (
    r"(?s)<(?:\w+:)?summary[^>]*>.*?</(?:\w+:)?summary>"
)


def _summary_expr(content: Column) -> tuple[Column, Column]:
    blocks = F.regexp_extract_all(content, F.lit(_SUMMARY_RE), 0)
    body = F.try_element_at(blocks, F.lit(1))
    # normalise attribute-carrying <p> tags, then strip every other tag
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(body, r'<p(\s+\S+=".+?")+\s*(/)?>', "<p$2>"),
            r"(?!</?p\s*/?>)<.*?>",
            "",
        )
    )
    err = F.when(F.size(blocks) > 1, F.lit("More than one summary node!"))
    return F.when(F.size(blocks) == 1, cleaned), err


# ----------------------------------------------- nested internal works
# TeiNestedData.scala:23-245 (round-3 verdict ask #5): a manuscript
# explodes into child works — msItem elements (single-part manuscripts,
# recursive; titles from a single <title> child, else the one
# type="original", else "<wrapper> item N"; other titles become
# alternative titles), or msPart elements (multi-part manuscripts, titled
# "<wrapper> part N", items nested inside their msContents) when there are
# no top-level items.  Manuscripts in the Fihrist catalogue (idno
# type="catalogue") skip LOWER-level items (TeiNestedData.scala:149-167).
#
# Arbitrary-depth same-tag recursion is the one shape fixed regexes can't
# express, so this is an Arrow-batched pandas UDF over a real XML parser —
# the sanctioned X1-style escape hatch (one UDF per manuscript record, not
# per event).  Reference ids come from the xml:id attribute
# (TeiOps.scala:45-52).

_INTERNAL_T = (
    "struct<works:array<struct<id:string,title:string,alts:array<string>,"
    "depth:int,parent:string>>,error:string>"
)


def _local(tag):
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _extract_internal_works(content: str):
    """Pure-python core (testable without Spark): returns (works, error)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(content)
    except ET.ParseError as e:  # malformed XML errors the record
        return [], f"Could not parse TEI XML: {e}"

    def find_all(node, *path):
        cur = [node]
        for name in path:
            cur = [c for n in cur for c in n if _local(c.tag) == name]
        return cur

    def get_id(node):
        for k, v in node.attrib.items():
            if _local(k) == "id" or k == "id":
                return v.strip()
        return None

    def text(node):
        return "".join(node.itertext())

    # catalogues → fihrist check
    catalogues = [
        text(n)
        for n in find_all(root, "teiHeader", "fileDesc", "publicationStmt", "idno")
        if n.get("type") == "catalogue"
    ]
    fihrist = any(c.strip().lower() == "fihrist" for c in catalogues)

    works, errors = [], []

    def item_title(item, wrapper, i):
        titles = [c for c in item if _local(c.tag) == "title"]
        if len(titles) == 1:
            return text(titles[0]), []
        originals = [t for t in titles if (t.get("type") or "").lower() == "original"]
        alts = [
            text(t).strip()
            for t in titles
            if (t.get("type") or "").lower() != "original"
        ] if titles else []
        if len(originals) == 1:
            return text(originals[0]), alts
        return f"{wrapper} item {i}", alts

    def walk_items(parent_nodes, wrapper, depth, parent_id, allow_lower):
        items = [c for n in parent_nodes for c in n if _local(c.tag) == "msItem"]
        for i, item in enumerate(items, 1):
            wid = get_id(item)
            if wid is None:
                errors.append("Could not find an id in node!")
                continue
            title, alts = item_title(item, wrapper, i)
            works.append((wid, title, alts, depth, parent_id))
            if allow_lower and not fihrist:
                walk_items([item], title, depth + 1, wid, allow_lower)

    msdescs = [
        d
        for srcdesc in root.iter()
        if _local(srcdesc.tag) == "msDesc"
        for d in [srcdesc]
    ]
    contents = [c for d in msdescs for c in d if _local(c.tag) == "msContents"]
    n_before = len(works)
    walk_items(contents, wrapper_title(root), 1, None, True)
    if len(works) == n_before:  # no top-level items → msPart path
        parts = [c for d in msdescs for c in d if _local(c.tag) == "msPart"]
        for i, part in enumerate(parts, 1):
            pid = get_id(part)
            if pid is None:
                errors.append("Could not find an id in node!")
                continue
            ptitle = f"{wrapper_title(root)} part {i}"
            works.append((pid, ptitle, [], 1, None))
            # items under a part come via extractLowerLevelItems, which the
            # Fihrist rule suppresses entirely (TeiNestedData.scala:149-167)
            if not fihrist:
                pcontents = [c for c in part if _local(c.tag) == "msContents"]
                walk_items(pcontents, ptitle, 2, pid, True)
    return works, (errors[0] if errors else None)


def wrapper_title(root):
    """The wrapper title is the manuscript's reference number — the single
    <idno type="msID"> (matching this slice's title rule)."""
    ids = [
        "".join(n.itertext()).strip()
        for n in root.iter()
        if _local(n.tag) == "idno" and n.get("type") == "msID"
    ]
    return ids[0] if len(ids) == 1 else ""


def tei_internal_works_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_INTERNAL_T)
    def _extract(contents: pd.Series) -> pd.DataFrame:
        out = {"works": [], "error": []}
        for c in contents:
            works, err = _extract_internal_works(c or "")
            out["works"].append(
                [
                    {"id": w[0], "title": w[1], "alts": w[2], "depth": w[3],
                     "parent": w[4]}
                    for w in works
                ]
            )
            out["error"].append(err)
        return pd.DataFrame(out)

    return _extract


def transform_tei(records: DataFrame) -> DataFrame:
    """records(id, content = TEI XML[, deleted]) → one top-level work row
    per manuscript."""
    if "deleted" not in records.columns:
        records = records.withColumn("deleted", F.lit(False))
    content = F.col("content")
    deleted = F.coalesce(F.col("deleted"), F.lit(False))

    msids = F.transform(
        F.regexp_extract_all(content, F.lit(_IDNO_MSID_RE), 1),
        lambda v: F.trim(v),
    )
    refno = F.when((F.size(msids) == 1) & (F.try_element_at(msids, F.lit(1)) != ""),
                   F.try_element_at(msids, F.lit(1)))
    ref_err = (
        F.when(F.size(msids) == 0, F.lit("No <idno type='msID'> found!"))
        .when((F.size(msids) == 1) & (F.try_element_at(msids, F.lit(1)) == ""),
              F.lit("Empty <idno type='msID'> found!"))
        .when(F.size(msids) > 1, F.lit("Multiple instances of <idno type='msID'> found!"))
    )

    bnums = F.transform(
        F.regexp_extract_all(content, F.lit(_SIERRA_ALT_RE), 1),
        lambda v: F.trim(v),
    )
    bnum = F.when(F.size(bnums) == 1, F.try_element_at(bnums, F.lit(1)))
    bnum_err = F.when(F.size(bnums) > 1, F.lit("More than one sierra bnumber node!"))

    summary, sum_err = _summary_expr(content)
    nested = tei_internal_works_udf()(content)
    nested_err = nested.getField("error")
    err = F.coalesce(ref_err, bnum_err, sum_err, nested_err)

    merge = F.when(
        bnum.rlike(r"^b[0-9]{7}[0-9x]$"),
        F.array(
            F.concat(
                F.lit("sierra-system-number:"), bnum,
                F.lit(":Bnumber present in TEI file"),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))

    wtype = (
        F.when(deleted, F.lit("Deleted"))
        .when(err.isNotNull(), F.lit("Error"))
        .otherwise(F.lit("Visible"))
    )
    live = wtype == "Visible"
    return records.select(
        F.col("id"),
        wtype.alias("type"),
        F.when(deleted, F.lit("DeletedFromSource(Deleted by TEI source)"))
        .when(err.isNotNull(), err)
        .alias("reason"),
        F.when(live, refno).alias("title"),
        F.when(live, refno).alias("reference_number"),
        F.when(live, bnum).alias("b_number"),
        F.when(live, summary).alias("description"),
        F.when(live, merge).otherwise(F.array().cast("array<string>")).alias(
            "merge_candidates"
        ),
        F.when(
            live,
            F.transform(
                nested.getField("works"),
                lambda w: F.concat_ws(
                    "|",
                    w.getField("id"),
                    w.getField("title"),
                    F.array_join(w.getField("alts"), ";"),
                    w.getField("depth"),
                    F.coalesce(w.getField("parent"), F.lit("-")),
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("internal_works"),
        *_tei_field_columns(content, live),
    )


def _tei_field_columns(content, live):
    """The round-5 TEI field families (plans/tei_fields.py): the top-level
    work's languages/notes/physical-description/subjects/contributors/
    production plus per-nested-work rows, masked to live rows like every
    other transformed field (TeiXml.scala:20-37, TeiNestedData.scala)."""
    from .tei_fields import tei_fields_udf

    f = tei_fields_udf()(content)
    empty = F.array().cast("array<string>")
    arr = lambda c: F.when(live, c).otherwise(empty)  # noqa: E731
    return [
        arr(f.getField("languages")).alias("languages"),
        arr(f.getField("notes")).alias("notes"),
        F.when(live, f.getField("physical_description")).alias(
            "physical_description"
        ),
        arr(f.getField("subjects")).alias("subjects"),
        arr(f.getField("contributors")).alias("contributors"),
        F.when(live, f.getField("production")).alias("production"),
        arr(
            F.transform(
                f.getField("items"),
                lambda i: F.concat_ws(
                    "|",
                    i.getField("id"),
                    F.array_join(i.getField("languages"), ";"),
                    F.array_join(i.getField("notes"), ";"),
                    F.array_join(i.getField("contributors"), ";"),
                    F.coalesce(i.getField("physical_description"), F.lit("-")),
                    F.coalesce(i.getField("production"), F.lit("-")),
                ),
            )
        ).alias("internal_fields"),
    ]
