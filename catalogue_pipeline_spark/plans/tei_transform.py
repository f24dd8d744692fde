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
    err = F.coalesce(ref_err, bnum_err, sum_err)

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
    )
