"""Per-source transformer slice #5: METS digitised-content records.

METS files describe DIGITISED content (Goobi scans, Archivematica
born-digital packages); their works are always **Invisible** — they exist to
be merged into the Sierra/CALM work by the merger's ItemsRule/ThumbnailRule
(which plans/merger.py already models abstractly).  This slice maps the
source records themselves (pipeline/transformer/transformer_mets), closing
the source-family set: EBSCO, Sierra, CALM, Miro, METS.

Rules carried over (file:line under transformer_mets/src/main/.../mets):

* identifier   — the record identifier LOWERCASED (Goobi writes 'B20442233'
                 where Sierra says 'b20442233'; Archivematica ids are
                 already lowercase UUIDs) (transformer/MetsData.scala:19-30)
* deleted      — Deleted(DeletedFromSource(Mets)) (MetsData.scala:33-44)
* visibility   — every live METS work is
                 Invisible(MetsWorksAreNotVisible) (MetsData.scala:70-96)
* title        — all DISTINCT dmdSec > mdWrap >> titleInfo > title texts
                 joined with spaces; empty allowed
                 (transformers/MetsTitle.scala)
* access conds — MODS accessCondition[@type]: 'dz' → licence, 'status' →
                 access status, 'usage' → usage note
                 (transformers/ModsAccessConditions.scala)
* licence      — special cases 'copyright not cleared' (ci) /
                 'rightsstatements.org/page/InC/1.0/?language=en' /
                 'all rights reserved' (ci) → in-copyright; otherwise match
                 the License table on id (ci), label (ci) or url (exact);
                 no match → the record errors
                 (transformers/MetsLicence.scala, License.scala)
* accessStatus — Open; Open with advisory / Requires registration →
                 OpenWithAdvisory; Restricted files / Clinical images →
                 Restricted; Closed; unknown → error
                 (transformers/MetsAccessStatus.scala)
* merge cand   — a lowercased b-number → sierra-system-number else
                 calm-ref-no, reason 'METS work'
                 (transformers/MetsMergeCandidate.scala)

Out of this slice (documented): fileSec/structMap parsing (FileReferences,
thumbnail selection, image data, DLCS filename normalisation) and the
Archivematica Premis variant — location plumbing, not field semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# License.scala values: id, label, url
_LICENSES = [
    ("cc-by", "Attribution 4.0 International (CC BY 4.0)",
     "http://creativecommons.org/licenses/by/4.0/"),
    ("cc-by-nc", "Attribution-NonCommercial 4.0 International (CC BY-NC 4.0)",
     "https://creativecommons.org/licenses/by-nc/4.0/"),
    ("cc-by-nc-nd",
     "Attribution-NonCommercial-NoDerivatives 4.0 International (CC BY-NC-ND 4.0)",
     "https://creativecommons.org/licenses/by-nc-nd/4.0/"),
    ("cc-0", "CC0 1.0 Universal",
     "https://creativecommons.org/publicdomain/zero/1.0/legalcode"),
    ("pdm", "Public Domain Mark",
     "https://creativecommons.org/share-your-work/public-domain/pdm/"),
    ("cc-by-nd", "Attribution-NoDerivatives 4.0 International (CC BY-ND 4.0)",
     "https://creativecommons.org/licenses/by-nd/4.0/"),
    ("cc-by-sa", "Attribution-ShareAlike 4.0 International (CC BY-SA 4.0)",
     "https://creativecommons.org/licenses/by-sa/4.0/"),
    ("cc-by-nc-sa",
     "Attribution-NonCommercial-ShareAlike 4.0 International (CC BY-NC-SA 4.0)",
     "https://creativecommons.org/licenses/by-nc-sa/4.0/"),
    ("ogl", "Open Government Licence", ""),
    ("opl", "Open Parliament Licence", ""),
    ("inc", "In copyright", "http://rightsstatements.org/vocab/InC/1.0/"),
]

_TITLE_RE = (
    r"(?s)<(?:\w+:)?titleInfo[^>]*>\s*<(?:\w+:)?title[^>]*>(.*?)</(?:\w+:)?title>"
)


def _access_condition(content: Column, typ: str) -> Column:
    return F.nullif(
        F.trim(
            F.regexp_extract(
                content,
                rf'(?s)<(?:\w+:)?accessCondition[^>]*type="{typ}"[^>]*>(.*?)</(?:\w+:)?accessCondition>',
                1,
            )
        ),
        F.lit(""),
    )


def _licence_expr(dz: Column) -> tuple[Column, Column]:
    """(licence_id, error) per MetsLicence.scala."""
    low = F.lower(dz)
    special = F.when(
        low.isin("copyright not cleared", "all rights reserved")
        | (dz == "rightsstatements.org/page/InC/1.0/?language=en"),
        F.lit("inc"),
    )
    table = F.coalesce(
        *[
            F.when((low == i) | (low == lbl.lower()) | (dz == url), F.lit(i))
            for i, lbl, url in _LICENSES
        ]
    )
    licence = F.coalesce(special, table)
    err = F.when(
        dz.isNotNull() & licence.isNull(),
        F.concat(F.lit("Couldn't match "), dz, F.lit(" to a license")),
    )
    return F.when(dz.isNotNull(), licence), err


def _status_expr(status: Column) -> tuple[Column, Column]:
    low = F.lower(status)
    mapped = (
        F.when(low == "open", F.lit("Open"))
        .when(low.isin("open with advisory", "requires registration"), F.lit("OpenWithAdvisory"))
        .when(low.isin("restricted files", "clinical images"), F.lit("Restricted"))
        .when(low == "closed", F.lit("Closed"))
    )
    err = F.when(
        status.isNotNull() & mapped.isNull(),
        F.concat(F.lit("Couldn't match "), status, F.lit(" to an access status")),
    )
    return mapped, err


def transform_mets(records: DataFrame) -> DataFrame:
    """records(id = record identifier, content = METS XML[, deleted,
    last_modified]) → one work row per record."""
    if "deleted" not in records.columns:
        records = records.withColumn("deleted", F.lit(False))
    content = F.col("content")
    deleted = F.coalesce(F.col("deleted"), F.lit(False))
    rid = F.lower(F.col("id"))

    titles = F.array_distinct(
        F.transform(
            F.regexp_extract_all(content, F.lit(_TITLE_RE), 1),
            lambda t: F.trim(t),
        )
    )
    title = F.array_join(titles, " ")

    licence, lic_err = _licence_expr(_access_condition(content, "dz"))
    status, st_err = _status_expr(_access_condition(content, "status"))
    usage = _access_condition(content, "usage")
    err = F.coalesce(lic_err, st_err)

    is_bnum = rid.rlike(r"^b[0-9]{7}[0-9x]$")
    merge = F.when(
        is_bnum, F.concat(F.lit("sierra-system-number:"), rid, F.lit(":METS work"))
    ).otherwise(F.concat(F.lit("calm-ref-no:"), F.col("id"), F.lit(":METS work")))

    wtype = (
        F.when(deleted, F.lit("Deleted"))
        .when(err.isNotNull(), F.lit("Error"))
        .otherwise(F.lit("Invisible"))
    )
    live = wtype == "Invisible"
    return records.select(
        rid.alias("id"),
        wtype.alias("type"),
        F.when(deleted, F.lit("DeletedFromSource(Mets)"))
        .when(err.isNotNull(), err)
        .otherwise(F.lit("MetsWorksAreNotVisible"))
        .alias("reason"),
        F.when(live, title).alias("title"),
        F.when(live, licence).alias("licence"),
        F.when(live, status).alias("access_status"),
        F.when(live, usage).alias("access_usage"),
        # DeletedMetsData carries no merge candidates (MetsData.scala:33-44)
        F.when(live, F.array(merge))
        .otherwise(F.array().cast("array<string>"))
        .alias("merge_candidates"),
    )
