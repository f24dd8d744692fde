"""Per-source transformer slice #3: CALM archive records → work fields.

CALM (the archives catalogue) is the reference's third major source
(pipeline/transformer/transformer_calm).  A CALM record is a **key → list
of values map** (`CalmRecord(id, data: Map[String, List[String]],
retrievedAt)`, common/source_model/.../calm/CalmRecord.scala:5-13) — so this
slice exercises Spark's THIRD extraction substrate after EBSCO (XML regex)
and Sierra (JSON structs): a ``map<string, array<string>>`` column traversed
with ``element_at`` + array higher-order functions, all JVM-side.

Rules carried over (CalmTransformer.scala, file:line for parity):

* record access  — getList: trim values, drop whitespace-only, fix the
                   known mojibake pairs; get = first value
                   (transformers/CalmRecordOps.scala:4-21, fixEncoding :30+)
* suppression    — a record is suppressed unless CatalogueStatus is one of
                   {catalogued, not yet available, partially catalogued,
                   third-party metadata} (lowercased/trimmed), and records
                   whose RefNo starts with AMSG (resource guides) are
                   always suppressed (:108-131)
* deleted        — Deleted(DeletedFromSource(Calm)); suppressed →
                   Deleted(SuppressedFromSource(Calm)) (:34-41)
* mandatory      — Title, then Level, then RefNo, in THAT precedence
                   (the workData for-comprehension, :146-149): missing →
                   Invisible(SourceFieldMissing(...)); Level
                   'group of pieces' → Invisible(UnableToTransform),
                   unknown level → Invisible(InvalidValueInSourceField)
                   (:95-105, :199-220)
* work type      — collection→Collection; (sub)*section→Section;
                   (sub)*series→Series; item/piece→Standard (:199-213)
* title          — normalized keeping only <i> tags (:182-187)
* collectionPath — path=RefNo, label=AltRefNo; referenceNumber = the label
                   (:189-197 + workData wiring) — this is what feeds the
                   path-hierarchy queries (plans/graph.py / q48/q51)
* identifiers    — RefNo→calm-ref-no, AltRefNo→calm-altref-no,
                   BNumber→sierra-system-number, AccNo→accession-number,
                   values tag-stripped (:14-19, :168-181).  The reference
                   iterates an unordered Map; we pin declaration order.
* format         — Material == 'Archives - Digital' → hdig/Born-digital
                   archives, else h/Archives and manuscripts
                   (transformers/CalmFormat.scala)
* alt titles     — Alternative_Title values (CalmAlternativeTitles.scala)
* subjects       — Subject values, tag-stripped (CalmSubjects.scala)
* description    — Description values joined ' ', normalized with the
                   basic tag whitelist (:223-224)
* phys. desc.    — Extent ++ UserWrapped6 joined ' ' (:226-230)
* production     — Date values: ONE event labelled by the ' '-joined
                   values; each date goes through the engine's period
                   parser (ParsedPeriod, :232-247) — prod_from/prod_to are
                   the union (min from, max to) of the parsed dates
* merge cands    — BNumber (validated b-number) → 'CALM/Sierra harvest
                   work'; RefNo (validated ref-no) → 'Archivematica work'
                   (transformers/CalmMergeCandidates.scala)

Out of this slice (documented): CalmItems/CalmNotes/CalmLanguages/
CalmTermsOfUse/CalmAccessStatus — note/language/access rule families.

NormaliseText approximation (documented): the reference sanitizes through
jsoup Safelists (NormaliseText.scala).  Re-expressed as JVM regex: tags
outside the whitelist are stripped, entities unescaped, lines
right-trimmed, output trimmed; attribute filtering and blank-line
collapsing are approximated (attributes on whitelisted tags are kept).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# single-char mojibake (1-to-1): one translate pass
_TRANSLATE_FROM = (
    "\u0080\u0082\u0085\u0086\u008a\u008c\u0091\u0092\u0093\u0094"
    "\u0095\u0096\u0097\u0099\u009a\u009b\u009c\u009e"
)
_TRANSLATE_TO = "\u20ac\u201a\u2026\u2020\u0160\u0152\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u2122\u0161\u203a\u0153\u017e"
# multi-char sequences (run BEFORE the single-char pass -- they contain
# the same control bytes)
_MULTI = [
    ("\u00e2\u0080\u0093", "\u2013"),
    ("\u00c2\u00b0", "\u00b0"),
    ("\u00c3\u00a7", "\u00e7"),
    ("\u00c3\u00a8", "\u00e8"),
    ("\u00c3\u0089", "\u00c9"),
    ("\u00c3\u00aa", "\u00ea"),
]

_BASIC_TAGS = (
    "a|b|blockquote|br|cite|code|dd|dl|dt|em|i|li|ol|p|pre|q|small|span|"
    "strike|strong|sub|sup|u|ul"
)


def fix_encoding(c: Column) -> Column:
    for a, b in _MULTI:
        c = F.replace(c, F.lit(a), F.lit(b))
    return F.translate(c, _TRANSLATE_FROM, _TRANSLATE_TO)


def _unescape(c: Column) -> Column:
    for a, b in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&#39;", "'"), ("&amp;", "&")]:
        c = F.replace(c, F.lit(a), F.lit(b))
    return c


def normalise_text(c: Column, whitelist: str | None = None) -> Column:
    """NormaliseText: strip tags outside the whitelist (None = all tags),
    unescape entities, right-trim lines, trim."""
    if whitelist:
        pat = rf"<(?!/?(?:{whitelist})\b)[^>]*>"
    else:
        pat = r"<[^>]*>"
    out = F.regexp_replace(c, pat, "")
    out = _unescape(out)
    out = F.regexp_replace(out, r"[ \t]+\n", "\n")
    # Java-style trim (all whitespace incl. newlines), not Spark's space-only
    return F.regexp_replace(F.regexp_replace(out, r"^\s+", ""), r"\s+$", "")


def _get_list(data: Column, key: str) -> Column:
    return F.transform(
        F.filter(
            F.coalesce(
                F.try_element_at(data, F.lit(key)),
                F.array().cast("array<string>"),
            ),
            lambda v: F.trim(v) != "",
        ),
        lambda v: fix_encoding(F.trim(v)),
    )


def _get(data: Column, key: str) -> Column:
    return F.try_element_at(_get_list(data, key), F.lit(1))


_LEVELS = {
    "collection": "Collection",
    "section": "Section",
    "subsection": "Section",
    "subsubsection": "Section",
    "subsubsubsection": "Section",
    "series": "Series",
    "subseries": "Series",
    "subsubseries": "Series",
    "subsubsubseries": "Series",
    "item": "Standard",
    "piece": "Standard",
}

_NON_SUPPRESSED_STATUSES = [
    "catalogued", "not yet available", "partially catalogued",
    "third-party metadata",
]

_ID_KEYS = [
    ("RefNo", "calm-ref-no"),
    ("AltRefNo", "calm-altref-no"),
    ("BNumber", "sierra-system-number"),
    ("AccNo", "accession-number"),
]

_BNUMBER_RE = r"^b[0-9]{7}[0-9x]$"
_REFNO_RE = r"^([A-Za-z0-9]+/?)+$"


def transform_calm(records: DataFrame) -> DataFrame:
    """records(id, data: map<string,array<string>>, deleted[, retrieved_at])
    → one work row per record (same Visible/Deleted/Invisible discipline as
    the other transformer slices; merge candidates computed for Visible
    works only, matching CalmTransformer.scala:66-76 where state-with-
    candidates is only built on the valid path)."""
    if "retrieved_at" not in records.columns:
        records = records.withColumn(
            "retrieved_at", F.lit(None).cast("timestamp")
        )
    data = F.col("data")
    deleted = F.coalesce(F.col("deleted"), F.lit(False))

    status = F.lower(F.trim(F.coalesce(_get(data, "CatalogueStatus"), F.lit(""))))
    refno = _get(data, "RefNo")
    suppressed = (~status.isin(*_NON_SUPPRESSED_STATUSES)) | F.coalesce(
        refno.startswith("AMSG"), F.lit(False)
    )

    raw_title = _get(data, "Title")
    level = F.lower(F.coalesce(_get(data, "Level"), F.lit("")))
    work_type = F.coalesce(
        *[F.when(level == k, F.lit(v)) for k, v in _LEVELS.items()]
    )
    reason = (
        F.when(deleted, F.lit("DeletedFromSource(Calm)"))
        .when(suppressed, F.lit("SuppressedFromSource(Calm)"))
        .when(raw_title.isNull(), F.lit("SourceFieldMissing(Calm:Title)"))
        .when(level == "", F.lit("SourceFieldMissing(Calm:Level)"))
        .when(
            level == "group of pieces",
            F.lit("UnableToTransform(Calm:Suppressed level - group of pieces)"),
        )
        .when(
            work_type.isNull(),
            F.concat(F.lit("InvalidValueInSourceField(Calm:Level - "), level, F.lit(")")),
        )
        .when(refno.isNull(), F.lit("SourceFieldMissing(Calm:RefNo)"))
    )
    wtype = (
        F.when(deleted | suppressed, F.lit("Deleted"))
        .when(reason.isNotNull(), F.lit("Invisible"))
        .otherwise(F.lit("Visible"))
    )
    visible = wtype == "Visible"

    def _id_part(key, typ):
        # closure factory: a default-arg lambda would take arity 2 and
        # receive the array INDEX as its second argument from F.transform
        return F.transform(
            _get_list(data, key),
            lambda v: F.concat(F.lit(typ + ":"), normalise_text(v)),
        )

    ids = F.flatten(F.array(*[_id_part(k, t) for k, t in _ID_KEYS]))
    bnum = _get(data, "BNumber")
    merge = F.concat(
        F.when(
            bnum.rlike(_BNUMBER_RE),
            F.array(
                F.concat(
                    F.lit("sierra-system-number:"), bnum,
                    F.lit(":CALM/Sierra harvest work"),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
        F.when(
            refno.rlike(_REFNO_RE),
            F.array(
                F.concat(F.lit("calm-ref-no:"), refno, F.lit(":Archivematica work"))
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    is_digital = _get(data, "Material") == "Archives - Digital"
    phys = F.concat(_get_list(data, "Extent"), _get_list(data, "UserWrapped6"))
    dates = _get_list(data, "Date")
    empty = F.array().cast("array<string>")

    def dstr(c):
        return F.when(visible, c)

    def darr(c):
        return F.when(visible, c).otherwise(empty)

    return records.select(
        F.col("id"),
        wtype.alias("type"),
        reason.alias("reason"),
        dstr(normalise_text(raw_title, "i")).alias("title"),
        dstr(work_type).alias("work_type"),
        dstr(refno).alias("collection_path"),
        dstr(_get(data, "AltRefNo")).alias("path_label"),
        dstr(_get(data, "AltRefNo")).alias("reference_number"),
        darr(ids).alias("other_identifiers"),
        dstr(
            F.when(is_digital, F.lit("hdig")).otherwise(F.lit("h"))
        ).alias("format_id"),
        dstr(
            F.when(is_digital, F.lit("Born-digital archives")).otherwise(
                F.lit("Archives and manuscripts")
            )
        ).alias("format_label"),
        darr(_get_list(data, "Alternative_Title")).alias("alternative_titles"),
        darr(
            F.transform(_get_list(data, "Subject"), lambda v: normalise_text(v))
        ).alias("subjects"),
        dstr(
            F.when(
                F.size(_get_list(data, "Description")) > 0,
                normalise_text(
                    F.array_join(_get_list(data, "Description"), " "), _BASIC_TAGS
                ),
            )
        ).alias("description"),
        dstr(
            F.when(F.size(phys) > 0, normalise_text(F.array_join(phys, " ")))
        ).alias("physical_description"),
        dstr(F.when(F.size(dates) > 0, F.array_join(dates, " "))).alias(
            "production_label"
        ),
        darr(dates).alias("production_dates"),
        darr(merge).alias("merge_candidates"),
        F.col("retrieved_at"),
        *_calm_field_columns(data, dstr, darr),
    )


def _calm_field_columns(data, dstr, darr):
    """The round-5 CALM field families (plans/calm_fields.py — notes,
    languages, terms-of-use, access status, items), masked to Visible rows
    like every other transformed field (CalmTransformer.scala:144-165)."""
    from .calm_fields import with_calm_fields

    cols = with_calm_fields(data)
    return [
        darr(cols["languages"]).alias("languages"),
        darr(cols["notes"]).alias("notes"),
        dstr(cols["terms_of_use"]).alias("terms_of_use"),
        dstr(cols["access_status"]).alias("access_status"),
        darr(cols["items"]).alias("items"),
    ]


def with_parsed_production(works: DataFrame) -> DataFrame:
    """Run every Date value through the engine's period parser (the
    reference's ParsedPeriod, CalmTransformer.scala:237-244) and attach the
    union range: prod_from = min parsed from, prod_to = max parsed to."""
    from ..functions.periods import parse_period_udf

    exploded = works.select(
        "id", F.explode_outer("production_dates").alias("_d")
    ).withColumn(
        "_p", F.when(F.col("_d").isNotNull(), parse_period_udf()(F.col("_d")))
    )
    rng = exploded.groupBy("id").agg(
        F.min(F.col("_p.from_date").cast("string")).alias("prod_from"),
        F.max(F.col("_p.to_date").cast("string")).alias("prod_to"),
    )
    return works.join(rng, "id", "left")
