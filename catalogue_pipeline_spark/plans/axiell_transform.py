"""Per-source transformer slice: Axiell MARCXML → work fields.

Axiell Collections is the reference's newest source (the CALM successor,
harvested over OAI-PMH as MARCXML).  Its work builder extends the shared
MARC rules with archive-specific semantics.  Re-expressed Spark-first —
every rule is a column expression inside whole-stage codegen (regex MARCXML
field extraction + HOFs); the only Python is the Arrow-batched period
parser already shared with CALM/EBSCO.

Rules ported (reference files under
catalogue_graph/src/adapters/transformers/):

  * suppression   — 583-ind1=0 $l catalogue status must be one of
                    {catalogued, partially complete} (axiell/
                    catalogue_status.py: unknown value = record error);
                    981 $a publish-to-web: only an explicit 'no' suppresses
                    (axiell/publish_to_web.py); AMSG-prefixed alt-ref-no
                    records (research guides) suppress
                    (builders/axiell_work_builder.py _is_suppresssed —
                    checked in that order, BEFORE collection_path, so a
                    suppressed record without a RefNo is Deleted, not Error)
  * title         — shared 245 rules (marc/title.py; reused from the EBSCO
                    slice verbatim)
  * work type     — 351 $c hierarchical level, lowercased, through the
                    level table; missing/unknown level = record error
                    (axiell/organisation_and_arrangement.py)
  * other ids     — 035 $a "(prefix)value" through the origin-code table;
                    'Library Reference Number' splits calm-altref-no ('/'
                    in value) vs iconographic-number; accession numbers
                    drop the redundant 'Acc' prefix; sierra-system-numbers
                    drop the migration's leading '.'; ignored prefixes are
                    silently skipped (marc/other_identifiers.py)
  * collection    — path from the LAST calm-ref-no other-identifier, label
                    from the LAST calm-altref-no; missing RefNo on a
                    non-suppressed record = error
                    (axiell_work_builder.py collection_path)
  * predecessor   — 907 $a UUID → calm-record-id; multiple distinct values
                    or a non-UUID value = record error
                    (marc/predecessor_identifier.py)
  * format        — 655 ind2=7 $2=local $a: 'Archives - Digital' anywhere →
                    hdig/Born-digital archives, else h/Archives and
                    manuscripts (axiell/format.py)
  * items/access  — exactly one Unidentifiable item in Closed stores; 506
                    $f status through the access-status table, falling back
                    to Closed when 506 $g (closed-until) is in the future
                    (axiell/access_status.py, axiell_work_builder.py items)
  * description   — 520 $a joined with spaces, normalised
                    (axiell/description.py); physical description 300 $a
                    (axiell/physical_description.py)
  * subjects      — 653 $a, '<p>' LoC-link prefix stripped, trailing
                    period trimmed, label-derived concept ids
                    (axiell/subjects.py, ebsco/label_subdivisions.py)
  * contributors  — 720 $a verbatim labels → Agent with label-derived id
                    (axiell/contributors.py)
  * languages     — 546 $a through the staged matcher: exact whole-string
                    name match, separator-split all-match, misspelling
                    corrections, XML language-tag strip; fallback keeps the
                    verbatim text as a language note and salvages any
                    capitalised words that name languages
                    (axiell/languages.py; the language-name table is a
                    REPRESENTATIVE subset of the MARC code list, the
                    convention documented for the Sierra slice)
  * notes         — the shared 5xx tag table (marc/notes.py) minus
                    506/540/546, plus 590 finding-aids, 351 $b arrangement,
                    the composed terms-of-use note and language notes; $5
                    suppressed everywhere; $u rendered as an HTML link;
                    561/583/541 require ind1=1; 535 ind1=2 → location of
                    duplicates; contents normalised, empties dropped
                    (axiell/notes.py)
  * terms of use  — 506 $a conditions (period-terminated) composed with
                    the access status and 506/540 $g dates: closed-until /
                    restricted-until sentences are appended unless the
                    conditions already carry the same 'until <date>' text
                    (ordinal suffixes normalised, '1 January 2021' and
                    '01/01/2021' renderings both recognised)
                    (axiell/terms_of_use.py)
  * production    — 264 $c labels; exactly one label with BOTH 046 $k and
                    $l parsed dates uses those (bare years widened to
                    1 Jan / 31 Dec), otherwise each label goes through the
                    shared period parser; to-instants render with the Scala
                    pipeline's .999999999Z nanosecond precision
                    (axiell/production.py, axiell/dates.py)
  * modified time — MARC 005 through the 'yyyyMMddHHmmss.S' parse → UTC
                    ISO; version = its epoch seconds (marc/
                    last_transaction_time.py, source_work_builder.py)
  * merge cands   — sierra-system-number → 'CALM/Sierra harvest work',
                    calm-ref-no → 'Archivematica work', in identifier order
                    (axiell_work_builder.py visible_work_state)
  * deletion facts— reconciler facts (guid, last_modified) tombstone their
                    guid as Deleted works (axiell_transformer.py
                    _transform_row, builders/reconciler_work_builder.py)

Input contract: records(id, content MARCXML[, deleted, last_modified]) —
the S5/J4 snapshot-loader shape — plus an optional deletion-facts frame
(id, guid, last_modified).  Per-record failures become type='Error' rows
with the reference's error strings instead of aborting the batch
(adapters/steps/transformer.py success/failure accounting).

SCALE: one narrow projection per record — no shuffle, no per-row Python on
the bulk path (the period parser is the shared Arrow-batched UDF applied
only to exploded 264 labels, ≤ a handful per record).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .marc_transform import (
    _CONTROL_001_RE,
    _SUBFIELD_RE,
    _all_datafield_blocks,
    _sub_code,
    _sub_value,
    _title_expr,
    _xml_unescape,
)
from ..functions import label_derived_value

# --------------------------------------------------------------- lookups

# axiell/organisation_and_arrangement.py LEVEL_TO_WORK_TYPE_MAPPING
_LEVEL_TO_WORK_TYPE = {
    "collection": "Collection",
    "section": "Section",
    "sub-section": "Section",
    "series": "Series",
    "sub-series": "Series",
    "item": "Standard",
    "item part": "Standard",
    "sub-fonds": "Section",
    "fonds": "Collection",
    "file": "Standard",
}

# axiell/catalogue_status.py
_NON_SUPPRESSED_STATUSES = ("catalogued", "partially complete")
_KNOWN_STATUSES = ("catalogued", "draft", "partially complete", "in progress")

# marc/other_identifiers.py ORIGIN_CODE_TO_ID_TYPE
_ORIGIN_CODE_TO_ID_TYPE = {
    "Bibliographic Number": "sierra-system-number",
    "Mimsy reference": "mimsy-reference",
    "Sierra Number": "sierra-identifier",
    "WI number": "miro-image-number",
    "accession number": "wellcome-accession-number",
    "Calm RefNo": "calm-ref-no",
    "AltRefNo": "calm-altref-no",
}

# axiell/access_status.py ACCESS_STATUS_MAPPING (ids in the repo's
# access-status vocabulary, shared with the Sierra/CALM slices)
_ACCESS_STATUS = {
    "OPEN": "open",
    "OPENWITHADVISORY": "open-with-advisory",
    "RESTRICTED": "restricted",
    "RESTRICTIONSAPPLY": "restricted",
    "PERMISSIONREQUIRED": "permission-required",
    "DEACCESSIONED": "unavailable",
    "MISSING": "unavailable",
    "SAFEGUARDED": "safeguarded",
    "BYAPPOINTMENT": "by-appointment",
    "CLOSED": "closed",
}

# marc/notes.py _NOTES_FIELDS as tag → (note-type id, label); 535 resolved
# by indicator below.  506/540/546 are EXCLUDED for Axiell (custom logic).
_NOTE_TAGS = {
    "500": ("general-note", "Notes"),
    "501": ("general-note", "Notes"),
    "502": ("dissertation-note", "Dissertation note"),
    "504": ("bibliographic-info", "Bibliographic information"),
    "505": ("contents", "Contents"),
    "508": ("credits", "Creator/production credits"),
    "510": ("references-note", "References note"),
    "511": ("credits", "Creator/production credits"),
    "514": ("lettering-note", "Lettering note"),
    "515": ("numbering-note", "Numbering note"),
    "518": ("time-and-place-note", "Time and place note"),
    "524": ("reference", "Reference"),
    "525": ("general-note", "Notes"),
    "533": ("reproduction-note", "Reproduction note"),
    "534": ("reproduction-note", "Reproduction note"),
    "535": ("location-of-original", "Location of original"),  # ind1=2 → dup
    "536": ("funding-info", "Funding information"),
    "541": ("acquisition-note", "Acquisition note"),
    "542": ("copyright-note", "Copyright note"),
    "544": ("related-material", "Related material"),
    "545": ("biographical-note", "Biographical note"),
    "547": ("general-note", "Notes"),
    "550": ("general-note", "Notes"),
    "561": ("ownership-note", "Ownership note"),
    "562": ("general-note", "Notes"),
    "563": ("binding-detail", "Binding detail"),
    "580": ("general-note", "Notes"),
    "581": ("publication-note", "Publications note"),
    "583": ("appraisal-note", "Appraisal note"),
    "584": ("accruals-note", "Accruals note"),
    "585": ("exhibitions-note", "Exhibitions note"),
    "586": ("awards-note", "Awards note"),
    "588": ("general-note", "Notes"),
}
# marc/notes.py NON_PRIVATE_NOTES: these only emit when ind1 = 1
_IND1_GATED_TAGS = ("561", "583", "541")

# lookups/languages.xml, REPRESENTATIVE subset (name/variant → MARC code);
# the full list is a data file in the reference — the subset convention is
# the one documented for the Sierra language-code table.
_LANGUAGE_NAMES = {
    "Afrikaans": "afr", "Arabic": "ara", "Armenian": "arm", "Bengali": "ben",
    "Bulgarian": "bul", "Burmese": "bur", "Catalan": "cat", "Chinese": "chi",
    "Mandarin": "chi", "Chipewyan": "chp", "Croatian": "hrv", "Czech": "cze",
    "Danish": "dan", "Dutch": "dut", "English": "eng",
    "Middle English": "enm", "Esperanto": "epo", "Fanti": "fat",
    "Finnish": "fin", "French": "fre", "Ganda": "lug", "Luganda": "lug",
    "Georgian": "geo", "German": "ger", "Greek": "gre", "Gujarati": "guj",
    "Hebrew": "heb", "Hindi": "hin", "Hungarian": "hun", "Icelandic": "ice",
    "Irish": "gle", "Italian": "ita", "Japanese": "jpn", "Korean": "kor",
    "Latin": "lat", "Malay": "may", "Mongolian": "mon", "Nepali": "nep",
    "Norwegian": "nor", "Panjabi": "pan", "Persian": "per", "Polish": "pol",
    "Portuguese": "por", "Romanian": "rum", "Russian": "rus",
    "Sanskrit": "san", "Scottish Gaelic": "gla", "Somali": "som",
    "Spanish": "spa", "Swahili": "swa", "Swedish": "swe",
    "Swiss German": "gsw", "Tamil": "tam", "Thai": "tha", "Tibetan": "tib",
    "Turkish": "tur", "Ukrainian": "ukr", "Urdu": "urd",
    "Vietnamese": "vie", "Welsh": "wel", "Yiddish": "yid",
}

# axiell/languages.py _FUZZY_CORRECTIONS (substring replaces, in order)
_FUZZY_CORRECTIONS = [
    ("Portugese", "Portuguese"), ("Portguese", "Portuguese"),
    ("Potuguese", "Portuguese"), ("Portugeuse", "Portuguese"),
    ("Swiss-German", "Swiss German"), ("Norweigan", "Norwegian"),
    ("Lugandan", "Luganda"), ("Enlgish", "English"),
    ("Itallian", "Italian"), ("Russain", "Russian"),
    ("Gujerati", "Gujarati"), ("Chipewayan", "Chipewyan"),
    ("Fante", "Fanti"),
]

_LANG_SEPARATORS = r"\n|;|\.|,|/|\band\b|`"
_LANGUAGE_TAG_RE = r'<language(?: langcode="[a-z]+")?>(.*?)</language>'

# transformers/utils/html.py BASIC_TAGS (normalise_text whitelist)
_BASIC_TAGS = (
    "a|b|blockquote|br|cite|code|dd|dl|dt|em|i|li|ol|p|pre|q|small|span|"
    "strike|strong|sub|sup|u|ul"
)


# --------------------------------------------------------------- helpers


def _lang_map() -> Column:
    return F.create_map(
        *[F.lit(x) for kv in _LANGUAGE_NAMES.items() for x in kv]
    )


def _blocks(content: Column, tag: str) -> Column:
    return _all_datafield_blocks(content, [tag])


def _ind(block: Column, n: int) -> Column:
    return F.regexp_extract(block, rf'ind{n}="(.)"', 1)


def _first_sub(block: Column, code: str) -> Column:
    """First $code of one datafield, entities decoded, verbatim."""
    return _xml_unescape(
        F.regexp_extract(
            block,
            rf'(?s)<(?:\w+:)?subfield[^>]*code="{code}"[^>]*>(.*?)</(?:\w+:)?subfield>',
            1,
        )
    )


def _nonempty_subs(content: Column, tag: str, code: str) -> Column:
    """non_empty_subfields (marc/common.py): first $code per field, trimmed,
    blanks dropped, field document order preserved."""
    vals = F.transform(_blocks(content, tag), lambda b: F.trim(_first_sub(b, code)))
    return F.filter(vals, lambda v: v != "")


def _first_nonempty_sub(content: Column, tag: str, code: str) -> Column:
    return F.try_element_at(_nonempty_subs(content, tag, code), F.lit(1))


def _normalise_text(c: Column) -> Column:
    """transformers/utils/html.py normalise_text with the 'basic' whitelist:
    strip non-whitelisted tags, right-trim lines, collapse leading/repeated
    blank lines, trim."""
    out = F.regexp_replace(c, rf"<(?!/?(?:{_BASIC_TAGS})\b)[^>]*>", "")
    out = F.regexp_replace(out, r"[ \t]+\n", "\n")
    out = F.regexp_replace(out, r"\n{3,}", "\n\n")
    return F.regexp_replace(F.regexp_replace(out, r"^\s+", ""), r"\s+$", "")


def _html_link(v: Column) -> Column:
    """format_as_html_link: wrap http(s) URLs, pass other text through."""
    t = F.trim(v)
    return F.when(
        t.rlike(r"^https?://[^\s/]+"),
        F.concat(F.lit('<a href="'), t, F.lit('">'), t, F.lit("</a>")),
    ).otherwise(v)


def _ordered_distinct(arr: Column) -> Column:
    """array_distinct keeps first occurrences in Spark — documented, relied
    on by the reference's in-order dedup of languages and notes."""
    return F.array_distinct(arr)


# ------------------------------------------------------------ extractors


def _catalogue_status(content: Column) -> Column:
    """583 ind1=0 $l, first non-empty, lowercased (NULL when absent)."""
    priv = F.filter(_blocks(content, "583"), lambda b: _ind(b, 1) == "0")
    vals = F.filter(
        F.transform(priv, lambda b: F.trim(_first_sub(b, "l"))), lambda v: v != ""
    )
    return F.lower(F.try_element_at(vals, F.lit(1)))


def _other_identifiers(content: Column) -> Column:
    """035 $a → array<struct<scheme,value>> in document order."""
    subs = F.transform(_blocks(content, "035"), lambda b: F.trim(_first_sub(b, "a")))

    origin_map = F.create_map(
        *[F.lit(x) for kv in _ORIGIN_CODE_TO_ID_TYPE.items() for x in kv]
    )

    def parse(a: Column) -> Column:
        body = F.substr(a, F.lit(2))  # a_subfield[1:]
        prefix = F.substring_index(body, ")", 1)
        value = F.substr(body, F.length(prefix) + 2)
        has_rpar = body.contains(")")
        lrn = prefix == "Library Reference Number"
        scheme = (
            F.when(lrn & value.contains("/"), F.lit("calm-altref-no"))
            .when(lrn, F.lit("iconographic-number"))
            .otherwise(F.try_element_at(origin_map, prefix))
        )
        fixed = (
            F.when(
                scheme == "wellcome-accession-number",
                F.trim(F.regexp_replace(value, r"^Acc", "")),
            )
            .when(scheme == "sierra-system-number", F.regexp_replace(value, r"^\.+", ""))
            .otherwise(value)
        )
        return F.when(
            has_rpar & scheme.isNotNull() & (fixed != ""),
            F.struct(scheme.alias("scheme"), fixed.alias("value")),
        )

    return F.filter(F.transform(subs, parse), lambda s: s.isNotNull())


def _last_of_scheme(ids: Column, scheme: str) -> Column:
    """axiell_work_builder.collection_path loops and overwrites — the LAST
    matching identifier wins."""
    matches = F.filter(ids, lambda s: s["scheme"] == scheme)
    return F.try_element_at(matches, F.lit(-1))["value"]


def _predecessor_raw(content: Column) -> Column:
    """907 $a distinct dot-stripped values + the single candidate — the
    shared half of marc/predecessor_identifier.py; the CALM (UUID) and
    Sierra (b-number) format gates sit on top (here and in
    folio_transform._sierra_predecessor)."""
    vals = _ordered_distinct(
        F.transform(_nonempty_subs(content, "907", "a"),
                    lambda v: F.regexp_replace(v, r"^\.+", ""))
    )
    return F.struct(
        vals.alias("vals"), F.try_element_at(vals, F.lit(1)).alias("one")
    )


def _predecessor(content: Column) -> Column:
    """907 $a → struct(value, error): distinct dot-stripped values; >1 or a
    non-UUID value is a record error (marc/predecessor_identifier.py)."""
    raw = _predecessor_raw(content)
    vals, one = raw["vals"], raw["one"]
    uuid_ok = one.rlike(
        "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    )
    return F.struct(
        F.when((F.size(vals) == 1) & uuid_ok, one).alias("value"),
        F.when(
            F.size(vals) > 1,
            F.lit("Multiple distinct instances of varfield with tag 907"),
        )
        .when(
            (F.size(vals) == 1) & ~uuid_ok,
            F.lit("Predecessor identifier does not match CALM record ID format"),
        )
        .alias("error"),
    )


def _format_cols(content: Column) -> Column:
    """655 ind2=7 $2=local $a; 'Archives - Digital' → hdig (axiell/format.py)."""
    local = F.filter(
        _blocks(content, "655"),
        lambda b: (_ind(b, 2) == "7") & (F.trim(_first_sub(b, "2")) == "local"),
    )
    raw = F.filter(
        F.transform(local, lambda b: F.trim(_first_sub(b, "a"))), lambda v: v != ""
    )
    digital = F.array_contains(raw, "Archives - Digital")
    return F.struct(
        F.when(digital, F.lit("hdig")).otherwise(F.lit("h")).alias("id"),
        F.when(digital, F.lit("Born-digital archives"))
        .otherwise(F.lit("Archives and manuscripts"))
        .alias("label"),
    )


def _date_from(content: Column, tag: str, code: str) -> Column:
    # strict yyyy-M-d, mirroring _parse_iso_date's "%Y-%m-%d" — a bare
    # year must NOT parse here (try_to_date without a format would take it)
    return F.try_to_date(_first_nonempty_sub(content, tag, code), "yyyy-M-d")


def _production_date(content: Column, code: str, month: int, day: int) -> Column:
    """046 $k/$l: full ISO date, or a bare year widened to month/day
    (axiell/dates.py _parse_production_date)."""
    v = _first_nonempty_sub(content, "046", code)
    full = F.try_to_date(v, "yyyy-M-d")
    year = F.when(
        v.rlike(r"^\d{1,4}$") & (v.cast("int") > 0),
        F.make_date(v.cast("int"), F.lit(month), F.lit(day)),
    )
    return F.coalesce(full, year)


def _access_status(content: Column, today: Column) -> Column:
    """506 $f through the table; else future 506 $g closed-until → closed."""
    status = _first_nonempty_sub(content, "506", "f")
    mapped = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in _ACCESS_STATUS.items() for x in kv]),
        status,
    )
    closed_until = _date_from(content, "506", "g")
    return F.coalesce(
        mapped,
        F.when(closed_until.isNotNull() & (closed_until >= today), F.lit("closed")),
    )


def _display_date(d: Column) -> Column:
    return F.date_format(d, "d MMMM yyyy")


def _contains_until(text: Column, d: Column) -> Column:
    norm = F.regexp_replace(text, r"(\d+)(st|nd|rd|th)", r"$1")
    return norm.contains(F.concat(F.lit("until "), _display_date(d))) | norm.contains(
        F.concat(F.lit("until "), F.date_format(d, "dd/MM/yyyy"))
    )


def _terms_of_use(content: Column, today: Column) -> Column:
    """axiell/terms_of_use.py extract_terms_of_use, rule for rule."""
    raw = _first_nonempty_sub(content, "506", "a")
    stripped = F.trim(raw)
    conditions = F.when(
        stripped.isNotNull() & (stripped != ""),
        F.when(stripped.endswith("."), stripped).otherwise(
            F.concat(stripped, F.lit("."))
        ),
    )
    status = _access_status(content, today)
    closed_until = _date_from(content, "506", "g")
    restricted_until = _date_from(content, "540", "g")

    closed_msg = F.concat(
        F.lit("Closed until "), _display_date(closed_until), F.lit(".")
    )
    restricted_msg = F.concat(
        F.lit("Restricted until "), _display_date(restricted_until), F.lit(".")
    )
    lower = F.lower(conditions)
    has_restr = lower.contains("restricted") | lower.contains("restrictions")

    return (
        # nothing useful
        F.when(
            conditions.isNull() & closed_until.isNull() & restricted_until.isNull(),
            F.lit(None).cast("string"),
        )
        # conditions only
        .when(
            conditions.isNotNull()
            & closed_until.isNull()
            & restricted_until.isNull(),
            conditions,
        )
        # closed + closed-until date
        .when(
            (status == "closed") & closed_until.isNotNull(),
            F.when(conditions.isNull(), closed_msg)
            .when(
                lower.contains("closed") & _contains_until(conditions, closed_until),
                conditions,
            )
            .otherwise(F.concat(conditions, F.lit(" "), closed_msg)),
        )
        # restricted + restricted-until date
        .when(
            (status == "restricted") & restricted_until.isNotNull(),
            F.when(conditions.isNull(), restricted_msg)
            .when(
                lower.contains("restricted")
                & _contains_until(conditions, restricted_until),
                conditions,
            )
            .otherwise(F.concat(conditions, F.lit(" "), restricted_msg)),
        )
        # permission-required with restrictions already described
        .when(
            (status == "permission-required")
            & restricted_until.isNotNull()
            & conditions.isNotNull()
            & lower.contains("permission")
            & has_restr,
            F.when(_contains_until(conditions, restricted_until), conditions)
            .otherwise(F.concat(conditions, F.lit(" "), restricted_msg)),
        )
        # catch-all: combine what we have
        .otherwise(
            F.nullif(
                F.concat_ws(
                    " ",
                    conditions,
                    F.when(restricted_until.isNotNull(), restricted_msg),
                    F.when(closed_until.isNotNull(), closed_msg),
                ),
                F.lit(""),
            )
        )
    )


def _parse_language_value(v: Column, m: Column) -> Column:
    """One 546 $a value → struct(langs array<struct<label,code>>, note).

    The reference's reachable matcher states are {original, corrected,
    corrected+tagless} × {whole-string, separator-split} — corrections and
    tag-stripping are commuting string rewrites, so the recursive retry in
    _parse_as_language_list collapses to this chain."""

    def correct(s: Column) -> Column:
        for wrong, right in _FUZZY_CORRECTIONS:
            s = F.replace(s, F.lit(wrong), F.lit(right))
        s = F.regexp_replace(s, r"^Eng$", "English")
        return F.regexp_replace(s, r"^Language$", "")

    def strip_tags(s: Column) -> Column:
        return F.regexp_replace(s, _LANGUAGE_TAG_RE, r"$1")

    def attempt(s: Column) -> Column:
        whole = F.try_element_at(m, s)
        parts = F.filter(
            F.transform(F.split(s, _LANG_SEPARATORS), lambda p: F.trim(p)),
            lambda p: p != "",
        )
        all_match = ~F.exists(parts, lambda p: F.try_element_at(m, p).isNull())
        return F.when(
            whole.isNotNull(),
            F.array(F.struct(s.alias("label"), whole.alias("code"))),
        ).when(
            all_match,
            F.transform(
                parts,
                lambda p: F.struct(
                    p.alias("label"), F.try_element_at(m, p).alias("code")
                ),
            ),
        )

    s0, s1 = v, correct(v)
    s2 = strip_tags(s1)
    parsed = F.coalesce(attempt(s0), attempt(s1), attempt(s2))

    fallback_langs = F.transform(
        F.filter(
            F.regexp_extract_all(v, F.lit(r"[A-Z][a-z]+"), 0),
            lambda w: F.try_element_at(m, w).isNotNull(),
        ),
        lambda w: F.struct(
            w.alias("label"), F.try_element_at(m, w).alias("code")
        ),
    )
    note = F.replace(v, F.lit("recieved"), F.lit("received"))
    return F.when(
        parsed.isNotNull(),
        F.struct(parsed.alias("langs"), F.lit(None).cast("string").alias("note")),
    ).otherwise(F.struct(fallback_langs.alias("langs"), note.alias("note")))


def _languages(content: Column) -> Column:
    """All 546 $a values → struct(langs, notes): in-order dedup across
    values (axiell/languages.py extract_languages)."""
    m = _lang_map()
    per_value = F.transform(
        _nonempty_subs(content, "546", "a"), lambda v: _parse_language_value(v, m)
    )
    langs = _ordered_distinct(F.flatten(F.transform(per_value, lambda r: r["langs"])))
    notes = _ordered_distinct(
        F.filter(F.transform(per_value, lambda r: r["note"]), lambda n: n.isNotNull())
    )
    return F.struct(langs.alias("langs"), notes.alias("notes"))


def _base_notes(content: Column) -> Column:
    """The shared 5xx note table minus 506/540/546 (Axiell handles those),
    as array<struct<type,contents>> in document order."""
    tags = sorted(_NOTE_TAGS)
    blocks = _all_datafield_blocks(content, tags)

    def one(b: Column) -> Column:
        tag = F.regexp_extract(b, r'tag="(\d{3})"', 1)
        type_id = F.when(
            (tag == "535") & (_ind(b, 1) == "2"), F.lit("location-of-duplicates")
        )
        for t, (tid, _) in _NOTE_TAGS.items():
            type_id = type_id.when(tag == t, F.lit(tid))
        subs = F.filter(
            F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0),
            lambda el: _sub_code(el) != "5",
        )
        contents = F.array_join(
            F.transform(
                subs,
                lambda el: F.when(
                    _sub_code(el) == "u", _html_link(_sub_value(el))
                ).otherwise(_sub_value(el)),
            ),
            " ",
        )
        gated = tag.isin(*_IND1_GATED_TAGS) & (_ind(b, 1) != "1")
        return F.when(
            ~gated & (F.trim(contents) != ""),
            F.struct(type_id.alias("type"), contents.alias("contents")),
        )

    return F.filter(F.transform(blocks, one), lambda n: n.isNotNull())


def _note(type_id: str, contents: Column) -> Column:
    return F.struct(F.lit(type_id).alias("type"), contents.alias("contents"))


def _finding_aids_notes(content: Column) -> Column:
    """590 → custom finding-aids notes (axiell/notes.py)."""
    def one(b: Column) -> Column:
        subs = F.filter(
            F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0),
            lambda el: _sub_code(el) != "5",
        )
        contents = F.array_join(
            F.transform(
                subs,
                lambda el: F.when(
                    _sub_code(el) == "u", _html_link(_sub_value(el))
                ).otherwise(_sub_value(el)),
            ),
            " ",
        )
        return F.when(
            F.trim(contents) != "", _note("finding-aids", contents)
        )

    return F.filter(
        F.transform(_blocks(content, "590"), one), lambda n: n.isNotNull()
    )


# ------------------------------------------------------------- transform


def transform_axiell(
    records: DataFrame,
    deletion_facts: DataFrame | None = None,
    today: dt.date | str | None = None,
) -> DataFrame:
    """records(id, content[, deleted, last_modified]) [+ facts(id, guid,
    last_modified)] → one work row per record:

    (id, type ∈ Visible|Deleted|Error, deleted_reason, error, title,
     work_type, ref_no, alt_ref_no, predecessor_id, other_identifiers
     array<'scheme:value'>, format_id, format_label, access_status,
     description, physical_description, subjects, subject_ids,
     contributors, languages array<'code~label'>, notes
     array<'type~contents'>, terms_of_use, production_label,
     production_dates array<'from..to'|''>, source_modified_time, version,
     merge_candidates array<'reason~scheme:value'>, arrangement)

    ``today`` pins the closed-until comparisons (reference: date.today());
    pass a fixed date in tests and oracles.

    Staged through projection barriers (the sierra_concepts technique):
    each MARCXML primitive (ids, status, title, notes, terms-of-use …) is
    extracted ONCE into a named column, and the error/visibility chains
    read column references — Catalyst keeps the Project boundaries
    (CollapseProject refuses to duplicate non-cheap multiply-referenced
    expressions) so the analyzer never sees one combinatorial regex tree.
    Still a pure narrow map: chained Projects, zero shuffles, no per-row
    Python on the bulk path.
    """
    cols = records.columns
    if "deleted" not in cols:
        records = records.withColumn("deleted", F.lit(False))
    if "last_modified" not in cols:
        records = records.withColumn("last_modified", F.lit(None).cast("timestamp"))
    today_col = F.current_date() if today is None else F.lit(today).cast("date")

    content = F.col("content")
    marc_id = F.nullif(F.trim(F.regexp_extract(content, _CONTROL_001_RE, 1)), F.lit(""))

    # 005 → timestamp (marc/parsers/date_from_005.py, session tz is UTC)
    raw_005 = F.nullif(
        F.trim(
            F.regexp_extract(
                content,
                r'(?s)<(?:\w+:)?controlfield[^>]*tag="005"[^>]*>\s*(.*?)\s*</(?:\w+:)?controlfield>',
                1,
            )
        ),
        F.lit(""),
    )

    # ---- stage 1: every MARCXML primitive, extracted exactly once ----
    s1 = records.select(
        "id",
        "deleted",
        marc_id.alias("_marc_id"),
        raw_005.alias("_raw_005"),
        F.try_to_timestamp(
            F.substring_index(raw_005, ".", 1), F.lit("yyyyMMddHHmmss")
        ).alias("_modified_ts"),
        _catalogue_status(content).alias("_status"),
        F.lower(F.trim(_first_nonempty_sub(content, "981", "a"))).alias("_publish"),
        _other_identifiers(content).alias("_ids"),
        _title_expr(content).alias("_title"),
        F.lower(_first_nonempty_sub(content, "351", "c")).alias("_level"),
        _predecessor(content).alias("_pred"),
        _format_cols(content).alias("_fmt"),
        _access_status(content, today_col).alias("_access"),
        _terms_of_use(content, today_col).alias("_tou"),
        _first_nonempty_sub(content, "351", "b").alias("_arrangement"),
        F.transform(
            F.transform(
                _nonempty_subs(content, "653", "a"),
                lambda v: F.regexp_replace(v, r"^<p>", ""),
            ),
            # build_concept normalise_label: trailing period trimmed
            # unless an ellipsis (utils/text_utils.py)
            lambda v: F.trim(
                F.when(v.rlike(r"\.\.\.$"), v).otherwise(
                    F.regexp_replace(v, r"\.$", "")
                )
            ),
        ).alias("_subjects"),
        _nonempty_subs(content, "720", "a").alias("_contributors"),
        _languages(content).alias("_langs"),
        F.concat(_base_notes(content), _finding_aids_notes(content)).alias(
            "_notes_raw"
        ),
        F.nullif(
            _normalise_text(F.array_join(_nonempty_subs(content, "520", "a"), " ")),
            F.lit(""),
        ).alias("_description"),
        F.nullif(
            _normalise_text(F.array_join(_nonempty_subs(content, "300", "a"), " ")),
            F.lit(""),
        ).alias("_phys"),
        _nonempty_subs(content, "264", "c").alias("_prod_labels_all"),
        _production_date(content, "k", 1, 1).alias("_prod_start"),
        _production_date(content, "l", 12, 31).alias("_prod_end"),
    )

    # ---- stage 2: suppression / error precedence over column refs ----
    status = F.col("_status")
    ids = F.col("_ids")
    title = F.col("_title")
    level = F.col("_level")
    pred = F.col("_pred")
    mid = F.col("_marc_id")
    work_type = F.try_element_at(
        F.create_map(*[F.lit(x) for kv in _LEVEL_TO_WORK_TYPE.items() for x in kv]),
        level,
    )
    s2 = s1.select(
        "*",
        _last_of_scheme(ids, "calm-ref-no").alias("_ref_no"),
        _last_of_scheme(ids, "calm-altref-no").alias("_alt_ref_no"),
        work_type.alias("_work_type"),
    )
    suppressed_pre_path = (
        status.isNull()
        | ~status.isin(*_NON_SUPPRESSED_STATUSES)
        | (F.col("_publish") == "no")
    )
    suppressed = suppressed_pre_path | F.coalesce(
        F.col("_alt_ref_no").startswith("AMSG"), F.lit(False)
    )

    # error precedence mirrors the builder's evaluation order
    error = (
        F.when(mid.isNull(), F.lit("missing mandatory field 001 (id)"))
        .when(
            F.col("_raw_005").isNull(),
            F.lit("Missing last transaction time field (005)"),
        )
        .when(
            F.col("_modified_ts").isNull(),
            F.lit("Invalid last transaction time field (005)"),
        )
        .when(F.col("deleted"), F.lit(None).cast("string"))  # deleted rows stop here
        .when(
            status.isNotNull() & ~status.isin(*_KNOWN_STATUSES),
            F.concat(
                F.lit(
                    "Unexpected Axiell catalogue status (record progress) value '"
                ),
                status,
                F.lit("' on record '"),
                mid,
                F.lit("'."),
            ),
        )
        .when(suppressed, F.lit(None).cast("string"))  # suppressed before RefNo
        .when(
            F.col("_ref_no").isNull(),
            F.concat(F.lit("Missing RefNo on work '"), mid, F.lit("'.")),
        )
        .when(title.isNull(), F.lit("missing mandatory field 245 (title)"))
        .when(
            level.isNull(),
            F.concat(
                F.lit("Missing hierarchical level (work type) on record '"),
                mid,
                F.lit("'."),
            ),
        )
        .when(
            F.col("_work_type").isNull(),
            F.concat(
                F.lit("Unknown hierarchical level '"),
                level,
                F.lit("' on record '"),
                mid,
                F.lit("'."),
            ),
        )
        .when(pred["error"].isNotNull(), pred["error"])
    )
    s3 = s2.select("*", error.alias("_error"), suppressed.alias("_suppressed"))

    err = F.col("_error")
    typ = (
        F.when(err.isNotNull(), F.lit("Error"))
        .when(F.col("deleted") | F.col("_suppressed"), F.lit("Deleted"))
        .otherwise(F.lit("Visible"))
    )
    s4 = s3.select("*", typ.alias("_type"), (err.isNull() & (typ == "Visible")).alias("_vis"))

    # ---- stage 3: compose notes (normalised once, empties dropped) ----
    tou = F.col("_tou")
    notes_structs = F.concat(
        F.col("_notes_raw"),
        F.when(
            F.col("_arrangement").isNotNull(),
            F.array(_note("arrangement-note", F.col("_arrangement"))),
        ).otherwise(F.array().cast("array<struct<type:string,contents:string>>")),
        F.when(tou.isNotNull(), F.array(_note("terms-of-use", tou))).otherwise(
            F.array().cast("array<struct<type:string,contents:string>>")
        ),
        F.transform(F.col("_langs")["notes"], lambda n: _note("language-note", n)),
    )
    notes_structs = F.filter(
        F.transform(
            notes_structs,
            lambda n: F.struct(
                n["type"].alias("type"),
                _normalise_text(n["contents"]).alias("contents"),
            ),
        ),
        lambda n: n["contents"] != "",
    )
    s5 = s4.select("*", notes_structs.alias("_notes"))

    # ---- stage 4: the output shape, all from column references ----
    vis = F.col("_vis")
    deleted_reason = F.when(
        F.col("deleted") & err.isNull(), F.lit("deleted-from-source")
    ).when(F.col("_suppressed") & err.isNull(), F.lit("suppressed: Axiell"))
    modified_iso = F.date_format(
        F.col("_modified_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )
    mk_arr = lambda c: F.when(vis, c).otherwise(  # noqa: E731
        F.array().cast("array<string>")
    )
    empty_sarr = F.array().cast("array<string>")

    out = s5.select(
        F.coalesce(F.col("_marc_id"), F.col("id")).alias("id"),
        F.col("_type").alias("type"),
        deleted_reason.alias("deleted_reason"),
        err.alias("error"),
        F.when(vis, F.col("_title")).alias("title"),
        F.when(vis, F.col("_work_type")).alias("work_type"),
        F.when(vis, F.col("_ref_no")).alias("ref_no"),
        F.when(vis, F.col("_alt_ref_no")).alias("alt_ref_no"),
        F.when(vis, F.col("_pred")["value"]).alias("predecessor_id"),
        mk_arr(
            F.transform(
                F.col("_ids"),
                lambda s: F.concat(s["scheme"], F.lit(":"), s["value"]),
            )
        ).alias("other_identifiers"),
        F.when(vis, F.col("_fmt")["id"]).alias("format_id"),
        F.when(vis, F.col("_fmt")["label"]).alias("format_label"),
        F.when(vis, F.col("_access")).alias("access_status"),
        F.when(vis, F.col("_description")).alias("description"),
        F.when(vis, F.col("_phys")).alias("physical_description"),
        mk_arr(F.col("_subjects")).alias("subjects"),
        mk_arr(F.transform(F.col("_subjects"), label_derived_value)).alias(
            "subject_ids"
        ),
        mk_arr(F.col("_contributors")).alias("contributors"),
        mk_arr(
            F.transform(
                F.col("_langs")["langs"],
                lambda s: F.concat(s["code"], F.lit("~"), s["label"]),
            )
        ).alias("languages"),
        mk_arr(
            F.transform(
                F.col("_notes"),
                lambda n: F.concat(n["type"], F.lit("~"), n["contents"]),
            )
        ).alias("notes"),
        F.when(vis, F.col("_tou")).alias("terms_of_use"),
        F.when(vis, F.nullif(F.array_join(F.col("_prod_labels_all"), " "), F.lit("")))
        .alias("production_label"),
        F.when(vis, F.col("_prod_labels_all")).otherwise(empty_sarr)
        .alias("_prod_labels"),
        F.when(vis, F.col("_prod_start")).alias("_prod_start"),
        F.when(vis, F.col("_prod_end")).alias("_prod_end"),
        F.when(err.isNull(), modified_iso).alias("source_modified_time"),
        F.when(err.isNull(), F.col("_modified_ts").cast("long")).alias("version"),
        mk_arr(
            F.transform(
                F.filter(
                    F.col("_ids"),
                    lambda s: s["scheme"].isin(
                        "sierra-system-number", "calm-ref-no"
                    ),
                ),
                lambda s: F.concat(
                    F.when(
                        s["scheme"] == "sierra-system-number",
                        F.lit("CALM/Sierra harvest work"),
                    ).otherwise(F.lit("Archivematica work")),
                    F.lit("~"),
                    s["scheme"],
                    F.lit(":"),
                    s["value"],
                ),
            )
        ).alias("merge_candidates"),
        F.when(vis, F.col("_arrangement")).alias("arrangement"),
    )

    out = _with_production_dates(out)

    if deletion_facts is not None:
        facts = deletion_facts.select(
            F.col("guid").alias("id"),
            F.lit("Deleted").alias("type"),
            F.lit("deleted-from-source").alias("deleted_reason"),
            F.date_format(F.col("last_modified"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "source_modified_time"
            ),
            F.col("last_modified").cast("long").alias("version"),
        )
        for c, t in out.dtypes:
            if c not in facts.columns:
                facts = facts.withColumn(c, F.lit(None).cast(t))
        out = out.unionByName(facts.select(out.columns))

    return out


def _render_range(from_d: Column, to_d: Column) -> Column:
    """The Scala pipeline's instant rendering: day-start Z / day-end with
    nanosecond precision (axiell/production.py _period_from_dates)."""
    return F.concat(
        F.date_format(from_d, "yyyy-MM-dd'T'00:00:00'Z'"),
        F.lit(".."),
        F.date_format(to_d, "yyyy-MM-dd'T'23:59:59.999999999'Z'"),
    )


def _with_production_dates(out: DataFrame) -> DataFrame:
    """264/046 production rules: single label + both 046 dates uses the 046
    range; otherwise each label through the shared period parser (one
    Arrow batch over the exploded labels, re-assembled in label order)."""
    from ..functions.periods import parse_period_udf

    use_046 = (
        (F.size("_prod_labels") == 1)
        & F.col("_prod_start").isNotNull()
        & F.col("_prod_end").isNotNull()
    )
    exploded = (
        out.select("id", F.posexplode("_prod_labels").alias("_pos", "_label"))
        .withColumn("_p", parse_period_udf()(F.col("_label")))
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_pos"),
                            F.when(
                                F.col("_p.parsed"),
                                _render_range(F.col("_p.from_date"), F.col("_p.to_date")),
                            )
                            .otherwise(F.lit(""))
                            .alias("_r"),
                        )
                    )
                ),
                lambda s: s["_r"],
            ).alias("_parsed_dates")
        )
    )
    out = out.join(exploded, "id", "left")
    return out.withColumn(
        "production_dates",
        F.when(
            use_046,
            F.array(_render_range(F.col("_prod_start"), F.col("_prod_end"))),
        )
        .when(
            F.size("_prod_labels") > 0,
            F.coalesce(F.col("_parsed_dates"), F.array().cast("array<string>")),
        )
        .otherwise(F.array().cast("array<string>")),
    ).drop("_prod_labels", "_prod_start", "_prod_end", "_parsed_dates")
