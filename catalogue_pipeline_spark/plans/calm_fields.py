"""CALM field families beyond the round-3 slice: notes, languages,
terms-of-use / access status, and items.

Reference (pipeline/transformer/transformer_calm/.../transformers/):

* CalmNotes.scala:9-33       — a 13-entry CALM-key → NoteType table; every
                               value of each key becomes one note,
                               normalised through NormaliseText
* CalmLanguages.scala:21-199 — the fuzzy "Language" field parser: exact
                               MARC-name match, multi-split match (all
                               components must resolve), conservative typo
                               fixes, <language> tag stripping; a value
                               that still fails keeps its capitalised-word
                               language guesses AND the verbatim text as a
                               language-note ('recieved' fixed)
* CalmTermsOfUse.scala:13-190 — AccessConditions + AccessStatus +
                               ClosedUntil/UserDate1 composed into ONE
                               terms-of-use note under the reference's
                               case analysis (don't repeat a date the
                               text already states; closed/restricted/
                               permission sentences; catch-all smush)
* CalmAccessStatus.scala:8-34 — the status string table (trailing period
                               stripped, two lowercase special cases)
* CalmItems.scala:14-46      — exactly one Item per record: a ClosedStores
                               physical location whose access condition is
                               NotRequestable + the parsed status (omitted
                               entirely when no status parses —
                               AccessCondition.isEmpty)

Spark-first: everything is per-row column expressions over the MapType
record (the repo's third extraction substrate); the language lookup is one
``str_to_map`` literal (functions/marc_languages.py), so the whole family
stays inside whole-stage codegen — no UDFs, no joins, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.marc_languages import name_to_code_map
from .calm_transform import _BASIC_TAGS, _get, _get_list, normalise_text

# CalmNotes.scala:10-24, NoteType ids from internal_model/work/Note.scala
NOTE_KEYS = [
    ("AdminHistory", "biographical-note"),
    ("CustodialHistory", "ownership-note"),
    ("Acquisition", "acquisition-note"),
    ("Appraisal", "appraisal-note"),
    ("Accruals", "accruals-note"),
    ("RelatedMaterial", "related-material"),
    ("PubInNote", "publication-note"),
    ("UserWrapped4", "finding-aids"),
    ("Copyright", "copyright-note"),
    ("Arrangement", "arrangement-note"),
    ("Copies", "location-of-duplicates"),
    ("Notes", "general-note"),
    ("Originals", "location-of-original"),
]

# CalmAccessStatus.scala:10-33 (after stripSuffix("."))
_STATUS_TABLE = {
    "Open": "Open",
    "Open with advisory": "OpenWithAdvisory",
    "Closed": "Closed",
    "Restricted": "Restricted",
    "Safeguarded": "Safeguarded",
    "By Appointment": "ByAppointment",
    "Donor Permission": "PermissionRequired",
    "Cannot Be Produced": "Unavailable",
    "Missing": "Unavailable",
    "Deaccessioned": "Unavailable",
    "Temporarily Unavailable": "TemporarilyUnavailable",
}


def calm_notes_expr(data: Column) -> Column:
    """array<'note-type~contents'> in table order, values in field order."""
    def arm(key: str, type_id: str) -> Column:
        # single-arg lambda: F.transform treats a 2-arg lambda as
        # (element, index), so type_id must be closed over, not defaulted
        return F.transform(
            _get_list(data, key),
            lambda v: F.concat(F.lit(type_id + "~"), normalise_text(v, _BASIC_TAGS)),
        )

    return F.concat(*[arm(k, t) for k, t in NOTE_KEYS])


def calm_access_status(data: Column) -> Column:
    """AccessStatus name or NULL (unrecognised values warn → None)."""
    raw = F.regexp_replace(_get(data, "AccessStatus"), r"\.$", "")
    exact = F.coalesce(
        *[F.when(raw == k, F.lit(v)) for k, v in _STATUS_TABLE.items()]
    )
    lower = F.lower(raw)
    return F.coalesce(
        exact,
        F.when(lower == "certain restrictions apply", F.lit("Restricted")),
        F.when(
            lower == "restricted access (data protection act)",
            F.lit("Restricted"),
        ),
    )


# ---------------------------------------------------------------- languages

_LANG_SEP = r"\n|;|\.|,|/|\band\b|`"
_TAG_RE = r'<language(?: langcode="[a-z]+")?>([^<]+)</language>'


def _fix(s: Column) -> Column:
    """FuzzyLanguageMatch's conservative corrections (CalmLanguages:158-176)."""
    out = s
    for a, b in [
        ("Portugese", "Portuguese"),
        ("Portguese", "Portuguese"),
        ("Potuguese", "Portuguese"),
        ("Swiss-German", "Swiss German"),
        ("Norweigan", "Norwegian"),
        ("Lugandan", "Luganda"),
    ]:
        out = F.replace(out, F.lit(a), F.lit(b))
    out = F.regexp_replace(out, r"^Eng$", "English")
    out = F.regexp_replace(out, r"^Language$", "")
    return out


def _strip_tags(s: Column) -> Column:
    return F.regexp_replace(s, _TAG_RE, r"$1")


def _exact(s: Column, m: Column) -> Column:
    """ExactLanguageMatch → ['code~name'] or NULL."""
    code = F.try_element_at(m, s)
    return F.when(code.isNotNull(), F.array(F.concat(code, F.lit("~"), s)))


def _multi(s: Column, m: Column) -> Column:
    """MultiLanguageMatch: ALL split components must resolve → list (possibly
    empty), else NULL."""
    comps = F.filter(
        F.transform(F.split(s, _LANG_SEP), lambda c: F.trim(c)),
        lambda c: c != "",
    )
    codes = F.transform(comps, lambda c: F.try_element_at(m, c))
    ok = ~F.exists(codes, lambda c: c.isNull())
    return F.when(
        ok,
        F.zip_with(codes, comps, lambda c, n: F.concat(c, F.lit("~"), n)),
    )


def _parse_value(v: Column, m: Column) -> Column:
    """parseLanguages(v) flattened: Exact → Multi → Fuzzy(corrected, incl.
    its Tag arm) → Tag(stripped, incl. its Fuzzy arm); NULL = no parse."""
    fv, sv = _fix(v), _strip_tags(v)
    sfv, fsv = _strip_tags(fv), _fix(sv)
    return F.coalesce(
        _exact(v, m),
        _multi(v, m),
        F.when(
            fv != v,
            F.coalesce(
                _exact(fv, m),
                _multi(fv, m),
                F.when(sfv != fv, F.coalesce(_exact(sfv, m), _multi(sfv, m))),
            ),
        ),
        F.when(
            sv != v,
            F.coalesce(
                _exact(sv, m),
                _multi(sv, m),
                F.when(fsv != sv, F.coalesce(_exact(fsv, m), _multi(fsv, m))),
            ),
        ),
    )


def _guess(v: Column, m: Column) -> Column:
    """guessLanguages: every capitalised word that IS a MARC language name."""
    words = F.regexp_extract_all(v, F.lit(r"[A-Z][a-z]+"), 0)
    return F.filter(
        F.transform(
            words,
            lambda w: F.when(
                F.try_element_at(m, w).isNotNull(),
                F.concat(F.try_element_at(m, w), F.lit("~"), w),
            ),
        ),
        lambda x: x.isNotNull(),
    )


def calm_languages_expr(data: Column) -> Column:
    """struct(languages array<'code~label'>, notes array<string>) — the
    (List[Language], List[Note]) fold of CalmLanguages.apply."""
    m = name_to_code_map()
    values = _get_list(data, "Language")
    parsed = F.transform(values, lambda v: _parse_value(v, m))
    langs = F.array_distinct(
        F.flatten(
            F.zip_with(
                values,
                parsed,
                lambda v, p: F.coalesce(p, _guess(v, m)),
            )
        )
    )
    notes = F.array_distinct(
        F.filter(
            F.zip_with(
                values,
                parsed,
                lambda v, p: F.when(
                    p.isNull(), F.replace(v, F.lit("recieved"), F.lit("received"))
                ),
            ),
            lambda n: n.isNotNull(),
        )
    )
    return F.struct(langs.alias("languages"), notes.alias("notes"))


# ------------------------------------------------------------- terms of use

_DISPLAY_FMT = "d MMMM yyyy"


def _contains_date(s: Column, d: Column) -> Column:
    """StringOps.containsDate: ordinals stripped (incl. the global 'th'
    replace quirk), then contains 'until <d MMMM yyyy>' or 'until
    <dd/MM/yyyy>'."""
    norm = s
    for a, b in [("1st", "1"), ("2nd", "2"), ("3rd", "3"), ("th", "")]:
        norm = F.replace(norm, F.lit(a), F.lit(b))
    return norm.contains(
        F.concat(F.lit("until "), F.date_format(d, _DISPLAY_FMT))
    ) | norm.contains(
        F.concat(F.lit("until "), F.date_format(d, "dd/MM/yyyy"))
    )


def calm_terms_of_use(data: Column) -> Column:
    """The composed terms-of-use note contents, or NULL
    (CalmTermsOfUse.scala:13-150)."""
    joined = F.array_join(_get_list(data, "AccessConditions"), " ")
    cond = F.when(
        F.size(_get_list(data, "AccessConditions")) > 0,
        F.when(joined.endswith("."), joined).otherwise(
            F.concat(joined, F.lit("."))
        ),
    )
    status = calm_access_status(data)
    cu = F.to_date(_get(data, "ClosedUntil"), "d/M/yyyy")
    ru = F.to_date(_get(data, "UserDate1"), "d/M/yyyy")
    closed_s = F.concat(
        F.lit("Closed until "), F.date_format(cu, _DISPLAY_FMT), F.lit(".")
    )
    restricted_s = F.concat(
        F.lit("Restricted until "), F.date_format(ru, _DISPLAY_FMT), F.lit(".")
    )
    lower = F.lower(cond)
    has_restr = lower.contains("restricted") | lower.contains("restrictions")

    catch_all = F.concat_ws(
        " ",
        cond,
        F.when(ru.isNotNull(), restricted_s),
        F.when(cu.isNotNull(), closed_s),
    )
    return (
        # (conditions, status, None, None) → conditions
        F.when(
            cond.isNotNull() & status.isNotNull() & cu.isNull() & ru.isNull(),
            cond,
        )
        # Closed + ClosedUntil
        .when(
            cond.isNotNull() & (status == "Closed") & cu.isNotNull(),
            F.when(
                lower.contains("closed") & _contains_date(cond, cu), cond
            ).otherwise(F.concat(cond, F.lit(" "), closed_s)),
        )
        .when(
            cond.isNull() & (status == "Closed") & cu.isNotNull(), closed_s
        )
        # Restricted + UserDate1
        .when(
            cond.isNotNull() & (status == "Restricted") & ru.isNotNull(),
            F.when(
                lower.contains("restricted") & _contains_date(cond, ru), cond
            ).otherwise(F.concat(cond, F.lit(" "), restricted_s)),
        )
        .when(
            cond.isNull() & (status == "Restricted") & ru.isNotNull(),
            restricted_s,
        )
        # PermissionRequired + UserDate1 (+ permission & restrictions text)
        .when(
            cond.isNotNull()
            & (status == "PermissionRequired")
            & ru.isNotNull()
            & lower.contains("permission")
            & has_restr,
            F.when(_contains_date(cond, ru), cond).otherwise(
                F.concat(cond, F.lit(" "), restricted_s)
            ),
        )
        # (None, _, None, None) → nothing
        .when(cond.isNull() & cu.isNull() & ru.isNull(), F.lit(None))
        # catch-all smush
        .otherwise(F.nullif(catch_all, F.lit("")))
    )


def calm_items_expr(data: Column) -> Column:
    """One item per record: 'ClosedStores~Closed stores~NotRequestable~
    <status-or-empty>' (CalmItems.scala:14-46; the access condition is
    dropped entirely — empty status slot — when no status parses)."""
    status = calm_access_status(data)
    return F.array(
        F.concat(
            F.lit("ClosedStores~Closed stores~NotRequestable~"),
            F.coalesce(status, F.lit("")),
        )
    )


def with_calm_fields(works_data: Column) -> dict[str, Column]:
    """The four new column families keyed by output column name; callers
    splice them into transform_calm's select (CalmTransformer.scala:144-165
    wires languages/items and notes ++ languageNotes ++ termsOfUse)."""
    lang = calm_languages_expr(works_data)
    terms = calm_terms_of_use(works_data)
    notes = F.concat(
        calm_notes_expr(works_data),
        F.transform(
            lang["notes"], lambda n: F.concat(F.lit("language-note~"), n)
        ),
        F.filter(
            F.array(
                F.when(terms.isNotNull(), F.concat(F.lit("terms-of-use~"), terms))
            ),
            lambda x: x.isNotNull(),
        ),
    )
    return {
        "languages": lang["languages"],
        "notes": notes,
        "terms_of_use": terms,
        "access_status": calm_access_status(works_data),
        "items": calm_items_expr(works_data),
    }
