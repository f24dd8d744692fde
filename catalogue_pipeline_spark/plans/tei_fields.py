"""TEI manuscript field families: languages, notes, physical description,
subjects, contributors (authors + scribes) and production — the per-work
fields the round-3 thin slice documented out of scope.

Reference (pipeline/transformer/transformer_tei/src/main/.../tei):

* TeiLanguages.scala:14-90   — <textLang> under msDesc>msContents (or per
                               item/part): mainLang + whitespace-split
                               otherLangs ids, lowercased; an id-less or
                               unmappable label becomes a language Note
* TeiLanguageData.scala:29-150 — the explicit IANA(id,label) → MARC
                               language table (exact pairs; custom rows
                               keep the TEI label, 1:1 rows take the MARC
                               name as label)
* TeiNotes.scala:10-160      — locus/colophon/incipit+explicit (locus
                               prefix ': ')/handNote (scribe-only
                               handNotes suppressed) + history provenance/
                               acquisition with the datable.w3c prose
                               prefix (Datable.scala:13-46)
* TeiPhysicalDescription.scala:7-150 — supportDesc → support (watermarks
                               kept, measures dropped), 'Material: ',
                               extent + dimensions (height/width or <dim>)
                               joined '; '
* TeiSubjects.scala:21-92    — profileDesc keywords terms; scheme #LCSH/
                               #MESH; ref-or-key id with 'subject_'/space
                               stripping; label-derived fallback
* TeiContributors.scala:31-292 — msItem authors (persName forms, Fihrist
                               vs VIAF key ids) and handNote scribes
                               (scribe attr or persName role=scr; locus
                               targets route them to nested works)
* TeiProduction.scala:10-70  — history>origin: origPlace country/region/
                               settlement + orgName agent + Gregorian
                               origDate (notes stripped)
* NormaliseText.scala:4-40   — newline collapse + repeated-space collapse

All of this is arbitrary-nesting XML, so it lives in the SAME pure-python
core + Arrow-batched pandas UDF substrate as the nested-works walk
(plans/tei_transform.py) — one UDF per *manuscript record*, never per
event; every downstream consumer is ordinary column work.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

from ..functions.marc_languages import _tables
from .tei_transform import _local

# TeiLanguageData.scala:39-118 — (iana_id, tei_label) → (marc_name, label);
# label None = take the MARC name (the 1:1 rows), else the custom override.
_TEI_LANG_RULES: dict[tuple[str, str], tuple[str, str | None]] = {
    ("ar", "Arabic"): ("Arabic", None),
    ("sa", "Sanskrit"): ("Sanskrit", None),
    ("he", "Hebrew"): ("Hebrew", None),
    ("ms", "Malay"): ("Malay", None),
    ("eng", "English"): ("English", None),
    ("en", "English"): ("English", None),
    ("hi", "Hindi"): ("Hindi", None),
    ("ja", "Japanese"): ("Japanese", None),
    ("jv", "Javanese"): ("Javanese", None),
    ("pra", "Prakrit languages"): ("Prakrit languages", None),
    ("it", "Italian"): ("Italian", None),
    ("ta", "Tamil"): ("Tamil", None),
    ("jpr", "Judeo-Persian"): ("Judeo-Persian", None),
    ("la", "Latin"): ("Latin", None),
    ("cop", "Coptic"): ("Coptic", None),
    ("es", "Spanish"): ("Spanish", None),
    ("btk", "Batak"): ("Batak", None),
    ("fa", "Persian"): ("Persian", None),
    ("ji", "Yiddish"): ("Yiddish", None),
    ("yi", "Yiddish"): ("Yiddish", None),
    ("fr", "French"): ("French", None),
    ("grc", "Ancient Greek"): ("Greek, Ancient (to 1453)", None),
    ("grc", "Greek"): ("Greek, Ancient (to 1453)", None),
    ("el", "Greek"): ("Greek, Modern (1453- )", None),
    ("spq", "Spanish"): ("Spanish", None),
    ("es-es", "Spanish Spain"): ("Spanish", None),
    ("ar", "Arabic [Karshuni]"): ("Arabic", "Arabic [Karshuni]"),
    ("egy", "Ancient Egyptian"): ("Egyptian", "Ancient Egyptian"),
    ("egy", "Egyptian (Ancient)"): ("Egyptian", "Ancient Egyptian"),
    ("btx", "Karo-Batak"): ("Batak", "Karo-Batak"),
    ("bbc", "Toba-Batak"): ("Batak", "Toba-Batak"),
    ("btk", "Toba-Batak"): ("Batak", "Toba-Batak"),
    ("btd", "Batak Dairi"): ("Batak", "Batak Dairi"),
    ("gu", "(Old) Gujarati"): ("Gujarati", "(Old) Gujarati"),
    ("ms", "Middle Malay"): ("Malay", "Middle Malay"),
    ("pka", "Ardhamāgadhi Prakrit"): ("Prakrit languages", "Ardhamāgadhi Prakrit"),
    ("pka", "Ardhamāgadhī Prākrit"): ("Prakrit languages", "Ardhamāgadhī Prākrit"),
    ("itk", "Judeo-Italian"): ("Italian", "Judeo-Italian"),
    ("jv", "Java"): ("Javanese", "Java"),
}


def _marc_code(name: str) -> str | None:
    return _tables()["name_to_code"].get(name)


def normalise(s: str) -> str | None:
    """tei/NormaliseText.scala: collapse newlines, collapse repeated
    spaces, trim; None when empty."""
    out = " ".join(line.strip() for line in s.split("\n"))
    out = re.sub(r"[ ]{2,}", " ", out).strip()
    return out or None


def _text(node) -> str:
    return "".join(node.itertext())


def _children(node, name):
    return [c for c in node if _local(c.tag) == name]


def _path(nodes, *names):
    cur = list(nodes)
    for name in names:
        cur = [c for n in cur for c in n if _local(c.tag) == name]
    return cur


def _descendants(node, name):
    return [n for n in node.iter() if _local(n.tag) == name]


def _attr(node, name) -> str:
    for k, v in node.attrib.items():
        if _local(k) == name or k == name:
            return v
    return ""


def label_derived_id(label: str) -> str:
    """LabelDerivedIdentifiers.identifierFromText: trailing-period trim,
    lowercase, NFKD fold to ASCII, trim."""
    s = re.sub(r"([^.])\.\s*$", r"\1", label).strip().lower()
    s = unicodedata.normalize("NFKD", s)
    s = "".join(ch for ch in s if ord(ch) < 128)
    return s.strip()


# ---------------------------------------------------------------- languages

def tei_languages(nodes) -> tuple[list[str], list[str]]:
    """parseLanguages over a node list: ('code~label' list, note list)."""
    langs: list[str] = []
    notes: list[str] = []
    for n in _path(nodes, "textLang"):
        label = _text(n)
        if not label.strip():
            continue
        ids = []
        for raw in [_attr(n, "mainLang")] + _attr(n, "otherLangs").split():
            i = raw.lower().strip()
            if i and i not in ids:
                ids.append(i)
        if not ids:
            notes.append(label)
            continue
        mapped = []
        for i in ids:
            rule = _TEI_LANG_RULES.get((i, label))
            if rule is None:
                continue
            name, override = rule
            code = _marc_code(name)
            if code is not None:
                mapped.append(f"{code}~{override or name}")
        if mapped:
            langs.extend(mapped)
        else:
            notes.append(label)
    return langs, notes


# -------------------------------------------------------------------- notes

def _hand_note_label(n) -> tuple[str, str]:
    """(full label, label excluding persName[role=scr] children)."""
    full = _text(n)
    parts = [n.text or ""]
    for c in n:
        if not (_local(c.tag) == "persName" and _attr(c, "role") == "scr"):
            parts.append(_text(c))
        parts.append(c.tail or "")
    return full, "".join(parts).strip()


def _datable_prefix(node) -> str | None:
    """Datable.scala:13-46 prose prefix '(when, from X, not before Y, ...)'."""
    parts = []
    for attr, label in [
        ("when", ""), ("from", "from"), ("notBefore", "not before"),
        ("to", "to"), ("notAfter", "not after"),
    ]:
        v = _attr(node, attr)
        if v:
            parts.append(f"{label} {v}" if label else v)
    return f"({', '.join(parts)})" if parts else None


def _hand_notes(nodes) -> list[str]:
    out = []
    for n in _path(nodes, "physDesc", "handDesc", "handNote"):
        if _attr(n, "scribe"):
            continue  # extracted as a contributor instead
        full, no_scribes = _hand_note_label(n)
        if no_scribes:
            c = normalise(full)
            if c:
                out.append(f"hand-note~{c}")
    return out


def _history_notes(nodes) -> list[str]:
    out = []
    for h in _path(nodes, "history"):
        for name, note_type in [
            ("provenance", "ownership-note"),
            ("acquisition", "acquisition-note"),
        ]:
            for n in _children(h, name):
                c = normalise(_text(n).strip())
                if c:
                    prefix = _datable_prefix(n)
                    contents = f"{prefix}: {c}" if prefix else c
                    out.append(f"{note_type}~{contents}")
    return out


def tei_notes(nodes) -> list[str]:
    """TeiNotes.apply(nodeSeq): locus + colophon + incipit/explicit +
    handNotes, as 'type~contents'."""
    out = []
    for n in _path(nodes, "locus"):
        c = normalise(_text(n).strip())
        if c:
            out.append(f"locus-note~{c}")
    for n in _path(nodes, "colophon"):
        c = normalise(_text(n).strip())
        if c:
            out.append(f"colophon~{c}")
    for parent in nodes:
        for n in parent:
            if _local(n.tag) not in ("incipit", "explicit"):
                continue
            locus = "".join(_text(x) for x in _children(n, "locus"))
            contents = _text(n)
            if locus:
                try:
                    # Scala replaceAll treats the locus text as a regex —
                    # replicated deliberately (bug-for-bug)
                    contents = re.sub(locus + r"\s*", locus + ": ", contents)
                except re.error:
                    pass
            c = normalise(contents)
            if c:
                t = "begins-note" if _local(n.tag) == "incipit" else "ends-note"
                out.append(f"{t}~{c}")
    out.extend(_hand_notes(nodes))
    return out


def tei_top_level_notes(root) -> list[str]:
    """TeiNotes.apply(xml): msContents notes + desc-level handNotes/history."""
    msdescs = _descendants(root, "msDesc")
    contents = _path(msdescs, "msContents")
    return tei_notes(contents) + _hand_notes(msdescs) + _history_notes(msdescs)


# -------------------------------------------------- physical description

def _append_unit(s: str, unit: str) -> str:
    s = s.strip()
    if s and not s.endswith(unit):
        return f"{s} {unit}".strip()
    return s


def _dimensions_str(extent_nodes) -> list[str]:
    out = []
    for dims in _path(extent_nodes, "dimensions"):
        unit = _attr(dims, "unit").strip()
        dtype = _attr(dims, "type").strip()
        dim_children = _children(dims, "dim")
        if dim_children:
            parts = []
            for d in dim_children:
                label = _attr(d, "type").strip()
                parts.append(_append_unit(f"{label} {_text(d).strip()}".strip(), unit))
            s = ", ".join(p for p in parts if p)
        else:
            height = "".join(_text(x) for x in _children(dims, "height")).strip()
            width = "".join(_text(x) for x in _children(dims, "width")).strip()
            hs = _append_unit(f"height {height}" if height else "", unit)
            ws = _append_unit(f"width {width}" if width else "", unit)
            s = ", ".join(p for p in [ws, hs] if p)
        if s:
            out.append(normalise(f"{dtype} dimensions: {s}") or "")
    return [o for o in out if o]


def tei_physical_description(nodes) -> str | None:
    """TeiPhysicalDescription over a node list (msDesc or msPart/msItem)."""
    for phys in _path(nodes, "physDesc"):
        for support_desc in _descendants(phys, "supportDesc"):
            material = _attr(support_desc, "material").strip()
            material_s = normalise(f"Material: {material}" if material else "")
            supports = _children(support_desc, "support")
            if any(len(list(s)) > 0 for s in supports):
                watermark = " ".join(
                    _text(w).strip()
                    for s in supports
                    for w in _children(s, "watermark")
                ).strip()
                label = " ".join(
                    p for s in supports for p in _support_parts(s)
                ).strip()
                parts = [label]
                if watermark:
                    parts.append(f"Watermarks: {watermark}")
                support_s = normalise("; ".join(p for p in parts if p))
            else:
                support_s = normalise(
                    " ".join(_text(s) for s in supports).strip()
                )
            extents = _children(support_desc, "extent")
            if any(len(list(e)) > 0 for e in extents):
                label = " ".join(
                    t for e in extents for t in _extent_texts(e)
                ).strip()
                dims = _dimensions_str(extents)
                extent_s = normalise(
                    "; ".join(p for p in [label] + dims if p)
                )
            else:
                extent_s = normalise(" ".join(_text(e) for e in extents).strip())
            combined = "; ".join(
                p for p in [support_s, material_s, extent_s] if p
            )
            result = normalise(combined)
            if result:
                # flatMap + headOption: the FIRST supportDesc that yields a
                # non-empty description wins; empty ones are skipped
                return result
    return None


def _support_parts(support):
    parts = [support.text or ""]
    for c in support:
        if _local(c.tag) not in ("watermark", "measure"):
            parts.append(_text(c).strip())
        parts.append(c.tail or "")
    return [" ".join(p.strip() for p in parts if p.strip())]


def _extent_texts(extent):
    parts = [extent.text or ""]
    for c in extent:
        if _local(c.tag) != "dimensions":
            parts.append(_text(c).strip())
        parts.append(c.tail or "")
    return [" ".join(p.strip() for p in parts if p.strip())]


# ----------------------------------------------------------------- subjects

def tei_subjects(root) -> list[str]:
    """'label~scheme~value' rows; scheme ∈ lc-subjects|nlm-mesh|
    label-derived."""
    out = []
    for prof in _descendants(root, "profileDesc"):
        for kw in _descendants(prof, "keywords"):
            scheme_raw = _attr(kw, "scheme").lower().strip()
            scheme = {"#lcsh": "lc-subjects", "#mesh": "nlm-mesh"}.get(scheme_raw)
            for term in _descendants(kw, "term"):
                label = normalise(_text(term))
                if not label:
                    continue
                ref = (_attr(term, "key") or _attr(term, "ref")).replace(
                    "subject_", ""
                ).replace(" ", "")
                ref = normalise(ref)
                if ref and scheme:
                    out.append(f"{label}~{scheme}~{ref}")
                else:
                    out.append(f"{label}~label-derived~{label_derived_id(label)}")
    return out


# ------------------------------------------------------------- contributors

def _persname_label_and_id(author) -> tuple[str, str] | None:
    """getLabelAndId: no persName → author text + @key; one persName → its
    text + key (persName key wins); many → the single type=original."""
    pers = _children(author, "persName")
    if not pers:
        label, pid = _text(author).strip(), _attr(author, "key").strip()
    elif len(pers) == 1:
        label = _text(pers[0]).strip()
        pid = _attr(pers[0], "key").strip() or _attr(author, "key").strip()
    else:
        originals = [p for p in pers if _attr(p, "type") == "original"]
        if len(originals) != 1:
            raise ValueError(
                "No persName nodes with type=original in author"
                if not originals
                else "Multiple persName nodes with type=original in author"
            )
        label = _text(originals[0]).strip()
        pid = _attr(originals[0], "key").strip() or _attr(author, "key").strip()
    if not label:
        return None
    return label, pid


def tei_authors(item, fihrist: bool) -> list[str]:
    """'label~author~scheme~value' rows for an msItem's <author> children."""
    out = []
    for author in _children(item, "author"):
        info = _persname_label_and_id(author)
        if info is None:
            continue
        label, pid = info
        if pid:
            scheme = "fihrist" if fihrist else "viaf"
            out.append(f"{label}~author~{scheme}~{pid}")
        else:
            out.append(f"{label}~author~label-derived~{label_derived_id(label)}")
    return out


def tei_scribes(root, wrapper_id: str) -> dict[str, list[str]]:
    """workId → 'label~scribe~label-derived~id' rows; locus targets route a
    handNote's scribe to nested works, else to the wrapper."""
    out: dict[str, list[str]] = {}
    msdescs = _descendants(root, "msDesc")
    for n in _path(msdescs, "physDesc", "handDesc", "handNote"):
        pers = [
            p for p in _children(n, "persName") if _attr(p, "role") == "scr"
        ]
        label = None
        if _attr(n, "scribe") and not pers:
            parts = [n.text or ""]
            for c in n:
                if _local(c.tag) != "locus":
                    parts.append(_text(c))
                parts.append(c.tail or "")
            label = "".join(parts).strip()
        elif len(pers) == 1:
            label = _text(pers[0]).strip()
        elif len(pers) > 1:
            originals = [p for p in pers if _attr(p, "type") == "original"]
            if len(originals) != 1:
                raise ValueError(
                    "No persName nodes with type=original in author"
                    if not originals
                    else "Multiple persName nodes with type=original in author"
                )
            label = _text(originals[0]).strip()
        if not label:
            continue
        row = f"{label}~scribe~label-derived~{label_derived_id(label)}"
        targets = [
            t.replace("#", "")
            for locus in _children(n, "locus")
            for t in _attr(locus, "target").strip().split()
        ] or [wrapper_id]
        for t in targets:
            out.setdefault(t, []).append(row)
    return out


# --------------------------------------------------------------- production

def tei_production(origin_nodes) -> str | None:
    """'label~places~agents~dates' or None (TeiProduction.scala:22-70)."""
    for origin in origin_nodes:
        place_nodes = _children(origin, "origPlace")
        country = " ".join(_text(x) for x in _path(place_nodes, "country")).strip()
        region = " ".join(_text(x) for x in _path(place_nodes, "region")).strip()
        settlement = " ".join(
            _text(x) for x in _path(place_nodes, "settlement")
        ).strip()
        org = " ".join(_text(x) for x in _path(place_nodes, "orgName")).strip()
        date_nodes = [
            d for d in _children(origin, "origDate")
            if _attr(d, "calendar").lower() == "gregorian"
        ]
        if any(len(list(d)) > 0 for d in date_nodes):
            parts = []
            for d in date_nodes:
                parts.append(d.text or "")
                for c in d:
                    if _local(c.tag) != "note":
                        parts.append(_text(c))
                    parts.append(c.tail or "")
            date = "".join(parts).strip()
        else:
            date = "".join(_text(d) for d in date_nodes).strip()
        place = ", ".join(p for p in [country, region, settlement] if p)
        label = ", ".join(p for p in [place, date] if p)
        if not (org or place or date):
            continue
        return f"{label}~{place}~{org}~{date}"
    return None


# ------------------------------------------------------------ the extractor

def extract_tei_fields(content: str) -> dict:
    """Pure-python core: the top-level work's field families plus per-item
    rows keyed by the nested work ids (joined downstream onto the
    internal-works output of plans/tei_transform.py)."""
    import xml.etree.ElementTree as ET

    from .tei_transform import _extract_internal_works, wrapper_title

    empty = {
        "languages": [], "notes": [], "physical_description": None,
        "subjects": [], "contributors": [], "production": None, "items": [],
    }
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return empty

    wrapper_id = _attr(root, "id") or wrapper_title(root)
    catalogues = [
        _text(n)
        for n in _path(
            [root], "teiHeader", "fileDesc", "publicationStmt", "idno"
        )
        if n.get("type") == "catalogue"
    ]
    fihrist = any(c.strip().lower() == "fihrist" for c in catalogues)

    msdescs = _descendants(root, "msDesc")
    contents = _path(msdescs, "msContents")
    langs, lang_notes = tei_languages(contents)
    try:
        scribes = tei_scribes(root, wrapper_id)
    except ValueError:
        scribes = {}

    top = {
        "languages": langs,
        "notes": [f"language-note~{n}" for n in lang_notes]
        + tei_top_level_notes(root),
        "physical_description": tei_physical_description(msdescs),
        "subjects": tei_subjects(root),
        "contributors": scribes.get(wrapper_id, []),
        "production": tei_production(_path(msdescs, "history", "origin")),
    }

    # per-nested-work rows, aligned with the internal-works walk
    internal, _err = _extract_internal_works(content)
    by_id = {}
    for node in root.iter():
        if _local(node.tag) in ("msItem", "msPart"):
            nid = _attr(node, "id").strip()
            if nid and nid not in by_id:
                by_id[nid] = node
    items = []
    for wid, _title, _alts, _depth, _parent in internal:
        node = by_id.get(wid)
        if node is None:
            continue
        is_part = _local(node.tag) == "msPart"
        lang_nodes = _children(node, "msContents") if is_part else [node]
        il, iln = tei_languages(lang_nodes)
        try:
            authors = [] if is_part else tei_authors(node, fihrist)
        except ValueError:
            authors = []
        items.append({
            "id": wid,
            "languages": il,
            "notes": [f"language-note~{n}" for n in iln] + tei_notes([node]),
            "contributors": authors + scribes.get(wid, []),
            # msPart only — the reference's msItem branch never sets these
            # (TeiNestedData.scala:110-138 vs 63-90)
            "physical_description": (
                tei_physical_description([node]) if is_part else None
            ),
            "production": (
                tei_production(_path(_children(node, "history"), "origin"))
                if is_part
                else None
            ),
        })
    return {**top, "items": items}


_FIELDS_T = (
    "struct<languages:array<string>,notes:array<string>,"
    "physical_description:string,subjects:array<string>,"
    "contributors:array<string>,production:string,"
    "items:array<struct<id:string,languages:array<string>,"
    "notes:array<string>,contributors:array<string>,"
    "physical_description:string,production:string>>>"
)


def tei_fields_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_FIELDS_T)
    def _extract(contents: pd.Series) -> pd.DataFrame:
        rows = [extract_tei_fields(c or "") for c in contents]
        return pd.DataFrame(rows)

    return _extract
