"""Sierra holdings enumeration: the 853/863 caption-pairing family (X-family
scalar logic, like the period parser).

The reference renders serial holdings statements by pairing 853 caption
fields with 863 value fields via subfield ǂ8 link/sequence numbers, then
building display strings with range expansion, month/season naming and
public notes (transformer_sierra/.../SierraHoldingsEnumeration.scala — 431
lines whose behaviour was partly reverse-engineered from
wellcomelibrary.org; the documented-example table in the reference's test
suite is ported to tests/test_holdings.py).

Like the fuzzy period parser (functions/periods.py), this is deeply branchy
per-record logic over tiny lists — the one place the brief's "UDFs are the
slow path" rule yields: a vectorized Arrow-batched pandas UDF over the
record's varFields (serialized as JSON) beats any attempt to express 431
lines of string casework in Catalyst expressions, and the per-row cost is
micro-seconds over a handful of subfields.

Semantics carried over (file:line in SierraHoldingsEnumeration.scala):

* human-written enumerations — fieldTag 'h' varFields WITHOUT a marcTag,
  content verbatim, listed before the automatic ones (:36-46)
* labels — 853 fields with integer ǂ8; duplicate links: LAST wins
  (Scala's ``.toMap``) (:48-76, :364-386)
* values — 863 fields with ǂ8 parsed as '<link>.<sequence>' (both
  integers); anything else is dropped with a warning (:389-410)
* pairing — values joined to their label by link, sorted by
  (link, sequence); values with no label are dropped (:99-117)
* caption — per 863 subfield (except ǂ8), the label's FIRST same-tag
  subfield content becomes the label text; '-'-valued parts dropped;
  any part containing '-' makes the WHOLE caption a range: split each
  part once on '-', head→start, last→end (a single value serves as both),
  'start - end' unless equal (:126-189)
* rendering — parts whose label contains season/year/month/day are date
  parts (keyed by the lowercased, paren-stripped label); the rest are
  textual, rendered '(value)' for parenthesised labels else
  '<label><value>', folded right-to-left joining 'v...'+'no...' with ':'
  and everything else with spaces; dates render via the month/season
  tables ('03'→'Mar.', '21'→'Spring', slash-separated values map
  part-wise), day strips ONE leading zero, a month RANGE keeps only its
  first month, and 'textual (date)' combines the halves (:191-310)
* public note — 863 ǂz contents appended after the caption (:118-124)
* output — trimmed, de-duplicated preserving order (:121-124)
"""

from __future__ import annotations

import json

_SEASONS = {"21": "Spring", "22": "Summer", "23": "Autumn", "24": "Winter"}
_MONTHS = {
    "01": "Jan.", "02": "Feb.", "03": "Mar.", "04": "Apr.", "05": "May",
    "06": "June", "07": "July", "08": "Aug.", "09": "Sept.", "10": "Oct.",
    "11": "Nov.", "12": "Dec.",
    **_SEASONS,
}
_DATE_WORDS = ("season", "year", "month", "day")


def _subfields(vf: dict) -> list[dict]:
    return vf.get("subfields") or []


def _first_sub(vf: dict, tag: str) -> str | None:
    for s in _subfields(vf):
        if s.get("tag") == tag:
            return s.get("content")
    return None


def _to_named_month(s: str | None):
    """(rendered, is_all_months) or None (toNamedMonth :316-337)."""
    if s is None:
        return None
    parts = s.split("/")
    if all(p in _MONTHS for p in parts):
        return (
            "/".join(_MONTHS[p] for p in parts),
            not any(p in _SEASONS for p in parts),
        )
    return None


def _strip_one_prefix(s: str, prefix: str) -> str:
    return s[len(prefix):] if s.startswith(prefix) else s


def _strip_one_suffix(s: str, suffix: str) -> str:
    return s[: -len(suffix)] if s.endswith(suffix) else s


def _concatenate_parts(parts: list[tuple[str, str]]) -> str:
    non_empty = [(l, v) for l, v in parts if v != ""]
    date_parts = [
        (l, v) for l, v in non_empty
        if any(w in l.lower() for w in _DATE_WORDS)
    ]
    textual = [p for p in non_empty if p not in date_parts]

    dmap = {}
    for label, value in date_parts:
        key = _strip_one_suffix(_strip_one_prefix(label.lower(), "("), ")")
        if key == "month" and "-" in value:
            value = value.split("-")[0]
        dmap[key] = value

    date_string = None
    try:
        year = dmap.get("year")
        if year is not None:
            year = _strip_one_suffix(year, ".")
        if "season" in dmap:
            named = _to_named_month(dmap.get("season"))
            pieces = [named[0] if named else None, year]
        else:
            named = _to_named_month(dmap.get("month"))
            if named and named[1]:
                pieces = [
                    _strip_one_prefix(dmap["day"], "0") if "day" in dmap else None,
                    named[0],
                    year,
                ]
            elif named:
                pieces = [named[0], year]
            else:
                pieces = [
                    _strip_one_prefix(dmap["day"], "0") if "day" in dmap else None,
                    _MONTHS.get(dmap.get("month")),
                    year,
                ]
        date_string = " ".join(p for p in pieces if p is not None)
    except Exception:
        date_string = None

    rendered = [
        f"({v})" if l.startswith("(") else f"{l}{v}" for l, v in textual
    ]
    textual_string = ""
    for next_part in reversed(rendered):
        if textual_string.startswith("no.") and next_part.startswith("v"):
            textual_string = next_part + ":" + textual_string
        else:
            textual_string = next_part + " " + textual_string
    textual_string = textual_string.strip()

    if textual_string and date_string:
        return f"{textual_string} ({date_string})"
    if date_string:
        return date_string
    return textual_string


def _create_string(label_vf: dict, value_vf: dict) -> str:
    parts = []
    for sf in _subfields(value_vf):
        if sf.get("tag") == "8":
            continue
        lab = _first_sub(label_vf, sf.get("tag"))
        if lab is not None:
            parts.append((lab, sf.get("content") or ""))
    parts = [(l, v) for l, v in parts if v.strip() != "-"]

    if any("-" in v for _, v in parts):
        start = [(l, v.split("-", 1)[0]) for l, v in parts]
        end = [(l, v.split("-", 1)[-1]) for l, v in parts]
        s, e = _concatenate_parts(start), _concatenate_parts(end)
        return s if s == e else f"{s} - {e}"
    return _concatenate_parts(parts)


def holdings_enumeration(varfields: list[dict]) -> list[str]:
    """The full SierraHoldingsEnumeration.apply over one record's
    varFields (as dicts with fieldTag/marcTag/content/subfields)."""
    human = [
        vf["content"]
        for vf in varfields
        if vf.get("fieldTag") == "h" and not vf.get("marcTag") and vf.get("content")
    ]

    labels = {}
    for vf in varfields:
        if vf.get("marcTag") != "853":
            continue
        raw = _first_sub(vf, "8")
        if raw is None:
            continue
        try:
            labels[int(raw)] = vf  # duplicate links: last wins (.toMap)
        except ValueError:
            continue

    values = []
    for vf in varfields:
        if vf.get("marcTag") != "863":
            continue
        raw = _first_sub(vf, "8")
        if raw is None:
            continue
        bits = (raw or "").split(".")
        try:
            nums = [int(b) for b in bits]
        except ValueError:
            continue
        if len(nums) != 2:
            continue
        values.append((nums[0], nums[1], vf))

    out = []
    for link, seq, vf in sorted(values, key=lambda t: (t[0], t[1])):
        label_vf = labels.get(link)
        if label_vf is None:
            continue
        note = " ".join(
            s.get("content") or "" for s in _subfields(vf) if s.get("tag") == "z"
        )
        out.append((_create_string(label_vf, vf) + " " + note).strip())

    deduped = []
    for s in out:
        if s not in deduped:
            deduped.append(s)
    return human + deduped


def holdings_enumeration_udf():
    """Arrow-batched pandas UDF: JSON-serialized varFields →
    array<string> enumerations."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _udf(varfields_json):
        import pandas as pd

        def run(s):
            if s is None:
                return []
            try:
                return holdings_enumeration(json.loads(s))
            except (ValueError, TypeError):
                return []

        return varfields_json.map(run)

    return _udf
