"""Fuzzy period / freeform date parsing (SURVEY.md §2.9 X1).

Python re-expression of the reference's combinator parser
(PeriodParser.scala:7-47 + Lex.scala, Qualifier.scala, ToInstantRange.scala):
a human-written period label ("c. 1920", "early 19th century", "spring
1868", "12 Jan 1872 - 3 Feb 1873", "1994-5", "mid-late 1800s") becomes a
closed [from_date, to_date] interval.

Semantics reproduced:
  * preprocessing strips non-semantic tokens ([gaps], floruit, fl.,
    between, brackets, '?', '.', '"', ©, leading roman numerals)
  * multi-period labels ("1956; 1957, 1959") parse each period and return
    the covering interval
  * half-bounded dates: "before 1800" / "-1800" and "after 1917" / "1917-"
  * single dates: calendar dates in several orders, month+year, seasons
    and law terms, centuries ("19th century", "1800s"), decades ("1920s"),
    year ranges ("1994-5", "1066-90"), plain years
  * qualifiers (period_field_format.htm semantics via Qualifier.scala):
    about/circa, early/mid/late (+compounds) on centuries and decades,
    about/pre/post on years; unknown qualifier combinations fall back to
    the unqualified date (the reference's noopQualifier)
  * "n.d." / "undated" / "unknown" parse to no interval

The scalar core is pure Python; Spark access is the Arrow-batched pandas
UDF ``parse_period_udf`` (the §2.11 discipline: Python only off the hot
path, vectorized when used).
"""

from __future__ import annotations

import calendar
import datetime as dt
import re

# module-level so typing.get_type_hints can resolve the UDF's (stringified,
# via __future__ annotations) pd.Series/pd.DataFrame hints against globals
import pandas as pd

DATE_MIN = dt.date(1, 1, 1)
DATE_MAX = dt.date(9999, 12, 31)

_ROMAN = r'^"?(?=[mdclxvi.,\s]{3,})m*[.,]?\s?(c[md]|d?c*)[.,]?\s?(x[cl]|l?x*)[.,]?\s?(i[xv]|v?i*)\b'
_IGNORE = re.compile(
    r"\[gaps\]|floruit|fl\.|\bfl\b|between|\ba\.d\.|[()\[\]?\"©.]|" + _ROMAN
)

_MONTHS = {}
for i in range(1, 13):
    _MONTHS[calendar.month_name[i].lower()] = i
    _MONTHS[calendar.month_abbr[i].lower()] = i
_MONTH_RE = "|".join(sorted(_MONTHS, key=len, reverse=True))

_SEASONS = {"spring": (3, 5), "summer": (6, 8), "autumn": (9, 11), "fall": (9, 11), "winter": (12, 2)}
_LAW_TERMS = {"michaelmas": (10, 11), "hilary": (1, 2), "easter": (4, 5), "trinity": (6, 7)}
_NO_DATE = {"nd", "n d", "undated", "unknown", ""}

# note: no \b after the qualifier — the reference's Lex.StringIn matches
# "c1920" (preprocessing already dropped the dot from "c.1920")
_QUAL_RE = re.compile(
    r"^(early[\s-]*(?:to[\s-]*)?mid|mid[\s-]*(?:to[\s-]*)?late|about|approx|circa|circ|"
    r"pre|post|middle|mid|early|late|c)(?=[\s\d-])[\s-]*(.*)$"
)
_QUAL_CANON = {
    "c": "about", "circa": "about", "circ": "about", "approx": "about", "about": "about",
    "middle": "mid", "mid": "mid", "early": "early", "late": "late",
    "pre": "pre", "post": "post",
}


def _month_end(y: int, m: int) -> dt.date:
    return dt.date(y, m, calendar.monthrange(y, m)[1])


def _year_span(y1: int, y2: int):
    return (dt.date(y1, 1, 1), dt.date(y2, 12, 31))


def preprocess(label: str) -> str:
    s = _IGNORE.sub("", label.lower())
    return re.sub(r"\s+", " ", s).strip()


def _canon_qualifier(q: str) -> str:
    q = q.strip()
    if q.startswith("early") and "mid" in q:
        return "early-mid"
    if q.startswith("mid") and "late" in q:
        return "mid-late"
    return _QUAL_CANON.get(q, q)


def _qualify_century(q: str, c: int):
    base = 100 * c
    spans = {
        "early": (base, base + 39), "mid": (base + 30, base + 69),
        "late": (base + 60, base + 99), "early-mid": (base, base + 69),
        "mid-late": (base + 30, base + 99), "about": (base - 10, base + 109),
    }
    return _year_span(*spans[q]) if q in spans else None


def _qualify_decade(q: str, start: int):
    spans = {
        "about": (start - 10, start + 20), "early": (start, start + 3),
        "mid": (start + 3, start + 6), "late": (start + 6, start + 9),
    }
    return _year_span(*spans[q]) if q in spans else None


def _qualify_year(q: str, y: int):
    spans = {"about": (y - 10, y + 9), "pre": (y - 10, y), "post": (y, y + 9)}
    return _year_span(*spans[q]) if q in spans else None


def _parse_calendar(s: str):
    """Exact day: numeric d/m/y and written-month orders."""
    m = re.fullmatch(r"(\d{1,2})/(\d{1,2})/(\d{3,4})", s)
    if m:
        d, mo, y = map(int, m.groups())
        return _safe_date(y, mo, d)
    pats = [
        (rf"(\d{{1,2}})(?:st|nd|rd|th)?\s+({_MONTH_RE}|\d{{1,2}})\s*,?\s+(\d{{3,4}})", "dmy"),
        (rf"({_MONTH_RE})\s+(\d{{1,2}})(?:st|nd|rd|th)?\s*,?\s+(\d{{3,4}})", "mdy"),
        (rf"(\d{{3,4}})\s+({_MONTH_RE}|\d{{1,2}})\s+(\d{{1,2}})(?:st|nd|rd|th)?", "ymd"),
    ]
    for pat, order in pats:
        m = re.fullmatch(pat, s)
        if not m:
            continue
        g = m.groups()
        if order == "dmy":
            d, mo, y = g
        elif order == "mdy":
            mo, d, y = g
        else:
            y, mo, d = g
        mo = _MONTHS.get(mo, None) if not str(mo).isdigit() else int(mo)
        if mo is None:
            return None
        return _safe_date(int(y), int(mo), int(d))
    return None


def _safe_date(y: int, m: int, d: int):
    try:
        x = dt.date(y, m, d)
    except ValueError:
        return None
    return (x, x)


def _parse_month_year(s: str):
    m = re.fullmatch(rf"({_MONTH_RE})\s+(\d{{3,4}})", s) or re.fullmatch(
        rf"(\d{{3,4}})\s+({_MONTH_RE})", s
    )
    if not m:
        return None
    a, b = m.groups()
    mo, y = (_MONTHS[a], int(b)) if a in _MONTHS else (_MONTHS[b], int(a))
    return (dt.date(y, mo, 1), _month_end(y, mo))


def _parse_year_division(s: str):
    m = re.fullmatch(r"([a-z]+)\s+(\d{3,4})", s)
    if not m:
        return None
    word, y = m.group(1), int(m.group(2))
    if word in _SEASONS:
        m1, m2 = _SEASONS[word]
        y2 = y if m1 < m2 else y + 1  # winter YEAR = year winter starts
        return (dt.date(y, m1, 1), _month_end(y2, m2))
    if word in _LAW_TERMS:
        m1, m2 = _LAW_TERMS[word]
        return (dt.date(y, m1, 1), _month_end(y, m2))
    return None


def _century_index(s: str):
    """'1800s' → 18; '19th century' → 18. None if not a century."""
    m = re.fullmatch(r"(\d{3,4})'?s", s)
    if m and int(m.group(1)) % 100 == 0:
        return int(m.group(1)) // 100
    m = re.fullmatch(r"(\d{1,2})(?:st|nd|rd|th)?\s*cent(?:ury)?", s)
    if m:
        return int(m.group(1)) - 1
    return None


def _decade_start(s: str):
    m = re.fullmatch(r"(\d{3,4})'?s", s)
    if m and int(m.group(1)) % 10 == 0:
        return int(m.group(1))
    return None


def _parse_single(s: str):
    """One (possibly qualified) date → (from, to) or None. Mirrors
    PeriodParser.singleDate's alternation order."""
    s = s.strip()
    if not s:
        return None
    got = _parse_calendar(s) or _parse_month_year(s) or _parse_year_division(s)
    if got:
        return got
    qm = _QUAL_RE.fullmatch(s)
    if qm and qm.group(2):
        q, rest = _canon_qualifier(qm.group(1)), qm.group(2).strip()
        c = _century_index(rest)
        if c is not None:
            out = _qualify_century(q, c)
            if out:
                return out
        d = _decade_start(rest)
        if d is not None:
            out = _qualify_decade(q, d)
            if out:
                return out
        if re.fullmatch(r"\d{3,4}", rest):
            out = _qualify_year(q, int(rest))
            if out:
                return out
        # unknown qualifier/date combination: the reference's noopQualifier
        return _parse_single(rest)
    c = _century_index(s)
    if c is not None:
        return _year_span(100 * c, 100 * c + 99)
    d = _decade_start(s)
    if d is not None:
        return _year_span(d, d + 9)
    m = re.fullmatch(r"(\d{3,4})\s*-\s*(\d{1,2})", s)  # 1994-5, 1066-90
    if m:
        y, n = int(m.group(1)), m.group(2)
        y2 = y - (y % 10) + int(n) if len(n) == 1 else y - (y % 100) + int(n)
        return _year_span(y, y2)
    if re.fullmatch(r"\d{3,4}", s):
        return _year_span(int(s), int(s))
    if s == "present":
        return (DATE_MAX, DATE_MAX)
    return None


def _parse_partial(s: str):
    """One range side as a partial (kind, day, month, year) — the fuzzy-date
    atoms that borrow missing fields from the other side of a range
    (DateParserImplicits' `to` combinator). kinds: cal/my/md/m/d/y."""
    s = s.strip()
    got = _parse_calendar(s)
    if got:
        d = got[0]
        return ("cal", d.day, d.month, d.year)
    m = re.fullmatch(rf"({_MONTH_RE})\s+(\d{{3,4}})", s) or re.fullmatch(
        rf"(\d{{3,4}})\s+({_MONTH_RE})", s
    )
    if m:
        a, b = m.groups()
        mo, y = (_MONTHS[a], int(b)) if a in _MONTHS else (_MONTHS[b], int(a))
        return ("my", None, mo, y)
    m = re.fullmatch(
        rf"(\d{{1,2}})(?:st|nd|rd|th)?\s+({_MONTH_RE})", s
    ) or re.fullmatch(rf"({_MONTH_RE})\s+(\d{{1,2}})(?:st|nd|rd|th)?", s)
    if m:
        a, b = m.group(1), m.group(2)
        d, mo = (int(a), _MONTHS[b]) if a not in _MONTHS else (int(b), _MONTHS[a])
        if 1 <= d <= 31:
            return ("md", d, mo, None)
    if s in _MONTHS:
        return ("m", None, _MONTHS[s], None)
    m = re.fullmatch(r"(\d{1,2})(?:st|nd|rd|th)?", s)
    if m and 1 <= int(m.group(1)) <= 31:
        return ("d", int(m.group(1)), None, None)
    if re.fullmatch(r"\d{3,4}", s):
        return ("y", None, None, int(s))
    return None


# The reference's dateRange alternation as a closed (left, right) whitelist
# (PeriodParser.scala calendarDateToDate/monthAndYearToDate/yearToDate +
# (monthAndDay to calendarDate), (month to monthAndYear), (day to
# calendarDate)) — NOT arbitrary partial×partial, which would mis-eat year
# ranges like "1994-5".
_PARTIAL_COMBOS = {
    ("cal", "cal"), ("cal", "y"), ("cal", "my"), ("cal", "md"), ("cal", "m"), ("cal", "d"),
    ("my", "cal"), ("my", "my"), ("my", "md"), ("my", "m"), ("my", "y"),
    ("md", "cal"), ("m", "my"), ("d", "cal"), ("y", "cal"), ("y", "my"),
}


def _combine_partials(left: str, right: str):
    lp, rp = _parse_partial(left), _parse_partial(right)
    if not lp or not rp or (lp[0], rp[0]) not in _PARTIAL_COMBOS:
        return None
    _, dl, ml, yl = lp
    _, dr, mr, yr = rp
    y_from, y_to = yl if yl is not None else yr, yr if yr is not None else yl
    if y_from is None or y_to is None:
        return None
    # a day-only side borrows its month from the other side; otherwise
    # missing months default to the interval edges
    m_from = ml if ml is not None else (mr if dl is not None else 1)
    m_to = mr if mr is not None else (ml if dr is not None else 12)
    d_from = dl if dl is not None else 1
    try:
        start = dt.date(y_from, m_from, d_from)
        end = dt.date(y_to, m_to, dr) if dr is not None else _month_end(y_to, m_to)
    except ValueError:
        return None
    return (start, end)


def _combine(left: str, right: str):
    lf, rt = _parse_single(left), _parse_single(right)
    # inferredCentury: "14" in "14th-15th century" means the 15th century
    # (PeriodParser.inferredCentury) — a bare small ordinal on the left of a
    # century right-hand side
    if lf is None and rt is not None and _century_index(right) is not None:
        m = re.fullmatch(r"(\d{1,3})(?:st|nd|rd|th)?", left)
        if m:
            c = int(m.group(1)) - 1
            lf = _year_span(100 * c, 100 * c + 99)
    if lf and rt:
        return (lf[0], rt[1])
    return _combine_partials(left, right)


def _parse_range(s: str):
    """'X - Y' / 'X to Y' → combined interval; half-bounded forms."""
    m = re.fullmatch(r"(.+?)\s+to\s+(.+)", s)
    if not m:
        # split on a dash with single-date sides; rightmost split first so
        # "12 jan 1872 - 3 feb 1873" works and "1994-5" stays a yearRange
        for i in [i for i, ch in enumerate(s) if ch == "-"][::-1]:
            left, right = s[:i].strip(), s[i + 1:].strip()
            if not left or not right:
                continue
            got = _combine(left, right)
            if got:
                return got
        m = None
    else:
        got = _combine(m.group(1), m.group(2))
        if got:
            return got
    one = _parse_single(s)
    if one:
        return one
    # half-bounded (PeriodParser.halfBoundedDate)
    if s.startswith("-") or s.startswith("before "):
        inner = _parse_single(s.removeprefix("before ").lstrip("- "))
        if inner:
            return (DATE_MIN, inner[1])
    if s.endswith("-") or s.startswith("after "):
        inner = _parse_single(s.removeprefix("after ").rstrip("- "))
        if inner:
            return (inner[0], DATE_MAX)
    return None


def parse_period(label: str | None):
    """(from_date, to_date) covering every period in the label, or None.
    An interval that comes out inverted (a self-contradictory label like
    "mid 1920s - michaelmas 1920") is unparseable, never emitted."""
    got = _parse_period_raw(label)
    if got is not None and got[0] > got[1]:
        return None
    return got


def _parse_period_raw(label: str | None):
    if label is None:
        return None
    s = preprocess(label)
    if s in _NO_DATE:
        return None
    whole = _parse_range(s)
    if whole:
        return whole
    # multi-period: union of parts ("1956; 1957, 1959")
    parts = [p for p in re.split(r"\s*(?:;|,|\band\b)\s*", s) if p.strip()]
    if len(parts) > 1:
        spans = [_parse_range(p) for p in parts]
        spans = [x for x in spans if x]
        if spans and len(spans) == len(parts):
            return (min(a for a, _ in spans), max(b for _, b in spans))
    return None


def parse_period_udf():
    """Arrow-batched pandas UDF: label → struct(from_date date, to_date
    date, parsed boolean). Import-gated so the scalar core stays usable
    without pyspark."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("from_date date, to_date date, parsed boolean")
    def _parse(labels: pd.Series) -> pd.DataFrame:
        out = {"from_date": [], "to_date": [], "parsed": []}
        for v in labels:
            got = parse_period(v)
            out["from_date"].append(got[0] if got else None)
            out["to_date"].append(got[1] if got else None)
            out["parsed"].append(got is not None)
        return pd.DataFrame(out)

    return _parse
