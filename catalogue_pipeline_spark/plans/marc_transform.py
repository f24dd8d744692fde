"""Per-source transformer slice: EBSCO MARCXML → work fields.

The reference's largest functional mass is source-specific transformers
mapping MARC records into the Work model; this is the EBSCO slice re-expressed
Spark-first (every rule a column expression inside codegen — no pymarc, no
per-row Python):

  * source id    — controlfield 001, trimmed; mandatory
                   (marc/identifier.py extract_id)
  * title        — datafield 245, subfields {a,b,c,h,n,p} in ORIGINAL order;
                   a trailing $h is dropped entirely; a retained $h has all
                   "[...]" segments removed then trimmed; other subfields are
                   preserved verbatim; joined with single spaces; a record
                   whose components are all blank is an error
                   (marc/title.py extract_title / MarcTitle.scala rules)
  * other ids    — 020$a → isbn, 022$a → issn, only fields that HAVE an $a
                   (ebsco/other_identifiers.py)
  * alt titles   — 130/240/246 full-field values, caption titles (246
                   ind2=6) skipped, trimmed/deduped preserving order
                   (marc/alternative_titles.py)
  * description  — 520 $a/$b/$c + $u-as-HTML-link per field in a <p>,
                   fields joined with newlines (marc/description.py)
  * contributors — 100/110/111/700/710/711 with type-specific label
                   subfields, $e roles, primary fronting and primary-blind
                   dedupe (ebsco/contributors.py)
  * subjects     — 600/610/611/648/650/651 with the indicator-2 keep rule
                   and tag-specific label builds (ebsco/subjects.py)
  * edition      — 250 $a (ebsco/edition.py)
  * format       — leader chars 6/7 × 006 char 6 positional rules →
                   ebooks/ejournals (ebsco/format.py, parsers/leader.py,
                   parsers/field006.py)
  * language     — 008 chars 35-37 through the MARC code lookup
                   (ebsco/language.py, parsers/field008.py)
  * production   — 260/264 events with 260-preference and indicator-2
                   functions; 008 maximal date ranges through the period
                   parser (ebsco/production.py, parsers/field008.py)
  * designation / current frequency — 362 $a / 310 $a$b
  * genres       — 655 single-$a labels with subdivisions
                   (ebsco/genres.py, label_subdivisions.py)
  * holdings     — 856 $3/$z/$u online resources with the URL guard
                   (ebsco/holdings.py)
  * parents      — 440/490/773/830 Series titles, suffix-trimmed + deduped
                   (ebsco/parents.py)
  * deleted      — rows flagged deleted become Deleted works (with reason),
                   everything else Visible (marcxml_transformer.py:44-52)
  * errors       — per-record failures don't abort the batch: they surface as
                   type='Error' rows with a reason, and the batch-level
                   report counts successes vs failures
                   (transformer.py:96-168 success_count/failure_count)

Input contract: (id, content, deleted, last_modified) — the shape
``load_marcxml_collection`` + snapshot bookkeeping produce (S5/J4).

V2 on re-transform: transformed works are deterministic functions of
(content, deleted), so writing them through the engine's LWW merge path makes
an unchanged re-transform a complete no-op — no bucket is rewritten and no
snapshot is committed (tested in tests/test_marc_transform.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# subfield elements inside a datafield, in document order
_SUBFIELD_RE = r'(?s)<(?:\w+:)?subfield[^>]*code="[a-z0-9]"[^>]*>.*?</(?:\w+:)?subfield>'
_CONTROL_001_RE = (
    r'(?s)<(?:\w+:)?controlfield[^>]*tag="001"[^>]*>\s*(.*?)\s*</(?:\w+:)?controlfield>'
)


def _datafield_block(content: Column, tag: str) -> Column:
    """First datafield element with the given tag (the reference picks the
    first 245 when the non-repeatable field repeats)."""
    return F.regexp_extract(
        content,
        rf'(?s)<(?:\w+:)?datafield[^>]*tag="{tag}"[^>]*>(?:(?!</(?:\w+:)?datafield>).)*</(?:\w+:)?datafield>',
        0,
    )


def _all_datafield_blocks(content: Column, tags: list[str]) -> Column:
    alt = "|".join(tags)
    return F.regexp_extract_all(
        content,
        F.lit(
            rf'(?s)<(?:\w+:)?datafield[^>]*tag="(?:{alt})"[^>]*>(?:(?!</(?:\w+:)?datafield>).)*</(?:\w+:)?datafield>'
        ),
        0,
    )


def _sub_code(el: Column) -> Column:
    return F.regexp_extract(el, r'code="([a-z0-9])"', 1)


def _sub_value(el: Column) -> Column:
    # verbatim (NO trim — the title rule preserves whitespace), entities decoded
    v = F.regexp_extract(el, r"(?s)>(.*?)</(?:\w+:)?subfield>", 1)
    return _xml_unescape(v)


def _xml_unescape(c: Column) -> Column:
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _title_expr(content: Column) -> Column:
    """MarcTitle rules over the first 245 field; NULL when 245 is missing or
    yields only blank components (caller turns null into an Error row)."""
    block = _datafield_block(content, "245")
    subs = F.regexp_extract_all(block, F.lit(_SUBFIELD_RE), 0)
    sel = F.filter(subs, lambda el: _sub_code(el).isin("a", "b", "c", "h", "n", "p"))
    # drop a single trailing $h outright
    sel = F.when(
        (F.size(sel) > 0) & (_sub_code(F.element_at(sel, -1)) == "h"),
        F.slice(sel, 1, F.size(sel) - 1),
    ).otherwise(sel)
    comps = F.transform(
        sel,
        lambda el: F.when(
            _sub_code(el) == "h",
            F.trim(F.regexp_replace(_sub_value(el), r"\[[^\]]+\]", "")),
        ).otherwise(_sub_value(el)),
    )
    joined = F.array_join(comps, " ")
    all_blank = F.size(F.filter(comps, lambda c: F.trim(c) != "")) == 0
    return F.when((F.size(comps) > 0) & ~all_blank, joined)


def _other_identifiers_expr(content: Column) -> Column:
    """020$a → isbn, 022$a → issn for fields that HAVE an $a, in document
    order, serialized as 'type:value' strings."""
    blocks = _all_datafield_blocks(content, ["020", "022"])
    with_a = F.filter(
        blocks,
        lambda b: F.regexp_extract(b, r'<(?:\w+:)?subfield[^>]*code="a"', 0) != "",
    )
    return F.transform(
        with_a,
        lambda b: F.concat(
            F.when(b.contains('tag="020"'), F.lit("isbn")).otherwise(F.lit("issn")),
            F.lit(":"),
            _xml_unescape(
                F.trim(
                    F.regexp_extract(
                        b,
                        r'(?s)<(?:\w+:)?subfield[^>]*code="a"[^>]*>(.*?)</(?:\w+:)?subfield>',
                        1,
                    )
                )
            ),
        ),
    )


def _field_subfield_values(block: Column) -> Column:
    """All subfield values of one datafield, in document order."""
    return F.transform(
        F.regexp_extract_all(block, F.lit(_SUBFIELD_RE), 0), _sub_value
    )


def _alternative_titles_expr(content: Column) -> Column:
    """130/240/246 → alternative titles (marc/alternative_titles.py): all
    subfield values of each field joined with spaces, 246-with-ind2=6
    (caption titles) skipped, trimmed, blanks dropped, de-duplicated with
    first-occurrence order preserved."""
    blocks = _all_datafield_blocks(content, ["130", "240", "246"])
    keep = F.filter(
        blocks,
        lambda b: ~(b.contains('tag="246"') & (F.regexp_extract(b, r'ind2="6"', 0) != "")),
    )
    titles = F.transform(keep, lambda b: F.trim(F.array_join(_field_subfield_values(b), " ")))
    return F.array_distinct(F.filter(titles, lambda t: t != ""))


def _description_expr(content: Column) -> Column:
    """520 → description (marc/description.py): per field, subfields a/b/c
    trimmed then $u values (URL-shaped ones wrapped as HTML links), joined
    with spaces inside a <p> element; fields joined with newlines; NULL when
    there is no 520 content."""
    blocks = _all_datafield_blocks(content, ["520"])

    def fmt(b):
        subs = F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0)
        plain = F.transform(
            F.filter(subs, lambda el: _sub_code(el).isin("a", "b", "c")),
            lambda el: F.trim(_sub_value(el)),
        )
        links = F.transform(
            F.filter(subs, lambda el: _sub_code(el) == "u"),
            lambda el: F.when(
                F.trim(_sub_value(el)).rlike(r"^https?://"),
                F.concat(
                    F.lit('<a href="'),
                    F.trim(_sub_value(el)),
                    F.lit('">'),
                    F.trim(_sub_value(el)),
                    F.lit("</a>"),
                ),
            ).otherwise(_sub_value(el)),
        )
        return F.concat(
            F.lit("<p>"), F.array_join(F.concat(plain, links), " "), F.lit("</p>")
        )

    joined = F.trim(F.array_join(F.transform(blocks, fmt), "\n"))
    return F.when(F.size(blocks) > 0, joined)


_TRAILING_PERIOD_RE = r"([^.])\.\s*$"  # one trailing period, never an ellipsis


def _trim_trailing_period(c: Column) -> Column:
    return F.rtrim(F.regexp_replace(c, _TRAILING_PERIOD_RE, r"$1"))


def _trim_trailing_comma(c: Column) -> Column:
    return F.regexp_replace(c, r"\s*,\s*$", "")


_CONTRIB_TAGS = ["100", "110", "111", "700", "710", "711"]
_PERSON_ORG_LABEL = ["a", "b", "c", "d", "q", "t", "l"]
_MEETING_LABEL = ["a", "c", "d", "n", "t"]


def _contributors_expr(content: Column) -> Column:
    """100/110/111 (primary) + 700/710/711 (added) → contributors
    (ebsco/contributors.py): type from the tag suffix (00 Person, 10
    Organisation, 11 Meeting), label from type-specific subfields (stripped,
    blanks dropped, space-joined, trailing comma trimmed, trailing period
    PRESERVED), roles from $e (trailing period trimmed, ellipses kept),
    primary contributors fronted, duplicates (equal apart from `primary`)
    removed keeping the first. Serialized ``type|label|roles|P-or-S``."""
    blocks = _all_datafield_blocks(content, _CONTRIB_TAGS)

    def fmt(b):
        tag = F.regexp_extract(b, r'tag="(\d{3})"', 1)
        is_meeting = tag.endswith("11")
        ctype = (
            F.when(tag.endswith("00"), F.lit("Person"))
            .when(tag.endswith("10"), F.lit("Organisation"))
            .otherwise(F.lit("Meeting"))
        )
        subs = F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0)
        label_codes = F.when(
            is_meeting, F.array(*[F.lit(c) for c in _MEETING_LABEL])
        ).otherwise(F.array(*[F.lit(c) for c in _PERSON_ORG_LABEL]))
        parts = F.transform(
            F.filter(subs, lambda el: F.array_contains(label_codes, _sub_code(el))),
            lambda el: F.trim(_sub_value(el)),
        )
        label = _trim_trailing_comma(
            F.trim(F.array_join(F.filter(parts, lambda p: p != ""), " "))
        )
        roles = F.array_join(
            F.transform(
                F.filter(subs, lambda el: _sub_code(el) == "e"),
                lambda el: _trim_trailing_period(F.trim(_sub_value(el))),
            ),
            ";",
        )
        primary = F.when(tag.startswith("1"), F.lit("P")).otherwise(F.lit("S"))
        return F.concat_ws("|", ctype, label, roles, primary)

    all_c = F.transform(blocks, fmt)
    fronted = F.concat(
        F.filter(all_c, lambda c: c.endswith("|P")),
        F.filter(all_c, lambda c: c.endswith("|S")),
    )
    # dedupe on everything EXCEPT the primary flag, first occurrence wins
    key = lambda c: F.regexp_replace(c, r"\|[PS]$", "")  # noqa: E731
    return F.aggregate(
        fronted,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            F.exists(acc, lambda y: key(y) == key(x)), acc
        ).otherwise(F.concat(acc, F.array(x))),
    )


_SUBJECT_TAGS = ["600", "610", "611", "648", "650", "651"]
_SUBDIVISION_CODES = ["v", "x", "y", "z"]


def _subjects_expr(content: Column) -> Column:
    """600/610/611/648/650/651 → subject labels (ebsco/subjects.py): kept
    when ind2 ∈ {0,2} or (ind2=7 with $2 ∈ local/homoit/indig/enslv) and $a
    is non-blank; tag-specific label builds — 600 appends $e then $x
    space-joined (no trailing-period trim), 610 appends c/d/e, 611 is the
    main label only, 648/650/651 join $a with the v/x/y/z subdivisions
    using ' - '; non-600 labels have trailing periods stripped."""
    blocks = _all_datafield_blocks(content, _SUBJECT_TAGS)

    def vals(subs, codes):
        return F.transform(
            F.filter(subs, lambda el: _sub_code(el).isin(*codes)), _sub_value
        )

    def fmt(b):
        tag = F.regexp_extract(b, r'tag="(\d{3})"', 1)
        subs = F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0)
        ind2 = F.regexp_extract(b, r'ind2="(.)"', 1)
        src2 = F.trim(F.array_join(vals(subs, ["2"]), " "))
        keep = ind2.isin("0", "2") | (
            (ind2 == "7") & src2.isin("local", "homoit", "indig", "enslv")
        )
        a_blank = F.trim(F.array_join(vals(subs, ["a"]), "")) == ""
        main600 = F.array_join(
            vals(subs, ["a", "b", "c", "d", "t", "p", "n", "q", "l"]), " "
        )
        label = (
            F.when(
                tag == "600",
                F.array_join(
                    F.concat(
                        F.array(F.array_join(F.concat(F.array(main600), vals(subs, ["e"])), " ")),
                        vals(subs, ["x"]),
                    ),
                    " ",
                ),
            )
            .when(
                tag == "610",
                F.array_join(
                    F.concat(F.array(F.array_join(vals(subs, ["a", "b"]), " ")), vals(subs, ["c", "d", "e"])),
                    " ",
                ),
            )
            .when(tag == "611", F.array_join(vals(subs, ["a", "c", "d"]), " "))
            .otherwise(
                F.array_join(
                    F.concat(F.array(F.array_join(vals(subs, ["a"]), " ")), vals(subs, _SUBDIVISION_CODES)),
                    " - ",
                )
            )
        )
        label = F.when(tag != "600", F.regexp_replace(label, r"\.+$", "")).otherwise(label)
        return F.when(keep & ~a_blank, label)

    return F.filter(F.transform(blocks, fmt), lambda s: s.isNotNull())


# MARC language codes seen in practice (lookups/languages semantics: unknown
# code → NO language, mirroring from_code's None)
_LANGUAGE_CODES = {
    "eng": "English", "fre": "French", "ger": "German", "spa": "Spanish",
    "ita": "Italian", "lat": "Latin", "dut": "Dutch", "rus": "Russian",
    "chi": "Chinese", "jpn": "Japanese", "ara": "Arabic", "por": "Portuguese",
    "swe": "Swedish", "dan": "Danish", "nor": "Norwegian", "pol": "Polish",
    "gre": "Greek, Modern (1453-)", "heb": "Hebrew", "hin": "Hindi",
    "tur": "Turkish", "cze": "Czech", "hun": "Hungarian", "fin": "Finnish",
    "kor": "Korean", "tha": "Thai", "vie": "Vietnamese", "ukr": "Ukrainian",
    "wel": "Welsh", "gle": "Irish", "cat": "Catalan", "rum": "Romanian",
    "mul": "Multiple languages", "und": "Undetermined",
}


def _control_raw(content: Column, tag: str) -> Column:
    """A control field's value VERBATIM — positional fields (006/008/leader)
    must not be trimmed."""
    return F.regexp_extract(
        content,
        rf'(?s)<(?:\w+:)?controlfield[^>]*tag="{tag}"[^>]*>(.*?)</(?:\w+:)?controlfield>',
        1,
    )


def _leader_raw(content: Column) -> Column:
    return F.regexp_extract(content, r"(?s)<(?:\w+:)?leader[^>]*>(.*?)</(?:\w+:)?leader>", 1)


def _edition_expr(content: Column) -> Column:
    """250 $a joined with spaces (ebsco/edition.py); NULL when absent."""
    blocks = _all_datafield_blocks(content, ["250"])
    vals = F.flatten(
        F.transform(
            blocks,
            lambda b: F.transform(
                F.filter(
                    F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0),
                    lambda el: _sub_code(el) == "a",
                ),
                _sub_value,
            ),
        )
    )
    return F.nullif(F.array_join(vals, " "), F.lit(""))


def _format_expr(content: Column) -> Column:
    """ebsco/format.py: online form (006 char 6 == 'o') of a language
    material record (leader char 6 == 'a') → bibliographic level (leader
    char 7) picks EBooks ('m') or EJournals ('s'); anything else → NULL."""
    leader = _leader_raw(content)
    f006 = _control_raw(content, "006")
    online_lang_material = (F.substring(f006, 7, 1) == "o") & (
        F.substring(leader, 7, 1) == "a"
    )
    return F.when(
        online_lang_material,
        F.when(F.substring(leader, 8, 1) == "m", F.lit("ebooks")).when(
            F.substring(leader, 8, 1) == "s", F.lit("ejournals")
        ),
    )


def _language_expr(content: Column) -> Column:
    """008 chars 35-37 → language as 'code:label' via the MARC code lookup
    (ebsco/language.py + lookups/languages); unknown or absent → NULL."""
    code = F.substring(_control_raw(content, "008"), 36, 3)
    pairs = []
    for k, v in _LANGUAGE_CODES.items():
        pairs.extend([F.lit(k), F.lit(v)])
    label = F.element_at(F.create_map(*pairs), code)
    return F.when(label.isNotNull(), F.concat(code, F.lit(":"), label))


_IND2_264_MAP = {"0": "Production", "1": "Publication", "2": "Distribution", "3": "Manufacture"}


def _production_expr(content: Column) -> Column:
    """260/264 → production events (ebsco/production.py): label = all
    subfield values space-joined; places from $a (+$e on 260, trailing
    colon trimmed, period preserved), agents from $b (+$f on 260, trailing
    comma trimmed), date labels from $c (+$g on 260, trailing period
    trimmed); 260 with $e/$f/$g carries function Manufacture; 264 takes its
    function from indicator 2 (4 or blank → event dropped). 260 events are
    PREFERRED — 264 is used only when no 260 event survives. Serialized
    ``function|label|places;|agents;|dates;`` per event. (The reference's
    'replace label-only dates with the 008 range' refinement happens where
    Periods are parsed — see ``date_range_008`` + ``prod_from``/``prod_to``.)"""

    def events(tag: str):
        blocks = _all_datafield_blocks(content, [tag])

        def fmt(b):
            subs = F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0)
            label = F.trim(F.array_join(F.transform(subs, _sub_value), " "))

            def norm_vals(codes, trim):
                return F.transform(
                    F.filter(subs, lambda el: _sub_code(el).isin(*codes)),
                    lambda el: trim(F.trim(_sub_value(el))),
                )

            place_codes = ["a", "e"] if tag == "260" else ["a"]
            agent_codes = ["b", "f"] if tag == "260" else ["b"]
            date_codes = ["c", "g"] if tag == "260" else ["c"]
            places = norm_vals(place_codes, lambda c: F.regexp_replace(c, r"\s*:\s*$", ""))
            agents = norm_vals(agent_codes, _trim_trailing_comma)
            dates = norm_vals(date_codes, _trim_trailing_period)
            if tag == "260":
                has_efg = F.exists(subs, lambda el: _sub_code(el).isin("e", "f", "g"))
                function = F.when(has_efg, F.lit("Manufacture")).otherwise(F.lit(""))
                keep = label != ""
            else:
                ind2 = F.regexp_extract(b, r'ind2="(.)"', 1)
                function = F.coalesce(
                    *[F.when(ind2 == k, F.lit(v)) for k, v in _IND2_264_MAP.items()]
                )
                keep = (label != "") & function.isNotNull()
            ev = F.concat_ws(
                "|",
                F.coalesce(function, F.lit("")),
                label,
                F.array_join(places, ";"),
                F.array_join(agents, ";"),
                F.array_join(dates, ";"),
            )
            return F.when(keep, ev)

        return F.filter(F.transform(blocks, fmt), lambda e: e.isNotNull())

    e260, e264 = events("260"), events("264")
    # the standalone 008 production event (ebsco/production.py:30-71):
    # used only when neither 260 nor 264 yields an event — label and date
    # are the 008 maximal date range, the place resolves from 008 chars
    # 15-17 through the MARC country-code table (field008.py:69-80,
    # lookups/places.py), agents empty, no function
    from ..functions.marc_places import place_label_expr

    rng = _date_range_008_expr(content)
    place = place_label_expr(F.substring(_control_raw(content, "008"), 16, 3))
    e008 = F.when(
        rng.isNotNull(),
        F.array(
            F.concat_ws(
                "|", F.lit(""), rng, F.coalesce(place, F.lit("")), F.lit(""), rng
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        F.when(F.size(e260) > 0, e260)
        .when(F.size(e264) > 0, e264)
        .otherwise(e008)
    )


def _date_range_008_expr(content: Column) -> Column:
    """008 chars 6-14 → the maximal date range string (parsers/field008.py
    maximal_date_range): type n/| or date1=uuuu → NULL; c/u → '{d1,u→0}-';
    s/r/t → d1, or '{u→0}-{u→9}' when uncertain; d/m/q → '{d1,u→0}-{d2,u→9}'.
    Unexpected type codes yield NULL (the reference raises; a column
    expression degrades, and the transformer's error channel is for
    mandatory fields)."""
    f008 = _control_raw(content, "008")
    dtype = F.substring(f008, 7, 1)
    d1 = F.substring(f008, 8, 4)
    d2 = F.substring(f008, 12, 4)
    d1_0, d1_9 = F.translate(d1, "u", "0"), F.translate(d1, "u", "9")
    d2_9 = F.translate(d2, "u", "9")
    return (
        F.when((f008 == "") | dtype.isin("n", "|") | (d1 == "uuuu"), F.lit(None))
        .when(dtype.isin("c", "u"), F.concat(d1_0, F.lit("-")))
        .when(
            dtype.isin("s", "r", "t"),
            F.when(d1.contains("u"), F.concat(d1_0, F.lit("-"), d1_9)).otherwise(d1),
        )
        .when(dtype.isin("d", "m", "q"), F.concat(d1_0, F.lit("-"), d2_9))
    )


def _designation_expr(content: Column) -> Column:
    """362 $a values (ebsco/designation.py)."""
    blocks = _all_datafield_blocks(content, ["362"])
    return F.flatten(
        F.transform(
            blocks,
            lambda b: F.transform(
                F.filter(
                    F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0),
                    lambda el: _sub_code(el) == "a",
                ),
                _sub_value,
            ),
        )
    )


def _current_frequency_expr(content: Column) -> Column:
    """310 $a/$b per field stripped and space-joined, fields joined with
    spaces; NULL when empty (ebsco/current_frequency.py)."""
    blocks = _all_datafield_blocks(content, ["310"])
    per_field = F.transform(
        blocks,
        lambda b: F.array_join(
            F.transform(
                F.filter(
                    F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0),
                    lambda el: _sub_code(el).isin("a", "b"),
                ),
                lambda el: F.trim(_sub_value(el)),
            ),
            " ",
        ),
    )
    return F.nullif(F.trim(F.array_join(per_field, " ")), F.lit(""))


def _genres_expr(content: Column) -> Column:
    """655 → genre labels (ebsco/genres.py): exactly ONE $a required (0 or
    repeated → whole field discarded); label = $a + v/x/y/z subdivisions
    ' - '-joined (parts stripped), trailing periods trimmed; the exact label
    'Electronic Books' is sentence-cased; de-duplicated keeping first."""
    blocks = _all_datafield_blocks(content, ["655"])

    def fmt(b):
        subs = F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0)
        n_a = F.size(F.filter(subs, lambda el: _sub_code(el) == "a"))
        parts = F.transform(
            F.filter(subs, lambda el: _sub_code(el).isin("a", *_SUBDIVISION_CODES)),
            lambda el: F.trim(_sub_value(el)),
        )
        label = F.regexp_replace(F.array_join(parts, " - "), r"\.+$", "")
        label = F.when(label == "Electronic Books", F.lit("Electronic books")).otherwise(label)
        return F.when(n_a == 1, label)

    return F.array_distinct(F.filter(F.transform(blocks, fmt), lambda g: g.isNotNull()))


def _holdings_expr(content: Column) -> Column:
    """856 → online holdings (ebsco/holdings.py): fields carrying $3
    (enumeration), a URL-shaped first $u and a $z public note become
    ViewOnline/LicensedResource digital locations; anything incomplete is
    skipped. Serialized ``enumeration|link_text|url``."""
    blocks = _all_datafield_blocks(content, ["856"])

    def first_sub(subs, code):
        arr = F.filter(subs, lambda el: _sub_code(el) == code)
        return F.when(F.size(arr) > 0, _sub_value(F.element_at(arr, 1)))

    def fmt(b):
        subs = F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0)
        enum, url, note = first_sub(subs, "3"), first_sub(subs, "u"), first_sub(subs, "z")
        ok = (
            enum.isNotNull()
            & note.isNotNull()
            & url.isNotNull()
            & F.trim(url).rlike(r"^https?://")
        )
        return F.when(ok, F.concat_ws("|", enum, note, url))

    return F.filter(F.transform(blocks, fmt), lambda h: h.isNotNull())


_PARENT_TAGS = {"440": ["a"], "490": ["a"], "773": ["t", "a", "s"], "830": ["t", "a"]}


def _parents_expr(content: Column) -> Column:
    """440/490/773/830 → Series parent titles (ebsco/parents.py): per field,
    the FIRST value among the tag's subfield codes, trailing ';' then ','
    suffixes removed then stripped; blank or already-seen titles dropped
    (order-preserving dedupe)."""
    blocks = _all_datafield_blocks(content, list(_PARENT_TAGS))

    def fmt(b):
        tag = F.regexp_extract(b, r'tag="(\d{3})"', 1)
        subs = F.regexp_extract_all(b, F.lit(_SUBFIELD_RE), 0)
        def tag_candidate(t, codes):
            # single-arg lambda: F.filter treats a 2-arg lambda as
            # (element, index), so codes must be closed over, not defaulted
            arr = F.filter(subs, lambda el: _sub_code(el).isin(*codes))
            return F.when(
                (tag == t) & (F.size(arr) > 0), _sub_value(F.element_at(arr, 1))
            )

        title = F.coalesce(*[tag_candidate(t, c) for t, c in _PARENT_TAGS.items()])
        # removesuffix(';') then removesuffix(',') then strip
        title = F.trim(
            F.regexp_replace(F.regexp_replace(title, r";$", ""), r",$", "")
        )
        return F.nullif(title, F.lit(""))

    return F.array_distinct(
        F.filter(F.transform(blocks, fmt), lambda t: t.isNotNull())
    )


def transform_ebsco_marc(records: DataFrame) -> DataFrame:
    """records(id, content[, deleted, last_modified]) → one work row per
    record:

    (id, type ∈ Visible|Deleted|Error, title, other_identifiers
     array<string>, error, last_modified)

    Deleted records keep their identity but carry no transformed fields
    (DeletedSourceWork + DeletedFromSource reason); records whose mandatory
    fields fail extraction become Error rows instead of aborting the batch.
    """
    cols = records.columns
    if "deleted" not in cols:
        records = records.withColumn("deleted", F.lit(False))
    if "last_modified" not in cols:
        records = records.withColumn("last_modified", F.lit(None).cast("timestamp"))

    content = F.col("content")
    marc_id = F.nullif(F.trim(F.regexp_extract(content, _CONTROL_001_RE, 1)), F.lit(""))
    title = _title_expr(content)
    error = F.when(marc_id.isNull(), F.lit("missing mandatory field 001 (id)")).when(
        ~F.col("deleted") & title.isNull(),
        F.when(
            _datafield_block(content, "245") == "",
            F.lit("missing mandatory field 245 (title)"),
        ).otherwise(F.lit("empty title field (245) after processing subfields")),
    )
    return records.select(
        F.coalesce(marc_id, F.col("id")).alias("id"),
        F.when(error.isNotNull(), F.lit("Error"))
        .when(F.col("deleted"), F.lit("Deleted"))
        .otherwise(F.lit("Visible"))
        .alias("type"),
        F.when(error.isNull() & ~F.col("deleted"), title).alias("title"),
        F.when(error.isNull() & ~F.col("deleted"), _other_identifiers_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("other_identifiers"),
        F.when(error.isNull() & ~F.col("deleted"), _alternative_titles_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("alternative_titles"),
        F.when(error.isNull() & ~F.col("deleted"), _description_expr(content)).alias(
            "description"
        ),
        F.when(error.isNull() & ~F.col("deleted"), _contributors_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("contributors"),
        F.when(error.isNull() & ~F.col("deleted"), _subjects_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("subjects"),
        F.when(error.isNull() & ~F.col("deleted"), _edition_expr(content)).alias("edition"),
        F.when(error.isNull() & ~F.col("deleted"), _format_expr(content)).alias("format"),
        F.when(error.isNull() & ~F.col("deleted"), _language_expr(content)).alias("language"),
        F.when(error.isNull() & ~F.col("deleted"), _production_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("production"),
        F.when(error.isNull() & ~F.col("deleted"), _date_range_008_expr(content)).alias(
            "date_range_008"
        ),
        F.when(error.isNull() & ~F.col("deleted"), _designation_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("designation"),
        F.when(error.isNull() & ~F.col("deleted"), _current_frequency_expr(content)).alias(
            "current_frequency"
        ),
        F.when(error.isNull() & ~F.col("deleted"), _genres_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("genres"),
        F.when(error.isNull() & ~F.col("deleted"), _holdings_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("holdings"),
        F.when(error.isNull() & ~F.col("deleted"), _parents_expr(content))
        .otherwise(F.array().cast("array<string>"))
        .alias("parents"),
        error.alias("error"),
        F.when(F.col("deleted"), F.lit("deleted from source")).alias("deleted_reason"),
        F.col("last_modified"),
    )


def with_production_period(works: DataFrame) -> DataFrame:
    """Parse the 008-derived date range through the engine's period parser
    (X1), adding ``prod_from``/``prod_to`` ISO date strings — the wiring the
    reference does in _parse_period_or_bare_label (ebsco/production.py:20-27;
    the parser handles every maximal_date_range shape, including the
    half-bounded '1979-')."""
    from ..functions.periods import parse_period_udf

    # one UDF invocation, projected twice (don't rely on CSE of pandas UDFs)
    out = works.withColumn(
        "_pp",
        F.when(
            F.col("date_range_008").isNotNull(),
            parse_period_udf()(F.col("date_range_008")),
        ),
    )
    return (
        out.withColumn("prod_from", F.col("_pp.from_date").cast("string"))
        .withColumn("prod_to", F.col("_pp.to_date").cast("string"))
        .drop("_pp")
    )


def transform_report(works: DataFrame) -> dict:
    """The transformer's batch report (success/failure counts,
    transformer.py:170-199) in one aggregate pass."""
    row = works.agg(
        F.sum(F.when(F.col("type") != "Error", 1).otherwise(0)).alias("ok"),
        F.sum(F.when(F.col("type") == "Error", 1).otherwise(0)).alias("err"),
    ).collect()[0]
    return {"success_count": row["ok"] or 0, "failure_count": row["err"] or 0}
