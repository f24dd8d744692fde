"""Per-source transformer slice #2: Sierra bib JSON → work fields.

The reference's single largest transformer is the Sierra one
(pipeline/transformer/transformer_sierra — 49 source files).  Unlike EBSCO
(MARCXML strings → regex extraction, plans/marc_transform.py), Sierra records
are **JSON documents** from the Sierra REST API: a bib carries
``varFields: [{fieldTag, marcTag, ind1, ind2, content, subfields:[{tag,
content}]}]`` plus typed header fields (``materialType``, ``deleted``,
``suppressed`` — shape pinned by
sierra_adapter/sierra_indexer/src/test/.../WorkerTest.scala:31-52).

Spark-first expression: the JSON is parsed ONCE with ``from_json`` into a
typed struct, and every field rule is a higher-order array function
(``filter`` / ``transform`` / ``aggregate`` / ``array_join``) over the
``varFields`` array — whole-stage-codegen JVM expressions, no per-row Python
and no XML regex.  This is the idiomatic 100 TB path for JSON change streams:
one vectorized parse, then columnar struct traversal.

Field semantics (reference file:line for parity checks; all under
pipeline/transformer/):

* source id     — "b" + 7-digit id + mod-11 check digit (rightmost digit ×2,
                  next ×3, …; remainder 10 → "x") — docs/sierra/sierra_ids.md
                  "Computing the check digit"; SierraTransformer.scala:168-172
* title         — first 245; subfields a/b/c/h/n/p in original order; a
                  TRAILING $h is dropped; retained $h has "[...]" removed
                  then trimmed; joined " "; no 245 or no kept subfields →
                  Invisible work (marc_common/transformers/MarcTitle.scala)
* alt titles    — fields 240/130/246/242 in document order, 246-ind2=6
                  (caption titles) skipped, per-field join of all subfield
                  contents except the Wellcome-specific ($5,"UkLW") subfield,
                  blanks dropped, order-preserving dedupe
                  (MarcAlternativeTitles.scala:19-49)
* lettering     — 246-ind2=6 $a contents, plus 514 $a when materialType is
                  k/Pictures, joined "\\n\\n" (SierraLettering.scala:36-58)
* phys. desc.   — per 300 field, subfields a/b/c/e joined " " (empty fields
                  dropped), fields joined "<br/>"
                  (SierraPhysicalDescription.scala:27-45)
* format        — materialType.code through the Format table; linked formats
                  resolve to their linksTo target (v→Books, s→Audio,
                  j→Journals, f→Videos, x→Manuscripts) — SierraFormat.scala,
                  data/SierraMaterialTypes.scala,
                  internal_model/work/Format.scala:38-165
* edition       — every 250 $a trimmed, joined " " (MarcEdition.scala)
* description   — per 520 field: a/b/c trimmed + $u (URL-shaped wrapped as
                  <a> links) in a <p>, fields joined "\\n"
                  (MarcDescription semantics, shared with the EBSCO slice)
* designation   — 362 $a values (MarcDesignation)
* current freq. — 310 $a/$b stripped + space-joined (MarcCurrentFrequency)
* former freq.  — per 321 field, $a/$b joined " "
                  (SierraFormerFrequency.scala:48-51)
* identifiers   — sierra-identifier (7-digit), isbn 020$a / issn 022$a (only
                  fields that HAVE an $a), Wellcome digcodes (759$a,
                  "^(dig[a-z]+).*$", distinct), iconographic number (visual
                  collections k/r only: 001, falling back to 099$a, first
                  value fully matching "[0-9]+i(\\.[0-9]+)?"), ESTC citations
                  (510 fields whose subfields are exactly [a="ESTC", c=v]
                  with v fully matching "[TWRNPS][0-9]+")
                  (SierraIdentifiers.scala:30-153,
                  SierraIconographicNumber.scala:20-46)
* reference no. — the iconographic number (SierraReferenceNumber.scala)
* merge cands   — in apply order (SierraMergeCandidates.scala:27-31):
                  1. 776$w values "(UkLW)<bnumber>" (case-insensitive
                     prefix), trimmed, validated against
                     "^b[0-9]{7}[0-9x]$"; a candidate only when exactly ONE
                     distinct id survives (:108-137)
                  2. Miro: 089$a (spaces stripped, parsed as
                     prefix/digits/suffix, digits left-padded to 7) ++ 962$u
                     (wellcomeimages.org URL forms), deduped; ids that are
                     identical except for a suffix prefer the SUFFIXED form
                     (:147-158, :188-226, parsers/MiroIdParsing.scala)
                  3. Calm: 035$a values that parse as UUIDs (:160-186)
                  4. EBSCO: when 003 is "EBZ", the 001 (fallback 099$a)
                     value fully matching "ebs[0-9]+e" (:44-100)
* deleted /     — deleted → Deleted(DeletedFromSource(Sierra)); suppressed →
  suppressed      Deleted(SuppressedFromSource(Sierra)); title failures →
                  Invisible(UnableToTransform); else Visible.  Work *data*
                  is only populated for Visible works, but state-level
                  fields (mergeCandidates, parents) are computed for every
                  record, exactly as the reference builds ``state`` before
                  branching (SierraTransformer.scala:79-106)
* parents       — 440/490/773/830 Series titles, first value among the
                  tag's candidate subfields, ;/,-suffix-trimmed, deduped
                  (same MarcParents family as the EBSCO slice)

Ordering deviation (documented): the reference's Miro suffix-preference
groups ids with Scala's unordered Map, so its output order is
implementation-defined; we pin first-appearance order to stay deterministic.

Items/holdings from *linked* item records are the linker's join
(sierra_adapter/sierra_linker); see ``link_item_records`` below for the
bib⇄item join slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUBFIELDS_T = "array<struct<tag:string,content:string>>"

SIERRA_BIB_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("updatedDate", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("suppressed", T.BooleanType()),
        T.StructField(
            "lang",
            T.StructType(
                [
                    T.StructField("code", T.StringType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "materialType",
            T.StructType(
                [
                    T.StructField("code", T.StringType()),
                    T.StructField("value", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "bibLevel",
            T.StructType(
                [
                    T.StructField("code", T.StringType()),
                    T.StructField("value", T.StringType()),
                ]
            ),
        ),
        # fixed fields (e.g. 28 = CAT DATE, consulted by SierraItemsOnOrder)
        T.StructField(
            "fixedFields",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("label", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("display", T.StringType()),
                    ]
                ),
            ),
        ),
        T.StructField(
            "varFields",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("fieldTag", T.StringType()),
                        T.StructField("marcTag", T.StringType()),
                        T.StructField("ind1", T.StringType()),
                        T.StructField("ind2", T.StringType()),
                        T.StructField("content", T.StringType()),
                        T.StructField(
                            "subfields",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("tag", T.StringType()),
                                        T.StructField("content", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


# ---------------------------------------------------------------- helpers

def _vfields(bib: Column) -> Column:
    return F.coalesce(
        bib.getField("varFields"),
        F.array().cast(
            "array<struct<fieldTag:string,marcTag:string,ind1:string,"
            "ind2:string,content:string,subfields:" + _SUBFIELDS_T + ">>"
        ),
    )


def _vfs(bib: Column, *tags: str) -> Column:
    """varFields with one of the given MARC tags, in document order
    (SierraQueryOps.varfieldsWithTags)."""
    return F.filter(_vfields(bib), lambda vf: vf.getField("marcTag").isin(*tags))


def _subs(vf: Column, *tags: str) -> Column:
    """Subfields of one varField with the given tags, in document order."""
    return F.filter(
        F.coalesce(vf.getField("subfields"), F.array().cast(_SUBFIELDS_T)),
        lambda s: s.getField("tag").isin(*tags),
    )


def _contents(arr: Column) -> Column:
    return F.transform(arr, lambda s: s.getField("content"))


def _sub_contents(bib: Column, tag: str, code: str) -> Column:
    """All contents of ``tag $code`` across the record, in document order
    (SierraQueryOps.subfieldsWithTag(tag -> code).contents)."""
    return F.flatten(F.transform(_vfs(bib, tag), lambda vf: _contents(_subs(vf, code))))


def _field_contents(bib: Column, tag: str) -> Column:
    """Field-level ``content`` values (non-null) of varFields with the tag —
    control-field style access (varfieldsWithTag(tag).flatMap(_.content))."""
    return F.filter(
        F.transform(_vfs(bib, tag), lambda vf: vf.getField("content")),
        lambda c: c.isNotNull(),
    )


def _first(arr: Column) -> Column:
    return F.try_element_at(arr, F.lit(1))


# ------------------------------------------------------------ check digit

def sierra_check_digit(sierra_id: Column) -> Column:
    """Mod-11 check digit over the 7-digit id: rightmost digit ×2, next ×3,
    …, leftmost ×8; remainder 10 → 'x' (docs/sierra/sierra_ids.md)."""
    total = F.aggregate(
        F.sequence(F.lit(0), F.lit(6)),
        F.lit(0),
        lambda acc, i: acc
        + F.substr(sierra_id, i + 1, F.lit(1)).cast("int") * (F.lit(8) - i),
    )
    rem = total % 11
    return F.when(rem == 10, F.lit("x")).otherwise(rem.cast("string"))


def sierra_system_number(sierra_id: Column) -> Column:
    """bibId.withCheckDigit: 'b' + id + check digit."""
    return F.concat(F.lit("b"), sierra_id, sierra_check_digit(sierra_id))


# ------------------------------------------------------------ field rules

def _title_expr(bib: Column) -> Column:
    """MarcTitle over the first 245 varField.  NULL means 'could not build a
    title' — the caller turns that into an Invisible work."""
    f245 = _first(_vfs(bib, "245"))
    sel = _subs(f245, "a", "b", "c", "h", "n", "p")
    n = F.size(sel)
    kept = F.filter(sel, lambda s, i: ~((s.getField("tag") == "h") & (i == n - 1)))
    comps = F.transform(
        kept,
        lambda s: F.when(
            s.getField("tag") == "h",
            F.trim(F.regexp_replace(s.getField("content"), r"\[[^\]]+\]", "")),
        ).otherwise(s.getField("content")),
    )
    return F.when(F.size(comps) > 0, F.array_join(comps, " "))


def _alternative_titles_expr(bib: Column) -> Column:
    fields = F.filter(
        _vfs(bib, "240", "130", "246", "242"),
        lambda vf: ~(
            (vf.getField("marcTag") == "246") & (vf.getField("ind2") == F.lit("6"))
        ),
    )
    titles = F.transform(
        fields,
        lambda vf: F.trim(
            F.array_join(
                _contents(
                    F.filter(
                        F.coalesce(vf.getField("subfields"), F.array().cast(_SUBFIELDS_T)),
                        lambda s: ~(
                            (s.getField("tag") == "5") & (s.getField("content") == "UkLW")
                        ),
                    )
                ),
                " ",
            )
        ),
    )
    return F.array_distinct(F.filter(titles, lambda t: t != ""))


def _lettering_expr(bib: Column) -> Column:
    caption_a = F.flatten(
        F.transform(
            F.filter(_vfs(bib, "246"), lambda vf: vf.getField("ind2") == F.lit("6")),
            lambda vf: _contents(_subs(vf, "a")),
        )
    )
    is_k = bib.getField("materialType").getField("code") == "k"
    m514 = F.when(is_k, F.flatten(
        F.transform(_vfs(bib, "514"), lambda vf: _contents(_subs(vf, "a")))
    )).otherwise(F.array().cast("array<string>"))
    joined = F.array_join(F.concat(caption_a, m514), "\n\n")
    return F.nullif(joined, F.lit(""))


def _physical_description_expr(bib: Column) -> Column:
    lines = F.filter(
        F.transform(
            _vfs(bib, "300"),
            lambda vf: F.array_join(_contents(_subs(vf, "a", "b", "c", "e")), " "),
        ),
        lambda s: s != "",
    )
    return F.nullif(F.array_join(lines, "<br/>"), F.lit(""))


# Format.scala code → label for unlinked formats; linked codes resolve first.
_FORMAT_LABELS = {
    "a": "Books", "q": "Digital Images", "l": "Ephemera", "e": "Maps",
    "k": "Pictures", "w": "Student dissertations", "r": "3-D Objects",
    "m": "CD-Roms", "d": "Journals", "p": "Mixed materials", "i": "Audio",
    "g": "Videos", "h": "Archives and manuscripts", "hdig": "Born-digital archives",
    "n": "Film", "b": "Manuscripts", "c": "Music", "u": "Standing order",
    "z": "Web sites",
}
_LINKED_FORMATS = {"v": "a", "s": "i", "j": "d", "f": "g", "x": "b"}


def _format_cols(bib: Column) -> tuple[Column, Column]:
    code = bib.getField("materialType").getField("code")
    resolved = F.coalesce(
        *[F.when(code == k, F.lit(v)) for k, v in _LINKED_FORMATS.items()],
        code,
    )
    fid = F.when(resolved.isin(*_FORMAT_LABELS), resolved)
    flabel = F.coalesce(
        *[F.when(fid == k, F.lit(v)) for k, v in _FORMAT_LABELS.items()]
    )
    return fid, flabel


def _edition_expr(bib: Column) -> Column:
    vals = F.transform(_sub_contents(bib, "250", "a"), lambda c: F.trim(c))
    return F.nullif(F.trim(F.array_join(vals, " ")), F.lit(""))


def _description_expr(bib: Column) -> Column:
    blocks = _vfs(bib, "520")

    def fmt(vf):
        plain = F.transform(_contents(_subs(vf, "a", "b", "c")), lambda c: F.trim(c))
        links = F.transform(
            _contents(_subs(vf, "u")),
            lambda c: F.when(
                F.trim(c).rlike(r"^https?://"),
                F.concat(
                    F.lit('<a href="'), F.trim(c), F.lit('">'), F.trim(c), F.lit("</a>")
                ),
            ).otherwise(c),
        )
        return F.concat(
            F.lit("<p>"), F.array_join(F.concat(plain, links), " "), F.lit("</p>")
        )

    return F.when(
        F.size(blocks) > 0, F.trim(F.array_join(F.transform(blocks, fmt), "\n"))
    )


def _designation_expr(bib: Column) -> Column:
    return _sub_contents(bib, "362", "a")


def _current_frequency_expr(bib: Column) -> Column:
    per_field = F.transform(
        _vfs(bib, "310"),
        lambda vf: F.array_join(F.transform(_contents(_subs(vf, "a", "b")), lambda c: F.trim(c)), " "),
    )
    return F.nullif(F.trim(F.array_join(per_field, " ")), F.lit(""))


def _former_frequencies_expr(bib: Column) -> Column:
    return F.transform(
        _vfs(bib, "321"),
        lambda vf: F.array_join(_contents(_subs(vf, "a", "b")), " "),
    )


_PARENT_TAGS = {"440": ["a"], "490": ["a"], "773": ["t", "a", "s"], "830": ["t", "a"]}


def _parents_expr(bib: Column) -> Column:
    blocks = _vfs(bib, *_PARENT_TAGS)

    def fmt(vf):
        tag = vf.getField("marcTag")

        def cand(t, codes):
            arr = _subs(vf, *codes)
            return F.when((tag == t) & (F.size(arr) > 0), _first(arr).getField("content"))

        title = F.coalesce(*[cand(t, c) for t, c in _PARENT_TAGS.items()])
        title = F.trim(F.regexp_replace(F.regexp_replace(title, r";$", ""), r",$", ""))
        return F.nullif(title, F.lit(""))

    return F.array_distinct(F.filter(F.transform(blocks, fmt), lambda t: t.isNotNull()))


# ----------------------------------------------------------- identifiers

def _iconographic_number_expr(bib: Column) -> Column:
    """Visual collections (materialType k or r) only: 001 content, falling
    back to 099$a when no 001 exists; first value that fully matches an
    i-number (SierraIconographicNumber.scala:20-46)."""
    is_visual = bib.getField("materialType").getField("code").isin("k", "r")
    c001 = _field_contents(bib, "001")
    source = F.when(F.size(c001) > 0, c001).otherwise(_sub_contents(bib, "099", "a"))
    matches = F.filter(source, lambda c: c.rlike(r"^[0-9]+i(\.[0-9]+)?$"))
    return F.when(is_visual, F.try_element_at(
        F.transform(matches, lambda c: F.regexp_extract(c, r"^([0-9]+i(\.[0-9]+)?)$", 1)),
        F.lit(1),
    ))


def _other_identifiers_expr(bib: Column, sierra_id: Column) -> Column:
    """SierraIdentifiers.apply order: sierra-identifier, isbn/issn, digcodes,
    iconographic number, ESTC references — serialized 'scheme:value'."""
    isbn_issn = F.flatten(
        F.transform(
            _vfs(bib, "020", "022"),
            lambda vf: F.transform(
                _contents(_subs(vf, "a")),
                lambda c: F.concat(
                    F.when(vf.getField("marcTag") == "020", F.lit("isbn")).otherwise(
                        F.lit("issn")
                    ),
                    F.lit(":"),
                    F.trim(c),
                ),
            ),
        )
    )
    digcodes = F.transform(
        F.array_distinct(
            F.filter(
                F.transform(
                    _sub_contents(bib, "759", "a"),
                    lambda c: F.regexp_extract(c, r"^(dig[a-z]+).*$", 1),
                ),
                lambda d: d != "",
            )
        ),
        lambda d: F.concat(F.lit("wellcome-digcode:"), d),
    )
    icono = _iconographic_number_expr(bib)
    estc = F.transform(
        F.filter(
            F.transform(
                F.filter(
                    _vfs(bib, "510"),
                    lambda vf: (F.size(_subs(vf, "a", "c")) == F.size(vf.getField("subfields")))
                    & (F.size(vf.getField("subfields")) == 2)
                    & (_first(vf.getField("subfields")).getField("tag") == "a")
                    & (_first(vf.getField("subfields")).getField("content") == "ESTC")
                    & (F.try_element_at(vf.getField("subfields"), F.lit(2)).getField("tag") == "c"),
                ),
                lambda vf: F.try_element_at(vf.getField("subfields"), F.lit(2)).getField("content"),
            ),
            lambda c: c.rlike(r"^[TWRNPS][0-9]+$"),
        ),
        lambda c: F.concat(F.lit("estc:"), c),
    )
    return F.concat(
        F.array(F.concat(F.lit("sierra-identifier:"), sierra_id)),
        isbn_issn,
        digcodes,
        F.when(icono.isNotNull(), F.array(F.concat(F.lit("iconographic-number:"), icono)))
        .otherwise(F.array().cast("array<string>")),
        estc,
    )


# -------------------------------------------------------- merge candidates

_MIRO_COMPONENTS = r"^([A-Z])([0-9]{1,7})([A-Z]{0,3}[0-9]?)$"
_MIRO_FULL = "[A-Z][0-9]{7}[A-Z]{0,3}[0-9]?"
_MIRO_URL_RES = [
    r"^http://wellcomeimages\.org/indexplus/image/(" + _MIRO_FULL + r")(?:\.html){0,2}$",
    r"^http://wellcomeimages\.org/ixbin/hixclient\?MIROPAC=(" + _MIRO_FULL + r")$",
    r"^http://wellcomeimages\.org/ixbinixclient\.exe\?MIROPAC=("
    + _MIRO_FULL + r")\.html\.html$",
    r"^http://wellcomeimages\.org/ixbinixclient\.exe\?image=(" + _MIRO_FULL + r")\.html$",
]
_UUID_RE = (
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def _merge_candidates_expr(bib: Column) -> Column:
    """SierraMergeCandidates in apply order, serialized 'scheme:value:reason'."""
    # 1. 776 $w — physical/digitised pair, only when exactly one distinct id
    w776 = F.array_distinct(
        F.filter(
            F.transform(
                _sub_contents(bib, "776", "w"),
                lambda c: F.trim(F.regexp_extract(c, r"(?i)^\(UkLW\)\s*(.+)$", 1)),
            ),
            lambda v: v.rlike(r"^b[0-9]{7}[0-9x]$"),
        )
    )
    digitised = F.when(
        F.size(w776) == 1,
        F.array(
            F.concat(
                F.lit("sierra-system-number:"),
                _first(w776),
                F.lit(":Physical/digitised Sierra work"),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))

    # 2. Miro — 089$a parsed ids ++ 962$u URL ids, deduped, suffixed preferred
    ids089 = F.filter(
        F.transform(
            _sub_contents(bib, "089", "a"),
            lambda c: F.when(
                F.replace(c, F.lit(" "), F.lit("")).rlike(_MIRO_COMPONENTS),
                F.concat(
                    F.regexp_extract(F.replace(c, F.lit(" "), F.lit("")), _MIRO_COMPONENTS, 1),
                    F.lpad(
                        F.regexp_extract(F.replace(c, F.lit(" "), F.lit("")), _MIRO_COMPONENTS, 2),
                        7,
                        "0",
                    ),
                    F.regexp_extract(F.replace(c, F.lit(" "), F.lit("")), _MIRO_COMPONENTS, 3),
                ),
            ),
        ),
        lambda v: v.isNotNull(),
    )
    ids962 = F.filter(
        F.transform(
            _sub_contents(bib, "962", "u"),
            lambda c: F.coalesce(
                *[F.nullif(F.regexp_extract(c, rx, 1), F.lit("")) for rx in _MIRO_URL_RES]
            ),
        ),
        lambda v: v.isNotNull(),
    )
    miro_all = F.array_distinct(F.concat(ids089, ids962))
    # prefer suffixed ids: drop a bare stem when any other id shares its stem
    miro_kept = F.filter(
        miro_all,
        lambda x: (
            F.size(F.filter(miro_all, lambda y: F.substring(y, 1, 8) == F.substring(x, 1, 8)))
            == 1
        )
        | (F.length(x) > 8),
    )
    miro = F.transform(
        miro_kept,
        lambda v: F.concat(F.lit("miro-image-number:"), v, F.lit(":Miro/Sierra work")),
    )

    # 3. Calm — 035$a UUIDs
    calm = F.transform(
        F.array_distinct(
            F.filter(_sub_contents(bib, "035", "a"), lambda c: c.rlike(_UUID_RE))
        ),
        lambda v: F.concat(F.lit("calm-record-id:"), v, F.lit(":Calm/Sierra harvest")),
    )

    # 4. EBSCO — 003 == EBZ gate, then 001 (fallback 099$a) ebsNNNe
    is_ebz = _first(_field_contents(bib, "003")) == "EBZ"
    c001 = _first(_field_contents(bib, "001"))
    lookup = F.coalesce(c001, _first(_sub_contents(bib, "099", "a")))
    ebsco = F.when(
        is_ebz & lookup.rlike(r"^ebs[0-9]+e$"),
        F.array(
            F.concat(F.lit("ebsco-alt-lookup:"), lookup, F.lit(":EBSCO/Sierra e-resource"))
        ),
    ).otherwise(F.array().cast("array<string>"))

    return F.concat(digitised, miro, calm, ebsco)


# ---------------------------------------------------------------- plan

def transform_sierra(bibs: DataFrame) -> DataFrame:
    """bibs(id = 7-digit sierra id, content = bib JSON[, last_modified]) →
    one work row per bib:

    (id = bnumber-with-check-digit, sierra_id, type ∈
     Visible|Deleted|Invisible, reason, title, alternative_titles, format_id,
     format_label, physical_description, lettering, edition, description,
     designations, current_frequency, former_frequencies, reference_number,
     other_identifiers, merge_candidates, parents[, last_modified])

    Work data is only populated for Visible works; merge candidates and
    parents are state-level and computed for every record
    (SierraTransformer.scala:79-106).
    """
    if "last_modified" not in bibs.columns:
        bibs = bibs.withColumn("last_modified", F.lit(None).cast("timestamp"))

    parsed = bibs.select(
        F.col("id").alias("sierra_id"),
        F.from_json(F.col("content"), SIERRA_BIB_SCHEMA).alias("bib"),
        "last_modified",
    )
    bib = F.col("bib")
    title = _title_expr(bib)
    deleted = F.coalesce(bib.getField("deleted"), F.lit(False))
    suppressed = F.coalesce(bib.getField("suppressed"), F.lit(False))
    reason = (
        F.when(deleted, F.lit("DeletedFromSource(Sierra)"))
        .when(suppressed, F.lit("SuppressedFromSource(Sierra)"))
        .when(
            title.isNull(),
            F.when(
                F.size(_vfs(bib, "245")) == 0,
                F.lit("UnableToTransform(Could not find field 245 to create title)"),
            ).otherwise(
                F.lit(
                    "UnableToTransform(No subfields in field 245 for constructing the title)"
                )
            ),
        )
    )
    wtype = (
        F.when(deleted | suppressed, F.lit("Deleted"))
        .when(title.isNull(), F.lit("Invisible"))
        .otherwise(F.lit("Visible"))
    )
    visible = wtype == "Visible"
    fid, flabel = _format_cols(bib)
    empty = F.array().cast("array<string>")

    def data_str(c: Column) -> Column:
        return F.when(visible, c)

    def data_arr(c: Column) -> Column:
        return F.when(visible, c).otherwise(empty)

    return parsed.select(
        sierra_system_number(F.col("sierra_id")).alias("id"),
        "sierra_id",
        wtype.alias("type"),
        reason.alias("reason"),
        data_str(title).alias("title"),
        data_arr(_alternative_titles_expr(bib)).alias("alternative_titles"),
        data_str(fid).alias("format_id"),
        data_str(flabel).alias("format_label"),
        data_str(_physical_description_expr(bib)).alias("physical_description"),
        data_str(_lettering_expr(bib)).alias("lettering"),
        data_str(_edition_expr(bib)).alias("edition"),
        data_str(_description_expr(bib)).alias("description"),
        data_arr(_designation_expr(bib)).alias("designations"),
        data_str(_current_frequency_expr(bib)).alias("current_frequency"),
        data_arr(_former_frequencies_expr(bib)).alias("former_frequencies"),
        data_str(_iconographic_number_expr(bib)).alias("reference_number"),
        data_arr(_other_identifiers_expr(bib, F.col("sierra_id"))).alias(
            "other_identifiers"
        ),
        _merge_candidates_expr(bib).alias("merge_candidates"),
        _parents_expr(bib).alias("parents"),
        "last_modified",
    )


# ------------------------------------------------- linked item records (J)

SIERRA_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("suppressed", T.BooleanType()),
        T.StructField("copyNo", T.LongType()),
        T.StructField("holdCount", T.LongType()),
        T.StructField(
            "fixedFields",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("label", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("display", T.StringType()),
                    ]
                ),
            ),
        ),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("code", T.StringType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "varFields",
            SIERRA_BIB_SCHEMA["varFields"].dataType,
        ),
    ]
)


def link_item_records(works: DataFrame, items: DataFrame) -> DataFrame:
    """The sierra_linker/SierraItems join slice: item records carry their
    parent bib ids (items(item_id, bib_id, content)); attach per-bib item
    summaries to the transformed works.

    Reference: the linker keeps a bib⇄item link table and the transformer
    receives every linked item's JSON (SierraTransformer.scala:177-187,
    SierraItems.scala).  Spark-first this is a plain aggregate-then-join —
    items grouped by bib id (shuffle on bib_id), works joined on sierra_id;
    deleted/suppressed items are dropped before aggregation, item ids get
    the same "i"-prefixed check-digit form as bibs.
    """
    parsed = items.select(
        F.col("bib_id"),
        F.from_json(F.col("content"), SIERRA_ITEM_SCHEMA).alias("item"),
    )
    item = F.col("item")
    live = parsed.filter(
        ~F.coalesce(item.getField("deleted"), F.lit(False))
        & ~F.coalesce(item.getField("suppressed"), F.lit(False))
    )
    per_bib = live.groupBy("bib_id").agg(
        F.sort_array(
            F.collect_list(
                F.concat(
                    F.lit("i"),
                    item.getField("id"),
                    sierra_check_digit(item.getField("id")),
                    F.lit("@"),
                    F.coalesce(item.getField("location").getField("name"), F.lit("")),
                )
            )
        ).alias("items"),
    )
    return works.join(per_bib, works.sierra_id == per_bib.bib_id, "left").drop(
        "bib_id"
    ).withColumn("items", F.coalesce(F.col("items"), F.array().cast("array<string>")))


# ------------------------------------------------------------ Sierra items

_CLOSED_STORES = [
    "archives & mss well.coll", "at digitisation", "by appointment",
    "closed stores", "conservation", "early printed books",
    "iconographic collection", "offsite", "unrequestable", "deepstore",
]
_OPEN_SHELVES = [
    "biographies", "folios", "history of medicine", "journals",
    "medical collection", "medicine & society collection", "open shelves",
    "quick ref collection", "quick ref. collection", "rare materials room",
    "student coll",
]


def _location_type(name: Column) -> Column:
    """SierraPhysicalLocationType.fromName (source_model/sierra/rules/
    SierraPhysicalLocationType.scala:11-62): substring tables over the
    lowercased name; ''/'none' and unknown names map to NULL."""
    low = F.lower(name)
    has = lambda subs: F.coalesce(  # noqa: E731
        *[F.when(low.contains(sub), F.lit(True)) for sub in subs], F.lit(False)
    )
    return (
        F.when(has(_CLOSED_STORES), F.lit("ClosedStores"))
        .when(has(_OPEN_SHELVES), F.lit("OpenShelves"))
        .when(low.contains("exhibition"), F.lit("OnExhibition"))
    )


def sierra_items(items: DataFrame) -> DataFrame:
    """The SierraItems slice (SierraItems.scala:39-254 +
    SierraPhysicalLocation.scala, EXCLUDING the SierraItemAccess
    access-condition rules engine — documented out of slice): per bib, the
    ordered list of physical items with ids, titles and locations.

    items(item_id, bib_id, content) where content is the Sierra item JSON
    (deleted/suppressed flags, copyNo, location {code,name}, varFields).

    Rules carried over:
      * deleted/suppressed items dropped (:45-49)
      * location: name → type via the substring tables; ClosedStores
        canonicalizes the label to 'Closed stores'; an unparseable name
        falls back to the bib's UNAMBIGUOUS other-location (exactly one
        distinct typed (type,label) among this bib's non-'above'/'-'/''
        locations, :69-99); an item with NO location gets none
      * title: fieldTag 'v' varFields (content, else $a contents joined),
        trimmed/deduped — single value wins; none → 'Copy {copyNo}'
        (automated); multiple → first (:166-210)
      * tidyTitles: when EVERY item of the bib carries the same automated
        title, titles are dropped — they distinguish nothing (:216-240)
      * items sorted by sierra id; ids emitted in both check-digit and
        7-digit forms (:148-160).  The scraped item_ordering.json override
        map is a DATA artifact of wellcomelibrary.org, not a rule, and is
        deliberately not vendored.

    Plan shape: one from_json, two per-bib aggregates (fallback resolve,
    tidy-titles) expressed as window functions over the bib_id partition —
    no iterative logic, shuffles only on bib_id.
    """
    from pyspark.sql import Window

    parsed = items.select(
        "bib_id",
        F.from_json(F.col("content"), SIERRA_ITEM_SCHEMA).alias("item"),
    )
    it = F.col("item")
    live = parsed.filter(
        ~F.coalesce(it.getField("deleted"), F.lit(False))
        & ~F.coalesce(it.getField("suppressed"), F.lit(False))
    )

    loc_name = it.getField("location").getField("name")
    parsed_type = _location_type(loc_name)
    # title candidates from fieldTag 'v'
    vfs_v = F.filter(
        F.coalesce(it.getField("varFields"), F.array().cast(
            SIERRA_BIB_SCHEMA["varFields"].dataType.simpleString()
        )),
        lambda vf: vf.getField("fieldTag") == "v",
    )
    cands = F.array_distinct(
        F.filter(
            F.transform(
                vfs_v,
                lambda vf: F.trim(
                    F.coalesce(
                        vf.getField("content"),
                        F.array_join(
                            F.transform(
                                F.filter(
                                    F.coalesce(
                                        vf.getField("subfields"),
                                        F.array().cast(_SUBFIELDS_T),
                                    ),
                                    lambda s: s.getField("tag") == "a",
                                ),
                                lambda s: s.getField("content"),
                            ),
                            " ",
                        ),
                    )
                ),
            ),
            lambda t: t != "",
        )
    )
    copy_title = F.when(
        it.getField("copyNo").isNotNull(),
        F.concat(F.lit("Copy "), it.getField("copyNo").cast("string")),
    )
    rows = live.select(
        "bib_id",
        it.getField("id").alias("item_sid"),
        loc_name.alias("loc_name"),
        parsed_type.alias("loc_type"),
        F.when(F.size(cands) > 0, F.try_element_at(cands, F.lit(1))).alias(
            "v_title"
        ),
        copy_title.alias("copy_title"),
        it.alias("_item"),
    )

    # per-bib unambiguous fallback: distinct typed (type,label) pairs among
    # usable other locations
    usable = (
        F.col("loc_name").isNotNull()
        & ~F.lower(F.col("loc_name")).contains("above")
        & (F.col("loc_name") != "-")
        & (F.col("loc_name") != "")
    )
    pair = F.when(
        usable,
        F.struct(
            F.col("loc_type").alias("t"),
            F.when(F.col("loc_type") == "ClosedStores", F.lit("Closed stores"))
            .otherwise(F.col("loc_name"))
            .alias("l"),
        ),
    )
    w = Window.partitionBy("bib_id")
    rows = rows.withColumn("_pairs", F.collect_set(pair).over(w))
    single = (F.size(F.col("_pairs")) == 1) & F.try_element_at(
        F.col("_pairs"), F.lit(1)
    ).getField("t").isNotNull()
    fb = F.when(single, F.try_element_at(F.col("_pairs"), F.lit(1)))

    final_type = F.when(
        F.col("loc_name").isNotNull(),
        F.coalesce(F.col("loc_type"), fb.getField("t")),
    )
    final_label = F.when(
        F.col("loc_name").isNotNull(),
        F.when(F.col("loc_type") == "ClosedStores", F.lit("Closed stores"))
        .when(F.col("loc_type").isNotNull(), F.col("loc_name"))
        .otherwise(fb.getField("l")),
    )
    # a location needs a resolved type (the for-comprehension yields nothing
    # otherwise)
    final_label = F.when(final_type.isNotNull(), final_label)

    title = F.coalesce(F.col("v_title"), F.col("copy_title"))
    automated = F.col("v_title").isNull() & F.col("copy_title").isNotNull()
    rows = rows.select(
        "bib_id",
        "item_sid",
        final_type.alias("loc_type"),
        final_label.alias("loc_label"),
        title.alias("title"),
        automated.alias("automated"),
        "_item",
    )
    # tidyTitles: every item automated AND one distinct title → drop titles
    all_auto = F.min(F.col("automated").cast("int")).over(w) == 1
    n_titles = F.size(F.collect_set("title").over(w))
    tidy = all_auto & (n_titles == 1)
    # item access conditions (rules engine — plans/sierra_item_access.py);
    # computed against the RESOLVED location type, exactly as
    # SierraPhysicalLocation.scala:42-49 wires SierraItemAccess
    from .sierra_item_access import item_access

    acc = item_access(F.col("_item"), F.col("loc_type"))
    from .sierra_extras import item_shelfmark_raw

    return rows.select(
        "bib_id",
        F.concat(
            F.lit("i"), F.col("item_sid"), sierra_check_digit(F.col("item_sid"))
        ).alias("item_id"),
        F.col("item_sid").alias("item_sierra_id"),
        F.when(~tidy, F.col("title")).alias("title"),
        "loc_type",
        "loc_label",
        acc.getField("method").alias("access_method"),
        acc.getField("status").alias("access_status"),
        acc.getField("note").alias("access_note"),
        acc.getField("item_note").alias("item_note"),
        # raw 949 (fieldTag c) $a — resolved against the parent bib's
        # material type / i-number by sierra_extras.sierra_items_with_bib
        item_shelfmark_raw(F.col("_item").getField("varFields")).alias(
            "shelfmark_raw"
        ),
    )


def items_per_bib(items: DataFrame, bibs: DataFrame | None = None) -> DataFrame:
    """sierra_items rolled up per bib, sorted by item sierra id (the
    deterministic order SierraItems.scala:35-38 documents).  With ``bibs``
    (id, content) the rollup strings also carry the bib-resolved shelfmark
    (SierraShelfmark semantics, sierra_extras.sierra_items_with_bib)."""
    if bibs is not None:
        from .sierra_extras import sierra_items_with_bib

        rows = sierra_items_with_bib(items, bibs)
        shelf = [F.coalesce(F.col("shelfmark"), F.lit(""))]
    else:
        rows = sierra_items(items)
        shelf = []
    return rows.groupBy("bib_id").agg(
        F.array_sort(
            F.collect_list(
                F.concat_ws(
                    "|",
                    F.col("item_sierra_id"),
                    F.col("item_id"),
                    F.coalesce(F.col("title"), F.lit("")),
                    F.coalesce(F.col("loc_type"), F.lit("")),
                    F.coalesce(F.col("loc_label"), F.lit("")),
                    F.coalesce(F.col("access_method"), F.lit("")),
                    F.coalesce(F.col("access_status"), F.lit("")),
                    F.coalesce(F.col("access_note"), F.lit("")),
                    F.coalesce(F.col("item_note"), F.lit("")),
                    *shelf,
                )
            )
        ).alias("items")
    )
