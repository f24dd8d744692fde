"""Sierra subjects + contributors extraction (the round-3 verdict's #1 gap).

The reference's largest remaining transformer family: Sierra MARC varFields
→ typed contributors (Person/Organisation/Meeting/Agent with roles, $0
identifiers, label-derived fallbacks) and subjects (concept/person/
organisation/meeting/brand-name transformers with subdivision concepts),
then cross-list ontology-type harmonisation.  Reference (all under
pipeline/transformer/):

* contributors — marc_common/transformers/MarcContributors.scala:42-104
  (100/110/111 primary then 700/710/711, x00→Person unless $t→Agent,
  x10→Organisation, x11→Meeting, roles $e/$j with trailing-period strip,
  primary-duplicate removal), MarcAbstractAgent.scala:25-58 (label from
  type-specific subfields, blanks dropped, space-joined),
  MarcPerson/MarcOrganisation/MarcMeeting/MarcAgent.scala (subfield sets +
  per-type label normalisation).
* identifiers — MarcHasRecordControlNumber.scala:37-150: $0 values
  normalised ([,.\\s] removed, LoC/NLM URL + (DNLM) prefixes stripped,
  distinct); exactly one value → scheme from indicator-2 (0→LoC with
  sh→lc-subjects / n*→lc-names from the value prefix, 2→nlm-mesh, other →
  unidentifiable); none → label-derived; multiple → label-derived (or
  Unidentifiable under subjects/DiscardMultipleIds.scala); OnlyLocIds.scala
  forces label-derived whenever indicator-2 ≠ "0".
  Deviation (documented): an invalid LoC prefix throws in the reference
  (record fails); here it yields Unidentifiable — a total function suits a
  replayable pipeline.
* label-derived values — transformer_common/.../LabelDerivedIdentifiers
  .scala:26-57 (trimTrailingPeriod, trim, lowercase, NFKD ASCII fold,
  255-char truncate) — functions.label_derived_value.
* subjects — sierra/transformers/SierraSubjects.scala:19-35 (transformer
  order: concept 650/648/651, person 600, organisation 610, meeting 611,
  brand-name 652; indicator-2 = 7 fields dropped,
  subjects/SierraSubjectsTransformer.scala:23-28), marc_common/transformers/
  subjects/MarcConceptSubject.scala (label "$a - $v - $x - $y - $z",
  primary-type concepts 650→Concept/648→Period/651→Place, whole-field id
  only when no subdivisions), MarcCommonLabelSubdivisions.scala:44-70
  ($v $x→Concept, $y→Period via ParsedPeriod, $z→Place, all
  label-derived), MarcPersonSubject.scala (label = name subfields + $e
  roles + $x subdivisions; person concept + unidentified $x Concepts),
  MarcOrganisationSubject.scala / MarcMeetingSubject.scala,
  SierraBrandNameSubjects.scala (652 $a → Concept).
* harmonisation — marc_common/OntologyTypeOps.scala:140-218 (group by
  type-free source identifier, most-specific ontology type wins — vague
  Agent/Concept lose, Agent beats Concept, first specific wins ties;
  retyped sole concepts take the subject's identifier; list then deduped)
  and sierra/SubjectsAndContributors.scala:55-73 (contributors harmonised
  against the SUBJECTS' type map: subject typing is trusted more).

Spark-first: every rule is a higher-order array expression over the parsed
``varFields`` struct array — whole-stage-codegen JVM lambdas, zero shuffles,
zero per-row Python.  Harmonisation is per-record array processing (the
concept lists are tens of elements), so the transformer stays a pure narrow
map: at 100 TB this runs at parquet-scan speed and the only shuffles in the
pipeline remain the downstream graph groupBys.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import (
    ascii_fold,
    label_derived_value,
    trim_trailing,
    trim_trailing_period,
)
from ..functions.periods import _IGNORE as _PERIOD_IGNORE
from .sierra_transform import _SUBFIELDS_T, _vfs

# ------------------------------------------------------------------ types

_ID_T = "struct<t:string,v:string>"
_CONCEPT_T = f"struct<ctype:string,label:string,id:{_ID_T}>"
_SUBJECT_T = (
    f"struct<stype:string,label:string,id:{_ID_T},concepts:array<{_CONCEPT_T}>>"
)
_CONTRIB_T = (
    f"struct<ctype:string,label:string,roles:array<string>,id:{_ID_T},"
    "primary:boolean>"
)

# identifier-type slugs (internal_model IdentifierType ids)
LC_SUBJECTS = "lc-subjects"
LC_NAMES = "lc-names"
MESH = "nlm-mesh"
LABEL_DERIVED = "label-derived"

_PERSON_LABEL_CODES = ["a", "b", "c", "d", "t", "n", "p", "q", "l"]
_ORG_LABEL_CODES = ["a", "b", "c", "d", "t", "p", "q", "l"]
_MEETING_LABEL_CODES = ["a", "c", "d", "t"]


# ---------------------------------------------------------------- helpers

def _subs(vf: Column, codes: list[str]) -> Column:
    """Subfields of one varField with the given tags, document order."""
    return F.filter(
        F.coalesce(vf.getField("subfields"), F.array().cast(_SUBFIELDS_T)),
        lambda s: s.getField("tag").isin(*codes),
    )


def _contents(arr: Column) -> Column:
    return F.transform(arr, lambda s: F.coalesce(s.getField("content"), F.lit("")))


def _join_all(vf: Column, codes: list[str], sep: str = " ") -> Column:
    """Contents of the given subfields joined with no blank filtering
    (MarcSubject.getLabel / MarcPersonSubject.getLabel style)."""
    vals = _contents(_subs(vf, codes))
    return F.when(F.size(vals) > 0, F.array_join(vals, sep))


def _join_nonblank(vf: Column, codes: list[str]) -> Column:
    """Agent-label build (MarcAbstractAgent.getLabel:25-38): blank-trimmed
    subfields dropped, the rest space-joined; NULL when nothing survives."""
    vals = F.filter(_contents(_subs(vf, codes)), lambda c: F.trim(c) != "")
    return F.when(F.size(vals) > 0, F.array_join(vals, " "))


def period_preprocess(c: Column) -> Column:
    """PeriodParser.preprocess as a Column (lowercase, strip the ignore
    tokens/roman-prefix, collapse whitespace) — the Period label-derived id
    is minted from the preprocessed label (ConceptsTransformer PeriodOps)."""
    s = F.regexp_replace(F.lower(c), _PERIOD_IGNORE.pattern, "")
    return F.trim(F.regexp_replace(s, r"\s+", " "))


# ------------------------------------------------------------ identifiers

_LOC_URL = "http://idlocgov/authorities/subjects/"
_NLM_URL = "https://idnlmnihgov/mesh/"


def _norm_identifier(c: Column) -> Column:
    """MarcHasRecordControlNumber.normalise: dodgy punctuation/space
    removal, then LoC/NLM URL prefixes and the Sierra-import "(DNLM)"
    artefact stripped."""
    c = F.regexp_replace(c, r"[,.\s]", "")
    c = F.regexp_replace(c, "^" + re.escape(_LOC_URL), "")
    c = F.regexp_replace(c, "^" + re.escape(_NLM_URL), "")
    return F.regexp_replace(c, r"^\(DNLM\)", "")


def _id_values(vf: Column) -> Column:
    """Distinct normalised $0 contents, first-occurrence order."""
    return F.array_distinct(F.transform(_subs(vf, ["0"]), lambda s: _norm_identifier(F.coalesce(s.getField("content"), F.lit("")))))


def _ind2(vf: Column, default: str) -> Column:
    raw = F.coalesce(vf.getField("ind2"), F.lit(""))
    return F.when(F.trim(raw) == "", F.lit(default)).otherwise(raw)


def _identifier_type(ind2: Column, value: Column) -> Column:
    """Indicator-2 → identifier scheme; for LoC the value prefix picks
    LCSubjects (sh…) vs LCNames (n…).  Unknown prefix/scheme → NULL."""
    pfx = F.regexp_extract(value, r"^([^0-9]*)", 1)
    loc = F.when(pfx == "sh", F.lit(LC_SUBJECTS)).when(
        pfx.startswith("n"), F.lit(LC_NAMES)
    )
    return F.when(ind2 == "0", loc).when(ind2 == "2", F.lit(MESH))


def _ld_id(label: Column) -> Column:
    """Label-derived identifier struct, or NULL (Unidentifiable) when the
    label itself is NULL."""
    return F.when(
        label.isNotNull(),
        F.struct(F.lit(LABEL_DERIVED).alias("t"), label_derived_value(label).alias("v")),
    ).otherwise(F.lit(None).cast(_ID_T))


def _id_state(
    vf: Column,
    ld_label: Column,
    *,
    default_ind2: str = "0",
    only_loc: bool = False,
    discard_multiple: bool = False,
) -> Column:
    """getIdState as a nullable struct<t,v> (NULL ⇔ IdState.Unidentifiable).

    ``ld_label`` is the transformer-specific getLabel used for the
    label-derived fallback.  ``only_loc`` is the OnlyLocIds mixin,
    ``discard_multiple`` the DiscardMultipleIds mixin.
    """
    ids = _id_values(vf)
    ind2 = _ind2(vf, default_ind2)
    single = F.try_element_at(ids, F.lit(1))
    stype = _identifier_type(ind2, single)
    one = F.when(
        stype.isNotNull(),
        F.struct(stype.alias("t"), single.alias("v")),
    ).otherwise(F.lit(None).cast(_ID_T))
    multi = (
        F.lit(None).cast(_ID_T) if discard_multiple else _ld_id(ld_label)
    )
    base = (
        F.when(F.size(ids) == 1, one)
        .when(F.size(ids) == 0, _ld_id(ld_label))
        .otherwise(multi)
    )
    if only_loc:
        return F.when(ind2 == "0", base).otherwise(_ld_id(ld_label))
    return base


def _concept(ctype, label, cid) -> Column:
    return F.struct(
        ctype.alias("ctype") if isinstance(ctype, Column) else F.lit(ctype).alias("ctype"),
        label.alias("label"),
        cid.alias("id"),
    )


def _concept_ld(ctype: Column, label: Column, id_label: Column) -> Column:
    """Concept with a label-derived id minted from ``id_label``."""
    return _concept(ctype, label, _ld_id(id_label))


# ---------------------------------------------------------- contributors

def contributors_expr(bib: Column) -> Column:
    """MarcContributors over Sierra varFields → array<contributor struct>.

    Primaries (100/110/111, document order) then secondaries (700/710/711);
    per field: type from the tag suffix ($t on x00 demotes Person→Agent),
    label from the type's subfield set (blanks dropped, space-joined,
    Person labels double-comma-trimmed, Organisation/Meeting comma-trimmed
    at display), roles $e/$j by type with trailing-period strip, identifier
    from $0 (label-derived fallback from the type's getLabel), non-primary
    duplicates of a primary removed, then within-list harmonisation."""
    fields = F.concat(_vfs(bib, "100", "110", "111"), _vfs(bib, "700", "710", "711"))

    def one(vf):
        tag = F.coalesce(vf.getField("marcTag"), F.lit(""))
        suffix = F.substring(tag, 2, 2)
        has_t = F.size(_subs(vf, ["t"])) > 0
        is_person = (suffix == "00") & ~has_t
        is_agent = (suffix == "00") & has_t
        is_org = suffix == "10"
        raw_po = _join_nonblank(vf, _PERSON_LABEL_CODES)
        raw_org = _join_nonblank(vf, _ORG_LABEL_CODES)
        raw_meet = _join_nonblank(vf, _MEETING_LABEL_CODES)
        # getLabel per type: MarcPerson normalises twice; Agent/Org/Meeting
        # return the raw join (Org/Meeting normalise only in createAgent)
        glabel = (
            F.when(is_person, trim_trailing(trim_trailing(raw_po, ","), ","))
            .when(is_agent, raw_po)
            .when(is_org, raw_org)
            .otherwise(raw_meet)
        )
        display = F.when(
            is_person | is_agent, glabel
        ).otherwise(trim_trailing(glabel, ","))
        ctype = (
            F.when(is_person, F.lit("Person"))
            .when(is_agent, F.lit("Agent"))
            .when(is_org, F.lit("Organisation"))
            .otherwise(F.lit("Meeting"))
        )
        role_subs = F.when(suffix == "00", _subs(vf, ["e", "j"])).when(
            suffix == "10", _subs(vf, ["e"])
        ).otherwise(_subs(vf, ["j"]))
        roles = F.transform(
            _contents(role_subs), lambda r: F.regexp_replace(r, r"\.$", "")
        )
        cid = _id_state(vf, glabel, default_ind2="0")
        return F.when(
            glabel.isNotNull(),
            F.struct(
                ctype.alias("ctype"),
                display.alias("label"),
                roles.alias("roles"),
                cid.alias("id"),
                tag.startswith("1").alias("primary"),
            ),
        )

    return F.filter(F.transform(fields, one), lambda c: c.isNotNull())


def filter_duplicate_contributors(raw: Column) -> Column:
    """filterDuplicates (MarcContributors.scala:60-75): drop non-primary
    contributors that also appear as primary (equal apart from ``primary``).
    Call on a COLUMN REFERENCE — the array is referenced twice."""

    def _key(c):
        return F.struct(
            c.getField("ctype"), c.getField("label"), c.getField("roles"), c.getField("id")
        )

    return F.filter(
        raw,
        lambda c: c.getField("primary")
        | ~F.exists(raw, lambda p: p.getField("primary") & (_key(p) == _key(c))),
    )


# -------------------------------------------------------------- subjects

def _concept_subjects(bib: Column, tags: list[str], brand: bool = False) -> Column:
    """MarcConceptSubject over 650/648/651 (or 652 brand names): label
    "$a - subdivisions" with trailing period trimmed; primary $a concepts
    typed by tag, whole-field id only when there are no subdivisions;
    subdivision concepts always label-derived."""
    fields = F.filter(
        _vfs(bib, *tags),
        lambda vf: F.coalesce(vf.getField("ind2"), F.lit("")) != "7",
    )

    def one(vf):
        tag = vf.getField("marcTag")
        prim = _subs(vf, ["a"])
        subd = _subs(vf, ["v", "x", "y", "z"])
        label = trim_trailing_period(
            F.array_join(F.concat(_contents(prim), _contents(subd)), " - ")
        )
        label = F.nullif(label, F.lit(""))
        if brand:
            stype = F.lit("Concept")
        else:
            stype = (
                F.when(tag == "650", F.lit("Concept"))
                .when(tag == "648", F.lit("Period"))
                .otherwise(F.lit("Place"))
            )
        sid = _id_state(vf, label, default_ind2="0")
        no_subd = F.size(subd) == 0

        def prim_concept(sf):
            raw = F.coalesce(sf.getField("content"), F.lit(""))
            clabel = trim_trailing_period(raw)
            if brand:
                ctype = F.lit("Concept")
            else:
                ctype = stype
            # normalised per type: Concept trimTrailingPeriod (idempotent),
            # Place trimTrailing(':'), Period label kept (ParsedPeriod)
            norm_label = F.when(
                ctype == "Place", trim_trailing(clabel, ":")
            ).otherwise(clabel)
            own_ld_label = F.when(
                ctype == "Period", period_preprocess(norm_label)
            ).otherwise(norm_label)
            # whole-field id (identified OR label-derived) only when the
            # field has no subdivisions (MarcConceptSubject:70-86)
            cid = F.when(no_subd & sid.isNotNull(), sid).otherwise(
                _ld_id(own_ld_label)
            )
            return _concept(ctype, norm_label, cid)

        def sub_concept(sf):
            t = sf.getField("tag")
            raw = F.coalesce(sf.getField("content"), F.lit(""))
            ctype = (
                F.when(t == "y", F.lit("Period"))
                .when(t == "z", F.lit("Place"))
                .otherwise(F.lit("Concept"))
            )
            # every subdivision trims a trailing period — $v/$x/$z directly,
            # $y via ParsedPeriod (MarcCommonLabelSubdivisions.scala:58-70,
            # ParsedPeriod.scala:9-16); the Period id preprocesses first
            clabel = trim_trailing_period(raw)
            id_label = F.when(t == "y", period_preprocess(clabel)).otherwise(clabel)
            return _concept(ctype, clabel, _ld_id(id_label))

        concepts = F.concat(
            F.transform(prim, prim_concept), F.transform(subd, sub_concept)
        )
        return F.when(
            label.isNotNull() & (F.size(concepts) > 0),
            F.struct(
                stype.alias("stype"),
                label.alias("label"),
                sid.alias("id"),
                concepts.alias("concepts"),
            ),
        )

    return F.filter(F.transform(fields, one), lambda s: s.isNotNull())


def _person_subjects(bib: Column) -> Column:
    """MarcPersonSubject over 600: subject label = name subfields + $e
    roles + $x subdivisions (document order within each group, unfiltered,
    untrimmed); concepts = the Person (OnlyLocIds identifier) + $x as
    unidentified Concepts."""
    fields = F.filter(
        _vfs(bib, "600"),
        lambda vf: F.coalesce(vf.getField("ind2"), F.lit("")) != "7",
    )

    def one(vf):
        plabel = _join_nonblank(vf, _PERSON_LABEL_CODES)  # 600 → unnormalised
        name_part = _contents(_subs(vf, _PERSON_LABEL_CODES))
        roles = _contents(_subs(vf, ["e"]))
        xs = _contents(_subs(vf, ["x"]))
        all_parts = F.concat(name_part, roles, xs)
        slabel = F.nullif(F.array_join(all_parts, " "), F.lit(""))
        person_id = _id_state(vf, plabel, default_ind2="0", only_loc=True)
        subject_id = _id_state(vf, slabel, default_ind2="0", only_loc=True)
        concepts = F.concat(
            F.array(_concept(F.lit("Person"), plabel, person_id)),
            F.transform(
                xs, lambda x: _concept(F.lit("Concept"), x, F.lit(None).cast(_ID_T))
            ),
        )
        return F.when(
            plabel.isNotNull() & slabel.isNotNull(),
            F.struct(
                F.lit("Person").alias("stype"),
                slabel.alias("label"),
                subject_id.alias("id"),
                concepts.alias("concepts"),
            ),
        )

    return F.filter(F.transform(fields, one), lambda s: s.isNotNull())


def _agent_style_subjects(
    bib: Column,
    tag: str,
    stype: str,
    subject_label_codes: list[str],
    concept_label_codes: list[str],
    discard_multiple: bool,
) -> Column:
    """MarcOrganisationSubject (610) / MarcMeetingSubject (611): subject
    label from its subfield set (unfiltered join, trailing period trimmed);
    single agent concept with its own subfield set (blank-filtered join,
    comma+period normalised), OnlyLocIds identifiers on both."""
    fields = F.filter(
        _vfs(bib, tag),
        lambda vf: F.coalesce(vf.getField("ind2"), F.lit("")) != "7",
    )

    def one(vf):
        slabel_raw = _join_all(vf, subject_label_codes)
        slabel = F.nullif(trim_trailing_period(F.coalesce(slabel_raw, F.lit(""))), F.lit(""))
        craw = _join_nonblank(vf, concept_label_codes)
        clabel = trim_trailing(craw, ",")
        if stype == "Organisation":
            clabel = trim_trailing_period(clabel)
        cid = _id_state(
            vf,
            craw,
            default_ind2="0",
            only_loc=True,
            discard_multiple=discard_multiple,
        )
        subject_id = _id_state(vf, slabel, default_ind2="0", only_loc=True)
        return F.when(
            craw.isNotNull() & slabel.isNotNull(),
            F.struct(
                F.lit(stype).alias("stype"),
                slabel.alias("label"),
                subject_id.alias("id"),
                F.array(_concept(F.lit(stype), clabel, cid)).alias("concepts"),
            ),
        )

    return F.filter(F.transform(fields, one), lambda s: s.isNotNull())


def subjects_raw_expr(bib: Column) -> Column:
    """SierraSubjects pre-harmonisation: the five family transformers in
    reference order, concatenated."""
    return F.concat(
        _concept_subjects(bib, ["650", "648", "651"]),
        _person_subjects(bib),
        _agent_style_subjects(
            bib, "610", "Organisation", ["a", "b", "c", "d", "e"], ["a", "b"], True
        ),
        _agent_style_subjects(bib, "611", "Meeting", ["a", "c", "d"], ["a", "c", "d"], False),
        _concept_subjects(bib, ["652"], brand=True),
    )


# --------------------------------------------------------- harmonisation

def _dedupe(arr: Column, elem_type: str) -> Column:
    """Order-preserving distinct (Scala List.distinct)."""
    return F.aggregate(
        arr,
        F.array().cast(f"array<{elem_type}>"),
        lambda acc, x: F.when(
            F.exists(acc, lambda y: y == x), acc
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _best_type(keys: Column, cid: Column) -> Column:
    """mostSpecificType over the entries sharing ``cid``'s type-free source
    identifier (OntologyTypeOps.scala:166-218): non-vague first-in-order
    wins; Agent beats Concept among the vague.  NULL when the key is absent
    (→ no retype)."""
    matches = F.filter(
        keys,
        lambda k: (k.getField("t") == cid.getField("t"))
        & (k.getField("v") == cid.getField("v")),
    )
    specific = F.filter(
        matches, lambda k: ~k.getField("o").isin("Agent", "Concept")
    )
    return F.when(F.size(matches) == 0, F.lit(None).cast("string")).otherwise(
        F.when(F.size(specific) > 0, F.try_element_at(specific, F.lit(1)).getField("o"))
        .when(F.exists(matches, lambda k: k.getField("o") == "Agent"), F.lit("Agent"))
        .otherwise(F.lit("Concept"))
    )


def _subject_type_keys(subjects: Column) -> Column:
    """(identifier, ontologyType) pairs for every identified subject."""
    return F.transform(
        F.filter(subjects, lambda s: s.getField("id").isNotNull()),
        lambda s: F.struct(
            s.getField("id").getField("t").alias("t"),
            s.getField("id").getField("v").alias("v"),
            s.getField("stype").alias("o"),
        ),
    )


def _contrib_type_keys(contribs: Column) -> Column:
    return F.transform(
        F.filter(contribs, lambda c: c.getField("id").isNotNull()),
        lambda c: F.struct(
            c.getField("id").getField("t").alias("t"),
            c.getField("id").getField("v").alias("v"),
            c.getField("ctype").alias("o"),
        ),
    )


def harmonise_subjects(subjects: Column) -> Column:
    """harmoniseOntologyTypes for the subject list: retype to the best type
    for the shared identifier; a retyped subject rewrites its SOLE concept
    to the subject's identifier + new type (compound concept lists are
    label-derived and left alone); dedupe."""
    keys = _subject_type_keys(subjects)

    def fix(s):
        sid = s.getField("id")
        best = _best_type(keys, sid)
        retype = sid.isNotNull() & best.isNotNull()
        new_type = F.when(retype, best).otherwise(s.getField("stype"))
        concepts = s.getField("concepts")
        sole = F.try_element_at(concepts, F.lit(1))
        # only an IDENTIFIED sole concept is rewritten — the reference's
        # copyWithNewType would throw on an Unidentifiable concept id
        # (OntologyTypeOps.scala:88-99 asInstanceOf/copy); keeping the
        # unidentified concept untouched is the total-function rendering
        new_concepts = F.when(
            retype
            & (F.size(concepts) == 1)
            & sole.getField("id").isNotNull(),
            F.array(
                F.struct(
                    new_type.alias("ctype"),
                    sole.getField("label").alias("label"),
                    F.struct(
                        sid.getField("t").alias("t"), sid.getField("v").alias("v")
                    ).alias("id"),
                )
            ),
        ).otherwise(concepts)
        return F.struct(
            new_type.alias("stype"),
            s.getField("label").alias("label"),
            sid.alias("id"),
            new_concepts.alias("concepts"),
        )

    return _dedupe(F.transform(subjects, fix), _SUBJECT_T)


def harmonise_contributors(contribs: Column, keys: Column) -> Column:
    """harmoniseOntologyTypesWith for contributors: the agent takes the
    best type for its identifier (from ``keys`` — its own list inside
    SierraContributors, the subjects' map in SubjectsAndContributors)."""

    def fix(c):
        cid = c.getField("id")
        best = _best_type(keys, cid)
        retype = cid.isNotNull() & best.isNotNull()
        return F.struct(
            F.when(retype, best).otherwise(c.getField("ctype")).alias("ctype"),
            c.getField("label").alias("label"),
            c.getField("roles").alias("roles"),
            cid.alias("id"),
            c.getField("primary").alias("primary"),
        )

    return _dedupe(F.transform(contribs, fix), _CONTRIB_T)


# ------------------------------------------------------------- top level


def _id_str(cid: Column) -> Column:
    return F.when(
        cid.isNotNull(),
        F.concat(cid.getField("t"), F.lit("="), cid.getField("v")),
    ).otherwise(F.lit("-"))


def serialize_contributors(contribs: Column) -> Column:
    """"ctype|label|role;role|idtype=idvalue|P-or-S" per contributor —
    flat strings for oracle comparison and downstream graph extraction."""
    return F.transform(
        contribs,
        lambda c: F.concat_ws(
            "|",
            c.getField("ctype"),
            c.getField("label"),
            F.array_join(c.getField("roles"), ";"),
            _id_str(c.getField("id")),
            F.when(c.getField("primary"), F.lit("P")).otherwise(F.lit("S")),
        ),
    )


def serialize_subjects(subjects: Column) -> Column:
    """"stype|label|idtype=idvalue|ctype~label~id;…" per subject."""
    return F.transform(
        subjects,
        lambda s: F.concat_ws(
            "|",
            s.getField("stype"),
            s.getField("label"),
            _id_str(s.getField("id")),
            F.array_join(
                F.transform(
                    s.getField("concepts"),
                    lambda c: F.concat_ws(
                        "~",
                        c.getField("ctype"),
                        c.getField("label"),
                        _id_str(c.getField("id")),
                    ),
                ),
                ";",
            ),
        ),
    )


def transform_sierra_concepts(bibs: DataFrame) -> DataFrame:
    """bibs(id, content JSON) → per-bib subjects + contributors, both as
    typed structs and as serialized strings, plus the flat columns
    ``subjects``/``contributors`` the concepts-graph slice consumes
    (plans/concepts.py: subjects as labels, contributors as
    "type|label|roles|P-or-S").

    Staged through projection barriers deliberately: the harmonisation
    passes reference their input array twice (transform base + the
    type-key map), so each stage reads COLUMN REFERENCES from the previous
    one — Catalyst keeps the barriers (CollapseProject refuses to duplicate
    non-cheap multiply-referenced expressions) and the analyzer never sees
    one combinatorial expression tree.  Still a pure narrow map: four
    chained Projects, zero shuffles, zero Python.

    SubjectsAndContributors.scala:55-73 note — the reference harmonises
    contributors against the POST-harmonise subjects' type map; we use the
    pre-harmonise map, which is provably equivalent (harmonisation maps
    every entry of a key group to that group's best type, so the per-key
    best type is unchanged).
    """
    from .sierra_transform import SIERRA_BIB_SCHEMA

    parsed = bibs.select(
        F.col("id").alias("sierra_id"),
        F.from_json(F.col("content"), SIERRA_BIB_SCHEMA).alias("bib"),
    )
    bib = F.col("bib")
    staged = (
        parsed.select(
            "sierra_id",
            subjects_raw_expr(bib).alias("_subs_raw"),
            contributors_expr(bib).alias("_contribs_raw"),
        )
        .select(
            "sierra_id",
            "_subs_raw",
            filter_duplicate_contributors(F.col("_contribs_raw")).alias("_contribs_dd"),
        )
        .select(
            "sierra_id",
            harmonise_subjects(F.col("_subs_raw")).alias("subjects_full"),
            _subject_type_keys(F.col("_subs_raw")).alias("_subj_keys"),
            harmonise_contributors(
                F.col("_contribs_dd"), _contrib_type_keys(F.col("_contribs_dd"))
            ).alias("_contribs_h1"),
        )
        .select(
            "sierra_id",
            "subjects_full",
            harmonise_contributors(F.col("_contribs_h1"), F.col("_subj_keys")).alias(
                "contributors_full"
            ),
        )
    )
    return staged.select(
        "sierra_id",
        "subjects_full",
        "contributors_full",
        F.transform(F.col("subjects_full"), lambda s: s.getField("label")).alias(
            "subjects"
        ),
        F.transform(
            F.col("contributors_full"),
            lambda c: F.concat_ws(
                "|",
                c.getField("ctype"),
                c.getField("label"),
                F.array_join(c.getField("roles"), ";"),
                F.when(c.getField("primary"), F.lit("P")).otherwise(F.lit("S")),
            ),
        ).alias("contributors"),
        serialize_subjects(F.col("subjects_full")).alias("subjects_ser"),
        serialize_contributors(F.col("contributors_full")).alias("contributors_ser"),
    )
