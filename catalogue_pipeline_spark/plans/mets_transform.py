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
[Both notes are historical: the fileSec/structMap family landed in round 3
(``file_references_expr`` below) and the Archivematica Premis variant in
round 5:]

* flavour      — Goobi when a metsHdr agent name contains 'Goobi', else
                 Archivematica when an amdSec digiprovMD agentName contains
                 'Archivematica' (MetsXml.scala:146-166).  The reference
                 ERRORS on unknown flavour; this slice parses unknown
                 content down the Goobi/MODS path by default so synthetic
                 fixtures stay terse — pass ``strict_flavour=True`` for the
                 reference behavior (parity-tested).
* arch id      — the ONE dmdSec dublincore identifier; none → 'could not
                 find record identifier', several → 'multiple candidate
                 record identifiers found' (MetsXml.scala:64-75); work id
                 lowercased like every METS id (MetsData.scala:19-30)
* premis conds — first amdSec rightsMD (missing → error,
                 MetsXml.scala:74-88); rightsBasis routes the licence note:
                 'Copyright' → copyrightInformation/copyrightNote,
                 'License' → licenseInformation/licenseNote, absent →
                 prefer copyright (PremisAccessConditions.scala:66-82);
                 access status = the rightsGranted note whose act is 'use'
                 (:84-87); both values feed the SAME licence/status tables
                 as MODS; usage is always None (:12-20)
* arch work    — fileReferences Nil, no thumbnail (ArchivematicaMetsXML
                 fileReferences = Nil); merge candidate from the parsed
                 identifier (b-number test unchanged)
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


# --------------------------------------- Archivematica (Premis) variant


def mets_flavour_expr(content: Column) -> Column:
    """'goobi' / 'archivematica' / NULL (MetsXml.scala:146-166) — Goobi
    checked first, exactly like the reference's if/else chain."""
    hdr = F.regexp_extract(
        content, r"(?s)<(?:\w+:)?metsHdr[\s>](.*?)</(?:\w+:)?metsHdr>", 1
    )
    goobi = hdr.rlike(r"(?s)<(?:\w+:)?name[^>]*>[^<]*Goobi")
    digiprov = F.regexp_extract_all(
        content,
        F.lit(r"(?s)<(?:\w+:)?digiprovMD[\s>](.*?)</(?:\w+:)?digiprovMD>"),
        1,
    )
    arch = F.exists(
        digiprov,
        lambda b: b.rlike(r"(?s)<(?:\w+:)?agentName[^>]*>[^<]*Archivematica"),
    )
    return F.when(goobi, F.lit("goobi")).when(arch, F.lit("archivematica"))


def _dc_identifiers(content: Column) -> Column:
    """Every dmdSec dublincore identifier text (MetsXml.scala:64-75 collects
    across the dublincore elements; exactly one must survive)."""
    dcs = F.regexp_extract_all(
        content,
        F.lit(r"(?s)<(?:\w+:)?dublincore[\s>](.*?)</(?:\w+:)?dublincore>"),
        1,
    )
    return F.flatten(
        F.transform(
            dcs,
            lambda b: F.regexp_extract_all(
                b, F.lit(r"(?s)<(?:\w+:)?identifier[^>]*>(.*?)</(?:\w+:)?identifier>"), 1
            ),
        )
    )


def _first_tag(block: Column, tag: str) -> Column:
    return F.nullif(
        F.trim(
            F.regexp_extract(
                block, rf"(?s)<(?:\w+:)?{tag}[^>/]*>(.*?)</(?:\w+:)?{tag}>", 1
            )
        ),
        F.lit(""),
    )


def premis_conditions_expr(content: Column) -> tuple[Column, Column, Column]:
    """(has_rightsMD, licence_note, use_note) from the FIRST amdSec rightsMD
    (PremisAccessConditions.scala:54-95)."""
    rmd = F.regexp_extract(
        content, r"(?s)<(?:\w+:)?rightsMD[\s>](.*?)</(?:\w+:)?rightsMD>", 1
    )
    has_rmd = F.nullif(rmd, F.lit("")).isNotNull()
    rs = F.regexp_extract(
        rmd,
        r"(?s)<(?:\w+:)?rightsStatement(?:\s[^>]*)?>(.*?)</(?:\w+:)?rightsStatement>",
        1,
    )
    basis = _first_tag(rs, "rightsBasis")
    cnote = _first_tag(
        F.regexp_extract(
            rs,
            r"(?s)<(?:\w+:)?copyrightInformation(?:\s[^>]*)?>(.*?)</(?:\w+:)?copyrightInformation>",
            1,
        ),
        "copyrightNote",
    )
    lnote = _first_tag(
        F.regexp_extract(
            rs,
            r"(?s)<(?:\w+:)?licenseInformation(?:\s[^>]*)?>(.*?)</(?:\w+:)?licenseInformation>",
            1,
        ),
        "licenseNote",
    )
    rights_note = (
        F.when(basis == "Copyright", cnote)
        .when(basis == "License", lnote)
        .otherwise(F.coalesce(cnote, lnote))
    )
    grants = F.regexp_extract_all(
        rs,
        F.lit(r"(?s)<(?:\w+:)?rightsGranted(?:\s[^>]*)?>(.*?)</(?:\w+:)?rightsGranted>"),
        1,
    )
    use_grants = F.filter(grants, lambda g: _first_tag(g, "act") == "use")
    use_note = _first_tag(F.coalesce(F.get(use_grants, 0), F.lit("")), "rightsGrantedNote")
    return has_rmd, rights_note, use_note


# ------------------------------------------------- fileSec / structMap
# FileReferences + thumbnail selection (round-3 verdict ask #4, closing the
# "documented out of slice" note above).  Reference: models/
# FileReferences.scala:6-49 (physical structMap div order → fptr FILEIDs →
# OBJECTS fileGrp lookup with xlink:href + MIMETYPE),
# models/ThumbnailReference.scala (explicit TitlePage via the logical
# structMap + structLink, else the first image/pdf file),
# transformers/MetsThumbnail.scala (DLCS thumb URLs, suppressed when the
# access status restricts), transformers/DLCSFilenameNormaliser.scala.

_FILE_T = "struct<id:string,href:string,mime:string>"

# URLConnection.guessContentTypeFromName subset (content-types.properties);
# unknown extensions — e.g. .jp2 — stay NULL exactly like the reference
_MIME_BY_EXT = {
    "jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
    "gif": "image/gif", "pdf": "application/pdf", "txt": "text/plain",
    "html": "text/html", "xml": "application/xml", "mp3": "audio/mpeg",
    "mpeg": "video/mpeg", "mp4": "video/mp4",
}


def _guess_mime(href: Column) -> Column:
    ext = F.lower(F.regexp_extract(href, r"\.([A-Za-z0-9]+)$", 1))
    return F.coalesce(
        *[F.when(ext == k, F.lit(v)) for k, v in _MIME_BY_EXT.items()]
    )


def _physical_divs(content: Column) -> Column:
    """Physical-structMap divs as (ORDER, ID, [FILEID…]) structs in
    document order."""
    phys = F.regexp_extract(
        content,
        r'(?is)<(?:\w+:)?structMap[^>]*TYPE="physical"[^>]*>(.*?)</(?:\w+:)?structMap>',
        1,
    )
    divs = F.regexp_extract_all(
        phys,
        F.lit(r'(?is)<(?:\w+:)?div[^>]*\bORDER="[^"]*"[^>]*>(?:(?!<(?:\w+:)?div)(?!</(?:\w+:)?structMap).)*'),
        0,
    )
    return F.transform(
        divs,
        lambda d: F.struct(
            F.regexp_extract(d, r'\bORDER="([^"]*)"', 1).alias("o"),
            F.regexp_extract(d, r'(?<![A-Z])ID="([^"]*)"', 1).alias("id"),
            F.regexp_extract_all(d, F.lit(r'FILEID="([^"]+)"'), 1).alias("fids"),
        ),
    )


def _physical_file_ids(content: Column) -> Column:
    """MetsXml.physicalFileIds: divs sorted by the ORDER attribute (string
    sort, as the reference's sortByAttribute does), fptr FILEIDs flattened."""
    return F.flatten(
        F.transform(F.array_sort(_physical_divs(content)), lambda d: d.getField("fids"))
    )


def _objects_files(content: Column) -> Column:
    """fileGrp USE=OBJECTS file elements as (id, href, mime) structs."""
    grp = F.regexp_extract(
        content,
        r'(?is)<(?:\w+:)?fileGrp[^>]*USE="OBJECTS"[^>]*>(.*?)</(?:\w+:)?fileGrp>',
        1,
    )
    files = F.regexp_extract_all(
        grp,
        F.lit(r'(?is)<(?:\w+:)?file\s(?:(?!</(?:\w+:)?file>).)*</(?:\w+:)?file>'),
        0,
    )
    return F.transform(
        files,
        lambda f: F.struct(
            F.regexp_extract(f, r'(?<![A-Z])ID="([^"]*)"', 1).alias("id"),
            F.regexp_extract(f, r'href="([^"]*)"', 1).alias("href"),
            F.nullif(F.regexp_extract(f, r'MIMETYPE="([^"]*)"', 1), F.lit("")).alias("mime"),
        ),
    )


def file_references_expr(content: Column) -> Column:
    """FileReferences.apply: one (id, href, mime-or-guessed) struct per
    physical file id that resolves to an OBJECTS file with a non-empty
    href, in physical page order."""
    files = _objects_files(content)
    ids = _physical_file_ids(content)

    def resolve(fid):
        match = F.try_element_at(
            F.filter(files, lambda f: f.getField("id") == fid), F.lit(1)
        )
        return F.when(
            match.isNotNull() & (match.getField("href") != ""),
            F.struct(
                fid.alias("id"),
                match.getField("href").alias("href"),
                F.coalesce(
                    match.getField("mime"), _guess_mime(match.getField("href"))
                ).alias("mime"),
            ),
        )

    return F.filter(F.transform(ids, resolve), lambda r: r.isNotNull())


def thumbnail_reference_expr(content: Column) -> Column:
    """ThumbnailReference.apply: the explicit TitlePage file (logical
    structMap TYPE=TitlePage → structLink → physical div → first FILEID)
    when present and valid, else the first physical file whose LISTED mime
    is image/* or application/pdf."""
    files = _objects_files(content)
    logical = F.regexp_extract(
        content,
        r'(?is)<(?:\w+:)?structMap[^>]*TYPE="LOGICAL"[^>]*>(.*?)</(?:\w+:)?structMap>',
        1,
    )
    tp_div = F.nullif(
        F.regexp_extract(
            logical, r'(?is)<(?:\w+:)?div[^>]*TYPE="TitlePage"[^>]*>', 0
        ),
        F.lit(""),
    )
    log_id = F.nullif(
        F.regexp_extract(tp_div, r'(?<![A-Z])ID="([^"]*)"', 1), F.lit("")
    )
    smlinks = F.transform(
        F.regexp_extract_all(
            content, F.lit(r"(?is)<(?:\w+:)?smLink[^>]*>"), 0
        ),
        lambda s: F.struct(
            F.regexp_extract(s, r'(?:xlink:)?from="([^"]*)"', 1).alias("f"),
            F.regexp_extract(s, r'(?:xlink:)?to="([^"]*)"', 1).alias("t"),
        ),
    )
    phys_id = F.try_element_at(
        F.filter(smlinks, lambda s: s.getField("f") == log_id), F.lit(1)
    ).getField("t")
    divs = _physical_divs(content)
    tp_fid = F.try_element_at(
        F.flatten(
            F.transform(
                F.filter(divs, lambda d: d.getField("id") == phys_id),
                lambda d: d.getField("fids"),
            )
        ),
        F.lit(1),
    )

    def lookup(fid):
        return F.try_element_at(
            F.filter(
                files,
                lambda f: (f.getField("id") == fid) & (f.getField("href") != ""),
            ),
            F.lit(1),
        )

    tp_file = lookup(tp_fid)
    title_page = F.when(
        tp_file.isNotNull(),
        F.struct(
            tp_file.getField("id").alias("id"),
            tp_file.getField("href").alias("href"),
            F.coalesce(
                tp_file.getField("mime"), _guess_mime(tp_file.getField("href"))
            ).alias("mime"),
        ),
    )
    # first thumbnailable: LISTED mime image/* or application/pdf
    ids = _physical_file_ids(content)
    cands = F.filter(
        F.transform(ids, lookup),
        lambda f: f.isNotNull()
        & (
            (f.getField("mime") == "application/pdf")
            | F.coalesce(f.getField("mime"), F.lit("")).startswith("image")
        ),
    )
    first = F.try_element_at(cands, F.lit(1))
    fallback = F.when(
        first.isNotNull(),
        F.struct(
            first.getField("id").alias("id"),
            first.getField("href").alias("href"),
            F.coalesce(
                first.getField("mime"), _guess_mime(first.getField("href"))
            ).alias("mime"),
        ),
    )
    return F.coalesce(title_page, fallback)


def thumbnail_url_expr(
    thumb: Column, bnum: Column, access_status: Column
) -> Column:
    """MetsThumbnail.apply: suppressed for restricted/closed access; DLCS
    image-thumb URL for image mimes (location normalised: objects/ prefix
    stripped, b-number prepended unless already present), iiif-builder
    /thumb/<bnum> otherwise."""
    restricted = F.coalesce(
        access_status.isin("Restricted", "Closed"), F.lit(False)
    )
    fname = F.regexp_replace(thumb.getField("href"), r"^objects/", "")
    norm = F.when(
        F.lower(fname).startswith(F.lower(bnum)), fname
    ).otherwise(F.concat(bnum, F.lit("_"), fname))
    url = F.when(
        F.coalesce(thumb.getField("mime"), F.lit("")).startswith("image/"),
        F.concat(
            F.lit("https://iiif.wellcomecollection.org/thumbs/"),
            norm,
            F.lit("/full/!200,200/0/default.jpg"),
        ),
    ).otherwise(
        F.concat(F.lit("https://iiif.wellcomecollection.org/thumb/"), bnum)
    )
    return F.when(thumb.isNotNull() & ~restricted, url)


def created_date_expr(content: Column, version: Column) -> Column:
    """metsHdr CREATEDATE, reformatted to yyyy-MM-dd'T'HH:mm:ss'Z' — parsed
    with a zone offset when present, else assumed UTC; only kept when
    version == 1 (InvisibleMetsData, MetsData.scala:149-168).  The session
    runs in UTC so offset inputs normalise correctly."""
    cd = F.nullif(
        F.regexp_extract(content, r'<(?:\w+:)?metsHdr[^>]*CREATEDATE="([^"]*)"', 1),
        F.lit(""),
    )
    ts = F.coalesce(
        F.try_to_timestamp(cd, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(cd, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
        F.try_to_timestamp(cd, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(cd, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
    )
    return F.when(version == 1, F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"))


def transform_mets(records: DataFrame, strict_flavour: bool = False) -> DataFrame:
    """records(id = record identifier, content = METS XML[, deleted,
    last_modified, version]) → one work row per record.  Goobi records parse
    the MODS path, Archivematica records the dublincore/Premis path; with
    ``strict_flavour`` an undetectable flavour errors like the reference
    (MetsXml.scala:146-157)."""
    if "deleted" not in records.columns:
        records = records.withColumn("deleted", F.lit(False))
    if "version" not in records.columns:
        records = records.withColumn("version", F.lit(1))
    content = F.col("content")
    deleted = F.coalesce(F.col("deleted"), F.lit(False))
    store_id = F.lower(F.col("id"))

    flavour = mets_flavour_expr(content)
    is_arch = flavour.eqNullSafe("archivematica")  # NULL flavour → goobi arm

    titles = F.array_distinct(
        F.transform(
            F.regexp_extract_all(content, F.lit(_TITLE_RE), 1),
            lambda t: F.trim(t),
        )
    )
    title = F.array_join(titles, " ")

    # ---- Goobi / MODS arm --------------------------------------------------
    g_licence, g_lic_err = _licence_expr(_access_condition(content, "dz"))
    g_status, g_st_err = _status_expr(_access_condition(content, "status"))
    g_usage = _access_condition(content, "usage")
    g_err = F.coalesce(g_lic_err, g_st_err)

    # ---- Archivematica / Premis arm ----------------------------------------
    dc_ids = _dc_identifiers(content)
    a_id_err = (
        F.when(F.size(dc_ids) == 0, F.lit("could not find record identifier"))
        .when(F.size(dc_ids) > 1, F.lit("multiple candidate record identifiers found"))
    )
    a_raw_id = F.trim(F.get(dc_ids, 0))
    has_rmd, rights_note, use_note = premis_conditions_expr(content)
    a_licence, a_lic_err = _licence_expr(rights_note)
    a_status, a_st_err = _status_expr(use_note)
    # InvisibleMetsData's for-comprehension: identifier errors precede the
    # access-conditions parse (MetsData.scala:137-174)
    a_err = F.coalesce(
        a_id_err,
        F.when(
            ~has_rmd,
            F.lit(
                "Archivematica Mets file must contain a premis-compatible rightsMD element"
            ),
        ),
        a_lic_err,
        a_st_err,
    )

    flavour_err = (
        F.when(
            flavour.isNull(),
            F.lit("Could not determine which flavour of METS to parse"),
        )
        if strict_flavour
        else F.lit(None).cast("string")
    )
    err = F.coalesce(flavour_err, F.when(is_arch, a_err).otherwise(g_err))
    # record id: DeletedMetsFile keeps the store key (MetsXmlTransformer
    # :33-38); Archivematica parses it from the dublincore element
    rid = F.when(
        ~deleted & is_arch & a_id_err.isNull(), F.lower(a_raw_id)
    ).otherwise(store_id)
    raw_rid = F.when(~deleted & is_arch & a_id_err.isNull(), a_raw_id).otherwise(
        F.col("id")
    )
    licence = F.when(is_arch, a_licence).otherwise(g_licence)
    status = F.when(is_arch, a_status).otherwise(g_status)
    usage = F.when(is_arch, F.lit(None).cast("string")).otherwise(g_usage)

    is_bnum = rid.rlike(r"^b[0-9]{7}[0-9x]$")
    merge = F.when(
        is_bnum, F.concat(F.lit("sierra-system-number:"), rid, F.lit(":METS work"))
    ).otherwise(F.concat(F.lit("calm-ref-no:"), raw_rid, F.lit(":METS work")))

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
        # ArchivematicaMetsXML.fileReferences = Nil
        F.when(
            live & ~is_arch,
            F.transform(
                file_references_expr(content),
                lambda r: F.concat_ws(
                    "~",
                    r.getField("id"),
                    r.getField("href"),
                    F.coalesce(r.getField("mime"), F.lit("-")),
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("file_refs"),
        F.when(
            live & ~is_arch,
            thumbnail_url_expr(thumbnail_reference_expr(content), rid, status),
        ).alias("thumbnail_url"),
        # MetsLocation.scala: the IIIF presentation URL on the single digital
        # item — locationPrefix 'v2/' for Goobi, '' for Archivematica
        # (InvisibleMetsData, MetsData.scala:144-147)
        F.when(
            live,
            F.concat(
                F.lit("https://iiif.wellcomecollection.org/presentation/"),
                F.when(is_arch, F.lit("")).otherwise(F.lit("v2/")),
                rid,
            ),
        ).alias("location_url"),
        F.when(live, created_date_expr(content, F.col("version"))).alias("created_date"),
    )
