"""Per-source transformer slice #4: Miro image records → work fields.

Miro is the reference's historic image library source
(pipeline/transformer/transformer_miro).  With EBSCO (XML regex), Sierra
(JSON varField structs) and CALM (key→list maps), this completes the four
major source families; a Miro record is flat JSON with scalar and
list-valued ``image_*`` fields, so the slice is plain typed-struct column
logic — the interesting part is the data-cleanup RULES, which the reference
accreted over years of messy catalogue exports.

Rules carried over (file:line under transformer_miro/src/main/.../miro):

* suppression  — not cleared for the catalogue API →
                 Deleted(SuppressedFromSource(Miro: isClearedForCatalogueAPI
                 = false)); image_copyright_cleared != 'Y' →
                 Deleted(SuppressedFromSource(Miro: image_copyright_cleared
                 = <value|empty>)) (MiroRecordTransformer.scala:70-96)
* title/descr. — the truncated-title dance
                 (transformers/MiroTitleAndDescription.scala:31-108):
                 candidate description = image_image_desc unless '-'/'--'
                 (then the academic description); candidate title = its
                 first line; when the record title is missing, is '-'/'--',
                 or is a PREFIX of the candidate title, the candidate title
                 replaces it and every occurrence of that line is struck
                 from the description; Wellcome/Biomedical Image Award
                 (award, award_date) pairs append a sentence — one pair →
                 ' <label> <year>.', the known double-award shape →
                 ' Wellcome Image Awards Overall Winner <year>.'; the final
                 description is trimmed and dropped if blank
* lettering    — image_supp_lettering (MiroRecordTransformer.scala:106)
* format       — always Digital Images / q (transformers/MiroFormat.scala)
* subjects     — image_keywords ++ image_keywords_unauth (nulls dropped),
                 sentence-cased (capitalize)
                 (transformers/MiroSubjects.scala:14-35,
                 TextNormalisation.scala:27-28)
* genres       — image_phys_format ++ image_lc_genre, sentence-cased,
                 deduped (transformers/MiroGenres.scala)
* identifiers  — innopac id '^(?:\\.?[bB])?([0-9]{7}[0-9xX])$' → 'b'-prefixed
                 sierra-system-number, validated; non-matching non-null
                 values are data errors (Error row here instead of the
                 reference's thrown RuntimeException)
                 (transformers/MiroIdentifiers.scala:20-63; the single
                 hard-coded L0035411 mojibake fix included)
* created date — V-collection images only: image_artwork_date through the
                 period parser (transformers/MiroCreatedDate.scala)

Out of this slice (documented): thumbnail/imageData/items/licenses
(location + license plumbing) and the library-refs identifier family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MIRO_SCHEMA = T.StructType(
    [
        T.StructField("image_title", T.StringType()),
        T.StructField("image_image_desc", T.StringType()),
        T.StructField("image_image_desc_academic", T.StringType()),
        T.StructField("image_supp_lettering", T.StringType()),
        T.StructField("image_copyright_cleared", T.StringType()),
        T.StructField("image_award", T.ArrayType(T.StringType())),
        T.StructField("image_award_date", T.ArrayType(T.StringType())),
        T.StructField("image_keywords", T.ArrayType(T.StringType())),
        T.StructField("image_keywords_unauth", T.ArrayType(T.StringType())),
        T.StructField("image_phys_format", T.StringType()),
        T.StructField("image_lc_genre", T.StringType()),
        T.StructField("image_innopac_id", T.StringType()),
        T.StructField("image_artwork_date", T.StringType()),
        # location / licence / contributor inputs (round 4)
        T.StructField("image_use_restrictions", T.StringType()),
        T.StructField("image_credit_line", T.StringType()),
        T.StructField("image_source_code", T.StringType()),
        T.StructField("image_creator", T.ArrayType(T.StringType())),
        T.StructField("image_secondary_creator", T.ArrayType(T.StringType())),
    ]
)

_WIA_LABELS = ["WIA Overall Winner", "Wellcome Image Awards", "Biomedical Image Awards"]
_INNOPAC_RE = r"^(?:\.?[bB])?([0-9]{7}[0-9xX])$"


def _sentence_case(c: Column) -> Column:
    return F.concat(F.upper(F.substring(c, 1, 1)), F.substr(c, F.lit(2)))


def transform_miro(records: DataFrame) -> DataFrame:
    """records(id = image number, content = Miro JSON, cleared =
    isClearedForCatalogueAPI) → one work row per image."""
    if "cleared" not in records.columns:
        records = records.withColumn("cleared", F.lit(True))
    parsed = records.select(
        "id", F.from_json("content", MIRO_SCHEMA).alias("m"), "cleared"
    )
    m = F.col("m")

    raw_desc = m.getField("image_image_desc")
    cand_desc = F.coalesce(
        F.when(
            raw_desc.isin("-", "--"),
            F.coalesce(m.getField("image_image_desc_academic"), F.lit("")),
        ).otherwise(raw_desc),
        F.lit(""),
    )
    cand_title = F.split(cand_desc, "\n")[0]
    title0 = m.getField("image_title")
    truncated = F.when(title0.isNull(), F.lit(True)).otherwise(
        cand_title.startswith(title0)
    )
    use_desc = truncated | title0.isin("-", "--")
    title = F.when(use_desc, cand_title).otherwise(title0)
    raw_out = F.when(
        use_desc, F.replace(cand_desc, cand_title, F.lit(""))
    ).otherwise(cand_desc)

    pairs = F.filter(
        F.zip_with(
            F.coalesce(m.getField("image_award"), F.array().cast("array<string>")),
            F.coalesce(m.getField("image_award_date"), F.array().cast("array<string>")),
            lambda k, v: F.struct(k.alias("k"), v.alias("v")),
        ),
        lambda p: p.getField("k").isin(*_WIA_LABELS) & p.getField("v").isNotNull(),
    )
    wia = (
        F.when(F.size(pairs) == 1, F.concat(
            F.lit(" "),
            F.try_element_at(pairs, F.lit(1)).getField("k"),
            F.lit(" "),
            F.try_element_at(pairs, F.lit(1)).getField("v"),
            F.lit("."),
        ))
        .when(F.size(pairs) == 2, F.concat(
            F.lit(" Wellcome Image Awards Overall Winner "),
            F.try_element_at(pairs, F.lit(1)).getField("v"),
            F.lit("."),
        ))
        .otherwise(F.lit(""))
    )
    # Java String.trim strips all chars <= U+0020 (incl. newlines); Spark
    # trim only strips spaces, so use an explicit whitespace regexp
    full = F.regexp_replace(
        F.regexp_replace(F.concat(raw_out, wia), r"^\s+", ""), r"\s+$", ""
    )
    description = F.nullif(full, F.lit(""))

    innopac = F.when(
        F.col("id") == "L0035411",
        F.replace(m.getField("image_innopac_id"), F.lit("L 35411 \n\n"), F.lit("")),
    ).otherwise(m.getField("image_innopac_id"))
    innopac_digits = F.regexp_extract(innopac, _INNOPAC_RE, 1)
    bad_innopac = innopac.isNotNull() & (innopac_digits == "")
    # validatedWithWarning: the b-number regex only admits a LOWERCASE x
    # check digit, so an uppercase-X innopac id is silently dropped
    # (MiroIdentifiers.scala:49-55 + IdentifierRegexes.sierraSystemNumber)
    sierra_id = F.when(
        innopac_digits.rlike(r"^[0-9]{7}[0-9x]$"),
        F.concat(F.lit("b"), innopac_digits),
    )

    kws = F.concat(
        F.coalesce(m.getField("image_keywords"), F.array().cast("array<string>")),
        F.filter(
            F.coalesce(m.getField("image_keywords_unauth"), F.array().cast("array<string>")),
            lambda k: k.isNotNull(),
        ),
    )
    subjects = F.transform(kws, _sentence_case)
    genres = F.array_distinct(
        F.transform(
            F.filter(
                F.array(m.getField("image_phys_format"), m.getField("image_lc_genre")),
                lambda g: g.isNotNull(),
            ),
            _sentence_case,
        )
    )

    copyright = m.getField("image_copyright_cleared")
    reason = (
        F.when(
            ~F.col("cleared"),
            F.lit("SuppressedFromSource(Miro: isClearedForCatalogueAPI = false)"),
        )
        .when(
            ~F.coalesce(copyright == "Y", F.lit(False)),
            F.concat(
                F.lit("SuppressedFromSource(Miro: image_copyright_cleared = "),
                F.coalesce(copyright, F.lit("<empty>")),
                F.lit(")"),
            ),
        )
        .when(
            bad_innopac,
            F.concat(F.lit("Error(Expected 8-digit INNOPAC ID or nothing, got "), innopac, F.lit(")")),
        )
    )
    wtype = (
        F.when(reason.startswith("Suppressed"), F.lit("Deleted"))
        .when(reason.isNotNull(), F.lit("Error"))
        .otherwise(F.lit("Visible"))
    )
    visible = wtype == "Visible"
    empty = F.array().cast("array<string>")

    created_label = F.when(
        visible & F.col("id").startswith("V"), m.getField("image_artwork_date")
    )
    return parsed.select(
        "id",
        wtype.alias("type"),
        reason.alias("reason"),
        F.when(visible, title).alias("title"),
        F.when(visible, description).alias("description"),
        F.when(visible, m.getField("image_supp_lettering")).alias("lettering"),
        F.when(visible, F.lit("q")).alias("format_id"),
        F.when(visible, F.lit("Digital Images")).alias("format_label"),
        F.when(visible, subjects).otherwise(empty).alias("subjects"),
        F.when(visible, genres).otherwise(empty).alias("genres"),
        F.when(visible & sierra_id.isNotNull(), F.array(F.concat(F.lit("sierra-system-number:"), sierra_id)))
        .otherwise(empty)
        .alias("other_identifiers"),
        created_label.alias("created_label"),
    )


def with_created_period(works: DataFrame) -> DataFrame:
    """Parse the V-collection artwork date through the period parser
    (ParsedPeriod, MiroCreatedDate.scala), adding created_from/created_to
    ISO strings."""
    from ..functions.periods import parse_period_udf

    out = works.withColumn(
        "_p",
        F.when(F.col("created_label").isNotNull(), parse_period_udf()(F.col("created_label"))),
    )
    return (
        out.withColumn("created_from", F.col("_p.from_date").cast("string"))
        .withColumn("created_to", F.col("_p.to_date").cast("string"))
        .drop("_p")
    )


# ----------------------------------- locations / licences / contributors

# MiroLicenses.scala:35-72 — use-restriction string → licence id; two
# strings suppress the record, an absent value is a data error
_LICENSE_IDS = {
    "CC-0": "cc-0",
    "CC-BY": "cc-by",
    "CC-BY-NC": "cc-by-nc",
    "CC-BY-NC-ND": "cc-by-nc-nd",
    "PDM": "pdm",
    "In copyright": "inc",
    "Academics": "cc-by-nc",  # mapping defined in the drop-downs document
}
_SUPPRESS_RESTRICTIONS = ["Do not use", "Image withdrawn, see notes"]

# MiroContributorCredit.scala:29-82 — literal tidy-up table, order
# preserved (the reference uses String.replaceAll; every pattern is a
# literal, so plain replace is equivalent and regex-safe)
_CREDIT_FIXES = [
    ("Adrian Wressell, Heart of England NHSFT",
     "Adrian Wressell, Heart of England NHS FT"),
    ("Andrew Dilley,Jane Greening & Bruce Lynn",
     "Andrew Dilley, Jane Greening & Bruce Lynn"),
    ("Andrew Dilley,Nicola DeLeon & Bruce Lynn",
     "Andrew Dilley, Nicola De Leon & Bruce Lynn"),
    ("Ashley Prytherch, Royal Surrey County Hospital NHS Foundation Trust",
     "Ashley Prytherch, Royal Surrey County Hospital NHS FT"),
    ("David Gregory & Debbie Marshall", "David Gregory and Debbie Marshall"),
    ("David Gregory&Debbie Marshall", "David Gregory and Debbie Marshall"),
    ("Geraldine Thompson.", "Geraldine Thompson"),
    ("John & Penny Hubley.", "John & Penny Hubley"),
    ("oyal Army Medical Corps Muniment Collection, Wellcome Images",
     "Royal Army Medical Corps Muniment Collection, Wellcome Collection"),
    ("Science Museum London", "Science Museum, London"),
    ("The Wellcome Library, London", "Wellcome Collection"),
    ("Wellcome Library, London", "Wellcome Collection"),
    ("Wellcome Libary, London", "Wellcome Collection"),
    ("Wellcome LIbrary, London", "Wellcome Collection"),
    ("Wellcome Images", "Wellcome Collection"),
    ("The Wellcome Library", "Wellcome Collection"),
    ("Wellcome Library", "Wellcome Collection"),
    ("Wellcome Collection London", "Wellcome Collection"),
    ("Wellcome Collection, Londn", "Wellcome Collection"),
    ("Wellcome Trust", "Wellcome Collection"),
    ("'Wellcome Collection'", "Wellcome Collection"),
]

# A representative slice of miro_contributor_map.json /
# miro_individual_record_contributor_map.json (DATA resources, ~1000
# rows; a deployment loads the full JSON with spark.read.json into the
# same lookup).  The rule logic is independent of the table contents.
CONTRIBUTOR_CREDITS = {
    "AAL": "Wellcome Collection",
    "AAM": "Aamir Ahmed, Jane Pendjiky and Michael Millar",
    "AAW": "Alfred Anwander, MPI-CBS",
    "ABA": "Asuncion Bassas-Mujtaba",
    "ABU": "Wellcome Collection",
    "CSC": "Wellcome Trust Centre for Stem Cell Research",
    "GUS": "Karen Gustafson",
}
PER_RECORD_CREDITS = {
    "B0006507": {"CSC": "Jenny Nichols, Wellcome Trust Centre for Stem Cell Research"},
    "B0006714": {"CSC": "Jose Silva, Wellcome Trust Centre for Stem Cell Research"},
    "B0007831": {"CHC": "Dr Stephen McQuaid & Stewart Church / QUB"},
}
# MiroContributorCodes.scala:160-180 — nine GUS records removed by request
_GUS_SUPPRESSED = [
    "B0009891", "B0009897", "B0009886", "B0009893", "B0009887",
    "B0009895", "B0009884", "B0009890", "B0009888",
]

_IIIF_BASE = "https://iiif.wellcomecollection.org"


def _map_lit(d: dict[str, str]) -> Column:
    pairs = []
    for k, v in sorted(d.items()):
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def choose_license(use_restrictions: Column) -> Column:
    """struct<license_id, suppress_reason, error_reason> — exactly one of
    the three is non-null (MiroLicenses.scala:35-72; the reference throws
    ShouldSuppressException / ShouldNotTransformException, re-expressed as
    outcome columns the caller folds into work status)."""
    lid = F.try_element_at(_map_lit(_LICENSE_IDS), use_restrictions)
    return (
        F.when(
            use_restrictions.isNull(),
            F.struct(
                F.lit(None).cast("string").alias("license_id"),
                F.lit(None).cast("string").alias("suppress_reason"),
                F.lit("Nothing in the image_use_restrictions field").alias("error_reason"),
            ),
        )
        .when(
            use_restrictions.isin(*_SUPPRESS_RESTRICTIONS),
            F.struct(
                F.lit(None).cast("string").alias("license_id"),
                F.concat(
                    F.lit("image_use_restrictions = '"), use_restrictions, F.lit("'")
                ).alias("suppress_reason"),
                F.lit(None).cast("string").alias("error_reason"),
            ),
        )
        .when(
            lid.isNotNull(),
            F.struct(
                lid.alias("license_id"),
                F.lit(None).cast("string").alias("suppress_reason"),
                F.lit(None).cast("string").alias("error_reason"),
            ),
        )
        .otherwise(
            F.struct(
                F.lit(None).cast("string").alias("license_id"),
                F.lit(None).cast("string").alias("suppress_reason"),
                F.concat(
                    F.lit("Unrecognised image_use_restrictions: "), use_restrictions
                ).alias("error_reason"),
            )
        )
    )


def credit_expr(miro_id: Column, credit_line: Column, source_code: Column) -> Column:
    """struct<credit, suppress_reason> — the image credit line with the
    tidy-up table applied, else the contributor-code lookup (upper-cased,
    per-record overrides, GUS denylist) (MiroContributorCredit.scala:29-89,
    MiroContributorCodes.scala:150-190)."""
    fixed = credit_line
    for src, dst in _CREDIT_FIXES:
        fixed = F.replace(fixed, F.lit(src), F.lit(dst))
    code = F.upper(source_code)
    gus_hit = (code == "GUS") & miro_id.isin(*_GUS_SUPPRESSED)
    per_rec = F.create_map(
        *[
            x
            for mid, m in sorted(PER_RECORD_CREDITS.items())
            for x in (F.lit(mid), _map_lit(m))
        ]
    )
    looked_up = F.coalesce(
        F.try_element_at(_map_lit(CONTRIBUTOR_CREDITS), code),
        F.try_element_at(F.try_element_at(per_rec, miro_id), code),
    )
    return (
        F.when(
            credit_line.isNotNull(),
            F.struct(fixed.alias("credit"), F.lit(None).cast("string").alias("suppress_reason")),
        )
        .when(
            source_code.isNotNull() & gus_hit,
            F.struct(
                F.lit(None).cast("string").alias("credit"),
                F.lit("we do not expose image_source_code = GUS").alias("suppress_reason"),
            ),
        )
        .when(
            source_code.isNotNull(),
            F.struct(looked_up.alias("credit"), F.lit(None).cast("string").alias("suppress_reason")),
        )
        .otherwise(
            F.struct(
                F.lit(None).cast("string").alias("credit"),
                F.lit(None).cast("string").alias("suppress_reason"),
            )
        )
    )


def miro_locations(records: DataFrame) -> DataFrame:
    """The MiroLocation / MiroThumbnail / MiroContributors slice:
    records(id, content) → one row per image with the IIIF info.json
    digital location, the 300-wide thumbnail URL, the chosen licence, the
    tidied credit line and the contributor list (creator ++ secondary
    creator ++ non-Wellcome credit, each an Agent with a label-derived
    id — MiroLocation.scala:9-49, MiroThumbnail.scala:8-24,
    MiroContributors.scala:11-47).  Pure narrow map, zero shuffles."""
    from .sierra_concepts import label_derived_value

    parsed = records.select(
        "id", F.from_json("content", MIRO_SCHEMA).alias("m")
    )
    m = F.col("m")
    lic = choose_license(m.getField("image_use_restrictions"))
    cred = credit_expr(
        F.col("id"),
        m.getField("image_credit_line"),
        m.getField("image_source_code"),
    )
    credit = cred.getField("credit")
    arr = lambda c: F.coalesce(c, F.array().cast("array<string>"))  # noqa: E731
    labels = F.concat(
        F.filter(arr(m.getField("image_creator")), lambda x: x.isNotNull()),
        arr(m.getField("image_secondary_creator")),
        F.filter(
            F.array(F.when(credit != "Wellcome Collection", credit)),
            lambda x: x.isNotNull(),
        ),
    )
    contributors = F.transform(
        labels,
        lambda lab: F.concat_ws(
            "~", F.lit("Agent"), lab, F.concat(F.lit("label-derived="), label_derived_value(lab))
        ),
    )
    return parsed.select(
        "id",
        F.concat(F.lit(_IIIF_BASE + "/image/"), F.col("id"), F.lit("/info.json")).alias(
            "location_url"
        ),
        F.concat(
            F.lit(_IIIF_BASE + "/image/"), F.col("id"), F.lit("/full/300,/0/default.jpg")
        ).alias("thumbnail_url"),
        lic.getField("license_id").alias("license_id"),
        F.coalesce(
            lic.getField("suppress_reason"), cred.getField("suppress_reason")
        ).alias("suppress_reason"),
        lic.getField("error_reason").alias("error_reason"),
        credit.alias("credit"),
        contributors.alias("contributors"),
    )
