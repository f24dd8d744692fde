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
