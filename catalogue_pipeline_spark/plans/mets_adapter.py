"""METS adapter — storage-service bag → MetsSourceData derivation.

Reference: ``mets_adapter/models/Bag.scala:22-100`` (the tagged-union
decision: an empty manifest or a manifest whose only file is the METS file
means the METS file was deleted — platform issues 4872/4893; otherwise the
METS file is found by name pattern in ``data/`` — a b-number or a
born-digital ``METS.{uuid}`` form — with the underscore-suffixed sibling
XMLs as manifestations; the bag version must parse ``v{n}``) and
``services/MetsAdapterWorkerService.scala:85-97`` (only bags in the
``digitised`` / ``born-digital`` spaces proceed; everything else is
skipped, not failed).

One narrow projection over a bag frame — regex matching and array
filtering in whole-stage codegen, no shuffles, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALLOWED_SPACES = ("digitised", "born-digital")

# Bag.scala:66-73 — the METS file is matched on the file NAME but the
# emitted value is its PATH (the versioned key under the bag root)
_METS_RE = (
    r"^data/(b[0-9]{7}[0-9x]|METS\.[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}"
    r"-[0-9a-f]{4}-[0-9a-f]{12}).xml$"
)
_MANIFESTATION_RE = r"^data/b[0-9]{7}[0-9x]_\w+.xml$"
_VERSION_RE = r"^v([0-9]+)"


def _matches(name: Column, pattern: str) -> Column:
    return F.regexp_extract(name, pattern, 0) != ""


def bag_to_mets_source_data(
    bags: DataFrame, *, spaces: tuple[str, ...] = ALLOWED_SPACES
) -> DataFrame:
    """Derive each bag's ``MetsSourceData``.  Input columns:
    ``external_identifier, space, bucket, path, version (the 'v3'-style
    string), created_date, files array<struct<name,path>>``.

    Output: ``(external_identifier, status, error, kind, root_bucket,
    root_key_prefix, filename, manifestations, created_date, version)``
    with ``status`` ∈ ``ok`` / ``skipped_space`` / ``error`` and ``kind``
    ∈ ``MetsFileWithImages`` / ``DeletedMetsFile`` (NULL unless ok) — the
    same tagged union the reindexer's METS payload carries."""
    files = F.coalesce(
        F.col("files"), F.array().cast("array<struct<name:string,path:string>>")
    )
    version_num = F.regexp_extract(F.col("version"), _VERSION_RE, 1)
    version_ok = version_num != ""
    mets_path = F.try_element_at(
        F.filter(files, lambda f: _matches(f.getField("name"), _METS_RE)),
        F.lit(1),
    ).getField("path")
    only_mets = F.forall(files, lambda f: f.getField("path") == mets_path)
    manifestations = F.transform(
        F.filter(files, lambda f: _matches(f.getField("name"), _MANIFESTATION_RE)),
        lambda f: f.getField("path"),
    )
    deleted = (F.size(files) == 0) | only_mets

    status = (
        F.when(~F.col("space").isin(*spaces), F.lit("skipped_space"))
        .when(~version_ok, F.lit("error"))
        .when((F.size(files) > 0) & mets_path.isNull(), F.lit("error"))
        .otherwise(F.lit("ok"))
    )
    error = (
        F.when(status != "error", F.lit(None).cast("string"))
        .when(~version_ok, F.lit("Couldn't parse version"))
        .otherwise(F.lit("Couldn't find METS file"))
    )
    kind = F.when(
        status == "ok",
        F.when(deleted, F.lit("DeletedMetsFile")).otherwise(
            F.lit("MetsFileWithImages")
        ),
    )
    with_images = kind == "MetsFileWithImages"
    return bags.select(
        "external_identifier",
        status.alias("status"),
        error.alias("error"),
        kind.alias("kind"),
        F.when(with_images, F.col("bucket")).alias("root_bucket"),
        F.when(with_images, F.col("path")).alias("root_key_prefix"),
        F.when(with_images, mets_path).alias("filename"),
        F.when(with_images, manifestations).alias("manifestations"),
        F.when(status == "ok", F.col("created_date")).alias("created_date"),
        F.when(status == "ok", version_num.cast("int")).alias("version"),
    )
