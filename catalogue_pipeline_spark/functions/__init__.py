"""Scalar helper functions (SURVEY.md §2.9).

Deterministic variants of the reference's scalar utilities — determinism is a
hard requirement for replayable pipelines (X3 note: the reference mints ids
with ``random`` + a uniqueness table; we derive them from content so replays
mint identical ids with no coordination).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------- text normalisation
# TextNormalisation.scala (transformer_common) as Column expressions.


def trim_trailing(c: Column, char: str) -> Column:
    """Remove the given trailing character and surrounding whitespace
    (TextNormalisation.trimTrailing)."""
    import re as _re

    return F.regexp_replace(c, r"\s*[" + _re.escape(char) + r"]\s*$", "")


def trim_trailing_period(c: Column) -> Column:
    """Remove a single trailing period, but never an ellipsis
    (TextNormalisation.trimTrailingPeriod)."""
    return F.regexp_replace(
        F.regexp_replace(c, r"([^.])\.\s*$", r"$1"), r"\s*$", ""
    )


def _build_fold_tables():
    """Precompute (at plan-build time, pure driver-side) the NFKD→ASCII
    fold the reference applies in LabelDerivedIdentifiers.scala:28-44
    (Normalizer.NFKD + strip non-ASCII).  Single-char decompositions become
    one JVM ``translate``; multi-char ones (ligatures, vulgar fractions in
    the Latin ranges) a short ``replace`` chain.  Characters outside these
    ranges with multi-char ASCII decompositions (e.g. fullwidth digits,
    circled numbers) are stripped instead of expanded — a documented
    deviation for exotic codepoints that never appear in catalogue labels."""
    one_src, one_dst, multi = [], [], []
    single_ranges = (
        list(range(0x80, 0x400))
        + list(range(0x1E00, 0x2000))
        + list(range(0x2000, 0x2C00))
        + list(range(0xFB00, 0xFB50))
        + list(range(0xFF00, 0xFFF0))
    )
    multi_ranges = set(range(0x80, 0x300)) | set(range(0xFB00, 0xFB07))
    for cp in single_ranges:
        ch = chr(cp)
        dec = unicodedata.normalize("NFKD", ch)
        ascii_part = "".join(c for c in dec if ord(c) < 128)
        if not ascii_part:
            continue
        if len(ascii_part) == 1:
            one_src.append(ch)
            one_dst.append(ascii_part)
        elif cp in multi_ranges:
            multi.append((ch, ascii_part))
    return "".join(one_src), "".join(one_dst), multi


_FOLD_SRC, _FOLD_DST, _FOLD_MULTI = _build_fold_tables()


def ascii_fold(c: Column) -> Column:
    """NFKD-decompose-then-strip-non-ASCII, JVM-side: accented Latin folds
    to its base letter (ü→u, é→e), everything non-decomposable is dropped —
    exactly the reference's ``Normalizer.normalize(_, NFKD).replaceAll
    ("[^\\p{ASCII}]", "")`` for the Latin ranges (see _build_fold_tables
    for the documented exotic-codepoint deviation)."""
    out = F.translate(c, _FOLD_SRC, _FOLD_DST)
    for src, dst in _FOLD_MULTI:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return F.regexp_replace(out, r"[^\x00-\x7F]", "")


def label_derived_value(label: Column) -> Column:
    """The reference's label-derived identifier value
    (LabelDerivedIdentifiers.identifierFromText): trimTrailingPeriod → trim
    → lowercase → NFKD ASCII fold → trim → truncate 255 → trim.  NULL label
    → NULL (the caller maps that to Unidentifiable)."""
    v = F.lower(F.trim(trim_trailing_period(label)))
    v = F.trim(ascii_fold(v))
    return F.trim(F.substring(v, 1, 255))


# canonical-id alphabet: lowercase+digits minus 0 o i l 1 (identifiers.py:1-39)
CANONICAL_ALPHABET = "23456789abcdefghjkmnpqrstuvwxyz"  # 31 chars
_FIRST_ALPHA = "abcdefghjkmnpqrstuvwxyz"  # first char must be alphabetic


def canonical_id(*cols: Column, length: int = 8) -> Column:
    """Deterministic 8-char canonical id over the reference's alphabet
    (8 chars, no 0/o/i/l/1, first char alphabetic — identifiers.py:1-39),
    derived from xxhash64 of the key columns instead of a random pool so
    replays are reproducible (X3)."""
    h = F.abs(F.xxhash64(*cols))
    first = F.substring(
        F.lit(_FIRST_ALPHA), (F.pmod(h, F.lit(len(_FIRST_ALPHA))) + 1).cast("int"), 1
    )
    rest = []
    acc = h
    for _ in range(length - 1):
        acc = F.abs(F.xxhash64(acc))
        rest.append(
            F.substring(
                F.lit(CANONICAL_ALPHABET),
                (F.pmod(acc, F.lit(len(CANONICAL_ALPHABET))) + 1).cast("int"),
                1,
            )
        )
    return F.concat(first, *rest)


class CanonicalIdCollision(RuntimeError):
    """Distinct keys hashed to the same canonical id — the failure the
    reference prevents with its uniqueness table + transactional assignment
    (id_generator.py:41-54). Remint with a larger ``length``."""


def mint_canonical_ids(
    df,
    *key_cols: str,
    out_col: str = "canonical_id",
    length: int = 8,
    max_collision_fraction: float = 0.0,
):
    """Mint canonical ids for ``df`` and AUDIT uniqueness (X3 with the
    collision handling the hash fold alone lacks): after minting, any id
    claimed by more than one distinct key raises (or is tolerated up to
    ``max_collision_fraction`` of keys, A8-style fractional gate).

    The audit is one map-side-combinable groupBy over (id → distinct keys);
    at the default 8-char id space (23·31^7 ≈ 6.3e11) a 1e9-key corpus
    expects ~1e6 birthday collisions — real, which is why the reference
    keeps a uniqueness table and why this gate is not optional at scale.
    Remint with ``length=12`` (≈ 1.8e19 ids) to push expected collisions
    below 1 for corpora up to ~6e9 keys.
    """
    minted = df.withColumn(out_col, canonical_id(*[F.col(c) for c in key_cols], length=length))
    key = F.concat_ws("\x1f", *key_cols)
    audit = (
        minted.groupBy(out_col)
        .agg(F.count_distinct(key).alias("_nkeys"))
        .agg(
            F.count(F.lit(1)).alias("_ids"),
            F.sum(F.when(F.col("_nkeys") > 1, 1).otherwise(0)).alias("_collided"),
        )
        .collect()[0]
    )
    n_ids, n_coll = audit["_ids"] or 0, audit["_collided"] or 0
    if n_ids and (n_coll / n_ids) > max_collision_fraction:
        raise CanonicalIdCollision(
            f"{n_coll}/{n_ids} canonical ids claimed by >1 distinct key "
            f"(length={length}); remint with a longer id"
        )
    return minted


def trace_id(*cols: Column) -> Column:
    """MD5 batch/lineage trace id (X7, ElasticIndexer.scala:180-189)."""
    return F.md5(F.concat_ws("|", *cols))


def to_clean_json(struct_col: Column) -> Column:
    """JSON encoding with nulls dropped (X4 deepDropNullValues,
    ElasticIndexer.scala:26-35)."""
    return F.to_json(struct_col, {"ignoreNullFields": "true"})


def unlinked_ids(old_links: Column, old_unlinked: Column, new_links: Column) -> Column:
    """Link maintenance (J9, LinkOps.scala:63-67):
    unlinked = (old.links ∪ old.unlinked) − new.links."""
    return F.array_except(F.array_union(old_links, old_unlinked), new_links)


def deep_diff(df1, df2, float_tolerance: float | None = None):
    """Bidirectional deep diff of two DataFrames (X8 — the
    es_index_comparison oracle, scripts/es_index_comparison/README.md:1-13):
    returns (only_in_df1, only_in_df2) via exceptAll both ways, optionally
    rounding float/double columns first so tolerance-insensitive comparisons
    are possible. Empty both ways ⇔ multiset-equal."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    a, b = df1, df2.select(*df1.columns)
    if float_tolerance is not None:
        import math

        digits = max(0, -int(math.floor(math.log10(float_tolerance))))
        for f in a.schema.fields:
            if isinstance(f.dataType, (DoubleType, FloatType)):
                a = a.withColumn(f.name, F.round(F.col(f.name).cast("double"), digits))
                b = b.withColumn(f.name, F.round(F.col(f.name).cast("double"), digits))
    return a.exceptAll(b), b.exceptAll(a)
