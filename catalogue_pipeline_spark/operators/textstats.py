"""Text analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting. All native column expressions (regexp +
arithmetic), fully codegen'd — and each reproducible in ANSI SQL for the
DuckDB oracle.

The reference's text machinery (X2 TextNormalisation, X1 period parsing) is
per-record Scala; here the equivalents are vectorized expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets — a deterministic n-gram/stopword
# heuristic, not a model (the container has no langid lib; the heuristic is
# the operator, the word lists are swappable)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "en", "que", "por", "con"],
}


def _words(text_col) -> F.Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def token_count_expr(text_col) -> F.Column:
    """Whitespace token count (BPE-ish subword estimate = chars/4 is also
    exposed by text_quality)."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


# GPT-2-style pretokenizer pattern — deliberately lookahead-free so the SAME
# pattern runs identically under Java regex (Spark) and RE2 (DuckDB oracle)
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count_expr(text_col) -> F.Column:
    """BPE-ish token count: matches of the GPT-2-style pretokenizer regex
    (word pieces, number runs, punctuation runs, contractions)."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_PATTERN), F.lit(0)))



def _marker_hits(text_col, words: list[str]) -> F.Column:
    # count occurrences of marker words (word-bounded) — pure regexp count
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(pattern), F.lit(0)))


def detect_language(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, lang_pred, lang_score): argmax over per-language stopword-hit
    rates. Ties break lexicographically for determinism."""
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    hit_cols = []
    for lang, words in sorted(LANG_MARKERS.items()):
        d = d.withColumn(f"hits_{lang}", _marker_hits(F.col("t"), words))
        hit_cols.append(lang)
    toks = token_count_expr(F.col("t"))
    best = F.greatest(*[F.col(f"hits_{m}") for m in hit_cols])
    pred = F.coalesce(
        *[F.when((F.col(f"hits_{m}") == best) & (best > 0), F.lit(m)) for m in hit_cols],
        F.lit("unknown"),
    )
    return d.select(
        "id",
        pred.alias("lang_pred"),
        (best / F.greatest(toks, F.lit(1))).alias("lang_score"),
    )


def text_quality(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Quality features + a composite score in [0,1]:
    length, token count, mean word length, punctuation ratio, uppercase
    ratio, digit ratio, stopword ratio, repetition ratio (distinct/total
    tokens), subword estimate. The score formula is fixed and documented so
    the oracle reproduces it exactly."""
    t = F.col("t")
    d = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    n_chars = F.length(t)
    toks = token_count_expr(t)
    words = _words(t)
    distinct_ratio = F.size(F.array_distinct(words)) / F.greatest(toks, F.lit(1))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]]", ""))
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    stop_hits = _marker_hits(t, LANG_MARKERS["en"])
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    upper_ratio = upper / F.greatest(n_chars, F.lit(1))
    digit_ratio = digits / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(toks, F.lit(1))
    length_score = F.least(toks / F.lit(50.0), F.lit(1.0))
    score = (
        F.lit(0.3) * length_score
        + F.lit(0.25) * F.least(stop_ratio * 3, F.lit(1.0))
        + F.lit(0.25) * distinct_ratio
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return d.select(
        "id",
        n_chars.alias("n_chars"),
        toks.alias("n_tokens"),
        (F.ceil(n_chars / F.lit(4)).cast("bigint")).alias("n_subwords_est"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(upper_ratio, 6).alias("upper_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_token_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def fingerprint64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint) — order-sensitive rolling document fingerprint:
    md5 of the normalized text folded to 60 bits (portable to the oracle).
    Distinct from simhash (similarity-preserving); this is an identity hash
    for exact-content lineage (X7-style trace ids)."""
    from .dedup import norm_text, portable_hash64

    return docs.select(
        F.col(id_col).alias("id"),
        portable_hash64(norm_text(F.col(text_col))).alias("fingerprint"),
    )


def stratified_sample(
    docs,
    strata_col: str = "source",
    n_per_stratum: int = 10,
    salt: str = "mix-v1",
    id_col: str = "doc_id",
):
    """Deterministic stratified sampling — the data-mixing primitive: take
    the top ``n_per_stratum`` documents per stratum ranked by a salted
    md5 of the id.  Fully reproducible across runs/partitionings (no RNG,
    the repo-wide determinism rule) and re-saltable for fresh draws.

    Two-phase top-N so no single task ever sorts a whole stratum (the
    realistic mixing case is 5-20 strata over 100 TB — a plain
    ``Window.partitionBy(stratum)`` would funnel terabytes to one
    reducer).  Phase 1 ranks within ``(stratum, input_partition)`` —
    the shuffle key carries the input partition id, so a hot stratum
    spreads across as many tasks as it has input splits — and keeps the
    local top ``n_per_stratum``.  Phase 2 runs the exact per-stratum
    window over the ≤ n_per_stratum × n_partitions survivors.  The
    salted md5 rank is a total order, so the global top-n of a stratum
    is contained in the union of its per-partition top-n and the output
    is byte-identical to the single-window form for any input
    partitioning (z100 oracle + determinism test)."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"), F.lit(salt)))
    d = docs.withColumn("_h", h).withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy(strata_col, "_pid").orderBy("_h", F.col(id_col))
    survivors = (
        d.withColumn("_rk", F.row_number().over(w_local))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk", "_pid")
    )
    w = Window.partitionBy(strata_col).orderBy("_h", F.col(id_col))
    return (
        survivors.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk", "_h")
    )


def gopher_repetition(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 10),
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 "Scaling Language
    Models", Table A1 — the standard pretraining repetition-removal
    rules; public paper, no reference-repo analog):

      * ``dup_line_frac`` — duplicate lines / total lines, counting every
        occurrence beyond a line's first (= 1 − distinct/total);
      * ``dup_line_char_frac`` — characters of those surplus occurrences
        / total line characters;
      * ``dup_para_frac`` / ``dup_para_char_frac`` — the same over
        paragraphs (split on blank line ``\\n\\n``);
      * ``top_{n}gram_char_frac`` (n ∈ top_ns) — max over n-grams of
        count × len(gram) (space-joined chars) / total text characters.
        INTENTIONAL deviation from Rae et al. Table A1, which takes the
        single MOST-FREQUENT gram's count × len: under the product-max a
        longer-but-slightly-less-frequent gram can supply the numerator.
        The product-max is the quantity a repetition filter actually
        thresholds (chars consumed by one repeated phrase), needs no
        count-then-length tie-break, and is what the DuckDB oracle
        (z103) encodes — the formula is frozen here;
      * ``dup_{n}gram_char_frac`` (n ∈ dup_ns) — characters of ALL
        occurrences of n-grams appearing more than once / total text
        characters. (The paper avoids double-counting overlaps; this
        implementation counts count×len per duplicated gram — the exact
        formula is fixed here so the DuckDB oracle reproduces it.
        Consequence: the value is NOT bounded by 1.0 — overlapping
        occurrences can push it past 1 (a unit test asserts 24/23), so
        downstream thresholds must treat it as a ratio on [0, ∞), not a
        probability; calibrate cutoffs against this formula, not the
        paper's non-overlapping one.)

    Words are whitespace runs of the trimmed raw text (no lowercasing —
    Gopher operates on raw text). All fractions rounded to 6 dp.

    Scale shape: line/paragraph stats are per-doc array expressions
    (zero shuffle); n-gram stats are ONE explode over (doc, n) and ONE
    groupBy (id, n, gram) — linear, change-proportional, no per-doc
    quadratic HOFs. At 100 TB the gram shuffle is the cost, keyed fine
    (id, n, gram) so it salts itself.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    t = F.col("t")
    from .fanout import fan_out

    # the per-doc dup-line/para aggregates and the gram explode are the
    # compute; a single-row-group input would otherwise pin them to the
    # 1-task scan (see fanout.py) — results are per-doc + groupBy, so
    # partitioning-independent
    d = fan_out(docs).select(
        F.col(id_col).alias("id"), F.coalesce(F.col(text_col), F.lit("")).alias("t")
    )

    words = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")
    total_chars = F.length(t).cast("double")

    def _unit_stats(split_pat: str, prefix: str):
        units = F.filter(
            F.transform(F.split(t, split_pat), lambda x: F.trim(x)),
            lambda x: x != "",
        )
        n_units = F.size(units).cast("double")
        n_dupes = (F.size(units) - F.size(F.array_distinct(units))).cast("double")
        # char-weighted: aggregate over distinct units, adding
        # (occurrences − 1) × len for each unit seen more than once.
        # Bounded: distinct-units × units per doc — a DOCUMENT is the
        # group, never the corpus (docs are KB-sized; fine per-row).
        dup_chars = F.aggregate(
            F.array_distinct(units),
            F.lit(0).cast("double"),
            lambda acc, u: acc
            + (
                F.size(F.filter(units, lambda y: y == u)) - F.lit(1)
            ).cast("double")
            * F.length(u).cast("double"),
        )
        unit_chars = F.aggregate(
            units, F.lit(0).cast("double"), lambda acc, u: acc + F.length(u)
        )
        return {
            f"{prefix}_frac": F.round(
                F.when(n_units > 0, n_dupes / n_units).otherwise(F.lit(0.0)), 6
            ),
            f"{prefix}_char_frac": F.round(
                F.when(unit_chars > 0, dup_chars / unit_chars).otherwise(
                    F.lit(0.0)
                ),
                6,
            ),
        }

    line_stats = _unit_stats(r"\n", "dup_line")
    para_stats = _unit_stats(r"\n\s*\n", "dup_para")
    base = d.select(
        "id",
        total_chars.alias("_tc"),
        words.alias("_ws"),
        *[c.alias(k) for k, c in {**line_stats, **para_stats}.items()],
    )

    # one (doc, n, gram) explode for every requested n
    gram_arrays = F.array(
        *[
            F.struct(
                F.lit(n).alias("n"),
                F.when(
                    F.size(F.col("_ws")) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(F.col("_ws")) - n + 1),
                        lambda i: F.concat_ws(
                            " ", F.slice(F.col("_ws"), i, F.lit(n))
                        ),
                    ),
                )
                .otherwise(F.array().cast("array<string>"))
                .alias("grams"),
            )
            for n in all_ns
        ]
    )
    grams = (
        base.select("id", "_tc", F.explode(gram_arrays).alias("_g"))
        .select(
            "id",
            "_tc",
            F.col("_g.n").alias("n"),
            F.explode_outer(F.col("_g.grams")).alias("gram"),
        )
    )
    counts = grams.groupBy("id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("_tc").alias("_tc")
    )
    gram_chars = F.length(F.col("gram")).cast("double")
    per_n = counts.groupBy("id", "n").agg(
        F.max(
            F.when(F.col("gram").isNotNull(), F.col("cnt") * gram_chars).otherwise(
                F.lit(0.0)
            )
        ).alias("_top_chars"),
        F.sum(
            F.when(
                F.col("gram").isNotNull() & (F.col("cnt") > 1),
                F.col("cnt") * gram_chars,
            ).otherwise(F.lit(0.0))
        ).alias("_dup_chars"),
        F.first("_tc").alias("_tc"),
    )
    frac = lambda c: F.round(  # noqa: E731
        F.when(F.col("_tc") > 0, c / F.col("_tc")).otherwise(F.lit(0.0)), 6
    )
    metrics = per_n.select(
        "id",
        "n",
        frac(F.col("_top_chars")).alias("_topf"),
        frac(F.col("_dup_chars")).alias("_dupf"),
    )
    pivoted = metrics.groupBy("id").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("_topf"))).alias(
                f"top_{n}gram_char_frac"
            )
            for n in top_ns
        ],
        *[
            F.max(F.when(F.col("n") == n, F.col("_dupf"))).alias(
                f"dup_{n}gram_char_frac"
            )
            for n in dup_ns
        ],
    )
    return (
        base.drop("_tc", "_ws")
        .join(pivoted, "id", "left")
        .withColumnRenamed("id", id_col)
    )
