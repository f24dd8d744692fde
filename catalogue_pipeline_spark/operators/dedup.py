"""Deduplication operators for large-scale training-data pipelines.

All are declarative DataFrame compositions (no Python in the hot path):

  exact            hash-groupBy on normalized text
  n-gram Jaccard   shingle → explode → self-join on shingle → |∩|/|∪|
  MinHash + LSH    shingle → portable 64-bit hash → m permutations
                   (a_i·x+b_i mod p) → min per perm → band → bucket-join
  SimHash          per-bit weighted sign sum over token hashes → 64-bit code
  embedding cosine near-dup over an embedding array column

Scale notes
  * exact dedup and minhash signatures are pure groupBy aggregates —
    map-side combinable, one shuffle.
  * the shingle self-join (Jaccard) is quadratic per shingle bucket; LSH
    exists precisely to bound candidate pairs at 100 TB — band/bucket join
    touches only colliding docs.
  * every hash is deterministic (md5-derived), so results are stable across
    runs/cluster sizes AND reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fanout import fan_out

# a large 61-bit Mersenne prime for the permutation universe
MERSENNE_P = (1 << 61) - 1


def norm_text(col) -> F.Column:
    """Normalization shared with the oracle: lowercase, collapse whitespace.
    Use only where the normalized STRING itself is needed (md5 fingerprints)
    — for tokenization, word_tokens is ~10x cheaper."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def word_tokens(col) -> F.Column:
    """Token array, identical to splitting norm_text on single spaces but
    without materializing a regexp-rewritten copy of the text (the
    regexp_replace was 10x the cost of the split itself)."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def portable_hash64(col) -> F.Column:
    """Deterministic 60-bit int from md5 — identical formula is expressible
    in DuckDB SQL (see __spark_entry__), unlike xxhash64/murmur."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def word_shingles(col, k: int = 3) -> F.Column:
    """Array of k-word shingles of the normalized text (distinct).

    Built as a zip_with fold over k equal-length shifted slices — one O(n)
    pass instead of a per-position O(n·k) transform+slice (measured 6x
    faster on the documents corpus). Slices MUST share length n-k+1:
    zip_with pads the shorter side with nulls, which would inject a
    spurious null shingle per document."""
    words = word_tokens(col)
    n = F.size(words)
    m = n - k + 1  # shingle count when n >= k
    slices = [F.slice(words, i + 1, m) for i in range(k)]
    combined = slices[-1]
    for s in reversed(slices[:-1]):
        combined = F.zip_with(s, combined, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(
        F.when(n >= k, combined).otherwise(F.array(F.concat_ws(" ", words)))
    )


# ---------------------------------------------------------------- exact dedup
def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per duplicate
    group with member ids and count (count > 1)."""
    h = docs.select(
        F.col(id_col), F.md5(norm_text(F.col(text_col))).alias("content_hash")
    )
    return (
        h.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_sort(F.collect_list(id_col)).alias("members"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ------------------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    materialize: bool = True,
) -> DataFrame:
    """Exact Jaccard over k-word shingle sets for all candidate pairs sharing
    ≥1 shingle. Output: (id_a, id_b, jaccard) with id_a < id_b, ≥ threshold.

    |∩| from the self-join; |∪| = |A|+|B|−|∩| from per-doc set sizes, so no
    second pass over shingles.

    Scale: shingles are reduced to 64-bit hashes BEFORE the self-join — the
    shuffle moves 8-byte keys instead of ~20-char strings and the join
    compares longs (collision probability over distinct shingles is
    ~|S|²/2⁶⁵, irrelevant below trillions of shingles).
    """
    sh = fan_out(docs).select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), k)).alias("sh")
    ).select("id", F.xxhash64("sh").alias("sh"))
    if materialize:
        # the shingle expression feeds THREE consumers (both self-join sides
        # + the size aggregate); evaluate it once (at 100 TB: checkpoint the
        # shingle table to storage instead)
        sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), on="sh")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ------------------------------------------------------------------- MinHash
def _perm_coeffs(num_perm: int, seed: int = 1) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs — a simple LCG on the seed, no Python RNG
    state, reproducible in SQL."""
    coeffs = []
    x = seed
    for _ in range(num_perm):
        x = (6364136223846793005 * x + 1442695040888963407) % MERSENNE_P
        a = (x | 1) % MERSENNE_P
        x = (6364136223846793005 * x + 1442695040888963407) % MERSENNE_P
        b = x % MERSENNE_P
        coeffs.append((a, b))
    return coeffs


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    seed: int = 1,
) -> DataFrame:
    """(id, sig: array<bigint>[num_perm]) — min over shingles of
    (a_i·h(shingle)+b_i) mod p per permutation. One explode + one groupBy
    (map-side combinable mins)."""
    sh = fan_out(docs).select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("sh"),
    ).withColumn("h", portable_hash64(F.col("sh")))
    aggs = []
    for i, (a, b) in enumerate(_perm_coeffs(num_perm, seed)):
        # (a*h + b) mod p — compute in double-safe 61-bit space via pmod on
        # bigint; a*h can overflow int64, so reduce h mod p first and use
        # 128-bit-safe decomposition: (a*(h mod p)) mod p done via decimal
        hp = F.pmod(F.col("h"), F.lit(MERSENNE_P))
        prod = F.pmod(
            (hp.cast("decimal(38,0)") * F.lit(a).cast("decimal(38,0)"))
            + F.lit(b).cast("decimal(38,0)"),
            F.lit(MERSENNE_P).cast("decimal(38,0)"),
        ).cast("bigint")
        aggs.append(F.min(prod).alias(f"m{i}"))
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    seed: int = 1,
) -> DataFrame:
    """LSH band/bucket candidate pairs: split the signature into ``bands``
    rows-per-band groups, bucket-join docs agreeing on any full band.
    Output: (id_a, id_b, n_bands_shared). The scale path for near-dedup —
    candidate generation never compares non-colliding docs."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, id_col, text_col, k, num_perm, seed)
    band_rows = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "-",
                            F.lit(bi),
                            *[
                                F.col("sig")[bi * rows_per_band + j]
                                for j in range(rows_per_band)
                            ],
                        )
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    return (
        band_rows.alias("a")
        .join(band_rows.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_shared"))
    )


def lsh_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_perm: int = 16,
    bands: int = 8,
    seed: int = 1,
) -> DataFrame:
    """The 100 TB near-dedup path: LSH band/bucket candidate generation, then
    EXACT Jaccard verification computed only over candidate pairs.

    Same output contract as ngram_jaccard_pairs (id_a < id_b, jaccard ≥
    threshold) but the all-pairs shingle self-join is replaced by a bucket
    join that never compares non-colliding docs — a viral shingle shared by
    1% of the corpus no longer creates an O(n²) hot bucket. At the default
    16 perms × 8 bands, a pair at exactly J=0.8 is missed with probability
    (1−0.8²)^8 ≈ 3·10⁻⁴ and higher-J pairs exponentially less — tune
    bands/num_perm for the recall the corpus demands (the exact join remains
    available as the oracle).
    """
    # Per-doc shingle-hash ARRAY + per-doc minhash via higher-order mins —
    # shuffle-free signatures (guide §2.4 "remove shuffles outright"): the
    # previous shape exploded to a ~20×-input (id, shingle-hash) table,
    # checkpointed it, and ran TWO corpus-proportional groupBy exchanges
    # over it (one folding 16 mins, one folding the arrays back for the
    # verify).  Both aggregates were per-doc reductions of values computed
    # from the doc's own shingles, so they are pure projections over the
    # per-doc array: array_min(transform(...)) per permutation.  Verified
    # identical output; local timing parity (the interpreted HOF trades
    # evenly against the shuffles here), but at corpus scale this removes
    # every shuffle whose volume tracks |shingles| — the only exchanges
    # left are band rows (bands/doc) and candidate pairs.
    #
    # Fast in-engine minhash: perm_i(x) = xxhash64(x, i) — a deterministic
    # independent hash per permutation, entirely JVM-side (no decimal mod
    # arithmetic). SQL portability is NOT needed here: q42's oracle is the
    # exact Jaccard join, independent of the candidate hash family (the
    # portable md5 variant lives in minhash_signatures for q33).
    base = fan_out(docs).select(
        F.col(id_col).alias("id"),
        F.transform(word_shingles(F.col(text_col), k), lambda s: F.xxhash64(s)).alias(
            "shs"
        ),
    )
    sig = base.select(
        "id",
        "shs",
        *[
            F.array_min(
                F.transform("shs", lambda h: F.xxhash64(h, F.lit(seed), F.lit(i)))
            ).alias(f"m{i}")
            for i in range(num_perm)
        ],
    )
    # sig (one row per doc: array + 16 mins) feeds the band rows AND both
    # verify sides — evaluate the shingling once; doc-count-sized, unlike
    # the exploded table the old shape checkpointed
    sig = sig.localCheckpoint(eager=False)
    rows_per_band = num_perm // bands
    band_rows = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(bi),
                        *[F.col(f"m{bi * rows_per_band + j}") for j in range(rows_per_band)],
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    cand = (
        band_rows.alias("a")
        .join(band_rows.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Exact verify on the PER-DOC SHINGLE ARRAYS (guide §2.3 "shuffle keys
    # and metadata instead of payloads" / §3.3 "explode before a join
    # multiplies the shuffle"): two joins attach both sides' arrays to the
    # candidate pairs (AQE broadcasts the small side); |∩| is a per-pair
    # array_intersect.  Arrays are per-doc distinct (word_shingles), so
    # size/intersect equal the count-based |A|,|B|,|∩| of the exploded
    # self-join oracle.  The round-8 first cut built these arrays by
    # collect_list over the exploded table (measured: replacing the two
    # explode-rejoins cut q42 from ~5.4 s to ~2.3 s warm at sf1); the
    # array-native shingling above now yields them as a projection with no
    # groupBy at all.
    arrs = sig.select("id", "shs")
    return (
        cand.join(
            arrs.select(F.col("id").alias("id_a"), F.col("shs").alias("sh_a")), "id_a"
        )
        .join(
            arrs.select(F.col("id").alias("id_b"), F.col("shs").alias("sh_b")), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            F.size("sh_a").alias("sz_a"),
            F.size("sh_b").alias("sz_b"),
        )
        .withColumn(
            "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------------------------- SimHash
def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(id, simhash) — per-bit majority over token hashes. Built entirely
    from explode + 64 conditional sums (one shuffle, map-side combinable)."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(F.col(text_col))).alias("t"),
    ).withColumn("h", portable_hash64(F.col("t")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("id").agg(*bit_sums)
    code = None
    for b in range(bits):
        term = F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint"))
        code = term if code is None else code + term
    return agg.select("id", code.alias("simhash"))


# --------------------------------------------------- embedding near-duplicate
def embedding_near_duplicates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine ≥ threshold via brute-force self-join; cosine built
    from zip_with/aggregate (JVM-side, no UDF). Quadratic — the LSH-bucketed
    variant in similarity.py is the 100 TB path."""
    def norm(df, pfx):
        return df.select(
            F.col(id_col).alias(f"{pfx}_id"),
            F.col(vec_col).alias(f"{pfx}_v"),
            F.sqrt(
                F.aggregate(
                    F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
                )
            ).alias(f"{pfx}_n"),
        )

    a, b = norm(emb, "a"), norm(emb, "b")
    dot = F.aggregate(
        F.zip_with(F.col("a_v"), F.col("b_v"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", dot / (F.col("a_n") * F.col("b_n")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"), "cosine")
    )


# ------------------------------------------------------------ decontamination
def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination, the training-data counterpart of the
    dedup family: flag corpus documents sharing ≥1 k-word shingle with a
    benchmark/test set (the standard n-gram-overlap decontamination used
    before pretraining).  Returns ``(doc_id, n_hits)`` — the number of
    DISTINCT benchmark shingles the document contains.

    Scale shape: the benchmark side is test sets — small — so its
    distinct shingle set is broadcast; the corpus side is one scan +
    explode with the only shuffle the per-document hit count.  No
    all-pairs anything."""
    d = fan_out(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("sh"),
    )
    b = benchmark.select(
        F.explode(word_shingles(F.col(text_col), k)).alias("sh")
    ).distinct()
    # word_shingles is per-document distinct, so count(*) == distinct hits
    return (
        d.join(F.broadcast(b), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents contaminated by the benchmark (≥ min_hits
    shared k-shingles) — an anti-join against contamination_hits."""
    bad = contamination_hits(
        docs, benchmark, k=k, id_col=id_col, text_col=text_col
    ).filter(F.col("n_hits") >= min_hits)
    return docs.join(
        bad.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )
