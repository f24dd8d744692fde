"""Operator tests: skew/salting equivalence, intervals, dedup family,
similarity, textstats, components, precedence, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from catalogue_pipeline_spark.cdc import SchemaRegistry, generate_binlog, resolve_lww
from catalogue_pipeline_spark.operators import (
    component_digest,
    connected_components,
    cosine_topk_bruteforce,
    coverage_gaps_df,
    detect_language,
    embedding_near_duplicates,
    exact_duplicates,
    fingerprint64,
    fixed_size_chunks,
    lsh_bucketed_topk,
    merge_intervals_df,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    pick_target_by_precedence,
    salted_lww,
    simhash64,
    text_quality,
    top_hot_keys,
)
from catalogue_pipeline_spark.operators.multimodal import (
    extract_media_features,
    sample_video_frames,
    MEDIA_SCHEMA,
)
from catalogue_pipeline_spark.operators.precedence import fractional_change_gate


# ----------------------------------------------------------------- skew
def test_salted_lww_equals_unsalted(spark):
    """Scenario 9: salted two-phase result ≡ unsalted resolution on a skewed
    binlog (one hot conversation with ~10% of events)."""
    df = SchemaRegistry().normalize(
        generate_binlog(spark, 3000, n_convs=40, turns_per_conv=6, seed=3, hot_fraction=0.12)
    )
    ref = {tuple(r) for r in resolve_lww(df).drop("n_events").collect()}
    salted = {tuple(r) for r in salted_lww(df, salt_factor=8).drop("n_events").collect()}
    assert ref == salted


def test_top_hot_keys(spark):
    df = SchemaRegistry().normalize(
        generate_binlog(spark, 2000, n_convs=50, seed=3, hot_fraction=0.15, n_hot=1)
    )
    hot = top_hot_keys(df, "conv_id", threshold_fraction=0.05)
    assert hot == ["hot_0"]


# -------------------------------------------------------------- intervals
def test_merge_intervals_and_gaps(spark):
    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (20, 30), (30, 35), (50, 60)], "start long, end long"
    )
    merged = [(r["start"], r["end"]) for r in merge_intervals_df(iv).collect()]
    assert merged == [(0, 15), (20, 35), (50, 60)]
    gaps = [(r["gap_start"], r["gap_end"]) for r in coverage_gaps_df(iv).collect()]
    assert gaps == [(15, 20), (35, 50)]


# ------------------------------------------------------------------ dedup
@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The quick  brown fox JUMPS over the lazy dog"),  # normalized dup
        (4, "the quick brown fox leaps over the lazy dog"),  # near dup
        (5, "completely different content about spark engines"),
        (6, "another unrelated document discussing cdc pipelines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["members"] == [1, 2, 3] and groups[0]["n_docs"] == 3


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0 and pairs[(1, 3)] == 1.0
    # one word of nine differs → |∩|=4 of 7+7 shingles → 4/10
    assert abs(pairs[(1, 4)] - 0.4) < 1e-9
    assert (1, 5) not in pairs


def test_minhash_lsh_finds_near_dups(spark, docs):
    sig = minhash_signatures(docs, num_perm=16)
    assert sig.count() == 6 and len(sig.first()["sig"]) == 16
    # single-row bands: recall for a 0.4-jaccard pair = 1-(1-0.4)^16 ≈ 0.9997
    cand = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs, num_perm=16, bands=16).collect()
    }
    assert (1, 2) in cand and (1, 3) in cand and (1, 4) in cand
    assert (5, 6) not in cand


def test_lsh_near_duplicates_equals_exact_join(spark, docs):
    """Round-8 array-native LSH internals (per-doc shingle-hash arrays +
    HOF minhash, no exploded-table groupBy): output must still equal the
    exact all-pairs Jaccard join wherever LSH recall is ~1 (identical
    docs; at 16 perms/16 bands a J=1.0 pair is never missed)."""
    from catalogue_pipeline_spark.operators.dedup import lsh_near_duplicates

    exact = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(docs, threshold=0.99).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in lsh_near_duplicates(
            docs, threshold=0.99, num_perm=16, bands=16
        ).collect()
    }
    assert lsh == exact and (1, 2) in lsh  # the identical-doc pairs


def test_simhash_similarity_orders(spark, docs):
    codes = {r["id"]: r["simhash"] for r in simhash64(docs).collect()}
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(codes[1], codes[2]) == 0
    assert ham(codes[1], codes[4]) < ham(codes[1], codes[5])


def test_embedding_near_duplicates(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_duplicates(emb, threshold=0.95).collect()}
    assert pairs == {(1, 2)}


# -------------------------------------------------------------- similarity
def test_cosine_topk_bruteforce(spark):
    rows = [(i, [math.cos(i / 10.0), math.sin(i / 10.0)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0)
    top = cosine_topk_bruteforce(emb, q, k=3).collect()
    assert [r["neighbor_id"] for r in top] == [1, 2, 3]
    assert all(t["cosine"] <= 1.0001 for t in top)


def test_lsh_topk_recall(spark):
    rows = [(i, [math.cos(i / 50.0), math.sin(i / 50.0), 0.1 * (i % 3)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucketed_topk(emb, q, k=5, n_planes=4, n_tables=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # neighbours are extremely close here; LSH finds most


# --------------------------------------------------------------- textstats
def test_text_quality_and_language(spark, docs):
    tq = {r["id"]: r for r in text_quality(docs).collect()}
    assert tq[1]["n_tokens"] == 9
    assert 0.0 <= tq[1]["quality_score"] <= 1.0
    lang_rows = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in that house for it was warm"),
            (2, "der hund und die katze sind nicht auf der strasse"),
            (3, "le chat et le chien sont dans la maison pour le moment"),
        ],
        "doc_id long, text string",
    )
    langs = {r["id"]: r["lang_pred"] for r in detect_language(lang_rows).collect()}
    assert langs == {1: "en", 2: "de", 3: "fr"}


def test_fingerprint_stable_and_distinct(spark, docs):
    fp = {r["id"]: r["fingerprint"] for r in fingerprint64(docs).collect()}
    assert fp[1] == fp[2] == fp[3]
    assert fp[1] != fp[4]


# -------------------------------------------------------------- components
def test_connected_components_and_digest(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")], "src string, dst string"
    )
    cc = connected_components(edges)
    comp = {r["id"]: r["component"] for r in cc.collect()}
    assert comp["a"] == comp["b"] == comp["c"]
    assert comp["d"] == comp["e"] != comp["a"]
    assert comp["f"] not in (comp["a"], comp["d"])
    dig = component_digest(cc).collect()
    assert len(dig) == 3
    m = {tuple(r["members"]): r["subgraph_id"] for r in dig}
    assert ("a", "b", "c") in m and len(m[("a", "b", "c")]) == 64


# -------------------------------------------------------------- precedence
def test_pick_target_by_precedence(spark):
    df = spark.createDataFrame(
        [
            (1, "sierra", "w1"),
            (1, "tei", "w2"),
            (1, "ebsco", "w3"),
            (2, "sierra", "w4"),
        ],
        "component long, source string, work_id string",
    )
    order = ["ebsco", "tei", "calm", "sierra"]
    got = {
        r["component"]: r["work_id"]
        for r in pick_target_by_precedence(df, "component", "source", order, "work_id").collect()
    }
    assert got == {1: "w3", 2: "w4"}


def test_fixed_size_chunks(spark):
    df = spark.createDataFrame([(i,) for i in range(25)], "id long")
    chunks = fixed_size_chunks(df, "id", 10)
    sizes = {r["chunk_id"]: r["count"] for r in chunks.groupBy("chunk_id").count().collect()}
    assert sizes == {0: 10, 1: 10, 2: 5}


def test_fractional_change_gate():
    fractional_change_gate(4, 100, threshold=0.05)
    with pytest.raises(ValueError):
        fractional_change_gate(6, 100, threshold=0.05)
    fractional_change_gate(6, 100, threshold=0.05, force=True)


# -------------------------------------------------------------- multimodal
def test_multimodal_feature_plumbing(spark):
    rows = [
        ("m1", "image", "image/png", bytearray(b"\x89PNG fake"), 10, 10, None),
        ("m2", "video", "video/mp4", bytearray(b"\x00mp4 fake"), 64, 48, 3500),
        ("m3", "audio", "audio/wav", None, None, None, 2000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats["m1"]["n_bytes"] == 9
    assert 0.0 <= feats["m1"]["feature_0"] <= 1.0
    assert feats["m3"]["n_bytes"] == 0
    # deterministic: same payload → same features
    feats2 = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats == feats2
    with pytest.raises(NotImplementedError):
        extract_media_features(media, strict=True).collect()
    frames = sample_video_frames(media, every_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [
        ("m2", 0), ("m2", 1000), ("m2", 2000), ("m2", 3000)
    ]


def test_connected_components_long_path_converges(spark):
    """A path with diameter 60 (> the old 20-iteration cap) — pointer
    jumping converges in O(log d) rounds and labels everything with the min
    node (the G1 silent-mislabel hazard from VERDICT r1)."""
    n = 61
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n - 1)], "src string, dst string"
    )
    cc = connected_components(edges)
    comp = {r["id"]: r["component"] for r in cc.collect()}
    assert len(comp) == n
    assert set(comp.values()) == {"n000"}


def test_connected_components_nonconvergence_raises(spark):
    from catalogue_pipeline_spark.operators.components import ComponentConvergenceError

    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(30)], "src string, dst string"
    )
    with pytest.raises(ComponentConvergenceError):
        connected_components(edges, max_iterations=1)


def test_ivf_topk_routing(spark):
    """IVF-flat ANN (operators/similarity.py::ivf_topk): on a CLUSTERED
    corpus (the workload IVF exists for), probing 2 of 8 cells recovers the
    exact top-k — the cell routing machinery is what's under test; the
    random-embedding corpus is covered by the oracled LSH path (q35)."""
    import math

    from catalogue_pipeline_spark.operators import cosine_topk_bruteforce
    from catalogue_pipeline_spark.operators.similarity import ivf_topk

    dim, n_clusters, per = 16, 8, 50
    rows = []
    for i in range(n_clusters * per):
        c = i % n_clusters
        # cluster direction = two fixed axes per cluster; deterministic
        # small perturbation so in-cluster neighbours dominate cosine
        v = [0.0] * dim
        v[c] = 10.0
        v[(c + 8) % dim] = 5.0
        for j in range(dim):
            v[j] += math.sin(i * 31 + j * 7) * 0.2
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 8")  # one query per cluster
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk_bruteforce(emb, q, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=5, n_cells=8, n_probe=2, centroid_stride=49).collect()
    }
    assert len(got & exact) / len(exact) == 1.0


def test_multimodal_resize_and_audio_plans(spark):
    """Resize geometry and audio windowing computed JVM-side (the decode
    stays behind the stubbed decode_fn) — the remaining multimodal plumbing
    from the brief (decode/feature/resize/frame-sample)."""
    from catalogue_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_plan,
        sample_audio_windows,
    )

    rows = [
        ("img1", "image", "image/png", bytearray(b"x"), 1920, 1080, None),
        ("img2", "image", "image/png", bytearray(b"y"), 500, 1000, None),
        ("aud1", "audio", "audio/wav", bytearray(b"z"), None, None, 2300),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    rp = {r["media_id"]: r for r in resize_plan(media, 640, 640).collect()}
    assert rp["img1"]["out_w"] == 640 and rp["img1"]["out_h"] == 360
    assert rp["img1"]["pad_y"] == 140 and rp["img1"]["pad_x"] == 0
    assert rp["img2"]["out_w"] == 320 and rp["img2"]["out_h"] == 640
    assert "aud1" not in rp

    win = sorted(
        (r["start_ms"], r["end_ms"]) for r in sample_audio_windows(media, 1000, 500).collect()
    )
    assert win == [(0, 1000), (500, 1500), (1000, 2000), (1500, 2300), (2000, 2300)]


def test_decontamination_flags_and_drops(spark):
    # a doc sharing one 3-shingle with the benchmark is flagged; an
    # unrelated doc survives; benchmark contamination counts DISTINCT
    # shared shingles
    from catalogue_pipeline_spark.operators.dedup import (
        contamination_hits,
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap whatsoever here"),
            (3, "quick brown fox appears twice quick brown fox indeed"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox story")], "doc_id long, text string"
    )
    hits = {r.doc_id: r.n_hits for r in contamination_hits(docs, bench).collect()}
    # shared shingle: 'quick brown fox' (doc 3 contains it twice but
    # shingles are per-doc distinct → 1 hit)
    assert hits == {1: 1, 3: 1}
    kept = sorted(r.doc_id for r in decontaminate(docs, bench).collect())
    assert kept == [2]
    # min_hits=2 keeps the single-shingle overlaps
    kept2 = sorted(r.doc_id for r in decontaminate(docs, bench, min_hits=2).collect())
    assert kept2 == [1, 2, 3]


def test_stratified_sample_deterministic_across_partitionings(spark):
    from catalogue_pipeline_spark.operators.textstats import stratified_sample

    docs = spark.createDataFrame(
        [(i, f"t{i}", "s" + str(i % 3)) for i in range(60)],
        "doc_id long, text string, source string",
    )
    a = sorted(
        (r.doc_id, r.source)
        for r in stratified_sample(docs, "source", 5).collect()
    )
    b = sorted(
        (r.doc_id, r.source)
        for r in stratified_sample(docs.repartition(13), "source", 5).collect()
    )
    assert a == b and len(a) == 15
    # quota respected per stratum
    from collections import Counter

    assert set(Counter(s for _, s in a).values()) == {5}
    # a different salt draws a different sample
    c = sorted(
        (r.doc_id, r.source)
        for r in stratified_sample(docs, "source", 5, salt="mix-v2").collect()
    )
    assert c != a


def test_stratified_sample_two_phase_hot_stratum(spark):
    """Many partitions, one hot stratum: the two-phase top-N must equal the
    exact single-window answer (the md5 rank is total, so per-partition
    top-n unioned then re-ranked is lossless), and the plan must rank
    phase 1 on (stratum, input partition) so no task sorts a whole
    stratum."""
    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.operators.textstats import stratified_sample

    docs = spark.createDataFrame(
        [(i, f"t{i}", "hot" if i % 50 else "cold") for i in range(2000)],
        "doc_id long, text string, source string",
    ).repartition(32)
    got = sorted(
        (r.doc_id, r.source)
        for r in stratified_sample(docs, "source", 7, salt="mix-v1").collect()
    )
    # brute-force oracle: exact top-7 per stratum by the same salted rank
    h = F.md5(F.concat_ws("\x1f", F.col("doc_id").cast("string"), F.lit("mix-v1")))
    exp = sorted(
        (r.doc_id, r.source)
        for s in ("hot", "cold")
        for r in docs.filter(F.col("source") == s)
        .orderBy(h, "doc_id")
        .limit(7)
        .collect()
    )
    assert got == exp and len(got) == 14
    # plan shape: first Window partitions on (source, _pid) — the hot
    # stratum spreads over input partitions instead of one reducer
    plan = stratified_sample(docs, "source", 7)._jdf.queryExecution().executedPlan().toString()
    assert "_pid" in plan


def test_gopher_repetition_hand_case(spark):
    """Rae et al. 2021 Table-A1 rules on a hand-computed document."""
    from catalogue_pipeline_spark.operators.textstats import gopher_repetition

    text = "a b a b c\na b a b c\nx y"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = gopher_repetition(
        docs, top_ns=(2,), dup_ns=(2,)
    ).collect()[0]
    # lines: 3, distinct 2 -> dup frac 1/3; chars 9+9+3=21, surplus 9
    assert r["dup_line_frac"] == round(1 / 3, 6)
    assert r["dup_line_char_frac"] == round(9 / 21, 6)
    # no blank lines -> a single paragraph, nothing duplicated
    assert r["dup_para_frac"] == 0.0 and r["dup_para_char_frac"] == 0.0
    # 2-grams over 12 words: 'a b'x4 'b a'x2 'b c'x2 'c a' 'c x' 'x y';
    # total_chars = len(text) = 23
    assert r["top_2gram_char_frac"] == round(4 * 3 / 23, 6)
    assert r["dup_2gram_char_frac"] == round((4 + 2 + 2) * 3 / 23, 6)


def test_gopher_repetition_edges(spark):
    from catalogue_pipeline_spark.operators.textstats import gopher_repetition

    docs = spark.createDataFrame(
        [
            (1, ""),                       # empty -> all zeros
            (2, "one two"),                # shorter than n=5 -> 0 for 5-grams
            (3, "p q\n\np q\n\nz"),        # duplicate paragraphs
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["top_2gram_char_frac"] == 0.0
    assert got[2]["dup_5gram_char_frac"] == 0.0
    assert got[2]["top_2gram_char_frac"] == round(7 / 7, 6)  # one 2-gram
    # paragraphs of doc 3: ['p q','p q','z'] -> dup 1/3, chars (1*3)/7
    assert got[3]["dup_para_frac"] == round(1 / 3, 6)
    assert got[3]["dup_para_char_frac"] == round(3 / 7, 6)
