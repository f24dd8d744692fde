"""Near-dedup scale demonstration: exact shingle self-join vs LSH→verify.

Generates a deterministic ~N-doc corpus (Spark expressions, no Python row
loop) containing (a) ~5% twin pairs differing by one word (J ≈ 0.9 — the
true near-duplicates) and (b) a VIRAL 3-word tail shared by ``viral_pct`` of
docs — the stop-phrase pathology that makes the exact all-pairs shingle join
quadratic in one bucket while leaving minhash signatures (1 of 16 mins at
most) untouched.

Both operators read the same parquet and must return the SAME pair set
(recall check included); what differs is cost, and the gap widens with
viral_pct exactly as SCALE.md argues. Appends results to BENCH/DEDUP.md.

Usage: python tools/bench_dedup.py [n_docs] [viral_pct]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from catalogue_pipeline_spark.operators.dedup import (  # noqa: E402
    lsh_near_duplicates,
    ngram_jaccard_pairs,
)
from catalogue_pipeline_spark.session import build_session  # noqa: E402


def build_corpus(spark, n_docs: int, viral_pct: int):
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # twins: docs 40k and 40k+1 share a text group; everyone else is alone
    grp = F.when(F.col("doc_id") % 40 < 2, F.floor(F.col("doc_id") / 2) * 2).otherwise(
        F.col("doc_id")
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda j: F.concat(F.lit("w"), F.pmod(F.xxhash64(grp, j), F.lit(50000)).cast("string")),
    )
    # twin member 1 mutates one mid-document word (J ~ 0.9 vs its twin)
    mutated = F.when(
        (F.col("doc_id") % 40 == 1),
        F.concat(
            F.slice(words, 1, 30),
            F.array(F.concat(F.lit("mut"), F.col("doc_id").cast("string"))),
            F.slice(words, 32, 29),
        ),
    ).otherwise(words)
    text = F.concat_ws(" ", mutated)
    # viral tail: identical 3-word phrase on viral_pct% of docs
    text = F.when(
        F.col("doc_id") % 100 < viral_pct,
        F.concat(text, F.lit(" please unsubscribe here")),
    ).otherwise(text)
    return ids.select("doc_id", text.alias("text"))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    viral_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = build_session("dedup-bench", master="local[32]", shuffle_partitions=64)
    work = tempfile.mkdtemp(prefix="cps-dedup-")
    try:
        path = os.path.join(work, "docs")
        build_corpus(spark, n_docs, viral_pct).write.parquet(path)
        docs = spark.read.parquet(path)

        # collect the PAIR KEYS once per operator (pairs are tiny — a few
        # thousand rows — vs the joins that produce them; an exceptAll-based
        # compare would lazily RE-EXECUTE the expensive joins)
        t0 = time.time()
        lsh_set = {
            (r["id_a"], r["id_b"])
            for r in lsh_near_duplicates(docs, threshold=0.85).select("id_a", "id_b").collect()
        }
        t_lsh = time.time() - t0
        lsh_pairs = len(lsh_set)

        t0 = time.time()
        exact_set = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, threshold=0.85).select("id_a", "id_b").collect()
        }
        t_exact = time.time() - t0
        exact_pairs = len(exact_set)

        # recall as a true SET comparison (not a count ratio): exact pairs
        # missing from the LSH set, and LSH pairs outside the exact set —
        # offsetting errors can't fake a 1.0
        missed = len(exact_set - lsh_set)
        extra = len(lsh_set - exact_set)
        assert extra == 0, f"LSH produced {extra} pairs outside the exact set"

        out = {
            "n_docs": n_docs,
            "viral_pct": viral_pct,
            "exact_join_sec": round(t_exact, 1),
            "lsh_verify_sec": round(t_lsh, 1),
            "speedup": round(t_exact / t_lsh, 2),
            "exact_pairs": exact_pairs,
            "lsh_pairs": lsh_pairs,
            "missed_pairs": missed,
            "recall": round((exact_pairs - missed) / exact_pairs, 4) if exact_pairs else None,
        }
        print(json.dumps(out))
        md = (
            f"\n| {n_docs:,} | {viral_pct}% | {t_exact:.1f} s | {t_lsh:.1f} s | "
            f"{out['speedup']}x | {exact_pairs} | {lsh_pairs} | {out['recall']} |"
        )
        p = os.path.join(REPO, "BENCH", "DEDUP.md")
        if not os.path.exists(p):
            with open(p, "w") as f:
                f.write(
                    "# Near-dedup at scale: exact all-pairs join vs LSH -> exact-verify\n\n"
                    "Deterministic corpus with ~5% one-word-apart twin pairs (J~0.9) and a\n"
                    "viral 3-word tail on viral_pct of docs (the stop-phrase pathology: one\n"
                    "shingle bucket holds (viral_pct*N)^2/2 candidate pairs for the exact\n"
                    "join, while minhash signatures barely notice). Same input parquet, same\n"
                    "threshold 0.85, pair sets must match (recall column).\n"
                    "`python tools/bench_dedup.py <n_docs> <viral_pct>`\n\n"
                    "| docs | viral | exact join | LSH->verify | speedup | exact pairs | lsh pairs | recall |\n"
                    "|---|---|---|---|---|---|---|---|"
                )
        with open(p, "a") as f:
            f.write(md)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
