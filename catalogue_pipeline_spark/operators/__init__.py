"""Batch operators (SURVEY.md §2) + training-data-pipeline operators.

Every operator here is expressed as declarative DataFrame logic (Catalyst
optimizes it); pandas UDFs appear only where no built-in kernel exists
(multimodal decode plumbing), per the no-per-row-Python contract.
"""

from .skew import top_hot_keys, salted_lww
from .intervals import coverage_gaps_df, merge_intervals_df
from .dedup import (
    exact_duplicates,
    ngram_jaccard_pairs,
    lsh_near_duplicates,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash64,
    embedding_near_duplicates,
)
from .similarity import cosine_topk_bruteforce, ivf_topk, lsh_bucketed_topk
from .textstats import text_quality, detect_language, token_count_expr, fingerprint64
from .components import connected_components, component_digest
from .precedence import pick_target_by_precedence, fixed_size_chunks
from .quality import detect_unresolvable_conflicts, traverse_hierarchy

__all__ = [
    "top_hot_keys",
    "salted_lww",
    "coverage_gaps_df",
    "merge_intervals_df",
    "exact_duplicates",
    "ngram_jaccard_pairs",
    "lsh_near_duplicates",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash64",
    "embedding_near_duplicates",
    "cosine_topk_bruteforce",
    "lsh_bucketed_topk",
    "ivf_topk",
    "text_quality",
    "detect_language",
    "token_count_expr",
    "fingerprint64",
    "connected_components",
    "component_digest",
    "pick_target_by_precedence",
    "fixed_size_chunks",
    "detect_unresolvable_conflicts",
    "traverse_hierarchy",
]
