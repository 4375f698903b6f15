"""Device-side compute primitives (MXU scoring, top-k, trie gathers)."""

from .scoring import (
    brute_force_topk,
    cosine_scores,
    cosine_scores_int8,
    gather_rescore,
    l2_normalize,
    quantize_int8,
)
from .topk import chunked_topk, exact_topk, fast_topk, merge_topk, segment_max_dedup

__all__ = [
    "brute_force_topk",
    "chunked_topk",
    "cosine_scores",
    "cosine_scores_int8",
    "exact_topk",
    "fast_topk",
    "gather_rescore",
    "l2_normalize",
    "merge_topk",
    "quantize_int8",
    "segment_max_dedup",
]
