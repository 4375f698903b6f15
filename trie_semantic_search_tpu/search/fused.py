"""Fully-fused device hybrid search path.

Binds the frozen artifacts (chunk embeddings, metadata columns, chunk→case
map, trie hit rows) to :func:`..ops.hybrid.fused_hybrid_topk` — semantic
scan + device metadata filters + lexical boost + top-k in ONE jit program
per query batch (SURVEY.md §7 step 7). The engine's staged path remains the
default (identical results, more flexibility); this path minimises
host↔device round-trips for throughput-critical serving.
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..index.trie import TrieIndex
from ..index.vector import VectorIndex
from ..ops.hybrid import fused_hybrid_topk
from ..ops.scoring import quantize_int8
from ..storage.columns import MetadataColumns


class FusedHybridSearch:
    """Device-resident state for the fused hybrid query step."""

    def __init__(
        self,
        trie_index: TrieIndex,
        vector_index: VectorIndex,
        columns: MetadataColumns,
    ):
        if vector_index.vectors is None or not len(vector_index.vectors):
            raise ValueError("vector index has no frozen vectors")
        self.trie_index = trie_index
        self.vector_index = vector_index
        self.columns = columns

        v = np.asarray(vector_index.vectors, np.float32)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        self.corpus_q, self.corpus_scale = quantize_int8(v)

        refs = np.asarray(vector_index.refs, np.int32)  # [N, 2]
        chunk_case = refs[:, 0]
        self.chunk_case = jnp.asarray(chunk_case)
        self.chunk_court = jnp.asarray(columns.court_ids[chunk_case])
        self.chunk_date = jnp.asarray(columns.dates[chunk_case])

        # representative chunk per case (first chunk in ref order; the boost
        # only needs one slot per case — dedup keeps the max anyway)
        C = len(columns)
        rep = np.full(C, -1, np.int32)
        for i in range(len(chunk_case) - 1, -1, -1):
            rep[chunk_case[i]] = i
        self.trie_chunk_of_case = jnp.asarray(rep)
        self.num_courts = max(len(columns.court_vocab), 1)

    def query_batch(
        self,
        query_embs: np.ndarray,  # [B, D]
        queries_text: Sequence[str],
        court_filters: Sequence[Optional[Sequence[str]]],
        date_ranges: Sequence[
            Optional[tuple[Optional[_dt.date], Optional[_dt.date]]]
        ],
        min_similarity: Sequence[float],
        exact_weight: Sequence[float],
        k: int = 40,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Run the fused step. Returns ``(scores, chunk_idx, case_rows)``
        each ``[B, k]`` (-inf/-1 padded), already filtered + boosted."""
        B = len(queries_text)
        # lexical hits (batched device walk across the three tries)
        trie_rows, trie_valid = self.trie_index.search_batch_rows(
            list(queries_text)
        )
        trie_rows = np.where(trie_valid, trie_rows, -1).astype(np.int32)

        # per-query court lookup table over the vocabulary
        V = self.num_courts
        court_table = np.ones((B, V), bool)
        for b, courts in enumerate(court_filters):
            if courts:
                allowed = {
                    self.columns.court_vocab.get(c.strip(), -1) for c in courts
                }
                court_table[b] = False
                for cid in allowed:
                    if 0 <= cid < V:
                        court_table[b, cid] = True

        lo = np.empty(B, np.int32)
        hi = np.empty(B, np.int32)
        for b, dr in enumerate(date_ranges):
            lo[b], hi[b] = self.columns.encode_date_range(dr)

        v, i, cases = fused_hybrid_topk(
            jnp.asarray(query_embs, jnp.float32),
            self.corpus_q,
            self.corpus_scale,
            self.chunk_case,
            self.chunk_court,
            self.chunk_date,
            jnp.asarray(court_table),
            jnp.asarray(lo),
            jnp.asarray(hi),
            jnp.asarray(trie_rows),
            self.trie_chunk_of_case,
            jnp.asarray(np.asarray(min_similarity, np.float32)),
            jnp.asarray(np.asarray(exact_weight, np.float32)),
            k=k,
        )
        return np.asarray(v), np.asarray(i), np.asarray(cases)
