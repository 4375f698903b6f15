"""Fused device-side hybrid query step.

SURVEY.md §7 step 7: "fused query step — trie exact/prefix mask + ANN
scores + exact_match_weight boost + metadata filter masks + dedup by
case-id + global top-k". This module is that single program:

  1. **Semantic scores**: int8 corpus scan on the MXU (int32 accumulation,
     f32 rescale).
  2. **Metadata filters on device** (SURVEY §7 hard part "must not force
     host round-trips"): the court filter arrives as a per-query boolean
     lookup table over the (small) court vocabulary and is applied with one
     gather over the per-chunk court column; the date range is two integer
     comparisons against the per-chunk date column.
  3. **Similarity threshold**: scores below ``min_similarity`` are masked.
  4. **Trie boost**: lexical hit rows (from the batched trie walk) scatter
     ``exact_match_weight`` into the score matrix via scatter-max —
     lexical hits outrank any cosine (≤1) exactly like the reference's
     scoring (search.rs:197).
  5. **Top-k** (k·dedup_factor candidates): the host then dedups by case
     and hydrates only the final handful of rows.

Inputs are chunk-space: per-chunk filter columns are built by repeating the
case-level columns through the chunk→case map. Everything is shape-static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .topk import exact_topk, fast_topk


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def fused_hybrid_topk(
    query_emb: jax.Array,  # [B, D] f32, L2-normalised
    corpus_q: jax.Array,  # [N, D] int8 chunk embeddings
    corpus_scale: jax.Array,  # [N, 1] f32
    chunk_case: jax.Array,  # [N] int32: case row of each chunk
    chunk_court: jax.Array,  # [N] int32: court id of each chunk's case
    chunk_date: jax.Array,  # [N] int32: decision date (days) per chunk
    court_table: jax.Array,  # [B, V] bool: per-query allowed-court lookup
    date_lo: jax.Array,  # [B] int32 inclusive lower bound
    date_hi: jax.Array,  # [B] int32 inclusive upper bound
    trie_rows: jax.Array,  # [B, R] int32 lexical-hit case rows (-1 pad)
    trie_chunk_of_case: jax.Array,  # [C] int32: a representative chunk per case (-1 = none)
    min_similarity: jax.Array,  # [B] f32
    exact_weight: jax.Array,  # [B] f32
    k: int,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns ``(scores [B,k], chunk_idx [B,k], case_rows [B,k])`` with
    filtered-out / empty slots carrying ``-inf`` / ``-1``."""
    B = query_emb.shape[0]

    # 1) semantic scores (int8 MXU)
    q_abs = jnp.max(jnp.abs(query_emb), axis=1, keepdims=True)
    q_scale = jnp.maximum(q_abs, 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(query_emb / q_scale), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("bd,nd->bn", q8, corpus_q, preferred_element_type=jnp.int32)
    scores = acc.astype(jnp.float32) * q_scale * corpus_scale.reshape(1, -1)

    # 2+3) one fused mask pass: metadata filters + similarity threshold.
    # court filter: gather over the shared 1-D chunk_court index (a [B, N]
    # take_along_axis with a materialised [B, N] index matrix, or a [B, N]
    # scatter for the boost, each cost ~100x more on TPU — measured).
    court_ok = jnp.take(court_table, chunk_court, axis=1)  # [B, N]
    date_ok = (chunk_date[None, :] >= date_lo[:, None]) & (
        chunk_date[None, :] <= date_hi[:, None]
    )
    keep = court_ok & date_ok & (scores >= min_similarity[:, None])
    scores = jnp.where(keep, scores, -jnp.inf)

    # 5a) semantic top-k over the full corpus (approx_max_k — the TPU-KNN
    # partial reduction — when recall_target < 1; the lexical merge below
    # stays exact either way)
    if recall_target >= 1.0:
        top_v, top_i = exact_topk(scores, k)
    else:
        top_v, top_i = fast_topk(scores, k, recall_target)

    # 4) lexical boost, merge-style: the <=R trie-hit chunks per query form
    # a tiny side list at exact_weight (filter-checked via cheap gathers,
    # threshold-exempt like the reference); a final top-k over the
    # concatenation replaces the giant scatter.
    safe_rows = jnp.clip(trie_rows, 0, trie_chunk_of_case.shape[0] - 1)
    hit_chunk = jnp.take(trie_chunk_of_case, safe_rows)  # [B, R]
    safe_chunk = jnp.maximum(hit_chunk, 0)
    hit_court_ok = jnp.take_along_axis(
        court_table, jnp.take(chunk_court, safe_chunk), axis=1
    )
    hit_dates = jnp.take(chunk_date, safe_chunk)
    hit_date_ok = (hit_dates >= date_lo[:, None]) & (hit_dates <= date_hi[:, None])
    valid_hit = (trie_rows >= 0) & (hit_chunk >= 0) & hit_court_ok & hit_date_ok
    lex_v = jnp.where(valid_hit, exact_weight[:, None], -jnp.inf)

    merged_v = jnp.concatenate([top_v, lex_v], axis=1)  # [B, k+R]
    merged_i = jnp.concatenate([top_i, safe_chunk], axis=1)
    top_v, pos = exact_topk(merged_v, k)
    top_i = jnp.take_along_axis(merged_i, pos, axis=1)

    cases = jnp.where(
        jnp.isneginf(top_v), -1, jnp.take(chunk_case, top_i)
    )
    top_i = jnp.where(jnp.isneginf(top_v), -1, top_i)
    return top_v, top_i, cases
