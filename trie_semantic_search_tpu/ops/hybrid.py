"""Fused device-side hybrid query step.

SURVEY.md §7 step 7: "fused query step — trie exact/prefix mask + ANN
scores + exact_match_weight boost + metadata filter masks + dedup by
case-id + global top-k". This module is that single program:

  1. **Semantic scores**: int8 corpus scan on the MXU (int32 accumulation,
     f32 rescale) — either brute over the full corpus
     (:func:`fused_hybrid_topk`) or over probed partitions
     (:func:`fused_partitioned_topk`, the CAP-scale path).
  2. **Metadata filters on device** (SURVEY §7 hard part "must not force
     host round-trips"): the court filter arrives as a per-query boolean
     lookup table over the (small) court vocabulary and is applied with one
     gather over the per-chunk court column; the date range is two integer
     comparisons against the per-chunk date column.
  3. **Similarity threshold**: scores below ``min_similarity`` are masked.
  4. **Trie boost**: lexical hit rows (from the batched trie walk) form a
     tiny side list at ``exact_match_weight`` — lexical hits outrank any
     cosine (≤1) exactly like the reference's scoring (search.rs:197). Each
     entry carries its source span (name/citation/content) so results keep
     MatchType fidelity with the staged path (ref search.rs:70-82).
  5. **Dedup by case on device** (SURVEY §7 "segment-max by case-id"):
     candidates are over-fetched (``k·overfetch``), fully sorted, and later
     duplicates of an already-seen case are masked, so the final ``k`` slots
     hold ``k`` *distinct* cases — the host never silently under-fills
     ``max_results`` because one case dominated the chunk-level top-k.

Inputs are chunk-space: per-chunk filter columns are built by repeating the
case-level columns through the chunk→case map. Everything is shape-static.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from .pallas_scan import TILE_N, pallas_fused_topk
from .scoring import gather_rescore
from .topk import exact_topk, fast_topk, merge_topk, topk_by_score_then_row


def _use_pallas(n_rows: int, recall_target: float) -> bool:
    """The Pallas fused scan is the TPU path whenever its stride-family
    approximation is permitted (``recall_target < 1``) and the corpus is
    tile-divisible (the engine's layouts pad to powers of two)."""
    return (
        recall_target < 1.0
        and n_rows % TILE_N == 0
        and jax.default_backend() == "tpu"
    )

#: Result-source codes threaded through the fused programs so the host can
#: reconstruct the reference's MatchType surface (search.rs:70-82).
SRC_SEMANTIC = 0
SRC_CASE_NAME = 1
SRC_CITATION = 2
SRC_CONTENT = 3


def quantize_queries(query_emb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-query symmetric int8 quantisation. ``[B, D] f32 → (int8, scale)``."""
    q_abs = jnp.max(jnp.abs(query_emb), axis=-1, keepdims=True)
    q_scale = jnp.maximum(q_abs, 1e-12) / 127.0
    q8 = jnp.clip(jnp.round(query_emb / q_scale), -127, 127).astype(jnp.int8)
    return q8, q_scale


def lexical_side_list(
    trie_rows: jax.Array,  # [B, R] int32 lexical-hit case rows (-1 pad)
    trie_src: jax.Array,  # [B, R] int32 source span per hit (SRC_*)
    trie_chunk_of_case: jax.Array,  # [C] int32 representative chunk (-1 = none)
    chunk_court: jax.Array,  # [N] int32
    chunk_date: jax.Array,  # [N] int32
    court_table: jax.Array,  # [B, V] bool
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    exact_weight: jax.Array,  # [B] f32
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Filter-checked lexical candidates as a tiny side list.

    Returns ``(values [B,R], chunks [B,R], src [B,R])`` with invalid entries
    at ``-inf``. Filter checks are cheap gathers over the ≤R hits — parity
    with the semantic mask (ops/hybrid step 2), threshold-exempt like the
    reference (search.rs:197).
    """
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
    return lex_v, safe_chunk, trie_src


def merge_dedup_topk(
    sem_v: jax.Array,  # [B, Ks] semantic candidate scores (−inf padded)
    sem_chunk: jax.Array,  # [B, Ks] chunk ids
    lex_v: jax.Array,  # [B, R] lexical candidate scores (−inf padded)
    lex_chunk: jax.Array,  # [B, R] chunk ids
    lex_src: jax.Array,  # [B, R] SRC_* codes
    chunk_case: jax.Array,  # [N] int32 chunk → case row
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Merge semantic + lexical candidates, dedup by case, final top-k.

    Returns ``(scores, chunk_idx, case_rows, src)`` each ``[B, k]``; empty
    slots carry ``-inf`` / ``-1``. Dedup keeps each case's best candidate
    (ties break to the earlier sorted position, i.e. the lower chunk id —
    the determinism promise, ref README.md:16,190). Because lexical hits
    score ``exact_match_weight`` (>1 ≥ any cosine), a case hit both ways
    keeps its lexical score and provenance, like the staged path.
    """
    merged_v = jnp.concatenate([sem_v, lex_v], axis=1)  # [B, M]
    merged_i = jnp.concatenate([sem_chunk, lex_chunk], axis=1)
    merged_src = jnp.concatenate(
        [jnp.full_like(sem_chunk, SRC_SEMANTIC), lex_src], axis=1
    )
    M = merged_v.shape[1]
    # Full sort of the (small) candidate list: top_k with k=M.
    v_all, pos = exact_topk(merged_v, M)
    i_all = jnp.take_along_axis(merged_i, pos, axis=1)
    src_all = jnp.take_along_axis(merged_src, pos, axis=1)
    cases_all = jnp.take(chunk_case, i_all)
    valid = jnp.isfinite(v_all)
    cases_all = jnp.where(valid, cases_all, -1)

    # Dedup by case over the sorted list: kill any candidate whose case
    # already appeared at an earlier (better) position. O(M²) boolean on a
    # few hundred candidates — NOT a [B, N] scatter (those are ~100x slower
    # on TPU; measured round 1).
    eq = (cases_all[:, :, None] == cases_all[:, None, :]) & (
        cases_all[:, None, :] >= 0
    )
    earlier = jnp.tril(jnp.ones((M, M), bool), k=-1)[None]
    dup = jnp.any(eq & earlier, axis=-1)
    v_dedup = jnp.where(dup, -jnp.inf, v_all)

    kk = min(k, M)
    top_v, fpos = exact_topk(v_dedup, kk)
    top_i = jnp.take_along_axis(i_all, fpos, axis=1)
    top_src = jnp.take_along_axis(src_all, fpos, axis=1)
    top_cases = jnp.take_along_axis(cases_all, fpos, axis=1)
    dead = jnp.isneginf(top_v)
    return (
        top_v,
        jnp.where(dead, -1, top_i),
        jnp.where(dead, -1, top_cases),
        jnp.where(dead, SRC_SEMANTIC, top_src),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "overfetch", "recall_target", "use_court", "use_date"
    ),
)
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
    trie_src: jax.Array,  # [B, R] int32 SRC_* span code per lexical hit
    trie_chunk_of_case: jax.Array,  # [C] int32: a representative chunk per case (-1 = none)
    min_similarity: jax.Array,  # [B] f32
    exact_weight: jax.Array,  # [B] f32
    k: int,
    overfetch: int = 4,
    recall_target: float = 1.0,
    use_court: bool = True,
    use_date: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Brute-scan fused step. Returns ``(scores, chunk_idx, case_rows, src)``
    each ``[B, k]`` — k *distinct* cases per query (−inf/−1 padded).

    ``use_court=False`` / ``use_date=False`` are static host-side promises
    that no query in the batch carries that filter; the semantic-scan mask
    work compiles away (the lexical side list keeps its checks — it is
    tiny)."""
    # 1) semantic scores (int8 MXU)
    q8, q_scale = quantize_queries(query_emb)
    ksem = min(max(k * max(1, overfetch), k), corpus_q.shape[0])
    if _use_pallas(corpus_q.shape[0], recall_target):
        # 1+2+3+5a in ONE Pallas program: scan + filters + threshold +
        # pre-reduced candidates; the [B, N] score matrix never touches HBM
        # (round-1 VERDICT item 4). Approximate at the stride-family level,
        # like approx_max_k — hence gated on recall_target < 1.
        sem_v, sem_i = pallas_fused_topk(
            q8, q_scale, corpus_q, corpus_scale, chunk_court, chunk_date,
            court_table, date_lo, date_hi, min_similarity, k=ksem,
            use_court=use_court, use_date=use_date,
        )
        sem_i = jnp.maximum(sem_i, 0)
        lex_v, lex_chunk, lex_src = lexical_side_list(
            trie_rows, trie_src, trie_chunk_of_case, chunk_court, chunk_date,
            court_table, date_lo, date_hi, exact_weight,
        )
        return merge_dedup_topk(
            sem_v, sem_i, lex_v, lex_chunk, lex_src, chunk_case, k
        )
    acc = jnp.einsum("bd,nd->bn", q8, corpus_q, preferred_element_type=jnp.int32)
    scores = acc.astype(jnp.float32) * q_scale * corpus_scale.reshape(1, -1)

    # 2+3) one fused mask pass: metadata filters + similarity threshold.
    # court filter: gather over the shared 1-D chunk_court index (a [B, N]
    # take_along_axis with a materialised [B, N] index matrix, or a [B, N]
    # scatter for the boost, each cost ~100x more on TPU — measured).
    keep = scores >= min_similarity[:, None]
    if use_court:
        keep = keep & jnp.take(court_table, chunk_court, axis=1)  # [B, N]
    if use_date:
        keep = keep & (
            (chunk_date[None, :] >= date_lo[:, None])
            & (chunk_date[None, :] <= date_hi[:, None])
        )
    scores = jnp.where(keep, scores, -jnp.inf)

    # 5a) over-fetched semantic top-k (approx_max_k — the TPU-KNN partial
    # reduction — when recall_target < 1; the merge below stays exact)
    if recall_target >= 1.0:
        sem_v, sem_i = exact_topk(scores, ksem)
    else:
        sem_v, sem_i = fast_topk(scores, ksem, recall_target)

    # 4) lexical boost as a filter-checked side list
    lex_v, lex_chunk, lex_src = lexical_side_list(
        trie_rows, trie_src, trie_chunk_of_case, chunk_court, chunk_date,
        court_table, date_lo, date_hi, exact_weight,
    )

    # 5b) merge + device dedup-by-case + final top-k
    return merge_dedup_topk(
        sem_v, sem_i, lex_v, lex_chunk, lex_src, chunk_case, k
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "overfetch", "num_chunks", "recall_target", "use_court",
        "use_date",
    ),
)
def fused_hybrid_topk_chunked(
    query_emb: jax.Array,  # [B, D] f32, L2-normalised
    corpus_q: jax.Array,  # [N, D] int8 chunk embeddings
    corpus_scale: jax.Array,  # [N, 1] f32
    chunk_case: jax.Array,  # [N] int32
    chunk_court: jax.Array,  # [N] int32
    chunk_date: jax.Array,  # [N] int32
    court_table: jax.Array,  # [B, V] bool
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    trie_rows: jax.Array,  # [B, R] int32
    trie_src: jax.Array,  # [B, R] int32
    trie_chunk_of_case: jax.Array,  # [C] int32
    min_similarity: jax.Array,  # [B] f32
    exact_weight: jax.Array,  # [B] f32
    k: int,
    overfetch: int = 4,
    num_chunks: int = 16,
    recall_target: float = 1.0,
    use_court: bool = True,
    use_date: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """CAP-scale brute fused step: identical semantics to
    :func:`fused_hybrid_topk` but the corpus scan runs as a ``lax.scan``
    over ``num_chunks`` corpus slabs with a running top-k merge, so the
    working set is ``O(B·N/num_chunks)`` instead of a materialised
    ``[B, N]`` score matrix (8.6 GB at B=256, N=8.4M — past HBM). Exact
    when ``recall_target >= 1``: every slab keeps ``k·overfetch``
    candidates before the merge. With ``recall_target < 1`` on TPU each
    slab runs the Pallas fused scan instead (stride-family approximate,
    and the per-slab score matrix never touches HBM at all).

    N must divide by ``num_chunks`` (pad the corpus; pad rows carry zero
    scales and court id 0 with date ``MISSING_DATE`` — or pass a divisible
    N, as the engine's layouts do).
    """
    B = query_emb.shape[0]
    N = corpus_q.shape[0]
    q8, q_scale = quantize_queries(query_emb)
    ksem = min(max(k * max(1, overfetch), k), N)
    if N % num_chunks or (N // num_chunks) < ksem:
        # degenerate sizes: fall back to the one-shot program
        return fused_hybrid_topk(
            query_emb, corpus_q, corpus_scale, chunk_case, chunk_court,
            chunk_date, court_table, date_lo, date_hi, trie_rows, trie_src,
            trie_chunk_of_case, min_similarity, exact_weight,
            k=k, overfetch=overfetch, recall_target=recall_target,
            use_court=use_court, use_date=use_date,
        )
    sem_v, sem_i = _chunked_semantic_scan(
        q8, q_scale, corpus_q, corpus_scale, chunk_court, chunk_date,
        court_table, date_lo, date_hi, min_similarity, ksem=ksem,
        num_chunks=num_chunks, recall_target=recall_target,
        use_court=use_court, use_date=use_date,
    )
    sem_i = jnp.maximum(sem_i, 0)

    lex_v, lex_chunk, lex_src = lexical_side_list(
        trie_rows, trie_src, trie_chunk_of_case, chunk_court, chunk_date,
        court_table, date_lo, date_hi, exact_weight,
    )
    return merge_dedup_topk(
        sem_v, sem_i, lex_v, lex_chunk, lex_src, chunk_case, k
    )


def _chunked_semantic_scan(
    q8: jax.Array,  # [B, D] int8 quantised queries
    q_scale: jax.Array,  # [B, 1] f32
    corpus_q: jax.Array,  # [N, D] int8 (N % num_chunks == 0)
    corpus_scale: jax.Array,  # [N, 1] f32
    chunk_court: jax.Array,  # [N] int32
    chunk_date: jax.Array,  # [N] int32
    court_table: jax.Array,  # [B, V] bool
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    min_similarity: jax.Array,  # [B] f32
    ksem: int,
    num_chunks: int,
    recall_target: float,
    use_court: bool,
    use_date: bool,
) -> tuple[jax.Array, jax.Array]:
    """Slab-streamed semantic candidate stage shared by the chunked brute
    program and the layout-brute program: ``lax.scan`` over ``num_chunks``
    corpus slabs with a running ``[B, ksem]`` top-k merge (each slab the
    Pallas fused scan on TPU when ``recall_target < 1``, the exact masked
    einsum otherwise). Returns ``(values, indices)`` into ``corpus_q``'s
    row space; dead slots ``(-inf, -1)``."""
    B = q8.shape[0]
    N = corpus_q.shape[0]
    S = N // num_chunks

    slab_pallas = _use_pallas(S, recall_target)

    def step(carry, xs):
        best_v, best_i = carry
        slab_q, slab_s, slab_court, slab_date, base = xs
        if slab_pallas:
            v, i = pallas_fused_topk(
                q8, q_scale, slab_q, slab_s, slab_court, slab_date,
                court_table, date_lo, date_hi, min_similarity, k=ksem,
                use_court=use_court, use_date=use_date,
            )
            i = jnp.maximum(i, 0)
            if v.shape[1] < ksem:
                # the kernel returns at most n_keep*lanes candidates; pad
                # to the carried width so the merge stack shapes agree
                # (parity with fused_partitioned_topk's step)
                pad = ksem - v.shape[1]
                v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=-jnp.inf)
                i = jnp.pad(i, ((0, 0), (0, pad)))
        else:
            acc = jnp.einsum("bd,nd->bn", q8, slab_q,
                             preferred_element_type=jnp.int32)
            scores = acc.astype(jnp.float32) * q_scale * slab_s.reshape(1, -1)
            keep = scores >= min_similarity[:, None]
            if use_court:
                keep = keep & jnp.take(court_table, slab_court, axis=1)
            if use_date:
                keep = keep & (
                    (slab_date[None, :] >= date_lo[:, None])
                    & (slab_date[None, :] <= date_hi[:, None])
                )
            scores = jnp.where(keep, scores, -jnp.inf)
            v, i = exact_topk(scores, ksem)
        gi = i.astype(jnp.int32) + base
        nv, ni = merge_topk(
            jnp.stack([best_v, v], axis=1), jnp.stack([best_i, gi], axis=1),
            ksem,
        )
        return (nv, ni), None

    init = (
        jnp.full((B, ksem), -jnp.inf, jnp.float32),
        jnp.full((B, ksem), -1, jnp.int32),
    )
    xs = (
        corpus_q.reshape(num_chunks, S, -1),
        corpus_scale.reshape(num_chunks, S, 1),
        chunk_court.reshape(num_chunks, S),
        chunk_date.reshape(num_chunks, S),
        jnp.arange(num_chunks, dtype=jnp.int32) * S,
    )
    (sem_v, sem_i), _ = jax.lax.scan(step, init, xs)
    return sem_v, sem_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "overfetch", "num_chunks", "recall_target", "use_court",
        "use_date", "use_gather_kernel", "gather_interpret",
    ),
)
def fused_layout_brute_topk(
    query_emb: jax.Array,  # [B, D] f32, L2-normalised
    part_rows: jax.Array,  # [P, m] int32 global chunk row per slot (-1 pad)
    part_int8: jax.Array,  # [P, m, D] int8 partitioned chunk embeddings
    part_scale: jax.Array,  # [P, m] f32 per-slot scales (0 on pads)
    corpus_bf16,  # [N, D] bf16 rescore copy / tuple of row segments (None: skip)
    slot_court: jax.Array,  # [P, m] int32 court id per slot (-1 pad)
    slot_date: jax.Array,  # [P, m] int32 decision date per slot (min pad)
    chunk_case: jax.Array,  # [N] int32 chunk row → case row (global space)
    chunk_court: jax.Array,  # [N] int32 (lexical side-list checks)
    chunk_date: jax.Array,  # [N] int32
    court_table: jax.Array,  # [B, V] bool
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    trie_rows: jax.Array,  # [B, R] int32
    trie_src: jax.Array,  # [B, R] int32
    trie_chunk_of_case: jax.Array,  # [C] int32 (global chunk space)
    min_similarity: jax.Array,  # [B] f32
    exact_weight: jax.Array,  # [B] f32
    k: int,
    overfetch: int = 4,
    num_chunks: int = 16,
    recall_target: float = 1.0,
    use_court: bool = True,
    use_date: bool = True,
    use_gather_kernel: bool = False,
    gather_interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Large-batch serving mode over the PartitionedANN's OWN device
    blocks: reshape the ``[P, m, D]`` slot-major layout into a flat corpus
    and stream it once per ≤TILE_B-query tile through the chunked fused
    scan — no extra corpus copy in HBM, and no per-(query, probe) DMAs.

    Break-even vs :func:`fused_partitioned_topk` (measured, v5e): the
    probe path reads ``B·nprobe·m`` rows per batch at ~3.8 µs/probe-step
    (capscale_partitioned_8M), the full fused scan reads ``P·m`` rows once
    per 256-query tile at ~2.3x the HBM floor (capscale_brute_8M_pallas:
    9.03 ms for 8.4M rows at B=256). At B=256/nprobe=64/P=5120 the probe
    path reads 3.2x the corpus and loses 7x — the engine picks per batch
    with ``B·nprobe >= P·ceil(B/TILE_B)``.

    Slot→global-row mapping happens IN-program before the candidate
    reduction, so score ties still break to the lower global row id (the
    repo determinism invariant) even with pad-replica layouts where a row
    occupies two slots (duplicate candidates collapse in the dedup-by-case
    stage, exactly like same-case chunks). Pad slots (``part_rows < 0``)
    are masked to ``-inf`` after the scan regardless of filter state.
    Candidates rescore at bf16 full precision when ``corpus_bf16`` exists
    (parity with the probe path's rescore stage).

    Returns ``(scores, chunk_idx, case_rows, src)`` each ``[B, k]`` in
    GLOBAL row space — the same contract as :func:`fused_partitioned_topk`.
    """
    qn = query_emb.astype(jnp.float32)
    ksem = min(max(k * max(1, overfetch), k),
               int(part_int8.shape[0]) * int(part_int8.shape[1]))
    sem_v, sem_rows = layout_brute_semantic_topk(
        qn, part_rows, part_int8, part_scale, corpus_bf16,
        slot_court, slot_date, court_table, date_lo, date_hi,
        min_similarity, ksem=ksem, num_chunks=num_chunks,
        recall_target=recall_target, use_court=use_court,
        use_date=use_date, use_gather_kernel=use_gather_kernel,
        gather_interpret=gather_interpret,
    )
    sem_rows = jnp.maximum(sem_rows, 0)

    lex_v, lex_chunk, lex_src = lexical_side_list(
        trie_rows, trie_src, trie_chunk_of_case, chunk_court, chunk_date,
        court_table, date_lo, date_hi, exact_weight,
    )
    return merge_dedup_topk(
        sem_v, sem_rows, lex_v, lex_chunk, lex_src, chunk_case, k
    )


def layout_brute_semantic_topk(
    qn: jax.Array,  # [B, D] f32, L2-normalised
    part_rows: jax.Array,  # [P, m] int32 row per slot (-1 pad)
    part_int8: jax.Array,  # [P, m, D] int8
    part_scale: jax.Array,  # [P, m] f32 (0 on pads)
    corpus_bf16,  # [N, D] bf16 rescore copy / tuple of segments (None: skip)
    slot_court: jax.Array,  # [P, m] int32 (-1 pad)
    slot_date: jax.Array,  # [P, m] int32 (min pad)
    court_table: jax.Array,  # [B, V] bool
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    min_similarity: jax.Array,  # [B] f32
    ksem: int,
    num_chunks: int = 0,  # 0 → pick by working set
    recall_target: float = 1.0,
    use_court: bool = True,
    use_date: bool = True,
    use_gather_kernel: bool = False,
    gather_interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Large-batch semantic candidate stage over the slot-major partition
    layout: fused slab stream → slot→row map → optional bf16 rescore →
    composite (score, row) top-``ksem``. Shared by the single-chip program
    (:func:`fused_layout_brute_topk`) and the sharded serving path, where
    ``part_rows`` hold shard-local rows and ``corpus_bf16`` is the shard's
    row slice — the multi-chip path runs the SAME stage per shard and
    merges over ICI. Returns ``(values, rows) [B, ksem]`` sorted desc,
    dead slots ``(-inf, -1)``; ``rows`` index ``part_rows``'s row space."""
    P_, m_, D = part_int8.shape
    N2 = int(P_) * int(m_)
    q8, q_scale = quantize_queries(qn)
    ksem = min(ksem, N2)
    nc = num_chunks or pick_num_chunks(N2, int(qn.shape[0]), ksem)
    if N2 % nc or N2 // nc < ksem:
        nc = 1
    sem_v, sem_slot = _chunked_semantic_scan(
        q8, q_scale,
        part_int8.reshape(N2, D),
        part_scale.reshape(N2, 1),
        slot_court.reshape(N2),
        slot_date.reshape(N2),
        court_table, date_lo, date_hi, min_similarity,
        ksem=ksem, num_chunks=nc, recall_target=recall_target,
        use_court=use_court, use_date=use_date,
    )
    # slot → row BEFORE the candidate reduction: pad slots (row -1) die
    # here, replica slots collapse onto their row, and the composite
    # (score, row) key restores the lower-row-id tie-break that slot order
    # (replicas live anywhere) cannot guarantee
    rows = jnp.take(part_rows.reshape(N2), jnp.maximum(sem_slot, 0))
    sem_v = jnp.where((sem_slot >= 0) & (rows >= 0), sem_v, -jnp.inf)
    if corpus_bf16 is not None:
        # bf16 full-precision rescore of the carried candidates (parity
        # with partitioned_semantic_topk step 4 — int8 candidate order is
        # approximate for f32 corpora); threshold re-checked at full
        # precision like the staged path
        safe_rows = jnp.maximum(rows, 0)
        if use_gather_kernel:
            from .pallas_scan import pallas_gather_rescore

            re = pallas_gather_rescore(
                qn, corpus_bf16, safe_rows, interpret=gather_interpret
            )
        else:
            re = gather_rescore(qn, corpus_bf16, safe_rows)
        sem_v = jnp.where(
            jnp.isfinite(sem_v) & (re >= min_similarity[:, None]),
            re, -jnp.inf,
        )
    return topk_by_score_then_row(sem_v, rows.astype(jnp.int32), ksem)


#: Brute-mode working-set bound: when one [B, N] f32 score matrix would
#: exceed this, callers serve through the chunked slab program (lax.scan,
#: bounded working set) instead of the one-shot program.
_CHUNKED_WORKSET_BYTES = 256 * 1024 * 1024
#: minimum corpus rows per slab in the chunked program (a slab still wants
#: a full MXU matmul's worth of work)
_SLAB_MIN_ROWS = 65_536


def pick_num_chunks(n_rows: int, batch: int, k_fetch: int) -> int:
    """Slab count for the chunked brute programs: smallest power of two
    keeping one slab's [B, S] f32 score working set under the brute-mode
    bound (exact-mode XLA path; the Pallas slab path never materialises
    it but shares the slab walk)."""
    num_chunks = 1
    if 4 * batch * n_rows > _CHUNKED_WORKSET_BYTES:
        while (
            n_rows % (num_chunks * 2) == 0
            and n_rows // (num_chunks * 2) >= max(_SLAB_MIN_ROWS, k_fetch)
            and 4 * batch * (n_rows // num_chunks) > _CHUNKED_WORKSET_BYTES
        ):
            num_chunks *= 2
    return num_chunks


def resolve_probe_kernel(
    recall_target: float, m: int, dim: int = 384
) -> tuple[bool, bool]:
    """Host-side resolution of the probe-kernel choice for
    :func:`fused_partitioned_topk` — returns ``(use_probe_kernel,
    probe_interpret)``. Callers resolve this OUTSIDE the jitted step and
    pass the results as static arguments so the trace cache keys on them
    (env var / backend changes after the first trace are not silently
    ignored). ``TSS_PROBE_INTERPRET=1`` forces the kernel in Pallas
    interpret mode on any backend — lets the FULL glue path (slot→row
    mapping, rescore, merge) run under the CPU test mesh."""
    probe_interpret = os.environ.get("TSS_PROBE_INTERPRET") == "1"
    use_probe_kernel = (
        recall_target < 1.0
        and m % 128 == 0
        # Mosaic DMA slices along the feature axis must be 128-lane
        # aligned when COMPILED (the gather-rescore kernel slices [A, D]
        # groups out of the padded bf16 store; D=384 serves). Interpret
        # mode has no alignment constraint — tests at tiny dims keep
        # exercising the kernel's logic.
        and (dim % 128 == 0 or probe_interpret)
        and (jax.default_backend() == "tpu" or probe_interpret)
    )
    return use_probe_kernel, probe_interpret


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "overfetch", "rescore_factor", "recall_target",
        "use_probe_kernel", "probe_interpret",
    ),
)
def fused_partitioned_topk(
    query_emb: jax.Array,  # [B, D] f32, L2-normalised
    centroids: jax.Array,  # [P, D] f32 partition centroids
    part_rows: jax.Array,  # [P, m] int32 chunk row per slot (-1 pad)
    part_int8: jax.Array,  # [P, m, D] int8 partitioned chunk embeddings
    part_scale: jax.Array,  # [P, m] f32 per-row scales (0 on pads)
    corpus_bf16,  # [N, D] bf16 rescore copy or tuple of row segments (None: skip)
    chunk_case: jax.Array,  # [N] int32
    chunk_court: jax.Array,  # [N] int32
    chunk_date: jax.Array,  # [N] int32
    court_table: jax.Array,  # [B, V] bool
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    trie_rows: jax.Array,  # [B, R] int32
    trie_src: jax.Array,  # [B, R] int32
    trie_chunk_of_case: jax.Array,  # [C] int32
    min_similarity: jax.Array,  # [B] f32
    exact_weight: jax.Array,  # [B] f32
    k: int,
    nprobe: int,
    overfetch: int = 4,
    rescore_factor: int = 4,
    recall_target: float = 1.0,
    part_cword: Optional[jax.Array] = None,  # [P, m] int32 (see below)
    part_cbit: Optional[jax.Array] = None,  # [P, m] uint32
    part_date: Optional[jax.Array] = None,  # [P, m] int32
    use_probe_kernel: Optional[bool] = None,  # static; None → resolve now
    probe_interpret: Optional[bool] = None,  # static; None → resolve now
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """CAP-scale fused step: partitioned-ANN probe + filtered scan + bf16
    rescore + lexical boost + dedup-by-case + top-k in ONE program
    (round-1 VERDICT item 2; combines index/ann.py's probe scan with the
    device filters so >10k QPS/chip holds at corpus sizes where a brute
    scan cannot).

    Work per query: ``P·D`` centroid flops + ``nprobe·m·D`` int8 flops +
    gathers of ``nprobe·m`` filter-column entries — independent of N.
    Returns ``(scores, chunk_idx, case_rows, src)`` like
    :func:`fused_hybrid_topk` (semantic part approximate at the probe
    level, exactly like the staged PartitionedANN path).

    On TPU with ``recall_target < 1`` and partition-major filter columns
    (``part_cword/cbit/date`` — precompute once per corpus with
    ``ops.pallas_scan.partition_filter_columns``; passing ``None`` derives
    them in-program, an N-sized gather per call), the probe scan runs as
    the scalar-prefetch Pallas kernel: the pipeline DMAs exactly the
    probed blocks instead of XLA's copying gather (measured ~400 ms →
    ~HBM-bound for B=16, nprobe=32 at 8.4M rows).
    """
    qn = query_emb.astype(jnp.float32)
    m = part_rows.shape[1]
    np_eff = min(nprobe, centroids.shape[0])
    ksem = min(max(k * max(1, overfetch), k), np_eff * m)
    W = min(ksem * max(1, rescore_factor), np_eff * m)  # carried candidates

    # Kernel choice is a STATIC argument resolved by the caller (the env
    # var / backend must be part of the jit cache key — ADVICE r2). The
    # None default resolves here for ad-hoc callers, but happens at trace
    # time only, so long-lived callers should pass explicit values.
    if use_probe_kernel is None or probe_interpret is None:
        _upk, _pi = resolve_probe_kernel(
            recall_target, m, int(part_int8.shape[-1]))
        use_probe_kernel = _upk if use_probe_kernel is None else use_probe_kernel
        probe_interpret = _pi if probe_interpret is None else probe_interpret
    # the [B, nprobe] probed-id scalar prefetch lives in SMEM (1 MB on
    # v5e); oversized (batch x breadth) shapes demote to the XLA gather
    # path instead of failing to compile. B is a static shape here, so
    # the demotion is part of the trace cache key.
    if int(qn.shape[0]) * np_eff * 4 > 768 * 1024:
        use_probe_kernel = False

    sem_v, sem_chunk = partitioned_semantic_topk(
        qn, centroids, part_rows, part_int8, part_scale, corpus_bf16,
        chunk_court, chunk_date, court_table, date_lo, date_hi,
        min_similarity, ksem=min(ksem, W), W=W, np_eff=np_eff,
        use_probe_kernel=use_probe_kernel, probe_interpret=probe_interpret,
        part_cword=part_cword, part_cbit=part_cbit, part_date=part_date,
    )
    sem_chunk = jnp.maximum(sem_chunk, 0).astype(jnp.int32)

    # 6) lexical side list + merge + dedup + final top-k
    lex_v, lex_chunk, lex_src = lexical_side_list(
        trie_rows, trie_src, trie_chunk_of_case, chunk_court, chunk_date,
        court_table, date_lo, date_hi, exact_weight,
    )
    return merge_dedup_topk(
        sem_v, sem_chunk, lex_v, lex_chunk, lex_src, chunk_case, k
    )


def partitioned_semantic_topk(
    qn: jax.Array,  # [B, D] f32, L2-normalised queries
    centroids: jax.Array,  # [P, D] f32
    part_rows: jax.Array,  # [P, m] int32 chunk row per slot (-1 pad)
    part_int8: jax.Array,  # [P, m, D] int8
    part_scale: jax.Array,  # [P, m] f32 (0 on pads)
    corpus_bf16,  # [N, D] bf16 rescore copy or tuple of row segments (None: skip)
    chunk_court: Optional[jax.Array],  # [N] int32 (only to derive part cols)
    chunk_date: Optional[jax.Array],  # [N] int32
    court_table: jax.Array,  # [B, V] bool
    date_lo: jax.Array,  # [B] int32
    date_hi: jax.Array,  # [B] int32
    min_similarity: jax.Array,  # [B] f32
    ksem: int,
    W: int,
    np_eff: int,
    use_probe_kernel: bool,
    probe_interpret: bool,
    part_cword: Optional[jax.Array] = None,
    part_cbit: Optional[jax.Array] = None,
    part_date: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Partitioned-ANN semantic candidate stage: probe → filtered scan of
    the probed blocks → bf16 rescore → top-``ksem``. Returns ``(values
    [B, ksem], rows [B, ksem])`` with dead slots ``(-inf, -1)``.

    Shared by the single-chip fused program and the sharded serving path
    (:func:`..parallel.collectives.sharded_partitioned_topk`, where the
    partition arrays are shard-local — VERDICT r2 item 1: the multi-chip
    path runs the SAME probe kernel as single-chip). Traced inline by its
    (jitted) callers; ``rows`` index whatever row space ``part_rows`` uses
    (global on one chip, shard-local under shard_map). Filters apply via
    the partition-major slot columns (``part_cword/cbit/date`` — derived
    from the chunk columns when absent, an N-sized gather per trace).
    """
    from .pallas_scan import pack_court_words, pallas_probe_candidates

    B = qn.shape[0]
    m = part_rows.shape[1]
    # 1) probe partitions
    cs = jnp.einsum("bd,pd->bp", qn, centroids,
                    preferred_element_type=jnp.float32)
    _, top_p = exact_topk(cs, np_eff)  # [B, np]
    q8, q_scale = quantize_queries(qn)

    if part_cword is None or part_cbit is None or part_date is None:
        safe = jnp.maximum(part_rows, 0)
        pc = jnp.take(chunk_court, safe)
        part_cword = jnp.where(part_rows >= 0, pc // 32, -1)
        part_cbit = jnp.uint32(1) << (pc.astype(jnp.uint32) % 32)
        part_date = jnp.where(
            part_rows >= 0, jnp.take(chunk_date, safe), -(2**31)
        )
    qwords = pack_court_words(court_table)  # [B, Wc] uint32

    # 2+3) scan the probed blocks: the kernel path DMAs exactly the probed
    # [m, D] int8 blocks via scalar prefetch; the XLA path lax.scans over
    # probe ranks, gathering ONE probed block per query per step ([B, m, D]
    # — bounded working set regardless of corpus size).
    if use_probe_kernel:
        kc_v, kc_s = pallas_probe_candidates(
            q8, q_scale, top_p, part_int8, part_scale, part_rows,
            part_cword, part_cbit, part_date, qwords, date_lo, date_hi,
            min_similarity, interpret=probe_interpret,
        )
        lanes_n = kc_v.shape[1] // np_eff
        rows3 = part_rows[
            top_p[:, :, None], kc_s.reshape(B, np_eff, lanes_n)
        ]
        # composite-key reduction: kernel candidates are (probe, lane)-
        # ordered, so break score ties on the row id (determinism
        # invariant), not on slot position
        cand_v, cand_rows = topk_by_score_then_row(
            kc_v, rows3.reshape(B, -1), min(W, kc_v.shape[1])
        )
    else:

        def step(carry, probe_col):  # probe_col: [B] partition id per query
            best_v, best_r = carry
            rows = jnp.take(part_rows, probe_col, axis=0)  # [B, m]
            blocks = jnp.take(part_int8, probe_col, axis=0)  # [B, m, D]
            scales = jnp.take(part_scale, probe_col, axis=0)  # [B, m]
            acc = jnp.einsum("bd,bmd->bm", q8, blocks,
                             preferred_element_type=jnp.int32)
            scores = acc.astype(jnp.float32) * scales * q_scale
            # court filter through the packed bitmask words (identical to
            # a table lookup by court id: word c//32, bit c%32) — the
            # slot columns carry word/bit, not the raw id
            cw = jnp.take(part_cword, probe_col, axis=0)  # [B, m]
            cb = jnp.take(part_cbit, probe_col, axis=0)
            qw = jnp.take_along_axis(
                qwords, jnp.clip(cw, 0, qwords.shape[1] - 1), axis=1
            )
            court_ok = ((qw & cb) != 0) & (cw >= 0)
            dts = jnp.take(part_date, probe_col, axis=0)
            date_ok = (dts >= date_lo[:, None]) & (dts <= date_hi[:, None])
            keep = (
                (rows >= 0) & court_ok & date_ok
                & (scores >= min_similarity[:, None])
            )
            scores = jnp.where(keep, scores, -jnp.inf)
            v, i = exact_topk(scores, min(W, m))
            r = jnp.take_along_axis(rows, i, axis=1)
            nv, nr = merge_topk(
                jnp.stack(
                    [best_v, jnp.pad(v, ((0, 0), (0, W - v.shape[1])),
                                     constant_values=-jnp.inf)], axis=1),
                jnp.stack(
                    [best_r, jnp.pad(r, ((0, 0), (0, W - r.shape[1])),
                                     constant_values=-1)], axis=1),
                W,
            )
            return (nv, nr), None

        init = (
            jnp.full((B, W), -jnp.inf, jnp.float32),
            jnp.full((B, W), -1, part_rows.dtype),
        )
        (cand_v, cand_rows), _ = jax.lax.scan(
            step, init, jnp.moveaxis(top_p, 0, 1)
        )

    # 4) full-precision bf16 rescore of the carried candidates (skipped
    # when no rescore copy exists — int8 scores are already exact-ordered
    # for int8 data)
    safe_rows = jnp.maximum(cand_rows, 0)
    if corpus_bf16 is not None:
        if use_probe_kernel:
            # scalar-prefetch gather rescore: DMA exactly the B·C rows
            # (XLA's take lowers to a full-corpus pass — ~124 ms at 8.4M
            # rows, the round-2 latency-regime ceiling)
            from .pallas_scan import pallas_gather_rescore

            re = pallas_gather_rescore(
                qn, corpus_bf16, safe_rows, interpret=probe_interpret
            )
        else:
            re = gather_rescore(qn, corpus_bf16, safe_rows)
        # rescored values keep the int8-pass masks (filters/threshold/pads)
        # and re-check the similarity threshold at full precision (parity
        # with the staged path, which thresholds the rescored ANN output)
        re = jnp.where(
            jnp.isfinite(cand_v) & (re >= min_similarity[:, None]),
            re, -jnp.inf,
        )
    else:
        re = cand_v
    return topk_by_score_then_row(
        re, cand_rows.astype(jnp.int32), min(ksem, W)
    )
