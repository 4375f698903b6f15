"""On-chip top-k primitives.

The reference's ANN stage was a stubbed HNSW (``/root/reference/src/
vector.rs:184-208``). On TPU the equivalent hot op is *scored reduction*:
given ``[B, N]`` similarity scores, return the top-k per row at near-peak
throughput (SURVEY.md §7 "On-chip top-k at >10k QPS: avoid full sorts").

Strategies:
  * :func:`exact_topk` — ``jax.lax.top_k`` (deterministic: ties break to the
    lower index, satisfying the reference's determinism promise,
    README.md:16,190).
  * :func:`fast_topk` — ``jax.lax.approx_max_k``, XLA's TPU-native partial
    reduction (the TPU-KNN / PAPERS.md "peak FLOP/s" algorithm) with a
    configurable recall target, falling back to exact on CPU.
  * :func:`merge_topk` — k-way merge of per-shard top-k (used after
    ``all_gather`` in the multi-chip path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def exact_topk(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact per-row top-k. ``scores: [..., N] → (values, indices) [..., k]``."""
    k = min(k, scores.shape[-1])
    return jax.lax.top_k(scores, k)


def fast_topk(
    scores: jax.Array, k: int, recall_target: float = 0.95
) -> tuple[jax.Array, jax.Array]:
    """TPU-native approximate top-k (``approx_max_k``).

    On TPU this compiles to the two-phase partial-reduction kernel from the
    TPU-KNN paper (arXiv:2206.14286) and runs at ~peak memory bandwidth; on
    CPU backends XLA lowers it to an exact variant, so tests are exact.
    ``recall_target=1.0`` forces the exact reduction on all backends.
    """
    k = min(k, scores.shape[-1])
    if recall_target >= 1.0:
        return jax.lax.top_k(scores, k)
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


def topk_by_score_then_row(
    values: jax.Array,  # [..., M] candidate scores
    rows: jax.Array,  # [..., M] global row id per candidate
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-k by score desc with ties broken to the LOWER row id — the repo
    determinism invariant — independent of candidate *position* order.

    ``jax.lax.top_k`` breaks ties by position, which matches the invariant
    only when candidates are laid out in row order; kernel outputs are
    lane/slot-ordered, so the final reduction sorts on the composite key
    ``(-value, row)`` instead (one lexicographic ``lax.sort`` over the few
    hundred carried candidates — negligible next to the scan).
    """
    k = min(k, values.shape[-1])
    neg_v, srt_rows = jax.lax.sort(
        (-values, rows), num_keys=2, dimension=-1
    )
    return -neg_v[..., :k], srt_rows[..., :k]


def merge_topk(
    values: jax.Array,  # [..., S, k] per-shard top-k values
    indices: jax.Array,  # [..., S, k] per-shard *global* indices
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge S per-shard top-k lists into a global top-k.

    Inputs carry global indices (shard-local index + shard offset, applied
    by the caller). Flattens the shard axis and re-selects: O(S·k) work,
    exact, deterministic.
    """
    flat_v = values.reshape(*values.shape[:-2], -1)
    flat_i = indices.reshape(*indices.shape[:-2], -1)
    k = min(k, flat_v.shape[-1])
    top_v, pos = jax.lax.top_k(flat_v, k)
    top_i = jnp.take_along_axis(flat_i, pos, axis=-1)
    return top_v, top_i


@functools.partial(jax.jit, static_argnames=("k", "num_chunks"))
def chunked_topk(
    scores: jax.Array, k: int, num_chunks: int = 8
) -> tuple[jax.Array, jax.Array]:
    """Two-stage exact top-k: chunk-local ``top_k`` then merge.

    For very large N this bounds the working set per reduction and lets XLA
    overlap chunk reductions; exact because every chunk keeps k candidates.
    """
    B, N = scores.shape
    if N % num_chunks != 0 or N // num_chunks < k:
        return exact_topk(scores, k)
    C = N // num_chunks
    s = scores.reshape(B, num_chunks, C)
    v, i = jax.lax.top_k(s, k)  # [B, S, k] local
    offsets = (jnp.arange(num_chunks, dtype=i.dtype) * C)[None, :, None]
    return merge_topk(v, i + offsets, k)


def segment_max_dedup(
    values: jax.Array,  # [B, M] candidate scores
    segment_ids: jax.Array,  # [B, M] int case-id per candidate (-1 = invalid)
    num_segments_pad: int,
) -> jax.Array:
    """Keep only each segment's max-scoring candidate (device-side dedup by
    case id, SURVEY.md §7 "Dedup-by-case on device").

    Returns ``values`` with non-max duplicates replaced by ``-inf``. Works on
    padded dense ids: ``segment_ids`` must be < ``num_segments_pad``;
    negatives are masked out.
    """
    B, M = values.shape
    valid = segment_ids >= 0
    safe_ids = jnp.where(valid, segment_ids, 0)
    masked_vals = jnp.where(valid, values, -jnp.inf)

    # Per-row segment max via scatter-max into a dense [B, P] table.
    seg_max = jnp.full((B, num_segments_pad), -jnp.inf, values.dtype)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M))
    seg_max = seg_max.at[b_idx, safe_ids].max(masked_vals)
    is_seg_max = masked_vals >= seg_max[b_idx, safe_ids]

    # Among equal-valued duplicates keep the lowest candidate position.
    pos = jnp.broadcast_to(jnp.arange(M)[None, :], (B, M))
    first_pos = jnp.full((B, num_segments_pad), M, jnp.int32)
    pos_of_max = jnp.where(is_seg_max & valid, pos, M)
    first_pos = first_pos.at[b_idx, safe_ids].min(pos_of_max)
    keep = valid & is_seg_max & (pos == first_pos[b_idx, safe_ids])
    return jnp.where(keep, values, -jnp.inf)
