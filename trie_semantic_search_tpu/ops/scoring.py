"""Dense similarity scoring: the MXU hot path.

Replaces the reference's stubbed HNSW distance computations
(``/root/reference/src/vector.rs:184-208``) with what the TPU is built for:
cosine similarity as a single large matmul over a frozen corpus matrix,
fused (by XLA) with masking/top-k.

Score layouts:
  * **bf16 corpus** ``[N, D]`` — full-precision path, 2 bytes/dim.
  * **int8 corpus + f32 row scales** — half the HBM traffic of bf16; scores
    are rescaled on the fly, survivors can be rescored in f32 (handled by
    the ANN layer). Matches "equal memory" accounting vs HNSW's f32+links.

All functions are shape-static and jit-safe; they accept any leading batch
shape for queries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .topk import exact_topk, fast_topk


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def quantize_int8(
    vectors: np.ndarray | jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantisation: ``v ≈ q * scale``.

    Returns ``(q: int8 [N, D], scale: f32 [N, 1])``.
    """
    v = jnp.asarray(vectors, jnp.float32)
    absmax = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(v / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def cosine_scores(
    queries: jax.Array,  # [B, D] (assumed L2-normalised)
    corpus: jax.Array,  # [N, D] bf16/f32 (assumed L2-normalised)
) -> jax.Array:
    """``[B, N]`` cosine similarity via one MXU matmul (f32 accumulation)."""
    return jnp.einsum(
        "bd,nd->bn",
        queries.astype(corpus.dtype),
        corpus,
        preferred_element_type=jnp.float32,
    )


def cosine_scores_int8(
    queries: jax.Array,  # [B, D] f32, L2-normalised
    corpus_q: jax.Array,  # [N, D] int8
    corpus_scale: jax.Array,  # [N, 1] f32
) -> jax.Array:
    """``[B, N]`` approximate cosine from an int8 corpus.

    Queries are quantised per-row to int8 too, so the inner product runs as
    an int8×int8 matmul (int32 accumulation — native on the MXU), then both
    scales are applied.
    """
    q_abs = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
    q_scale = jnp.maximum(q_abs, 1e-12) / 127.0
    q_int = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)
    acc = jnp.einsum(
        "bd,nd->bn", q_int, corpus_q, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    return acc * q_scale * corpus_scale.reshape(1, -1)


def brute_force_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """BASELINE config 3: brute-force cosine top-k over the full corpus.

    One fused matmul + top-k; ``recall_target < 1`` switches the reduction
    to the TPU-native ``approx_max_k`` partial reduce.
    """
    scores = cosine_scores(queries, corpus)
    if recall_target >= 1.0:
        return exact_topk(scores, k)
    return fast_topk(scores, k, recall_target)


def gather_rescore(
    queries: jax.Array,  # [B, D] f32
    corpus_f32: jax.Array,  # [N, D] f32/bf16 full-precision corpus
    candidate_idx: jax.Array,  # [B, C] int32 candidate rows
) -> jax.Array:
    """Re-score candidate rows in full precision (ANN rescoring stage).

    Gather keeps ``[B, C, D]`` in VMEM-sized tiles; returns ``[B, C]``.
    ``corpus_f32`` may be a tuple of row segments (the CAP-scale store —
    see ops.pallas_scan.split_rescore_corpus); results merge by segment
    membership.
    """
    segs = (
        corpus_f32
        if isinstance(corpus_f32, (tuple, list))
        else (corpus_f32,)
    )
    out = None
    base = 0
    for seg in segs:
        n = seg.shape[0]
        local = candidate_idx - base
        safe = jnp.clip(local, 0, n - 1)
        cand = jnp.take(seg, safe, axis=0)  # [B, C, D]
        re = jnp.einsum(
            "bd,bcd->bc", queries.astype(cand.dtype), cand,
            preferred_element_type=jnp.float32,
        )
        if out is None:
            out = re
        else:
            inseg = (local >= 0) & (local < n)
            out = jnp.where(inseg, re, out)
        base += n
    return out
