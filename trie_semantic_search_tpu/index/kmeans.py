"""Spherical k-means partitioner (JAX, jit-compiled Lloyd iterations).

Trains the partition centroids for the ScaNN-style ANN index
(SURVEY.md §7 step 6). Vectors are L2-normalised, so nearest-centroid by
dot product == cosine; centroids are re-normalised every iteration
(spherical k-means), which matches the cosine search metric.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


#: rows per device block in the Lloyd/assignment kernels. Bounds the
#: [block, P] similarity intermediate: at P=8192 a 65536-row block is a
#: 2.1 GB f32 tile — comfortably resident, and each matmul/argmax maps
#: cleanly onto the MXU/VPU. The round-5 10M-chunk build measured the
#: UNBLOCKED variant (one fused [524288, 8192] sims + one-hot einsum per
#: iteration, intermediates ~17 GB) at ~28 s/iteration on the chip —
#: 9.5 min of k-means; the blocked scan is the same math at seconds.
_LLOYD_BLOCK = 65_536


@functools.partial(jax.jit, static_argnames=("num_clusters", "iters"))
def _lloyd(
    x: jax.Array,  # [S, D] normalised sample
    init: jax.Array,  # [P, D] initial centroids
    num_clusters: int,
    iters: int,
) -> jax.Array:
    def step(c: jax.Array, _: None) -> tuple[jax.Array, None]:
        sims = jnp.einsum("sd,pd->sp", x, c, preferred_element_type=jnp.float32)
        assign = jnp.argmax(sims, axis=1)
        one_hot = jax.nn.one_hot(assign, num_clusters, dtype=x.dtype)  # [S, P]
        sums = jnp.einsum("sp,sd->pd", one_hot, x)
        counts = jnp.sum(one_hot, axis=0)[:, None]
        new_c = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), c)
        norms = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        return new_c / jnp.maximum(norms, 1e-12), None

    c, _ = jax.lax.scan(step, init, None, length=iters)
    return c


@functools.partial(jax.jit, static_argnames=("num_clusters", "iters"))
def _lloyd_blocked(
    xb: jax.Array,  # [B, block, D] normalised sample, zero-padded
    valid: jax.Array,  # [B, block] f32 1.0 for real rows, 0.0 for padding
    init: jax.Array,  # [P, D] initial centroids
    num_clusters: int,
    iters: int,
) -> jax.Array:
    """Corpus-sample Lloyd iterations blocked over the sample axis.

    Identical assignments to :func:`_lloyd` (argmax is per-row, so
    blocking is exact); centroid sums accumulate per block, which only
    permutes f32 summation order. Padding rows carry weight 0 and never
    contribute to sums or counts."""
    d = xb.shape[-1]

    def step(c: jax.Array, _: None) -> tuple[jax.Array, None]:
        def blk(
            carry: tuple[jax.Array, jax.Array],
            xs: tuple[jax.Array, jax.Array],
        ) -> tuple[tuple[jax.Array, jax.Array], None]:
            sums, counts = carry
            v, w = xs  # [block, D], [block]
            sims = jnp.einsum(
                "nd,pd->np", v, c, preferred_element_type=jnp.float32
            )
            a = jnp.argmax(sims, axis=1)
            oh = jax.nn.one_hot(a, num_clusters, dtype=jnp.float32)
            oh = oh * w[:, None]  # [block, P]
            sums = sums + jnp.einsum(
                "np,nd->pd", oh, v, preferred_element_type=jnp.float32
            )
            counts = counts + jnp.sum(oh, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            blk,
            (
                jnp.zeros((num_clusters, d), jnp.float32),
                jnp.zeros((num_clusters,), jnp.float32),
            ),
            (xb, valid),
        )
        counts = counts[:, None]
        new_c = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), c)
        norms = jnp.linalg.norm(new_c, axis=1, keepdims=True)
        return new_c / jnp.maximum(norms, 1e-12), None

    c, _ = jax.lax.scan(step, init, None, length=iters)
    return c


def train_kmeans(
    vectors: np.ndarray,  # [N, D] L2-normalised
    num_clusters: int,
    iters: int = 20,
    sample: int = 200_000,
    seed: int = 0,
    dedup: bool = False,
) -> np.ndarray:
    """Train centroids on (a sample of) the corpus. Returns ``[P, D]`` f32.

    ``dedup=True`` drops exact-duplicate rows from the TRAINING sample
    (bitwise f32 equality). Default OFF — measured HARMFUL on
    duplicate-heavy corpora (bench_results/spill_lab_r05.json): a mega
    duplicate group's repeated mass is exactly what earns it a Lloyd
    centroid; deduplicated, the group becomes homeless, overflows some
    topic partition, and the rebalancer scatters its copies into
    unreachable partitions. The round-5 floor failure (small duplicate
    ties scattered out of reach) is fixed by pad replicas
    (index.ann._plan_pad_replicas) instead."""
    n = vectors.shape[0]
    rng = np.random.default_rng(seed)
    if n > sample:
        idx = rng.choice(n, size=sample, replace=False)
        x = vectors[idx]
    else:
        x = vectors
    if dedup and x.shape[0] > 1:
        xc = np.ascontiguousarray(x, np.float32)
        flat = xc.view([("", xc.dtype)] * xc.shape[1]).ravel()
        _, uniq_idx = np.unique(flat, return_index=True)
        if len(uniq_idx) >= min(num_clusters, 8):
            x = xc[np.sort(uniq_idx)]
    # Init: distinct random points (k-means++ cost isn't worth it at this
    # scale; spherical Lloyd converges fast from random distinct seeds).
    init_idx = rng.choice(x.shape[0], size=min(num_clusters, x.shape[0]), replace=False)
    init = x[init_idx]
    if init.shape[0] < num_clusters:  # tiny corpora: tile + jitter
        reps = -(-num_clusters // init.shape[0])
        init = np.tile(init, (reps, 1))[:num_clusters]
        init = init + rng.normal(0, 1e-3, init.shape).astype(init.dtype)
        init = init / np.maximum(np.linalg.norm(init, axis=1, keepdims=True), 1e-12)
    if x.shape[0] <= _LLOYD_BLOCK:
        c = _lloyd(jnp.asarray(x, jnp.float32), jnp.asarray(init, jnp.float32),
                   num_clusters, iters)
    else:
        nb = -(-x.shape[0] // _LLOYD_BLOCK)
        pad = nb * _LLOYD_BLOCK - x.shape[0]
        xp = np.ascontiguousarray(x, np.float32)
        if pad:
            xp = np.concatenate(
                [xp, np.zeros((pad, x.shape[1]), np.float32)]
            )
        valid = np.ones(nb * _LLOYD_BLOCK, np.float32)
        if pad:
            valid[-pad:] = 0.0
        c = _lloyd_blocked(
            jnp.asarray(xp.reshape(nb, _LLOYD_BLOCK, -1)),
            jnp.asarray(valid.reshape(nb, _LLOYD_BLOCK)),
            jnp.asarray(init, jnp.float32),
            num_clusters, iters,
        )
    return np.asarray(c)


# centroids as an explicit argument (a captured device array would ship
# as an HLO constant through the remote-compile tunnel); module-level so
# repeated blocked calls reuse one traced program
@jax.jit
def _assign(v: jax.Array, cent: jax.Array) -> jax.Array:
    sims = jnp.einsum(
        "nd,pd->np", v, cent, preferred_element_type=jnp.float32
    )
    return jnp.argmax(sims, axis=1).astype(jnp.int32)


def assign_clusters(
    vectors: np.ndarray, centroids: np.ndarray, block: int = 65536
) -> np.ndarray:
    """Nearest-centroid assignment, blocked to bound device memory."""
    c = jnp.asarray(centroids, jnp.float32)

    out = np.empty((vectors.shape[0],), np.int32)
    for s in range(0, vectors.shape[0], block):
        out[s : s + block] = np.asarray(
            _assign(jnp.asarray(vectors[s : s + block], jnp.float32), c)
        )
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def _topc(v: jax.Array, ce: jax.Array, k: int) -> jax.Array:
    """Top-``k`` centroid ids per row via ``k`` rounds of masked argmax.

    ``lax.top_k`` over a P=8192 column axis lowers to a general sort on
    the VPU — measured ~17 s per 262k-row slab on the round-5 10M-chunk
    build (the ANN finalize's dominant cost). k rounds of
    argmax-then-mask stream the [block, P] sims tile k times instead
    (~60 ms at k=8): same result, same tie rule (argmax and top_k both
    prefer the lower index, and each round removes exactly the previous
    pick, so equal scores emerge in ascending id order)."""
    sims = jnp.einsum(
        "nd,pd->np", v, ce, preferred_element_type=jnp.float32
    )

    def pick(s: jax.Array, _: None) -> tuple[jax.Array, jax.Array]:
        a = jnp.argmax(s, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col == a[:, None], -jnp.inf, s)
        return s, a.astype(jnp.int32)

    _, idx = jax.lax.scan(pick, sims, None, length=k)  # [k, n]
    return jnp.transpose(idx)


def assign_topc(
    vectors: np.ndarray, centroids: np.ndarray, c: int, block: int = 65536
) -> np.ndarray:
    """Top-``c`` nearest centroids per row, blocked to bound device memory.
    Column 0 equals :func:`assign_clusters` (both break score ties to the
    lower centroid id). Columns 1+ feed the pad-replica planner
    (:func:`index.ann._plan_pad_replicas`)."""
    cent = jnp.asarray(centroids, jnp.float32)
    cc = min(c, centroids.shape[0])

    out = np.empty((vectors.shape[0], cc), np.int32)
    for s in range(0, vectors.shape[0], block):
        out[s : s + block] = np.asarray(
            _topc(jnp.asarray(vectors[s : s + block], jnp.float32), cent, cc)
        )
    return out
