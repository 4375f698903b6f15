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
    c = _lloyd(jnp.asarray(x, jnp.float32), jnp.asarray(init, jnp.float32),
               num_clusters, iters)
    return np.asarray(c)


def assign_clusters(
    vectors: np.ndarray, centroids: np.ndarray, block: int = 65536
) -> np.ndarray:
    """Nearest-centroid assignment, blocked to bound device memory."""
    c = jnp.asarray(centroids, jnp.float32)

    # centroids as an explicit argument (a captured device array would ship
    # as an HLO constant through the remote-compile tunnel)
    @jax.jit
    def _assign(v: jax.Array, cent: jax.Array) -> jax.Array:
        sims = jnp.einsum(
            "nd,pd->np", v, cent, preferred_element_type=jnp.float32
        )
        return jnp.argmax(sims, axis=1).astype(jnp.int32)

    out = np.empty((vectors.shape[0],), np.int32)
    for s in range(0, vectors.shape[0], block):
        out[s : s + block] = np.asarray(
            _assign(jnp.asarray(vectors[s : s + block], jnp.float32), c)
        )
    return out


def assign_topc(
    vectors: np.ndarray, centroids: np.ndarray, c: int, block: int = 65536
) -> np.ndarray:
    """Top-``c`` nearest centroids per row, blocked to bound device memory.
    Column 0 equals :func:`assign_clusters` (``lax.top_k`` and ``argmax``
    both break score ties to the lower centroid id). Columns 1+ feed the
    pad-replica planner (:func:`index.ann._plan_pad_replicas`)."""
    cent = jnp.asarray(centroids, jnp.float32)
    cc = min(c, centroids.shape[0])

    @functools.partial(jax.jit, static_argnames=("k",))
    def _topc(v: jax.Array, ce: jax.Array, k: int) -> jax.Array:
        sims = jnp.einsum(
            "nd,pd->np", v, ce, preferred_element_type=jnp.float32
        )
        _, idx = jax.lax.top_k(sims, k)
        return idx.astype(jnp.int32)

    out = np.empty((vectors.shape[0], cc), np.int32)
    for s in range(0, vectors.shape[0], block):
        out[s : s + block] = np.asarray(
            _topc(jnp.asarray(vectors[s : s + block], jnp.float32), cent, cc)
        )
    return out
