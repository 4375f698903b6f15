"""Multi-chip sharded semantic index.

BASELINE.json north star: "embedding shards distributed over ICI and
shard-local top-k reduced across chips for pod-scale corpora". This module
is that serving path: the corpus embedding matrix (int8 + scales, plus a
bf16 rescore copy) is laid out row-sharded over the ``data`` mesh axis;
queries replicate; every chip scans its shard with one MXU matmul; the
shard-local top-k lists merge with a single ``all_gather`` over ICI
(O(S·k) bytes — never the corpus).

Drop-in alternative to :class:`.ann.PartitionedANN` behind
:class:`.vector.VectorIndex` (selected automatically when the mesh's data
axis is >1). Single-chip meshes degrade to the local scan with identical
results.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..core.errors import VectorIndexConstructionFailed
from ..ops.scoring import quantize_int8
from ..parallel.collectives import sharded_brute_topk, sharded_int8_topk
from ..parallel.mesh import DATA_AXIS, corpus_sharding, pad_corpus

_log = logging.getLogger("tss_tpu.sharded")


class ShardedCorpusIndex:
    """Row-sharded exact scan over a frozen corpus (int8 or bf16)."""

    def __init__(self, mesh: Mesh, use_int8: bool = True, row_multiple: int = 8):
        self.mesh = mesh
        self.use_int8 = use_int8
        self.row_multiple = row_multiple
        self.num_vectors = 0
        self._n_pad = 0
        self._corpus = None  # bf16 [Npad, D] sharded
        self._corpus_q = None  # int8 [Npad, D] sharded
        self._corpus_scale = None  # f32 [Npad, 1] sharded

    @property
    def num_shards(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    def build(self, vectors: np.ndarray, seed: int = 0) -> None:
        if vectors.ndim != 2 or vectors.shape[0] == 0:
            raise VectorIndexConstructionFailed(
                f"need [N, D] vectors, got {vectors.shape}"
            )
        v = np.asarray(vectors, np.float32)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        padded, n = pad_corpus(v, self.mesh, self.row_multiple)
        sharding = corpus_sharding(self.mesh)
        self.num_vectors = n
        self._n_pad = padded.shape[0]
        if self.use_int8:
            q, scale = quantize_int8(padded)
            # zero-scale the pad rows so they score exactly 0
            scale = scale.at[n:].set(0.0) if self._n_pad > n else scale
            self._corpus_q = jax.device_put(q, sharding)
            self._corpus_scale = jax.device_put(scale, sharding)
        self._corpus = jax.device_put(
            jnp.asarray(padded, jnp.bfloat16), sharding
        )
        _log.info(
            "sharded corpus: %d vectors (+%d pad) over %d shards",
            n, self._n_pad - n, self.num_shards,
        )

    def search_brute(
        self, queries: np.ndarray | jax.Array, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact global top-k across all shards. Pad rows can never win:
        the kernels mask rows >= ``num_vectors`` to ``-inf`` by global row
        id (so pads never consume top-k slots, even against negative-score
        real rows); results additionally mask any index >= N."""
        self._require_built()
        q = jnp.asarray(queries, jnp.float32)
        kk = min(k, self._n_pad)
        if self.use_int8:
            v, i = sharded_int8_topk(
                self.mesh, q, self._corpus_q, self._corpus_scale, kk,
                n_valid=self.num_vectors,
            )
        else:
            v, i = sharded_brute_topk(
                self.mesh, q, self._corpus, kk, n_valid=self.num_vectors
            )
        v = np.array(v)  # writable copies (np.asarray of a jax array is RO)
        i = np.array(i)
        invalid = i >= self.num_vectors
        i[invalid] = -1
        v[invalid] = -np.inf
        return v[:, :k], i[:, :k]

    # PartitionedANN-compatible surface
    def search(
        self, queries: np.ndarray | jax.Array, k: int, nprobe: Optional[int] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.search_brute(queries, k)

    def get_stats(self) -> dict:
        return {
            "num_vectors": self.num_vectors,
            "padded": self._n_pad,
            "shards": self.num_shards,
            "int8": self.use_int8,
        }

    def _require_built(self) -> None:
        if self._corpus is None:
            raise VectorIndexConstructionFailed("sharded index not built")

    # -- persistence (mesh-shape independent: saved unpadded, re-padded and
    # re-placed for whatever mesh loads it) ---------------------------------

    def save(self, path) -> None:
        """Save the logical (unpadded) corpus; device layout is derived at
        load time from the loading process's mesh, so artifacts move freely
        between topologies (e.g. built on v5e-8, served on v5e-4)."""
        from pathlib import Path

        self._require_built()
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        n = self.num_vectors
        corpus_f16 = (
            np.asarray(self._corpus[:n].astype(jnp.float32)).astype(np.float16)
        )
        np.savez_compressed(
            path,
            sharded_corpus_f16=corpus_f16,
            use_int8=np.array(self.use_int8),
            row_multiple=np.array(self.row_multiple),
        )

    @classmethod
    def load(cls, path, mesh: Mesh) -> "ShardedCorpusIndex":
        from ..core.errors import IndexCorrupted

        try:
            with np.load(path, allow_pickle=False) as z:
                corpus = z["sharded_corpus_f16"].astype(np.float32)
                idx = cls(
                    mesh,
                    use_int8=bool(z["use_int8"]),
                    row_multiple=int(z["row_multiple"]),
                )
        except (KeyError, ValueError) as e:
            raise IndexCorrupted(index_type="sharded", details=str(e)) from e
        idx.build(corpus)
        return idx


def build_sharded_partitions(
    v: np.ndarray,  # [Npad, D] L2-normalised f32; pad rows (>= n_valid) zero
    n_valid: int,
    num_shards: int,
    centroids: np.ndarray,  # [P, D] f32 — GLOBAL k-means centroids
    chunk_court: np.ndarray,  # [Npad] int32 court id per chunk
    chunk_date: np.ndarray,  # [Npad] int32 date per chunk
    lanes: int = 128,
    overalloc: float = 2.0,
) -> dict:
    """Partition a row-sharded corpus PER SHARD against shared global
    centroids (VERDICT r2 item 1: the sharded-partitioned serving mode).

    Every shard assigns its rows to the same P partitions, so a query that
    probes partition p scans p's members on every chip — identical probed
    coverage to single-chip partitioning, split S ways. Returns host
    arrays for :func:`..parallel.collectives.sharded_partitioned_topk`:

      * ``part_rows [S, P, m]`` — SHARD-LOCAL row per slot (-1 pad),
      * ``part_int8 [S, P, m, D]`` / ``part_scale [S, P, m]`` — per-row
        symmetric int8 (scale 0 on pads),
      * ``part_cword/part_cbit/part_date [S, P, m]`` — partition-major
        filter columns for the scalar-prefetch probe kernel (pad slots:
        word -1 / date INT32_MIN — no filter passes),

    with ``m`` = the max partition fill across all shards, padded to a
    ``lanes`` multiple (the probe kernel's block requirement).
    """
    from .kmeans import assign_clusters

    Npad, D = v.shape
    S = num_shards
    if Npad % S:
        raise VectorIndexConstructionFailed(
            f"padded rows {Npad} not divisible by {S} shards"
        )
    shard_rows = Npad // S
    P = centroids.shape[0]
    assign = np.asarray(assign_clusters(v, np.asarray(centroids, np.float32)))
    valid = np.arange(Npad) < n_valid

    # per-shard stable partition fill (vectorised; no per-partition
    # loops). Rows must stay on their shard (the physical chip), so the
    # imbalance capacity cap + overflow rebalance apply per shard — the
    # same giant-duplicate-cluster failure mode as the single-chip layout
    # (index/ann._rebalance_overflow), [S, P, m, D] scales by the max.
    from .ann import _capacity_cap, _rebalance_overflow

    shard_sorted: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    m = 0
    for s in range(S):
        lo = s * shard_rows
        local = np.nonzero(valid[lo : lo + shard_rows])[0].astype(np.int32)
        a = assign[lo + local].astype(np.int32)
        cap = _capacity_cap(len(local), P, overalloc)
        a = _rebalance_overflow(
            a, cap, np.asarray(centroids, np.float32),
            lambda rows, _lo=lo, _local=local: v[_lo + _local[rows]],
        )
        order = np.argsort(a, kind="stable")  # ascending row id within p
        counts = np.bincount(a, minlength=P).astype(np.int64)
        shard_sorted.append((local[order], a[order], counts))
        if counts.size:
            m = max(m, int(counts.max()))
    m = max(lanes, -(-m // lanes) * lanes)

    absmax = np.max(np.abs(v), axis=1)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q8 = np.clip(
        np.round(v / scale[:, None]), -127, 127
    ).astype(np.int8)

    part_rows = np.full((S, P, m), -1, np.int32)
    for s, (rows_sorted, a_sorted, counts) in enumerate(shard_sorted):
        offsets = np.zeros(P + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        pos = np.arange(len(rows_sorted)) - np.repeat(offsets[:-1], counts)
        part_rows[s, a_sorted, pos] = rows_sorted

    pad = part_rows < 0
    safe_local = np.maximum(part_rows, 0)
    # local slot row -> global row (for embeddings + filter columns)
    glob = safe_local + (np.arange(S, dtype=np.int32) * shard_rows)[
        :, None, None
    ]
    part_int8 = q8[glob]
    part_scale = scale[glob].astype(np.float32)
    part_int8[pad] = 0
    part_scale[pad] = 0.0

    pc = chunk_court[glob].astype(np.int32)
    cword = (pc // 32).astype(np.int32)
    cbit = np.uint32(1) << (pc.astype(np.uint32) % 32)
    pdt = chunk_date[glob].astype(np.int32)
    cword[pad] = -1
    pdt[pad] = np.iinfo(np.int32).min
    return {
        "part_rows": part_rows,
        "part_int8": part_int8,
        "part_scale": part_scale,
        "part_cword": cword,
        "part_cbit": cbit,
        "part_date": pdt,
        "m": m,
    }
