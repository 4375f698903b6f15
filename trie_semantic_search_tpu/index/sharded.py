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
