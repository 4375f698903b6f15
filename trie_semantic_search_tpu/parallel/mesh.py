"""Device mesh construction and sharding helpers.

The reference is single-process (SURVEY.md §2.1); its only "parallelism" was
tokio task concurrency. The TPU-native scale-out model (BASELINE.json:
"embedding shards distributed over ICI") is:

  * 2-D mesh ``(data, model)``: the corpus (embedding matrix, postings,
    metadata columns) shards row-wise over ``data``; the encoder optionally
    runs tensor-parallel over ``model`` (off by default — MiniLM replicates).
  * Queries replicate across ``data`` (every chip scores its shard for the
    whole query batch), then shard-local top-k results are merged with an
    ``all_gather`` over ICI — communication is O(S·k), not O(N).
  * Multi-slice (DCN) scale-out would reuse the same program via
    ``jax.distributed`` initialisation; no custom transport exists or is
    needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..core.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the ``(data, model)`` mesh from config.

    ``data_parallel == 0`` → use all remaining devices on the data axis.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    mp = max(1, config.model_parallel)
    if len(devices) % mp != 0:
        raise ValueError(
            f"device count {len(devices)} not divisible by model_parallel {mp}"
        )
    dp = config.data_parallel or (len(devices) // mp)
    if dp * mp > len(devices):
        raise ValueError(
            f"mesh {dp}x{mp} needs {dp * mp} devices, have {len(devices)}"
        )
    grid = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_distributed_mesh(
    config: Optional[MeshConfig] = None,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Multi-slice / multi-host mesh over DCN via ``jax.distributed``
    (SURVEY.md §5: "DCN via jax.distributed only if the corpus exceeds one
    slice — no custom transport").

    Call once per host before any other JAX use; each host contributes its
    local chips and the returned mesh spans the whole job. The corpus
    continues to shard over ``data`` — XLA routes intra-slice collectives
    over ICI and the final k-way merge hop over DCN automatically based on
    device topology. No-op initialisation when coordinator details are
    absent (single-process job).
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return make_mesh(config, jax.devices())


def single_device_mesh() -> Mesh:
    """1×1 mesh — lets every code path be mesh-shaped even on one chip."""
    return Mesh(np.array(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded corpus matrix ``[N, D]`` over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharded 1-D array ``[N]`` (postings, metadata columns)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded activations ``[B, ...]`` over the data axis (training)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def pad_rows(n: int, multiple: int) -> int:
    """Round row count up to a multiple (shard divisibility + MXU tiling)."""
    return -(-n // multiple) * multiple


def pad_corpus(
    matrix: np.ndarray, mesh: Mesh, row_multiple: int = 8
) -> tuple[np.ndarray, int]:
    """Pad corpus rows so every shard is equal-sized and tile-aligned.

    Pad rows are zero vectors → cosine 0 with any query → never surface in
    top-k above real hits with positive similarity; callers also mask by
    ``row >= n_real``. Returns (padded matrix, original row count).
    """
    n = matrix.shape[0]
    shards = mesh.shape[DATA_AXIS]
    target = pad_rows(max(n, 1), shards * row_multiple)
    if target == n:
        return matrix, n
    pad = np.zeros((target - n, *matrix.shape[1:]), dtype=matrix.dtype)
    return np.concatenate([matrix, pad], axis=0), n
