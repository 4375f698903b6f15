"""Multi-chip search collectives.

SURVEY.md §2.1 / §5: the reference has no distributed backend; the TPU-native
equivalent is shard-local top-k + an ICI ``all_gather`` merge, expressed with
``shard_map`` so XLA schedules the collectives.

Pattern (BASELINE.json north star): each chip holds a corpus shard
``[N/S, D]``; a replicated query batch scores its shard (one MXU matmul);
each chip reduces to local top-k; ``all_gather`` moves only ``S·k`` floats+
ints per query over ICI; a final exact merge yields the global top-k.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops.scoring import cosine_scores, cosine_scores_int8
from ..ops.topk import exact_topk, fast_topk, merge_topk
from .mesh import DATA_AXIS


def sharded_brute_topk(
    mesh: Mesh,
    queries: jax.Array,  # [B, D] replicated
    corpus: jax.Array,  # [N, D] sharded over data axis (N divisible by S)
    k: int,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded corpus. Returns replicated
    ``(values [B,k], global_indices [B,k])``."""

    shard_rows = corpus.shape[0] // mesh.shape[DATA_AXIS]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _search(q: jax.Array, shard: jax.Array) -> tuple[jax.Array, jax.Array]:
        scores = cosine_scores(q, shard)  # [B, n_local]
        if recall_target >= 1.0:
            v, i = exact_topk(scores, k)
        else:
            v, i = fast_topk(scores, k, recall_target)
        my = jax.lax.axis_index(DATA_AXIS)
        gi = i.astype(jnp.int32) + my * shard_rows
        # [S, B, k] on every chip after gather over ICI
        all_v = jax.lax.all_gather(v, DATA_AXIS)
        all_i = jax.lax.all_gather(gi, DATA_AXIS)
        # merge: [B, S, k] → [B, k]
        mv, mi = merge_topk(
            jnp.moveaxis(all_v, 0, 1), jnp.moveaxis(all_i, 0, 1), k
        )
        return mv, mi

    return _search(queries, corpus)


def sharded_int8_topk(
    mesh: Mesh,
    queries: jax.Array,  # [B, D] replicated f32
    corpus_q: jax.Array,  # [N, D] int8, sharded
    corpus_scale: jax.Array,  # [N, 1] f32, sharded
    k: int,
    recall_target: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Same as :func:`sharded_brute_topk` over an int8-quantised corpus."""

    shard_rows = corpus_q.shape[0] // mesh.shape[DATA_AXIS]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _search(
        q: jax.Array, shard_q: jax.Array, shard_s: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        scores = cosine_scores_int8(q, shard_q, shard_s)
        if recall_target >= 1.0:
            v, i = exact_topk(scores, k)
        else:
            v, i = fast_topk(scores, k, recall_target)
        my = jax.lax.axis_index(DATA_AXIS)
        gi = i.astype(jnp.int32) + my * shard_rows
        all_v = jax.lax.all_gather(v, DATA_AXIS)
        all_i = jax.lax.all_gather(gi, DATA_AXIS)
        return merge_topk(jnp.moveaxis(all_v, 0, 1), jnp.moveaxis(all_i, 0, 1), k)

    return _search(queries, corpus_q, corpus_scale)
